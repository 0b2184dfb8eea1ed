"""Score-matching training losses, including PIT variants and init-hacks.

Capability parity with pl_model.py:
  * normalize/denormalize_batch (81-92), shuffle/power-order sources (28-78)
  * sample_time uniform|varprop (166-177), sample_prior with init hacks
    1-4 (179-247)
  * compute_score_loss (411-424)
  * compute_score_loss_with_pit + mmnr gate (249-325)
  * compute_score_loss_with_pit_allthetime (327-368)
  * compute_score_loss_init_hack_pit (370-405)
  * train_step_init_5/6/7 Bernoulli splits (429-493)

TPU-first redesign — one network forward per step
-------------------------------------------------
The reference evaluates the score network once *per permutation* in all its
PIT losses. But in every one of them the network input is permutation-
independent:
  * mmnr-PIT: x_t = mean_select + L z is broadcast across perms
    (pl_model.py:292-306) — identical inputs re-evaluated n_perm times;
  * all-the-time PIT: x_t = mean_0 + L z0 inside the perm loop (341-357);
  * init-hack PIT: x_t = mean_p + L (z0 + L^{-1}(mix - mean_p))
                       = mix + L z0 — algebraically perm-independent (383-394).
Only the whitened noise target z_p differs per permutation, which is cheap
closed-form math. So every loss here calls the network exactly once and
takes the perm-min over analytic targets — same optimum, ~n_perm x less
compute than the reference.

The per-sample Bernoulli init splits (train_step_init_5/6/7) become masked
`where`-selects between the init-PIT input (time pinned to T) and the
regular input, again with a single fused forward — dynamic batch slicing
(pl_model.py:436-442) is incompatible with XLA's static shapes and is not
needed.
"""
from __future__ import annotations

import itertools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..sde.base import SDE

Array = jax.Array
# score_fn(x_t, t, mix) -> score, with params already bound
ScoreFn = Callable[[Array, Array, Array], Array]


# --------------------------------------------------------------------------
# batch utilities (pl_model.py:28-92)
# --------------------------------------------------------------------------
def normalize_batch(mix: Array, tgt: Array | None):
    """Normalize by the mixture's mean/std over (chan, time)
    (pl_model.py:81-88; torch .std() is Bessel-corrected, ddof=1)."""
    mean = mix.mean(axis=(1, 2), keepdims=True)
    std = jnp.clip(mix.std(axis=(1, 2), keepdims=True, ddof=1), 1e-5)
    mix = (mix - mean) / std
    if tgt is not None:
        tgt = (tgt - mean) / std
    return (mix, tgt), mean, std


def denormalize_batch(x: Array, mean: Array, std: Array) -> Array:
    return x * std + mean


def normalize_rows_host(rows, padded: int):
    """Host-side (numpy) serving counterpart of normalize_batch: normalize
    each (1, n) signal on its TRUE length with the exact normalize_batch
    stats (Bessel ddof=1 std, 1e-5 clamp), THEN zero-pad to `padded` —
    padding first would fold the zero tail into the mixture stats and feed
    the network an off-distribution input (reference separate.py:132-135
    normalizes the unpadded signal). Shared by cli/serve.py and
    streaming.py so the serving rule has exactly one implementation.
    Returns (padded_rows, means, stds); single-sample rows get std=1
    (np.std(ddof=1) of one sample is NaN, which max() would propagate)."""
    out, means, stds = [], [], []
    for m in rows:
        n = m.shape[-1]
        mean = float(np.mean(m)) if n else 0.0
        std = max(float(np.std(m, ddof=1)), 1e-5) if n > 1 else 1.0
        m_n = ((m - mean) / std).astype(np.float32)
        out.append(np.pad(m_n, ((0, 0), (0, padded - n))))
        means.append(mean)
        stds.append(std)
    return out, means, stds


def normalize_batch_masked(mix: Array, n_valid: Array):
    """normalize_batch for zero-padded rows: each row's mean/std come from
    its true span ``[:, :n_valid[b]]`` only, and the pad region of the
    output is forced to exactly 0 — the in-graph equivalent of the serving
    rule "normalize on true length, THEN pad"
    (normalize_rows_host above; reference separate.py:132-135 normalizes
    the unpadded signal). Same Bessel ddof=1 std and 1e-5 clamp as
    normalize_batch; with n_valid == n_samples it reduces to it exactly.

    n_valid: int array (batch,) of valid sample counts per row; values are
    clamped to [1, n_samples] (0 would make the mean 0/0, and an
    over-length count would silently deflate the Bessel std).
    """
    n_valid = jnp.clip(n_valid, 1, mix.shape[-1])
    idx = jnp.arange(mix.shape[-1])
    mask = (idx[None, None, :] < n_valid[:, None, None]).astype(mix.dtype)
    n = n_valid.astype(mix.dtype).reshape(-1, 1, 1) * mix.shape[1]
    mean = (mix * mask).sum(axis=(1, 2), keepdims=True) / n
    var = ((mix - mean) ** 2 * mask).sum(axis=(1, 2), keepdims=True) / (
        jnp.maximum(n - 1.0, 1.0)
    )
    std = jnp.clip(jnp.sqrt(var), 1e-5)
    return ((mix - mean) / std) * mask, mean, std


def shuffle_sources(key: jax.Array, x: Array) -> Array:
    """Independent random source permutation per batch entry
    (pl_model.py:28-46)."""
    c = jax.random.uniform(key, x.shape[:2])
    idx = jnp.argsort(c, axis=1)
    return jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1
    )


def select_elem_at_random(key: jax.Array, x: Array, dim: int = -1) -> Array:
    """Pick one random slice along `dim` per batch entry, keeping the dim
    with size 1 (pl_model.py:49-57)."""
    x = jnp.moveaxis(x, dim, -1)
    idx = jax.random.randint(key, (x.shape[0],), 0, x.shape[-1])
    idx = idx.reshape((-1,) + (1,) * (x.ndim - 1))
    picked = jnp.take_along_axis(x, idx, axis=-1)
    return jnp.moveaxis(picked, -1, dim)


def power_order_sources(x: Array) -> Array:
    """Order sources by increasing variance (pl_model.py:60-78)."""
    c = jnp.var(x, axis=-1)
    idx = jnp.argsort(c, axis=1)
    return jnp.take_along_axis(
        x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1
    )


def sample_time(
    key: jax.Array,
    sde: SDE,
    n: int,
    t_eps: float,
    strategy: str = "uniform",
) -> Array:
    """t ~ U[t_eps, T] or variance-proportional (pl_model.py:166-177)."""
    if strategy == "uniform":
        return jax.random.uniform(key, (n,), minval=t_eps, maxval=sde.T)
    if strategy == "varprop":
        return sde.sample_time_varprop(key, n, t_eps=t_eps)
    raise NotImplementedError(f"No sampling strategy {strategy}")


# --------------------------------------------------------------------------
# prior sampling with init hacks 1-4 (pl_model.py:179-247)
# --------------------------------------------------------------------------
def sample_prior(
    key: jax.Array,
    sde: SDE,
    mix: Array,
    target: Array,
    t_eps: float,
    init_hack: int | bool = False,
    t_rev_init: float = 0.03,
    time_strategy: str = "uniform",
):
    kt, kz = jax.random.split(key)
    time = sample_time(kt, sde, target.shape[0], t_eps, time_strategy)
    z = jax.random.normal(kz, target.shape, target.dtype)
    true_mix = jnp.broadcast_to(mix, target.shape) / target.shape[1]

    if init_hack == 4:
        # pin a 1/N fraction of samples to t = T (pl_model.py:226-240)
        k_sel, kz = jax.random.split(kz)
        select = jax.random.uniform(k_sel, time.shape) < 1.0 / sde.N
        time = jnp.where(select, jnp.full_like(time, sde.T), time)
        mean, L = sde.marginal_prob(target, time, mix)
        sel = select[:, None, None]
        z = jnp.where(sel, z + sde.mult_std_inv(L, true_mix - mean), z)
        x_t = mean + sde.mult_std(L, z)
        return x_t, time, L, z

    mean, L = sde.marginal_prob(target, time, mix)

    if init_hack == 1:
        select = time < sde.T - t_rev_init
        sel = select[:, None, None]
        z = jnp.where(sel, z, z + sde.mult_std_inv(L, true_mix - mean))
        x_t = mean + sde.mult_std(L, z)
    elif init_hack in (2, 3):
        T, Tm = sde.T, sde.T - t_rev_init
        beta = jnp.clip((time - Tm) / (T - Tm), 0.0, 1.0)[:, None, None]
        x_t = true_mix * beta + mean * (1.0 - beta) + sde.mult_std(L, z)
        if init_hack == 3:
            z = sde.mult_std_inv(L, x_t - mean)
    else:
        x_t = mean + sde.mult_std(L, z)
    return x_t, time, L, z


# --------------------------------------------------------------------------
# losses — each calls the network exactly once
# --------------------------------------------------------------------------
def _whitened_mse(sde: SDE, L, pred: Array, z: Array) -> Array:
    """||L pred + z||^2 averaged over (src, time) -> (batch,)
    (pl_model.py:418-423)."""
    return ((sde.mult_std(L, pred) + z) ** 2).mean(axis=(-2, -1))


def _perms(n: int):
    return list(itertools.permutations(range(n)))


def compute_score_loss(
    key: jax.Array,
    sde: SDE,
    score_fn: ScoreFn,
    mix: Array,
    target: Array,
    t_eps: float,
    init_hack: int | bool = False,
    t_rev_init: float = 0.03,
    time_strategy: str = "uniform",
) -> Array:
    """Plain denoising score matching (pl_model.py:411-424) -> (batch,)."""
    x_t, time, L, z = sample_prior(
        key, sde, mix, target, t_eps, init_hack, t_rev_init, time_strategy
    )
    pred = score_fn(x_t, time, mix)
    return _whitened_mse(sde, L, pred, z)


def compute_score_loss_with_pit(
    key: jax.Array,
    sde: SDE,
    score_fn: ScoreFn,
    mix: Array,
    target: Array,
    t_eps: float,
    mmnr_thresh_pit: float = -10.0,
    time_strategy: str = "uniform",
) -> Array:
    """mmnr-gated PIT score loss (pl_model.py:249-325) -> (batch,).

    Single forward: the network input x_t = mean_select + L z is the same
    for every permutation (pl_model.py:292 broadcasts it), so the perm-min
    acts only on the analytic whitened targets."""
    kt, kz, ks = jax.random.split(key, 3)
    time = sample_time(kt, sde, target.shape[0], t_eps, time_strategy)
    perms = _perms(target.shape[1])
    means = jnp.stack(
        [sde.marginal_prob(target[:, p, :], time, mix)[0] for p in perms],
        axis=1,
    )  # (batch, n_perm, src, samples)
    L = sde.marginal_prob(target, time, mix)[1]
    n_perm = means.shape[1]

    z = jax.random.normal(kz, target.shape, target.dtype)
    Lz = sde.mult_std(L, z)

    sel = jax.random.randint(ks, (target.shape[0],), 0, n_perm)
    mean_select = jnp.take_along_axis(
        means, sel[:, None, None, None], axis=1
    )[:, 0]
    x_t = mean_select + Lz

    # model-mismatch-to-noise ratio gate (pl_model.py:271-281)
    err = means - mean_select[:, None]
    n_elems = (n_perm - 1) * means.shape[2] * means.shape[3]
    err_pow = (err**2).sum(axis=(1, 2, 3)) / n_elems
    noise_pow = (Lz**2).mean(axis=(1, 2))
    mmnr = 10.0 * jnp.log10(err_pow / jnp.clip(noise_pow, 1e-5))

    pred = score_fn(x_t, time, mix)
    L_pred = sde.mult_std(L, pred)

    loss_reg = ((L_pred + z) ** 2).mean(axis=(-2, -1))
    losses_pit = []
    for i in range(n_perm):
        z_p = z + sde.mult_std_inv(L, err[:, i])
        losses_pit.append(((L_pred + z_p) ** 2).mean(axis=(-2, -1)))
    loss_pit = jnp.stack(losses_pit, axis=-1).min(axis=-1)

    return jnp.where(mmnr < mmnr_thresh_pit, loss_pit, loss_reg)


def compute_score_loss_with_pit_allthetime(
    key: jax.Array,
    sde: SDE,
    score_fn: ScoreFn,
    mix: Array,
    target: Array,
    t_eps: float,
    time_strategy: str = "uniform",
) -> Array:
    """Perm-min score loss at every t (pl_model.py:327-368) -> (batch,)."""
    kt, kz, ksh = jax.random.split(key, 3)
    target = shuffle_sources(ksh, target)
    time = sample_time(kt, sde, target.shape[0], t_eps, time_strategy)
    mean_0, L = sde.marginal_prob(target, time, mix)
    z0 = jax.random.normal(kz, target.shape, target.dtype)
    x_t = mean_0 + sde.mult_std(L, z0)

    pred = score_fn(x_t, time, mix)
    L_pred = sde.mult_std(L, pred)

    losses = []
    for p in _perms(target.shape[1]):
        mean_p = sde.marginal_prob(target[:, p, :], time, mix)[0]
        z_p = z0 + sde.mult_std_inv(L, mean_0 - mean_p)
        losses.append(((L_pred + z_p) ** 2).mean(axis=(-2, -1)))
    return jnp.stack(losses, axis=0).min(axis=0)


def compute_score_loss_init_hack_pit(
    key: jax.Array,
    sde: SDE,
    score_fn: ScoreFn,
    mix: Array,
    target: Array,
) -> Array:
    """Perm-min mixture-consistent loss at t = T (pl_model.py:370-405).

    x_t = mean_p + L (z0 + L^{-1}(mix - mean_p)) = mix + L z0 for every
    permutation, so a single forward suffices."""
    time = jnp.full((mix.shape[0],), sde.T, mix.dtype)
    true_mix = jnp.broadcast_to(mix, target.shape) / target.shape[1]
    z0 = jax.random.normal(key, target.shape, target.dtype)

    L = sde.marginal_prob(target, time, mix)[1]
    x_t = true_mix + sde.mult_std(L, z0)
    pred = score_fn(x_t, time, mix)
    L_pred = sde.mult_std(L, pred)

    losses = []
    for p in _perms(target.shape[1]):
        mean_p = sde.marginal_prob(target[:, p, :], time, mix)[0]
        z_p = z0 + sde.mult_std_inv(L, true_mix - mean_p)
        losses.append(((L_pred + z_p) ** 2).mean(axis=(-2, -1)))
    return jnp.stack(losses, axis=1).min(axis=1)


# --------------------------------------------------------------------------
# init-hack 5/6/7 training steps (pl_model.py:429-493) — masked, one forward
# --------------------------------------------------------------------------
def _masked_init_step(
    key: jax.Array,
    sde: SDE,
    score_fn: ScoreFn,
    mix: Array,
    target: Array,
    t_eps: float,
    init_hack_p: float,
    regular_loss: str,
    mmnr_thresh_pit: float,
    time_strategy: str,
) -> Array:
    """Shared skeleton: per-sample Bernoulli(p) chooses between the
    init-PIT input (t = T, mixture-consistent) and the regular input; both
    losses are evaluated from ONE fused forward pass."""
    k_mask, k_init, k_reg, k_shuf = jax.random.split(key, 4)
    b = mix.shape[0]
    pit_mask = jax.random.uniform(k_mask, (b,)) < init_hack_p

    # ----- init branch (t = T) -----
    time_T = jnp.full((b,), sde.T, mix.dtype)
    true_mix = jnp.broadcast_to(mix, target.shape) / target.shape[1]
    z0 = jax.random.normal(k_init, target.shape, target.dtype)
    L_T = sde.marginal_prob(target, time_T, mix)[1]
    x_t_init = true_mix + sde.mult_std(L_T, z0)

    # ----- regular branch -----
    if regular_loss == "plain":
        tgt_reg = shuffle_sources(k_shuf, target)
        x_t_reg, time_reg, L_reg, z_reg = sample_prior(
            k_reg, sde, mix, tgt_reg, t_eps, False, time_strategy=time_strategy
        )
    elif regular_loss == "pit":
        tgt_reg = shuffle_sources(k_shuf, target)
        kt, kz, ks = jax.random.split(k_reg, 3)
        time_reg = sample_time(kt, sde, b, t_eps, time_strategy)
        perms = _perms(target.shape[1])
        means = jnp.stack(
            [sde.marginal_prob(tgt_reg[:, p, :], time_reg, mix)[0] for p in perms],
            axis=1,
        )
        L_reg = sde.marginal_prob(tgt_reg, time_reg, mix)[1]
        z_reg = jax.random.normal(kz, target.shape, target.dtype)
        sel = jax.random.randint(ks, (b,), 0, means.shape[1])
        mean_select = jnp.take_along_axis(
            means, sel[:, None, None, None], axis=1
        )[:, 0]
        x_t_reg = mean_select + sde.mult_std(L_reg, z_reg)
    elif regular_loss == "allthetime":
        tgt_reg = shuffle_sources(k_shuf, target)
        kt, kz = jax.random.split(k_reg)
        time_reg = sample_time(kt, sde, b, t_eps, time_strategy)
        mean_0, L_reg = sde.marginal_prob(tgt_reg, time_reg, mix)
        z_reg = jax.random.normal(kz, target.shape, target.dtype)
        x_t_reg = mean_0 + sde.mult_std(L_reg, z_reg)
    else:
        raise ValueError(regular_loss)

    # ----- fused forward -----
    m3 = pit_mask[:, None, None]
    x_t = jnp.where(m3, x_t_init, x_t_reg)
    time = jnp.where(pit_mask, time_T, time_reg)
    pred = score_fn(x_t, time, mix)

    # ----- init loss: perm-min of mixture-consistent targets -----
    L_pred_T = sde.mult_std(L_T, pred)
    init_losses = []
    for p in _perms(target.shape[1]):
        mean_p = sde.marginal_prob(target[:, p, :], time_T, mix)[0]
        z_p = z0 + sde.mult_std_inv(L_T, true_mix - mean_p)
        init_losses.append(((L_pred_T + z_p) ** 2).mean(axis=(-2, -1)))
    loss_init = jnp.stack(init_losses, axis=1).min(axis=1)

    # ----- regular loss -----
    L_pred_reg = sde.mult_std(L_reg, pred)
    if regular_loss == "plain":
        loss_reg = ((L_pred_reg + z_reg) ** 2).mean(axis=(-2, -1))
    elif regular_loss == "pit":
        err = means - mean_select[:, None]
        n_perm = means.shape[1]
        n_elems = (n_perm - 1) * means.shape[2] * means.shape[3]
        err_pow = (err**2).sum(axis=(1, 2, 3)) / n_elems
        Lz = sde.mult_std(L_reg, z_reg)
        noise_pow = (Lz**2).mean(axis=(1, 2))
        mmnr = 10.0 * jnp.log10(err_pow / jnp.clip(noise_pow, 1e-5))
        l_plain = ((L_pred_reg + z_reg) ** 2).mean(axis=(-2, -1))
        l_perm = []
        for i in range(n_perm):
            z_p = z_reg + sde.mult_std_inv(L_reg, err[:, i])
            l_perm.append(((L_pred_reg + z_p) ** 2).mean(axis=(-2, -1)))
        l_pit = jnp.stack(l_perm, axis=-1).min(axis=-1)
        loss_reg = jnp.where(mmnr < mmnr_thresh_pit, l_pit, l_plain)
    else:  # allthetime
        l_perm = []
        for p in _perms(target.shape[1]):
            mean_p = sde.marginal_prob(tgt_reg[:, p, :], time_reg, mix)[0]
            z_p = z_reg + sde.mult_std_inv(L_reg, mean_0 - mean_p)
            l_perm.append(((L_pred_reg + z_p) ** 2).mean(axis=(-2, -1)))
        loss_reg = jnp.stack(l_perm, axis=0).min(axis=0)

    return jnp.where(pit_mask, loss_init, loss_reg)


def train_step_init_5(key, sde, score_fn, mix, target, t_eps, init_hack_p,
                      time_strategy="uniform", mmnr_thresh_pit=-10.0):
    """init-PIT vs plain loss split (pl_model.py:429-448)."""
    return _masked_init_step(
        key, sde, score_fn, mix, target, t_eps, init_hack_p,
        "plain", mmnr_thresh_pit, time_strategy,
    )


def train_step_init_6(key, sde, score_fn, mix, target, t_eps, init_hack_p,
                      time_strategy="uniform", mmnr_thresh_pit=-10.0):
    """init-PIT vs mmnr-PIT loss split (pl_model.py:450-469)."""
    return _masked_init_step(
        key, sde, score_fn, mix, target, t_eps, init_hack_p,
        "pit", mmnr_thresh_pit, time_strategy,
    )


def train_step_init_7(key, sde, score_fn, mix, target, t_eps, init_hack_p,
                      time_strategy="uniform", mmnr_thresh_pit=-10.0):
    """init-PIT vs all-the-time-PIT split (pl_model.py:471-493)."""
    return _masked_init_step(
        key, sde, score_fn, mix, target, t_eps, init_hack_p,
        "allthetime", mmnr_thresh_pit, time_strategy,
    )


def training_loss(
    key: jax.Array,
    sde: SDE,
    score_fn: ScoreFn,
    mix: Array,
    target: Array,
    t_eps: float,
    init_hack: int | bool = False,
    init_hack_p: float = 0.1,
    t_rev_init: float = 0.03,
    train_source_order: str = "random",
    mmnr_thresh_pit: float = -10.0,
    time_strategy: str = "uniform",
    sample_weight: Optional[Array] = None,
) -> Array:
    """Top-level dispatch matching training_step (pl_model.py:495-532).

    Returns the scalar batch loss. `sample_weight` (shape [batch]) makes
    the reduction a weighted mean — used to pad batches to an XLA-friendly
    multiple of 8 with zero-weight filler samples (a batch of 6 compiles
    to ~4x slower programs on TPU than a batch of 8, see
    scripts/perf_train.py) without changing the loss semantics."""
    if init_hack == 7:
        per = train_step_init_7(key, sde, score_fn, mix, target, t_eps,
                                init_hack_p, time_strategy, mmnr_thresh_pit)
    elif init_hack == 6:
        per = train_step_init_6(key, sde, score_fn, mix, target, t_eps,
                                init_hack_p, time_strategy, mmnr_thresh_pit)
    elif init_hack == 5:
        per = train_step_init_5(key, sde, score_fn, mix, target, t_eps,
                                init_hack_p, time_strategy, mmnr_thresh_pit)
    elif train_source_order == "pit":
        per = compute_score_loss_with_pit(
            key, sde, score_fn, mix, target, t_eps, mmnr_thresh_pit,
            time_strategy,
        )
    else:
        k_ord, key = jax.random.split(key)
        if train_source_order == "power":
            target = power_order_sources(target)
        elif train_source_order == "random":
            target = shuffle_sources(k_ord, target)
        per = compute_score_loss(
            key, sde, score_fn, mix, target, t_eps, init_hack, t_rev_init,
            time_strategy,
        )
    if sample_weight is None:
        return per.mean()
    w = sample_weight.astype(per.dtype)
    return (per * w).sum() / jnp.maximum(w.sum(), 1e-12)
