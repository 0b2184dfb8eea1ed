"""Long-form separation: fixed-size chunks, batched, permutation-aligned.

The reference separates whole utterances at batch size 1
(evaluate.py:322-330, separate.py:81-100) — fine for WSJ0's ~5 s clips,
unusable for minutes-long recordings (memory and a fresh XLA compile per
length). TPU-native answer: slice the mixture into fixed-size overlapping
chunks (ONE compiled shape), push them through the jitted PC/DDIM sampler
in batches, then stitch:

  * diffusion separation is permutation-ambiguous per chunk — consecutive
    chunks may emit the speakers swapped. Each chunk's source order is
    aligned to its predecessor by correlating the shared overlap region
    (all n_src! permutations scored; n_src is 2-3 here);
  * seams are raised-cosine crossfaded over the overlap;
  * each chunk is normalized on its true length before padding (the
    zero tail would otherwise bias the mixture stats — same rule as
    cli/serve.py) and denormalized after.

No reference counterpart (beyond-parity capability, like cli/serve.py).
"""
from __future__ import annotations

import itertools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["separate_streaming"]


def _best_perm(tail: np.ndarray, head: np.ndarray) -> tuple:
    """Permutation p of `head`'s sources best matching `tail` over the
    shared overlap: maximize the summed normalized correlation."""
    n_src = tail.shape[0]
    norm_t = np.linalg.norm(tail, axis=-1) + 1e-9
    norm_h = np.linalg.norm(head, axis=-1) + 1e-9
    corr = (tail @ head.T) / np.outer(norm_t, norm_h)  # (n_src, n_src)
    best, best_score = tuple(range(n_src)), -np.inf
    for p in itertools.permutations(range(n_src)):
        s = sum(corr[i, p[i]] for i in range(n_src))
        if s > best_score:
            best, best_score = p, s
    return best


def separate_streaming(
    model,
    params,
    key: jax.Array,
    mix: np.ndarray,
    chunk_s: float = 5.0,
    overlap_s: float = 0.5,
    batch: int = 8,
    fs: Optional[int] = None,
    **sampler_kwargs,
):
    """Separate an arbitrarily long (1, n) mixture with bounded memory.

    Returns (n_src, n). One XLA program is compiled (the fixed
    (batch, 1, chunk) shape) regardless of input length.
    """
    if fs is None:
        fs = int(model.config.model.fs)
    mix = np.asarray(mix, np.float32)
    if mix.ndim == 1:
        mix = mix[None, :]
    if mix.shape[0] != 1:
        raise ValueError(f"expected mono (1, n), got {mix.shape}")
    n = mix.shape[-1]
    chunk = max(int(round(chunk_s * fs)), 2)
    overlap = int(round(overlap_s * fs))
    overlap = max(min(overlap, chunk // 2), 1)
    hop = chunk - overlap

    if n <= chunk:
        starts = [0]
    else:
        starts = list(range(0, n - overlap, hop))

    # per-chunk normalization on TRUE length, then zero-pad to the chunk
    # (shared serving rule — train/losses.py:normalize_rows_host)
    from .train.losses import normalize_rows_host

    rows, means, stds = normalize_rows_host(
        [mix[:, s : s + chunk] for s in starts], chunk
    )

    # batched sampler runs over the single compiled (batch, 1, chunk) shape
    predictor = sampler_kwargs.pop("predictor_name", "reverse_diffusion")
    corrector = sampler_kwargs.pop("corrector_name", "ald2")
    ests = []
    for off in range(0, len(rows), batch):
        group = rows[off : off + batch]
        real = len(group)
        while len(group) < batch:
            group.append(np.zeros_like(group[0]))
        y = jnp.asarray(np.stack(group))
        sampler = model.get_pc_sampler(
            predictor,
            corrector,
            y,
            params,
            key=jax.random.fold_in(key, off),
            **sampler_kwargs,
        )
        est, _ = sampler()
        est = np.asarray(jax.device_get(est))
        for j in range(real):
            ests.append(est[j] * stds[off + j] + means[off + j])

    n_src = ests[0].shape[0]
    out = np.zeros((n_src, starts[-1] + chunk), np.float32)
    weight_ramp = 0.5 - 0.5 * np.cos(np.pi * np.arange(overlap) / overlap)

    for ci, (s, est) in enumerate(zip(starts, ests)):
        if ci == 0:
            out[:, s : s + chunk] = est
            continue
        # align this chunk's source order to what is already written
        tail = out[:, s : s + overlap]  # predecessor's overlap content
        head = est[:, :overlap]
        perm = _best_perm(tail, head)
        est = est[list(perm)]
        # raised-cosine crossfade over the overlap, hard copy beyond it
        out[:, s : s + overlap] = (
            (1.0 - weight_ramp) * out[:, s : s + overlap]
            + weight_ramp * est[:, :overlap]
        )
        out[:, s + overlap : s + chunk] = est[:, overlap:]
    return out[:, :n]
