"""Cross-cutting utils parity vs the ACTUAL reference utils/ run in-process:
the gradient clippers (utils/autoclip_module.py) driven step-for-step
against torch modules with injected gradients, the running StandardScaler
(utils/stats.py) on identical chunk sequences, and solve_psd_loaded
(utils/linalg.py) — where the reference's return line is demonstrably
buggy (it overwrites the solve result with a re-weighted copy of b,
linalg.py:34), so the deviation to the intended behavior is pinned by
running the reference and showing what it actually returns.
"""
import importlib
import sys
from pathlib import Path

import numpy as np
import pytest

import jax.numpy as jnp

from diffsep_tpu.train.clippers import AutoClipper, FixedClipper
from diffsep_tpu.utils import StandardScaler, solve_psd_loaded

REF_ROOT = "/root/reference"

pytestmark = pytest.mark.skipif(
    not Path(REF_ROOT, "utils/autoclip_module.py").exists(),
    reason="reference repo not available",
)


@pytest.fixture(scope="module")
def ref():
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    # the reference's utils/__init__.py imports checkpoint_symlink, which
    # needs pytorch_lightning (not in this image) — stub just enough
    if "pytorch_lightning" not in sys.modules:
        import types

        pl = types.ModuleType("pytorch_lightning")
        cb = types.ModuleType("pytorch_lightning.callbacks")
        cb.ModelCheckpoint = type("ModelCheckpoint", (), {})
        pl.callbacks = cb
        sys.modules["pytorch_lightning"] = pl
        sys.modules["pytorch_lightning.callbacks"] = cb
    return {
        "autoclip": importlib.import_module("utils.autoclip_module"),
        "stats": importlib.import_module("utils.stats"),
        "linalg": importlib.import_module("utils.linalg"),
    }


def _drive_ref_clipper(clipper, grads_seq):
    """Run a reference clipper over a sequence of injected gradients."""
    import torch

    net = torch.nn.Linear(4, 3, bias=False)
    out = []
    for g in grads_seq:
        net.weight.grad = torch.from_numpy(g.copy())
        gnorm, thresh = clipper(net)
        out.append(
            (float(gnorm), float(thresh), net.weight.grad.numpy().copy())
        )
    return out


def _drive_our_clipper(clipper, grads_seq):
    state = clipper.init()
    out = []
    for g in grads_seq:
        clipped, state, (norm, thresh) = clipper({"w": jnp.asarray(g)}, state)
        out.append((float(norm), float(thresh), np.asarray(clipped["w"])))
    return out


def _grads(n_steps, seed):
    rng = np.random.default_rng(seed)
    # norms spread over two decades so the percentile threshold moves and
    # clipping actually engages on the large-norm steps
    return [
        (rng.standard_normal((3, 4)) * 10.0 ** rng.uniform(-1, 1)).astype(
            np.float32
        )
        for _ in range(n_steps)
    ]


def test_fixed_clipper_matches_reference(ref):
    grads = _grads(6, 0)
    want = _drive_ref_clipper(ref["autoclip"].FixedClipper(1.0), grads)
    got = _drive_our_clipper(FixedClipper(1.0), grads)
    for (wn, wt, wg), (gn, gt, gg) in zip(want, got):
        assert np.isclose(gn, wn, rtol=1e-5)
        assert gt == wt == 1.0
        # torch's clip coefficient is max_norm/(norm + 1e-6), ours
        # max_norm/norm — identical to ~1e-6 relative
        np.testing.assert_allclose(gg, wg, rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("p", [10.0, 37.5, 90.0])
def test_auto_clipper_matches_reference(ref, p):
    """The percentile-of-history threshold sequence (insert-then-index
    semantics, autoclip_module.py:55-66) and the clipped gradients match
    the reference step for step."""
    grads = _grads(20, int(p))
    want = _drive_ref_clipper(ref["autoclip"].AutoClipper(p), grads)
    got = _drive_our_clipper(AutoClipper(p, capacity=64), grads)
    for step, ((wn, wt, wg), (gn, gt, gg)) in enumerate(zip(want, got)):
        assert np.isclose(gn, wn, rtol=1e-5), f"norm diverged at {step}"
        assert np.isclose(gt, wt, rtol=1e-5), f"threshold diverged at {step}"
        np.testing.assert_allclose(gg, wg, rtol=1e-4, atol=1e-6)


def test_standard_scaler_matches_reference(ref):
    import torch

    rng = np.random.default_rng(3)
    data = (rng.standard_normal((60, 7)) * 2.5 + 0.7).astype(np.float32)

    rsc = ref["stats"].StandardScaler(7, dim=-1)
    for chunk in np.split(data, [13, 27, 44]):
        rsc.update(torch.from_numpy(chunk))

    sc = StandardScaler(feature_shape=(7,))
    st = sc.init()
    for chunk in np.split(data, [13, 27, 44]):
        st = sc.update(st, jnp.asarray(chunk))

    np.testing.assert_allclose(np.asarray(st.mean), rsc.mean.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sc.std(st)), rsc.scale.numpy(),
                               rtol=1e-4, atol=1e-6)
    with torch.no_grad():
        want = rsc(torch.from_numpy(data)).numpy()
    got = np.asarray(sc.scale(st, jnp.asarray(data)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_solve_psd_loaded_reference_bug_and_our_intent(ref):
    """The reference's final line re-applies the weighting to b instead of
    returning the solve result (linalg.py:30-36: `x = _apply_weights(A, b,
    w_inv)` after b was already weighted), so it returns w_inv^2 * b — not
    a solution of the system. Run it and pin that fact; our implementation
    deliberately realizes the documented intent (diagonally-preconditioned
    loaded PSD solve), verified by the residual."""
    import torch

    rng = np.random.default_rng(4)
    m = rng.standard_normal((5, 5)).astype(np.float64)
    A = m @ m.T + 5.0 * np.eye(5)
    b = rng.standard_normal((5,)).astype(np.float64)

    ref_out = ref["linalg"].solve_psd_loaded(
        torch.from_numpy(A), torch.from_numpy(b)
    ).numpy()
    w_inv = 1.0 / np.sqrt(np.diag(A))
    np.testing.assert_allclose(ref_out, w_inv**2 * b, rtol=1e-10)
    assert not np.allclose(A @ ref_out, b, rtol=1e-3)  # not a solution

    ours = np.asarray(solve_psd_loaded(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(A @ ours, b, rtol=1e-4, atol=1e-5)
