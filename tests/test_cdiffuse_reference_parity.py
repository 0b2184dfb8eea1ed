"""DiffuSE/CDiffuse forward parity vs the ACTUAL reference
(/root/reference/models/cdiffuse_network.py) run in-process on converted
weights — closing the last backbone family that was only e2e/shape-tested
(NCSN++, TCN and DPTNet already have this pin).

Covers the full stack (input/condition projections, gated dilated residual
blocks with conditioner conv, skip-sum/sqrt(L), zero-init output head) and
BOTH time-embedding paths: the integer table lookup and the continuous-t
linear interpolation (including the reference's lerp-factor quirk of using
t - floor(t*50) rather than t*50 - floor(t*50), cdiffuse_network.py:58-63,
which our implementation reproduces deliberately).
"""
import importlib.util
from pathlib import Path

import numpy as np
import pytest

from diffsep_tpu.models.cdiffuse import DiffuSE, DiffusionEmbedding

REF = Path("/root/reference/models/cdiffuse_network.py")


@pytest.fixture(scope="module")
def ref_mod():
    if not REF.exists():
        pytest.skip("reference repo not available")
    spec = importlib.util.spec_from_file_location("ref_cdiffuse", REF)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def _t(sd, k):
    return np.asarray(sd[k].detach().numpy())


def _conv(sd, k):
    # torch Conv1d weight (out, in, k) -> flax Conv kernel (k, in, out)
    return np.transpose(_t(sd, k), (2, 1, 0))


def _dense(sd, k):
    # torch Linear weight (out, in) -> flax Dense kernel (in, out)
    return np.transpose(_t(sd, k), (1, 0))


def _convert(sd, n_layers):
    """Reference DiffuSE state_dict -> our flax param tree."""
    p = {
        "input_projection": {
            "kernel": _conv(sd, "input_projection.weight"),
            "bias": _t(sd, "input_projection.bias"),
        },
        "condition_projection": {
            "kernel": _conv(sd, "condition_projection.weight"),
            "bias": _t(sd, "condition_projection.bias"),
        },
        "diffusion_embedding": {
            "projection1": {
                "kernel": _dense(sd, "diffusion_embedding.projection1.weight"),
                "bias": _t(sd, "diffusion_embedding.projection1.bias"),
            },
            "projection2": {
                "kernel": _dense(sd, "diffusion_embedding.projection2.weight"),
                "bias": _t(sd, "diffusion_embedding.projection2.bias"),
            },
        },
        "skip_projection": {
            "kernel": _conv(sd, "skip_projection.weight"),
            "bias": _t(sd, "skip_projection.bias"),
        },
        "output_projection": {
            "kernel": _conv(sd, "output_projection.weight"),
            "bias": _t(sd, "output_projection.bias"),
        },
    }
    for i in range(n_layers):
        r = f"residual_layers.{i}"
        p[f"residual_layers_{i}"] = {
            "dilated_conv": {
                "kernel": _conv(sd, f"{r}.dilated_conv.weight"),
                "bias": _t(sd, f"{r}.dilated_conv.bias"),
            },
            "dilated_cond_conv": {
                "kernel": _conv(sd, f"{r}.dilated_cond_conv.weight"),
                "bias": _t(sd, f"{r}.dilated_cond_conv.bias"),
            },
            "diffusion_projection": {
                "kernel": _dense(sd, f"{r}.diffusion_projection.weight"),
                "bias": _t(sd, f"{r}.diffusion_projection.bias"),
            },
            "output_residual": {
                "kernel": _conv(sd, f"{r}.output_residual.weight"),
                "bias": _t(sd, f"{r}.output_residual.bias"),
            },
            "output_projection": {
                "kernel": _conv(sd, f"{r}.output_projection.weight"),
                "bias": _t(sd, f"{r}.output_projection.bias"),
            },
        }
    return {"params": p}


def _build_pair(ref_mod, n_in=3, n_out=2, layers=4, chans=8, cycle=2,
                emb_len=50):
    import torch

    torch.manual_seed(0)
    ref = ref_mod.DiffuSE(
        num_channels_in=n_in,
        num_channels_out=n_out,
        residual_layers=layers,
        residual_channels=chans,
        dilation_cycle_length=cycle,
        embedding_len=emb_len,
    ).eval()
    # the zero-init output head would hide output_projection conversion
    # errors; perturb every weight so nothing is identity/zero
    with torch.no_grad():
        for q in ref.parameters():
            q.add_(0.1 * torch.randn_like(q))

    ours = DiffuSE(
        num_channels_in=n_in,
        num_channels_out=n_out,
        residual_layers=layers,
        residual_channels=chans,
        dilation_cycle_length=cycle,
        embedding_len=emb_len,
    )
    variables = _convert(ref.state_dict(), layers)
    return ref, ours, variables


def test_diffuse_matches_reference_continuous_t(ref_mod):
    import torch

    ref, ours, variables = _build_pair(ref_mod)
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 3, 64)).astype(np.float32)
    y = rng.standard_normal((2, 1, 64)).astype(np.float32)
    # continuous times: interior lerp, an exact table grid point (floor ==
    # ceil), and near the top of the valid range (t*50 < emb_len - 1)
    t = np.array([0.372, 0.52], dtype=np.float32)

    with torch.no_grad():
        want = ref(
            torch.from_numpy(x), torch.from_numpy(t), torch.from_numpy(y)
        ).numpy()
    got = np.asarray(ours.apply(variables, x, t, y))

    assert got.shape == want.shape == (2, 2, 64)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


def test_diffuse_matches_reference_integer_steps(ref_mod):
    import torch

    ref, ours, variables = _build_pair(ref_mod)
    rng = np.random.default_rng(8)
    x = rng.standard_normal((2, 3, 48)).astype(np.float32)
    y = rng.standard_normal((2, 1, 48)).astype(np.float32)
    steps = np.array([0, 49], dtype=np.int32)  # table endpoints

    with torch.no_grad():
        want = ref(
            torch.from_numpy(x),
            torch.from_numpy(steps.astype(np.int64)),
            torch.from_numpy(y),
        ).numpy()
    got = np.asarray(ours.apply(variables, x, steps, y))

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)


def test_embedding_lerp_quirk_matches_reference(ref_mod):
    """The lerp factor is (t - low_idx), NOT (t*50 - low_idx)
    (cdiffuse_network.py:63). Pin the raw embedding path at a t where the
    two formulas differ grossly, so a 'fix' on our side would fail loudly."""
    import torch

    torch.manual_seed(1)
    ref = ref_mod.DiffusionEmbedding(50).eval()
    ours = DiffusionEmbedding(max_steps=50)
    sd = ref.state_dict()
    variables = {
        "params": {
            "projection1": {
                "kernel": _dense(sd, "projection1.weight"),
                "bias": _t(sd, "projection1.bias"),
            },
            "projection2": {
                "kernel": _dense(sd, "projection2.weight"),
                "bias": _t(sd, "projection2.bias"),
            },
        }
    }
    t = np.array([0.413, 0.8, 0.02], dtype=np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(t)).numpy()
    got = np.asarray(ours.apply(variables, t))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)
