"""NCSN++ backbone tests: shapes, module-walk integrity, and direct
numerical parity against the torch reference with converted weights.

The parity test instantiates the *actual* reference model
(/root/reference/models/ncsnpp.py) with its CUDA op stubbed by our JAX
upfirdn2d, converts its state_dict with models/convert.py, and compares
forward outputs — this exercises the full constructor walk, layer semantics,
and weight conversion at once (SURVEY.md §7.3 hard parts 1-3).
"""
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsep_tpu.models import NCSNpp
from diffsep_tpu.models.convert import convert_backbone_state_dict

SMALL = dict(
    nf=16,
    ch_mult=(1, 2, 2),
    num_res_blocks=1,
    attn_resolutions=(8,),
    image_size=32,
    num_channels_in=6,
    num_channels_out=4,
    fourier_scale=16.0,
)


def test_forward_shape():
    model = NCSNpp(**SMALL)
    x = jnp.zeros((2, 32, 64, 6))
    t = jnp.full((2,), 0.5)
    params = model.init(jax.random.PRNGKey(0), x, t)
    y = model.apply(params, x, t)
    assert y.shape == (2, 32, 64, 4)
    assert np.isfinite(np.asarray(y)).all()


def _install_reference_op_stub():
    """Stub the reference's CUDA extension with our JAX op so the torch
    reference model can run on CPU."""
    import torch

    from diffsep_tpu.ops.upfirdn2d import upfirdn2d as jax_upfirdn2d

    def upfirdn2d_torch(input, kernel, up=1, down=1, pad=(0, 0)):
        out = jax_upfirdn2d(
            jnp.asarray(input.detach().numpy()),
            jnp.asarray(kernel.detach().numpy()),
            up=up,
            down=down,
            pad=tuple(int(p) for p in pad),
        )
        return torch.from_numpy(np.asarray(out))

    op_mod = types.ModuleType("models.ncsnpp_utils.op")
    op_mod.upfirdn2d = upfirdn2d_torch
    op_mod.fused_leaky_relu = None
    op_mod.FusedLeakyReLU = None
    sys.modules["models.ncsnpp_utils.op"] = op_mod


@pytest.fixture(scope="module")
def reference_ncsnpp():
    sys.path.insert(0, "/root/reference")
    _install_reference_op_stub()
    import importlib

    mod = importlib.import_module("models.ncsnpp")

    # The reference's fused upsample_conv_2d is unrunnable on modern torch
    # (negative-step slicing, up_or_down_sampling.py:135). Bridge it to our
    # JAX implementation — which is itself validated against a torch
    # composition in test_upfirdn2d.py — so walk-level parity of the
    # residual-progressive configs can still be checked.
    import torch

    from diffsep_tpu.ops.resampling import upsample_conv_2d as jax_upsample_conv_2d

    uods = importlib.import_module("models.ncsnpp_utils.up_or_down_sampling")

    def upsample_conv_2d_bridge(x, w, k=None, factor=2, gain=1):
        out = jax_upsample_conv_2d(
            jnp.asarray(x.detach().numpy()),
            jnp.asarray(w.detach().numpy()),
            k=k,
            factor=factor,
            gain=gain,
        )
        return torch.from_numpy(np.asarray(out))

    uods.upsample_conv_2d = upsample_conv_2d_bridge

    yield mod.NCSNpp
    sys.path.remove("/root/reference")


@pytest.mark.parametrize(
    "overrides",
    [
        {},  # biggan + fir + output_skip/input_skip (production shape)
        {"progressive": "none", "progressive_input": "none"},
        # fir=False with progressive pyramids would hit a reference bug
        # (layerspp.py:128 passes "nearest" as scale_factor, a TypeError on
        # modern torch), so exercise the naive-resample blocks pyramid-free
        {"fir": False, "progressive": "none", "progressive_input": "none"},
        # ddpm up/down modules are unrunnable in the reference on modern
        # torch (negative-step slicing in up_or_down_sampling.py:135), so
        # exercise the DDPM resblock + attention at a single resolution
        {"resblock_type": "ddpm", "ch_mult": (1,), "attn_resolutions": (32,)},
        {"progressive": "residual", "progressive_input": "residual"},
        {"progressive_combine": "cat"},
    ],
)
def test_parity_with_torch_reference(rng, reference_ncsnpp, overrides):
    import torch

    cfg = {**SMALL, **overrides}
    torch_model = reference_ncsnpp(**{k: (list(v) if k == "fir_kernel" else v) for k, v in cfg.items()})
    torch_model.eval()

    flax_model = NCSNpp(**cfg)
    x = rng.uniform(-1, 1, (2, 32, 16, 6)).astype(np.float32)  # NHWC
    t = np.asarray([0.4, 0.9], np.float32)

    with torch.no_grad():
        ref = torch_model(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(t)
        ).numpy()

    params = {"params": convert_backbone_state_dict(torch_model.state_dict())}
    ours = np.asarray(flax_model.apply(params, jnp.asarray(x), jnp.asarray(t)))
    ours = ours.transpose(0, 3, 1, 2)

    assert ours.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(ours, ref, atol=2e-4 * max(scale, 1.0), rtol=1e-3)


def test_bfloat16_compute_matches_float32(rng):
    """bf16 compute dtype keeps f32 params and stays close to the f32
    forward (the mixed-precision inference/training path)."""
    x = rng.uniform(-1, 1, (1, 32, 16, 6)).astype(np.float32)
    t = np.asarray([0.5], np.float32)
    m32 = NCSNpp(**SMALL)
    params = m32.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(t))
    y32 = np.asarray(m32.apply(params, jnp.asarray(x), jnp.asarray(t)))

    m16 = NCSNpp(**SMALL, dtype="bfloat16")
    y16 = np.asarray(m16.apply(params, jnp.asarray(x), jnp.asarray(t)))
    assert y16.dtype == np.float32  # output is always f32
    scale = np.abs(y32).max()
    assert np.abs(y16 - y32).max() < 0.05 * max(scale, 1.0)


def test_flax_to_torch_export_loads_in_reference(rng, reference_ncsnpp):
    """Reverse interop: weights trained HERE, exported with
    flax_to_backbone_state_dict, must load into the actual torch reference
    with strict=True and reproduce our forward — and round-trip back to
    the identical flax tree."""
    import torch

    from diffsep_tpu.models.convert import flax_to_backbone_state_dict

    flax_model = NCSNpp(**SMALL)
    x = rng.uniform(-1, 1, (2, 32, 16, 6)).astype(np.float32)  # NHWC
    t = np.asarray([0.3, 0.8], np.float32)
    params = flax_model.init(
        jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(t)
    )
    ours = np.asarray(
        flax_model.apply(params, jnp.asarray(x), jnp.asarray(t))
    ).transpose(0, 3, 1, 2)

    sd = flax_to_backbone_state_dict(params["params"])
    torch_model = reference_ncsnpp(**SMALL)
    torch_model.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=True
    )
    torch_model.eval()
    with torch.no_grad():
        ref = torch_model(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(t)
        ).numpy()
    scale = np.abs(ref).max()
    np.testing.assert_allclose(
        ours, ref, atol=2e-4 * max(scale, 1.0), rtol=1e-3
    )

    # exact round-trip back to the identical flax tree
    rt = convert_backbone_state_dict(sd)
    flat_rt = dict(jax.tree_util.tree_leaves_with_path(rt))
    flat_in = jax.tree_util.tree_leaves_with_path(params["params"])
    assert len(flat_rt) == len(flat_in)
    for path, leaf in flat_in:
        np.testing.assert_array_equal(flat_rt[path], np.asarray(leaf))


def test_ema_shadow_conversion(reference_ncsnpp):
    """EMA shadow-list -> flax params mapping (models/convert.py).

    The HF checkpoint stores torch_ema shadow_params as an ordered list
    over trainable parameters (pl_model.py:672-673); verify the order
    reconstruction by converting a synthetic shadow list (2x each trainable
    param) and checking every converted leaf doubled — except the frozen
    Fourier W which must come through unscaled."""
    import torch

    from diffsep_tpu.models.convert import convert_ema_backbone

    torch_model = reference_ncsnpp(**SMALL)
    sd = {f"score_model.backbone.{k}": v for k, v in torch_model.state_dict().items()}
    shadow = [
        2.0 * p.detach().clone()
        for p in torch_model.parameters()
        if p.requires_grad
    ]
    ema_params = convert_ema_backbone(sd, shadow)
    raw_params = convert_backbone_state_dict(torch_model.state_dict())

    flat_e = jax.tree_util.tree_leaves_with_path(ema_params)
    flat_r = dict(jax.tree_util.tree_leaves_with_path(raw_params))
    checked = 0
    for path, leaf in flat_e:
        raw = flat_r[path]
        name = jax.tree_util.keystr(path)
        if "all_modules_0" in name and name.endswith("'W']"):
            np.testing.assert_allclose(leaf, raw)  # frozen W not averaged
        else:
            np.testing.assert_allclose(leaf, 2.0 * raw, rtol=1e-6)
        checked += 1
    assert checked == len(flat_r)


def test_flagship_depth_parity(rng, reference_ncsnpp):
    """Weight-conversion + forward parity at the FLAGSHIP's structural
    depth: 7 levels ch_mult=(1,1,2,2,2,2,2), num_res_blocks=2, attention at
    frequency-resolution 16, progressive output_skip/input_skip — the full
    production module-list walk (ncsnpp.py:107-308) whose m_idx accounting
    and pyramid plumbing the 3-level cases above cannot reach.  nf is kept
    small (8) so the torch CPU forward stays fast; depth, not width, is
    what the conversion walk depends on.  Frequency dim 256 like the real
    model (n_fft 510 -> 256 bins) so attention actually fires at 16 after
    four downsamplings (the audio-specific h.shape[-2] trigger,
    ncsnpp.py:367-369)."""
    import torch

    cfg = dict(
        nf=8,
        ch_mult=(1, 1, 2, 2, 2, 2, 2),
        num_res_blocks=2,
        attn_resolutions=(16,),
        image_size=256,
        num_channels_in=6,
        num_channels_out=4,
        fourier_scale=16.0,
    )
    torch_model = reference_ncsnpp(**cfg)
    torch_model.eval()
    flax_model = NCSNpp(**cfg)

    x = rng.uniform(-1, 1, (1, 256, 64, 6)).astype(np.float32)  # NHWC
    t = np.asarray([0.6], np.float32)
    with torch.no_grad():
        ref = torch_model(
            torch.from_numpy(x.transpose(0, 3, 1, 2)), torch.from_numpy(t)
        ).numpy()
    params = {"params": convert_backbone_state_dict(torch_model.state_dict())}
    ours = np.asarray(
        flax_model.apply(params, jnp.asarray(x), jnp.asarray(t))
    ).transpose(0, 3, 1, 2)
    assert ours.shape == ref.shape == (1, 4, 256, 64)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(
        ours, ref, atol=5e-4 * max(scale, 1.0), rtol=1e-3
    )
