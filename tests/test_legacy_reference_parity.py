"""Legacy NCSNv1/v2 + DDPM layer-library parity vs the ACTUAL reference
(/root/reference/models/ncsnpp_utils/{layers,normalization}.py) run
in-process on converted weights.

These 1,000 LoC of reference code were previously covered only by
shape/smoke tests plus one hand-derived torch-formula check; this pins the
whole RefineNet family (CRP/RCU/MSF/Refine + conditional variants), the
ConvMeanPool/MeanPoolConv/UpsampleConv resamplers, both residual blocks,
the DDPM resblock, and every normalization variant against the torch
originals. Writing it surfaced three real semantic deviations, fixed in
the implementation:

  * MSFBlock used half-pixel bilinear resize where the reference uses
    F.interpolate(align_corners=True) (layers.py:292,316);
  * UpsampleConv treated cat([x]*4)+PixelShuffle(2) as nearest upsampling
    — it is a per-position channel rotation x[(4c+2i+j) mod C] except at
    C=1 (layers.py:485-489);
  * VarianceNorm2d / ConditionalVarianceNorm2d used the biased variance
    where torch.var defaults to unbiased (normalization.py:117,133);

plus one missing variant (ConditionalBatchNorm2d, normalization.py:45-71),
added.

Known reference quirk NOT reproduced: ncsn_conv3x3 hard-codes padding=1
(layers.py:121-137), so the reference's dilation>1 ResidualBlock branches
shrink h and crash on the residual add; our version pads by the dilation.
Parity is pinned at dilation=1, the only runnable configuration.
"""
import importlib
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsep_tpu.models import legacy_layers as L
from diffsep_tpu.models import normalization as Nz

REF_ROOT = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    import pathlib

    if not pathlib.Path(REF_ROOT, "models/ncsnpp_utils/layers.py").exists():
        pytest.skip("reference repo not available")
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    layers = importlib.import_module("models.ncsnpp_utils.layers")
    norm = importlib.import_module("models.ncsnpp_utils.normalization")

    # Latent reference bug: ncsn_conv3x3 unconditionally scales conv.bias
    # (layers.py:137), so every bias=False construction — which includes
    # ALL CRP/RCU convs and therefore the whole RefineNet family — crashes
    # with AttributeError before a forward can run. Patch that single line
    # (guard the bias scale) so the intended semantics are exercisable;
    # everything else is the reference's own code.
    import torch

    def _ncsn_conv3x3(in_planes, out_planes, stride=1, bias=True,
                      dilation=1, init_scale=1.0, padding=1):
        init_scale = 1e-10 if init_scale == 0 else init_scale
        conv = torch.nn.Conv2d(
            in_planes, out_planes, stride=stride, bias=bias,
            dilation=dilation, padding=padding, kernel_size=3,
        )
        conv.weight.data *= init_scale
        if conv.bias is not None:
            conv.bias.data *= init_scale
        return conv

    layers.ncsn_conv3x3 = _ncsn_conv3x3
    return layers, norm


def _perturb(mod, seed=0):
    import torch

    torch.manual_seed(seed)
    with torch.no_grad():
        for q in mod.parameters():
            q.add_(0.1 * torch.randn_like(q))
    return mod


def _np(p):
    return np.asarray(p.detach().numpy())


def _conv(mod):
    # torch Conv2d weight (out, in, kh, kw) -> flax (kh, kw, in, out)
    p = {"kernel": np.transpose(_np(mod.weight), (2, 3, 1, 0))}
    if mod.bias is not None:
        p["bias"] = _np(mod.bias)
    return p


def _embed(mod):
    return {"Embed_0": {"embedding": _np(mod.weight)}}


def _cin_plus(mod):
    # our ConditionalInstanceNorm2dPlus: raw embedding matrix
    return _embed(mod.embed)


def _in_plus(mod):
    # our InstanceNorm2dPlus stores alpha/gamma as offsets from 1.0
    p = {"alpha": _np(mod.alpha) - 1.0, "gamma": _np(mod.gamma) - 1.0}
    if mod.bias:
        p["beta"] = _np(mod.beta)
    return p


def _rcu(mod, n_blocks, n_stages):
    return {
        f"{i + 1}_{j + 1}_conv": _conv(getattr(mod, f"{i + 1}_{j + 1}_conv"))
        for i in range(n_blocks)
        for j in range(n_stages)
    }


def _cond_rcu(mod, n_blocks, n_stages):
    p = {}
    for i in range(n_blocks):
        for j in range(n_stages):
            p[f"{i + 1}_{j + 1}_conv"] = _conv(
                getattr(mod, f"{i + 1}_{j + 1}_conv")
            )
            p[f"{i + 1}_{j + 1}_norm"] = _cin_plus(
                getattr(mod, f"{i + 1}_{j + 1}_norm")
            )
    return p


def _crp(mod, n_stages):
    return {f"convs_{i}": _conv(mod.convs[i]) for i in range(n_stages)}


def _cond_crp(mod, n_stages):
    p = {f"convs_{i}": _conv(mod.convs[i]) for i in range(n_stages)}
    p.update({f"norms_{i}": _cin_plus(mod.norms[i]) for i in range(n_stages)})
    return p


def _msf(mod, n):
    return {f"convs_{i}": _conv(mod.convs[i]) for i in range(n)}


def _cond_msf(mod, n):
    p = {f"convs_{i}": _conv(mod.convs[i]) for i in range(n)}
    p.update({f"norms_{i}": _cin_plus(mod.norms[i]) for i in range(n)})
    return p


def _nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def _nchw(x):
    return np.transpose(np.asarray(x), (0, 3, 1, 2))


def _rand(shape, seed):
    return np.random.default_rng(seed).standard_normal(shape).astype(
        np.float32
    )


def _close(got_nhwc, want_nchw, tol=2e-5):
    np.testing.assert_allclose(
        _nchw(got_nhwc), want_nchw, rtol=1e-4, atol=tol
    )


# ---------------------------------------------------------------- norms


def _run_ref(mod, *args):
    import torch

    with torch.no_grad():
        return mod(*[torch.from_numpy(a) for a in args]).numpy()


@pytest.mark.parametrize("bias", [True, False])
def test_conditional_instance_norm(ref, bias):
    _, rn = ref
    m = _perturb(rn.ConditionalInstanceNorm2d(6, 4, bias=bias), 1)
    x = _rand((3, 6, 5, 7), 10)
    y = np.array([0, 3, 1])
    want = _run_ref(m, x, y)
    ours = Nz.ConditionalInstanceNorm2d(6, 4, bias=bias)
    got = ours.apply({"params": _embed(m.embed)}, _nhwc(x), jnp.asarray(y))
    _close(got, want)


def test_conditional_variance_norm(ref):
    _, rn = ref
    m = _perturb(rn.ConditionalVarianceNorm2d(6, 4), 2)
    x = _rand((3, 6, 5, 7), 11)
    y = np.array([2, 0, 1])
    want = _run_ref(m, x, y)
    got = Nz.ConditionalVarianceNorm2d(6, 4).apply(
        {"params": _embed(m.embed)}, _nhwc(x), jnp.asarray(y)
    )
    _close(got, want)


def test_variance_norm(ref):
    _, rn = ref
    m = _perturb(rn.VarianceNorm2d(6), 3)
    x = _rand((2, 6, 5, 7), 12)
    want = _run_ref(m, x)
    got = Nz.VarianceNorm2d(6).apply(
        {"params": {"alpha": _np(m.alpha) - 1.0}}, _nhwc(x)
    )
    _close(got, want)


@pytest.mark.parametrize("bias", [True, False])
def test_conditional_none_norm(ref, bias):
    _, rn = ref
    m = _perturb(rn.ConditionalNoneNorm2d(6, 4, bias=bias), 4)
    x = _rand((3, 6, 5, 7), 13)
    y = np.array([1, 2, 3])
    want = _run_ref(m, x, y)
    got = Nz.ConditionalNoneNorm2d(6, 4, bias=bias).apply(
        {"params": _embed(m.embed)}, _nhwc(x), jnp.asarray(y)
    )
    _close(got, want)


@pytest.mark.parametrize("bias", [True, False])
def test_instance_norm_plus_vs_reference(ref, bias):
    _, rn = ref
    m = _perturb(rn.InstanceNorm2dPlus(6, bias=bias), 5)
    x = _rand((3, 6, 5, 7), 14)
    want = _run_ref(m, x)
    got = Nz.InstanceNorm2dPlus(6, bias=bias).apply(
        {"params": _in_plus(m)}, _nhwc(x)
    )
    _close(got, want)


@pytest.mark.parametrize("bias", [True, False])
def test_conditional_instance_norm_plus_vs_reference(ref, bias):
    _, rn = ref
    m = _perturb(rn.ConditionalInstanceNorm2dPlus(6, 4, bias=bias), 6)
    x = _rand((3, 6, 5, 7), 15)
    y = np.array([0, 1, 3])
    want = _run_ref(m, x, y)
    got = Nz.ConditionalInstanceNorm2dPlus(6, 4, bias=bias).apply(
        {"params": _cin_plus(m)}, _nhwc(x), jnp.asarray(y)
    )
    _close(got, want)


def test_conditional_batch_norm_train_and_eval(ref):
    import torch

    _, rn = ref
    m = _perturb(rn.ConditionalBatchNorm2d(6, 4), 7)
    x = _rand((3, 6, 5, 7), 16)
    y = np.array([0, 2, 1])

    # train mode: both sides normalize with biased batch statistics
    m.train()
    with torch.no_grad():
        want_train = m(torch.from_numpy(x), torch.from_numpy(y)).numpy()
    ours = Nz.ConditionalBatchNorm2d(6, 4)
    variables = {
        "params": {"Embed_0": {"embedding": _np(m.embed.weight)}},
        "batch_stats": {
            "bn": {"mean": np.zeros(6, np.float32),
                   "var": np.ones(6, np.float32)},
        },
    }
    got_train, mutated = ours.apply(
        variables, _nhwc(x), jnp.asarray(y), train=True,
        mutable=["batch_stats"],
    )
    _close(got_train, want_train)

    # the mutated running stats must match torch's update (torch uses the
    # UNBIASED batch variance for running_var, biased for normalization —
    # ADVICE r3); m.bn started from the default mean=0/var=1 stats, so the
    # one train pass above updated them identically on both sides
    np.testing.assert_allclose(
        mutated["batch_stats"]["bn"]["mean"], _np(m.bn.running_mean),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        mutated["batch_stats"]["bn"]["var"], _np(m.bn.running_var),
        rtol=1e-5, atol=1e-6,
    )

    # eval mode: normalize with the (converted) running statistics
    m.eval()
    with torch.no_grad():
        want_eval = m(torch.from_numpy(x), torch.from_numpy(y)).numpy()
    variables["batch_stats"] = {
        "bn": {"mean": _np(m.bn.running_mean), "var": _np(m.bn.running_var)},
    }
    got_eval = ours.apply(variables, _nhwc(x), jnp.asarray(y), train=False)
    _close(got_eval, want_eval)


# ------------------------------------------------------- RefineNet family


@pytest.mark.parametrize("maxpool", [True, False])
def test_crp_block(ref, maxpool):
    rl, _ = ref
    m = _perturb(rl.CRPBlock(6, 3, maxpool=maxpool), 8)
    x = _rand((2, 6, 8, 9), 17)
    want = _run_ref(m, x)
    got = L.CRPBlock(6, 3, maxpool=maxpool).apply(
        {"params": _crp(m, 3)}, _nhwc(x)
    )
    _close(got, want)


def test_cond_crp_block(ref):
    rl, rn = ref
    m = _perturb(rl.CondCRPBlock(6, 2, 4, rn.ConditionalInstanceNorm2dPlus), 9)
    x = _rand((2, 6, 8, 9), 18)
    y = np.array([1, 3])
    want = _run_ref(m, x, y)
    got = L.CondCRPBlock(
        6, 2, 4, Nz.ConditionalInstanceNorm2dPlus
    ).apply({"params": _cond_crp(m, 2)}, _nhwc(x), jnp.asarray(y))
    _close(got, want)


def test_rcu_block(ref):
    rl, _ = ref
    m = _perturb(rl.RCUBlock(6, 2, 2), 10)
    x = _rand((2, 6, 8, 9), 19)
    want = _run_ref(m, x)
    got = L.RCUBlock(6, 2, 2).apply({"params": _rcu(m, 2, 2)}, _nhwc(x))
    _close(got, want)


def test_cond_rcu_block(ref):
    rl, rn = ref
    m = _perturb(
        rl.CondRCUBlock(6, 2, 2, 4, rn.ConditionalInstanceNorm2dPlus), 11
    )
    x = _rand((2, 6, 8, 9), 20)
    y = np.array([0, 2])
    want = _run_ref(m, x, y)
    got = L.CondRCUBlock(
        6, 2, 2, 4, Nz.ConditionalInstanceNorm2dPlus
    ).apply({"params": _cond_rcu(m, 2, 2)}, _nhwc(x), jnp.asarray(y))
    _close(got, want)


def test_msf_block_aligned_bilinear(ref):
    rl, _ = ref
    m = _perturb(rl.MSFBlock([4, 6], 5), 12)
    xs = [_rand((2, 4, 4, 5), 21), _rand((2, 6, 8, 10), 22)]
    import torch

    with torch.no_grad():
        want = m([torch.from_numpy(q) for q in xs], (8, 10)).numpy()
    got = L.MSFBlock(5).apply(
        {"params": _msf(m, 2)}, [jnp.asarray(_nhwc(q)) for q in xs], (8, 10)
    )
    _close(got, want, tol=3e-5)


def test_cond_msf_block(ref):
    import torch

    rl, rn = ref
    m = _perturb(
        rl.CondMSFBlock([4, 6], 5, 4, rn.ConditionalInstanceNorm2dPlus), 13
    )
    xs = [_rand((2, 4, 4, 5), 23), _rand((2, 6, 8, 10), 24)]
    y = np.array([3, 1])
    with torch.no_grad():
        want = m(
            [torch.from_numpy(q) for q in xs], torch.from_numpy(y), (8, 10)
        ).numpy()
    got = L.CondMSFBlock(5, 4, Nz.ConditionalInstanceNorm2dPlus).apply(
        {"params": _cond_msf(m, 2)},
        [jnp.asarray(_nhwc(q)) for q in xs],
        jnp.asarray(y),
        (8, 10),
    )
    _close(got, want, tol=3e-5)


@pytest.mark.parametrize("start,end", [(True, False), (False, True)])
def test_refine_block(ref, start, end):
    import torch

    rl, _ = ref
    if start:
        in_planes, shapes, out_shape = [6], [(2, 6, 8, 9)], (8, 9)
    else:
        in_planes = [4, 6]
        shapes = [(2, 4, 4, 5), (2, 6, 8, 10)]
        out_shape = (8, 10)
    m = _perturb(rl.RefineBlock(in_planes, 6, start=start, end=end), 14)
    xs = [_rand(s, 30 + i) for i, s in enumerate(shapes)]
    with torch.no_grad():
        want = m([torch.from_numpy(q) for q in xs], out_shape).numpy()

    p = {
        f"adapt_convs_{i}": _rcu(m.adapt_convs[i], 2, 2)
        for i in range(len(in_planes))
    }
    p["crp"] = _crp(m.crp, 2)
    p["output_convs"] = _rcu(m.output_convs, 3 if end else 1, 2)
    if len(in_planes) > 1:
        p["msf"] = _msf(m.msf, len(in_planes))
    got = L.RefineBlock(6, start=start, end=end).apply(
        {"params": p}, [jnp.asarray(_nhwc(q)) for q in xs], out_shape
    )
    _close(got, want, tol=3e-5)


def test_cond_refine_block(ref):
    import torch

    rl, rn = ref
    in_planes = [4, 6]
    m = _perturb(
        rl.CondRefineBlock(
            in_planes, 6, 4, rn.ConditionalInstanceNorm2dPlus
        ),
        15,
    )
    xs = [_rand((2, 4, 4, 5), 40), _rand((2, 6, 8, 10), 41)]
    y = np.array([2, 0])
    with torch.no_grad():
        want = m(
            [torch.from_numpy(q) for q in xs], torch.from_numpy(y), (8, 10)
        ).numpy()

    p = {
        f"adapt_convs_{i}": _cond_rcu(m.adapt_convs[i], 2, 2)
        for i in range(2)
    }
    p["crp"] = _cond_crp(m.crp, 2)
    p["output_convs"] = _cond_rcu(m.output_convs, 1, 2)
    p["msf"] = _cond_msf(m.msf, 2)
    got = L.CondRefineBlock(
        6, 4, Nz.ConditionalInstanceNorm2dPlus
    ).apply(
        {"params": p},
        [jnp.asarray(_nhwc(q)) for q in xs],
        jnp.asarray(y),
        (8, 10),
    )
    _close(got, want, tol=3e-5)


# ------------------------------------------------------------ resamplers


@pytest.mark.parametrize("adjust", [False, True])
def test_conv_mean_pool(ref, adjust):
    rl, _ = ref
    # adjust_padding exists for odd spatial sizes (ZeroPad2d (1,0,1,0))
    h, w = (7, 9) if adjust else (8, 10)
    m = _perturb(rl.ConvMeanPool(4, 6, 3, adjust_padding=adjust), 16)
    x = _rand((2, 4, h, w), 50)
    want = _run_ref(m, x)
    conv = m.conv[1] if adjust else m.conv
    got = L.ConvMeanPool(6, 3, adjust_padding=adjust).apply(
        {"params": {"conv": _conv(conv)}}, _nhwc(x)
    )
    _close(got, want)


def test_mean_pool_conv(ref):
    rl, _ = ref
    m = _perturb(rl.MeanPoolConv(4, 6, 3), 17)
    x = _rand((2, 4, 8, 10), 51)
    want = _run_ref(m, x)
    got = L.MeanPoolConv(6, 3).apply(
        {"params": {"conv": _conv(m.conv)}}, _nhwc(x)
    )
    _close(got, want)


@pytest.mark.parametrize("chans", [1, 3, 4])
def test_upsample_conv_channel_rotation(ref, chans):
    """cat x4 + PixelShuffle is only nearest-upsampling at C=1; the exact
    channel rotation must match at every C (layers.py:473-490)."""
    rl, _ = ref
    m = _perturb(rl.UpsampleConv(chans, 5, 3), 18)
    x = _rand((2, chans, 6, 7), 52)
    want = _run_ref(m, x)
    got = L.UpsampleConv(5, 3).apply(
        {"params": {"conv": _conv(m.conv)}}, _nhwc(x)
    )
    _close(got, want)


# -------------------------------------------------------- residual blocks


def test_residual_block_plain_same_dim(ref):
    rl, _ = ref
    m = _perturb(rl.ResidualBlock(6, 6, resample=None, dilation=1), 19)
    x = _rand((2, 6, 8, 9), 60)
    want = _run_ref(m, x)
    p = {"conv1": _conv(m.conv1), "conv2": _conv(m.conv2)}
    got = L.ResidualBlock(6, resample=None).apply({"params": p}, _nhwc(x))
    _close(got, want)


def test_residual_block_plain_dim_change(ref):
    rl, _ = ref
    m = _perturb(rl.ResidualBlock(4, 6, resample=None, dilation=1), 20)
    x = _rand((2, 4, 8, 9), 61)
    want = _run_ref(m, x)
    p = {
        "conv1": _conv(m.conv1),
        "conv2": _conv(m.conv2),
        "shortcut": _conv(m.shortcut),
    }
    got = L.ResidualBlock(6, resample=None).apply({"params": p}, _nhwc(x))
    _close(got, want)


def test_residual_block_down(ref):
    rl, _ = ref
    m = _perturb(rl.ResidualBlock(4, 6, resample="down", dilation=1), 21)
    x = _rand((2, 4, 8, 10), 62)
    want = _run_ref(m, x)
    p = {
        "conv1": _conv(m.conv1),
        "conv2": {"conv": _conv(m.conv2.conv)},
        "shortcut": {"conv": _conv(m.shortcut.conv)},
    }
    got = L.ResidualBlock(6, resample="down").apply({"params": p}, _nhwc(x))
    _close(got, want)


def test_cond_residual_block_down(ref):
    rl, _ = ref
    m = _perturb(
        rl.ConditionalResidualBlock(4, 6, 4, resample="down", dilation=1), 22
    )
    x = _rand((2, 4, 8, 10), 63)
    y = np.array([1, 3])
    want = _run_ref(m, x, y)
    p = {
        "conv1": _conv(m.conv1),
        "conv2": {"conv": _conv(m.conv2.conv)},
        "shortcut": {"conv": _conv(m.shortcut.conv)},
        "normalize1": _cin_plus(m.normalize1),
        "normalize2": _cin_plus(m.normalize2),
    }
    got = L.ConditionalResidualBlock(6, 4, resample="down").apply(
        {"params": p}, _nhwc(x), jnp.asarray(y)
    )
    _close(got, want)


def test_resnet_block_ddpm(ref):
    import torch

    rl, _ = ref
    act = torch.nn.SiLU()
    m = _perturb(
        rl.ResnetBlockDDPM(act, 32, out_ch=64, temb_dim=16, dropout=0.0), 23
    ).eval()
    x = _rand((2, 32, 6, 7), 70)
    temb = _rand((2, 16), 71)
    with torch.no_grad():
        want = m(torch.from_numpy(x), torch.from_numpy(temb)).numpy()
    p = {
        "GroupNorm_0": {"scale": _np(m.GroupNorm_0.weight),
                        "bias": _np(m.GroupNorm_0.bias)},
        "Conv_0": _conv(m.Conv_0),
        "Dense_0": {"kernel": _np(m.Dense_0.weight).T,
                    "bias": _np(m.Dense_0.bias)},
        "GroupNorm_1": {"scale": _np(m.GroupNorm_1.weight),
                        "bias": _np(m.GroupNorm_1.bias)},
        "Conv_1": _conv(m.Conv_1),
        "NIN_0": {"W": _np(m.NIN_0.W), "b": _np(m.NIN_0.b)},
    }
    got = L.ResnetBlockDDPM(act=jax.nn.silu, out_ch=64, dropout=0.0).apply(
        {"params": p}, _nhwc(x), jnp.asarray(temb)
    )
    _close(got, want, tol=3e-5)
