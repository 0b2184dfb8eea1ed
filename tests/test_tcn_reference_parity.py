"""TCN forward parity vs the ACTUAL reference (/root/reference/models/tcn.py)
run in-process on converted weights — the same epistemic upgrade the SDE /
loss / NCSN++ parity tests got: our channels-last Flax rewrite is pinned
against the torch original, not just self-tested for shapes.

Covers both sequential layouts (non-causal, and causal where Chomp1d shifts
the DepthwiseSeparableConv indices), both norm families the recipe surface
uses (gLN / cLN), and two mask nonlinearities.
"""
import importlib.util
from pathlib import Path

import numpy as np
import pytest

from diffsep_tpu.models.tcn import TemporalConvNet

REF = Path("/root/reference/models/tcn.py")


@pytest.fixture(scope="module")
def ref_tcn():
    if not REF.exists():
        pytest.skip("reference repo not available")
    spec = importlib.util.spec_from_file_location("ref_tcn", REF)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


def _convert(sd, R, X, causal, block_norms, ds_norms):
    """Reference state_dict -> our flax param tree.

    torch Conv1d weight (out, in/groups, k) -> flax (k, in/groups, out);
    norm gamma/beta (1, C, 1) -> (1, 1, C); PReLU weight (1,) -> scalar.
    """
    t = lambda k: np.asarray(sd[k].detach().numpy())
    conv = lambda k: np.transpose(t(k), (2, 1, 0))
    nrm = lambda k: np.transpose(t(k), (0, 2, 1))

    params = {
        "layer_norm": {"gamma": nrm("network.0.gamma"), "beta": nrm("network.0.beta")},
        "bottleneck_conv1x1": {"kernel": conv("network.1.weight")},
        "mask_conv1x1": {"kernel": conv("network.3.weight")},
    }
    # inside DepthwiseSeparableConv, causal inserts a param-free Chomp1d at
    # index 1, shifting prelu/norm/pointwise from 1/2/3 to 2/3/4
    dp, dn, dpw = (2, 3, 4) if causal else (1, 2, 3)
    for r in range(R):
        for x in range(X):
            p = f"network.2.{r}.{x}.net"
            params[f"repeat_{r}_block_{x}"] = {
                "conv1x1": {"kernel": conv(f"{p}.0.weight")},
                "prelu": {"alpha": t(f"{p}.1.weight")[0]},
                block_norms: {
                    "gamma": nrm(f"{p}.2.gamma"),
                    "beta": nrm(f"{p}.2.beta"),
                },
                "dsconv": {
                    "depthwise_conv": {"kernel": conv(f"{p}.3.net.0.weight")},
                    "prelu": {"alpha": t(f"{p}.3.net.{dp}.weight")[0]},
                    ds_norms: {
                        "gamma": nrm(f"{p}.3.net.{dn}.gamma"),
                        "beta": nrm(f"{p}.3.net.{dn}.beta"),
                    },
                    "pointwise_conv": {"kernel": conv(f"{p}.3.net.{dpw}.weight")},
                },
            }
    return {"params": params}


@pytest.mark.parametrize(
    "norm_type,causal,mask_nl",
    [("gLN", False, "relu"), ("cLN", True, "softmax")],
)
def test_tcn_matches_reference(ref_tcn, norm_type, causal, mask_nl):
    import torch

    N, B, H, P, X, R, C, K = 8, 6, 12, 3, 2, 2, 2, 25
    torch.manual_seed(0)
    ref_net = ref_tcn.TemporalConvNet(
        N, B, H, P, X, R, C, norm_type=norm_type, causal=causal,
        mask_nonlinear=mask_nl,
    ).eval()
    # non-trivial weights: default init leaves norms at identity
    with torch.no_grad():
        for q in ref_net.parameters():
            q.add_(0.1 * torch.randn_like(q))

    rng = np.random.default_rng(42)
    x = rng.standard_normal((2, N, K)).astype(np.float32)
    with torch.no_grad():
        want = ref_net(torch.from_numpy(x)).numpy()

    ours = TemporalConvNet(
        N=N, B=B, H=H, P=P, X=X, R=R, C=C, norm_type=norm_type,
        causal=causal, mask_nonlinear=mask_nl,
    )
    norm_cls = (
        "GlobalLayerNorm_0" if norm_type == "gLN" else "ChannelwiseLayerNorm_0"
    )
    variables = _convert(
        ref_net.state_dict(), R, X, causal, norm_cls, norm_cls
    )
    got = np.asarray(ours.apply(variables, x))

    assert got.shape == want.shape == (2, C, N, K)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)
