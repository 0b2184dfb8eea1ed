"""ImprovedTransformerLayer parity vs the ACTUAL reference
(/root/reference/models/dptnet.py) run in-process on converted weights —
pins the DPTNet building block (multi-head attention -> residual -> gLN ->
RNN feed-forward -> residual -> gLN) against the torch original. The outer
DPTNet wiring (intra/inter transposes, head) is pure reshapes verified
structurally in models/dptnet.py.

Weight mapping notes:
  torch MultiheadAttention packs QKV as in_proj_weight (3E, E); flax splits
  per head: kernel (E, H, E/H) = W.T reshaped. torch RNN/LSTM add separate
  b_ih + b_hh; flax cells carry one bias on the input dense. torch LSTM and
  flax OptimizedLSTMCell share the i,f,g,o gate order.
"""
import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

from diffsep_tpu.models.dptnet import ImprovedTransformerLayer

REF_DIR = Path("/root/reference/models")


@pytest.fixture(scope="module")
def ref_dptnet():
    if not (REF_DIR / "dptnet.py").exists():
        pytest.skip("reference repo not available")
    import torch.nn as torch_nn

    # dptnet.py does relative imports `from .tcn import choose_norm` and
    # `from .utils import get_activation`: assemble a tiny package for it
    pkg = types.ModuleType("refmodels")
    pkg.__path__ = [str(REF_DIR)]
    saved = {k: sys.modules.get(k) for k in
             ("refmodels", "refmodels.tcn", "refmodels.utils",
              "refmodels.dptnet")}
    sys.modules["refmodels"] = pkg
    try:
        # the reference utils.py references nn.SILU, which this torch
        # version spells SiLU — dptnet only needs get_activation, so stub it
        utils_stub = types.ModuleType("refmodels.utils")
        utils_stub.get_activation = lambda name: {
            "relu": torch_nn.ReLU, "tanh": torch_nn.Tanh
        }[name]()
        sys.modules["refmodels.utils"] = utils_stub
        for name in ("tcn", "dptnet"):
            spec = importlib.util.spec_from_file_location(
                f"refmodels.{name}", REF_DIR / f"{name}.py"
            )
            mod = importlib.util.module_from_spec(spec)
            sys.modules[f"refmodels.{name}"] = mod
            spec.loader.exec_module(mod)
        yield sys.modules["refmodels.dptnet"]
    finally:
        for k, old in saved.items():
            if old is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = old


def _mha_params(sd, E, H):
    w = sd["self_attn.in_proj_weight"].detach().numpy()  # (3E, E)
    b = sd["self_attn.in_proj_bias"].detach().numpy()  # (3E,)
    out = {}
    for i, name in enumerate(("query", "key", "value")):
        out[name] = {
            "kernel": w[i * E:(i + 1) * E].T.reshape(E, H, E // H),
            "bias": b[i * E:(i + 1) * E].reshape(H, E // H),
        }
    out["out"] = {
        "kernel": sd["self_attn.out_proj.weight"].detach().numpy().T.reshape(
            H, E // H, E
        ),
        "bias": sd["self_attn.out_proj.bias"].detach().numpy(),
    }
    return out


def _rnn_cell_params(sd, suffix, rnn_type):
    wi = sd[f"rnn.weight_ih_l0{suffix}"].detach().numpy()  # (G*Hd, E)
    wh = sd[f"rnn.weight_hh_l0{suffix}"].detach().numpy()  # (G*Hd, Hd)
    bi = sd[f"rnn.bias_ih_l0{suffix}"].detach().numpy()
    bh = sd[f"rnn.bias_hh_l0{suffix}"].detach().numpy()
    if rnn_type == "RNN":
        return {
            "i": {"kernel": wi.T, "bias": bi + bh},
            "h": {"kernel": wh.T},
        }
    # LSTM: torch packs gates i,f,g,o along dim 0; flax OptimizedLSTMCell
    # keeps one dense per gate (i* biasless on the input, h* biased)
    Hd = wh.shape[1]
    out = {}
    for g, name in enumerate("ifgo"):
        sl = slice(g * Hd, (g + 1) * Hd)
        out[f"i{name}"] = {"kernel": wi[sl].T}
        out[f"h{name}"] = {"kernel": wh[sl].T, "bias": bi[sl] + bh[sl]}
    return out


def _norm(sd, key):
    return {
        "gamma": np.transpose(sd[f"{key}.gamma"].detach().numpy(), (0, 2, 1)),
        "beta": np.transpose(sd[f"{key}.beta"].detach().numpy(), (0, 2, 1)),
    }


@pytest.mark.parametrize("rnn_type,cellname", [("RNN", "SimpleCell"),
                                               ("LSTM", "OptimizedLSTMCell")])
def test_improved_transformer_layer_matches_reference(
    ref_dptnet, rnn_type, cellname
):
    import torch

    E, H, Hd, T, B = 8, 2, 6, 9, 3
    torch.manual_seed(0)
    ref = ref_dptnet.ImprovedTransformerLayer(
        rnn_type, E, H, Hd, dropout=0.0, activation="relu",
        bidirectional=True, norm="gLN",
    ).eval()
    with torch.no_grad():
        for q in ref.parameters():
            q.add_(0.1 * torch.randn_like(q))
    sd = ref.state_dict()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, T, E)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x)).numpy()

    params = {
        "self_attn": _mha_params(sd, E, H),
        "GlobalLayerNorm_0": _norm(sd, "norm_attn"),
        f"{cellname}_0": _rnn_cell_params(sd, "", rnn_type),  # forward dir
        f"{cellname}_1": _rnn_cell_params(sd, "_reverse", rnn_type),
        "feed_forward": {
            "kernel": sd["feed_forward.2.weight"].detach().numpy().T,
            "bias": sd["feed_forward.2.bias"].detach().numpy(),
        },
        "GlobalLayerNorm_1": _norm(sd, "norm_ff"),
    }
    ours = ImprovedTransformerLayer(rnn_type, E, H, Hd, 0.0, "relu", True, "gLN")
    got = np.asarray(ours.apply({"params": params}, x))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-5)
