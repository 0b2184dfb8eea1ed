"""PyTorch -> Flax checkpoint conversion for the NCSN++ score model.

The reference publishes trained weights on HF Hub (`fakufaku/diffsep`,
separate.py:25,39) as a PyTorch Lightning checkpoint whose score network is
a module-list-indexed NCSN++ (`all_modules.<i>`, models/ncsnpp.py:308).
Our Flax NCSNpp names its submodules `all_modules_<i>` in the identical
constructor order, so conversion is a mechanical per-layer rename + layout
transpose:

  torch Conv2d  (O, I, kh, kw)  ->  flax Conv kernel (kh, kw, I, O)
  torch Linear  (O, I)          ->  flax Dense kernel (I, O)
  torch GroupNorm weight/bias   ->  flax GroupNorm scale/bias
  NIN W/b, Fourier W            ->  unchanged
  StyleGAN2 fused Conv2d_0      ->  kept OIHW (FusedResampleConv stores
                                    torch layout natively)
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

__all__ = [
    "convert_backbone_state_dict",
    "convert_score_model_state_dict",
    "flax_to_backbone_state_dict",
    "flax_to_score_model_state_dict",
    "save_reference_checkpoint",
]


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _convert_leaf(path: Tuple[str, ...], arr: np.ndarray):
    """Map one torch (path, tensor) to a flax (path, array)."""
    name = path[-1]
    parent = path[-2] if len(path) >= 2 else ""
    if name == "weight":
        if parent.startswith("Conv2d"):
            # StyleGAN2 fused resample conv keeps torch OIHW layout
            return path[:-1] + ("weight",), arr
        if arr.ndim == 4:  # Conv2d -> HWIO
            return path[:-1] + ("kernel",), arr.transpose(2, 3, 1, 0)
        if arr.ndim == 2:  # Linear -> (in, out)
            return path[:-1] + ("kernel",), arr.T
        if arr.ndim == 1:  # GroupNorm
            return path[:-1] + ("scale",), arr
        raise ValueError(f"Unhandled weight shape {arr.shape} at {path}")
    if name == "bias":
        return path, arr
    if name in ("W", "b"):  # NIN / GaussianFourierProjection
        return path, arr
    raise ValueError(f"Unhandled parameter {path}")


def _module_index_rename(key: str) -> Tuple[str, ...]:
    """all_modules.<i>.rest -> ('all_modules_<i>', *rest); dots elsewhere
    split into nesting levels."""
    parts = key.split(".")
    out = []
    i = 0
    while i < len(parts):
        p = parts[i]
        if p in ("all_modules",) and i + 1 < len(parts) and parts[i + 1].isdigit():
            out.append(f"{p}_{parts[i + 1]}")
            i += 2
        else:
            out.append(p)
            i += 1
    return tuple(out)


def _insert(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_backbone_state_dict(
    state_dict: Mapping[str, Any], prefix: str = ""
) -> Dict[str, Any]:
    """Convert a torch NCSNpp state_dict to a flax params dict.

    Args:
        state_dict: torch name -> tensor mapping
        prefix: strip this prefix from keys (e.g. "score_model.backbone.")
    """
    params: Dict[str, Any] = {}
    for key, tensor in state_dict.items():
        if prefix:
            if not key.startswith(prefix):
                continue
            key = key[len(prefix):]
        path = _module_index_rename(key)
        path, arr = _convert_leaf(path, _to_numpy(tensor))
        _insert(params, path, arr)
    return params


def convert_ema_backbone(
    state_dict: Mapping[str, Any],
    shadow_params,
    prefix: str = "score_model.backbone.",
) -> Dict[str, Any]:
    """Convert a torch_ema shadow-parameter list into flax backbone params.

    The reference embeds EMA state in every checkpoint
    (pl_model.py:672-673) as `ema.shadow_params`, an ordered list over
    `[p for p in model.parameters() if p.requires_grad]`. Parameter order
    equals state_dict key order restricted to trainable parameters — i.e.
    all keys except buffers (the STFT windows under `score_model.stft*`)
    and the frozen GaussianFourierProjection W (layerspp.py:37,
    `all_modules.0.W`).
    """
    trainable_keys = []
    for key in state_dict.keys():
        if ".stft" in key:
            continue  # Spectrogram/InverseSpectrogram window buffers
        if key.endswith("all_modules.0.W"):
            continue  # frozen Fourier projection
        trainable_keys.append(key)
    if len(trainable_keys) != len(shadow_params):
        raise ValueError(
            f"EMA shadow list has {len(shadow_params)} entries but "
            f"{len(trainable_keys)} trainable parameters were found"
        )
    ema_sd = dict(zip(trainable_keys, shadow_params))
    # the frozen W is not EMA-averaged; take it from the raw state_dict
    for key, tensor in state_dict.items():
        if key.endswith("all_modules.0.W"):
            ema_sd[key] = tensor
    return convert_backbone_state_dict(ema_sd, prefix)


def _flatten(tree: Mapping[str, Any], prefix: Tuple[str, ...] = ()):
    for k, v in tree.items():
        if isinstance(v, Mapping):
            yield from _flatten(v, prefix + (k,))
        else:
            yield prefix + (k,), v


def _deconvert_leaf(path: Tuple[str, ...], arr: np.ndarray):
    """Inverse of `_convert_leaf`: map one flax (path, array) to a torch
    (path, tensor-shaped array)."""
    name = path[-1]
    parent = path[-2] if len(path) >= 2 else ""
    if name == "kernel":
        if arr.ndim == 4:  # HWIO -> Conv2d OIHW
            return path[:-1] + ("weight",), arr.transpose(3, 2, 0, 1)
        if arr.ndim == 2:  # (in, out) -> Linear (out, in)
            return path[:-1] + ("weight",), arr.T
        raise ValueError(f"Unhandled kernel shape {arr.shape} at {path}")
    if name == "scale":  # GroupNorm
        return path[:-1] + ("weight",), arr
    if name == "weight":
        if not parent.startswith("Conv2d"):
            raise ValueError(f"Unexpected flax leaf name 'weight' at {path}")
        return path, arr  # StyleGAN2 fused conv stores torch OIHW natively
    if name in ("bias", "W", "b"):
        return path, arr
    raise ValueError(f"Unhandled parameter {path}")


def _module_index_unrename(path: Tuple[str, ...]) -> str:
    """('all_modules_<i>', *rest) -> 'all_modules.<i>.rest' — inverse of
    `_module_index_rename`."""
    out = []
    for p in path:
        if p.startswith("all_modules_") and p[len("all_modules_"):].isdigit():
            out.append("all_modules")
            out.append(p[len("all_modules_"):])
        else:
            out.append(p)
    return ".".join(out)


def flax_to_backbone_state_dict(
    params: Mapping[str, Any], prefix: str = ""
) -> Dict[str, np.ndarray]:
    """Convert a flax NCSNpp param tree to a torch NCSNpp state_dict
    (numpy values; call `torch.from_numpy` per leaf or use
    `save_reference_checkpoint`). Exact inverse of
    `convert_backbone_state_dict`:

      flax Conv kernel (kh, kw, I, O) -> torch Conv2d weight (O, I, kh, kw)
      flax Dense kernel (I, O)        -> torch Linear weight (O, I)
      flax GroupNorm scale            -> torch GroupNorm weight
      NIN W/b, Fourier W, fused Conv2d_0 weight -> unchanged

    Lets weights trained here be evaluated with the reference
    (/root/reference/models/ncsnpp.py loads the result with strict=True;
    tested in tests/test_ncsnpp.py)."""
    out: Dict[str, np.ndarray] = {}
    for path, arr in _flatten(params):
        path, arr = _deconvert_leaf(path, np.asarray(arr))
        out[prefix + _module_index_unrename(path)] = np.ascontiguousarray(
            np.asarray(arr, np.float32)
        )
    return out


def flax_to_score_model_state_dict(
    params: Mapping[str, Any], backbone_prefix: str = "backbone."
) -> Dict[str, np.ndarray]:
    """Inverse of `convert_score_model_state_dict`: flax ScoreModelNCSNpp
    params -> torch ScoreModelNCSNpp state_dict (score_models.py:10),
    including the optional learnable spectrogram-transform scalars."""
    params = dict(params)
    backbone = params.pop("backbone", {})
    out = flax_to_backbone_state_dict(backbone, backbone_prefix)
    for key in ("spec_abs_exponent", "spec_factor"):
        if key in params:
            out[key] = np.asarray(params[key], np.float32)
    return out


# our config tree names -> the reference's torch import paths, so a
# checkpoint exported here instantiates under the reference's hydra
# config loading (exact inverse of cli/loading.py:_config_from_hparams)
_TO_REFERENCE_TARGETS = {
    "diffsep_tpu.models.ScoreModelNCSNpp": "models.score_models.ScoreModelNCSNpp",
    "diffsep_tpu.models.NCSNpp": "models.ncsnpp.NCSNpp",
    "diffsep_tpu.sde.MixSDE": "sdes.sdes.MixSDE",
    "diffsep_tpu.sde.PriorMixSDE": "sdes.sdes.PriorMixSDE",
    "diffsep_tpu.sde.OUVESDE": "sdes.sdes.OUVESDE",
    "diffsep_tpu.sde.OUVPSDE": "sdes.sdes.OUVPSDE",
    "diffsep_tpu.models.losses.SISDRLoss": "models.losses.SISDRLoss",
    "diffsep_tpu.models.losses.PESQ": "models.losses.PESQ",
    "diffsep_tpu.train.clippers.FixedClipper": "utils.FixedClipper",
    "diffsep_tpu.train.clippers.AutoClipper": "utils.AutoClipper",
    "adam": "torch.optim.Adam",
    "mse": "torch.nn.MSELoss",
}


def _to_reference_config(node):
    if isinstance(node, Mapping):
        return {
            k: (
                _TO_REFERENCE_TARGETS.get(v, v)
                if k == "_target_"
                else _to_reference_config(v)
            )
            for k, v in node.items()
        }
    if isinstance(node, (list, tuple)):
        return [_to_reference_config(v) for v in node]
    return node


def save_reference_checkpoint(path, params, config=None) -> None:
    """Write a reference-compatible PyTorch checkpoint from flax
    ScoreModelNCSNpp params (pass the EMA params — evaluation-time weights;
    the reference tolerates a missing `ema` section, pl_model.py:642-648,
    and falls back to the raw weights, which are then these).

    The result round-trips through our own loader
    (cli/loading.py torch-checkpoint path) and carries the reference's
    checkpoint layout: `state_dict` with `score_model.*` keys and
    `hyper_parameters.config` (pl_model.py:100-103) with `_target_`
    paths rewritten to the reference's torch import paths, so the
    reference's `DiffSepModel.load_from_checkpoint` can instantiate it.
    `config` is the composed run config (e.g. `model.config`)."""
    import torch

    sd = {
        "score_model." + k: torch.from_numpy(v)
        for k, v in flax_to_score_model_state_dict(params).items()
    }
    ckpt: Dict[str, Any] = {
        "state_dict": sd,
        "global_step": 0,
        "epoch": 0,
    }
    if config is not None:
        try:
            from omegaconf import OmegaConf

            if OmegaConf.is_config(config):
                config = OmegaConf.to_container(config, resolve=True)
        except ImportError:
            pass
        ckpt["hyper_parameters"] = {"config": _to_reference_config(config)}
    torch.save(ckpt, str(path))


def convert_score_model_state_dict(
    state_dict: Mapping[str, Any], backbone_prefix: str = "backbone."
) -> Dict[str, Any]:
    """Convert a torch ScoreModelNCSNpp state_dict (score_models.py:10) into
    the flax ScoreModelNCSNpp param tree (backbone nested under 'backbone').

    Handles the optional learnable spectrogram-transform scalars
    (score_models.py:35-39)."""
    params: Dict[str, Any] = {
        "backbone": convert_backbone_state_dict(state_dict, backbone_prefix)
    }
    for key in ("spec_abs_exponent", "spec_factor"):
        if key in state_dict:
            params[key] = _to_numpy(state_dict[key])
    return params
