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

__all__ = ["convert_backbone_state_dict", "convert_score_model_state_dict"]


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
