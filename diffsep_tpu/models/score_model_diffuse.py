"""Time-domain score model wrapping the DiffuSE backbone.

The reference README mentions `diffuse.yaml` configs for the CDiffuse
variant, but they are absent from its config tree (config drift noted in
SURVEY.md §2.3) — the backbone is only instantiable by hand. Here the
variant is a first-class citizen: `ScoreModelDiffuSE` gives the DiffuSE
backbone (models/cdiffuse.py) the same (x_t, t, mix) -> score interface as
`ScoreModelNCSNpp`, operating directly on waveforms (no STFT frontend),
and `config/yaml/model/diffuse.yaml` wires it into the recipe system.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


class ScoreModelDiffuSE(nn.Module):
    """DiffuSE score wrapper: concatenates x_t with the mixture as the
    conditioner path and predicts a time-domain score."""

    backbone: nn.Module
    num_sources: int = 2

    def __call__(
        self, xt: Array, time_cond: Array, mix: Array, train: bool = False
    ) -> Array:
        return self.backbone(xt, time_cond, mix)
