"""DiffuSE / CDiffuse backbone: WaveNet-style gated dilated-conv score net.

Capability parity with models/cdiffuse_network.py:38-158 (DiffusionEmbedding
with table + lerp for continuous t, gated dilated ResidualBlock with
conditioner conv, skip-sum / sqrt(L), zero-init output projection).

Channels-last 1-D layout: (batch, time, channels).  The reference's
`diffuse.yaml` configs are absent from its config tree (config drift noted
in SURVEY.md §2.3); like the reference, this backbone is instantiable via
explicit backbone_args overrides.
"""
from __future__ import annotations

import math
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def _kaiming_conv():
    return nn.initializers.he_normal()


class DiffusionEmbedding(nn.Module):
    """Sinusoidal step-embedding table with linear interpolation for
    continuous diffusion times (cdiffuse_network.py:38-70)."""

    max_steps: int

    def setup(self):
        # torch builds this table in float32 (int64 * python-float promotes
        # to the default dtype, cdiffuse_network.py:65-70); the arguments
        # reach ~5e5 where sin() of the f32-rounded frequency differs O(1)
        # from the f64 value, so parity requires f32 arithmetic throughout.
        steps = np.arange(self.max_steps, dtype=np.float32)[:, None]
        dims = np.arange(64, dtype=np.float32)[None, :]
        # torch evaluates pow at f64 internally and rounds the result to
        # f32; the exponent itself is the f32 value
        exponent = dims * np.float32(4.0) / np.float32(63.0)
        freqs = (10.0 ** exponent.astype(np.float64)).astype(np.float32)
        table = steps * freqs
        self.table = jnp.asarray(
            np.concatenate([np.sin(table), np.cos(table)], axis=1), jnp.float32
        )
        self.projection1 = nn.Dense(512)
        self.projection2 = nn.Dense(512)

    def __call__(self, t: Array) -> Array:
        if jnp.issubdtype(t.dtype, jnp.integer):
            x = self.table[t]
        else:
            low_idx = jnp.floor(t * 50).astype(jnp.int32)
            high_idx = jnp.ceil(t * 50).astype(jnp.int32)
            low = self.table[low_idx]
            high = self.table[high_idx]
            x = low + (high - low) * (t[:, None] - low_idx[:, None])
        x = nn.silu(self.projection1(x))
        return nn.silu(self.projection2(x))


class ResidualBlock(nn.Module):
    """Gated dilated conv block (cdiffuse_network.py:73-109)."""

    residual_channels: int
    dilation: int

    @nn.compact
    def __call__(self, x: Array, diffusion_step: Array, conditioner: Array):
        c = self.residual_channels
        d = self.dilation
        dilated = nn.Conv(
            2 * c, (3,), kernel_dilation=(d,), padding=((d, d),),
            kernel_init=_kaiming_conv(), name="dilated_conv",
        )
        dilated_cond = nn.Conv(
            2 * c, (3,), kernel_dilation=(d,), padding=((d, d),),
            kernel_init=_kaiming_conv(), name="dilated_cond_conv",
        )
        diff_proj = nn.Dense(c, name="diffusion_projection")

        y = x + diff_proj(diffusion_step)[:, None, :]
        y = dilated(y) + dilated_cond(conditioner)
        gate, filt = jnp.split(y, 2, axis=-1)
        y = jax.nn.sigmoid(gate) * jnp.tanh(filt)

        residual = nn.Conv(c, (1,), kernel_init=_kaiming_conv(),
                           name="output_residual")(y)
        skip = nn.Conv(c, (1,), kernel_init=_kaiming_conv(),
                       name="output_projection")(y)
        return (x + residual) / math.sqrt(2.0), skip


class DiffuSE(nn.Module):
    """Time-domain diffusion backbone (cdiffuse_network.py:112-158).

    __call__(x, diffusion_step, y): x (batch, chan_in, time) diffused state,
    y (batch, 1, time) conditioner; returns (batch, chan_out, time).
    """

    num_channels_in: int
    num_channels_out: int
    residual_layers: int = 30
    residual_channels: int = 64
    dilation_cycle_length: int = 10
    embedding_len: int = 50

    @nn.compact
    def __call__(self, x: Array, diffusion_step: Array, y: Array) -> Array:
        x = jnp.swapaxes(x, 1, 2)  # (b, t, c)
        y = jnp.swapaxes(y, 1, 2)
        c = self.residual_channels

        x = nn.Conv(c, (1,), kernel_init=_kaiming_conv(),
                    name="input_projection")(x)
        x = nn.relu(x)
        conditioner = nn.Conv(c, (1,), kernel_init=_kaiming_conv(),
                              name="condition_projection")(y)
        emb = DiffusionEmbedding(self.embedding_len,
                                 name="diffusion_embedding")(diffusion_step)

        skips = []
        for i in range(self.residual_layers):
            x, skip = ResidualBlock(
                c, 2 ** (i % self.dilation_cycle_length),
                name=f"residual_layers_{i}",
            )(x, emb, conditioner)
            skips.append(skip)

        x = sum(skips) / math.sqrt(self.residual_layers)
        x = nn.Conv(c, (1,), kernel_init=_kaiming_conv(),
                    name="skip_projection")(x)
        x = nn.relu(x)
        x = nn.Conv(self.num_channels_out, (1,),
                    kernel_init=nn.initializers.zeros,
                    name="output_projection")(x)
        return jnp.swapaxes(x, 1, 2)
