"""Conv-TasNet temporal convolutional network (TCN) mask estimator.

Capability parity with models/tcn.py:18-296 (TemporalConvNet, TemporalBlock,
DepthwiseSeparableConv, Chomp1d, choose_norm with gLN/cLN/BN/GN,
ChannelwiseLayerNorm, GlobalLayerNorm). Like the reference, this model is a
library component not wired into any recipe (SURVEY.md §2.3).

Layout: the public API takes (batch, N, K) channel-first like the
reference; internals are channels-last for TPU convs.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

EPS = float(np.finfo(np.float32).eps)


class ChannelwiseLayerNorm(nn.Module):
    """cLN over the channel dim at each time step (tcn.py:227-262).
    Input (batch, time, channels)."""

    channel_size: int

    @nn.compact
    def __call__(self, y: Array) -> Array:
        gamma = self.param("gamma", nn.initializers.ones, (1, 1, self.channel_size))
        beta = self.param("beta", nn.initializers.zeros, (1, 1, self.channel_size))
        mean = y.mean(axis=-1, keepdims=True)
        var = y.var(axis=-1, keepdims=True)
        return gamma * (y - mean) / (var + EPS) ** 0.5 + beta


class GlobalLayerNorm(nn.Module):
    """gLN over channel and time (tcn.py:265-296). Input (b, t, c)."""

    channel_size: int

    @nn.compact
    def __call__(self, y: Array) -> Array:
        gamma = self.param("gamma", nn.initializers.ones, (1, 1, self.channel_size))
        beta = self.param("beta", nn.initializers.zeros, (1, 1, self.channel_size))
        mean = y.mean(axis=(-2, -1), keepdims=True)
        var = ((y - mean) ** 2).mean(axis=(-2, -1), keepdims=True)
        return gamma * (y - mean) / (var + EPS) ** 0.5 + beta


def choose_norm(norm_type: str, channel_size: int):
    """Norm factory (tcn.py:209-224); BN is approximated by GroupNorm(1)
    which is the standard stateless stand-in for inference-time BN."""
    if norm_type == "gLN":
        return GlobalLayerNorm(channel_size)
    if norm_type == "cLN":
        return ChannelwiseLayerNorm(channel_size)
    if norm_type in ("BN", "GN"):
        return nn.GroupNorm(num_groups=1, epsilon=1e-8)
    raise ValueError("Unsupported normalization type")


class PReLU(nn.Module):
    """Parametric ReLU with a single learnable slope (torch default)."""

    @nn.compact
    def __call__(self, x: Array) -> Array:
        a = self.param("alpha", nn.initializers.constant(0.25), ())
        return jnp.where(x >= 0, x, a * x)


class DepthwiseSeparableConv(nn.Module):
    """Depthwise dilated conv -> PReLU -> norm -> pointwise (tcn.py:140-184)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    padding: int
    dilation: int
    norm_type: str = "gLN"
    causal: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.Conv(
            self.in_channels,
            (self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding=((self.padding, self.padding),),
            feature_group_count=self.in_channels,
            use_bias=False,
            name="depthwise_conv",
        )(x)
        if self.causal and self.padding > 0:
            h = h[:, : -self.padding, :]  # Chomp1d (tcn.py:187-201)
        h = PReLU(name="prelu")(h)
        h = choose_norm(self.norm_type, self.in_channels)(h)
        return nn.Conv(
            self.out_channels, (1,), use_bias=False, name="pointwise_conv"
        )(h)


class TemporalBlock(nn.Module):
    """1x1 conv -> PReLU -> norm -> ds-conv, residual (tcn.py:95-137)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    padding: int
    dilation: int
    norm_type: str = "gLN"
    causal: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        h = nn.Conv(self.out_channels, (1,), use_bias=False, name="conv1x1")(x)
        h = PReLU(name="prelu")(h)
        h = choose_norm(self.norm_type, self.out_channels)(h)
        h = DepthwiseSeparableConv(
            self.out_channels,
            self.in_channels,
            self.kernel_size,
            self.padding,
            self.dilation,
            self.norm_type,
            self.causal,
            name="dsconv",
        )(h)
        return h + x


class TemporalConvNet(nn.Module):
    """Conv-TasNet mask estimator (tcn.py:18-92).

    __call__(mixture_w): (batch, N, K) -> masks (batch, C, N, K).
    """

    N: int
    B: int
    H: int
    P: int
    X: int
    R: int
    C: int
    norm_type: str = "gLN"
    causal: bool = False
    mask_nonlinear: str = "relu"

    @nn.compact
    def __call__(self, mixture_w: Array) -> Array:
        m, n, k = mixture_w.shape
        x = jnp.swapaxes(mixture_w, 1, 2)  # (b, k, n)
        x = ChannelwiseLayerNorm(self.N, name="layer_norm")(x)
        x = nn.Conv(self.B, (1,), use_bias=False, name="bottleneck_conv1x1")(x)
        for r in range(self.R):
            for xi in range(self.X):
                dilation = 2**xi
                padding = (
                    (self.P - 1) * dilation
                    if self.causal
                    else (self.P - 1) * dilation // 2
                )
                x = TemporalBlock(
                    self.B, self.H, self.P, padding, dilation,
                    self.norm_type, self.causal,
                    name=f"repeat_{r}_block_{xi}",
                )(x)
        score = nn.Conv(
            self.C * self.N, (1,), use_bias=False, name="mask_conv1x1"
        )(x)
        score = jnp.swapaxes(score, 1, 2).reshape(m, self.C, n, k)
        if self.mask_nonlinear == "softmax":
            return jax.nn.softmax(score, axis=1)
        if self.mask_nonlinear == "relu":
            return nn.relu(score)
        if self.mask_nonlinear == "sigmoid":
            return jax.nn.sigmoid(score)
        if self.mask_nonlinear == "tanh":
            return jnp.tanh(score)
        raise ValueError("Unsupported mask non-linear function")
