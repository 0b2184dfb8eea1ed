"""Fused bias-add + LeakyReLU(negative_slope) * scale.

Capability parity with the reference's `fused_leaky_relu` CUDA op
(models/ncsnpp_utils/op/fused_act.py:74-97, fused_bias_act_kernel.cu:36-45).
The reference exports it but the NCSN++ model path never calls it (verified
in SURVEY.md §2.1); it exists for API parity with StyleGAN2-derived code.

On TPU this is a pure VPU elementwise chain that XLA fuses into neighbouring
ops automatically, so no Pallas kernel is warranted — jax.grad already
produces the exact custom backward the CUDA version hand-codes.
"""
from __future__ import annotations


import jax.numpy as jnp

__all__ = ["fused_leaky_relu", "FusedLeakyReLU"]


def fused_leaky_relu(x, bias=None, negative_slope=0.2, scale=2.0**0.5):
    """y = leaky_relu(x + bias) * scale, bias broadcast over channel dim 1."""
    if bias is not None:
        pad = (1,) * (x.ndim - 2)
        x = x + bias.reshape(1, -1, *pad)
    return jnp.where(x >= 0, x, x * negative_slope) * scale


class FusedLeakyReLU:
    """Callable module-like wrapper holding a (channel,) bias.

    Mirrors op/fused_act.py:74-84; in Flax models prefer declaring the bias
    as a param and calling `fused_leaky_relu` directly.
    """

    def __init__(self, bias, negative_slope=0.2, scale=2.0**0.5):
        self.bias = bias
        self.negative_slope = negative_slope
        self.scale = scale

    def __call__(self, x):
        return fused_leaky_relu(x, self.bias, self.negative_slope, self.scale)
