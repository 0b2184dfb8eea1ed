"""Normalization layer library (NCSN v1/v2 lineage).

Capability parity with models/ncsnpp_utils/normalization.py:22-243: the
`get_normalization` dispatcher and the conditional / unconditional
Instance/Variance/None norm variants that back the legacy NCSN blocks.
The production NCSN++ path uses plain GroupNorm (SURVEY.md §2.3); these
exist for architectural completeness.

All modules are channels-last: input (batch, H, W, C); conditional variants
take an integer class label y (batch,).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

Array = jax.Array


def _instance_norm(x: Array, eps: float = 1e-5) -> Array:
    """InstanceNorm2d(affine=False): normalize each (H, W) slice."""
    mean = x.mean(axis=(1, 2), keepdims=True)
    var = x.var(axis=(1, 2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


def _embed_init_scale_bias(num_features):
    """Scale entries uniform, bias entries zero (normalization.py:52-57)."""

    def init(key, shape, dtype=jnp.float32):
        scale = jax.random.uniform(key, (shape[0], num_features), dtype)
        bias = jnp.zeros((shape[0], shape[1] - num_features), dtype)
        return jnp.concatenate([scale, bias], axis=1)

    return init


class InstanceNorm2dPlus(nn.Module):
    """InstanceNorm++ (normalization.py:172-203): re-injects the per-channel
    mean pattern, normalized across channels, via a learnable alpha."""

    num_features: int
    bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        init = nn.initializers.normal(stddev=0.02)
        alpha = 1.0 + self.param("alpha", init, (self.num_features,))
        gamma = 1.0 + self.param("gamma", init, (self.num_features,))
        means = x.mean(axis=(1, 2))  # (b, c)
        m = means.mean(axis=-1, keepdims=True)
        v = means.var(axis=-1, keepdims=True, ddof=1)
        means = (means - m) / jnp.sqrt(v + 1e-5)
        h = _instance_norm(x)
        h = h + means[:, None, None, :] * alpha
        out = gamma * h
        if self.bias:
            beta = self.param("beta", nn.initializers.zeros, (self.num_features,))
            out = out + beta
        return out


class ConditionalInstanceNorm2dPlus(nn.Module):
    """Class-conditional InstanceNorm++ (normalization.py:205-243)."""

    num_features: int
    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        n = self.num_features
        if self.bias:
            embed = nn.Embed(
                self.num_classes,
                3 * n,
                embedding_init=lambda k, s, d=jnp.float32: jnp.concatenate(
                    [
                        1.0 + 0.02 * jax.random.normal(k, (s[0], 2 * n), d),
                        jnp.zeros((s[0], n), d),
                    ],
                    axis=1,
                ),
            )(y)
            gamma, alpha, beta = jnp.split(embed, 3, axis=-1)
        else:
            embed = nn.Embed(
                self.num_classes,
                2 * n,
                embedding_init=lambda k, s, d=jnp.float32: 1.0
                + 0.02 * jax.random.normal(k, s, d),
            )(y)
            gamma, alpha = jnp.split(embed, 2, axis=-1)
            beta = None
        means = x.mean(axis=(1, 2))
        m = means.mean(axis=-1, keepdims=True)
        v = means.var(axis=-1, keepdims=True, ddof=1)
        means = (means - m) / jnp.sqrt(v + 1e-5)
        h = _instance_norm(x)
        h = h + means[:, None, None, :] * alpha[:, None, None, :]
        out = gamma[:, None, None, :] * h
        if beta is not None:
            out = out + beta[:, None, None, :]
        return out


class VarianceNorm2d(nn.Module):
    """Scale-only variance normalization (normalization.py:122-135)."""

    num_features: int
    bias: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        alpha = 1.0 + self.param(
            "alpha", nn.initializers.normal(stddev=0.02), (self.num_features,)
        )
        # torch.var defaults to the UNBIASED estimator (normalization.py:133)
        var = x.var(axis=(1, 2), keepdims=True, ddof=1)
        return alpha * x / jnp.sqrt(var + 1e-5)


class ConditionalVarianceNorm2d(nn.Module):
    """normalization.py:105-119."""

    num_features: int
    num_classes: int
    bias: bool = False

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        gamma = nn.Embed(
            self.num_classes,
            self.num_features,
            embedding_init=lambda k, s, d=jnp.float32: 1.0
            + 0.02 * jax.random.normal(k, s, d),
        )(y)
        # torch.var defaults to the UNBIASED estimator (normalization.py:117)
        var = x.var(axis=(1, 2), keepdims=True, ddof=1)
        h = x / jnp.sqrt(var + 1e-5)
        return gamma[:, None, None, :] * h


class _TorchBatchNorm(nn.Module):
    """Affine-free batch norm with torch nn.BatchNorm2d running-stat
    semantics: train mode normalizes with the BIASED batch variance but
    accumulates `running_var` from the UNBIASED estimate (m/(m-1)
    correction), torch momentum 0.1. flax nn.BatchNorm accumulates the
    biased variance, so native train-then-eval would drift from torch by
    n/(n-1) on running_var (ADVICE r3); this module closes that gap.

    Variable tree matches nn.BatchNorm (batch_stats/<name>/{mean,var}) so
    converted torch running stats drop in unchanged."""

    epsilon: float = 1e-5
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch

    @nn.compact
    def __call__(self, x: Array, use_running_average: bool) -> Array:
        nf = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(nf, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(nf, jnp.float32)
        )
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))  # all but the feature axis
            mean = jnp.mean(x, axis=axes)
            var = jnp.var(x, axis=axes)  # biased: used for normalization
            m = x.size // nf  # elements per feature
            if not self.is_initializing():
                if m <= 1:
                    # torch raises here too ("Expected more than 1 value
                    # per channel when training"); silently clamping m-1
                    # would drive running_var toward 0 and explode later
                    # eval (round-4 review finding)
                    raise ValueError(
                        "BatchNorm in train mode needs more than 1 value "
                        f"per channel (got {m})"
                    )
                unbiased = var * (m / (m - 1))
                ra_mean.value = (
                    (1 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1 - self.momentum) * ra_var.value
                    + self.momentum * unbiased
                )
        shape = (1,) * (x.ndim - 1) + (nf,)
        return (x - mean.reshape(shape)) * jax.lax.rsqrt(
            var.reshape(shape) + self.epsilon
        )


class ConditionalBatchNorm2d(nn.Module):
    """Class-conditional batch norm (normalization.py:45-71): affine-free
    BatchNorm2d followed by a per-class (gamma, beta) from an embedding.

    torch semantics: train mode normalizes with biased batch statistics
    and maintains running stats with torch's unbiased running_var update
    (see _TorchBatchNorm); eval mode normalizes with the running stats
    (`batch_stats` collection)."""

    num_features: int
    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x: Array, y: Array, train: bool = False) -> Array:
        h = _TorchBatchNorm(name="bn")(x, use_running_average=not train)
        n = self.num_features
        if self.bias:
            embed = nn.Embed(
                self.num_classes, 2 * n,
                embedding_init=_embed_init_scale_bias(n),
            )(y)
            gamma, beta = jnp.split(embed, 2, axis=-1)
            return gamma[:, None, None, :] * h + beta[:, None, None, :]
        gamma = nn.Embed(
            self.num_classes, n,
            embedding_init=lambda k, s, d=jnp.float32: jax.random.uniform(
                k, s, d
            ),
        )(y)
        return gamma[:, None, None, :] * h


class ConditionalInstanceNorm2d(nn.Module):
    """normalization.py:74-102."""

    num_features: int
    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        n = self.num_features
        h = _instance_norm(x)
        if self.bias:
            embed = nn.Embed(
                self.num_classes, 2 * n,
                embedding_init=_embed_init_scale_bias(n),
            )(y)
            gamma, beta = jnp.split(embed, 2, axis=-1)
            return gamma[:, None, None, :] * h + beta[:, None, None, :]
        gamma = nn.Embed(self.num_classes, n)(y)
        return gamma[:, None, None, :] * h


class InstanceNorm2d(nn.Module):
    """Plain affine-free instance norm (torch nn.InstanceNorm2d default)."""

    num_features: int = 0
    bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return _instance_norm(x)


class NoneNorm2d(nn.Module):
    """Identity (normalization.py:166-170)."""

    num_features: int = 0
    bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        return x


class ConditionalNoneNorm2d(nn.Module):
    """Affine-from-class only, no normalization (normalization.py:138-163)."""

    num_features: int
    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        n = self.num_features
        if self.bias:
            embed = nn.Embed(
                self.num_classes, 2 * n,
                embedding_init=_embed_init_scale_bias(n),
            )(y)
            gamma, beta = jnp.split(embed, 2, axis=-1)
            return gamma[:, None, None, :] * x + beta[:, None, None, :]
        gamma = nn.Embed(self.num_classes, n)(y)
        return gamma[:, None, None, :] * x


def get_normalization(config, conditional: bool = False):
    """Dispatcher matching normalization.py:22-42.

    config is any object with .model.normalization (and .model.num_classes
    for the conditional case)."""
    norm = config.model.normalization
    if conditional:
        if norm == "InstanceNorm++":
            import functools

            return functools.partial(
                ConditionalInstanceNorm2dPlus,
                num_classes=config.model.num_classes,
            )
        raise NotImplementedError(f"{norm} not implemented yet.")
    if norm == "InstanceNorm":
        return InstanceNorm2d
    if norm == "InstanceNorm++":
        return InstanceNorm2dPlus
    if norm == "VarianceNorm":
        return VarianceNorm2d
    if norm == "GroupNorm":
        import flax.linen as nn_

        return lambda num_features: nn_.GroupNorm(
            num_groups=min(max(num_features // 4, 1), 32)
        )
    raise ValueError(f"Unknown normalization: {norm}")
