"""Legacy layer library (NCSN v1/v2 RefineNet family + DDPM blocks).

Capability parity with models/ncsnpp_utils/layers.py:165-800: CRPBlock /
CondCRPBlock, RCUBlock / CondRCUBlock, MSFBlock / CondMSFBlock,
RefineBlock / CondRefineBlock, ConvMeanPool / MeanPoolConv / UpsampleConv,
ConditionalResidualBlock / ResidualBlock, and the plain DDPM
Upsample / Downsample / ResnetBlockDDPM.

The production NCSN++ path only consumes get_act / default_init / NIN /
get_timestep_embedding from this lineage (SURVEY.md §2.3); this module
keeps the RefineNet architecture available for NCSNv1/v2-style score
networks.  All modules are channels-last (batch, H, W, C).
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from .layers import NIN, conv3x3 as _ddpm_conv3x3, default_init, group_norm

Array = jax.Array


def ncsn_conv3x3(features: int, stride: int = 1, use_bias: bool = True,
                 dilation: int = 1, init_scale: float = 1.0,
                 name: Optional[str] = None) -> nn.Conv:
    """3x3 conv, torch-default (kaiming-uniform-ish) init scaled by
    init_scale (layers.py:124-143). Flax's default init stands in for
    torch's; the legacy path has no pretrained checkpoints to match."""
    return nn.Conv(
        features, (3, 3), strides=(stride, stride),
        kernel_dilation=(dilation, dilation),
        padding=((dilation, dilation), (dilation, dilation)),
        use_bias=use_bias, name=name,
    )


def _pool5(x: Array, kind: str) -> Array:
    if kind == "max":
        return nn.max_pool(x, (5, 5), strides=(1, 1), padding="SAME")
    return nn.avg_pool(x, (5, 5), strides=(1, 1), padding="SAME")


class CRPBlock(nn.Module):
    """Chained residual pooling (layers.py:165-186)."""

    features: int
    n_stages: int
    act: Callable = nn.relu
    maxpool: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = self.act(x)
        path = x
        for i in range(self.n_stages):
            path = _pool5(path, "max" if self.maxpool else "avg")
            path = ncsn_conv3x3(self.features, use_bias=False,
                                name=f"convs_{i}")(path)
            x = path + x
        return x


class CondCRPBlock(nn.Module):
    """Conditional CRP (layers.py:189-213)."""

    features: int
    n_stages: int
    num_classes: int
    normalizer: Callable
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        x = self.act(x)
        path = x
        for i in range(self.n_stages):
            path = self.normalizer(self.features, self.num_classes, bias=True,
                                   name=f"norms_{i}")(path, y)
            path = _pool5(path, "avg")
            path = ncsn_conv3x3(self.features, use_bias=False,
                                name=f"convs_{i}")(path)
            x = path + x
        return x


class RCUBlock(nn.Module):
    """Residual conv unit (layers.py:216-239)."""

    features: int
    n_blocks: int
    n_stages: int
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x: Array) -> Array:
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                x = self.act(x)
                x = ncsn_conv3x3(self.features, use_bias=False,
                                 name=f"{i + 1}_{j + 1}_conv")(x)
            x = x + residual
        return x


class CondRCUBlock(nn.Module):
    """layers.py:242-273."""

    features: int
    n_blocks: int
    n_stages: int
    num_classes: int
    normalizer: Callable
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                x = self.normalizer(self.features, self.num_classes, bias=True,
                                    name=f"{i + 1}_{j + 1}_norm")(x, y)
                x = self.act(x)
                x = ncsn_conv3x3(self.features, use_bias=False,
                                 name=f"{i + 1}_{j + 1}_conv")(x)
            x = x + residual
        return x


def _bilinear_resize(x: Array, shape) -> Array:
    """F.interpolate(mode=bilinear, align_corners=True) equivalent.

    jax.image.resize("linear") uses half-pixel sample centers
    (align_corners=False); the corner-aligned grid the reference uses
    (layers.py:292,316) samples at i*(n_in-1)/(n_out-1), so it is built
    explicitly here."""
    b, h, w, c = x.shape
    H, W = int(shape[0]), int(shape[1])

    def grid(n_in, n_out):
        if n_out == 1:
            return jnp.zeros((1,), jnp.float32)
        return jnp.arange(n_out, dtype=jnp.float32) * (
            (n_in - 1) / (n_out - 1)
        )

    yy, xx = grid(h, H), grid(w, W)
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, h - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, w - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = (yy - y0)[None, :, None, None]
    wx = (xx - x0)[None, None, :, None]
    top = x[:, y0][:, :, x0] * (1 - wx) + x[:, y0][:, :, x1] * wx
    bot = x[:, y1][:, :, x0] * (1 - wx) + x[:, y1][:, :, x1] * wx
    return top * (1 - wy) + bot * wy


class MSFBlock(nn.Module):
    """Multi-scale fusion (layers.py:276-294)."""

    features: int

    @nn.compact
    def __call__(self, xs: Sequence[Array], shape) -> Array:
        out = None
        for i, x in enumerate(xs):
            h = ncsn_conv3x3(self.features, name=f"convs_{i}")(x)
            h = _bilinear_resize(h, shape)
            out = h if out is None else out + h
        return out


class CondMSFBlock(nn.Module):
    """layers.py:297-318."""

    features: int
    num_classes: int
    normalizer: Callable

    @nn.compact
    def __call__(self, xs: Sequence[Array], y: Array, shape) -> Array:
        out = None
        for i, x in enumerate(xs):
            h = self.normalizer(x.shape[-1], self.num_classes, bias=True,
                                name=f"norms_{i}")(x, y)
            h = ncsn_conv3x3(self.features, name=f"convs_{i}")(h)
            h = _bilinear_resize(h, shape)
            out = h if out is None else out + h
        return out


class RefineBlock(nn.Module):
    """RefineNet block (layers.py:321-355)."""

    features: int
    act: Callable = nn.relu
    start: bool = False
    end: bool = False
    maxpool: bool = True

    @nn.compact
    def __call__(self, xs: Sequence[Array], output_shape) -> Array:
        hs = []
        for i, x in enumerate(xs):
            hs.append(
                RCUBlock(x.shape[-1], 2, 2, self.act,
                         name=f"adapt_convs_{i}")(x)
            )
        if len(xs) > 1:
            h = MSFBlock(self.features, name="msf")(hs, output_shape)
        else:
            h = hs[0]
        h = CRPBlock(self.features, 2, self.act, self.maxpool, name="crp")(h)
        return RCUBlock(self.features, 3 if self.end else 1, 2, self.act,
                        name="output_convs")(h)


class CondRefineBlock(nn.Module):
    """layers.py:358-407."""

    features: int
    num_classes: int
    normalizer: Callable
    act: Callable = nn.relu
    start: bool = False
    end: bool = False

    @nn.compact
    def __call__(self, xs: Sequence[Array], y: Array, output_shape) -> Array:
        hs = []
        for i, x in enumerate(xs):
            hs.append(
                CondRCUBlock(x.shape[-1], 2, 2, self.num_classes,
                             self.normalizer, self.act,
                             name=f"adapt_convs_{i}")(x, y)
            )
        if len(xs) > 1:
            h = CondMSFBlock(self.features, self.num_classes, self.normalizer,
                             name="msf")(hs, y, output_shape)
        else:
            h = hs[0]
        h = CondCRPBlock(self.features, 2, self.num_classes, self.normalizer,
                         self.act, name="crp")(h, y)
        return CondRCUBlock(self.features, 3 if self.end else 1, 2,
                            self.num_classes, self.normalizer, self.act,
                            name="output_convs")(h, y)


class ConvMeanPool(nn.Module):
    """Conv then 2x2 mean pool (layers.py:410-441)."""

    output_dim: int
    kernel_size: int = 3
    biases: bool = True
    adjust_padding: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.adjust_padding:
            x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
        h = nn.Conv(self.output_dim, (self.kernel_size, self.kernel_size),
                    padding=self.kernel_size // 2, use_bias=self.biases,
                    name="conv")(x)
        return (
            h[:, ::2, ::2] + h[:, 1::2, ::2] + h[:, ::2, 1::2] + h[:, 1::2, 1::2]
        ) / 4.0


class MeanPoolConv(nn.Module):
    """2x2 mean pool then conv (layers.py:444-470)."""

    output_dim: int
    kernel_size: int = 3
    biases: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        x = (
            x[:, ::2, ::2] + x[:, 1::2, ::2] + x[:, ::2, 1::2] + x[:, 1::2, 1::2]
        ) / 4.0
        return nn.Conv(self.output_dim, (self.kernel_size, self.kernel_size),
                       padding=self.kernel_size // 2, use_bias=self.biases,
                       name="conv")(x)


class UpsampleConv(nn.Module):
    """Pixel-shuffle 2x upsample then conv (layers.py:473-490).

    cat([x]*4, dim=C) + PixelShuffle(2) is NOT nearest upsampling except
    at C=1: concatenation lays the copies out block-wise, so the shuffle
    reads out[c, 2h+i, 2w+j] = x[(4c + 2i + j) mod C, h, w] — a fixed
    per-position channel rotation. Reproduced exactly (verified against
    torch.nn.PixelShuffle)."""

    output_dim: int
    kernel_size: int = 3
    biases: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        c_idx = (
            4 * jnp.arange(c)[:, None, None]
            + 2 * jnp.arange(2)[None, :, None]
            + jnp.arange(2)[None, None, :]
        ) % c  # (C, 2, 2)
        g = x[:, :, :, c_idx]  # (b, h, w, C, 2, 2)
        x = jnp.transpose(g, (0, 1, 4, 2, 5, 3)).reshape(b, h * 2, w * 2, c)
        return nn.Conv(self.output_dim, (self.kernel_size, self.kernel_size),
                       padding=self.kernel_size // 2, use_bias=self.biases,
                       name="conv")(x)


class ResidualBlock(nn.Module):
    """NCSNv1/v2 residual block (layers.py:565-636)."""

    output_dim: int
    resample: Optional[str] = None
    act: Callable = nn.elu
    normalization: Callable = None  # norm factory: (num_features) -> module
    adjust_padding: bool = False
    dilation: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        from .normalization import InstanceNorm2d

        norm = self.normalization or (lambda f, name=None: InstanceNorm2d(f, name=name))
        input_dim = x.shape[-1]

        h = norm(input_dim, name="normalize1")(x)
        h = self.act(h)
        if self.resample == "down":
            if self.dilation > 1:
                h = ncsn_conv3x3(input_dim, dilation=self.dilation, name="conv1")(h)
                h = norm(input_dim, name="normalize2")(h)
                h = self.act(h)
                h = ncsn_conv3x3(self.output_dim, dilation=self.dilation,
                                 name="conv2")(h)
                shortcut = ncsn_conv3x3(self.output_dim, dilation=self.dilation,
                                        name="shortcut")(x)
            else:
                h = ncsn_conv3x3(input_dim, name="conv1")(h)
                h = norm(input_dim, name="normalize2")(h)
                h = self.act(h)
                h = ConvMeanPool(self.output_dim, 3,
                                 adjust_padding=self.adjust_padding,
                                 name="conv2")(h)
                shortcut = ConvMeanPool(self.output_dim, 1,
                                        adjust_padding=self.adjust_padding,
                                        name="shortcut")(x)
        elif self.resample is None:
            h = ncsn_conv3x3(self.output_dim, dilation=self.dilation,
                             name="conv1")(h)
            h = norm(self.output_dim, name="normalize2")(h)
            h = self.act(h)
            h = ncsn_conv3x3(self.output_dim, dilation=self.dilation,
                             name="conv2")(h)
            if self.output_dim == input_dim:
                shortcut = x
            elif self.dilation > 1:
                shortcut = ncsn_conv3x3(self.output_dim, dilation=self.dilation,
                                        name="shortcut")(x)
            else:
                shortcut = nn.Conv(self.output_dim, (1, 1), name="shortcut")(x)
        else:
            raise ValueError("invalid resample value")
        return shortcut + h


class ConditionalResidualBlock(nn.Module):
    """Class-conditional variant (layers.py:501-562)."""

    output_dim: int
    num_classes: int
    resample: Optional[str] = None
    act: Callable = nn.elu
    normalization: Callable = None  # (features, num_classes, bias) -> module
    adjust_padding: bool = False
    dilation: int = 1

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        from .normalization import ConditionalInstanceNorm2dPlus

        def norm(f, name):
            factory = self.normalization or ConditionalInstanceNorm2dPlus
            return factory(f, self.num_classes, name=name)

        input_dim = x.shape[-1]
        h = norm(input_dim, "normalize1")(x, y)
        h = self.act(h)
        if self.resample == "down":
            if self.dilation > 1:
                h = ncsn_conv3x3(input_dim, dilation=self.dilation, name="conv1")(h)
                h = norm(input_dim, "normalize2")(h, y)
                h = self.act(h)
                h = ncsn_conv3x3(self.output_dim, dilation=self.dilation,
                                 name="conv2")(h)
                shortcut = ncsn_conv3x3(self.output_dim, dilation=self.dilation,
                                        name="shortcut")(x)
            else:
                h = ncsn_conv3x3(input_dim, name="conv1")(h)
                h = norm(input_dim, "normalize2")(h, y)
                h = self.act(h)
                h = ConvMeanPool(self.output_dim, 3,
                                 adjust_padding=self.adjust_padding,
                                 name="conv2")(h)
                shortcut = ConvMeanPool(self.output_dim, 1,
                                        adjust_padding=self.adjust_padding,
                                        name="shortcut")(x)
        elif self.resample is None:
            h = ncsn_conv3x3(self.output_dim, dilation=self.dilation,
                             name="conv1")(h)
            h = norm(self.output_dim, "normalize2")(h, y)
            h = self.act(h)
            h = ncsn_conv3x3(self.output_dim, dilation=self.dilation,
                             name="conv2")(h)
            if self.output_dim == input_dim:
                shortcut = x
            else:
                shortcut = nn.Conv(self.output_dim, (1, 1), name="shortcut")(x)
        else:
            raise ValueError("invalid resample value")
        return shortcut + h


class ResnetBlockDDPM(nn.Module):
    """Plain DDPM resblock, GroupNorm(32) (layers.py:755-800)."""

    act: Callable
    out_ch: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: Array, temb: Optional[Array] = None,
                 train: bool = False) -> Array:
        in_ch = x.shape[-1]
        out_ch = self.out_ch or in_ch
        h = self.act(nn.GroupNorm(num_groups=32, epsilon=1e-6,
                                  name="GroupNorm_0")(x))
        h = _ddpm_conv3x3(out_ch, name="Conv_0")(h)
        if temb is not None:
            h = h + nn.Dense(out_ch, kernel_init=default_init(),
                             bias_init=nn.initializers.zeros,
                             name="Dense_0")(self.act(temb))[:, None, None, :]
        h = self.act(nn.GroupNorm(num_groups=32, epsilon=1e-6,
                                  name="GroupNorm_1")(h))
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = _ddpm_conv3x3(out_ch, init_scale=0.0, name="Conv_1")(h)
        if in_ch != out_ch:
            if self.conv_shortcut:
                x = _ddpm_conv3x3(out_ch, name="Conv_2")(x)
            else:
                x = NIN(out_ch, name="NIN_0")(x)
        return x + h
