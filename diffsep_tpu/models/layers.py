"""Flax layer library for NCSN++ (channels-last / NHWC, TPU-native).

Capability parity with the reference's layer stack:
  * GaussianFourierProjection, Combine, AttnBlockpp, Upsample, Downsample,
    ResnetBlockDDPMpp, ResnetBlockBigGANpp — models/ncsnpp_utils/layerspp.py
  * NIN, default_init (variance-scaling fan_avg uniform), sinusoidal
    timestep embedding, activations — models/ncsnpp_utils/layers.py
  * StyleGAN2 fused up/down Conv2d — models/ncsnpp_utils/up_or_down_sampling.py:20-60

TPU-first redesign:
  * All tensors are NHWC (batch, freq, frames, channels); convolutions use
    flax.linen.Conv which lowers to XLA NHWC convs (best TPU layout).
  * The full-grid self-attention einsum `bchw,bcij->bhwij`
    (layerspp.py:83-87) is rewritten as two (HW, HW) MXU matmuls.
  * FIR resampling routes through ops.upfirdn2d (one fused XLA conv, Pallas
    fast path when available) with data_format="NHWC".
"""
from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import resampling

Array = jax.Array


def default_init(scale: float = 1.0):
    """DDPM initializer: variance scaling, fan_avg, uniform
    (layers.py:63-102)."""
    scale = 1e-10 if scale == 0 else scale
    return nn.initializers.variance_scaling(scale, "fan_avg", "uniform")


def get_act(name: str) -> Callable[[Array], Array]:
    """Activation registry (layers.py:29-41)."""
    return {
        "elu": jax.nn.elu,
        "relu": jax.nn.relu,
        "lrelu": lambda x: jax.nn.leaky_relu(x, 0.2),
        "swish": jax.nn.silu,
        "silu": jax.nn.silu,
    }[name]


def get_timestep_embedding(
    timesteps: Array, embedding_dim: int, max_positions: int = 10000
) -> Array:
    """Sinusoidal positional embedding (layers.py:645-661)."""
    half_dim = embedding_dim // 2
    emb = math.log(max_positions) / (half_dim - 1)
    emb = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class GaussianFourierProjection(nn.Module):
    """Gaussian Fourier features for noise levels (layerspp.py:32-41).

    W is a frozen random projection (requires_grad=False in the reference);
    here it is a parameter wrapped in stop_gradient so its cotangent is zero.
    """

    embedding_size: int = 256
    scale: float = 1.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        W = self.param(
            "W",
            nn.initializers.normal(stddev=self.scale),
            (self.embedding_size,),
        )
        W = jax.lax.stop_gradient(W)
        x_proj = x[:, None] * W[None, :] * 2 * jnp.pi
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


class NIN(nn.Module):
    """1x1 'network-in-network' channel mix (layers.py:678-689)."""

    num_units: int
    init_scale: float = 0.1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        # channels-last: a plain contraction on the last axis; params are
        # cast to the activation dtype (bf16 compute keeps f32 params)
        W = self.param(
            "W", default_init(self.init_scale), (x.shape[-1], self.num_units)
        )
        b = self.param("b", nn.initializers.zeros, (self.num_units,))
        return x @ W.astype(x.dtype) + b.astype(x.dtype)


def _mxu_conv_enabled() -> bool:
    # opt-in: the Pallas implicit-GEMM conv measured SLOWER than XLA's
    # native conv emitter (41% vs 60% MFU at the hot shape — VPU-bound on
    # shifted-operand relayouts; see ops/pallas/conv3x3.py docstring), so
    # the default stays with XLA
    import os

    return (
        os.environ.get("DIFFSEP_MXU_CONV", "0") == "1"
        and jax.default_backend() == "tpu"
    )


class Conv(nn.Module):
    """Drop-in for flax.linen.Conv (NHWC) with an OPT-IN Pallas
    implicit-GEMM path for the 3x3 stride-1 undilated case on TPU
    (ops/pallas/conv3x3.py; measured slower than XLA's native conv
    emitter — see that module's verdict — so DIFFSEP_MXU_CONV=1 is
    required to enable it). The class is deliberately NAMED `Conv` so
    flax auto-naming ("Conv_0", ...) and the {kernel, bias} parameter
    structure stay bit-identical to nn.Conv — converted reference
    checkpoints keep mapping 1:1.
    """

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    kernel_dilation: Sequence[int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, x.shape[-1], self.features)
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,))
            if self.use_bias
            else None
        )
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        fast = (
            (kh, kw) == (3, 3)
            and tuple(self.strides) == (1, 1)
            and tuple(self.kernel_dilation) == (1, 1)
            and self.padding in ("SAME", ((1, 1), (1, 1)))
            and x.ndim == 4
            and _mxu_conv_enabled()
        )
        if fast:
            from ..ops.pallas.conv3x3 import conv3x3_mxu

            y = conv3x3_mxu(x, kernel)
        else:
            y = jax.lax.conv_general_dilated(
                x,
                kernel,
                window_strides=tuple(self.strides),
                padding=self.padding,
                rhs_dilation=tuple(self.kernel_dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if bias is not None:
            y = y + bias.reshape((1,) * (y.ndim - 1) + (-1,))
        return y


def conv1x1(
    features: int,
    init_scale: float = 1.0,
    use_bias: bool = True,
    name: str | None = None,
    dtype=None,
) -> Conv:
    """1x1 conv with DDPM init (layers.py:652-659)."""
    return Conv(
        features,
        (1, 1),
        kernel_init=default_init(init_scale),
        bias_init=nn.initializers.zeros,
        use_bias=use_bias,
        name=name,
        dtype=dtype,
    )


def conv3x3(
    features: int,
    stride: int = 1,
    init_scale: float = 1.0,
    use_bias: bool = True,
    dilation: int = 1,
    name: str | None = None,
    dtype=None,
) -> Conv:
    """3x3 conv, stride/dilation optional, DDPM init (layers.py:681-696)."""
    return Conv(
        features,
        (3, 3),
        strides=(stride, stride),
        kernel_dilation=(dilation, dilation),
        padding=((dilation, dilation), (dilation, dilation)),
        kernel_init=default_init(init_scale),
        bias_init=nn.initializers.zeros,
        use_bias=use_bias,
        name=name,
        dtype=dtype,
    )


class GroupNorm(nn.Module):
    """Group normalization with float32 statistics and dtype-preserving
    output.

    Drop-in replacement for flax nn.GroupNorm (same param names scale/bias
    and the same auto-name "GroupNorm_<k>", so converted checkpoints are
    unaffected). Statistics are accumulated in float32 via reduction dtype —
    no float32 copy of the activation tensor is materialized, which matters
    when the backbone computes in bfloat16 (the norms are a large share of
    HBM traffic)."""

    num_groups: int
    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        g = self.num_groups
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xg = x.reshape(*x.shape[:-1], g, c // g)
        red = tuple(range(1, x.ndim - 1)) + (x.ndim,)
        # one-read stats: E[x] and E[x^2] are independent reductions, so
        # XLA fuses them into a single pass over the input. The naive
        # mean-then-var form forces two dependent passes AND materializes
        # a full-size f32 (x-mean)^2 temp (seen as 246 MB allocations in
        # the train-step memory dump); this form is ~25% less HBM traffic
        # on a memory-bound op (scripts/microbench2.py).
        mean = jnp.mean(xg, axis=red, keepdims=True, dtype=jnp.float32)
        mean2 = jnp.mean(
            jnp.square(xg.astype(jnp.float32)),
            axis=red,
            keepdims=True,
            dtype=jnp.float32,
        )
        var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)
        # fold normalization + affine into one x*a + b elementwise pass
        # (a, b are per-(batch, group, channel) broadcast scalars). The
        # arithmetic stays in f32: in bf16, x*a and b are large and cancel
        # when |mean| >> std (8-bit mantissa), which the classic
        # (x - mean) f32 subtraction avoided. The upcast/downcast fuses
        # into the single elementwise pass — registers only, HBM traffic
        # is unchanged (still one bf16 read + one bf16 write).
        sc = scale.astype(jnp.float32).reshape(g, c // g)
        bi = bias.astype(jnp.float32).reshape(g, c // g)
        a = inv * sc
        b = bi - mean * inv * sc
        y = xg.astype(jnp.float32) * a + b
        return y.astype(x.dtype).reshape(x.shape)


def group_norm(channels: int) -> GroupNorm:
    """GroupNorm(min(c//4, 32), eps=1e-6) as used throughout NCSN++."""
    return GroupNorm(num_groups=max(min(channels // 4, 32), 1), epsilon=1e-6)


def norm_act(gn, act, x: Array) -> Array:
    """GroupNorm followed by activation, preserving x's dtype."""
    return act(gn(x)).astype(x.dtype)


class Combine(nn.Module):
    """Combine a skip pyramid with the trunk (layerspp.py:44-59)."""

    dim2: int
    method: str = "cat"
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Array, y: Array) -> Array:
        h = conv1x1(self.dim2, use_bias=True, dtype=self.dtype)(x)
        if self.method == "cat":
            return jnp.concatenate([h, y], axis=-1)
        if self.method == "sum":
            return h + y
        raise ValueError(f"Method {self.method} not recognized.")


# Above this many grid tokens the (HW, HW) score matrix dominates peak
# memory (it is what made long utterances and the round-3 sp-sharding probe
# blow up — ROADMAP "Sequence-parallel inference") and attention switches to
# the blockwise online-softmax path. 4096 tokens = a 64 MB f32 score matrix
# per batch row; the shipped 5 s operating point (320 tokens) stays on the
# naive two-matmul path, so the bench program is byte-identical.
ATTN_BLOCKWISE_THRESHOLD = 4096


def _attn_blockwise(n_tokens: int) -> bool:
    import os

    flag = os.environ.get("DIFFSEP_ATTN_BLOCKWISE", "")
    if flag == "1":
        return True
    if flag == "0":
        return False
    return n_tokens > ATTN_BLOCKWISE_THRESHOLD


def blockwise_attention(
    q: Array,
    k: Array,
    v: Array,
    scale: float,
    q_block: int = 512,
    k_block: int = 512,
) -> Array:
    """Memory-efficient exact attention: softmax(q k^T * scale) v computed
    with the online-softmax recurrence over (q_block, k_block) tiles, both
    tile loops as `lax.scan` so only ONE (q_block, k_block) score tile is
    live at a time — O(n) peak memory instead of the naive O(n^2).

    Matches the naive path's numerics choices: scores and the softmax
    statistics in f32, probability tile cast to v.dtype before the MXU
    matmul, f32 accumulation.  Equal to naive up to reassociation of the
    per-tile rescaling (tested to 2e-6 in f32).
    """
    b, n, c = q.shape
    nq = -(-n // q_block)
    nk = -(-n // k_block)
    qp = jnp.pad(q, ((0, 0), (0, nq * q_block - n), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, nk * k_block - n), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, nk * k_block - n), (0, 0)))
    # (n_blocks, b, block, c) so scan slices one tile per step
    q_tiles = qp.reshape(b, nq, q_block, c).transpose(1, 0, 2, 3)
    k_tiles = kp.reshape(b, nk, k_block, c).transpose(1, 0, 2, 3)
    v_tiles = vp.reshape(b, nk, k_block, c).transpose(1, 0, 2, 3)
    # every k tile holds >= 1 valid key (nk = ceil(n / k_block)), so each
    # score row has a finite max and exp(-inf - finite) = 0 kills the pad
    k_mask = (jnp.arange(nk * k_block) < n).reshape(nk, k_block)

    def q_step(_, q_tile):
        m0 = jnp.full((b, q_block), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((b, q_block), jnp.float32)
        a0 = jnp.zeros((b, q_block, c), jnp.float32)

        def k_step(carry, tile):
            m, l, acc = carry
            k_t, v_t, msk = tile
            s = jnp.einsum(
                "bqc,bkc->bqk", q_tile, k_t,
                preferred_element_type=jnp.float32,
            ) * scale
            s = jnp.where(msk[None, None, :], s, -jnp.inf)
            m_new = jnp.maximum(m, s.max(axis=-1))
            p = jnp.exp(s - m_new[..., None])
            alpha = jnp.exp(m - m_new)  # first step: exp(-inf) = 0
            l = l * alpha + p.sum(axis=-1)
            acc = acc * alpha[..., None] + jnp.einsum(
                "bqk,bkc->bqc", p.astype(v_t.dtype), v_t,
                preferred_element_type=jnp.float32,
            )
            return (m_new, l, acc), None

        (m, l, acc), _ = jax.lax.scan(
            k_step, (m0, l0, a0), (k_tiles, v_tiles, k_mask)
        )
        return None, acc / l[..., None]

    _, out_tiles = jax.lax.scan(q_step, None, q_tiles)  # (nq, b, qb, c)
    out = out_tiles.transpose(1, 0, 2, 3).reshape(b, nq * q_block, c)
    return out[:, :n]


class AttnBlockpp(nn.Module):
    """Self-attention over the full (freq, frames) grid (layerspp.py:62-92).

    The reference's bchw,bcij->bhwij einsum materializes the same (HW, HW)
    score matrix; here it is expressed as batched MXU matmuls over a
    flattened grid — and switches to `blockwise_attention` past
    ATTN_BLOCKWISE_THRESHOLD tokens so long utterances cost O(n) memory
    (the time/frames axis is what grows with signal length; the reference
    OOMs quadratically there).  DIFFSEP_ATTN_BLOCKWISE=1/0 forces the
    choice either way.
    """

    skip_rescale: bool = False
    init_scale: float = 0.0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h_dim, w_dim, c = x.shape
        h = group_norm(c)(x)
        q = NIN(c, name="NIN_0")(h)
        k = NIN(c, name="NIN_1")(h)
        v = NIN(c, name="NIN_2")(h)

        q = q.reshape(b, h_dim * w_dim, c)
        k = k.reshape(b, h_dim * w_dim, c)
        v = v.reshape(b, h_dim * w_dim, c)
        if _attn_blockwise(h_dim * w_dim):
            h = blockwise_attention(q, k, v, scale=int(c) ** (-0.5))
            h = h.astype(x.dtype)
        else:
            # f32 accumulation on the MXU regardless of activation dtype
            w = jnp.einsum(
                "bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32
            ) * (int(c) ** (-0.5))
            w = jax.nn.softmax(w, axis=-1).astype(x.dtype)
            h = jnp.einsum(
                "bqk,bkc->bqc", w, v, preferred_element_type=jnp.float32
            ).astype(x.dtype)
        h = h.reshape(b, h_dim, w_dim, c)
        h = NIN(c, init_scale=self.init_scale, name="NIN_3")(h)
        if not self.skip_rescale:
            return x + h
        return ((x + h) / np.sqrt(2.0)).astype(x.dtype)


class FusedResampleConv(nn.Module):
    """StyleGAN2 Conv2d with fused FIR up/down-sampling
    (up_or_down_sampling.py:20-60).

    Weights are stored in torch OIHW layout so converted checkpoints map 1:1.
    """

    out_ch: int
    kernel: int = 3
    up: bool = False
    down: bool = False
    resample_kernel: Sequence[float] = (1, 3, 3, 1)
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: Array) -> Array:
        assert not (self.up and self.down)
        assert self.kernel >= 1 and self.kernel % 2 == 1
        in_ch = x.shape[-1]
        w = self.param(
            "weight",
            default_init(),
            (self.out_ch, in_ch, self.kernel, self.kernel),
        ).astype(x.dtype)
        # ops.resampling fused conv paths are NCHW
        x = jnp.transpose(x, (0, 3, 1, 2))
        if self.up:
            x = resampling.upsample_conv_2d(x, w, k=list(self.resample_kernel))
        elif self.down:
            x = resampling.conv_downsample_2d(x, w, k=list(self.resample_kernel))
        else:
            x = jax.lax.conv_general_dilated(
                x,
                w,
                window_strides=(1, 1),
                padding=[(self.kernel // 2,) * 2] * 2,
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            )
        x = jnp.transpose(x, (0, 2, 3, 1))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
            x = x + b.astype(x.dtype)
        return x


class Upsample(nn.Module):
    """2x upsampling, optionally FIR-filtered and/or with conv
    (layerspp.py:95-137)."""

    out_ch: int | None = None
    with_conv: bool = False
    fir: bool = False
    fir_kernel: Sequence[float] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        out_ch = self.out_ch or c
        if not self.fir:
            xh = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
            if self.with_conv:
                xh = conv3x3(out_ch)(xh)
        else:
            if not self.with_conv:
                xh = resampling.upsample_2d(
                    x, list(self.fir_kernel), factor=2, data_format="NHWC"
                )
            else:
                xh = FusedResampleConv(
                    out_ch, 3, up=True, resample_kernel=self.fir_kernel,
                    name="Conv2d_0",
                )(x)
        return xh


class Downsample(nn.Module):
    """2x downsampling, optionally FIR-filtered and/or with conv
    (layerspp.py:140-184)."""

    out_ch: int | None = None
    with_conv: bool = False
    fir: bool = False
    fir_kernel: Sequence[float] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        out_ch = self.out_ch or c
        if not self.fir:
            if self.with_conv:
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(
                    out_ch,
                    (3, 3),
                    strides=(2, 2),
                    padding="VALID",
                    kernel_init=default_init(),
                    bias_init=nn.initializers.zeros,
                )(x)
            else:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        else:
            if not self.with_conv:
                x = resampling.downsample_2d(
                    x, list(self.fir_kernel), factor=2, data_format="NHWC"
                )
            else:
                x = FusedResampleConv(
                    out_ch, 3, down=True, resample_kernel=self.fir_kernel,
                    name="Conv2d_0",
                )(x)
        return x


class ResnetBlockDDPMpp(nn.Module):
    """DDPM-style residual block (layerspp.py:187-243)."""

    act: Callable[[Array], Array]
    out_ch: int | None = None
    conv_shortcut: bool = False
    dropout: float = 0.1
    skip_rescale: bool = False
    init_scale: float = 0.0

    @nn.compact
    def __call__(self, x: Array, temb: Array | None = None, train: bool = False):
        in_ch = x.shape[-1]
        out_ch = self.out_ch or in_ch
        h = norm_act(group_norm(in_ch), self.act, x)
        h = conv3x3(out_ch, name="Conv_0", dtype=h.dtype)(h)
        if temb is not None:
            h = h + nn.Dense(
                out_ch,
                kernel_init=default_init(),
                bias_init=nn.initializers.zeros,
                name="Dense_0",
                dtype=h.dtype,
            )(self.act(temb))[:, None, None, :]
        h = norm_act(group_norm(out_ch), self.act, h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = conv3x3(out_ch, init_scale=self.init_scale, name="Conv_1",
                    dtype=h.dtype)(h)
        if in_ch != out_ch:
            if self.conv_shortcut:
                x = conv3x3(out_ch, name="Conv_2", dtype=h.dtype)(x)
            else:
                x = NIN(out_ch, name="NIN_0")(x)
        if not self.skip_rescale:
            return x + h
        return ((x + h) / np.sqrt(2.0)).astype(h.dtype)


class ResnetBlockBigGANpp(nn.Module):
    """BigGAN-style residual block with in-block FIR resampling
    (layerspp.py:246-323) — the production block of the NCSN++ recipes."""

    act: Callable[[Array], Array]
    out_ch: int | None = None
    up: bool = False
    down: bool = False
    dropout: float = 0.1
    fir: bool = False
    fir_kernel: Sequence[float] = (1, 3, 3, 1)
    skip_rescale: bool = True
    init_scale: float = 0.0

    @nn.compact
    def __call__(self, x: Array, temb: Array | None = None, train: bool = False):
        in_ch = x.shape[-1]
        out_ch = self.out_ch or in_ch
        h = norm_act(group_norm(in_ch), self.act, x)

        fir_k = list(self.fir_kernel)
        if self.up:
            if self.fir:
                h = resampling.upsample_2d(h, fir_k, factor=2, data_format="NHWC")
                x = resampling.upsample_2d(x, fir_k, factor=2, data_format="NHWC")
            else:
                h = _naive_up(h)
                x = _naive_up(x)
        elif self.down:
            if self.fir:
                h = resampling.downsample_2d(h, fir_k, factor=2, data_format="NHWC")
                x = resampling.downsample_2d(x, fir_k, factor=2, data_format="NHWC")
            else:
                h = nn.avg_pool(h, (2, 2), strides=(2, 2))
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))

        h = conv3x3(out_ch, name="Conv_0", dtype=h.dtype)(h)
        if temb is not None:
            h = h + nn.Dense(
                out_ch,
                kernel_init=default_init(),
                bias_init=nn.initializers.zeros,
                name="Dense_0",
                dtype=h.dtype,
            )(self.act(temb))[:, None, None, :]
        h = norm_act(group_norm(out_ch), self.act, h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = conv3x3(out_ch, init_scale=self.init_scale, name="Conv_1",
                    dtype=h.dtype)(h)

        if in_ch != out_ch or self.up or self.down:
            x = conv1x1(out_ch, name="Conv_2", dtype=h.dtype)(x)

        if not self.skip_rescale:
            return x + h
        return ((x + h) / np.sqrt(2.0)).astype(h.dtype)


def _naive_up(x: Array) -> Array:
    b, h, w, c = x.shape
    x = x.reshape(b, h, 1, w, 1, c)
    x = jnp.tile(x, (1, 1, 2, 1, 2, 1))
    return x.reshape(b, h * 2, w * 2, c)
