"""FIR up/down-sampling wrappers (StyleGAN2-style).

Capability parity with models/ncsnpp_utils/up_or_down_sampling.py:
  * upsample_2d / downsample_2d (up_or_down_sampling.py:206-273) — the hot
    path used inside every BigGAN resblock and the input/output pyramids
  * upsample_conv_2d / conv_downsample_2d (76-189) — fused conv+resample for
    the with_conv Upsample/Downsample modules (ddpm resblock mode)
  * naive_upsample_2d / naive_downsample_2d (63-73)
  * _setup_kernel normalization (192-199)

Everything operates on NCHW arrays; weights are OIHW like torch so that
converted checkpoints drop in directly.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from .upfirdn2d import upfirdn2d

__all__ = [
    "setup_kernel",
    "upsample_2d",
    "downsample_2d",
    "upsample_conv_2d",
    "conv_downsample_2d",
    "naive_upsample_2d",
    "naive_downsample_2d",
]


def setup_kernel(k) -> np.ndarray:
    """Normalize a 1-D (separable) or 2-D FIR kernel to unit DC gain."""
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / k.sum()
    assert k.ndim == 2 and k.shape[0] == k.shape[1]
    return k


def upsample_2d(x, k=None, factor=2, gain=1.0, impl="auto", data_format="NCHW"):
    """FIR upsample by `factor` (zero-insert + low-pass)."""
    assert isinstance(factor, int) and factor >= 1
    if k is None:
        k = [1.0] * factor
    k = setup_kernel(k) * (gain * factor**2)
    p = k.shape[0] - factor
    return upfirdn2d(
        x, k, up=factor, pad=((p + 1) // 2 + factor - 1, p // 2), impl=impl,
        data_format=data_format,
    )


def downsample_2d(x, k=None, factor=2, gain=1.0, impl="auto", data_format="NCHW"):
    """FIR anti-aliased downsample by `factor`."""
    assert isinstance(factor, int) and factor >= 1
    if k is None:
        k = [1.0] * factor
    k = setup_kernel(k) * gain
    p = k.shape[0] - factor
    return upfirdn2d(x, k, down=factor, pad=((p + 1) // 2, p // 2), impl=impl,
                     data_format=data_format)


def upsample_conv_2d(x, w, k=None, factor=2, gain=1.0):
    """Fused transpose-conv upsample followed by the FIR tail.

    w: (out_ch, in_ch, kh, kw) torch-layout conv weight.
    """
    assert isinstance(factor, int) and factor >= 1
    out_ch, in_ch, ch_h, ch_w = w.shape
    assert ch_h == ch_w
    if k is None:
        k = [1.0] * factor
    k = setup_kernel(k) * (gain * factor**2)
    p = (k.shape[0] - factor) - (ch_w - 1)

    # The transposed conv (stride=factor, flipped-kernel torch layout) equals
    # an lhs-dilated *correlation* with the unflipped OIHW weight and full
    # padding — one fused XLA conv.
    x = lax.conv_general_dilated(
        x,
        jnp.asarray(w),
        window_strides=(1, 1),
        padding=((ch_h - 1, ch_h - 1), (ch_w - 1, ch_w - 1)),
        lhs_dilation=(factor, factor),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return upfirdn2d(x, k, pad=((p + 1) // 2 + factor - 1, p // 2 + 1))


def conv_downsample_2d(x, w, k=None, factor=2, gain=1.0):
    """FIR low-pass followed by a strided conv (fused downsample)."""
    assert isinstance(factor, int) and factor >= 1
    out_ch, in_ch, ch_h, ch_w = w.shape
    assert ch_h == ch_w
    if k is None:
        k = [1.0] * factor
    k = setup_kernel(k) * gain
    p = (k.shape[0] - factor) + (ch_w - 1)
    x = upfirdn2d(x, k, pad=((p + 1) // 2, p // 2))
    return lax.conv_general_dilated(
        x,
        jnp.asarray(w),
        window_strides=(factor, factor),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def naive_upsample_2d(x, factor=2):
    b, c, h, w = x.shape
    x = x.reshape(b, c, h, 1, w, 1)
    x = jnp.tile(x, (1, 1, 1, factor, 1, factor))
    return x.reshape(b, c, h * factor, w * factor)


def naive_downsample_2d(x, factor=2):
    b, c, h, w = x.shape
    x = x.reshape(b, c, h // factor, factor, w // factor, factor)
    return x.mean(axis=(3, 5))
