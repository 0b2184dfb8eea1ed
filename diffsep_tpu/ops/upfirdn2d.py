"""upfirdn2d — fused upsample -> FIR filter -> downsample (StyleGAN2 op).

Capability parity with the reference's CUDA kernel + autograd Function
(models/ncsnpp_utils/op/upfirdn2d_kernel.cu, op/upfirdn2d.py:88-156) and its
pure-torch oracle `upfirdn2d_native` (op/upfirdn2d.py:159-200).

Semantics (per channel, separately in H and W):
  1. zero-insert upsample by `up` (x[i] -> position i*up)
  2. pad by (pad0, pad1) (negative pad = crop)
  3. convolve ("true" convolution, i.e. correlation with the flipped kernel)
  4. downsample by `down` (keep every down-th sample starting at 0)

  out_size = (in * up + pad0 + pad1 - kernel) // down + 1

TPU-native design
-----------------
The reference needs a handwritten CUDA kernel because cuDNN handles
lhs-dilated convolutions poorly.  XLA does not: `lax.conv_general_dilated`
expresses the *entire* fused op in one primitive (lhs_dilation = up,
window_strides = down, explicit padding), which XLA lowers to an MXU
convolution.  We wrap it in `jax.custom_vjp` whose backward is itself an
upfirdn2d call with the flipped kernel and swapped up/down factors (the
kernel-flip trick the reference derives at op/upfirdn2d.py:111-116), so
double-backward comes for free.

A Pallas kernel specialization for the hot (up=2 / down=2, 4-tap separable
kernel) cases lives in `ops/pallas/upfirdn.py`; this module is the
correctness oracle and the general-case fallback.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["upfirdn2d", "upfirdn2d_ref"]


def _as_tuple2(v):
    if isinstance(v, (tuple, list)):
        assert len(v) == 2
        return tuple(v)
    return (v, v)


def out_size(n: int, up: int, down: int, pad0: int, pad1: int, k: int) -> int:
    return (n * up + pad0 + pad1 - k) // down + 1


def _upfirdn2d_conv(x, kernel, up, down, pad, data_format="NCHW"):
    """Single fused lax.conv_general_dilated covering up/pad/fir/down."""
    c = x.shape[1] if data_format == "NCHW" else x.shape[-1]
    kh, kw = kernel.shape
    up_y, up_x = up
    down_y, down_x = down
    pad_y0, pad_y1, pad_x0, pad_x1 = pad

    # "true" convolution == correlation with the flipped kernel
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    if data_format == "NCHW":
        # depthwise: one shared kernel for all channels
        k = jnp.broadcast_to(k[None, None], (c, 1, kh, kw))
        dn = ("NCHW", "OIHW", "NCHW")
    else:
        k = jnp.broadcast_to(k[:, :, None, None], (kh, kw, 1, c))
        dn = ("NHWC", "HWIO", "NHWC")

    # conv_general_dilated pads *after* lhs dilation, matching the
    # upsample->pad order. One subtlety: lhs_dilation produces length
    # (n-1)*up + 1, while zero-insert upsampling produces n*up (i.e. up-1
    # trailing zeros), so fold those into the trailing padding. Negative
    # padding crops, which lax supports directly.
    return lax.conv_general_dilated(
        x,
        k,
        window_strides=(down_y, down_x),
        padding=((pad_y0, pad_y1 + up_y - 1), (pad_x0, pad_x1 + up_x - 1)),
        lhs_dilation=(up_y, up_x),
        rhs_dilation=(1, 1),
        dimension_numbers=dn,
        feature_group_count=c,
    )


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def upfirdn2d_ref(
    x, kernel, up=(1, 1), down=(1, 1), pad=(0, 0, 0, 0), data_format="NCHW"
):
    """General upfirdn2d (reference path; jit/grad/double-grad safe).

    Args:
        x: (batch, channels, in_h, in_w) or (batch, in_h, in_w, channels)
        kernel: (kh, kw) FIR filter
        up, down: (y, x) integer factors
        pad: (pad_y0, pad_y1, pad_x0, pad_x1)
        data_format: "NCHW" (reference layout) or "NHWC" (TPU-native)
    """
    return _upfirdn2d_conv(x, kernel, up, down, pad, data_format)


def _fwd(x, kernel, up, down, pad, data_format):
    out = _upfirdn2d_conv(x, kernel, up, down, pad, data_format)
    return out, (kernel, x.shape, out.shape)


def _bwd(up, down, pad, data_format, res, g):
    kernel, in_shape, out_shape = res
    up_y, up_x = up
    down_y, down_x = down
    pad_y0, pad_y1, pad_x0, pad_x1 = pad
    if data_format == "NCHW":
        _, _, in_h, in_w = in_shape
        _, _, out_h, out_w = out_shape
    else:
        _, in_h, in_w, _ = in_shape
        _, out_h, out_w, _ = out_shape
    kh, kw = kernel.shape

    # gradient = upfirdn2d(g, flip(kernel), up=down, down=up, pad=g_pad)
    # with g_pad chosen so output size equals the input size
    # (kernel-flip trick; reference derives g_pad at op/upfirdn2d.py:111-116)
    g_pad_y0 = kh - pad_y0 - 1
    g_pad_x0 = kw - pad_x0 - 1
    g_pad_y1 = in_h * up_y - out_h * down_y + pad_y0 - up_y + 1
    g_pad_x1 = in_w * up_x - out_w * down_x + pad_x0 - up_x + 1

    grad_x = upfirdn2d_ref(
        g,
        jnp.flip(kernel, (0, 1)),
        (down_y, down_x),
        (up_y, up_x),
        (g_pad_y0, g_pad_y1, g_pad_x0, g_pad_x1),
        data_format,
    )
    # FIR kernels are non-trainable constants in NCSN++; return zero cotangent
    return grad_x, jnp.zeros_like(kernel)


upfirdn2d_ref.defvjp(_fwd, _bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def _upfirdn2d_pallas(x, kernel_tuple, up, down, pad, data_format):
    from .pallas import upfirdn as pu

    return pu.pallas_apply(x, kernel_tuple, up, down, pad, data_format)


def _pallas_fwd(x, kernel_tuple, up, down, pad, data_format):
    out = _upfirdn2d_pallas(x, kernel_tuple, up, down, pad, data_format)
    return out, (x.shape, out.shape)


def _pallas_bwd(kernel_tuple, up, down, pad, data_format, res, g):
    in_shape, out_shape = res
    up_y, up_x = up
    down_y, down_x = down
    pad_y0, pad_y1, pad_x0, pad_x1 = pad
    if data_format == "NCHW":
        _, _, in_h, in_w = in_shape
        _, _, out_h, out_w = out_shape
    else:
        _, in_h, in_w, _ = in_shape
        _, out_h, out_w, _ = out_shape
    k = np.asarray(kernel_tuple)
    kh, kw = k.shape
    g_pad_y0 = kh - pad_y0 - 1
    g_pad_x0 = kw - pad_x0 - 1
    g_pad_y1 = in_h * up_y - out_h * down_y + pad_y0 - up_y + 1
    g_pad_x1 = in_w * up_x - out_w * down_x + pad_x0 - up_x + 1
    grad_x = _upfirdn2d_dispatch(
        g,
        k[::-1, ::-1],
        (down_y, down_x),
        (up_y, up_x),
        (g_pad_y0, g_pad_y1, g_pad_x0, g_pad_x1),
        "auto",
        data_format,
    )
    return (grad_x,)


_upfirdn2d_pallas.defvjp(_pallas_fwd, _pallas_bwd)


def _upfirdn2d_dispatch(x, kernel, up, down, pad4, impl, data_format):
    """Route to Pallas when the kernel taps are concrete and the call
    matches a fast pattern; else the fused XLA conv."""
    kernel_np = None
    if not isinstance(kernel, jax.core.Tracer):
        kernel_np = np.asarray(kernel)
    if impl in ("auto", "pallas") and kernel_np is not None:
        from .pallas import upfirdn as pu

        plan = pu.match_pattern(
            kernel_np, up, down, pad4, data_format, x.shape,
            getattr(x.dtype, "itemsize", 4), force=(impl == "pallas"),
        )
        if plan is not None:
            kt = tuple(tuple(float(v) for v in row) for row in kernel_np)
            return _upfirdn2d_pallas(x, kt, up, down, pad4, data_format)
        if impl == "pallas":
            raise NotImplementedError(
                "no Pallas fast path for this upfirdn2d configuration"
            )
    return upfirdn2d_ref(x, jnp.asarray(kernel), up, down, pad4, data_format)


def upfirdn2d(
    x, kernel, up=1, down=1, pad=(0, 0), impl: str = "auto", data_format="NCHW"
):
    """Public entry point matching the reference signature
    (op/upfirdn2d.py:145): scalar up/down, symmetric (pad0, pad1) applied to
    both H and W.

    impl: "auto" picks the Pallas fast path when enabled (DIFFSEP_PALLAS=1)
    and the shape qualifies, "conv" forces the XLA convolution reference,
    "pallas" forces the Pallas kernel.
    """
    up = _as_tuple2(up)
    down = _as_tuple2(down)
    if len(pad) == 2:
        pad4 = (pad[0], pad[1], pad[0], pad[1])
    else:
        pad4 = tuple(pad)
    return _upfirdn2d_dispatch(x, kernel, up, down, pad4, impl, data_format)
