"""Pallas TPU kernels for the hot upfirdn2d patterns.

The production NCSN++ only calls upfirdn2d in two shapes
(models/ncsnpp_utils/up_or_down_sampling.py:206-273):

  * upsample_2d:   up=2, pad=(2,1), 4-tap separable kernel (gain 4)
  * downsample_2d: down=2, pad=(1,1), 4-tap separable kernel

Both are bandwidth-bound separable stencils. The kernels below use the
polyphase decomposition — for a 4-tap filter at factor 2, every output
phase needs exactly two taps:

  down:  y[i]    = K0 x[2i-1] + K1 x[2i] + K2 x[2i+1] + K3 x[2i+2]
               = K0 odd[i-1] + K1 even[i] + K2 odd[i] + K3 even[i+1]
  up:    y[2s]   = C0 x[s-1] + C2 x[s]
         y[2s+1] = C1 x[s]   + C3 x[s+1]

(with K/C the flipped, gain-scaled taps), i.e. pure shifted multiply-adds
on an even/odd reshape — VPU work with zero wasted FLOPs, where the XLA
conv path materializes the zero-inserted intermediate. The two patterns
are mutually adjoint, so the custom VJP in ops/upfirdn2d.py keeps both
directions on the fast path.

Layout: NHWC; the channel dim is tiled to the 128-lane register width; the
full (H, W) map of one (batch, channel-tile) lives in VMEM (max level-0
block is 256x320x64xbf16 = 10 MB).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 12 * 1024 * 1024


def _separable_taps(kernel: np.ndarray):
    """If `kernel` = outer(f, f) with 4 taps, return f (else None)."""
    k = np.asarray(kernel, np.float64)
    if k.shape != (4, 4):
        return None
    d = np.abs(np.diag(k))
    if (d <= 0).any():
        return None
    f = k[0, :] / np.sqrt(k[0, 0])
    if not np.allclose(np.outer(f, f), k, rtol=1e-5, atol=1e-8):
        return None
    return f.astype(np.float32)


def _shift_up(a, axis):
    """out[i] = a[i+1], zero at the end (static pad+slice)."""
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, 1)
    idx = [slice(None)] * a.ndim
    idx[axis] = slice(1, None)
    return jnp.pad(a, pad)[tuple(idx)]


def _shift_down(a, axis):
    """out[i] = a[i-1], zero at the start."""
    pad = [(0, 0)] * a.ndim
    pad[axis] = (1, 0)
    idx = [slice(None)] * a.ndim
    idx[axis] = slice(0, a.shape[axis])
    return jnp.pad(a, pad)[tuple(idx)]


def _down1d(x, taps, axis):
    """Factor-2 FIR decimation along `axis` (pad (1,1)); len must be even."""
    k0, k1, k2, k3 = [float(t) for t in taps[::-1]]  # conv = flipped taps
    n = x.shape[axis]
    new_shape = x.shape[:axis] + (n // 2, 2) + x.shape[axis + 1 :]
    pairs = x.reshape(new_shape)
    even = jax.lax.index_in_dim(pairs, 0, axis + 1, keepdims=False)
    odd = jax.lax.index_in_dim(pairs, 1, axis + 1, keepdims=False)
    return (
        k0 * _shift_down(odd, axis)
        + k1 * even
        + k2 * odd
        + k3 * _shift_up(even, axis)
    )


def _up1d(x, taps, axis):
    """Factor-2 FIR interpolation along `axis` (pad (2,1), gain folded into
    taps)."""
    c0, c1, c2, c3 = [float(t) for t in taps[::-1]]
    even = c0 * _shift_down(x, axis) + c2 * x
    odd = c1 * x + c3 * _shift_up(x, axis)
    stacked = jnp.stack([even, odd], axis=axis + 1)
    n = x.shape[axis]
    new_shape = x.shape[:axis] + (2 * n,) + x.shape[axis + 1 :]
    return stacked.reshape(new_shape)


def _resample_kernel(x_ref, o_ref, *, taps, mode):
    x = x_ref[:]  # block (1, H, W, C_tile): spatial axes are 1 and 2
    if mode == "down":
        h = _down1d(x, taps, 1)
        o_ref[:] = _down1d(h, taps, 2).astype(o_ref.dtype)
    else:
        h = _up1d(x, taps, 1)
        o_ref[:] = _up1d(h, taps, 2).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("taps", "mode", "c_tile", "interpret")
)
def _resample2x(x, taps, mode, c_tile, interpret=False):
    b, h, w, c = x.shape
    if mode == "down":
        out_shape = (b, h // 2, w // 2, c)
    else:
        out_shape = (b, 2 * h, 2 * w, c)
    grid = (b, c // c_tile)
    return pl.pallas_call(
        functools.partial(_resample_kernel, taps=taps, mode=mode),
        out_shape=jax.ShapeDtypeStruct(out_shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, h, w, c_tile),
                lambda i, j: (i, 0, 0, j),
                memory_space=pltpu.ANY if interpret else pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, out_shape[1], out_shape[2], c_tile),
            lambda i, j: (i, 0, 0, j),
            memory_space=pltpu.ANY if interpret else pltpu.VMEM,
        ),
        interpret=interpret,
    )(x)


def match_pattern(
    kernel_np, up, down, pad4, data_format, shape, itemsize, force=False
):
    """Return ("down"|"up", taps, c_tile) when the call matches a Pallas
    fast pattern, else None.

    Patterns (NHWC only):
      down2: up=(1,1), down=(2,2), pad=(1,1,1,1), 4-tap separable kernel
      up2:   up=(2,2), down=(1,1), pad=(2,1,2,1), 4-tap separable kernel
    Enabled by DIFFSEP_PALLAS=1 (or force=True).
    """
    import os

    if os.environ.get("DIFFSEP_PALLAS", "0") != "1" and not force:
        return None
    if data_format != "NHWC" or len(shape) != 4:
        return None
    taps = _separable_taps(np.asarray(kernel_np))
    if taps is None:
        return None
    b, h, w, c = shape

    interpret = jax.default_backend() == "cpu"
    c_tile = None
    for ct in (128, 64, 32, 16, 8, c):
        if c % ct == 0:
            bytes_needed = (h * w + 4 * h * w) * ct * itemsize
            if bytes_needed <= _VMEM_BUDGET or interpret:
                c_tile = ct
                break
    if c_tile is None:
        return None

    if (
        tuple(up) == (1, 1)
        and tuple(down) == (2, 2)
        and tuple(pad4) == (1, 1, 1, 1)
        and h % 2 == 0
        and w % 2 == 0
    ):
        return ("down", tuple(float(t) for t in taps), c_tile)
    if (
        tuple(up) == (2, 2)
        and tuple(down) == (1, 1)
        and tuple(pad4) == (2, 1, 2, 1)
    ):
        return ("up", tuple(float(t) for t in taps), c_tile)
    return None


def pallas_apply(x, kernel_tuple, up, down, pad4, data_format):
    """Run the matched Pallas kernel (call only after match_pattern)."""
    plan = match_pattern(
        np.asarray(kernel_tuple), up, down, pad4, data_format, x.shape,
        x.dtype.itemsize, force=True,
    )
    if plan is None:  # pragma: no cover - guarded by dispatcher
        raise NotImplementedError("no Pallas fast path for this call")
    mode, taps, c_tile = plan
    interpret = jax.default_backend() == "cpu"
    return _resample2x(x, taps, mode, c_tile, interpret)
