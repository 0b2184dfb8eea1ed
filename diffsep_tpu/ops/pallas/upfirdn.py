"""Pallas TPU kernels for the hot upfirdn2d patterns.

The production NCSN++ only calls upfirdn2d in two shapes
(models/ncsnpp_utils/up_or_down_sampling.py:206-273):

  * upsample_2d:   up=2, pad=(2,1), 4-tap separable kernel (gain 4)
  * downsample_2d: down=2, pad=(1,1), 4-tap separable kernel

Both are bandwidth-bound separable stencils. The kernels use the polyphase
decomposition — for a 4-tap filter at factor 2, every output phase needs
exactly two taps — so no zero-inserted intermediate is ever materialized
(the XLA conv path builds one for the upsample).

Kernel structure (NHWC):
  * the input stays in HBM (`memory_space=ANY`); each grid step DMAs an
    H-tile *with its 2-row halo* into VMEM scratch (halos overlap, which
    BlockSpec partitioning cannot express),
  * the H pass consumes the halo directly; the W pass runs on the full
    row in VMEM (boundary handled by a 1-column pad),
  * outputs are written through a normal blocked out_spec.

The input is pre-padded by the caller (2-3 rows) so tile reads never go
out of bounds. The two patterns are mutually adjoint, so the custom VJP in
ops/upfirdn2d.py keeps forward and backward on the fast path.

Constraints for the fast path: C % 128 == 0 (lane width), W % 8 == 0 and
even H (tiling), which covers the four largest U-Net levels where nearly
all resampling bandwidth is spent; other calls fall back to the fused XLA
conv.

Status: numerically exact vs the conv reference (tests/test_pallas_upfirdn
runs fwd + grad in interpret mode) but OFF by default (DIFFSEP_PALLAS=1 to
enable): on the current TPU AOT toolchain, a pallas_call inside the
sampler's while-loop makes XLA allocate the custom-call *result* on the
VMEM stack and OOM at batch-16 level-1 sizes — this happens even with
memory_space=ANY out_specs and explicit output DMA (the memory-space
assignment pass scopes custom-call results in while bodies regardless;
see the go/compile-time-vmem-oom pointer in the compiler error). The XLA
conv path already runs the full forward at ~39% MFU where resampling is a
minor term. Revisit when standalone (non-scan) use or a newer toolchain
is the target.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 10 * 1024 * 1024


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


def _down_w(x, K):
    """Factor-2 FIR decimation along axis 1 of (rows, W, C); zero edges."""
    k0, k1, k2, k3 = K
    rows, w, c = x.shape
    pairs = x.reshape(rows, w // 2, 2, c)
    even = pairs[:, :, 0, :]
    odd = pairs[:, :, 1, :]
    odd_m1 = jnp.pad(odd, ((0, 0), (1, 0), (0, 0)))[:, : w // 2, :]
    even_p1 = jnp.pad(even, ((0, 0), (0, 1), (0, 0)))[:, 1:, :]
    return k0 * odd_m1 + k1 * even + k2 * odd + k3 * even_p1


def _up_w(x, C):
    """Factor-2 FIR interpolation along axis 1 of (rows, W, C)."""
    c0, c1, c2, c3 = C
    rows, w, ch = x.shape
    x_m1 = jnp.pad(x, ((0, 0), (1, 0), (0, 0)))[:, :w, :]
    x_p1 = jnp.pad(x, ((0, 0), (0, 1), (0, 0)))[:, 1:, :]
    even = c0 * x_m1 + c2 * x
    odd = c1 * x + c3 * x_p1
    return jnp.stack([even, odd], axis=2).reshape(rows, 2 * w, ch)


def _down_kernel(x_hbm, o_hbm, scratch, out_buf, sem_in, sem_out, *, taps, th, w, c):
    """One output H-tile of the 2x downsample. Input pre-padded by (1, 2)
    rows; tile t reads padded rows [2 t th, 2 t th + 2 th + 2). Both input
    and output live in HBM and move via explicit DMA (a VMEM-blocked output
    makes XLA scope the whole custom-call result on the VMEM stack inside
    while-loops)."""
    K = taps[::-1]  # convolution = flipped taps
    b = pl.program_id(0)
    t = pl.program_id(1)
    rows_in = 2 * th + 2
    row0 = pl.multiple_of(t * 2 * th, 2 * th)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(row0, rows_in)], scratch, sem_in
    )
    dma.start()
    dma.wait()
    s = scratch[:]  # (rows_in, w, c)
    # H pass with halo: y[i] = K0 s[2i] + K1 s[2i+1] + K2 s[2i+2] + K3 s[2i+3]
    pairs = s.reshape(th + 1, 2, w, c)
    even = pairs[:, 0]
    odd = pairs[:, 1]
    yh = (
        K[0] * even[:th]
        + K[1] * odd[:th]
        + K[2] * even[1 : th + 1]
        + K[3] * odd[1 : th + 1]
    )
    out_buf[:] = _down_w(yh, K).astype(out_buf.dtype)
    out_row0 = pl.multiple_of(t * th, th)
    dma_out = pltpu.make_async_copy(
        out_buf, o_hbm.at[b, pl.ds(out_row0, th)], sem_out
    )
    dma_out.start()
    dma_out.wait()


def _up_kernel(x_hbm, o_hbm, scratch, out_buf, sem_in, sem_out, *, taps, th, w, c):
    """One output H-tile (2 th rows) of the 2x upsample. Input pre-padded
    by (1, 1) rows; tile t reads padded rows [t th, t th + th + 2)."""
    C = taps[::-1]
    b = pl.program_id(0)
    t = pl.program_id(1)
    rows_in = th + 2
    row0 = pl.multiple_of(t * th, th)
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(row0, rows_in)], scratch, sem_in
    )
    dma.start()
    dma.wait()
    s = scratch[:]  # (th + 2, w, c)
    even = C[0] * s[:th] + C[2] * s[1 : th + 1]
    odd = C[1] * s[1 : th + 1] + C[3] * s[2 : th + 2]
    yh = jnp.stack([even, odd], axis=1).reshape(2 * th, w, c)
    out_buf[:] = _up_w(yh, C).astype(out_buf.dtype)
    out_row0 = pl.multiple_of(t * 2 * th, 2 * th)
    dma_out = pltpu.make_async_copy(
        out_buf, o_hbm.at[b, pl.ds(out_row0, 2 * th)], sem_out
    )
    dma_out.start()
    dma_out.wait()


def _pick_th(h_out: int, w: int, c: int, itemsize: int, mode: str):
    """Largest power-of-two output-tile height fitting the VMEM budget."""
    th = 1
    best = None
    while th <= h_out:
        if h_out % th == 0:
            if mode == "down":
                rows_in, w_out = 2 * th + 2, w // 2
            else:
                rows_in, w_out = th + 2, 2 * w
                # up kernel also materializes yh (2 th, w, c)
            scratch = rows_in * w * c * itemsize
            inter = (2 * th * w * c * itemsize) if mode == "up" else 0
            out = (2 * th if mode == "up" else th) * w_out * c * itemsize
            if scratch + inter + out <= _VMEM_BUDGET:
                best = th
        th *= 2
    return best


def match_pattern(
    kernel_np, up, down, pad4, data_format, shape, itemsize, force=False
):
    """Return ("down"|"up", taps, th) when the call matches a Pallas fast
    pattern, else None. Enabled by DIFFSEP_PALLAS=1 (or force=True)."""
    if os.environ.get("DIFFSEP_PALLAS", "0") != "1" and not force:
        return None
    if data_format != "NHWC" or len(shape) != 4:
        return None
    taps = _separable_taps(np.asarray(kernel_np))
    if taps is None:
        return None
    b, h, w, c = shape
    if c % 128 != 0 or w % 8 != 0 or h % 2 != 0 or w < 16:
        return None

    if (
        tuple(up) == (1, 1)
        and tuple(down) == (2, 2)
        and tuple(pad4) == (1, 1, 1, 1)
        and w % 2 == 0
    ):
        th = _pick_th(h // 2, w, c, itemsize, "down")
        if th is None:
            return None
        return ("down", tuple(float(t) for t in taps), th)
    if tuple(up) == (2, 2) and tuple(down) == (1, 1) and tuple(pad4) == (2, 1, 2, 1):
        th = _pick_th(h, w, c, itemsize, "up")
        if th is None:
            return None
        return ("up", tuple(float(t) for t in taps), th)
    return None


@functools.partial(
    jax.jit, static_argnames=("taps", "mode", "th", "interpret")
)
def _resample2x(x, taps, mode, th, interpret=False):
    b, h, w, c = x.shape
    if mode == "down":
        h_out, w_out = h // 2, w // 2
        x_pad = jnp.pad(x, ((0, 0), (1, 2), (0, 0), (0, 0)))
        kern = functools.partial(_down_kernel, taps=taps, th=th, w=w, c=c)
        rows_in = 2 * th + 2
        tile_h = th
    else:
        h_out, w_out = 2 * h, 2 * w
        x_pad = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
        kern = functools.partial(_up_kernel, taps=taps, th=th, w=w, c=c)
        rows_in = th + 2
        tile_h = 2 * th

    grid = (b, h_out // tile_h)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_out, c), x.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((rows_in, w, c), x.dtype),
            pltpu.VMEM((tile_h, w_out, c), x.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_pad)


def pallas_apply(x, kernel_tuple, up, down, pad4, data_format):
    """Run the matched Pallas kernel (call only after match_pattern)."""
    plan = match_pattern(
        np.asarray(kernel_tuple), up, down, pad4, data_format, x.shape,
        x.dtype.itemsize, force=True,
    )
    if plan is None:  # pragma: no cover - guarded by dispatcher
        raise NotImplementedError("no Pallas fast path for this call")
    mode, taps, th = plan
    interpret = jax.default_backend() == "cpu"
    return _resample2x(x, taps, mode, th, interpret)