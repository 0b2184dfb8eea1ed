"""Pallas TPU kernel: 3x3 stride-1 SAME convolution as implicit GEMM.

MEASURED VERDICT (round 3, scripts/conv_mxu_bench.py on the v5e —
measure-first rule, same discipline that closed int8): this kernel is
correct everywhere (exact vs the XLA oracle at the hot shapes) but
SLOWER than XLA's native conv emitter, 41.1% vs 60.3% MFU at
(16,256,320,128), and behind at every NCSN++ level. Root cause: in
Pallas's operand model every (dy, dx) tap needs the shifted view
materialized by the VPU (sublane-offset relayout) before the MXU can
consume it — >= 9 VPU moves per input element that do not overlap the
matmuls, ~1.5 ms of pure relayout at the hot shape against a 2.0 ms MXU
floor. The im2col single-matmul variant that would amortize the adds
cannot compile at all: Mosaic rejects concatenating sublane-shifted
vectors ("result/input offset mismatch on non-concat dimension") — the
refused relayout IS the cost. XLA's conv emitter streams shifted
operands into the systolic array without explicit VPU materialization,
which is why it wins and why this path is OFF by default
(DIFFSEP_MXU_CONV=1 opts in; models/layers.py Conv). Kept in-tree as a
tested record of the attempt and a base for revisiting when Mosaic
grows strided-operand matmuls.

Design (what was built): each grid cell holds one halo block of the
input on-chip and accumulates nine (TILE_H*(W+2), C) @ (C, Cout) MXU
matmuls into a float32 accumulator — the input is read from HBM exactly
once and the 3x3 structure costs no extra HBM bandwidth.

The layout trick making the nine matmul operands free: the padded input
is flattened to (B, (H+3)*(W+2), C) OUTSIDE the kernel (a no-op on the
linear HBM layout), so the kernel is purely 2-D. Row index i*(W+2)+j of
the flat view addresses padded pixel (i, j); for tap (dy, dx) the rows
[dy*(W+2)+dx : ... + TILE_H*(W+2)] are exactly the pixels each output
position needs — at the price of 2 junk columns per row (the w = W, W+1
wrap-arounds), < 1% extra FLOPs, sliced off after the call. One extra
pad row at the bottom keeps the dy=2 taps in bounds.

Reference counterpart: the CUDA upfirdn2d precedent for hand kernels in
the hot path (op/upfirdn2d_kernel.cu:50-105); the convs themselves are
stock torch convs in the reference hot loop (models/ncsnpp.py:319-478).

The public wrapper `conv3x3_mxu` carries a jax.custom_vjp whose backward
uses XLA convs (transposed-kernel trick), so the op is trainable while
only the inference-critical forward runs the hand kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile_h(h: int, w: int, c_in: int, c_out: int,
                 variant: str = "slices") -> int:
    """Largest power-of-two row tile <= 32 that divides H and keeps the
    input block + accumulator + output comfortably inside VMEM (~16 MB
    with pipeline double-buffering)."""
    for th in (32, 16, 8, 4, 2, 1):
        if h % th:
            continue
        wp = -(-(w + 2) // 8) * 8
        vmem = (
            (th + 3) * wp * c_in * 2 * 2  # bf16 input block, double-buffered
            + th * wp * c_out * 4  # f32 accumulator
            + th * wp * c_out * 2 * 2  # output block, double-buffered
        )
        if variant == "im2col":
            vmem += th * wp * 9 * c_in * 2  # materialized im2col operand
        if vmem < 10 * 1024 * 1024:
            return th
    return 1


def _conv_kernel(x_ref, w_ref, out_ref, *, tile_h, wp, c_in, c_out):
    """One (batch, h-tile) cell: 9 statically-shifted MXU matmuls."""
    a2 = x_ref[0]  # ((tile_h + 3) * wp, c_in)
    n_rows = tile_h * wp
    acc = jnp.zeros((n_rows, c_out), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            off = dy * wp + dx
            a = a2[off : off + n_rows, :]
            acc = acc + jnp.dot(
                a, w_ref[dy * 3 + dx], preferred_element_type=jnp.float32
            )
    out_ref[0] = acc.astype(out_ref.dtype)


def _conv_kernel_im2col(x_ref, w_ref, out_ref, *, tile_h, wp, c_in, c_out):
    """Variant: materialize the 9 shifted views once into a (rows, 9*C)
    im2col operand, then ONE large-K MXU matmul — no intermediate
    accumulator adds."""
    a2 = x_ref[0]
    n_rows = tile_h * wp
    cols = [
        a2[dy * wp + dx : dy * wp + dx + n_rows, :]
        for dy in range(3)
        for dx in range(3)
    ]
    a = jnp.concatenate(cols, axis=1)  # (n_rows, 9*c_in)
    wk = w_ref[...].reshape(9 * c_in, c_out)
    out_ref[0] = jnp.dot(
        a, wk, preferred_element_type=jnp.float32
    ).astype(out_ref.dtype)


def _conv3x3_pallas(x, w, interpret=None, variant=None):
    if interpret is None:
        # interpret mode off the TPU so the op runs under the CPU test
        # suite and the virtual-device multichip dryrun
        interpret = jax.default_backend() != "tpu"
    if variant is None:
        import os

        variant = os.environ.get("DIFFSEP_CONV_VARIANT", "slices")
    return _conv3x3_pallas_jit(x, w, interpret, variant)


@functools.partial(jax.jit, static_argnames=("interpret", "variant"))
def _conv3x3_pallas_jit(x, w, interpret=False, variant="slices"):
    """x: (B, H, W, C) NHWC; w: (3, 3, C, Cout) HWIO. SAME, stride 1."""
    b, h, w_len, c_in = x.shape
    kh, kw, wc_in, c_out = w.shape
    assert (kh, kw) == (3, 3) and wc_in == c_in, (w.shape, x.shape)
    tile_h = _pick_tile_h(h, w_len, c_in, c_out, variant)
    # row length wp rounded up to a multiple of 8 so every flat block dim
    # satisfies the Mosaic sublane-divisibility constraint (the extra junk
    # columns are < a few % of FLOPs and sliced off after the call)
    wp = -(-(w_len + 2) // 8) * 8
    # halo pad: 1 row/col before; 2 rows after (keeps the dy=2 flat taps
    # in bounds) — then flatten (H, W) on the host side of the call,
    # which is free on the linear HBM layout
    xp = jnp.pad(x, ((0, 0), (1, 2), (1, wp - w_len - 1), (0, 0)))
    xf = xp.reshape(b, (h + 3) * wp, c_in)
    wk = w.reshape(9, c_in, c_out)

    n_tiles = h // tile_h
    blk_in = (tile_h + 3) * wp
    blk_out = tile_h * wp
    kern = _conv_kernel if variant == "slices" else _conv_kernel_im2col
    out_flat = pl.pallas_call(
        functools.partial(
            kern, tile_h=tile_h, wp=wp, c_in=c_in, c_out=c_out
        ),
        out_shape=jax.ShapeDtypeStruct((b, h * wp, c_out), x.dtype),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(
                # all dims Element (Mosaic: mixing Element/Blocked in one
                # spec is unsupported); index_map returns element offsets
                (pl.Element(1), pl.Element(blk_in), pl.Element(c_in)),
                lambda bi, gi: (bi, gi * blk_out, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (9, c_in, c_out),
                lambda bi, gi: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, blk_out, c_out),
            lambda bi, gi: (bi, gi, 0),
            memory_space=pltpu.VMEM,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * h * wp * 9 * c_in * c_out,
            bytes_accessed=(
                xf.size * xf.dtype.itemsize
                + wk.size * wk.dtype.itemsize
                + b * h * wp * c_out * x.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(xf, wk)
    # drop the 2 junk wrap-around columns per row
    return out_flat.reshape(b, h, wp, c_out)[:, :, :w_len, :]


def conv3x3_reference(x, w):
    """XLA oracle: same op via lax.conv_general_dilated (NHWC, SAME)."""
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@jax.custom_vjp
def conv3x3_mxu(x, w):
    """3x3 SAME stride-1 conv, NHWC/HWIO, Pallas forward + XLA backward."""
    return _conv3x3_pallas(x, w)


def _fwd(x, w):
    return _conv3x3_pallas(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    # exact XLA-derived gradients of the oracle — the hand kernel only
    # ever runs the inference-critical forward
    _, vjp = jax.vjp(conv3x3_reference, x, w)
    return vjp(g)


conv3x3_mxu.defvjp(_fwd, _bwd)
