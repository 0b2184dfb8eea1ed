"""Pallas TPU fast paths for upfirdn2d.

The production NCSN++ configuration only ever calls upfirdn2d in two shapes
(models/ncsnpp_utils/up_or_down_sampling.py:206-273):
  * upsample_2d:   up=2, down=1, 4x4 separable kernel, pad (2, 1)
  * downsample_2d: up=1, down=2, 4x4 separable kernel, pad (1, 1)

Both are memory-bound elementwise stencils, so a VPU Pallas kernel using the
separable/polyphase decomposition beats the general MXU convolution.  Until
profiling justifies the handwritten kernel, `maybe_pallas_upfirdn2d` returns
None and callers fall back to the fused `lax.conv_general_dilated` reference
in ops/upfirdn2d.py (itself already a single XLA op).
"""
from __future__ import annotations


def maybe_pallas_upfirdn2d(x, kernel, up, down, pad4, data_format="NCHW", force=False):
    """Return the Pallas result if a fast path applies, else None."""
    if force:
        raise NotImplementedError(
            "Pallas upfirdn2d fast path not yet implemented; use impl='conv'"
        )
    return None
