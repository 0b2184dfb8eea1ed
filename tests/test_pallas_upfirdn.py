"""Pallas upfirdn2d fast-path tests (interpret mode on CPU).

The Pallas kernels must match the fused XLA conv reference exactly for the
two production patterns (upsample_2d / downsample_2d with the 4-tap
separable FIR), including gradients (the patterns are mutually adjoint).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffsep_tpu.ops.resampling import downsample_2d, setup_kernel, upsample_2d
from diffsep_tpu.ops.upfirdn2d import upfirdn2d


@pytest.fixture
def x_nhwc(rng):
    # fast-path constraints: C % 128 == 0, W % 8 == 0, even H
    return jnp.asarray(rng.standard_normal((2, 8, 16, 128)).astype(np.float32))


def test_pallas_down2_matches_conv(x_nhwc):
    k = setup_kernel([1.0, 3.0, 3.0, 1.0])
    ref = upfirdn2d(x_nhwc, k, down=2, pad=(1, 1), impl="conv",
                    data_format="NHWC")
    out = upfirdn2d(x_nhwc, k, down=2, pad=(1, 1), impl="pallas",
                    data_format="NHWC")
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_up2_matches_conv(x_nhwc):
    k = setup_kernel([1.0, 3.0, 3.0, 1.0]) * 4.0
    ref = upfirdn2d(x_nhwc, k, up=2, pad=(2, 1), impl="conv",
                    data_format="NHWC")
    out = upfirdn2d(x_nhwc, k, up=2, pad=(2, 1), impl="pallas",
                    data_format="NHWC")
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_asymmetric_taps(x_nhwc):
    """Non-symmetric separable taps exercise the kernel flip."""
    k = setup_kernel([1.0, 2.0, 4.0, 1.0])
    ref = upfirdn2d(x_nhwc, k, down=2, pad=(1, 1), impl="conv",
                    data_format="NHWC")
    out = upfirdn2d(x_nhwc, k, down=2, pad=(1, 1), impl="pallas",
                    data_format="NHWC")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("mode", ["down", "up"])
def test_pallas_gradients_match_conv(x_nhwc, mode):
    if mode == "down":
        k = setup_kernel([1.0, 3.0, 3.0, 1.0])
        kw = dict(down=2, pad=(1, 1))
    else:
        k = setup_kernel([1.0, 3.0, 3.0, 1.0]) * 4.0
        kw = dict(up=2, pad=(2, 1))

    def loss(impl):
        def f(x):
            y = upfirdn2d(x, k, impl=impl, data_format="NHWC", **kw)
            return (y**3).sum()
        return f

    g_ref = jax.grad(loss("conv"))(x_nhwc)
    g_pal = jax.grad(loss("pallas"))(x_nhwc)
    np.testing.assert_allclose(
        np.asarray(g_pal), np.asarray(g_ref), rtol=1e-4, atol=1e-4
    )


def test_pallas_under_jit_and_env(monkeypatch, x_nhwc):
    """DIFFSEP_PALLAS=1 routes the resampling wrappers automatically."""
    monkeypatch.setenv("DIFFSEP_PALLAS", "1")
    k = [1.0, 3.0, 3.0, 1.0]
    f = jax.jit(lambda x: downsample_2d(x, k, data_format="NHWC"))
    out = np.asarray(f(x_nhwc))
    ref = np.asarray(downsample_2d(x_nhwc, k, data_format="NHWC", impl="conv"))
    np.testing.assert_allclose(out, ref, atol=1e-5)

    f2 = jax.jit(lambda x: upsample_2d(x, k, data_format="NHWC"))
    out2 = np.asarray(f2(x_nhwc))
    ref2 = np.asarray(upsample_2d(x_nhwc, k, data_format="NHWC", impl="conv"))
    np.testing.assert_allclose(out2, ref2, atol=1e-5)


def test_non_matching_pattern_falls_back(x_nhwc):
    """up=3 has no fast path; impl=pallas must raise, auto must work."""
    k = setup_kernel([1.0, 2.0, 1.0])
    with pytest.raises(NotImplementedError):
        upfirdn2d(x_nhwc, k, up=3, pad=(1, 1), impl="pallas",
                  data_format="NHWC")
    out = upfirdn2d(x_nhwc, k, up=3, pad=(1, 1), impl="auto",
                    data_format="NHWC")
    from diffsep_tpu.ops.upfirdn2d import out_size

    assert out.shape[1] == out_size(8, 3, 1, 1, 1, 3)  # sanity: ran conv
