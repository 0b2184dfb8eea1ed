"""Utils tests: running scaler, loaded PSD solve, pools, split dirs."""
import numpy as np

import jax.numpy as jnp

from diffsep_tpu.utils import (
    ProcessingPool,
    SplitDirectory,
    StandardScaler,
    SyncProcessingPool,
    import_name,
    solve_psd_loaded,
)


def test_standard_scaler_matches_batch_stats(rng):
    """Parity with the reference's self-test (utils/stats.py:61-89):
    the running statistics match the full-batch mean/std to 1e-5 and the
    scaled output is zero-mean/unit-std."""
    data = rng.standard_normal((50, 7)).astype(np.float32) * 3.0 + 1.5
    sc = StandardScaler(feature_shape=(7,))
    st = sc.init()
    for chunk in np.split(data, 5):
        st = sc.update(st, jnp.asarray(chunk))
    np.testing.assert_allclose(np.asarray(st.mean), data.mean(0), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sc.std(st)), data.std(0, ddof=1), atol=1e-4
    )
    scaled = np.asarray(sc.scale(st, jnp.asarray(data)))
    np.testing.assert_allclose(scaled.mean(0), 0.0, atol=1e-5)
    np.testing.assert_allclose(scaled.std(0, ddof=1), 1.0, atol=1e-4)
    back = np.asarray(sc.unscale(st, jnp.asarray(scaled)))
    np.testing.assert_allclose(back, data, atol=1e-4)


def test_solve_psd_loaded(rng):
    A = rng.standard_normal((4, 4))
    A = (A @ A.T + 4 * np.eye(4)).astype(np.float32)
    x = rng.standard_normal((4,)).astype(np.float32)
    b = A @ x
    sol = np.asarray(solve_psd_loaded(jnp.asarray(A), jnp.asarray(b), load=1e-7))
    np.testing.assert_allclose(sol, x, atol=1e-3)


def test_processing_pool_order_and_errors():
    pool = ProcessingPool(num_workers=2)
    pool.push(lambda x: x * 2, 1)
    pool.push(lambda: 1 / 0)
    pool.push(lambda x: x * 2, 3)
    res = pool.wait_results()
    assert res == [2, None, 6]
    assert len(pool.errors) == 1
    pool.close()


def test_sync_processing_pool():
    with SyncProcessingPool(num_workers=2) as pool:
        for i in range(6):
            pool.push(lambda x: x + 1, i)
        assert pool.wait_results() == [1, 2, 3, 4, 5, 6]


def test_split_directory(tmp_path):
    sd = SplitDirectory(tmp_path, max_files=3)
    paths = [sd / f"f{i}.json" for i in range(7)]
    shards = {p.parent.name for p in paths}
    assert shards == {"0000", "0001", "0002"}


def test_import_name():
    fn = import_name("diffsep_tpu.utils.solve_psd_loaded")
    assert fn is solve_psd_loaded


def test_str2bool():
    # shared by separate/evaluate/evaluate_mp --denoise (type=bool is a
    # trap: bool("false") is True)
    import pytest

    from diffsep_tpu.cli.eval_common import str2bool

    for v in ("1", "true", "True", "t", "yes", "y", True):
        assert str2bool(v) is True
    for v in ("0", "false", "False", "f", "no", "n", False):
        assert str2bool(v) is False
    with pytest.raises(ValueError):
        str2bool("maybe")
