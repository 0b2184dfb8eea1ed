"""The degenerate low-NFE linear-grid guard (VERDICT r4 item 3).

DDIM-family sampling at N<=2 on the default/linear time grid is a measured
quality pathology (demo task: -3.3 dB vs 17.1 dB on the log grid at N=2 —
BENCH_r04 quality_distill_demo).  model.separate / separate_masked /
get_pc_sampler — the paths every CLI (evaluate, serve, serve_http) routes
through — must warn and point at schedule='log'; explicitly scheduled or
higher-N calls must stay silent.  The reference's own scheduled sampler
(/root/reference/sdes/__init__.py:46-129) has the same trap, unguarded.
"""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny():
    import __graft_entry__ as g

    model = g._flagship_model(tiny=True)
    rng = np.random.default_rng(0)
    fs = 800
    mix = jnp.asarray(rng.standard_normal((2, 1, fs)), jnp.float32) * 0.1
    params = model.init_params(
        jax.random.PRNGKey(0), mix, jnp.zeros((2, 2, fs), jnp.float32)
    )
    return model, params, mix


def _factory_warns(model, **kw):
    # the guard fires in the factory, before any compute
    y = jnp.zeros((1, 1, 8), jnp.float32)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        model.get_pc_sampler(
            kw.pop("predictor_name"), "none", y, params=None, **kw
        )
    return [w for w in rec if "time grid degenerates" in str(w.message)]


def test_ddim_n2_default_grid_warns(tiny):
    model, _, _ = tiny
    assert _factory_warns(model, predictor_name="ddim", N=2)


def test_ddim_n1_linear_grid_warns(tiny):
    model, _, _ = tiny
    assert _factory_warns(
        model, predictor_name="ddim", N=1, schedule="linear"
    )


def test_dpmpp_n2_warns(tiny):
    model, _, _ = tiny
    assert _factory_warns(model, predictor_name="dpmpp", N=2)


def test_log_grid_silent(tiny):
    model, _, _ = tiny
    assert not _factory_warns(
        model, predictor_name="ddim", N=2, schedule="log"
    )


def test_higher_n_silent(tiny):
    model, _, _ = tiny
    assert not _factory_warns(model, predictor_name="ddim", N=4)


def test_pc_sampler_silent(tiny):
    # the PC sampler's corrector steps don't share the pathology
    model, _, _ = tiny
    assert not _factory_warns(model, predictor_name="reverse_diffusion", N=2)


def test_separate_path_warns_and_runs(tiny):
    model, params, mix = tiny
    with pytest.warns(UserWarning, match="schedule='log'"):
        est, _ = model.separate(
            params, jax.random.PRNGKey(1), mix,
            predictor_name="ddim", corrector_name="none", N=2,
        )
    assert np.isfinite(np.asarray(est)).all()


def test_separate_masked_path_warns(tiny):
    model, params, mix = tiny
    with pytest.warns(UserWarning, match="time grid degenerates"):
        model.separate_masked(
            params, jax.random.PRNGKey(1), mix,
            n_valid=np.array([800, 400]),
            predictor_name="ddim", corrector_name="none", N=2,
        )
