"""init_params example-shape invariance.

model.init_params truncates its example to (batch=1, <=4096 samples)
before running the flax init forward — the optimization that lets the
init program run on the local CPU backend instead of round-tripping the
~260 MB flat result through the ~38 MB/s remote D2H tunnel. That is only
sound if parameter SHAPES and VALUES are independent of the example's
batch/length (they are: the models are fully convolutional/chunked over
time, serve variable lengths with one param set, and no initializer is
data-dependent). This pins it.
"""
import jax
import jax.numpy as jnp
import numpy as np


def _tiny_model():
    import __graft_entry__ as g

    return g._flagship_model(tiny=True)


def test_param_tree_invariant_to_example_shape():
    model = _tiny_model()
    key = jax.random.PRNGKey(3)
    p_small = model.init_params(
        key, jnp.zeros((1, 1, 900), jnp.float32),
        jnp.zeros((1, 2, 900), jnp.float32),
    )
    p_big = model.init_params(
        key, jnp.zeros((3, 1, 5000), jnp.float32),
        jnp.zeros((3, 2, 5000), jnp.float32),
    )
    flat_s, tree_s = jax.tree_util.tree_flatten(p_small)
    flat_b, tree_b = jax.tree_util.tree_flatten(p_big)
    assert tree_s == tree_b
    for a, b in zip(flat_s, flat_b):
        assert a.shape == b.shape and a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_long_example_still_truncates_to_valid_forward():
    # lengths beyond the 4096 cut and odd batch sizes must still init
    model = _tiny_model()
    p = model.init_params(
        jax.random.PRNGKey(0), jnp.zeros((5, 1, 12000), jnp.float32),
        jnp.zeros((5, 2, 12000), jnp.float32),
    )
    assert jax.tree_util.tree_leaves(p)
