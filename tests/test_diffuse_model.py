"""The diffuse model config builds and trains end-to-end (the reference's
diffuse.yaml is absent; here the variant is runnable)."""
import numpy as np

import jax
import jax.numpy as jnp

from diffsep_tpu.config import compose
from diffsep_tpu.model import DiffSepModel


def test_diffuse_model_builds_and_steps(rng):
    cfg = compose(
        [
            "model=diffuse",
            "model.score_model.backbone_args.residual_layers=2",
            "model.score_model.backbone_args.residual_channels=8",
            "trainer.accumulate_grad_batches=1",
        ]
    )
    model = DiffSepModel(cfg)
    target = jnp.asarray(rng.standard_normal((2, 2, 512)).astype(np.float32))
    mix = target.sum(axis=1, keepdims=True)

    state = model.init_state(jax.random.PRNGKey(0), mix, target)
    step = jax.jit(model.make_train_step(jax.random.PRNGKey(1)))
    state, metrics = step(state, mix, target)
    assert np.isfinite(float(metrics["train/score_loss"]))

    est, nfe = model.separate(state.params, jax.random.PRNGKey(2), mix, N=2)
    assert est.shape == target.shape
    assert np.isfinite(np.asarray(est)).all()


def test_count_parameters():
    from diffsep_tpu.utils.params import count_parameters

    params = {"a": jnp.zeros((3, 4)), "b": {"c": jnp.zeros((5,))}}
    assert count_parameters(params) == 17
