"""Checkpoint averaging (load_model(avg_last_k=k)): the evaluation weights
become the elementwise mean of the k most recent checkpoints' EMA params —
a zero-inference-cost ensembling lever on top of the per-step EMA. No
reference counterpart (beyond-parity, like cli/serve.py)."""
import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from diffsep_tpu.cli.loading import load_model
from diffsep_tpu.config import compose
from diffsep_tpu.config.compose import to_dict
from diffsep_tpu.model import DiffSepModel
from diffsep_tpu.train.checkpoints import CheckpointManager

TINY = [
    "model.score_model.backbone_args.nf=8",
    "model.score_model.backbone_args.ch_mult=[1,2]",
    "model.score_model.backbone_args.num_res_blocks=1",
    "model.score_model.backbone_args.attn_resolutions=[16]",
    "model.score_model.backbone_args.image_size=64",
    "model.score_model.stft_args.n_fft=126",
    "model.score_model.stft_args.hop_length=32",
]


@pytest.fixture(scope="module")
def run_with_three_checkpoints(tmp_path_factory):
    cfg = compose(TINY)
    model = DiffSepModel(cfg)
    mix = jnp.zeros((1, 1, 2000), jnp.float32) + 0.01
    tgt = jnp.zeros((1, 2, 2000), jnp.float32)
    state = model.init_state(jax.random.PRNGKey(0), mix, tgt)

    run = tmp_path_factory.mktemp("avg_run")
    with open(run / "hparams.yaml", "w") as f:
        yaml.safe_dump({"config": to_dict(cfg)}, f)
    mgr = CheckpointManager(run / "checkpoints", best_symlink=False)
    # three checkpoints whose EMA params are base, base+3, base+6
    for i, step in enumerate([1, 2, 3]):
        shift = 3.0 * i
        st = state.replace(
            step=jnp.asarray(step),
            params=jax.tree_util.tree_map(
                lambda a: a + 2 * shift, state.params
            ),
            ema=state.ema._replace(
                params=jax.tree_util.tree_map(
                    lambda a: a + shift, state.ema.params
                )
            ),
        )
        mgr.save(step, st)
    mgr.close()
    base = jax.device_get(state.ema.params)
    base_raw = jax.device_get(state.params)
    return run, base, base_raw


def _assert_tree_offset(params, base, offset):
    flat_p = dict(jax.tree_util.tree_leaves_with_path(params))
    flat_b = jax.tree_util.tree_leaves_with_path(base)
    assert len(flat_p) == len(flat_b)
    for path, leaf in flat_b:
        np.testing.assert_allclose(
            np.asarray(flat_p[path]),
            np.asarray(leaf) + offset,
            rtol=1e-6,
            atol=1e-6,
        )


def test_avg_last_k_means_recent_ema(run_with_three_checkpoints):
    run, base, _ = run_with_three_checkpoints
    # last 2 checkpoints have EMA offsets +3 and +6 -> mean +4.5
    _, params = load_model(run, avg_last_k=2)
    _assert_tree_offset(params, base, 4.5)
    # all 3: mean of (0, 3, 6) = +3
    _, params = load_model(run, avg_last_k=3)
    _assert_tree_offset(params, base, 3.0)


def test_avg_last_k_more_than_available_warns_and_averages_all(
    run_with_three_checkpoints, caplog
):
    import logging

    run, base, _ = run_with_three_checkpoints
    with caplog.at_level(logging.WARNING):
        _, params = load_model(run, avg_last_k=10)
    _assert_tree_offset(params, base, 3.0)
    assert any("avg_last_k" in r.message for r in caplog.records)


def test_avg_last_k_raw_params(run_with_three_checkpoints):
    run, _, base_raw = run_with_three_checkpoints
    _, params = load_model(run, avg_last_k=2, use_ema=False)
    _assert_tree_offset(params, base_raw, 9.0)  # mean of (+6, +12)


def test_avg_last_k_anchored_at_step(run_with_three_checkpoints):
    """An explicit step anchors the averaging window: only checkpoints at
    or before it qualify (export_model --step N --avg-last-k k must not
    silently average later checkpoints)."""
    run, base, _ = run_with_three_checkpoints
    # steps <= 2 have EMA offsets +0 and +3 -> mean +1.5
    _, params = load_model(run, step=2, avg_last_k=2)
    _assert_tree_offset(params, base, 1.5)
    # step-dir path pins the anchor the same way
    _, params = load_model(run / "checkpoints" / "2", avg_last_k=2)
    _assert_tree_offset(params, base, 1.5)


def test_resolve_avg_steps(run_with_three_checkpoints):
    from diffsep_tpu.cli.loading import resolve_avg_steps

    run, _, _ = run_with_three_checkpoints
    assert resolve_avg_steps(run, 2) == [2, 3]
    assert resolve_avg_steps(run, 10) == [1, 2, 3]  # effective k for tags
    assert resolve_avg_steps(run, 2, step=2) == [1, 2]
    with pytest.raises(FileNotFoundError, match="at or before"):
        resolve_avg_steps(run, 2, step=0)


def test_avg_last_k_rejects_torch_single_file(tmp_path):
    f = tmp_path / "x.ckpt"
    f.write_bytes(b"")
    with pytest.raises(ValueError, match="avg_last_k"):
        load_model(f, avg_last_k=2)
