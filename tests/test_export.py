"""Serving-artifact export (diffsep_tpu/export.py): the whole separation
program — weights baked in — roundtrips through jax.export serialization
and reproduces model.separate bit-for-bit on the same platform."""
import json
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml


# pull the e2e fixtures into this module's namespace (fresh module-scoped
# instances: trains the 2-step tiny run once for this file)
from test_e2e import trained_run_dir, wsj0_tree  # noqa: E402,F401


@pytest.fixture(scope="module")
def tiny_model(trained_run_dir):
    # reuse the e2e-trained tiny run so weights are real, not random-init
    from diffsep_tpu.cli.loading import load_model

    model, params = load_model(trained_run_dir)
    return model, params, trained_run_dir


def _mix(batch, n):
    rng = np.random.default_rng(0)
    return rng.standard_normal((batch, 1, n)).astype(np.float32) * 0.1


def test_export_roundtrip_matches_separate(tiny_model, tmp_path):
    from diffsep_tpu.export import export_separator, load_separator

    model, params, _ = tiny_model
    batch, n = 2, 4000
    out = tmp_path / "tiny.dsx"
    export_separator(
        model, params, batch, n, out_path=out, N=2,
        predictor_name="reverse_diffusion", corrector_name="ald2",
    )
    sep = load_separator(out)
    assert sep.meta["n_speakers"] == 2
    assert sep.meta["sampler"]["N"] == 2
    assert sep.batch == batch and sep.n_samples == n

    mix = _mix(batch, n)
    got = np.asarray(sep.call(7, mix))
    assert got.shape == (batch, 2, n)
    want, _ = model.separate(
        params, jax.random.PRNGKey(7), jnp.asarray(mix), N=2,
        predictor_name="reverse_diffusion", corrector_name="ald2",
    )
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5, rtol=1e-5)


def test_export_seed_determinism_and_shape_contract(tiny_model, tmp_path):
    from diffsep_tpu.export import export_separator, load_separator

    model, params, _ = tiny_model
    blob = export_separator(model, params, 1, 4000, N=2)
    sep = load_separator(blob)  # raw bytes load path
    mix = _mix(1, 4000)
    a = np.asarray(sep.call(3, mix))
    b = np.asarray(sep.call(3, mix))
    c = np.asarray(sep.call(4, mix))
    np.testing.assert_array_equal(a, b)  # same seed -> identical output
    assert np.abs(a - c).max() > 0  # different seed -> different sample
    with pytest.raises(ValueError, match="static serving contract"):
        sep.call(0, _mix(2, 4000))
    with pytest.raises(ValueError, match="static serving contract"):
        sep.call(0, _mix(1, 3999))


def test_export_rejects_garbage(tmp_path):
    from diffsep_tpu.export import load_separator, _MAGIC

    p = tmp_path / "bad.dsx"
    p.write_bytes(b"not an artifact")
    with pytest.raises(ValueError, match="bad magic"):
        load_separator(p)
    meta = json.dumps({"spec_version": 99}).encode()
    p.write_bytes(_MAGIC + struct.pack("<I", len(meta)) + meta + b"x")
    with pytest.raises(ValueError, match="spec_version"):
        load_separator(p)


def test_export_cli(tiny_model, tmp_path):
    from diffsep_tpu.cli.export_model import main
    from diffsep_tpu.export import load_separator

    _, _, run_dir = tiny_model
    out = tmp_path / "cli.dsx"
    main(
        [
            str(run_dir), "-o", str(out),
            "--batch", "1", "--len-s", "0.5",
            "-N", "2", "--predictor", "dpmpp", "--corrector", "none",
            "--platforms", "cpu",
        ]
    )
    sep = load_separator(out)
    fs = sep.meta["fs"]
    assert sep.n_samples == fs // 2
    est = np.asarray(sep.call(0, _mix(1, sep.n_samples)))
    assert est.shape == (1, 2, sep.n_samples)
    assert np.isfinite(est).all()
    assert sep.meta["sampler"]["predictor_name"] == "dpmpp"


def test_separate_masked_full_length_equals_separate(tiny_model):
    from diffsep_tpu.model import DiffSepModel  # noqa: F401  (import check)

    model, params, _ = tiny_model
    mix = jnp.asarray(_mix(2, 4000))
    kw = dict(N=2, predictor_name="reverse_diffusion", corrector_name="ald2")
    want, _ = model.separate(params, jax.random.PRNGKey(5), mix, **kw)
    got, _ = model.separate_masked(
        params, jax.random.PRNGKey(5), mix, jnp.full((2,), 4000), **kw
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5
    )


def test_export_variable_length_rows(tiny_model, tmp_path):
    """spec_version 2: the artifact's per-row n_valid input serves padded
    rows with true-span normalization — output matches separate_masked and
    the pad region is exactly zero."""
    from diffsep_tpu.export import export_separator, load_separator

    model, params, _ = tiny_model
    batch, n, n_true = 2, 4000, 2500
    blob = export_separator(model, params, batch, n, N=2)
    sep = load_separator(blob)
    assert sep.meta["spec_version"] == 2

    mix = _mix(batch, n)
    mix[1, :, n_true:] = 0.0  # row 1 is a padded shorter request
    n_valid = np.array([n, n_true], np.int32)
    got = np.asarray(sep.call(11, mix, n_valid))
    want, _ = model.separate_masked(
        params, jax.random.PRNGKey(11), jnp.asarray(mix),
        jnp.asarray(n_valid), N=2,
    )
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-5, rtol=1e-5)
    assert np.all(got[1, :, n_true:] == 0)  # pad region zeroed
    assert np.abs(got[1, :, :n_true]).max() > 0

    # n_valid defaults to full length; wrong shape is rejected
    full = np.asarray(sep.call(3, _mix(batch, n)))
    assert full.shape == (batch, 2, n)
    with pytest.raises(ValueError, match="n_valid"):
        sep.call(0, _mix(batch, n), np.array([n], np.int32))


def test_separate_cli_from_artifact(tiny_model, tmp_path):
    """separate.py --model model.dsx batches the folder through the
    artifact's static contract (same s{i}/{stem}.wav layout) and rejects
    baked-at-export sampler flags."""
    from diffsep_tpu.cli.export_model import main as export_main
    from diffsep_tpu.cli.separate import main as separate_main
    from diffsep_tpu.data.audio_io import load_wav, save_wav

    model, params, run_dir = tiny_model
    art = tmp_path / "m.dsx"
    export_main(
        [
            str(run_dir), "-o", str(art), "--batch", "2",
            "--len-s", "0.5", "-N", "2", "--platforms", "cpu",
        ]
    )
    indir = tmp_path / "in"
    indir.mkdir()
    rng = np.random.default_rng(2)
    for name, L in [("a", 3000), ("b", 4000)]:
        save_wav(indir / f"{name}.wav",
                 (rng.standard_normal((1, L)) * 0.1).astype(np.float32), 8000)
    outdir = tmp_path / "out"
    separate_main([str(indir), str(outdir), "--model", str(art)])
    for name, L in [("a", 3000), ("b", 4000)]:
        for s in ["s0", "s1"]:
            wav, sr = load_wav(outdir / s / f"{name}.wav")
            assert sr == 8000 and wav.shape == (1, L)
            assert np.isfinite(wav).all()

    with pytest.raises(SystemExit, match="baked at export"):
        separate_main([str(indir), str(outdir), "--model", str(art),
                       "-N", "4"])
    # --denoise is baked too (used to be silently ignored: its old default
    # of True made the conflict undetectable)
    with pytest.raises(SystemExit, match="baked at export"):
        separate_main([str(indir), str(outdir), "--model", str(art),
                       "--denoise", "false"])
