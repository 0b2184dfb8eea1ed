"""Serving entry point: compile-once micro-batching engine + CLI modes."""
import numpy as np
import pytest

from diffsep_tpu.data.audio_io import load_wav, save_wav


@pytest.fixture(scope="module")
def tiny_run(tmp_path_factory):
    """Train a 2-step tiny model via the CLI (same recipe as test_e2e)."""
    from diffsep_tpu.cli.train import main

    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("wsj0s")
    for split in ["tr", "cv", "tt"]:
        base = root / f"2speakers/wav8k/max/{split}"
        for d in ["mix", "s1", "s2"]:
            (base / d).mkdir(parents=True)
        for i in range(2):
            L = 4800
            s1 = rng.standard_normal((1, L)).astype(np.float32) * 0.1
            s2 = rng.standard_normal((1, L)).astype(np.float32) * 0.1
            save_wav(base / f"s1/f{i}.wav", s1, 8000)
            save_wav(base / f"s2/f{i}.wav", s2, 8000)
            save_wav(base / f"mix/f{i}.wav", s1 + s2, 8000)
    exp_root = tmp_path_factory.mktemp("exps")
    main(
        [
            f"path.datasets.wsj0_mix={root}",
            f"path.exp_root={exp_root}",
            "model.score_model.backbone_args.nf=8",
            "model.score_model.backbone_args.ch_mult=[1,2]",
            "model.score_model.backbone_args.num_res_blocks=1",
            "model.score_model.backbone_args.attn_resolutions=[16]",
            "model.score_model.backbone_args.image_size=64",
            "model.score_model.stft_args.n_fft=126",
            "model.score_model.stft_args.hop_length=32",
            "model.sampler.N=2",
            "model.valid_max_sep_batches=1",
            "trainer.max_epochs=1",
            "trainer.max_steps=1",
            "trainer.accumulate_grad_batches=1",
            "trainer.devices=1",
            "trainer.check_val_every_n_epoch=1",
            "datamodule.train.dl_opts.batch_size=2",
            "datamodule.train.dataset.max_len_s=0.5",
            "datamodule.val.dl_opts.batch_size=2",
            "datamodule.test.dl_opts.batch_size=2",
        ]
    )
    runs = sorted((exp_root / "default").iterdir())
    return root, runs[-1]


def test_engine_micro_batches_and_buckets(tiny_run, tmp_path):
    from diffsep_tpu.cli.loading import load_model
    from diffsep_tpu.cli.serve import SeparationEngine

    root, run_dir = tiny_run
    model, params = load_model(run_dir)
    eng = SeparationEngine(model, params, batch=2, bucket_s=0.3,
                           sampler_kwargs={"N": 2})

    rng = np.random.default_rng(1)
    paths = []
    for i, L in enumerate([2000, 2100, 4000]):  # two buckets
        p = tmp_path / f"in{i}.wav"
        save_wav(p, rng.standard_normal((1, L)).astype(np.float32) * 0.1, 8000)
        paths.append(p)
    out = tmp_path / "out"
    results = list(eng.process(paths, out))
    assert len(results) == 3 and all(ok for _, ok, _ in results)
    for p, L in zip(paths, [2000, 2100, 4000]):
        for s in ["s0", "s1"]:
            wav, sr = load_wav(out / s / f"{p.stem}.wav")
            assert sr == 8000 and wav.shape == (1, L)  # unpadded lengths


def test_engine_skips_bad_inputs(tiny_run, tmp_path):
    from diffsep_tpu.cli.loading import load_model
    from diffsep_tpu.cli.serve import SeparationEngine

    root, run_dir = tiny_run
    model, params = load_model(run_dir)
    eng = SeparationEngine(model, params, batch=1, sampler_kwargs={"N": 2})

    bad_sr = tmp_path / "bad_sr.wav"
    save_wav(bad_sr, np.zeros((1, 1000), np.float32), 16000)
    missing = tmp_path / "missing.wav"
    results = list(eng.process([bad_sr, missing], tmp_path / "o"))
    assert [ok for _, ok, _ in results] == [False, False]
    assert "sample rate" in results[0][2]


def test_engine_normalizes_on_true_length():
    """Normalization stats must come from the unpadded signal
    (separate.py:132-135), independent of how far the bucket pads."""
    from diffsep_tpu.cli.serve import _normalize_rows
    from diffsep_tpu.train.losses import normalize_batch

    rng = np.random.default_rng(3)
    wav = rng.standard_normal((1, 1600)).astype(np.float32) * 0.1 + 0.03
    rows, means, stds = _normalize_rows([wav], padded=8000)
    # stats equal the jit-path normalize_batch on the TRUE length
    import jax.numpy as jnp

    (_, _), mean_ref, std_ref = normalize_batch(jnp.asarray(wav)[None], None)
    assert np.isclose(means[0], np.asarray(mean_ref).item(), atol=1e-6)
    assert np.isclose(stds[0], np.asarray(std_ref).item(), atol=1e-6)
    # and do NOT depend on the pad length (the original bug: ~sqrt(5) off)
    rows2, means2, stds2 = _normalize_rows([wav], padded=1600)
    assert np.isclose(stds[0], stds2[0])
    assert rows[0].shape == (1, 8000)
    assert np.allclose(rows[0][:, :1600], rows2[0])
    assert np.all(rows[0][:, 1600:] == 0)


def test_engine_pipelines_depth1_and_isolates_finalize_errors(tmp_path):
    """process() must dispatch micro-batch k+1 BEFORE finalizing k (the
    depth-1 pipeline that overlaps the D2H transfer with the next batch's
    compute), and a finalize failure must fail only its own chunk."""
    from diffsep_tpu.cli.serve import _EngineBase
    from diffsep_tpu.data.audio_io import save_wav as _save

    events = []

    class _PipelineProbe(_EngineBase):
        fs, batch, bucket = 8000, 1, 800

        def _dispatch_bucket(self, mixes):
            events.append(("dispatch", len(events)))
            return (len([e for e in events if e[0] == "dispatch"]), mixes)

        def _finalize_bucket(self, handle):
            k, mixes = handle
            events.append(("finalize", k))
            if k == 2:  # second chunk's device_get "fails"
                raise RuntimeError("device fault")
            return [np.zeros((2, m.shape[-1]), np.float32) for m in mixes]

    paths = []
    rng = np.random.default_rng(0)
    for i in range(3):
        p = tmp_path / f"u{i}.wav"
        _save(p, rng.standard_normal((1, 790)).astype(np.float32) * 0.1,
              8000)
        paths.append(p)
    out = tmp_path / "out"
    results = list(_PipelineProbe().process(paths, out))

    # dispatch of chunk 2 precedes finalize of chunk 1, etc.
    order = [e[0] for e in events]
    assert order == [
        "dispatch", "dispatch", "finalize", "dispatch", "finalize",
        "finalize",
    ]
    by_path = {p: (ok, msg) for p, ok, msg in results}
    assert by_path[paths[0]][0] and by_path[paths[2]][0]
    ok1, msg1 = by_path[paths[1]]
    assert not ok1 and "device fault" in msg1
    # the surviving chunks really wrote their outputs
    assert (out / "s0" / "u0.wav").exists()
    assert (out / "s0" / "u2.wav").exists()
    assert not (out / "s0" / "u1.wav").exists()


def test_engine_write_errors_do_not_kill_serving(tiny_run, tmp_path):
    from diffsep_tpu.cli.loading import load_model
    from diffsep_tpu.cli.serve import SeparationEngine
    from diffsep_tpu.data.audio_io import save_wav as _save

    root, run_dir = tiny_run
    model, params = load_model(run_dir)
    eng = SeparationEngine(model, params, batch=1, sampler_kwargs={"N": 2})
    p = tmp_path / "x.wav"
    _save(p, np.random.default_rng(0).standard_normal((1, 1600)).astype(np.float32) * 0.1, 8000)
    # output dir is a FILE -> save_wav fails; must yield ERROR, not raise
    blocker = tmp_path / "outfile"
    blocker.write_text("")
    results = list(eng.process([p], blocker))
    assert len(results) == 1 and results[0][1] is False
    assert "write failed" in results[0][2]


def test_watch_retries_failed_files(tiny_run, tmp_path, capsys):
    """A file that fails transiently is retried on later polls and only
    blacklisted after MAX_ATTEMPTS."""
    import argparse

    from diffsep_tpu.cli import serve as serve_mod
    from diffsep_tpu.cli.loading import load_model
    from diffsep_tpu.cli.serve import SeparationEngine, _watch_loop

    root, run_dir = tiny_run
    model, params = load_model(run_dir)
    eng = SeparationEngine(model, params, batch=1, sampler_kwargs={"N": 2})
    watch = tmp_path / "inbox"
    watch.mkdir()
    bad = watch / "bad.wav"
    bad.write_bytes(b"not a wav file")
    args = argparse.Namespace(
        watch=watch, output_dir=tmp_path / "out", poll_s=0.01, once=False,
        batch=1,
    )
    # run the loop for MAX_ATTEMPTS+2 polls by patching sleep to count down
    polls = {"left": serve_mod.MAX_ATTEMPTS + 2}

    def fake_sleep(_):
        polls["left"] -= 1
        if polls["left"] <= 0:
            raise KeyboardInterrupt

    orig_sleep = serve_mod.time.sleep
    serve_mod.time.sleep = fake_sleep
    try:
        with pytest.raises(KeyboardInterrupt):
            _watch_loop(eng, args)
    finally:
        serve_mod.time.sleep = orig_sleep
    errors = [
        l for l in capsys.readouterr().out.splitlines() if l.startswith("ERROR")
    ]
    assert len(errors) == serve_mod.MAX_ATTEMPTS  # retried, then capped
    assert "giving up" in errors[-1]


def test_watch_once_mode(tiny_run, tmp_path):
    from diffsep_tpu.cli.serve import main

    root, run_dir = tiny_run
    watch = tmp_path / "inbox"
    watch.mkdir()
    rng = np.random.default_rng(2)
    save_wav(watch / "a.wav",
             rng.standard_normal((1, 1600)).astype(np.float32) * 0.1, 8000)
    out = tmp_path / "served"
    main(
        [
            str(out), "--model", str(run_dir), "--watch", str(watch),
            "--once", "--batch", "1", "-N", "2",
        ]
    )
    assert (out / "s0" / "a.wav").exists()
    assert (out / "s1" / "a.wav").exists()


class _FakeEngine:
    """Records the path groups process() is called with; no model."""

    def __init__(self):
        self.calls = []

    def process(self, paths, output_dir):
        self.calls.append([str(p) for p in paths])
        for p in paths:
            yield p, True, "ok"


def test_stdin_loop_drains_pending_lines_into_one_batch(tmp_path, capsys, monkeypatch):
    """Lines already queued on stdin must share one micro-batch instead of
    one program run per line."""
    import argparse
    import io
    import os
    import sys

    from diffsep_tpu.cli.serve import _stdin_loop

    r, w = os.pipe()
    with os.fdopen(w, "w") as wf:
        wf.write("a.wav\nb.wav\nc.wav\n")
    # select() needs a real fd; pipe read end provides one (EOF after 3 lines)
    eng = _FakeEngine()
    args = argparse.Namespace(batch=4, output_dir=tmp_path)
    rf = os.fdopen(r, "r")
    monkeypatch.setattr(sys, "stdin", rf)
    try:
        _stdin_loop(eng, args)
    finally:
        rf.close()
    # all three pending lines drained into ONE process() call
    assert eng.calls == [["a.wav", "b.wav", "c.wav"]]
    out = capsys.readouterr().out.splitlines()
    assert len([l for l in out if l.startswith("DONE")]) == 3


def test_engine_rejects_stereo_inputs(tiny_run, tmp_path):
    """A stereo file must get its own ERROR instead of making np.stack in
    _run_bucket raise and fail innocent co-batched mono files."""
    from diffsep_tpu.cli.loading import load_model
    from diffsep_tpu.cli.serve import SeparationEngine

    root, run_dir = tiny_run
    model, params = load_model(run_dir)
    eng = SeparationEngine(model, params, batch=2, sampler_kwargs={"N": 2})
    rng = np.random.default_rng(4)
    stereo = tmp_path / "stereo.wav"
    save_wav(stereo, rng.standard_normal((2, 1600)).astype(np.float32) * 0.1, 8000)
    mono = tmp_path / "mono.wav"
    save_wav(mono, rng.standard_normal((1, 1600)).astype(np.float32) * 0.1, 8000)
    results = {p.name: (ok, msg) for p, ok, msg in
               eng.process([stereo, mono], tmp_path / "o")}
    assert results["stereo.wav"][0] is False
    assert "mono" in results["stereo.wav"][1]
    assert results["mono.wav"][0] is True  # co-batched file unaffected


def test_stdin_loop_drains_single_write_while_pipe_open(tmp_path, monkeypatch):
    """Several lines sent in ONE write with the pipe kept open must still
    batch together: readline() used to pull them into the text-layer buffer
    where select() cannot see them, degrading to singleton batches."""
    import argparse
    import os
    import sys
    import threading
    import time as _time

    from diffsep_tpu.cli.serve import _stdin_loop

    r, w = os.pipe()
    wf = os.fdopen(w, "w")
    wf.write("a.wav\nb.wav\nc.wav\n")
    wf.flush()  # pipe stays OPEN — no EOF to flush the buffered lines
    eng = _FakeEngine()
    args = argparse.Namespace(batch=4, output_dir=tmp_path)
    rf = os.fdopen(r, "r")
    monkeypatch.setattr(sys, "stdin", rf)

    def close_when_processed():
        deadline = _time.time() + 10
        while not eng.calls and _time.time() < deadline:
            _time.sleep(0.01)
        wf.close()  # EOF terminates the loop

    t = threading.Thread(target=close_when_processed)
    t.start()
    try:
        _stdin_loop(eng, args)
    finally:
        t.join()
        rf.close()
    assert eng.calls == [["a.wav", "b.wav", "c.wav"]]


def test_watch_picks_up_redropped_file(tmp_path, monkeypatch):
    """A new file dropped under a previously processed name must be picked
    up again (bookkeeping is keyed by (path, mtime, size) identity)."""
    import argparse

    from diffsep_tpu.cli import serve as serve_mod
    from diffsep_tpu.cli.serve import _watch_loop

    watch = tmp_path / "inbox"
    watch.mkdir()
    f = watch / "a.wav"
    f.write_bytes(b"x" * 100)
    eng = _FakeEngine()
    args = argparse.Namespace(
        watch=watch, output_dir=tmp_path / "out", poll_s=0.0, once=False,
        batch=1,
    )
    polls = {"n": 0}

    def fake_sleep(_):
        polls["n"] += 1
        if polls["n"] == 3:
            f.unlink()  # removed from the drop folder
        if polls["n"] == 4:
            f.write_bytes(b"y" * 120)  # re-dropped under the same name
        if polls["n"] >= 8:
            raise KeyboardInterrupt

    monkeypatch.setattr(serve_mod.time, "sleep", fake_sleep)
    with pytest.raises(KeyboardInterrupt):
        _watch_loop(eng, args)
    assert [c for c in eng.calls if c] == [[str(f)], [str(f)]]


def test_watch_skips_growing_files_until_stable(tmp_path, monkeypatch):
    """A file whose size changes between polls (mid-copy) is not picked up
    until its size is stable across two polls."""
    import argparse

    from diffsep_tpu.cli import serve as serve_mod
    from diffsep_tpu.cli.serve import _watch_loop

    watch = tmp_path / "inbox"
    watch.mkdir()
    f = watch / "grow.wav"
    f.write_bytes(b"x" * 100)

    eng = _FakeEngine()
    args = argparse.Namespace(
        watch=watch, output_dir=tmp_path / "out", poll_s=0.0, once=False,
        batch=1,
    )
    polls = {"n": 0}

    def fake_sleep(_):
        polls["n"] += 1
        if polls["n"] == 1:
            f.write_bytes(b"x" * 200)  # still growing
        if polls["n"] >= 4:
            raise KeyboardInterrupt

    monkeypatch.setattr(serve_mod.time, "sleep", fake_sleep)
    with pytest.raises(KeyboardInterrupt):
        _watch_loop(eng, args)
    # poll1: size recorded (100), skipped. poll2: size changed (200),
    # skipped again. poll3: stable -> processed exactly once.
    assert [c for c in eng.calls if c] == [[str(f)]]


def test_streaming_real_model_long_file(tiny_run, tmp_path):
    """Streamed separation through the real (tiny) model: a 3 s file at
    1 s chunks produces full-length, finite, seam-aligned sources, and the
    CLI --stream-chunk-s path writes the same layout as whole-file mode."""
    import jax

    from diffsep_tpu.cli.loading import load_model
    from diffsep_tpu.cli.separate import main as separate_main
    from diffsep_tpu.streaming import separate_streaming

    root, run_dir = tiny_run
    model, params = load_model(run_dir)
    rng = np.random.default_rng(7)
    n = 3 * 8000
    mix = (rng.standard_normal((1, n)) * 0.1).astype(np.float32)

    out = separate_streaming(
        model, params, jax.random.PRNGKey(0), mix,
        chunk_s=1.0, overlap_s=0.25, batch=2, N=2,
    )
    assert out.shape == (2, n)
    assert np.isfinite(out).all()

    # CLI drive
    indir = tmp_path / "in"
    indir.mkdir()
    save_wav(indir / "long.wav", mix, 8000)
    outdir = tmp_path / "out"
    separate_main([
        str(indir), str(outdir), "--model", str(run_dir),
        "--stream-chunk-s", "1.0", "--stream-overlap-s", "0.25", "-N", "2",
    ])
    for s in ["s0", "s1"]:
        wav, sr = load_wav(outdir / s / "long.wav")
        assert sr == 8000 and wav.shape == (1, n)
        assert np.isfinite(wav).all()


def _http(method, url, body=None, headers=None):
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        url, data=body, method=method, headers=headers or {}
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as resp:
            return resp.status, dict(resp.headers), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read()


def test_http_separate_roundtrip_and_endpoints(tiny_run, tmp_path):
    """POST /v1/separate returns one multi-channel wav (channel i =
    source i) through the real (tiny) model; /healthz and /metrics serve
    liveness and Prometheus counters."""
    import json

    from diffsep_tpu.cli.loading import load_model
    from diffsep_tpu.cli.serve import SeparationEngine
    from diffsep_tpu.cli.serve_http import HTTPSeparationServer
    from diffsep_tpu.data.audio_io import load_wav_bytes, wav_to_bytes

    root, run_dir = tiny_run
    model, params = load_model(run_dir)
    eng = SeparationEngine(model, params, batch=2, sampler_kwargs={"N": 2})
    rng = np.random.default_rng(11)
    wav = rng.standard_normal((1, 1600)).astype(np.float32) * 0.1

    with HTTPSeparationServer(eng, port=0) as srv:
        base = f"http://127.0.0.1:{srv.port}"
        code, headers, body = _http(
            "POST", base + "/v1/separate", wav_to_bytes(wav, 8000)
        )
        assert code == 200, body
        assert headers["X-Diffsep-Sources"] == "2"
        est, sr = load_wav_bytes(body)
        assert sr == 8000 and est.shape == (2, 1600)
        assert np.isfinite(est).all()

        code, _, body = _http("GET", base + "/healthz")
        health = json.loads(body)
        assert code == 200 and health["status"] == "ok"
        assert health["fs"] == 8000 and health["batch"] == 2

        code, _, body = _http("GET", base + "/metrics")
        text = body.decode()
        assert code == 200
        assert 'diffsep_requests_total{status="ok"} 1' in text
        assert "diffsep_batch_fill_count 1" in text


def test_http_rejects_bad_requests(tiny_run):
    """Wrong sample rate and undecodable bodies get 400s with the reason;
    nothing reaches the device."""
    import json

    from diffsep_tpu.cli.loading import load_model
    from diffsep_tpu.cli.serve import SeparationEngine
    from diffsep_tpu.cli.serve_http import HTTPSeparationServer
    from diffsep_tpu.data.audio_io import wav_to_bytes

    root, run_dir = tiny_run
    model, params = load_model(run_dir)
    eng = SeparationEngine(model, params, batch=1, sampler_kwargs={"N": 2})
    wav = np.zeros((1, 800), np.float32)

    with HTTPSeparationServer(eng, port=0) as srv:
        base = f"http://127.0.0.1:{srv.port}"
        code, _, body = _http(
            "POST", base + "/v1/separate", wav_to_bytes(wav, 16000)
        )
        assert code == 400 and "sample rate" in json.loads(body)["error"]

        code, _, body = _http("POST", base + "/v1/separate", b"not a wav")
        assert code == 400 and "decode" in json.loads(body)["error"]

        code, _, _ = _http("POST", base + "/nope", b"x")
        assert code == 404

        code, _, body = _http("GET", base + "/metrics")
        assert 'diffsep_requests_total{status="error"} 3' in body.decode()


class _StubHTTPEngine:
    """Engine double for batching behavior: records _run_bucket call
    sizes, returns zeros. Validation comes from the real base class."""

    from diffsep_tpu.cli.serve import _EngineBase

    validate = _EngineBase.validate
    max_samples = None

    def __init__(self, fs=8000, batch=4, bucket=800):
        self.fs, self.batch, self.bucket = fs, batch, bucket
        self.calls = []

    def _run_bucket(self, mixes):
        self.calls.append(len(mixes))
        return [np.zeros((2, m.shape[-1]), np.float32) for m in mixes]


def test_http_concurrent_requests_share_a_micro_batch():
    """Requests pending together must be drained into ONE program run
    (the cross-connection micro-batching the stdin mode gets from its
    fd drain)."""
    from diffsep_tpu.cli.serve_http import HTTPSeparationServer

    eng = _StubHTTPEngine(batch=4)
    srv = HTTPSeparationServer(eng, port=0)  # worker NOT started yet
    try:
        pend = [
            srv.submit(np.zeros((1, 700), np.float32)) for _ in range(3)
        ]
        srv._worker.start()  # now the drain sees all three pending
        for p in pend:
            assert p.done.wait(30)
            assert p.est is not None and p.est.shape == (2, 700)
        assert eng.calls == [3]
        assert srv.metrics.batch_fill_sum == 3
        assert srv.metrics.batch_runs == 1
    finally:
        srv.shutdown()


def test_serve_from_artifact(tiny_run, tmp_path, capsys):
    """--model model.dsx serves the export artifact (no live model): a
    shorter request is padded and served through the artifact's n_valid
    input, a request longer than the static contract gets its own ERROR,
    and sampler flags are rejected (they are baked at export time)."""
    import pytest as _pytest

    from diffsep_tpu.cli.export_model import main as export_main
    from diffsep_tpu.cli.serve import main as serve_main

    root, run_dir = tiny_run
    art = tmp_path / "tiny.dsx"
    export_main(
        [
            str(run_dir), "-o", str(art), "--batch", "2",
            "--len-s", "0.25", "-N", "2", "--platforms", "cpu",
        ]
    )  # static contract: batch 2, 2000 samples @ 8 kHz

    watch = tmp_path / "inbox"
    watch.mkdir()
    rng = np.random.default_rng(9)
    save_wav(watch / "short.wav",
             rng.standard_normal((1, 1600)).astype(np.float32) * 0.1, 8000)
    save_wav(watch / "long.wav",
             rng.standard_normal((1, 4000)).astype(np.float32) * 0.1, 8000)
    out = tmp_path / "served"
    serve_main(
        [str(out), "--model", str(art), "--watch", str(watch), "--once"]
    )
    lines = capsys.readouterr().out.splitlines()
    assert any(l.startswith("DONE") and "short" in l for l in lines)
    long_err = [l for l in lines if l.startswith("ERROR") and "long" in l]
    assert len(long_err) == 1 and "static contract" in long_err[0]
    for s in ["s0", "s1"]:
        wav, sr = load_wav(out / s / "short.wav")
        assert sr == 8000 and wav.shape == (1, 1600)
        assert np.isfinite(wav).all()
        assert not (out / s / "long.wav").exists()

    with _pytest.raises(SystemExit, match="baked into"):
        serve_main([str(out), "--model", str(art), "-N", "4", "--once",
                    "--watch", str(watch)])
