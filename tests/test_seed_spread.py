"""Multi-seed spread aggregation (VERDICT r4 item 2 tooling).

scripts/seed_spread.py aggregates per-seed demo records into
{mean, min, max, spread, values} blocks; bench.py embeds them in the
graded JSON line (quality_spread). The aggregation is pure — these tests
pin its semantics without running any training.
"""
import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_aggregate_mean_min_max_spread():
    ss = _load("seed_spread", REPO / "scripts" / "seed_spread.py")
    recs = [
        {"seed": 0, "si_sdr_a_db": 20.0, "si_sdr_b_db": 10.0, "steps": 10},
        {"seed": 1, "si_sdr_a_db": 22.0, "si_sdr_b_db": 11.0, "steps": 10},
        {"seed": 2, "si_sdr_a_db": 21.0, "si_sdr_b_db": 9.0, "steps": 10},
    ]
    agg = ss.aggregate(recs, lambda k: k.startswith("si_sdr_"))
    assert agg["seeds"] == [0, 1, 2] and agg["n_seeds"] == 3
    a = agg["si_sdr_a_db"]
    assert a["mean"] == 21.0 and a["min"] == 20.0 and a["max"] == 22.0
    assert a["spread"] == 2.0 and a["values"] == [20.0, 22.0, 21.0]
    # non-metric keys are excluded by the filter
    assert "steps" not in agg


def test_aggregate_skips_keys_missing_in_any_seed():
    ss = _load("seed_spread", REPO / "scripts" / "seed_spread.py")
    recs = [
        {"seed": 0, "si_sdr_a_db": 20.0, "si_sdr_only0_db": 1.0},
        {"seed": 1, "si_sdr_a_db": 21.0},
    ]
    agg = ss.aggregate(recs, lambda k: k.startswith("si_sdr_"))
    assert "si_sdr_a_db" in agg
    # a key absent (or non-numeric) in any seed cannot carry a spread
    assert "si_sdr_only0_db" not in agg


def test_bench_embeds_spread_records(tmp_path):
    """bench._load_seed_spread picks up the spread JSONs next to bench.py
    and omits absent files rather than faking them."""
    bench = _load("bench_for_spread_test", REPO / "bench.py")
    fake_scripts = tmp_path / "scripts"
    fake_scripts.mkdir()
    (fake_scripts / "train_demo_spread.json").write_text(
        json.dumps({"n_seeds": 3, "si_sdr_separated_db": {"mean": 25.9}})
    )
    out = bench._load_seed_spread(here=str(tmp_path))
    assert out is not None
    assert out["train"]["si_sdr_separated_db"]["mean"] == 25.9
    assert "distill_log" not in out  # absent file omitted, not faked
    assert bench._load_seed_spread(here=str(tmp_path / "nowhere")) is None
