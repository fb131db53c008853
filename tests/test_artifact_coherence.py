"""Benchmark-artifact self-coherence guards.

Round-4 finding: ``BENCH_r04_local.json`` contained BOTH
``stages_skipped.fft_payoff`` and a fully populated ``fft_coupling_payoff``
block -- fields hand-merged from different runs into one artifact with no
provenance.  The bench now stamps every stage block with the emitting
process's ``run_id`` + commit (``bench.stamp``), and this test asserts that
within one recorded run a stage cannot be both skipped and populated: a
populated block whose ``run_id`` matches the top-level run must not also
appear in ``stages_skipped``.  Blocks carrying a DIFFERENT run_id are
explicitly multi-run-labeled and allowed.

Also sanity-checks the compact stdout contract: ``bench.emit`` must always
produce a line under the driver's ~2,000-char capture window (the round
2-4 headline was unparseable because the enriched line outgrew it).
"""

import glob
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: bench stage names -> the detail key(s) the stage populates.
STAGE_KEYS = {
    "certify": ("accuracy",),
    "f64_polish": ("final_polish",),
    "cpu_baseline": ("cpu_measured_points",),
    "fresh_process": ("fresh_process_factorize_s",),
    "transport": ("transport_strip",),
    "squid_mutual": ("squid_mutual",),
    "scanning": ("scanning_sweep",),
    "fft_payoff": ("fft_coupling_payoff",),
    "fft_payoff_small": ("fft_coupling_payoff_66k",),
}


def _detail_artifacts():
    """New-format artifacts (full detail with run_id provenance)."""
    paths = sorted(glob.glob(os.path.join(REPO, "BENCH_DETAIL*.json")))
    out = []
    for path in paths:
        with open(path) as fh:
            data = json.load(fh)
        detail = data.get("detail")
        if isinstance(detail, dict) and "run_id" in detail:
            out.append((os.path.basename(path), detail))
    return out


def test_skipped_and_populated_stages_are_mutually_exclusive_per_run():
    artifacts = _detail_artifacts()
    if not artifacts:
        pytest.skip("no provenance-stamped BENCH_DETAIL artifacts yet")
    problems = []
    for name, detail in artifacts:
        run_id = detail["run_id"]
        skipped = detail.get("stages_skipped", {})
        for stage, keys in STAGE_KEYS.items():
            if stage not in skipped:
                continue
            for key in keys:
                block = detail.get(key)
                if block is None:
                    continue
                block_run = (
                    block.get("run_id") if isinstance(block, dict) else None
                )
                if block_run is None or block_run == run_id:
                    problems.append(
                        f"{name}: stage {stage!r} is in stages_skipped but "
                        f"detail[{key!r}] is populated from the same run"
                    )
    assert not problems, "\n".join(problems)


def test_stage_blocks_carry_provenance():
    artifacts = _detail_artifacts()
    if not artifacts:
        pytest.skip("no provenance-stamped BENCH_DETAIL artifacts yet")
    missing = []
    for name, detail in artifacts:
        for stage, keys in STAGE_KEYS.items():
            for key in keys:
                block = detail.get(key)
                if isinstance(block, dict) and "error" not in block:
                    if "run_id" not in block:
                        missing.append(f"{name}: detail[{key!r}] lacks run_id")
    assert not missing, "\n".join(missing)


def test_emit_line_fits_driver_window():
    """The compact stdout line must fit the driver's capture window even
    with every summary field populated (the r02-r04 failure mode)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_for_test", os.path.join(REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    bench.DETAIL_PATH = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), "bench_emit_test_detail.json"
    )
    bench.RESULT.update(
        {
            "metric": "m" * 200,
            "value": 1.0,
            "unit": "s",
            "vs_baseline": 12345.67,
            "detail": {
                "run_id": bench.RUN_ID,
                "accuracy": {
                    "residual_rel_max": 5.2e-5,
                    "coupling_f64_sample_rel_err": 3.1e-7,
                    "residual_rel_per_film": {
                        f"film{i}": [1.234e-5] * 8 for i in range(4)
                    },
                },
                "final_polish": {
                    "residual_rel_max_delivered": 9.876e-7,
                    "residual_rel_max_after_f64": 2.1e-8,
                    "end_to_end_with_polish_s": 123.456,
                    "vs_baseline_with_polish": 2812.34,
                },
                "squid_mutual": {
                    "mutual_pH": 1.804611,
                    "f64_rel_delta": 5.1e-6,
                    "solve_s": 115.13,
                },
                "scanning_sweep": {
                    "ms_per_position_warm": 6.25,
                    "f64_rel_delta": 8.7e-7,
                },
                "transport_strip": {
                    "current_conservation_rel_err_max": 1.58e-2,
                    "solve_cold_s": 168.7,
                },
                "fft_coupling_payoff": {"fft_speedup": 1.72},
                "factorize_warm_s": 2.672,
                "warm_sweep_s": 0.4137,
                "fresh_process_factorize_s": 96.62,
                "cpu_baseline_total_s": 40123.45,
                "vs_baseline_conservative": 2947.65,
            },
        }
    )
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.emit()
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    assert lines, "emit() printed nothing"
    line = lines[-1]
    assert len(line) <= bench.MAX_STDOUT_LINE
    parsed = json.loads(line)
    for key in ("metric", "value", "unit", "vs_baseline", "summary"):
        assert key in parsed
    # The critical accuracy scalars survive the length governor.
    assert "residual_rel_max" in parsed["summary"]
    assert "residual_delivered" in parsed["summary"]
    assert "mutual_f64_rel_delta" in parsed["summary"]


def test_oracle_file_roundtrip_and_cached_join(tmp_path, monkeypatch):
    """The f64 oracle keyed-file protocol: launch detects an existing
    oracle ('cached'), finish_* reads it and fills the delta with
    provenance, and a missing file degrades to an explicit note."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench_for_oracle_test", os.path.join(REPO, "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    monkeypatch.setenv("SUPERSCREEN_TPU_MESH_CACHE", str(tmp_path))

    # Squid: seed an oracle file, then join from "cached".
    path = bench._oracle_path("squid", bench._squid_workload_key())
    assert str(tmp_path) in path
    with open(path, "w") as fh:
        json.dump(
            {
                "mutual_Phi0_per_A": 872.7061551904163,
                "oracle_run_id": "test-run",
                "oracle_commit": "deadbee",
            },
            fh,
        )
    assert bench.launch_squid_f64_child() == "cached"
    out = {"mutual_Phi0_per_A": 872.7106}
    out = bench.finish_squid_f64(out, "cached")
    assert out["f64_rel_delta"] == pytest.approx(5.093e-6, rel=1e-2)
    assert out["f64_oracle_run_id"] == "test-run"
    assert out["f64_oracle_cached"] is True

    # Scanning: seed and join against a synthetic map.
    import numpy as np

    spath = bench._oracle_path("scanning", bench._scanning_workload_key())
    M64 = [-13.418011977835725, -13.629496619106002, -13.194422292649662]
    with open(spath, "w") as fh:
        json.dump(
            {
                "indices": [16, 32, 48],
                "M_Phi0_per_A": M64,
                "oracle_run_id": "test-run-2",
                "oracle_commit": "deadbee",
            },
            fh,
        )
    assert bench.launch_scanning_f64_child() == "cached"
    M_full = np.zeros(64)
    M_full[[16, 32, 48]] = np.asarray(M64) * (1 + 1e-6)
    sout = bench.finish_scanning_f64({"B": 64}, "cached", M_full)
    assert sout["f64_rel_delta"] == pytest.approx(1e-6, rel=0.1)
    assert sout["f64_check_indices"] == [16, 32, 48]

    # Missing/invalid oracle: explicit note, no crash.
    os.unlink(path)
    bad = bench.finish_squid_f64({"mutual_Phi0_per_A": 1.0}, "cached")
    assert bad["f64_rel_delta"] is None
    assert "oracle file missing/invalid" in bad["f64_note"]
