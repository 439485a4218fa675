"""Budget-mode bench scheduler (VERDICT r4 #1).

The driver runs ``python bench.py`` under an external ``timeout``; round 4
died at rc=124 with two of three metrics unemitted.  These tests pin the
contract that fixes that: every requested metric yields exactly one flushed
JSON line — a value, a classified error, or an explicit ``skipped: budget``
— and ``run()`` returns 0 in every branch.  The scheduler itself is pure
process/timer logic, so it is tested here on CPU with fake metric children;
the real metrics are exercised on hardware by the driver.
"""

import json
import subprocess
import sys
import time

import pytest

from hcunet_tpu import benchmarks as bench


def _parse_lines(capsys):
    out = capsys.readouterr().out
    return [json.loads(line) for line in out.splitlines() if line.strip()]


# --- _timed_reps -------------------------------------------------------------


def test_timed_reps_full_three_when_no_deadline():
    calls = []
    best, reps = bench._timed_reps(lambda: calls.append(1), deadline=None)
    assert reps == 3 and len(calls) == 3 and best >= 0.0


def test_timed_reps_degrades_to_one_under_tight_deadline():
    def slow():
        time.sleep(0.05)

    best, reps = bench._timed_reps(slow, deadline=time.monotonic() + 0.06)
    assert reps == 1
    assert best >= 0.05


def test_timed_reps_always_completes_at_least_one_rep():
    # even with a deadline already in the past
    best, reps = bench._timed_reps(
        lambda: time.sleep(0.01), deadline=time.monotonic() - 1.0
    )
    assert reps == 1


# --- job selection -----------------------------------------------------------


def test_select_jobs_default_is_all_three():
    jobs = bench._select_jobs([])
    assert [m for m, _f, _fn in jobs] == [
        "tiled_unet3d_inference",
        "recurrent_packed_serving",
        "analyze_pipeline_end_to_end",
    ]


def test_select_jobs_flags_compose_and_dedupe():
    jobs = bench._select_jobs(["--recurrent", "--headline", "--plain"])
    metrics = [m for m, _f, _fn in jobs]
    assert metrics.count("tiled_unet3d_inference") == 1
    assert "recurrent_packed_serving" in metrics


# --- the metric-child runner (real subprocesses, cheap commands) -------------


def test_run_metric_child_sees_result_line(capsys):
    ok, dur, rc = bench._run_metric_child(
        "m", "--x", slice_s=10.0,
        _cmd=[sys.executable, "-c",
              "import json; print(json.dumps({'metric': 'm', 'value': 1}))"],
    )
    assert ok and rc == 0
    lines = _parse_lines(capsys)
    assert lines == [{"metric": "m", "value": 1}]


def test_run_metric_child_kills_hung_child(capsys):
    t0 = time.monotonic()
    ok, dur, rc = bench._run_metric_child(
        "m", "--x", slice_s=0.2, _grace=0.3,
        _cmd=[sys.executable, "-c", "import time; time.sleep(60)"],
    )
    assert not ok
    assert rc is None  # killed
    assert time.monotonic() - t0 < 10.0


def test_run_metric_child_streams_before_exit(capsys):
    # the metric line must reach stdout even if the child then hangs and is
    # killed — this is the flush-first property that saves partial runs.
    # NB interpreter startup in this container is ~2 s (sitecustomize), so
    # the kill horizon must clear it.
    ok, dur, rc = bench._run_metric_child(
        "m", "--x", slice_s=1.0, _grace=5.0,
        _cmd=[sys.executable, "-u", "-c",
              "import json, time; "
              "print(json.dumps({'metric': 'm', 'value': 2}), flush=True); "
              "time.sleep(60)"],
    )
    assert ok and rc is None
    assert _parse_lines(capsys) == [{"metric": "m", "value": 2}]


# --- the scheduler -----------------------------------------------------------


@pytest.fixture
def sched_env(monkeypatch, tmp_path):
    """Isolate run(): backend up, ledger in tmp, children faked per-test."""
    monkeypatch.setattr(bench, "backend_available", lambda **kw: True)
    monkeypatch.setattr(
        bench, "_ledger_path", lambda: str(tmp_path / "ledger.json")
    )
    monkeypatch.delenv(bench._CHILD_ENV, raising=False)
    return monkeypatch


def test_run_all_metrics_within_budget(sched_env, capsys):
    ran = []

    def fake_child(metric, flag, slice_s, **kw):
        ran.append((metric, flag))
        print(json.dumps({"metric": metric, "value": 1.0}), flush=True)
        return True, 2.0, 0

    sched_env.setattr(bench, "_run_metric_child", fake_child)
    sched_env.setenv("HCUNET_BENCH_BUDGET_S", "600")
    assert bench.run([]) == 0
    lines = _parse_lines(capsys)
    assert [rec["metric"] for rec in lines] == [
        "tiled_unet3d_inference",
        "recurrent_packed_serving",
        "analyze_pipeline_end_to_end",
    ]
    # ledger recorded the observed durations
    assert bench._load_ledger() == {
        m: {"s": 2.0, "ok": True} for m, _f in ran
    }


def test_run_zero_budget_emits_explicit_skips(sched_env, capsys):
    sched_env.setattr(
        bench, "_run_metric_child",
        lambda *a, **kw: pytest.fail("child must not run with no budget"),
    )
    sched_env.setenv("HCUNET_BENCH_BUDGET_S", "1")
    assert bench.run([]) == 0
    lines = _parse_lines(capsys)
    assert len(lines) == 3
    assert all(rec["skipped"] == "budget" for rec in lines)


def test_run_killed_child_becomes_skip_line_not_silence(sched_env, capsys):
    def fake_child(metric, flag, slice_s, **kw):
        return False, slice_s, None  # killed, nothing emitted

    sched_env.setattr(bench, "_run_metric_child", fake_child)
    sched_env.setenv("HCUNET_BENCH_BUDGET_S", "600")
    assert bench.run(["--headline"]) == 0
    lines = _parse_lines(capsys)
    assert len(lines) == 1
    assert lines[0]["metric"] == "tiled_unet3d_inference"
    assert lines[0]["skipped"] == "budget"


def test_known_slow_pipeline_runs_last_with_remaining_budget(
    sched_env, capsys
):
    # the pipeline metric is scheduled LAST (most weather-exposed), so a
    # known-long ledger estimate does not starve the cheap metrics and the
    # pipeline still gets every remaining second as its slice
    bench._save_ledger({"analyze_pipeline_end_to_end": 500.0})
    ran = []

    def fake_child(metric, flag, slice_s, **kw):
        ran.append((metric, slice_s))
        print(json.dumps({"metric": metric, "value": 1.0}), flush=True)
        return True, 2.0, 0

    sched_env.setattr(bench, "_run_metric_child", fake_child)
    sched_env.setenv("HCUNET_BENCH_BUDGET_S", "300")
    assert bench.run([]) == 0
    lines = _parse_lines(capsys)
    assert [r["metric"] for r in lines] == [
        "tiled_unet3d_inference",
        "recurrent_packed_serving",
        "analyze_pipeline_end_to_end",
    ]
    assert all("value" in r for r in lines)
    # the final (pipeline) slice is everything that was left, not a fair
    # third of the original budget
    assert ran[-1][0] == "analyze_pipeline_end_to_end"
    assert ran[-1][1] > 250


def test_run_last_metric_runs_even_if_ledger_says_slow(sched_env, capsys):
    # the skip-by-estimate rule must not starve the final metric: with only
    # one job left all remaining time is its slice, so it runs
    bench._save_ledger({"recurrent_packed_serving": 250.0})
    def fake_child(metric, flag, slice_s, **kw):
        print(json.dumps({"metric": metric, "value": 3.0}), flush=True)
        return True, 100.0, 0

    sched_env.setattr(bench, "_run_metric_child", fake_child)
    sched_env.setenv("HCUNET_BENCH_BUDGET_S", "400")
    assert bench.run(["--recurrent"]) == 0
    lines = _parse_lines(capsys)
    assert lines[0] == {"metric": "recurrent_packed_serving", "value": 3.0}


def test_run_backend_down_classifies_every_metric(sched_env, capsys):
    sched_env.setattr(bench, "backend_available", lambda **kw: False)
    sched_env.setenv("HCUNET_BENCH_BUDGET_S", "600")
    assert bench.run([]) == 0
    lines = _parse_lines(capsys)
    assert len(lines) == 3
    assert all(rec["error"] == "backend_unavailable" for rec in lines)


def test_run_child_exception_rc_is_reported_and_run_continues(
    sched_env, capsys
):
    calls = []

    def fake_child(metric, flag, slice_s, **kw):
        calls.append(metric)
        if metric == "tiled_unet3d_inference":
            return False, 1.0, 1  # child crashed with a traceback
        print(json.dumps({"metric": metric, "value": 1.0}), flush=True)
        return True, 1.0, 0

    sched_env.setattr(bench, "_run_metric_child", fake_child)
    sched_env.setenv("HCUNET_BENCH_BUDGET_S", "600")
    assert bench.run([]) == 0
    lines = _parse_lines(capsys)
    by_metric = {rec["metric"]: rec for rec in lines}
    assert by_metric["tiled_unet3d_inference"]["error"] == "exception"
    assert len(calls) == 3  # the crash did not abort the schedule


def test_child_mode_dispatches_single_metric(monkeypatch, capsys):
    monkeypatch.setenv(bench._CHILD_ENV, "1")
    monkeypatch.setattr(
        bench, "main",
        lambda: print(json.dumps({"metric": "tiled_unet3d_inference",
                                  "value": 9.0}), flush=True),
    )
    assert bench.run(["--headline"]) == 0
    assert _parse_lines(capsys) == [
        {"metric": "tiled_unet3d_inference", "value": 9.0}
    ]


def test_child_mode_classifies_backend_death(monkeypatch, capsys):
    monkeypatch.setenv(bench._CHILD_ENV, "1")

    def boom():
        raise RuntimeError("Unable to initialize backend 'axon': UNAVAILABLE")

    monkeypatch.setattr(bench, "main", boom)
    assert bench.run(["--headline"]) == 0
    lines = _parse_lines(capsys)
    assert lines[0]["error"] == "backend_unavailable"
