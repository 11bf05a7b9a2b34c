"""Stall-robust benchmark timing: unit tests for bench.py's best-of-N
measurement and anomaly-retry logic, and tools/check_perf_regression.py's
record classification.

Why this exists: the driver-captured BENCH_r04.json recorded a 5.817 s
heavy train step (a ~55 s transport stall inside the single timed
dispatch) on code whose true step time was 0.363 s — a 16× phantom
regression. bench.py now times best-of-N dispatches, sanity-gates the
heavy/light step ratio against the hold-the-line floors, and surfaces a
``stall_retries`` count. These tests pin that logic without a TPU.
"""

import importlib.util
import json
import os
import sys

import pytest

pytestmark = pytest.mark.smoke

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name, rel):
    spec = importlib.util.spec_from_file_location(name,
                                                  os.path.join(REPO, rel))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def bench():
    sys.path.insert(0, REPO)
    try:
        import bench as b
    finally:
        sys.path.pop(0)
    return b


@pytest.fixture(scope="module")
def guard():
    return _load("check_perf_regression", "tools/check_perf_regression.py")


# ---------------------------------------------------------------- timed_best

def test_timed_best_returns_min_and_counts_stalls(bench, monkeypatch):
    # fake clock: sample durations 0.30, 5.80 (stall), 0.31
    ticks = iter([0.0, 0.30, 1.0, 6.80, 7.0, 7.31])
    monkeypatch.setattr(bench.time, "perf_counter", lambda: next(ticks))
    bench._STALL_EVENTS = 0
    best = bench._timed_best(lambda: None, samples=3)
    assert best == pytest.approx(0.30)
    assert bench._STALL_EVENTS == 1  # the 5.80 sample > 1.5x best


def test_timed_best_clean_run_counts_no_stalls(bench, monkeypatch):
    ticks = iter([0.0, 0.30, 1.0, 1.31, 2.0, 2.305])
    monkeypatch.setattr(bench.time, "perf_counter", lambda: next(ticks))
    bench._STALL_EVENTS = 0
    bench._timed_best(lambda: None, samples=3)
    assert bench._STALL_EVENTS == 0


# ---------------------------------------------------------- finalize_headline

def test_finalize_no_anomaly_no_retry(bench):
    calls = []
    t, retries = bench.finalize_headline(
        0.363, 0.310, remeasure_train=lambda: calls.append(1) or 0.0)
    assert (t, retries) == (0.363, 0) and not calls


def test_finalize_ratio_anomaly_retries_and_takes_min(bench):
    t, retries = bench.finalize_headline(
        5.817, 0.310, remeasure_train=lambda: 0.363)
    assert (t, retries) == (0.363, 1)


def test_finalize_floor_anomaly_retries(bench):
    # ratio fine (light unknown) but the floor flags it
    t, retries = bench.finalize_headline(
        0.50, None, remeasure_train=lambda: 0.36,
        floor_ok=lambda s: s <= 0.40)
    assert (t, retries) == (0.36, 1)


def test_finalize_keeps_original_if_remeasure_worse(bench):
    # a stall can only inflate: a worse re-measure must not replace
    t, retries = bench.finalize_headline(
        2.0, 0.310, remeasure_train=lambda: 3.0)
    assert (t, retries) == (2.0, 1)


def test_train_floor_ok_loads_guard_floor(bench, guard):
    floor, direction = guard.FLOORS["train_step_s"]
    assert direction == "min"
    assert bench._train_floor_ok(floor)          # at the floor: ok
    assert not bench._train_floor_ok(floor * 2)  # stall-sized miss: anomaly


# ------------------------------------------------- check_perf_regression.py

TPU_GOOD = {
    "metric": "multiview_inference_throughput", "value": 1277.6,
    "unit": "frames/sec/chip", "vs_baseline": 2129.3,
    "train_step_s": 0.3629, "train_step_light_s": 0.3105,
    "train_tflops_per_s": 99.0, "train_mfu_pct": 50.2,
    "platform": "tpu", "stall_retries": 0,
}


def test_guard_passes_good_tpu_record(guard, capsys):
    assert guard.check(dict(TPU_GOOD), slack=0.04) == 0
    assert "perf line held" in capsys.readouterr().out


def test_guard_fails_stalled_heavy_step(guard, capsys):
    rec = dict(TPU_GOOD, train_step_s=5.817, train_mfu_pct=3.1)
    assert guard.check(rec, slack=0.04) == 1


def test_guard_skips_cpu_by_platform_field(guard, capsys):
    # a CPU record CAN carry MFU-adjacent fields; the skip must key on the
    # explicit platform field, not on which keys happen to be present
    rec = {"metric": "multiview_inference_throughput", "value": 0.6,
           "unit": "frames/sec/chip", "platform": "cpu",
           "train_step_s": 4.96}
    assert guard.check(rec, slack=0.04) == 0
    assert "guard skipped" in capsys.readouterr().out


def test_guard_fails_tpu_record_missing_mfu(guard, capsys):
    # platform says tpu but FLOPs analysis failed: must NOT silently skip
    rec = {"metric": "multiview_inference_throughput", "value": 1277.6,
           "unit": "frames/sec/chip", "platform": "tpu",
           "train_step_s": 0.3629, "train_step_light_s": 0.3105}
    assert guard.check(rec, slack=0.04) == 1


def test_guard_skips_zoo_and_reg_records(guard, capsys):
    for rec in (
        {"metric": "utnet_inference_throughput", "value": 100.0,
         "unit": "frames/sec/chip", "platform": "tpu",
         "train_step_s": 0.1},
        {"metric": "r2plus1d_regression_throughput", "value": 50.0,
         "unit": "clips/sec/chip", "platform": "tpu",
         "train_step_s": 0.1},
    ):
        assert guard.check(rec, slack=0.04) == 0
        assert "guard skipped" in capsys.readouterr().out


def test_guard_legacy_record_without_platform_field(guard):
    # pre-r5 records have no platform key: MFU-presence heuristic applies
    legacy_cpu = {"metric": "multiview_inference_throughput", "value": 0.6,
                  "unit": "frames/sec/chip", "train_step_s": 4.96}
    assert guard.check(legacy_cpu, slack=0.04) == 0
    legacy_tpu = json.load(open(os.path.join(REPO, "BENCH_r03.json")))
    assert guard.check(legacy_tpu["parsed"], slack=0.04) == 0
