"""The bench CPU-growth gate (VERDICT r16 item 5): drift adjudication
("CPU grew = code; flat CPU + uniform wall gap = machine weather") is a
mechanical check in the closing-bench path, not a by-hand rule.  These
tests inject a synthetic CPU regression and pin that the gate trips on
it — and only on it."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from bench import (  # noqa: E402
    CPU_FLOOR_MS, CPU_GROWTH_FACTOR, cpu_regression_flags,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _telemetry(cpu_ms):
    return {"stages_both_runs": {"executor_cpu_ms": cpu_ms,
                                 "executor_run_ms": cpu_ms * 2}}


def test_injected_cpu_regression_trips_the_gate():
    pin_cpu = {"q_regressed": 1000.0, "q_steady": 1000.0,
               "q_jitter": 50.0, "q_unattributed": 1000.0}
    telemetry = {
        # 2x pin CPU: a real code regression — must flag
        "q_regressed": _telemetry(2000.0),
        # 1.2x: inside the growth allowance — must NOT flag
        "q_steady": _telemetry(1200.0),
        # 10x growth but under the jitter floor — must NOT flag
        "q_jitter": _telemetry(500.0) if CPU_FLOOR_MS > 500.0
        else _telemetry(CPU_FLOOR_MS - 1.0),
        # attribution unavailable (UI unreachable) — must NOT flag
        "q_unattributed": {},
        # no pin recorded yet (new query) — must NOT flag
        "q_new": _telemetry(9999.0),
    }
    flags = cpu_regression_flags(telemetry, pin_cpu)
    assert set(flags) == {"q_regressed"}
    f = flags["q_regressed"]
    assert f["cpu_ms"] == 2000.0 and f["pin_cpu_ms"] == 1000.0
    assert f["ratio"] == 2.0


def test_gate_boundary_is_exactly_the_factor():
    pin_cpu = {"q": 1000.0}
    at = cpu_regression_flags({"q": _telemetry(1000.0 * CPU_GROWTH_FACTOR)},
                              pin_cpu)
    over = cpu_regression_flags(
        {"q": _telemetry(1000.0 * CPU_GROWTH_FACTOR + 1)}, pin_cpu)
    assert at == {} and set(over) == {"q"}


def test_gate_compares_warm_cpu_not_cold_build(rec=None):
    """r19 (VERDICT r18 item 3): the gate reads the WARM CPU — the min
    single-run attribution — so a one-time persisted-index build paid
    in run 1 of the official record (cold 25x the warm serve in r18's
    record) no longer flags.  A regression that persists into the warm
    run still trips."""
    pin_cpu = {"q_cold_build": 1000.0, "q_warm_regressed": 1000.0}
    cold_build = {"stages_per_run": [
        {"executor_cpu_ms": 25000.0}, {"executor_cpu_ms": 1100.0}],
        "stages_both_runs": {"executor_cpu_ms": 26100.0}}
    warm_regressed = {"stages_per_run": [
        {"executor_cpu_ms": 2400.0}, {"executor_cpu_ms": 2100.0}],
        "stages_both_runs": {"executor_cpu_ms": 4500.0}}
    flags = cpu_regression_flags(
        {"q_cold_build": cold_build, "q_warm_regressed": warm_regressed},
        pin_cpu)
    assert set(flags) == {"q_warm_regressed"}
    assert flags["q_warm_regressed"]["cpu_ms"] == 2100.0


def test_warm_cpu_falls_back_to_both_runs_for_legacy_records():
    from bench import warm_cpu_ms

    assert warm_cpu_ms(_telemetry(1234.0)) == 1234.0     # pre-r19 record
    assert warm_cpu_ms({"stages_per_run": [None, None],
                        "stages_both_runs": {"executor_cpu_ms": 7.0}}) == 7.0
    assert warm_cpu_ms({}) is None


def test_baseline_carries_pin_cpu_for_the_pinned_set():
    """The gate's reference side exists: every wall-pinned query with
    stage attribution in the committed detail record has a recorded
    pin CPU (a gate with an empty reference never trips)."""
    base = json.load(open(os.path.join(REPO, "BENCH_BASELINE.json")))
    det = json.load(open(os.path.join(REPO, "BENCH_DETAIL.json")))
    pin_cpu = base.get("pin_cpu", {})
    assert len(pin_cpu) >= 100
    attributed = {
        n for n, t in det.get("telemetry", {}).get("per_query", {}).items()
        if (t.get("stages_both_runs") or {}).get("executor_cpu_ms")
        is not None}
    missing = attributed - set(pin_cpu)
    assert missing == set()
