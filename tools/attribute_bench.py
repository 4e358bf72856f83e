"""Per-query wall attribution from a BENCH_DETAIL.json that carries
stage telemetry (bench.py `stages_both_runs`, r16 — VERDICT r15 item 1).

For each of the top-N wall queries it splits the measured wall into:

* ``ideal_both_runs_s`` — executor_run_ms / ncpus over BOTH timed runs,
  compared against ``wall_both_runs_s`` (the runs' summed wall, same
  coverage): the wall a perfectly packed run of the same executor work
  would take.  If a round's walls grow while ideal stays flat, the
  regression is NOT in the query's executed work (scheduler, driver,
  page cache, competing load).
* ``cpu_frac``   — executorCpuTime / executorRunTime: how much of
  executor time was on-CPU.  A drop (with flat walls) means executors
  waited (IO, GC, preemption) — machine, not plan.
* ``gc_s``, ``fetch_wait_s`` — direct executor-side waits.
* ``sched_gap_s`` — wall_both_runs - ideal_both_runs: scheduling slack + driver time +
  unpacked tails.  Uniform growth here across unrelated queries is the
  machine-weather signature (VERDICT r14/r15 adjudications).

Usage: python tools/attribute_bench.py [BENCH_DETAIL.json] [top_n]
Prints a table to stdout and a JSON blob suitable for committing as
BENCH_ATTRIBUTION.json.
"""

from __future__ import annotations

import json
import sys


def main(detail_path: str = "BENCH_DETAIL.json", top_n: int = 10) -> None:
    d = json.load(open(detail_path))
    ncpus = d["telemetry"]["ncpus"]
    per_q = d["telemetry"]["per_query"]
    rows = []
    for name, wall in sorted(d["queries"].items(), key=lambda kv: -kv[1]):
        t = per_q.get(name, {})
        st = t.get("stages_both_runs")
        if st is None:
            continue
        # compare both-runs wall against both-runs stage metrics — the
        # official wall_s is min-of-runs, but stage metrics cover BOTH
        # runs, and dividing them by n_runs while keeping the min wall
        # understates (or negates) the gap whenever the runs are
        # asymmetric (cold first run doing a build/backfill)
        wall_both = sum(t.get("runs", [wall]))
        ideal_both = st["executor_run_ms"] / 1000 / ncpus
        cpu_frac = (st["executor_cpu_ms"] / st["executor_run_ms"]
                    if st["executor_run_ms"] else None)
        rows.append({
            "query": name,
            "wall_s": wall,
            "wall_both_runs_s": round(wall_both, 3),
            "ideal_both_runs_s": round(ideal_both, 3),
            "sched_gap_s": round(wall_both - ideal_both, 3),
            "cpu_frac": round(cpu_frac, 3) if cpu_frac is not None else None,
            "gc_s": round(st["jvm_gc_ms"] / 1000, 3),
            "fetch_wait_s": round(st["shuffle_fetch_wait_ms"] / 1000, 3),
            "spill_mb": st["spill_mb"],
            "n_tasks": st["n_tasks"],
        })
        if len(rows) >= top_n:
            break
    hdr = ("query", "wall_s", "wall_both_runs_s", "ideal_both_runs_s",
           "sched_gap_s", "cpu_frac", "gc_s", "fetch_wait_s", "spill_mb",
           "n_tasks")
    w = max(len(r["query"]) for r in rows) + 1 if rows else 10
    print(" ".join([hdr[0].ljust(w)] + [h.rjust(12) for h in hdr[1:]]),
          file=sys.stderr)
    for r in rows:
        print(" ".join([r["query"].ljust(w)] +
                       [str(r[h]).rjust(12) for h in hdr[1:]]),
              file=sys.stderr)
    print(json.dumps({
        "source": detail_path,
        "ncpus": ncpus,
        "load1_before_run": d["telemetry"].get("load1_before_run"),
        "load1_after_run": d["telemetry"].get("load1_after_run"),
        "quiet_gate": d["telemetry"].get("quiet_gate"),
        "top_by_wall": rows,
    }, indent=1))


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["BENCH_DETAIL.json"]),
         *map(int, sys.argv[2:3]))
