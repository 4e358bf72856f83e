"""Guards for the driver correctness-window curation.

The driver hash-checks only the first 50 registered queries per round
(observed: CORRECTNESS_r02/r03 truncate at exactly 50 while 65/67 were
registered).  Ordering is therefore load-bearing; these tests make any
accidental displacement a test failure instead of a silent coverage hole
(the round-2 failure mode: adding 13 queries pushed 15 previously
driver-green ones out of the window without anyone noticing).
"""

import __spark_entry__ as entrymod
from ringo_spark.operators.registry import DISPLACED, DRIVER_WINDOW

WINDOW = 50


def test_window_is_exactly_driver_sized():
    assert len(DRIVER_WINDOW) == WINDOW


def test_registry_order_starts_with_window():
    names = list(entrymod.queries())
    assert names[:WINDOW] == DRIVER_WINDOW
    assert names[WINDOW:] == DISPLACED


def test_window_and_displaced_partition_registry():
    names = list(entrymod.queries())
    assert len(names) == len(set(names))
    assert set(names) == set(DRIVER_WINDOW) | set(DISPLACED)
    assert not set(DRIVER_WINDOW) & set(DISPLACED)


def test_every_windowed_query_has_an_oracle():
    """Window slots are scarce — a no-oracle query gets only a weak
    rows-only driver row, so those stay displaced (ε-pytest-covered)."""
    oracles = entrymod.oracle_sql()
    assert set(DRIVER_WINDOW) <= set(oracles)


def test_displaced_no_oracle_entries_are_the_declared_two():
    oracles = entrymod.oracle_sql()
    no_oracle = [n for n in DISPLACED if n not in oracles]
    assert no_oracle == ["fact_events_by_minute_approx",
                         "ann_cosine_topk_arrow"]


def test_families_partition_registry():
    """queries_by_family covers every registered query exactly once, so
    `verify_local.py --family X` sweeps are exhaustive in union."""
    from ringo_spark.operators.registry import queries_by_family

    fams = queries_by_family()
    all_names = [n for names in fams.values() for n in names]
    assert len(all_names) == len(set(all_names))
    assert set(all_names) == set(entrymod.queries())
    assert "core" in fams and "dedup" in fams and "tpch" in fams


def test_family_sources_cover_shared_execution_layers():
    """verify_local.py --changed-since maps changed files to families
    via FAMILY_SOURCES.  A family whose operator module IMPORTS a shared
    execution layer (populate/*, testbed, model, validator) runs that
    code at query time, so the layer's file must be attributed to that
    family — otherwise an incremental sweep silently under-sweeps it
    (r11 review finding: grain queries execute populate/* but a
    dimension.py change only swept core)."""
    import os
    import re

    from ringo_spark.operators.registry import FAMILY_SOURCES

    layer_files = {
        "populate.dimension": "ringo_spark/populate/dimension.py",
        "populate.fact": "ringo_spark/populate/fact.py",
        "populate.common": "ringo_spark/populate/common.py",
        "testbed": "ringo_spark/testbed.py",
        "model": "ringo_spark/model.py",
        "validator": "ringo_spark/validator.py",
        "extractor": "ringo_spark/extractor.py",
        "engine": "ringo_spark/engine.py",
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def closure(mod_path: str) -> set[str]:
        """mod_path + every operator-sibling module it transitively
        imports (`from .sibling import`, top-level or deferred inside a
        function body — both execute at query-build time)."""
        seen, todo = set(), [mod_path]
        while todo:
            path = todo.pop()
            if path in seen or not os.path.exists(os.path.join(repo, path)):
                continue
            seen.add(path)
            text = open(os.path.join(repo, path)).read()
            todo += [f"ringo_spark/operators/{m}.py"
                     for m in re.findall(r"from \.(\w+) import", text)]
        return seen

    missing = []
    for fam, srcs in FAMILY_SOURCES.items():
        if fam == "core":
            continue
        # sibling closure (ADVICE r11: dedup executes similarity's
        # bucket/index code, pipeline executes text/sampling/dedup, … —
        # a sibling edit must re-sweep every family that runs it)
        for path in closure(srcs[0]):
            if path not in srcs:
                missing.append((fam, path))
        # shared layers, scanned over the WHOLE closure (a sibling's
        # populate import is executed just the same)
        imported = set()
        for path in closure(srcs[0]):
            imported |= set(re.findall(
                r"from \.\.([\w.]+) import",
                open(os.path.join(repo, path)).read()))
        for name, path in layer_files.items():
            if name in imported and path not in srcs:
                missing.append((fam, name))
    assert not missing, f"FAMILY_SOURCES misses executed layers: {missing}"


def test_driver_row_freshness_floor():
    """VERDICT r15 item 7: registry freshness is a failing test, not a
    plan note.  For every with-oracle registered query, its last
    driver-green row (scanned from the committed CORRECTNESS_r*.json
    history) must be at most FLOOR rounds old BY THE END OF THE CURRENT
    ROUND — where a query in DRIVER_WINDOW counts as getting its row
    this round (current round = max committed round + 1; the window is
    this round's submission).  The rotation cycle is ~28 slots over
    ~120 rotating queries, so a full pass takes ~5 rounds; FLOOR=7
    leaves one round of slack without letting any oracle rot silently.
    No-oracle entries are exempt (rows-only by design; their *_bounds
    twins carry the oracles and are checked like any other entry)."""
    import glob
    import json
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    FLOOR = 7
    last: dict[str, int] = {}
    rounds = []
    for f in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        rounds.append(rnd)
        with open(f) as fh:
            data = json.load(fh)
        if not isinstance(data, dict):
            continue
        for name, rec in data.items():
            if isinstance(rec, dict) and (rec.get("hash_match") or
                                          rec.get("ok")):
                last[name] = max(last.get(name, 0), rnd)
    assert rounds, "no CORRECTNESS_r*.json history found"
    current = max(rounds) + 1
    oracles = entrymod.oracle_sql()
    stale = []
    for name in entrymod.queries():
        if name not in oracles:
            continue   # rows-only by design, exempt (twins carry oracles)
        effective = current if name in DRIVER_WINDOW else last.get(name, 0)
        if current - effective > FLOOR:
            stale.append((name, last.get(name), current - effective))
    assert not stale, (
        f"queries with driver rows older than {FLOOR} rounds and not in "
        f"this round's window — rotate them forward: {stale}")
