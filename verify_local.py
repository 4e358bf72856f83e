"""Local approximation of the driver's t2 correctness gate.

Runs every ``queries()`` entry at a given scale factor, runs the matching
``oracle_sql()`` in DuckDB over the same parquet files, and compares
row count, column names, and (order-insensitively) the values themselves.
Stricter than a value hash: exact equality cell by cell.

Usage:  python verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

import __spark_entry__ as entrymod

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_connection(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "hex") and not isinstance(v, (int, float)):
        return v
    return v


def canon_rows(cols, rows):
    out = []
    for row in rows:
        d = dict(zip(cols, row))
        out.append(tuple(canon(d[c]) for c in sorted(cols)))
    return sorted(out, key=lambda r: tuple(str(x) for x in r))


ARROW_SAFE = {
    # duckdb arrow type name prefixes the driver's hasher treats as
    # equivalent to the matching Spark types
    "int8", "int16", "int32", "int64", "float", "double", "string",
    "large_string", "bool", "timestamp", "date32", "binary", "list",
    "large_list", "null",
}


def arrow_type_problems(tbl) -> list[str]:
    """The driver hashes ARROW values: DuckDB widens integer aggregates to
    HUGEINT -> decimal128, which value-equals but hash-mismatches Spark's
    int64.  Python-value comparison can't see it, so check the oracle's
    arrow schema explicitly (wrap sums in CAST(... AS BIGINT) to fix)."""
    out = []
    for field in tbl.schema:
        t = str(field.type)
        if not any(t.startswith(p) for p in ARROW_SAFE):
            out.append(f"oracle column {field.name!r} has arrow type {t} "
                       f"(decimal/hugeint widening? CAST it)")
    return out


def compare(name, spark_df, con, sql) -> list[str]:
    problems = []
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    # single oracle execution: fetch arrow once, run the type check on its
    # schema and derive the row values from the same table (ADVICE r04)
    tbl = con.execute(sql).arrow()
    problems += arrow_type_problems(tbl)
    d_cols = list(tbl.column_names)
    d_rows = list(zip(*(tbl.column(i).to_pylist()
                        for i in range(tbl.num_columns)))) if tbl.num_columns else []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")
    sc, dc = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
    if sc != dc:
        diffs = [i for i, (a, b) in enumerate(zip(sc, dc)) if a != b]
        problems.append(f"values differ in {len(diffs)}+ rows")
        for i in diffs[:3]:
            problems.append(f"  row {i}: spark={sc[i]} duck={dc[i]}")
    return problems


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    family = None
    if "--family" in argv:
        i = argv.index("--family")
        family = argv[i + 1]
        del argv[i:i + 2]
    changed_since = None
    if "--changed-since" in argv:
        i = argv.index("--changed-since")
        changed_since = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    if family is not None:
        from ringo_spark.operators.registry import queries_by_family

        fams = queries_by_family()
        if family not in fams:
            sys.exit(f"unknown family {family!r}; one of {sorted(fams)}")
        only |= set(fams[family])
    if changed_since is not None:
        # incremental sweep for mid-round batches (full sweep stays the
        # round-closing gate): map `git diff --name-only REV` through the
        # registry's family->source map; shared-infrastructure changes
        # fall back to the full sweep rather than under-sweeping.
        import subprocess

        from ringo_spark.operators.registry import queries_for_changed_files

        repo = os.path.dirname(os.path.abspath(__file__))
        # splitlines, not split: a path with whitespace must stay one
        # entry (a fragment could accidentally match a neutral rule and
        # skip the conservative full-sweep fallback).  -z would be
        # stricter still; no tracked path here contains a newline.
        changed = subprocess.run(
            ["git", "diff", "--name-only", changed_since, "--", "."],
            capture_output=True, text=True, check=True, cwd=repo,
        ).stdout.splitlines()
        # untracked files are invisible to `git diff` — a brand-new
        # not-yet-added source module must count as changed, or the
        # sweep reports "nothing to sweep" against code it never saw
        changed += subprocess.run(
            ["git", "ls-files", "--others", "--exclude-standard"],
            capture_output=True, text=True, check=True, cwd=repo,
        ).stdout.splitlines()
        changed = [c for c in changed if c]
        names, unattributed = queries_for_changed_files(changed)
        if names is None:
            print(f"--changed-since: shared files changed "
                  f"({unattributed}); sweeping EVERYTHING")
        else:
            print(f"--changed-since {changed_since}: {len(changed)} files "
                  f"-> {len(names)} queries")
            if not names and not only:
                print("nothing to sweep (no query-bearing files changed)")
                sys.exit(0)
            only |= set(names)
    from ringo_spark.catalog import get_spark

    spark = get_spark("verify-local")
    con = duck_connection(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed, record = [], {}
    for name, builder in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        rows_only = name not in oracles
        try:
            df = builder(spark, sf_dir)
            if not rows_only:
                problems = compare(name, df, con, oracles[name])
            else:
                n = df.count()
                problems = [] if n >= 0 else ["negative count?"]
                print(f"  (rows-only: {n} rows)")
        except Exception as e:  # noqa: BLE001
            problems = [f"EXCEPTION: {type(e).__name__}: {e}"]
        dt = time.time() - t0
        status = "OK " if not problems else "FAIL"
        print(f"[{status}] {name:45s} {dt:6.1f}s")
        for p in problems:
            print(f"       {p}")
        if problems:
            failed.append(name)
        record[name] = {
            "cells_match": None if rows_only else not problems,
            "ok": not problems,
            "mode": "rows_only" if rows_only else "cell_exact",
            "sec": round(dt, 1),
            "problems": problems or None,
        }
    ran = [n for n in qs if not only or n in only]
    print(f"\n{len(ran) - len(failed)}/{len(ran)} passed")
    if json_out:
        import json as _json
        with open(json_out, "w") as fh:
            _json.dump({"sf_dir": sf_dir, "checker": "verify_local cell-exact",
                        "passed": len(ran) - len(failed), "ran": len(ran),
                        "results": record}, fh, indent=1)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
