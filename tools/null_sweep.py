"""Null-injected oracle parity sweep (r18).

The driver testdata contains ZERO nulls in any column (verified r18), so
every null-handling path in the engine — coalesce sentinels, sum-skips,
null-ordering, guarded divisions — is constrained only by unit tests,
never by the Spark-vs-DuckDB oracle comparison.  Cross-engine null
semantics is the classic divergence class (SQL three-valued logic,
null ordering, size(null), sum-over-empty), so this tool manufactures a
deterministic null-injected twin of an sf dir and reruns the SAME
registered queries against the SAME oracles on it:

* every column keeps its values except a deterministic ~1-in-RATE slice
  (keyed on ``hash(full row identity)+column-index`` — every
  KEEP_NOT_NULL column combined, so the slice is per-ROW even on
  tables whose first key component is low-cardinality) which becomes
  NULL;
* declared NOT-NULL columns (primary keys, the DimTime/watermark
  columns, join-identity keys) are never nulled — the engine's contract
  requires them, matching the reference's NOT NULL DDL;
* embeddings' vector column is left intact by default (a null embedding
  is a malformed upstream row the ANN contract rejects; pass
  ``--null-embeddings`` to probe that too).

A query that is cell-exact on the clean data AND on the injected data
has oracle-verified null semantics.  Mismatches are adjudicated one by
one — each is either a real cross-engine divergence (fix) or a
documented semantic contract (record here).

Usage:
    python tools/null_sweep.py [--sf /root/testdata/sf0.001] \
        [--out /tmp/nulldata] [--rate 12] [--null-embeddings]
    python verify_local.py /tmp/nulldata [names...]
"""

from __future__ import annotations

import os
import sys

import duckdb

# columns that must stay NOT NULL: primary keys / row identity, the
# DimTime + watermark columns (declared NOT NULL in the testbed schemas,
# matching the reference's DDL), and partition-identity keys
KEEP_NOT_NULL: dict[str, set[str]] = {
    "events": {"event_id", "ts"},
    "orders": {"o_orderkey", "o_orderdate"},
    "lineitem": {"l_orderkey", "l_shipdate", "l_linenumber"},
    "customer": {"c_custkey"},
    "supplier": {"s_suppkey"},
    "part": {"p_partkey"},
    "partsupp": {"ps_partkey", "ps_suppkey"},
    "nation": {"n_nationkey"},
    "region": {"r_regionkey"},
    "documents": {"doc_id"},
    "embeddings": {"vec_id"},
}

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def inject(sf_dir: str, out_dir: str, rate: int,
           null_embeddings: bool) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(src):
            continue
        glob = src + ("/*.parquet" if os.path.isdir(src) else "")
        cols = [r[0] for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{glob}')").fetchall()]
        keep = KEEP_NOT_NULL.get(t, set())
        # full ROW identity, not the first key column alone (ADVICE
        # r18): keying on one low-cardinality component (lineitem's
        # l_linenumber has ~7 distinct values) nulled entire
        # value-slices per column instead of ~1-in-rate independent
        # rows.  Hashing every KEEP_NOT_NULL column combined makes the
        # nulled slice per-row, as the docstring claims.
        id_cols = sorted(keep) if keep else [cols[0]]
        row_id = "hash(concat_ws('|', " + ", ".join(
            f'CAST("{c}" AS VARCHAR)' for c in id_cols) + "))"
        sel = []
        for i, c in enumerate(cols):
            if c in keep or (c == "embedding" and not null_embeddings):
                sel.append(f'"{c}"')
            else:
                # deterministic per (row, column) slice: no RNG, the
                # injected dataset is identical on every run
                sel.append(
                    f'CASE WHEN ({row_id} + {i}) % {rate} = 0 '
                    f'THEN NULL ELSE "{c}" END AS "{c}"')
        dst = os.path.join(out_dir, f"{t}.parquet")
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM read_parquet('{glob}')) "
            f"TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
        print(f"{t}: {n} rows -> {dst}")


def main(argv: list[str]) -> None:
    sf, out, rate, emb = "/root/testdata/sf0.001", "/tmp/nulldata", 12, False
    it = iter(argv)
    for a in it:
        if a == "--sf":
            sf = next(it)
        elif a == "--out":
            out = next(it)
        elif a == "--rate":
            rate = int(next(it))
        elif a == "--null-embeddings":
            emb = True
        else:
            sys.exit(f"unknown arg {a}")
    inject(sf, out, rate, emb)


if __name__ == "__main__":
    main(sys.argv[1:])
