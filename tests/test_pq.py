"""IVF-PQ contracts: codebook/code structure, the codes-only index
layout, partition-pruned ADC scan, refine-stage falsifiability, and
delete propagation through the PQ index."""

import os

import pytest
from pyspark.sql import functions as F

from ringo_spark.operators.similarity import (
    LSH_TOP_K, PQ_DSUB, PQ_K, PQ_M, PQ_RECALL_FLOOR,
    ann_ivf_pq_df, ann_pq_recall_bounds_df, build_pq_index,
    train_pq_codebooks,
)

SF = "/root/testdata/sf0.001"


def test_pq_codebooks_shape_and_rounding(spark):
    """Codebooks: at most PQ_K entries per subspace, every centroid
    PQ_DSUB wide with 6dp-rounded components (the determinism the
    oracle replay depends on), and training actually moved them off
    the init vectors (non-vacuous Lloyd)."""
    cb = train_pq_codebooks(spark, SF)
    ms = {m for m, _ in cb}
    assert ms == set(range(PQ_M))
    for (m, cid), vec in cb.items():
        assert 0 <= cid < PQ_K
        assert len(vec) == PQ_DSUB
        assert all(round(x, 6) == x for x in vec)
    emb = {r.vec_id: list(r.embedding) for r in
           spark.read.parquet(f"{SF}/embeddings.parquet")
           .where(F.col("vec_id") < PQ_K).collect()}
    init = {(m, c): [float(x) for x in
                     emb[c][m * PQ_DSUB:(m + 1) * PQ_DSUB]]
            for c in emb for m in range(PQ_M)}
    assert any(cb[k] != init[k] for k in cb), "Lloyd never updated"


def test_pq_index_stores_codes_only_and_prunes(spark):
    """The persisted index carries (vec_id, codes, cell) — NO raw
    embeddings (the 64x memory story) — with codes in [0, PQ_K) and
    the cell partition column; the search plan reads only the probed
    cell directories (PartitionFilters) and never the embedding
    column from the index."""
    p = build_pq_index(spark, SF)
    idx = spark.read.parquet(p)
    assert set(idx.columns) == {"vec_id", "codes", "cell"}
    row = idx.first()
    assert len(row.codes) == PQ_M
    assert all(0 <= c < PQ_K for c in row.codes)
    assert idx.count() == spark.read.parquet(
        f"{SF}/embeddings.parquet").count()

    df = ann_ivf_pq_df(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "cell IN" in plan or "cell#" in plan  # pruned scan visible


def test_pq_search_refines_adc_shortlist(spark):
    """The registered result is the exact-cosine top-5 of the ADC
    shortlist: per query the returned cosine ranks strictly follow the
    exact score (descending), and disabling the refine stage
    (rerank=top-k, i.e. raw ADC order) drops mean recall under the
    floor — the falsifiability pin for the bounds row."""
    out = ann_ivf_pq_df(spark, SF).collect()
    assert out
    by_q = {}
    for r in out:
        by_q.setdefault(r.q_id, []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert len(rows) == LSH_TOP_K
        cos = [r.cosine for r in rows]
        assert cos == sorted(cos, reverse=True)

    full = ann_pq_recall_bounds_df(spark, SF).collect()
    assert all(r.meets_floor for r in full)
    assert full[0].mean_recall >= PQ_RECALL_FLOOR
    adc_only = ann_pq_recall_bounds_df(spark, SF,
                                       rerank=LSH_TOP_K).collect()
    assert not adc_only[0].meets_floor
    assert adc_only[0].mean_recall < PQ_RECALL_FLOOR


def test_pq_index_forgets_tombstoned_vector(spark):
    """The PQ scan goes through index_rows, so a tombstoned vec_id
    disappears from search results without an index rewrite."""
    from ringo_spark.operators.deletion import tombstone_docs

    base = ann_ivf_pq_df(spark, SF).collect()
    victim = base[0].n_id
    p = build_pq_index(spark, SF)
    tombstone_docs(spark, p, [victim], id_col="vec_id")
    try:
        after = ann_ivf_pq_df(spark, SF).collect()
        assert all(r.n_id != victim for r in after)
        assert {r.q_id for r in after} == {r.q_id for r in base}
    finally:
        import shutil
        shutil.rmtree(os.path.join(p, "_tombstones"), ignore_errors=True)


def test_pq_index_partitioned_compaction(spark, tmp_path, monkeypatch):
    """The PQ index rides the same partitioned compaction as the other
    vector indexes: after apply_tombstones_partitioned the deleted
    code rows are physically gone, the cell= layout and the
    _codebooks/_SUCCESS sidecars survive the whole-root swap, and the
    search serves the compacted index unchanged."""
    import shutil

    from ringo_spark.operators.deletion import (
        apply_tombstones_partitioned, load_tombstones, tombstone_docs,
    )

    base = ann_ivf_pq_df(spark, SF).collect()
    victim = base[0].n_id
    p = build_pq_index(spark, SF)
    want = sorted((r.q_id, r.n_id) for r in base if r.n_id != victim
                  or True)  # full set; victim removal checked below
    try:
        tombstone_docs(spark, p, [victim], id_col="vec_id")
        apply_tombstones_partitioned(spark, p, "cell", id_col="vec_id")
        assert load_tombstones(spark, p, id_col="vec_id") is None
        assert os.path.exists(os.path.join(p, "_SUCCESS"))
        assert os.path.isdir(os.path.join(p, "_codebooks"))
        physical = spark.read.parquet(p)
        assert physical.where(F.col("vec_id") == victim).count() == 0
        assert "cell" in physical.columns
        after = ann_ivf_pq_df(spark, SF).collect()
        assert all(r.n_id != victim for r in after)
        assert {r.q_id for r in after} == {r.q_id for r in base}
    finally:
        # the shared cache dir now physically lacks the victim; force a
        # rebuild so later tests see the full index
        shutil.rmtree(p, ignore_errors=True)
        build_pq_index(spark, SF, force=False)


def test_pq_append_routes_with_stored_artifacts(spark, tmp_path):
    """Ingestion into a persisted PQ index: an appended copy of an
    existing vector gets IDENTICAL codes and cell (encoded/routed with
    the stored codebooks/centroids, not recomputed ones), the existing
    rows never rewrite, and the search discovers the new vector
    alongside its original."""
    from ringo_spark.operators.similarity import append_to_pq_index

    p = build_pq_index(spark, SF, index_path=str(tmp_path / "pq"))
    before = spark.read.parquet(p)
    n0 = before.count()
    src = before.orderBy("vec_id").first()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    batch = (emb.where(F.col("vec_id") == src.vec_id)
             .select((F.col("vec_id") + 1_000_000).alias("vec_id"),
                     "embedding"))
    append_to_pq_index(spark, p, batch)

    after = spark.read.parquet(p)
    assert after.count() == n0 + 1
    copy = after.where(F.col("vec_id") == src.vec_id + 1_000_000).first()
    assert list(copy.codes) == list(src.codes)
    assert copy.cell == src.cell
    # existing rows untouched (same codes for the original)
    orig = after.where(F.col("vec_id") == src.vec_id).first()
    assert list(orig.codes) == list(src.codes)
    # lost-ack replay of the same batch: ledger-refused no-op (r17)
    assert append_to_pq_index(spark, p, batch) is False
    assert spark.read.parquet(p).count() == n0 + 1
