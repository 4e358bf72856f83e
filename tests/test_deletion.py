"""Delete propagation (right-to-be-forgotten) over persisted indexes:
tombstones mask at read time, compaction rewrites physically, and every
index consumer forgets the deleted document."""

import os

import pytest
from pyspark.sql import functions as F

from ringo_spark.operators.dedup import (
    _index_tables, build_minhash_index, dedup_minhash_lsh_indexed_df,
)
from ringo_spark.operators.deletion import (
    TOMBSTONES, apply_tombstones, delete_report, index_rows,
    load_tombstones, tombstone_docs,
)

SF = "/root/testdata/sf0.001"


def _indexed_pairs(spark, p):
    from ringo_spark.operators.dedup import _candidate_pairs, _verify_pairs

    bands, shingled = _index_tables(spark, p)
    return {(r.doc_a, r.doc_b)
            for r in _verify_pairs(_candidate_pairs(bands),
                                   shingled).collect()}


def test_minhash_tombstone_then_compact(spark, tmp_path):
    """Tombstoning a doc removes every pair touching it from the indexed
    dedup result (merge-on-read, non-vacuous); compaction produces the
    identical result with the rows physically gone and the log cleared;
    delete_report sees the masked rows in between."""
    p = build_minhash_index(spark, SF, index_path=str(tmp_path / "mh"))
    base = _indexed_pairs(spark, p)
    assert base, "fixture must contain near-dup pairs"
    victim = base and sorted(base)[0][0]

    tombstone_docs(spark, p, [victim])
    masked = _indexed_pairs(spark, p)
    assert masked == {(a, b) for a, b in base if victim not in (a, b)}
    assert masked != base, "victim must have been in some pair"

    rep = {r.subdir: r for r in
           delete_report(spark, p, ["bands", "shingles"]).collect()}
    assert rep["bands"].masked_rows > 0
    assert rep["shingles"].masked_rows == 1

    apply_tombstones(spark, p, ["bands", "shingles"])
    assert _indexed_pairs(spark, p) == masked
    assert load_tombstones(spark, p) is None
    assert not os.path.isdir(os.path.join(p, TOMBSTONES))
    physical = spark.read.parquet(os.path.join(p, "shingles"))
    assert physical.where(F.col("doc_id") == victim).count() == 0
    # compaction with no log is a no-op, and re-tombstoning after
    # compaction works (the lifecycle repeats)
    apply_tombstones(spark, p, ["bands", "shingles"])
    tombstone_docs(spark, p, [victim])   # already gone: masks nothing
    assert _indexed_pairs(spark, p) == masked


def test_streaming_prober_forgets_tombstoned_corpus_doc(spark, tmp_path):
    """The streaming near-dup prober must stop matching arrivals against
    a tombstoned corpus document — the ingestion-time half of delete
    propagation."""
    from ringo_spark.operators.dedup import INGESTED_BELOW
    from ringo_spark.streaming.dedup import streaming_near_dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p = build_minhash_index(spark, SF, index_path=str(tmp_path / "mh2"))
    # restrict the index to the "corpus" half like the prober lifecycle
    # would: tombstone every batch-side id so only corpus rows serve
    batch_ids = [r.doc_id for r in
                 docs.where(F.col("doc_id") >= INGESTED_BELOW)
                 .select("doc_id").collect()]
    tombstone_docs(spark, p, batch_ids)

    prober = streaming_near_dedup(p)
    sink = str(tmp_path / "hits")
    prober(sink)(docs.where(F.col("doc_id") >= INGESTED_BELOW), 0)
    hits = spark.read.parquet(sink).collect()
    assert hits, "fixture must produce cross-split near-dup hits"
    seen = {r.doc_seen for r in hits}
    victim = sorted(seen)[0]

    tombstone_docs(spark, p, [victim])
    # re-probing the same arrivals (here under a different Spark
    # batch_id — a fresh checkpoint lineage) reuses the batch's
    # content stamp and REPLACES its sink partition with the fresh
    # verdict (r17: stamps are content-keyed, not checkpoint-keyed)
    prober(sink)(docs.where(F.col("doc_id") >= INGESTED_BELOW), 1)
    hits2 = spark.read.parquet(sink).collect()
    assert {(r.doc_new, r.doc_seen, r.jaccard) for r in hits2} == {
        (r.doc_new, r.doc_seen, r.jaccard) for r in hits
        if r.doc_seen != victim}


def test_vector_index_rows_tombstone_and_compact(spark, tmp_path):
    """The partitioned vector indexes (LSH buckets / IVF cells) go
    through index_rows: tombstoned vec_ids disappear from reads while
    partition discovery ignores the underscore-hidden log; compaction
    preserves the partition column."""
    from ringo_spark.operators.similarity import build_lsh_index

    p = build_lsh_index(spark, SF, bits=4,
                        index_path=str(tmp_path / "lsh"))
    before = index_rows(spark, p, id_col="vec_id")
    n = before.count()
    victim = before.select("vec_id").orderBy("vec_id").first().vec_id

    tombstone_docs(spark, p, [victim], id_col="vec_id")
    after = index_rows(spark, p, id_col="vec_id")
    assert after.count() == n - 1
    assert after.where(F.col("vec_id") == victim).count() == 0
    assert "bucket" in after.columns   # partition column survives the join

    # partitioned compaction: same rows physically, bucket= layout and
    # sidecars intact, log cleared
    from ringo_spark.operators.deletion import apply_tombstones_partitioned

    before_buckets = {d for d in os.listdir(p) if d.startswith("bucket=")}
    apply_tombstones_partitioned(spark, p, "bucket", id_col="vec_id")
    assert load_tombstones(spark, p, id_col="vec_id") is None
    physical = spark.read.parquet(p)
    assert physical.count() == n - 1
    assert physical.where(F.col("vec_id") == victim).count() == 0
    after_buckets = {d for d in os.listdir(p) if d.startswith("bucket=")}
    assert after_buckets <= before_buckets and after_buckets
    # the vector indexes' cache marker is Spark's own _SUCCESS — it must
    # survive the partition-dir swap or the next build_lsh_index call
    # would rebuild (and resurrect the deleted rows)
    assert os.path.exists(os.path.join(p, "_SUCCESS"))


def test_registered_deleted_query_matches_contract(spark):
    """The registered end-to-end deletion query equals the indexed LSH
    pair set minus pairs touching the fixed demo doc — non-vacuously
    (the demo doc participates in pairs at every test SF by choice)."""
    from ringo_spark.operators.dedup import (
        DELETED_DOC_ID, dedup_minhash_lsh_deleted_df,
        dedup_minhash_lsh_indexed_df,
    )

    full = {(r.doc_a, r.doc_b, r.jaccard)
            for r in dedup_minhash_lsh_indexed_df(spark, SF).collect()}
    got = {(r.doc_a, r.doc_b, r.jaccard)
           for r in dedup_minhash_lsh_deleted_df(spark, SF).collect()}
    want = {t for t in full if DELETED_DOC_ID not in (t[0], t[1])}
    assert got == want
    assert got != full, "demo doc must participate in pairs"
    # rerun is stable (the tombstone append is once-guarded)
    again = {(r.doc_a, r.doc_b, r.jaccard)
             for r in dedup_minhash_lsh_deleted_df(spark, SF).collect()}
    assert again == got


def test_rebucket_does_not_resurrect_tombstoned_vectors(spark, tmp_path):
    """Rebucketing an index with a live tombstone log must carry the
    deletes into the new index (a raw re-read would resurrect them) and
    the new index starts log-free."""
    from ringo_spark.operators.similarity import (
        build_lsh_index, rebucket_lsh_index,
    )

    p = build_lsh_index(spark, SF, bits=4,
                        index_path=str(tmp_path / "lshr"))
    victim = index_rows(spark, p, id_col="vec_id") \
        .select("vec_id").orderBy("vec_id").first().vec_id
    tombstone_docs(spark, p, [victim], id_col="vec_id")

    rb = rebucket_lsh_index(spark, p, 6,
                            out_path=str(tmp_path / "lshr6"))
    out = spark.read.parquet(rb)
    assert out.where(F.col("vec_id") == victim).count() == 0
    assert out.count() == index_rows(spark, p, id_col="vec_id").count()
    assert load_tombstones(spark, rb, id_col="vec_id") is None


def test_apply_tombstones_recovers_midswap_crash(spark, tmp_path,
                                                 monkeypatch):
    """ADVICE r13 (medium): a crash between rename(src, __old) and
    rename(__compact, src) leaves the subdir MISSING with the original
    in __old; the rerun must RESTORE it before clearing leftovers —
    the old recovery rmtree'd both copies and lost the subdir."""
    p = build_minhash_index(spark, SF, index_path=str(tmp_path / "mhc"))
    base = _indexed_pairs(spark, p)
    victim = sorted(base)[0][0]
    tombstone_docs(spark, p, [victim])
    want = {(a, b) for a, b in base if victim not in (a, b)}

    real_rename = os.rename

    def crashy(a, b):
        real_rename(a, b)
        if b.endswith("bands__old"):
            raise RuntimeError("injected crash mid-swap")

    monkeypatch.setattr(os, "rename", crashy)
    with pytest.raises(RuntimeError, match="injected"):
        apply_tombstones(spark, p, ["bands", "shingles"])
    monkeypatch.setattr(os, "rename", real_rename)
    # the crash window under test: subdir gone, original parked aside,
    # completed rewrite lingering
    assert not os.path.isdir(os.path.join(p, "bands"))
    assert os.path.isdir(os.path.join(p, "bands__old"))
    assert os.path.isdir(os.path.join(p, "bands__compact"))
    assert load_tombstones(spark, p) is not None  # deletes still logged

    apply_tombstones(spark, p, ["bands", "shingles"])
    assert _indexed_pairs(spark, p) == want
    assert load_tombstones(spark, p) is None
    for leftover in ("bands__old", "bands__compact",
                     "shingles__old", "shingles__compact"):
        assert not os.path.isdir(os.path.join(p, leftover))


def test_apply_tombstones_partitioned_crash_recovery(spark, tmp_path,
                                                     monkeypatch):
    """ADVICE r13 (medium): the partitioned compaction must never
    delete live partition dirs before a complete replacement exists.
    Crash window 1: between the two whole-root renames — the rerun
    restores __old (tombstone log inside) and REUSES the complete
    __compact rewrite.  Crash window 2: a stale __compact whose
    fingerprint predates newer tombstones must be discarded, not
    swapped in."""
    from ringo_spark.operators.deletion import apply_tombstones_partitioned
    from ringo_spark.operators.similarity import build_lsh_index

    p = build_lsh_index(spark, SF, bits=4,
                        index_path=str(tmp_path / "lshc"))
    rows = index_rows(spark, p, id_col="vec_id")
    n = rows.count()
    ids = [r.vec_id for r in
           rows.select("vec_id").orderBy("vec_id").limit(2).collect()]
    tombstone_docs(spark, p, [ids[0]], id_col="vec_id")

    real_rename = os.rename

    def crashy(a, b):
        real_rename(a, b)
        if b.endswith("__old"):
            raise RuntimeError("injected crash after rename(root, __old)")

    monkeypatch.setattr(os, "rename", crashy)
    with pytest.raises(RuntimeError, match="injected"):
        apply_tombstones_partitioned(spark, p, "bucket", id_col="vec_id")
    monkeypatch.setattr(os, "rename", real_rename)
    assert not os.path.isdir(p) and os.path.isdir(p + "__old")
    # mark the completed rewrite so we can prove the rerun REUSED it
    # (a redo would rmtree __compact and the sentinel with it)
    sentinel = os.path.join(p + "__compact", "_reuse_sentinel")
    open(sentinel, "w").close()

    apply_tombstones_partitioned(spark, p, "bucket", id_col="vec_id")
    out = spark.read.parquet(p)
    assert out.count() == n - 1
    assert out.where(F.col("vec_id") == ids[0]).count() == 0
    assert load_tombstones(spark, p, id_col="vec_id") is None
    assert os.path.exists(os.path.join(p, "_SUCCESS"))
    assert os.path.exists(os.path.join(p, "_reuse_sentinel"))
    assert not os.path.isdir(p + "__old")
    assert not os.path.isdir(p + "__compact")

    # window 2: a lingering COMPLETE __compact from before a newer
    # tombstone arrived — fingerprint mismatch forces a fresh rewrite
    tombstone_docs(spark, p, [ids[1]], id_col="vec_id")
    os.makedirs(p + "__compact")
    open(os.path.join(p + "__compact", "_SUCCESS"), "w").close()
    with open(os.path.join(p + "__compact", "_tombstones_applied"),
              "w") as fh:
        fh.write("1:stale")
    apply_tombstones_partitioned(spark, p, "bucket", id_col="vec_id")
    out2 = spark.read.parquet(p)
    assert out2.count() == n - 2
    assert out2.where(F.col("vec_id").isin(ids)).count() == 0
    assert load_tombstones(spark, p, id_col="vec_id") is None


def test_registered_clusters_deleted_rebuild_contract(spark):
    """Derived-table delete propagation (r14): the registered cluster
    rebuild equals min-label components over the tombstone-filtered
    pair set — the deleted doc is absent, its old component relabels
    (or splits) as if the doc had never been indexed, and the rebuild
    is non-vacuous: the deleted doc was clustered in the unfiltered
    table."""
    from ringo_spark.operators.dedup import (
        DELETED_DOC_ID, dedup_clusters_deleted_df, dedup_clusters_df,
        dedup_minhash_lsh_deleted_df, dedup_minhash_lsh_indexed_df,
    )

    got = {(r.doc_id, r.cluster_id)
           for r in dedup_clusters_deleted_df(spark, SF).collect()}
    # reference: components over the filtered pairs via the shared
    # propagation kernel
    want = {(r.doc_id, r.cluster_id)
            for r in dedup_clusters_df(
                spark, SF,
                pairs_df=dedup_minhash_lsh_deleted_df(spark, SF)
                .selectExpr("doc_a", "doc_b")).collect()}
    assert got == want and got
    assert all(d != DELETED_DOC_ID for d, _ in got)
    full = {(r.doc_id, r.cluster_id)
            for r in dedup_clusters_df(
                spark, SF,
                pairs_df=dedup_minhash_lsh_indexed_df(spark, SF)
                .selectExpr("doc_a", "doc_b")).collect()}
    assert any(d == DELETED_DOC_ID for d, _ in full), \
        "demo doc must be clustered before deletion"
    assert got != full


def test_partitioned_compaction_survives_large_tombstone_set(spark,
                                                             tmp_path):
    """A multi-id tombstone log must compact: the staging fingerprint's
    hash sum runs in decimal (two random xxhash64 longs already
    overflow int64 with ~50% probability, which under Spark's default
    ANSI mode aborted the whole compaction), and the rewrite drops
    every tombstoned row in one pass."""
    from ringo_spark.operators.deletion import apply_tombstones_partitioned
    from ringo_spark.operators.similarity import build_lsh_index

    p = build_lsh_index(spark, SF, bits=4,
                        index_path=str(tmp_path / "lshbig"))
    rows = index_rows(spark, p, id_col="vec_id")
    n = rows.count()
    victims = [r.vec_id for r in
               rows.select("vec_id").orderBy("vec_id").limit(200)
               .collect()]
    tombstone_docs(spark, p, victims, id_col="vec_id")
    apply_tombstones_partitioned(spark, p, "bucket", id_col="vec_id")
    out = spark.read.parquet(p)
    assert out.count() == n - len(victims)
    assert out.where(F.col("vec_id").isin(victims[:50])).count() == 0
    assert load_tombstones(spark, p, id_col="vec_id") is None
