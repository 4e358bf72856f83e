"""Equality pins for the corpus-sized LSH width gate (VERDICT r11
item 1: "gate EMB_LSH_BITS/LSH_BITS on a corpus-count estimate,
conf-keyed like ringo.dimIdSingleSortMaxBytes, with a pytest equality
pin at the contract size").

The contract: at the driver/oracle corpus size the auto gate resolves
to EXACTLY the pinned constants — so every hash-checked result and the
static oracle SQL are bit-identical to the legacy pinned behavior —
while a larger corpus gets ceil(log2(N / bucket_target)) bits, i.e.
bucket counts that double as the corpus does (flat per-row candidate
volume; SCALE.md ingest table)."""

import math

import pytest
from pyspark.sql import functions as F

from ringo_spark.operators.dedup import (
    DEDUP_BUCKET_TARGET_ROWS, EMB_LSH_BITS, _auto_dedup_bits,
)
from ringo_spark.operators.similarity import (
    ANN_BUCKET_TARGET_ROWS, EMB_DIM, LSH_AUTO_BITS_CONF_KEY, LSH_BITS,
    LSH_CORPUS_ROWS_CONF_KEY, _auto_ann_bits, corpus_rows_estimate,
)

SF001 = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"
SF1 = "/root/testdata/sf0.1"


@pytest.fixture
def rows_override(spark):
    """Set/unset the explicit corpus-rows conf override around a test."""
    def _set(n):
        spark.conf.set(LSH_CORPUS_ROWS_CONF_KEY, str(n))
    yield _set
    spark.conf.unset(LSH_CORPUS_ROWS_CONF_KEY)


def test_auto_bits_equal_pinned_contract_at_oracle_sizes(spark):
    """THE equality pin: at both oracle corpus sizes (sf0.001 for
    pytest fixtures, sf0.01 for the driver/verify sweep — 500 vectors
    each) the gate resolves to exactly the pinned widths, so the static
    oracle SQL (which encodes those widths) remains the deterministic
    hash-checked contract and every registered row stays green."""
    for sf in (SF001, SF01):
        assert _auto_dedup_bits(spark, sf) == EMB_LSH_BITS
        assert _auto_ann_bits(spark, sf) == LSH_BITS


def test_auto_bits_grow_at_bench_corpus(spark):
    """sf0.1 (2,000 vectors): the gate already widens — 2^6 buckets for
    the dedup pass (2000/32 -> 6 bits), 2^10 for top-k search."""
    assert _auto_dedup_bits(spark, SF1) == 6
    assert _auto_ann_bits(spark, SF1) == 10


def test_auto_bits_follow_log2_rule_under_rows_override(spark,
                                                        rows_override):
    """ringo.lshCorpusRows (the catalog-known-cardinality hook) drives
    the width through ceil(log2(N / target)) exactly."""
    n = 1 << 20
    rows_override(n)
    assert _auto_dedup_bits(spark, SF01) == math.ceil(
        math.log2(n / DEDUP_BUCKET_TARGET_ROWS))
    assert _auto_ann_bits(spark, SF01) == math.ceil(
        math.log2(n / ANN_BUCKET_TARGET_ROWS))


def test_auto_bits_clamped_to_embedding_dim(spark, rows_override):
    """bucket_coordinates can pick at most one coordinate per dimension,
    so the gate clamps at EMB_DIM no matter the corpus size."""
    rows_override(1 << 80)
    assert _auto_dedup_bits(spark, SF01) == EMB_DIM
    assert _auto_ann_bits(spark, SF01) == EMB_DIM


def test_auto_bits_never_below_the_contract_floor(spark, rows_override):
    """A tiny corpus keeps the contract width (coarser would change
    contract-size results for no cost win)."""
    rows_override(1)
    assert _auto_dedup_bits(spark, SF01) == EMB_LSH_BITS
    assert _auto_ann_bits(spark, SF01) == LSH_BITS


def test_auto_bits_conf_disable_pins_the_floor(spark, rows_override):
    rows_override(1 << 20)
    spark.conf.set(LSH_AUTO_BITS_CONF_KEY, "false")
    try:
        assert _auto_dedup_bits(spark, SF01) == EMB_LSH_BITS
        assert _auto_ann_bits(spark, SF01) == LSH_BITS
    finally:
        spark.conf.unset(LSH_AUTO_BITS_CONF_KEY)


def test_corpus_rows_estimate_sources(spark, tmp_path):
    """Estimate chain: optimizer rowCount when defined (spark.range has
    one), parquet footer metadata otherwise — including a DIRECTORY of
    part files (the shape the scale probe's salted corpus and the
    persisted indexes use)."""
    assert corpus_rows_estimate(spark.range(1234)) == 1234
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    assert corpus_rows_estimate(
        emb, f"{SF01}/embeddings.parquet") == 500
    out = str(tmp_path / "dir.parquet")
    spark.range(777).repartition(4).write.parquet(out)
    assert corpus_rows_estimate(spark.read.parquet(out), out) == 777
    # no estimate at all -> None (callers fall back to their floor)
    assert corpus_rows_estimate(emb, None) is None


def test_auto_resolved_results_equal_pinned_at_contract_size(spark):
    """The auto default and the explicit pinned width produce
    bit-identical pair sets at the contract corpus size — the driver-row
    stays-green guarantee, pinned directly."""
    from ringo_spark.operators.dedup import (
        dedup_embedding_incremental_df, dedup_embedding_lsh_df,
    )

    for fn in (dedup_embedding_lsh_df, dedup_embedding_incremental_df):
        auto = sorted(map(tuple, fn(spark, SF01).collect()))
        pinned = sorted(map(tuple, fn(spark, SF01,
                                      bits=EMB_LSH_BITS).collect()))
        assert auto == pinned and auto


def test_parquet_meta_rows_cache_invalidates_on_rewrite(spark, tmp_path):
    """The footer-count cache keys on (path, mtime, size): repeat gate
    resolutions over an unchanged corpus cost nothing, a rewrite or
    append (Spark bumps the dir's _SUCCESS either way) re-counts."""
    import time as _time

    from ringo_spark.operators.similarity import _parquet_meta_rows

    out = str(tmp_path / "c.parquet")
    spark.range(100).coalesce(1).write.parquet(out)
    assert _parquet_meta_rows(out) == 100
    assert _parquet_meta_rows(out) == 100          # cache hit
    _time.sleep(0.05)                              # ensure mtime moves
    spark.range(40).coalesce(1).write.mode("append").parquet(out)
    assert _parquet_meta_rows(out) == 140
    # partitioned append lands files in SUBDIRS only; the validator's
    # _SUCCESS stat still invalidates (r12 review finding: the top-level
    # dir mtime alone can miss subdir-only modifications)
    part = str(tmp_path / "p.parquet")
    (spark.range(100).withColumn("b", F.pmod("id", F.lit(2)))
     .write.partitionBy("b").parquet(part))
    assert _parquet_meta_rows(part) == 100
    _time.sleep(0.05)
    (spark.range(100, 130).withColumn("b", F.pmod("id", F.lit(2)))
     .write.mode("append").partitionBy("b").parquet(part))
    assert _parquet_meta_rows(part) == 130


def test_auto_ivf_k_contract_and_growth(spark, rows_override):
    """The IVF twin of the bits gate (r12): at the oracle corpus sizes
    the centroid count resolves to exactly the pinned K=16 — the value
    the K-shaped oracle SQL (incl. the replayed k-means trajectory)
    encodes — and grows ~sqrt(N) past it, with nprobe holding the
    contract probe fraction."""
    from ringo_spark.operators.similarity import (
        IVF_AUTO_K_CONF_KEY, IVF_K, IVF_NPROBE, IVF_RECALL_NPROBE,
        _auto_ivf_k, _auto_nprobe,
    )

    for sf in (SF001, SF01):
        assert _auto_ivf_k(spark, sf) == IVF_K
    assert _auto_ivf_k(spark, SF1) == 32           # round(sqrt(2000/2))
    rows_override(1 << 20)
    assert _auto_ivf_k(spark, SF01) == round(math.sqrt((1 << 20) / 2))
    # driver-memory ceiling (VERDICT r12 item 8): a pathological
    # rows-override clamps at IVF_MAX_AUTO_K instead of resolving to an
    # OOM-sized Lloyd collect (K×dim doubles per iteration)
    from ringo_spark.operators.similarity import IVF_MAX_AUTO_K

    rows_override(10 ** 18)
    assert _auto_ivf_k(spark, SF01) == IVF_MAX_AUTO_K
    spark.conf.set(IVF_AUTO_K_CONF_KEY, "false")
    try:
        assert _auto_ivf_k(spark, SF01) == IVF_K
    finally:
        spark.conf.unset(IVF_AUTO_K_CONF_KEY)
    # probe width keeps the contract fraction as K widens
    assert _auto_nprobe(IVF_K, IVF_NPROBE) == IVF_NPROBE
    assert _auto_nprobe(32, IVF_NPROBE) == 4
    assert _auto_nprobe(32, IVF_RECALL_NPROBE) == 8
    assert _auto_nprobe(IVF_K, IVF_RECALL_NPROBE) == IVF_RECALL_NPROBE


def test_auto_ivf_results_equal_pinned_at_contract_size(spark):
    """The auto defaults and the explicit pinned configuration produce
    bit-identical rows at the contract corpus size — the driver-row
    stays-green guarantee for every IVF query path."""
    from ringo_spark.operators.similarity import (
        IVF_K, IVF_NPROBE, IVF_RECALL_NPROBE, ann_ivf_df,
        ann_ivf_kmeans_df, ann_ivf_recall_bounds_df,
    )

    cases = [
        (ann_ivf_df, dict(k=IVF_K, nprobe=IVF_NPROBE)),
        (ann_ivf_kmeans_df, dict(k=IVF_K, nprobe=IVF_NPROBE)),
        (ann_ivf_recall_bounds_df, dict(k=IVF_K, nprobe=IVF_RECALL_NPROBE)),
    ]
    for fn, pinned_kw in cases:
        auto = sorted(map(tuple, fn(spark, SF01).collect()))
        pinned = sorted(map(tuple, fn(spark, SF01, **pinned_kw).collect()))
        assert auto == pinned and auto, fn.__name__


def test_oracle_width_cte_tracks_gate_at_every_sf(spark):
    """VERDICT r13 item 1: the oracle SQL no longer hard-codes one
    contract width — its width CTE (count(*) through the same
    max(floor, ceil(log2(N/target))) formula) must resolve to exactly
    the Spark gate's width at EVERY scale factor, including the sf0.1
    size where the gate widens past the floor (the old static oracles
    diverged there by design)."""
    import duckdb

    from ringo_spark.operators.similarity import sql_auto_bits_cte

    for sf in (SF001, SF01, SF1):
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                    f"read_parquet('{sf}/embeddings.parquet')")
        for floor, target, gate in (
                (EMB_LSH_BITS, DEDUP_BUCKET_TARGET_ROWS, _auto_dedup_bits),
                (LSH_BITS, ANN_BUCKET_TARGET_ROWS, _auto_ann_bits)):
            duck = con.execute(sql_auto_bits_cte(floor, target)) \
                .fetchone()[0]
            assert duck == gate(spark, sf), (sf, floor, target)
    # non-vacuous: at sf0.1 the dedup gate actually widens past its
    # floor, so the dynamic oracle is exercised beyond the contract
    assert _auto_dedup_bits(spark, SF1) > EMB_LSH_BITS


def test_ivf_oracle_k_cte_tracks_gate_at_every_sf(spark):
    """The IVF analog of the width-CTE pin: the oracles' kk(k) /
    np(nprobe) CTEs must resolve to exactly auto_ivf_k/_auto_nprobe at
    every scale factor — non-vacuously past the contract K at sf0.1."""
    import duckdb

    from ringo_spark.operators.similarity import (
        IVF_NPROBE, IVF_RECALL_NPROBE, _auto_ivf_k, _auto_nprobe,
        sql_auto_ivf_k_cte, sql_auto_nprobe_cte,
    )

    for sf in (SF001, SF01, SF1):
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                    f"read_parquet('{sf}/embeddings.parquet')")
        k = _auto_ivf_k(spark, sf)
        assert con.execute(sql_auto_ivf_k_cte()).fetchone()[0] == k
        for base in (IVF_NPROBE, IVF_RECALL_NPROBE):
            got = con.execute(
                f"WITH kk AS ({sql_auto_ivf_k_cte()}) "
                f"{sql_auto_nprobe_cte(base)}").fetchone()[0]
            assert got == _auto_nprobe(k, base), (sf, base)
    from ringo_spark.operators.similarity import IVF_K
    assert _auto_ivf_k(spark, SF1) > IVF_K
