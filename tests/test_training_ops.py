"""Invariant tests for the training-data prep operators (oracle checks
prove cross-engine equality; these pin the *semantic* guarantees)."""

import pytest
from pyspark.sql import functions as F

from ringo_spark.operators.training import (
    PACK_CONTEXT, PACK_SHARDS, embed_quantize_df, profile_table_df,
    seq_pack_df, text_scrub_df,
)

SF = "/root/testdata/sf0.001"


def test_text_scrub_leaves_no_pii(spark):
    out = text_scrub_df(spark, SF)
    from ringo_spark.operators.training import EMAIL_RE, PHONE_RE, URL_RE

    leftovers = out.where(
        F.col("scrubbed").rlike(URL_RE)
        | F.col("scrubbed").rlike(EMAIL_RE)
        | F.col("scrubbed").rlike(PHONE_RE)).count()
    assert leftovers == 0
    # every row had the injected email+phone+url found and redacted
    assert out.where((F.col("n_urls") < 1) | (F.col("n_emails") < 1)
                     | (F.col("n_phones") < 1)).count() == 0
    assert out.where(~F.col("scrubbed").contains("<EMAIL>")).count() == 0


def test_seq_pack_respects_context_budget(spark):
    """No pack exceeds the context budget (over capped token counts), and
    pack ids stay within their shard's namespace."""
    out = seq_pack_df(spark, SF)
    packed = (out.withColumn(
        "tok_capped", F.least("n_tokens", F.lit(PACK_CONTEXT)))
        .groupBy("shard", "pack_id")
        .agg(F.sum("tok_capped").alias("total")))
    # greedy contiguous packing overflows a bin only by the doc that
    # closes it, so total < context + max_doc <= 2 * context
    assert packed.where(F.col("total") > 2 * PACK_CONTEXT).count() == 0
    # at least one bin is full (the corpus has far more tokens than one bin)
    assert packed.where(F.col("total") >= PACK_CONTEXT).count() > 0
    bad_ns = out.where(
        (F.col("pack_id") < F.col("shard") * 1000000)
        | (F.col("pack_id") >= (F.col("shard") + 1) * 1000000)).count()
    assert bad_ns == 0
    assert out.select("shard").distinct().count() == PACK_SHARDS


def test_embed_quantize_roundtrip_error_bound(spark):
    """Dequantized codes reconstruct each component within half a
    quantization step (scale/127/2), and codes stay in int8 range."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = embed_quantize_df(spark, SF)
    j = emb.join(q, "vec_id").where(F.col("scale") > 0)
    pair = F.arrays_zip(F.col("embedding"), F.col("q_embedding"))
    err = F.array_max(F.transform(
        pair, lambda p: F.abs(
            p.getField("embedding").cast("double")
            - p.getField("q_embedding") * F.col("scale") / F.lit(127.0))))
    max_err = j.select(F.max(err / F.col("scale")).alias("m")).first().m
    assert max_err <= 0.5 / 127 + 1e-9
    rng = q.select(
        F.max(F.array_max("q_embedding")).alias("hi"),
        F.min(F.array_min("q_embedding")).alias("lo")).first()
    assert rng.hi <= 127 and rng.lo >= -127


def test_profile_table_accounting(spark):
    rows = {r["column"]: r for r in profile_table_df(spark, SF).collect()}
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    n = orders.count()
    assert all(r.n_rows == n for r in rows.values())
    for c, r in rows.items():
        assert 0 <= r.n_nulls <= n
        assert 1 <= r.n_distinct <= n - r.n_nulls
    # o_orderkey is the PK: all distinct, no nulls
    assert rows["o_orderkey"].n_nulls == 0
    assert rows["o_orderkey"].n_distinct == n


def test_doc_chunk_covers_every_token_with_overlap(spark):
    """Chunking invariants: chunk c starts at token c*stride+1; every
    token of every document lands in at least one chunk; consecutive
    chunks overlap by exactly size-stride (except a short last chunk);
    reassembling stride-prefixes + the last chunk reproduces the doc."""
    from pyspark.sql import functions as F

    from ringo_spark.operators.training import (
        CHUNK_SIZE, CHUNK_STRIDE, doc_chunk_df,
    )
    from ringo_spark.operators.textfn import tokens

    SF = "/root/testdata/sf0.001"
    chunks = doc_chunk_df(spark, SF).collect()
    docs = {r.doc_id: r.toks for r in
            spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", tokens(F.col("text")).alias("toks")).collect()}
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, {})[r.chunk_id] = r
    assert set(by_doc) == set(docs)
    for doc_id, toks in list(docs.items())[:200]:
        cs = by_doc[doc_id]
        assert sorted(cs) == list(range(len(cs)))
        rebuilt = []
        for cid in sorted(cs):
            ctoks = cs[cid].chunk_text.split(" ")
            assert ctoks == toks[cid * CHUNK_STRIDE:
                                 cid * CHUNK_STRIDE + CHUNK_SIZE]
            assert cs[cid].n_chunk_tokens == len(ctoks)
            rebuilt.extend(ctoks if cid == len(cs) - 1
                           else ctoks[:CHUNK_STRIDE])
        # the last chunk reaches the end: full coverage, no gap
        assert rebuilt[:len(toks)] == toks
