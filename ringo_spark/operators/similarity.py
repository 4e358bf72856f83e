"""Similarity search over the ``embeddings`` table (array<float> column).

- ``ann_cosine_topk``   — brute-force cosine top-k: the exactness baseline.
  Query set broadcast against the corpus; per-query window ranks.  At scale
  the corpus scan is embarrassingly parallel and shuffle-free until the
  final per-query top-k (tiny).
- ``ann_lsh_bucketed``  — the sub-quadratic scale path: deterministic
  axis-aligned projection LSH (sign bits of 8 fixed coordinates ⇒ 256
  buckets).  Both queries and corpus hash to buckets; candidates are
  searched only within the query's bucket.  The bucket join shuffles on an
  8-bit key instead of crossJoining, turning O(N·Q) into O(N·Q/256) with
  per-bucket locality.  (A production IVF would learn centroids; the fixed
  projection keeps the operator deterministic and oracle-checkable.)

Both deterministic ⇒ both hash-checked against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .textfn import cosine, sql_cosine

TOP_K = 10
N_QUERIES = 5
LSH_TOP_K = 5
LSH_N_QUERIES = 20
BUCKET_DIMS = [1, 9, 17, 25, 33, 41, 49, 57]  # 1-based coordinate picks


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def ann_cosine_topk_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 cosine neighbors for the first 5 query vectors."""
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < N_QUERIES) \
           .select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb"))
    c = emb.select(F.col("vec_id").alias("n_id"), F.col("embedding").alias("n_emb"))
    scored = (c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
              .select("q_id", "n_id",
                      F.round(cosine(F.col("q_emb"), F.col("n_emb")), 6)
                      .alias("cosine")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= TOP_K)
            .select("q_id", "n_id", "rank", "cosine"))


ANN_COSINE_TOPK_SQL = f"""
WITH scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         round({sql_cosine('q.embedding', 'c.embedding')}, 6) AS cosine
  FROM embeddings q JOIN embeddings c ON q.vec_id != c.vec_id
  WHERE q.vec_id < {N_QUERIES})
SELECT q_id, n_id,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id)
            AS INT) AS rank,
       cosine
FROM scored
QUALIFY rank <= {TOP_K}
"""


def _bucket_expr(col):
    """8 sign bits of fixed coordinates -> bucket id in [0, 255]."""
    expr = F.lit(0)
    for j, d in enumerate(BUCKET_DIMS):
        expr = expr + F.when(
            F.element_at(col, d).cast("double") > 0, F.lit(1 << j)).otherwise(0)
    return expr


def ann_lsh_bucketed_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 neighbors within the query's LSH bucket, first 20 queries."""
    emb = _emb(spark, sf_dir).withColumn("bucket", _bucket_expr(F.col("embedding")))
    q = emb.where(F.col("vec_id") < LSH_N_QUERIES) \
           .select(F.col("vec_id").alias("q_id"),
                   F.col("embedding").alias("q_emb"), "bucket")
    c = emb.select(F.col("vec_id").alias("n_id"),
                   F.col("embedding").alias("n_emb"), "bucket")
    scored = (c.join(F.broadcast(q), ["bucket"])
              .where(F.col("q_id") != F.col("n_id"))
              .select("q_id", "n_id",
                      F.round(cosine(F.col("q_emb"), F.col("n_emb")), 6)
                      .alias("cosine")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= LSH_TOP_K)
            .select("q_id", "n_id", "rank", "cosine"))


def ann_cosine_topk_arrow_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized-Python variant of the brute-force top-k: cosine scored in
    numpy over Arrow batches (``mapInPandas``).  Same join/rank shape as
    the JVM version; numpy's SIMD/pairwise summation means the last float
    ulp can differ from strict left-to-right folds, so this variant is
    checked rows-only by the driver and against the JVM version within
    1e-9 in tests.  It exists as the template for embedding kernels that
    genuinely need numpy (PCA whitening, quantization, learned indexes) —
    batch-columnar, no per-row Python."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    emb = _emb(spark, sf_dir)
    q_rows = (emb.where(F.col("vec_id") < N_QUERIES)
              .select("vec_id", "embedding").collect())
    q_ids = np.array([r.vec_id for r in q_rows])
    q_mat = np.array([r.embedding for r in q_rows], dtype=np.float64)
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)
    bc = spark.sparkContext.broadcast((q_ids, q_mat))

    schema = T.StructType([
        T.StructField("q_id", T.LongType()),
        T.StructField("n_id", T.LongType()),
        T.StructField("cosine", T.DoubleType()),
    ])

    def score(batches):
        ids, mat = bc.value
        for pdf in batches:
            n_ids = pdf["vec_id"].to_numpy()
            c = np.array(list(pdf["embedding"]), dtype=np.float64)
            c /= np.linalg.norm(c, axis=1, keepdims=True)
            sims = c @ mat.T  # (batch, n_queries)
            out = pd.DataFrame({
                "q_id": np.repeat(ids, len(n_ids)),
                "n_id": np.tile(n_ids, len(ids)),
                "cosine": np.round(sims.T.ravel(), 6),
            })
            yield out[out.q_id != out.n_id]

    scored = emb.select("vec_id", "embedding").mapInPandas(score, schema)
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= TOP_K)
            .select("q_id", "n_id", "rank", "cosine"))


_SQL_BUCKET = " + ".join(
    f"(CASE WHEN embedding[{d}]::DOUBLE > 0 THEN {1 << j} ELSE 0 END)"
    for j, d in enumerate(BUCKET_DIMS))

ANN_LSH_BUCKETED_SQL = f"""
WITH b AS (SELECT vec_id, embedding, {_SQL_BUCKET} AS bucket FROM embeddings),
scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         round({sql_cosine('q.embedding', 'c.embedding')}, 6) AS cosine
  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id != c.vec_id
  WHERE q.vec_id < {LSH_N_QUERIES})
SELECT q_id, n_id,
       CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id)
            AS INT) AS rank,
       cosine
FROM scored
QUALIFY rank <= {LSH_TOP_K}
"""
