"""End-to-end corpus-curation pipeline: the composition flagship.

One DataFrame chain running the stages every pretraining corpus build
performs — quality filter → language selection → exact dedup (keep the
first-seen copy) → deterministic train/val/test split → per-cell corpus
accounting — to show the individual operators compose into a single
Catalyst plan: the filters collapse into the scan, dedup is the only
corpus-wide shuffle, the split is a map-side projection, and the final
accounting is one aggregation.

The quality score and the split label are the SAME definitions the
standalone operators use (text.quality_score_expr / sampling.split_expr
and their SQL twins) — curation cannot drift from the operators it
composes.

Scale notes: stages never materialize intermediates — at 100 TB this is
exactly one pass over the corpus plus one dedup shuffle (16-byte keys)
and one (split, lang)-cell aggregation of a few dozen groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .sampling import split_expr, sql_split
from .text import quality_score_expr, sql_quality_score
from .textfn import sql_tokens, tokens

MIN_WORDS = 15
MIN_QUALITY = 0.45
KEEP_LANGS = ("en", "es", "fr")


def corpus_curation_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(split, lang) corpus accounting after quality filter, language
    selection, exact dedup, and hash split."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    kept = (docs
            .withColumn("n_words", F.size(tokens(F.col("text"))))
            .withColumn("q", F.round(quality_score_expr(), 6))
            .where((F.col("n_words") >= MIN_WORDS)
                   & (F.col("q") >= MIN_QUALITY)
                   & F.col("lang").isin(*KEEP_LANGS)))

    # exact dedup: keep the lowest doc_id per distinct text
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (kept.withColumn("rk", F.row_number().over(w))
               .where(F.col("rk") == 1))

    # avg over an exact decimal sum: q is already rounded to 6 decimals, so
    # summing as decimal(18,6) is order-independent (double sums are not)
    q_sum = F.sum(F.col("q").cast("decimal(18,6)")).cast("double")
    return (deduped
            .withColumn("split", split_expr(F.col("doc_id")))
            .groupBy("split", "lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_words").alias("total_tokens"),
                 F.round(q_sum / F.count(F.lit(1)), 6).alias("avg_quality")))


_SQL_LANGS = ", ".join(f"'{x}'" for x in KEEP_LANGS)

CORPUS_CURATION_SQL = f"""
WITH scored AS (
  SELECT doc_id, text, lang,
         len({sql_tokens('text')}) AS n_words,
         round({sql_quality_score('text')}, 6) AS q
  FROM documents),
kept AS (
  SELECT * FROM scored
  WHERE n_words >= {MIN_WORDS} AND q >= {MIN_QUALITY}
    AND lang IN ({_SQL_LANGS})),
deduped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rk
    FROM kept)
  WHERE rk = 1),
labeled AS (
  SELECT *, {sql_split()} AS split
  FROM deduped)
SELECT split, lang, count(*) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS total_tokens,
       round(CAST(sum(CAST(q AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6)
         AS avg_quality
FROM labeled
GROUP BY 1, 2
"""


PIPELINE_QUERIES: dict[str, tuple] = {
    "corpus_curation": (corpus_curation_df, CORPUS_CURATION_SQL),
}
