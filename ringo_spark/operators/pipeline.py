"""End-to-end corpus-curation pipeline: the composition flagship.

One DataFrame chain running the stages every pretraining corpus build
performs — quality filter → language selection → exact dedup (keep the
first-seen copy) → deterministic train/val/test split → per-cell corpus
accounting — to show the individual operators compose into a single
Catalyst plan: the filters collapse into the scan, dedup is the only
corpus-wide shuffle, the split is a map-side projection, and the final
accounting is one aggregation.

Scale notes: stages never materialize intermediates — at 100 TB this is
exactly one pass over the corpus plus one dedup shuffle (16-byte keys)
and one (split, lang)-cell aggregation of a few dozen groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .sampling import HASH_MOD, SPLIT_SEED, TRAIN_PCT, VAL_PCT
from .text import STOPWORDS, _SQL_STOP
from .textfn import sql_phash, sql_tokens, tokens

MIN_WORDS = 15
MIN_QUALITY = 0.45
KEEP_LANGS = ("en", "es", "fr")


def corpus_curation_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(split, lang) corpus accounting after quality filter, language
    selection, exact dedup, and hash split."""
    from .sampling import _bucket
    from .text import _count_in

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = tokens(F.col("text"))
    n_chars = F.length("text")
    n_words = F.size(t)
    punct = F.length(F.regexp_replace("text", "[a-z0-9\\s]", ""))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = _count_in(t, STOPWORDS) / n_words
    score = (F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.4
             + (1 - punct_ratio) * 0.3 + stop_ratio * 0.3)

    kept = (docs
            .withColumn("n_words", n_words)
            .withColumn("q", F.round(score, 6))
            .where((F.col("n_words") >= MIN_WORDS)
                   & (F.col("q") >= MIN_QUALITY)
                   & F.col("lang").isin(*KEEP_LANGS)))

    # exact dedup: keep the lowest doc_id per distinct text
    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    deduped = (kept.withColumn("rk", F.row_number().over(w))
               .where(F.col("rk") == 1))

    bucket = _bucket(F.col("doc_id"))
    pct = F.floor(bucket / (HASH_MOD / 100))
    split = (F.when(pct < TRAIN_PCT, "train")
             .when(pct < TRAIN_PCT + VAL_PCT, "val")
             .otherwise("test"))
    return (deduped
            .withColumn("split", split)
            .groupBy("split", "lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_words").alias("total_tokens"),
                 F.round(F.avg("q"), 6).alias("avg_quality")))


_SQL_LANGS = ", ".join(f"'{x}'" for x in KEEP_LANGS)

CORPUS_CURATION_SQL = f"""
WITH scored AS (
  SELECT doc_id, text, lang,
         len({sql_tokens('text')}) AS n_words,
         round(least(len({sql_tokens('text')}) / 100.0, 1.0) * 0.4
               + (1 - CASE WHEN length(text) > 0
                      THEN length(regexp_replace(text, '[a-z0-9\\s]', '', 'g'))
                           * 1.0 / length(text) ELSE 0.0 END) * 0.3
               + (len(list_filter({sql_tokens('text')},
                                  x -> list_contains([{_SQL_STOP}], x)))
                  * 1.0 / len({sql_tokens('text')})) * 0.3, 6) AS q
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
  SELECT *,
         CASE WHEN floor(({sql_phash("doc_id::VARCHAR", SPLIT_SEED)}
                          % {HASH_MOD}) / {HASH_MOD // 100}) < {TRAIN_PCT}
                THEN 'train'
              WHEN floor(({sql_phash("doc_id::VARCHAR", SPLIT_SEED)}
                          % {HASH_MOD}) / {HASH_MOD // 100})
                   < {TRAIN_PCT + VAL_PCT} THEN 'val'
              ELSE 'test' END AS split
  FROM deduped)
SELECT split, lang, count(*) AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS total_tokens,
       round(avg(q), 6) AS avg_quality
FROM labeled
GROUP BY 1, 2
"""


PIPELINE_QUERIES: dict[str, tuple] = {
    "corpus_curation": (corpus_curation_df, CORPUS_CURATION_SQL),
}
