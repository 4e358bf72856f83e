"""Training-data preparation operators: PII scrubbing, sequence packing,
embedding quantization, and table profiling.

Like the rest of the operator surface these are pure JVM-side DataFrame
expressions (no Python UDFs) with exact DuckDB oracle twins.  They cover
the pipeline steps between "curated corpus" and "training batches":

- :func:`text_scrub_df` — regex redaction of emails / URLs / phone
  numbers with per-kind counts.  The synthetic ``documents`` table
  contains no PII, so the query first *injects* deterministic synthetic
  PII derived from ``doc_id`` (identically in Spark and the oracle) and
  then scrubs it — the redaction logic is exercised on every row.
- :func:`seq_pack_df` — pack documents into fixed-size token bins
  (training context windows) via sharded greedy packing: a running token
  total per shard, bin index by integer division.  Sharding keeps the
  window partitioned — no global sort, each shard packs independently,
  which is exactly how a 1000-executor run would lay out packing.
- :func:`embed_quantize_df` — symmetric int8 quantization of the
  embedding column (scale = max|x| / 127), the standard storage/serving
  compression for ANN indexes; map-only.
- :func:`profile_table_df` — one-pass column profile (rows / nulls /
  distincts per column) of the ``orders`` table, the "know your data"
  step before any of the above; single aggregate, melted to long form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .textfn import sql_tokens, tokens

# --- text scrub -------------------------------------------------------------

URL_RE = r"https://[^\s]+"
EMAIL_RE = r"[a-z0-9.]+@[a-z0-9.-]+\.[a-z]+"
PHONE_RE = r"\+1-555-[0-9]{4}"


def _augmented_text() -> F.Column:
    """text + deterministic synthetic PII (same expression as the oracle's
    ``aug`` CTE — keep the two in lockstep)."""
    did = F.col("doc_id").cast("string")
    return F.concat(
        F.col("text"),
        F.lit(" contact user"), did, F.lit("@example.com or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" see https://example.com/doc/"), did)


def text_scrub_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact URLs, then emails, then phone numbers (that order: the URL
    pattern is greedy and must not see '<EMAIL>' placeholders).  Map-only:
    scales to any corpus size with zero shuffle."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    aug = _augmented_text()
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, URL_RE, "<URL>"),
            EMAIL_RE, "<EMAIL>"),
        PHONE_RE, "<PHONE>")
    return docs.select(
        "doc_id",
        scrubbed.alias("scrubbed"),
        F.size(F.regexp_extract_all(aug, F.lit(URL_RE), 0)).alias("n_urls"),
        F.size(F.regexp_extract_all(aug, F.lit(EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all(aug, F.lit(PHONE_RE), 0)).alias("n_phones"))


TEXT_SCRUB_SQL = f"""
WITH aug AS (
  SELECT doc_id,
         text || ' contact user' || CAST(doc_id AS VARCHAR)
              || '@example.com or +1-555-'
              || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              || ' see https://example.com/doc/' || CAST(doc_id AS VARCHAR)
           AS t
  FROM documents)
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(t,
           '{URL_RE}', '<URL>', 'g'),
           '{EMAIL_RE}', '<EMAIL>', 'g'),
           '{PHONE_RE}', '<PHONE>', 'g') AS scrubbed,
       CAST(len(regexp_extract_all(t, '{URL_RE}')) AS INTEGER) AS n_urls,
       CAST(len(regexp_extract_all(t, '{EMAIL_RE}')) AS INTEGER) AS n_emails,
       CAST(len(regexp_extract_all(t, '{PHONE_RE}')) AS INTEGER) AS n_phones
FROM aug
"""

# --- sequence packing -------------------------------------------------------

PACK_CONTEXT = 512     # tokens per training context window
PACK_SHARDS = 8        # independent packing shards (window partitions)


def seq_pack_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each document to a training-context bin of PACK_CONTEXT
    tokens.  Greedy contiguous packing *within a shard*: running token
    total ordered by doc_id, bin = floor(preceding_total / context).

    The shard keeps the sort window partitioned — the classic scale
    mistake here is a global ``Window.orderBy`` (single-task sort of the
    corpus); sharding by ``doc_id % k`` packs k partitions independently
    and any residual per-shard tail waste is bounded by k * context
    tokens, negligible against corpus size.  Documents longer than the
    context are capped (real pipelines chunk them upstream)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_tok = F.size(tokens(F.col("text")))
    capped = F.least(n_tok, F.lit(PACK_CONTEXT))
    shard = F.col("doc_id") % PACK_SHARDS
    w = (Window.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (docs
            .select("doc_id", shard.alias("shard"),
                    n_tok.alias("n_tokens"), capped.alias("tok_capped"))
            .withColumn("cum", F.sum("tok_capped").over(w))
            .select("doc_id", "shard", "n_tokens",
                    (F.col("shard") * 1000000
                     + F.floor((F.col("cum") - F.col("tok_capped"))
                               / F.lit(float(PACK_CONTEXT))))
                    .cast("long").alias("pack_id")))


SEQ_PACK_SQL = f"""
WITH toks AS (
  SELECT doc_id, doc_id % {PACK_SHARDS} AS shard,
         CAST(len({sql_tokens('text')}) AS INTEGER) AS n_tokens,
         least(len({sql_tokens('text')}), {PACK_CONTEXT}) AS tok_capped
  FROM documents),
packed AS (
  SELECT doc_id, shard, n_tokens, tok_capped,
         sum(tok_capped) OVER (PARTITION BY shard ORDER BY doc_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS cum
  FROM toks)
SELECT doc_id, shard, n_tokens,
       CAST(shard * 1000000
            + floor((cum - tok_capped) / {float(PACK_CONTEXT)}) AS BIGINT)
         AS pack_id
FROM packed
"""

# --- document chunking ------------------------------------------------------

CHUNK_SIZE = 64     # tokens per chunk
CHUNK_STRIDE = 48   # stride between chunk starts (overlap = size - stride)


def doc_chunk_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split documents into overlapping fixed-size token windows — the
    upstream chunker :func:`seq_pack_df` assumes (long docs must be cut
    to context-sized pieces before packing; the overlap preserves
    cross-boundary context for training).  Chunk c covers tokens
    [c·stride+1, c·stride+size]; the last chunk is the first one whose
    window reaches the end, so every token is covered exactly and no
    empty trailing chunk is emitted.

    Scale: pure map-side row expansion (transform + explode inside one
    projection) — no shuffle, no Python; output rows ∝ total tokens /
    stride."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_tok = F.size("__toks")
    n_chunks = F.when(n_tok <= CHUNK_SIZE, F.lit(1)).otherwise(
        F.ceil((n_tok - CHUNK_SIZE) / CHUNK_STRIDE) + 1)
    chunk = lambda c: F.struct(  # noqa: E731
        c.cast("int").alias("chunk_id"),
        F.array_join(F.slice("__toks", c * CHUNK_STRIDE + 1, CHUNK_SIZE), " ")
        .alias("chunk_text"),
        F.least(n_tok - c * CHUNK_STRIDE, F.lit(CHUNK_SIZE)).cast("int")
        .alias("n_chunk_tokens"))
    return (docs
            .select("doc_id", tokens(F.col("text")).alias("__toks"))
            .select("doc_id",
                    F.explode(F.transform(
                        F.sequence(F.lit(0), n_chunks - 1), chunk)).alias("c"))
            .select("doc_id", "c.chunk_id", "c.chunk_text",
                    "c.n_chunk_tokens"))


DOC_CHUNK_SQL = f"""
WITH toks AS (
  SELECT doc_id, {sql_tokens('text')} AS t FROM documents),
spec AS (
  SELECT doc_id, t,
         CASE WHEN len(t) <= {CHUNK_SIZE} THEN 1
              ELSE CAST(ceil((len(t) - {CHUNK_SIZE}) * 1.0
                             / {CHUNK_STRIDE}) AS BIGINT) + 1 END AS n_chunks
  FROM toks)
SELECT doc_id,
       CAST(s.cid AS INT) AS chunk_id,
       s.txt AS chunk_text,
       CAST(s.n AS INT) AS n_chunk_tokens
FROM (
  SELECT doc_id,
         unnest([{{'cid': c,
                   'txt': array_to_string(
                       t[c * {CHUNK_STRIDE} + 1
                         : c * {CHUNK_STRIDE} + {CHUNK_SIZE}], ' '),
                   'n': least(len(t) - c * {CHUNK_STRIDE}, {CHUNK_SIZE})}}
                  for c in generate_series(0, n_chunks - 1)]) AS s
  FROM spec)
"""


# --- embedding quantization -------------------------------------------------


def embed_quantize_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization: per-vector scale = max|x|, codes
    floor(x / scale * 127 + 0.5) — identical IEEE-double expression order
    as the oracle so codes match bit-for-bit.  Map-only (4x storage cut
    for ANN indexes; dequantize is q * scale / 127)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # the scale is rounded BEFORE quantizing, so the published scale is
    # exactly the one the codes were computed with — dequantization
    # (q * scale / 127) reconstructs within half a step, test-pinned
    m = F.round(F.array_max(F.transform("embedding",
                                        lambda x: F.abs(x.cast("double")))), 6)
    q = F.transform("embedding",
                    lambda x: F.floor(x.cast("double") / F.col("scale")
                                      * 127.0 + 0.5).cast("int"))
    zeros = F.transform("embedding", lambda x: F.lit(0))
    return (emb.withColumn("scale", m)
            .select("vec_id", "scale",
                    F.when(F.col("scale") > 0, q).otherwise(zeros)
                    .alias("q_embedding")))


EMBED_QUANTIZE_SQL = """
WITH scaled AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         round(list_max(list_transform(embedding::DOUBLE[], x -> abs(x))), 6)
           AS scale
  FROM embeddings)
SELECT vec_id, scale,
       CASE WHEN scale > 0
            THEN list_transform(e, x -> CAST(floor(x / scale * 127.0 + 0.5)
                                             AS INTEGER))
            ELSE list_transform(e, x -> 0)
       END AS q_embedding
FROM scaled
"""


def embed_quantize_codes_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-registered variant of :func:`embed_quantize_df` with the
    int8 codes serialized to one comma-joined string column.

    The typed ``array<int>`` output is the library surface, but the
    driver's correctness harness canonicalizes result frames via pandas
    ``sort_values``, which cannot hash Python lists (CORRECTNESS_r04 ERR).
    Serializing is a display transform only — any code mismatch still
    flips the value hash."""
    return embed_quantize_df(spark, sf_dir).select(
        "vec_id", "scale",
        F.array_join(F.col("q_embedding").cast("array<string>"), ",")
        .alias("q_codes"))


EMBED_QUANTIZE_CODES_SQL = f"""
SELECT vec_id, scale,
       array_to_string(q_embedding, ',') AS q_codes
FROM ({EMBED_QUANTIZE_SQL}) base
"""

# --- table profiling --------------------------------------------------------

PROFILE_COLUMNS = ["o_orderkey", "o_custkey", "o_orderstatus",
                   "o_totalprice", "o_orderdate", "o_orderpriority"]


def profile_table_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass column profile of ``orders``: rows, nulls, exact distinct
    count per column, melted to one row per column.  Spark plans the
    multi-distinct aggregate as a single scan with expand — at 100 TB you
    would swap ``countDistinct`` for ``approx_count_distinct`` (one pass,
    no expand); exact is kept here because the oracle is exact."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in PROFILE_COLUMNS:
        aggs.append(F.count(c).alias(f"__present_{c}"))
        aggs.append(F.countDistinct(c).alias(f"__distinct_{c}"))
    one = orders.agg(*aggs)
    per_col = F.array(*[
        F.struct(F.lit(c).alias("column"),
                 F.col("__rows").alias("n_rows"),
                 (F.col("__rows") - F.col(f"__present_{c}")).alias("n_nulls"),
                 F.col(f"__distinct_{c}").alias("n_distinct"))
        for c in PROFILE_COLUMNS])
    return (one.select(F.explode(per_col).alias("p"))
            .select("p.column", "p.n_rows", "p.n_nulls", "p.n_distinct"))


PROFILE_TABLE_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS "column", count(*) AS n_rows,
       count(*) - count({c}) AS n_nulls,
       count(DISTINCT {c}) AS n_distinct FROM orders"""
    for c in PROFILE_COLUMNS)


TRAINING_QUERIES: dict[str, tuple] = {
    "text_scrub": (text_scrub_df, TEXT_SCRUB_SQL),
    "seq_pack": (seq_pack_df, SEQ_PACK_SQL),
    "doc_chunk": (doc_chunk_df, DOC_CHUNK_SQL),
    # serialized-codes variant registered for the driver (hashable schema);
    # embed_quantize_df (typed array<int>) stays the library function
    "embed_quantize": (embed_quantize_codes_df, EMBED_QUANTIZE_CODES_SQL),
    "profile_table": (profile_table_df, PROFILE_TABLE_SQL),
}
