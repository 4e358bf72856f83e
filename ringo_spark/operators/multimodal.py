"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched ``mapInPandas``.

The container has no image/audio libraries, so the actual decoders are
STUBBED: ``_decode_image_real`` raises NotImplementedError unless PIL is
importable, and the pipeline falls back to ``_decode_fake`` — a
clearly-marked deterministic function of the payload bytes.  Everything
around the stub is real and tested: binary column schema, Arrow batch
transfer, per-partition batching, output schema enforcement — i.e. the
exact plumbing a real decoder would drop into.

Scale notes: mapInPandas streams Arrow batches per partition — no
collect, no per-row Python calls; payload bytes never shuffle (the
operator is map-only), so adding decode to a 100 TB scan costs only the
Python-worker lanes, not an exchange.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
])


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize a media table with an opaque binary column + metadata
    (documents' text bytes standing in for image payloads)."""
    return (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id",
                    F.encode("text", "utf-8").alias("payload"),
                    F.lit("image/fake").alias("media_type"),
                    F.struct(F.col("n_chars").alias("declared_size"),
                             F.col("source").alias("origin")).alias("meta")))


def _decode_image_real(payload: bytes) -> tuple[int, int]:
    """Real decoder — requires an image library absent from this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - expected path here
        raise NotImplementedError(
            "image decode requires PIL/opencv; not available in this "
            "environment — deterministic fake used instead") from exc
    raise NotImplementedError("real decode path not wired in this build")


def _decode_fake(payload: bytes) -> tuple[int, int, int]:
    """DETERMINISTIC FAKE decode: features derived from payload length so
    results are reproducible and oracle-checkable."""
    n = len(payload)
    return n % 640 + 1, (n * 7) % 480 + 1, n % 16 + 1


def decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: binary payload -> (width, height, n_frames)."""
    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len)
        feats = payloads.map(_decode_fake)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "n_bytes": n_bytes.astype("int64"),
            "width": feats.map(lambda f: f[0]).astype("int32"),
            "height": feats.map(lambda f: f[1]).astype("int32"),
            "n_frames": feats.map(lambda f: f[2]).astype("int32"),
        })


def multimodal_features_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode pipeline via Arrow-batched mapInPandas."""
    return media_table(spark, sf_dir).mapInPandas(decode_features, FEATURE_SCHEMA)


# Oracle replays the deterministic fake arithmetically on the text bytes
# (documents are ASCII, so strlen == octet length).
MULTIMODAL_FEATURES_SQL = """
SELECT doc_id,
       strlen(text)::BIGINT AS n_bytes,
       CAST(strlen(text) % 640 + 1 AS INT) AS width,
       CAST((strlen(text) * 7) % 480 + 1 AS INT) AS height,
       CAST(strlen(text) % 16 + 1 AS INT) AS n_frames
FROM documents
"""


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: map-only Arrow pass; fake keeps payload, rewrites
    metadata (a real impl would transform the bytes)."""
    schema = T.StructType(df.schema.fields + [
        T.StructField("resized_width", T.IntegerType()),
        T.StructField("resized_height", T.IntegerType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["resized_width"] = width
            pdf["resized_height"] = height
            yield pdf

    return df.mapInPandas(kernel, schema)


def frame_sample_stub(df: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: one output row per
    sampled frame index (fake: indices derived from payload length)."""
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_payload": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(payload) % 16 + 1
                for i in range(0, n_frames, every_n):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_payload"].append(bytes(payload[i:i + 8]))
            yield pd.DataFrame(out)

    return df.mapInPandas(kernel, schema)
