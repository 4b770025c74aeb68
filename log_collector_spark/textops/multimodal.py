"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata struct;
the expensive per-item work (decode, feature-extract, resize, frame-sample)
runs as Arrow-batched ``mapInPandas`` so the Spark-side plumbing — schema,
partition sizing, batch shape — is exactly what a real decoder would use.

The actual codecs (PIL/ffmpeg/etc.) are NOT in this container, so the decode
kernels are stubbed: :func:`decode_image` raises ``NotImplementedError`` and
the pipeline uses :func:`fake_features`, a deterministic byte-level feature
extractor, to keep everything testable end-to-end (and DuckDB-checkable:
octet_length/md5 over the same bytes).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("payload", T.BinaryType()),    # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("source", T.StringType()),
        T.StructField("declared_w", T.IntegerType()),
        T.StructField("declared_h", T.IntegerType()),
    ])),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("payload_md5", T.StringType()),
    T.StructField("first_byte", T.LongType()),
    T.StructField("byte_sum_mod", T.LongType()),
])


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from documents (payload = UTF-8 bytes of the
    text — a deterministic stand-in for encoded image bytes)."""
    kind = F.element_at(
        F.lit(["image", "audio", "video"]),
        (F.col("doc_id") % 3 + 1).cast("int"))
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.col("source").alias("source"),
            (F.col("doc_id") % 640 + 1).cast("int").alias("declared_w"),
            (F.col("doc_id") % 480 + 1).cast("int").alias("declared_h"),
        ).alias("meta"),
    )


def decode_image(payload: bytes) -> "object":
    """Real image decode — requires PIL/libvips, absent in this container.

    The mapInPandas plumbing around it (fake_features) is real and tested;
    swap this in when the codec libraries are available."""
    raise NotImplementedError(
        "image codecs are not available in this environment; "
        "use fake_features for the deterministic byte-level path")


def _fake_feature_batches(batches: Iterator[pd.DataFrame]
                          ) -> Iterator[pd.DataFrame]:
    """Deterministic byte-level 'decode': length, md5, first byte, byte-sum.

    Shaped exactly like a real decoder stage: one output row per input row,
    vectorized per Arrow batch, no Spark objects touched."""
    import hashlib

    for pdf in batches:
        payloads = pdf["payload"]
        yield pd.DataFrame({
            "media_id": pdf["media_id"],
            "kind": pdf["kind"],
            "n_bytes": payloads.map(len).astype("int64"),
            "payload_md5": payloads.map(
                lambda b: hashlib.md5(bytes(b)).hexdigest()),
            "first_byte": payloads.map(
                lambda b: b[0] if len(b) else -1).astype("int64"),
            "byte_sum_mod": payloads.map(
                lambda b: sum(b) % 997).astype("int64"),
        })


def fake_features(media: DataFrame) -> DataFrame:
    """Feature-extraction stage over the media table (mapInPandas)."""
    return media.select("media_id", "kind", "payload") \
                .mapInPandas(_fake_feature_batches, FEATURE_SCHEMA)


def sql_fake_features(table: str = "documents") -> str:
    """DuckDB oracle over the same synthesized payload bytes (byte arithmetic
    via the hex encoding of the blob — engine-agnostic)."""
    return f"""
        WITH b AS (
            SELECT doc_id, text, hex(encode(text)) AS hx,
                   octet_length(encode(text)) AS n
            FROM {table}
        )
        SELECT doc_id AS media_id,
               CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                    ELSE 'video' END AS kind,
               CAST(n AS BIGINT) AS n_bytes,
               md5(text) AS payload_md5,
               CAST(CASE WHEN n > 0
                    THEN CAST(('0x' || substr(hx, 1, 2)) AS BIGINT)
                    ELSE -1 END AS BIGINT) AS first_byte,
               CAST(CASE WHEN n > 0 THEN list_sum(list_transform(
                        range(1, n + 1),
                        i -> CAST(('0x' || substr(hx, 2*i - 1, 2)) AS BIGINT)))
                    ELSE 0 END % 997 AS BIGINT) AS byte_sum_mod
        FROM b
    """
