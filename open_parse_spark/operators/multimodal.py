"""Multimodal (image/audio/video) column operators.

Media travel as opaque ``binary`` columns with typed metadata structs; all
processing is Arrow-batched ``mapInPandas`` — the Spark-side plumbing
(schemas, batch shapes, partitioning) is real and tested.  The actual codec
work is STUBBED behind ``decode_media``: the image/audio libraries are not in
this container, so the default decoder is a deterministic fake (and raises
``NotImplementedError`` for codecs it cannot fake); swap in a PIL/ffmpeg
decoder on a real cluster — the operator shapes do not change.

Scale notes: media bytes dominate row size, so these operators are map-only
(no shuffle) and rely on the same scan-split sizing as the parse pipeline;
feature vectors are small fixed-width arrays, safe to shuffle downstream.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, List

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), False),
        StructField("data", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sha", StringType(), False),
        StructField("feature", ArrayType(FloatType()), False),
        StructField("decode_ok", BooleanType(), False),
    ]
)

FEATURE_DIM = 16


def decode_media(data: bytes, mime: str):
    """STUB decode step.  A real deployment plugs PIL / torchaudio / ffmpeg
    here (executor-side, imported once per worker).  The deterministic fake
    returns the raw bytes for the mimes it 'supports' so downstream feature
    extraction is exercisable; anything else is explicitly unimplemented."""
    if mime in ("image/png", "image/jpeg", "audio/wav", "video/mp4"):
        return data
    raise NotImplementedError(f"no decoder available for {mime} in this environment")


def _feature_vector(data: bytes) -> List[float]:
    """Deterministic stand-in feature: bytes -> sha256 -> 16 floats in
    [0, 1).  Replaces the model embedding on a real cluster."""
    h = hashlib.sha256(data or b"").digest()
    return [
        int.from_bytes(h[2 * i : 2 * i + 2], "big") / 65536.0
        for i in range(FEATURE_DIM)
    ]


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = {
            k: []
            for k in ("media_id", "kind", "n_bytes", "sha", "feature", "decode_ok")
        }
        for media_id, kind, mime, data in zip(
            pdf["media_id"], pdf["kind"], pdf["mime"], pdf["data"]
        ):
            raw = bytes(data) if data is not None else b""
            try:
                decoded = decode_media(raw, mime)
                ok = True
            except NotImplementedError:
                # undecodable media: counted-and-carried, never silently
                # dropped (lineage must account for every input row)
                decoded, ok = b"", False
            rows["media_id"].append(int(media_id))
            rows["kind"].append(kind)
            rows["n_bytes"].append(len(raw))
            rows["sha"].append(hashlib.sha256(raw).hexdigest())
            rows["feature"].append(_feature_vector(decoded) if ok else [])
            rows["decode_ok"].append(ok)
        yield pd.DataFrame(rows)


def extract_media_features(media: DataFrame) -> DataFrame:
    """binary media rows -> fixed-width feature rows (map-only)."""
    return media.select(
        "media_id", "kind", "mime", "data"
    ).mapInPandas(_extract_features, schema=FEATURE_SCHEMA)


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: emits (media_id, frame_ts_ms)
    rows JVM-side via sequence+explode; the frame *decode* itself would run
    in a follow-up mapInPandas with a real codec."""
    vids = media.where(F.col("kind") == "video").where(
        F.col("duration_ms").isNotNull()
    )
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from the documents table (no
    binary columns exist in the testdata): text bytes stand in for payloads,
    metadata derived from doc_id."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    mime = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
        .otherwise(F.lit("video/mp4"))
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        mime.alias("mime"),
        F.encode(F.col("text"), "utf-8").cast("binary").alias("data"),
        F.when(F.col("doc_id") % 3 == 0, (F.col("doc_id") % 640 + 16).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("width"),
        F.when(F.col("doc_id") % 3 == 0, (F.col("doc_id") % 480 + 16).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("height"),
        F.when(F.col("doc_id") % 3 == 2, (F.col("doc_id") % 10000 + 1000).cast("int"))
        .otherwise(F.lit(None).cast("int"))
        .alias("duration_ms"),
    )
