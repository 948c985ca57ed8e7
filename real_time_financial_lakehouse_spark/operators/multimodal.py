"""Multimodal columns: opaque binary payloads + typed metadata (extension).

The lakehouse treatment of image/audio/video at 100 TB: the payload is an
opaque ``binary`` column (parquet keeps it columnar-compressed and NEVER
reads it unless projected), while typed metadata columns (media_type,
width, height, duration, codec) drive partition pruning and filtering so
decode UDFs only touch the rows they must.

Decode/feature-extraction runs as ``mapInPandas``: Arrow-batched, one
Python process per task, payload bytes streamed batch-wise -- the only
sane Python boundary shape at scale (row-at-a-time UDFs would serialize
every payload individually).

The actual image/audio codecs are NOT in this environment, so the decode
step is stubbed: ``decode_payload`` raises NotImplementedError for real
codecs and provides a deterministic byte-level fake ("checksum features")
that keeps every piece of Spark plumbing -- schema, batching, partition
behavior -- real and testable.  Swapping in PIL/librosa later changes one
function body, nothing else.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

if TYPE_CHECKING:
    import pandas as pd

MEDIA_TYPES = ["image", "audio", "video"]

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_sum", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("header_hex", T.StringType()),
    ]
)

def attach_media(documents: DataFrame) -> DataFrame:
    """Build a deterministic media table from the documents fixture:
    payload = utf-8 bytes of the text (a stand-in blob), media_type cycled,
    plausible metadata derived from doc fields."""
    return documents.select(
        F.col("doc_id").alias("asset_id"),
        F.element_at(
            F.array(*[F.lit(m) for m in MEDIA_TYPES]), (F.col("doc_id") % 3 + 1).cast("int")
        ).alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        (F.col("n_chars") % 1920).cast("int").alias("width"),
        (F.col("n_chars") % 1080).cast("int").alias("height"),
        (F.col("n_chars") * 100).cast("long").alias("duration_ms"),
        F.lit("raw").alias("codec"),
    )

def decode_payload(media_type: str, payload: bytes, fake: bool = True) -> dict:
    """Stub decode: real codecs are unavailable in this container.  The
    deterministic fake extracts byte-level features; a real build replaces
    this body with PIL/torchaudio/pyav per media_type."""
    if not fake:
        raise NotImplementedError(
            f"real {media_type} decode requires codec libraries not present in this environment"
        )
    n = len(payload)
    total = sum(payload)
    return {
        "n_bytes": n,
        "byte_sum": total,
        "byte_mean": total / n if n else 0.0,
        "header_hex": payload[:4].hex(),
    }

def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Arrow delivers payload bytes in columnar batches; each batch is
    processed vectorized-ish in Python and emitted with an explicit
    result schema.  Only (asset_id, media_type, payload) are projected
    into Python -- column pruning keeps the rest of the row JVM-side."""

    def process(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            feats = [
                {"asset_id": aid, "media_type": mt, **decode_payload(mt, bytes(pl))}
                for aid, mt, pl in zip(pdf["asset_id"], pdf["media_type"], pdf["payload"])
            ]
            yield pd.DataFrame(feats)

    pruned = media.select("asset_id", "media_type", "payload")
    return pruned.mapInPandas(process, schema=FEATURE_SCHEMA)

def media_feature_summary(documents: DataFrame) -> DataFrame:
    """End-to-end multimodal slice: build media table -> mapInPandas
    feature extraction -> per-type rollup.  Deterministic (byte features
    of deterministic payloads), so the driver's rows-only check is stable
    and pytest asserts exact values."""
    feats = extract_features(attach_media(documents))
    return (
        feats.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum("n_bytes").alias("total_bytes"),
            (F.floor(F.avg("byte_mean") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
                "avg_byte_mean"
            ),
        )
        .orderBy("media_type")
    )
