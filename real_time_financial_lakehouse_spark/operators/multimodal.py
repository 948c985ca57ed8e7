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

RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

def resize_payload(payload: bytes, target_w: int, target_h: int, fake: bool = True) -> bytes:
    """Stub resize: a real build decodes, resamples, re-encodes (PIL /
    ffmpeg).  The deterministic fake right-sizes the byte budget to
    target_w*target_h, truncating or tiling -- keeps output size coupled to
    the requested dimensions so partition-size math stays realistic."""
    if not fake:
        raise NotImplementedError("real resize requires codec libraries not in this environment")
    budget = max(1, target_w * target_h)
    if not payload:
        return b"\x00" * budget
    reps = -(-budget // len(payload))
    return (payload * reps)[:budget]

def resize_media(media: DataFrame, target_w: int = 64, target_h: int = 64) -> DataFrame:
    """1-to-1 mapInPandas transform: re-encode every payload at target
    dimensions.  Metadata columns update JVM-side; only the payload
    crosses into Python, Arrow-batched."""

    def process(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "media_type": pdf["media_type"],
                    "width": target_w,
                    "height": target_h,
                    "payload": [
                        resize_payload(bytes(p), target_w, target_h) for p in pdf["payload"]
                    ],
                }
            )
            out["width"] = out["width"].astype("int32")
            out["height"] = out["height"].astype("int32")
            yield out

    return media.select("asset_id", "media_type", "payload").mapInPandas(
        process, schema=RESIZED_SCHEMA
    )

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("offset_ms", T.LongType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)

def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """1-to-N frame sampling for video assets: each video row expands to
    ``n_frames`` evenly-spaced pseudo-frames (mapInPandas emitting more
    rows than it receives -- the flatMap shape).  The stub slices the
    payload evenly; a real build seeks/decodes keyframes.  Non-video rows
    are filtered JVM-side BEFORE the Python boundary so decode only
    touches the rows it must."""

    def process(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for aid, pl, dur in zip(pdf["asset_id"], pdf["payload"], pdf["duration_ms"]):
                payload = bytes(pl)
                step = max(1, len(payload) // n_frames)
                for i in range(n_frames):
                    rows.append(
                        {
                            "asset_id": aid,
                            "frame_idx": i,
                            "offset_ms": int(dur) * i // n_frames,
                            "frame_bytes": payload[i * step : (i + 1) * step],
                        }
                    )
            out = pd.DataFrame(rows, columns=["asset_id", "frame_idx", "offset_ms", "frame_bytes"])
            out["frame_idx"] = out["frame_idx"].astype("int32")
            yield out

    videos = media.filter(F.col("media_type") == "video").select(
        "asset_id", "payload", "duration_ms"
    )
    return videos.mapInPandas(process, schema=FRAME_SCHEMA)

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
