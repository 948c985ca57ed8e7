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

# ---------------------------------------------------------------------------
# Real PNG codec (pure stdlib: zlib + struct).  One genuinely real decode
# path so a user with actual image columns exercises true parsing --
# signature, chunk walk, IHDR, zlib inflate, per-scanline unfiltering --
# not a byte-stat fake.  JPEG/audio/video still require external codec
# libraries and keep the explicit NotImplementedError stub.
# ---------------------------------------------------------------------------

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color_type -> samples per pixel (8-bit depth, non-interlaced)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def encode_png(width: int, height: int, pixels: bytes, color_type: int = 0) -> bytes:
    """Minimal REAL PNG encoder (8-bit, non-interlaced): IHDR + one
    zlib-deflated IDAT with filter-0 scanlines + IEND, all CRCs genuine.
    ``pixels`` must hold width*height*channels bytes, row-major.  Exists
    so tests and fixtures can round-trip actual PNGs through
    ``decode_png`` without any external imaging library."""
    import struct
    import zlib

    channels = _PNG_CHANNELS[color_type]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(f"need {stride * height} pixel bytes, got {len(pixels)}")

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + tag
            + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> dict:
    """Real PNG decode, stdlib-only: validate the signature, walk chunks,
    parse IHDR, inflate the concatenated IDAT stream with zlib, and undo
    the per-scanline filters (None/Sub/Up/Average/Paeth -- the full PNG
    filter set).  Supports 8-bit-depth non-interlaced gray / gray+alpha /
    RGB / RGBA, i.e. what a standard encoder emits for raster data.
    Returns true decoded geometry and pixel statistics:
    width, height, color_type, channels, n_pixels, mean_value (mean over
    every decoded sample byte), pixel_crc (crc32 of the reconstructed
    raster -- an exact-content fingerprint)."""
    import struct
    import zlib

    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length  # length + tag + body-crc
    if ihdr is None:
        raise ValueError("not a PNG: missing IHDR")
    width, height, bit_depth, color_type, _comp, _filt, interlace = ihdr
    if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"unsupported PNG variant (depth={bit_depth}, color={color_type}, "
            f"interlace={interlace})"
        )
    channels = _PNG_CHANNELS[color_type]
    stride = width * channels
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("corrupt PNG: wrong decompressed length")
    recon = bytearray(stride * height)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        off = y * stride
        for x in range(stride):
            a = recon[off + x - channels] if x >= channels else 0          # left
            b = recon[off + x - stride] if y > 0 else 0                    # up
            c = recon[off + x - stride - channels] if (y > 0 and x >= channels) else 0
            v = line[x]
            if f == 0:
                r = v
            elif f == 1:
                r = v + a
            elif f == 2:
                r = v + b
            elif f == 3:
                r = v + (a + b) // 2
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                r = v + pred
            else:
                raise ValueError(f"corrupt PNG: filter {f}")
            recon[off + x] = r & 0xFF
    n_samples = stride * height
    sample_sum = sum(recon)
    return {
        "width": width,
        "height": height,
        "color_type": color_type,
        "channels": channels,
        "n_pixels": width * height,
        "sample_sum": sample_sum,
        "mean_value": (sample_sum / n_samples) if n_samples else 0.0,
        "pixel_crc": zlib.crc32(bytes(recon)) & 0xFFFFFFFF,
    }


def decode_payload(media_type: str, payload: bytes, fake: bool = True) -> dict:
    """Decode dispatch: payloads carrying a real PNG signature go through
    the real stdlib decoder (``decode_png``); other formats are stubbed --
    the deterministic fake extracts byte-level features, and ``fake=False``
    raises for codecs genuinely absent from this container (JPEG, audio,
    video).  A real build replaces only those bodies with
    PIL/torchaudio/pyav per media_type."""
    if payload[:8] == PNG_SIGNATURE:
        # real decode: byte stats over the DECODED raster, not the
        # compressed container bytes
        d = decode_png(payload)
        return {
            "n_bytes": len(payload),
            "byte_sum": d["sample_sum"],
            "byte_mean": d["mean_value"],
            "header_hex": payload[:4].hex(),
        }
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

PNG_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("mean_value", T.DoubleType()),
        T.StructField("pixel_crc", T.LongType()),
    ]
)


def attach_png_media(documents: DataFrame) -> DataFrame:
    """Build a media table of REAL PNG images from the documents fixture:
    each doc's utf-8 text bytes are tiled into a (n_chars%13+1) x
    (n_chars%7+1) grayscale raster and encoded as an actual PNG (real
    IHDR/IDAT/IEND, real CRCs, real deflate).  mapInPandas because PNG
    encoding is inherently Python-side here; Arrow-batched, only
    (doc_id, text) projected into the worker."""

    def process(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                data = (txt or "").encode("utf-8")
                w = len(data) % 13 + 1
                h = len(data) % 7 + 1
                budget = w * h
                tiled = (data * (budget // max(1, len(data)) + 1))[:budget] if data else b"\x00" * budget
                rows.append({"asset_id": did, "payload": encode_png(w, h, tiled)})
            yield pd.DataFrame(rows, columns=["asset_id", "payload"])

    return documents.select("doc_id", "text").mapInPandas(
        process, schema="asset_id long, payload binary"
    )


def png_features(media: DataFrame) -> DataFrame:
    """Real-decoder feature extraction: every payload goes through
    ``decode_png`` (signature check, chunk walk, inflate, unfilter) and
    emits true decoded geometry + pixel statistics.  Same Python-boundary
    discipline as extract_features: mapInPandas, Arrow batches, only
    (asset_id, payload) projected."""

    def process(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for aid, pl in zip(pdf["asset_id"], pdf["payload"]):
                d = decode_png(bytes(pl))
                rows.append(
                    {
                        "asset_id": aid,
                        "width": d["width"],
                        "height": d["height"],
                        "channels": d["channels"],
                        "n_pixels": d["n_pixels"],
                        "mean_value": d["mean_value"],
                        "pixel_crc": d["pixel_crc"],
                    }
                )
            out = pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "width", "height", "channels",
                    "n_pixels", "mean_value", "pixel_crc",
                ],
            )
            for c in ("width", "height", "channels"):
                out[c] = out[c].astype("int32")
            yield out

    return media.select("asset_id", "payload").mapInPandas(
        process, schema=PNG_FEATURE_SCHEMA
    )


def png_media_features(documents: DataFrame) -> DataFrame:
    """End-to-end REAL image pipeline: encode fixture docs as actual PNGs,
    decode them with the real stdlib decoder, round the mean for stable
    comparison, order by asset.  Deterministic end to end (deflate level
    fixed, CRC exact), so the driver's rows-only check is stable and
    pytest pins exact decoded values."""
    feats = png_features(attach_png_media(documents))
    return feats.select(
        "asset_id",
        "width",
        "height",
        "channels",
        "n_pixels",
        (F.floor(F.col("mean_value") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)).alias(
            "mean_value"
        ),
        "pixel_crc",
    ).orderBy("asset_id")


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
