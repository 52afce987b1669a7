"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque `binary` columns with a typed metadata struct —
the lakehouse-standard layout (one row per asset; bytes inline for
small assets, or a URI for large ones). All Spark-side plumbing here
(schemas, partitioning, mapInPandas batch shapes, Arrow transfer) is
real and tested; the actual codec work is STUBBED because no
image/audio libraries exist in this container:

- `decode_image` raises NotImplementedError when `real=True`;
- with `real=False` (default) it produces a DETERMINISTIC FAKE
  decode (pseudo-dimensions + checksum-derived features) so the
  pipeline shape — schema in, schema out, batch iteration — is fully
  exercised end-to-end.

Swap `_fake_decode` for PIL/ffmpeg calls on a real cluster; nothing
else changes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), nullable=False),
        StructField("modality", StringType(), nullable=False),  # image|audio|video
        StructField("mime_type", StringType(), nullable=True),
        StructField("content", BinaryType(), nullable=True),  # inline bytes
        StructField("uri", StringType(), nullable=True),  # or external pointer
        StructField("width", IntegerType(), nullable=True),
        StructField("height", IntegerType(), nullable=True),
        StructField("duration_ms", LongType(), nullable=True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def _fake_decode(content: bytes, n_features: int = 8):
    """Deterministic stand-in for a real image decode: dimensions and
    features derived from the content digest. REPLACE with PIL on a
    real cluster."""
    digest = hashlib.sha256(content or b"").digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    feats = [digest[2 + i] / 255.0 for i in range(n_features)]
    return width, height, feats


def extract_image_features(
    media_df: DataFrame, n_features: int = 8, real: bool = False
) -> DataFrame:
    """Decode + feature-extract via mapInPandas (Arrow batches).

    The UDF sees pandas batches of (asset_id, content); output schema
    is fixed — exactly the plumbing a real decoder needs. Partitioning
    is preserved; no shuffle.
    """
    if real:
        raise NotImplementedError(
            "Real image decoding requires PIL/opencv, not available in this "
            "container. Call with real=False for the deterministic stub."
        )

    out_cols = [f.name for f in IMAGE_FEATURES_SCHEMA.fields]
    nf = n_features

    # Self-contained closure: only stdlib/pandas imports inside, no
    # references to this module — executors' Python workers must not
    # need temp_data_pipeline_spark on their import path.
    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import pandas as _pd

        for pdf in batches:
            rows = []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                raw = bytes(content) if content is not None else b""
                digest = _hl.sha256(raw).digest()
                rows.append(
                    {
                        "asset_id": aid,
                        "width": 64 + digest[0] % 192,
                        "height": 64 + digest[1] % 192,
                        "n_bytes": len(raw),
                        "checksum": _hl.md5(raw).hexdigest(),
                        "features": [digest[2 + i] / 255.0 for i in range(nf)],
                    }
                )
            yield _pd.DataFrame(rows, columns=out_cols)

    return media_df.select("asset_id", "content").mapInPandas(
        decode_batches, IMAGE_FEATURES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("duration_ms", LongType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def extract_audio_features(media_df: DataFrame, n_features: int = 8, real: bool = False) -> DataFrame:
    """Audio counterpart of extract_image_features: mapInPandas over
    (asset_id, content, duration_ms); decode stubbed (no audio libs in
    this container), plumbing real. Swap the digest-derived features
    for librosa/ffmpeg on a real cluster."""
    if real:
        raise NotImplementedError(
            "Real audio decoding requires librosa/ffmpeg, not available in "
            "this container. Call with real=False for the deterministic stub."
        )
    out_cols = [f.name for f in AUDIO_FEATURES_SCHEMA.fields]
    nf = n_features

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import pandas as _pd

        for pdf in batches:
            rows = []
            for aid, content, dur in zip(
                pdf["asset_id"], pdf["content"], pdf["duration_ms"]
            ):
                raw = bytes(content) if content is not None else b""
                digest = _hl.sha256(raw).digest()
                rows.append(
                    {
                        "asset_id": aid,
                        "duration_ms": int(dur) if dur == dur and dur is not None else 0,
                        "n_bytes": len(raw),
                        "checksum": _hl.md5(raw).hexdigest(),
                        "features": [digest[2 + i] / 255.0 for i in range(nf)],
                    }
                )
            yield _pd.DataFrame(rows, columns=out_cols)

    return media_df.filter(F.col("modality") == "audio").select(
        "asset_id", "content", "duration_ms"
    ).mapInPandas(decode_batches, AUDIO_FEATURES_SCHEMA)


def frame_sample_plan(
    media_df: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video frame-sampling plan: one output row per (asset, frame_ts).

    Pure relational expansion (sequence + explode) — the expensive
    per-frame decode then runs under extract_image_features on the
    exploded rows. duration-less assets yield zero rows.
    """
    return (
        media_df.filter(F.col("modality") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("asset_id", "frame_ts_ms", "content")
    )


def resize_spec(media_df: DataFrame, max_side: int = 512) -> DataFrame:
    """Compute target dimensions preserving aspect ratio — the
    relational half of a resize op (the pixel work is the decoder's)."""
    w, h = F.col("width").cast("double"), F.col("height").cast("double")
    scale = F.least(F.lit(float(max_side)) / F.greatest(w, h), F.lit(1.0))
    return media_df.withColumn(
        "target_width", F.ceil(w * scale).cast("int")
    ).withColumn("target_height", F.ceil(h * scale).cast("int"))


def resize_images(
    media_df: DataFrame, max_side: int = 512, real: bool = False
) -> DataFrame:
    """Execute the resize: resize_spec for target dims, then a
    mapInPandas pass that rewrites the binary content. Output keeps
    MEDIA_SCHEMA shape with width/height set to the targets.

    With real=False the pixel work is the documented deterministic
    stand-in (content → sha256(content ‖ "WxH") digest bytes) so the
    full pipeline — dims math, Arrow binary round-trip, schema-
    preserving batch iteration — executes in this container; swap the
    closure body for PIL's Image.resize on a real cluster."""
    if real:
        raise NotImplementedError(
            "Real image resizing requires PIL/opencv, not available in "
            "this container. Call with real=False for the deterministic stub."
        )

    spec = resize_spec(
        media_df.filter(F.col("modality") == "image"), max_side=max_side
    )
    out_schema = MEDIA_SCHEMA

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import pandas as _pd

        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                raw = bytes(rec["content"]) if rec["content"] is not None else b""
                tw, th = rec["target_width"], rec["target_height"]
                digest = _hl.sha256(
                    raw + f"{tw}x{th}".encode()
                ).digest()
                rows.append(
                    {
                        "asset_id": rec["asset_id"],
                        "modality": rec["modality"],
                        "mime_type": rec["mime_type"],
                        "content": digest,
                        "uri": rec["uri"],
                        "width": tw,
                        "height": th,
                        "duration_ms": rec["duration_ms"],
                    }
                )
            yield _pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return spec.mapInPandas(resize_batches, out_schema)
