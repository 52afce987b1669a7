"""Multimodal (image/audio/video) column plumbing.

Media travel as opaque `binary` columns with a typed metadata struct —
the lakehouse-standard layout (one row per asset; bytes inline for
small assets, or a URI for large ones). All Spark-side plumbing here
(schemas, partitioning, mapInPandas batch shapes, Arrow transfer) is
real and tested. Codec work is two-tier:

- `real=False` (default): a DETERMINISTIC FAKE decode
  (pseudo-dimensions + checksum-derived features) so the pipeline
  shape — schema in, schema out, batch iteration — is fully
  exercised end-to-end and oracle-replayable (DuckDB sha256/md5).
- `real=True`: a working codec path that ALWAYS executes. Images and
  resize prefer PIL when importable; where PIL is absent they fall
  back to the pure-stdlib PNG codec in `png_lite` (same pattern as
  sources/netcdf_lite for ERA5), so real PNG bytes are decoded,
  resized, and re-encoded end-to-end even in a bare container —
  non-PNG/undecodable bytes map to the documented zero row. Audio
  decodes WAV containers with the stdlib `wave` module — no external
  dependency either; swap in librosa/ffmpeg for compressed formats
  on a real cluster.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from temp_data_pipeline_spark.llm import png_lite

# Ship png_lite BY VALUE inside the pickled closures: executors' Python
# workers must not need this package on their import path (the other
# codec closures keep themselves stdlib-only for the same reason).
try:  # cloudpickle >= 2.0 (vendored by pyspark)
    from pyspark import cloudpickle as _cloudpickle

    _cloudpickle.register_pickle_by_value(png_lite)
except Exception:  # pragma: no cover - older vendored cloudpickle
    pass
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
    out_cols = [f.name for f in IMAGE_FEATURES_SCHEMA.fields]
    nf = n_features

    if real:
        try:
            from PIL import Image  # noqa: F401 - driver-side gate only

            _has_pil = True
        except ImportError:
            _has_pil = False

        if not _has_pil:
            # pure-stdlib fallback: decode REAL PNG bytes with png_lite
            # (shipped by value into the closure — workers need no
            # package import). Same contract as the PIL branch:
            # undecodable/non-PNG bytes yield the zero row.
            _decode, _to_gray, _resize = (
                png_lite.decode, png_lite.to_gray, png_lite.resize_nearest,
            )

            def decode_batches_lite(
                batches: Iterator[pd.DataFrame],
            ) -> Iterator[pd.DataFrame]:
                import hashlib as _hl

                import pandas as _pd

                for pdf in batches:
                    rows = []
                    for aid, content in zip(pdf["asset_id"], pdf["content"]):
                        raw = bytes(content) if content is not None else b""
                        try:
                            w, h, ch, px = _decode(raw)
                            # n_features-bucket mean-intensity profile of
                            # a 16x16 grayscale thumbnail, mirroring the
                            # PIL branch's feature math
                            thumb = _resize(_to_gray(px, w, h, ch), w, h, 1, 16, 16)
                            step = max(len(thumb) // nf, 1)
                            feats = [
                                (
                                    sum(chunk) / (255.0 * len(chunk))
                                    if (chunk := thumb[i * step : (i + 1) * step])
                                    else 0.0
                                )
                                for i in range(nf)
                            ]
                        except Exception:  # undecodable bytes -> null-ish row
                            w = h = 0
                            feats = [0.0] * nf
                        rows.append(
                            {
                                "asset_id": aid,
                                "width": w,
                                "height": h,
                                "n_bytes": len(raw),
                                "checksum": _hl.md5(raw).hexdigest(),
                                "features": feats,
                            }
                        )
                    yield _pd.DataFrame(rows, columns=out_cols)

            return media_df.select("asset_id", "content").mapInPandas(
                decode_batches_lite, IMAGE_FEATURES_SCHEMA
            )

        # PIL is the DECODER only; thumbnail + luma run through the
        # same png_lite integer kernels as the stdlib fallback, so
        # identical input bytes yield bit-identical features whether
        # or not PIL is installed (ADVICE r5: PIL's default bicubic
        # resize and its own nearest index mapping both diverge from
        # the fallback). resize-then-gray here vs the fallback's
        # gray-then-resize commute exactly: nearest selection is
        # channel-independent and the BT.601 luma is per-pixel.
        _to_gray, _resize = png_lite.to_gray, png_lite.resize_nearest

        def decode_batches_real(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            import hashlib as _hl
            import io as _io

            import pandas as _pd
            from PIL import Image as _Image

            for pdf in batches:
                rows = []
                for aid, content in zip(pdf["asset_id"], pdf["content"]):
                    raw = bytes(content) if content is not None else b""
                    try:
                        with _Image.open(_io.BytesIO(raw)) as im:
                            w, h = im.size
                            # n_features-bucket mean-intensity profile
                            # of a 16x16 grayscale thumbnail
                            rgb = im.convert("RGB").tobytes()
                        thumb = _to_gray(
                            _resize(rgb, w, h, 3, 16, 16), 16, 16, 3
                        )
                        step = max(len(thumb) // nf, 1)
                        feats = [
                            (
                                sum(chunk) / (255.0 * len(chunk))
                                if (chunk := thumb[i * step : (i + 1) * step])
                                else 0.0
                            )
                            for i in range(nf)
                        ]
                    except Exception:  # undecodable bytes -> null-ish row
                        w = h = 0
                        feats = [0.0] * nf
                    rows.append(
                        {
                            "asset_id": aid,
                            "width": w,
                            "height": h,
                            "n_bytes": len(raw),
                            "checksum": _hl.md5(raw).hexdigest(),
                            "features": feats,
                        }
                    )
                yield _pd.DataFrame(rows, columns=out_cols)

        return media_df.select("asset_id", "content").mapInPandas(
            decode_batches_real, IMAGE_FEATURES_SCHEMA
        )

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
    (asset_id, content, duration_ms).

    ``real=True`` decodes WAV containers with the stdlib ``wave``
    module (no external libs needed, so this path executes and is
    tested in this container): duration from frames/framerate, and
    per-segment RMS energy as the feature vector. Non-WAV bytes fall
    back to a zero row. Swap in librosa/ffmpeg for compressed formats
    on a real cluster. ``real=False`` is the digest-derived stub."""
    out_cols = [f.name for f in AUDIO_FEATURES_SCHEMA.fields]
    nf = n_features

    if real:

        def decode_batches_real(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            import hashlib as _hl
            import io as _io
            import wave as _wave

            import numpy as _np
            import pandas as _pd

            for pdf in batches:
                rows = []
                for aid, content, _dur in zip(
                    pdf["asset_id"], pdf["content"], pdf["duration_ms"]
                ):
                    raw = bytes(content) if content is not None else b""
                    dur_ms, feats = 0, [0.0] * nf
                    try:
                        with _wave.open(_io.BytesIO(raw)) as w:
                            n, rate = w.getnframes(), w.getframerate()
                            width = w.getsampwidth()
                            dur_ms = int(n * 1000 / rate) if rate else 0
                            if width == 2 and n:
                                pcm = _np.frombuffer(
                                    w.readframes(n), dtype="<i2"
                                ).astype(_np.float64) / 32768.0
                                segs = _np.array_split(pcm, nf)
                                feats = [
                                    float(_np.sqrt((s * s).mean())) if len(s) else 0.0
                                    for s in segs
                                ]
                    except Exception:  # non-WAV bytes -> zero row
                        pass
                    rows.append(
                        {
                            "asset_id": aid,
                            "duration_ms": dur_ms,
                            "n_bytes": len(raw),
                            "checksum": _hl.md5(raw).hexdigest(),
                            "features": feats,
                        }
                    )
                yield _pd.DataFrame(rows, columns=out_cols)

        return media_df.filter(F.col("modality") == "audio").select(
            "asset_id", "content", "duration_ms"
        ).mapInPandas(decode_batches_real, AUDIO_FEATURES_SCHEMA)

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
    spec = resize_spec(
        media_df.filter(F.col("modality") == "image"), max_side=max_side
    )
    out_schema = MEDIA_SCHEMA

    if real:
        try:
            from PIL import Image  # noqa: F401 - driver-side gate only

            _has_pil = True
        except ImportError:
            _has_pil = False

        if not _has_pil:
            # pure-stdlib fallback: decode → nearest-neighbor resample →
            # re-encode as PNG, all with png_lite (shipped by value).
            # Undecodable bytes become empty content, like the PIL branch.
            _decode, _resize, _encode = (
                png_lite.decode, png_lite.resize_nearest, png_lite.encode,
            )

            def resize_batches_lite(
                batches: Iterator[pd.DataFrame],
            ) -> Iterator[pd.DataFrame]:
                import pandas as _pd

                for pdf in batches:
                    rows = []
                    for rec in pdf.to_dict("records"):
                        raw = (
                            bytes(rec["content"])
                            if rec["content"] is not None
                            else b""
                        )
                        tw, th = rec["target_width"], rec["target_height"]
                        try:
                            w, h, ch, px = _decode(raw)
                            tw_, th_ = max(tw, 1), max(th, 1)
                            content = _encode(
                                tw_, th_, ch, _resize(px, w, h, ch, tw_, th_)
                            )
                        except Exception:
                            content = b""
                        rows.append(
                            {
                                "asset_id": rec["asset_id"],
                                "modality": rec["modality"],
                                "mime_type": "image/png",
                                "content": content,
                                "uri": rec["uri"],
                                "width": tw,
                                "height": th,
                                "duration_ms": rec["duration_ms"],
                            }
                        )
                    yield _pd.DataFrame(
                        rows, columns=[f.name for f in out_schema.fields]
                    )

            return spec.mapInPandas(resize_batches_lite, out_schema)

        def resize_batches_real(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            import io as _io

            import pandas as _pd
            from PIL import Image as _Image

            for pdf in batches:
                rows = []
                for rec in pdf.to_dict("records"):
                    raw = bytes(rec["content"]) if rec["content"] is not None else b""
                    tw, th = rec["target_width"], rec["target_height"]
                    try:
                        with _Image.open(_io.BytesIO(raw)) as im:
                            buf = _io.BytesIO()
                            im.resize((max(tw, 1), max(th, 1))).save(
                                buf, format="PNG"
                            )
                            content = buf.getvalue()
                    except Exception:
                        content = b""
                    rows.append(
                        {
                            "asset_id": rec["asset_id"],
                            "modality": rec["modality"],
                            "mime_type": "image/png",
                            "content": content,
                            "uri": rec["uri"],
                            "width": tw,
                            "height": th,
                            "duration_ms": rec["duration_ms"],
                        }
                    )
                yield _pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

        return spec.mapInPandas(resize_batches_real, out_schema)

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
