"""Pure-stdlib PNG codec (llm/png_lite.py): round-trips, the full
filter set, resize, luma — the executable real-codec fallback behind
multimodal real=True when PIL is absent."""

from __future__ import annotations

import struct
import zlib

import pytest

from temp_data_pipeline_spark.llm import png_lite


def _pixels(w, h, ch, seed=1):
    return bytes((i * seed * 31 + 7) % 256 for i in range(w * h * ch))


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_roundtrip_all_color_types(ch):
    w, h = 5, 3
    px = _pixels(w, h, ch)
    raw = png_lite.encode(w, h, ch, px)
    w2, h2, ch2, px2 = png_lite.decode(raw)
    assert (w2, h2, ch2) == (w, h, ch)
    assert bytes(px2) == px


def _filter_row(ftype, line, prev, ch):
    """Forward-apply a PNG filter (the encoder side) so decode() can be
    exercised on filters 1-4, which our own encoder never emits."""
    out = bytearray([ftype])
    for i in range(len(line)):
        a = line[i - ch] if i >= ch else 0
        b = prev[i]
        c = prev[i - ch] if i >= ch else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) >> 1
        else:  # Paeth
            pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out.append((line[i] - pred) & 0xFF)
    return out


def _chunk(typ, data):
    return (
        struct.pack(">I", len(data)) + typ + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_decode_every_filter_type(ftype):
    # hand-build a PNG whose every row uses the given filter — decode
    # must invert it exactly (libpng/PIL pick filters adaptively, so a
    # decoder that only handles filter 0 silently corrupts real files)
    w, h, ch = 4, 3, 3
    px = _pixels(w, h, ch, seed=3)
    rowlen = w * ch
    scan = bytearray()
    prev = bytearray(rowlen)
    for y in range(h):
        line = px[y * rowlen : (y + 1) * rowlen]
        scan += _filter_row(ftype, line, prev, ch)
        prev = bytearray(line)
    raw = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(bytes(scan)))
        + _chunk(b"IEND", b"")
    )
    w2, h2, ch2, px2 = png_lite.decode(raw)
    assert (w2, h2, ch2) == (w, h, ch)
    assert bytes(px2) == px


def test_decode_rejects_junk_and_unsupported():
    with pytest.raises(ValueError, match="signature"):
        png_lite.decode(b"not a png at all")
    # 16-bit depth is out of scope -> loud error, not silent garbage
    raw = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00\x00\x00\x00"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported"):
        png_lite.decode(raw)


def test_resize_nearest_downsamples_and_upsamples():
    # 2x2 RGB quadrants -> 4x4 nearest keeps each quadrant solid
    px = bytes([255, 0, 0,  0, 255, 0,
                0, 0, 255,  9, 9, 9])
    up = png_lite.resize_nearest(px, 2, 2, 3, 4, 4)
    assert bytes(up[0:3]) == bytes([255, 0, 0])
    assert bytes(up[9:12]) == bytes([0, 255, 0])
    assert bytes(up[4 * 3 * 3 + 9 : 4 * 3 * 3 + 12]) == bytes([9, 9, 9])
    down = png_lite.resize_nearest(up, 4, 4, 3, 2, 2)
    assert bytes(down) == px


def test_to_gray_bt601_weights():
    # pure-channel pixels map to the integer BT.601 weights
    px = bytes([255, 0, 0,  0, 255, 0,  0, 0, 255,  255, 255, 255])
    g = png_lite.to_gray(px, 4, 1, 3)
    assert list(g) == [255 * 299 // 1000, 255 * 587 // 1000,
                       255 * 114 // 1000, 255]
    # gray & gray+alpha passthrough
    assert list(png_lite.to_gray(bytes([7, 8]), 2, 1, 1)) == [7, 8]
    assert list(png_lite.to_gray(bytes([7, 255, 8, 0]), 2, 1, 2)) == [7, 8]


def test_roundtrip_fuzz():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        w=st.integers(1, 12),
        h=st.integers(1, 12),
        ch=st.sampled_from([1, 2, 3, 4]),
        data=st.data(),
    )
    def run(w, h, ch, data):
        px = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255),
                    min_size=w * h * ch,
                    max_size=w * h * ch,
                )
            )
        )
        w2, h2, ch2, px2 = png_lite.decode(png_lite.encode(w, h, ch, px))
        assert (w2, h2, ch2) == (w, h, ch)
        assert bytes(px2) == px

    run()


def test_pil_branch_features_match_fallback(spark):
    """When PIL is installed, extract_image_features(real=True) must
    produce bit-identical features to the png_lite fallback pipeline —
    PIL is the decoder only; thumbnail + luma go through the same
    integer kernels (ADVICE r5: bicubic resize / PIL luma made the
    features environment-dependent). Skips where PIL is absent, like
    the xgboost/xarray gates."""
    import random

    import pytest

    pytest.importorskip("PIL")

    from temp_data_pipeline_spark.llm.multimodal import extract_image_features

    rng = random.Random(7)
    rows = []
    for aid in range(4):
        w, h = rng.randint(3, 21), rng.randint(3, 21)
        ch = rng.choice([1, 2, 3, 4])
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        rows.append((aid, bytearray(png_lite.encode(w, h, ch, px))))
    df = spark.createDataFrame(rows, "asset_id long, content binary")
    got = {
        r["asset_id"]: (r["width"], r["height"], list(r["features"]))
        for r in extract_image_features(df, real=True).collect()
    }
    # reference: the pure png_lite pipeline, computed inline
    for aid, content in rows:
        w, h, ch, px = png_lite.decode(bytes(content))
        thumb = png_lite.resize_nearest(
            png_lite.to_gray(px, w, h, ch), w, h, 1, 16, 16
        )
        step = max(len(thumb) // 8, 1)
        feats = [
            (sum(c) / (255.0 * len(c)) if (c := thumb[i * step:(i + 1) * step]) else 0.0)
            for i in range(8)
        ]
        assert got[aid] == (w, h, feats)
