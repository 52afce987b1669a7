"""Minimal pure-stdlib PNG codec — the executable fallback behind the
multimodal ``real=True`` image path.

Same role as ``sources/netcdf_lite`` plays for ERA5: the optional
heavy library (PIL) is preferred when importable, but the real-codec
branch must EXECUTE end-to-end in a bare container, so actual PNG
bytes are decoded/encoded here with nothing beyond ``struct`` +
``zlib``. Built from the public PNG spec (ISO/IEC 15948 / RFC 2083):
8-byte signature, length-type-data-CRC chunks, zlib-compressed
scanlines with one filter byte per row (None/Sub/Up/Average/Paeth).

Scope: non-interlaced, bit depth 8, color types 0 (gray), 2 (RGB),
4 (gray+alpha), 6 (RGBA) — the shapes PIL and every screenshot tool
emit by default. Anything else raises ValueError, which the Arrow
batch decoder maps to the documented zero-row, exactly like
undecodable bytes under PIL.

This is per-pixel Python and therefore slow relative to PIL's C loops
— acceptable because it only runs when PIL is absent, inside an
Arrow-batched executor task whose unit of work is one asset; at
cluster scale you install PIL and this module never executes.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode(raw: bytes) -> tuple[int, int, int, bytearray]:
    """PNG bytes -> (width, height, channels, row-major sample bytes).

    Applies the full filter set (0..4) so PIL/libpng-produced files —
    which pick filters per row adaptively — round-trip, not just this
    module's own filter-0 output.
    """
    if not raw.startswith(_SIG):
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(raw):
        ln, typ = struct.unpack(">I4s", raw[pos : pos + 8])
        pos += 8
        data = raw[pos : pos + ln]
        pos += ln + 4  # payload + CRC (integrity is zlib's problem below)
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("not a PNG: missing IHDR")
    width, height, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or ctype not in _CHANNELS or interlace:
        raise ValueError(
            f"unsupported PNG shape: depth={depth} color={ctype} "
            f"interlace={interlace}"
        )
    ch = _CHANNELS[ctype]
    rowlen = width * ch
    scan = zlib.decompress(bytes(idat))
    if len(scan) < (rowlen + 1) * height:
        raise ValueError("truncated IDAT")
    out = bytearray(rowlen * height)
    prev = bytearray(rowlen)
    p = 0
    for y in range(height):
        f = scan[p]
        line = bytearray(scan[p + 1 : p + 1 + rowlen])
        p += rowlen + 1
        if f == 1:  # Sub
            for i in range(ch, rowlen):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(rowlen):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(rowlen):
                a = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(rowlen):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif f != 0:
            raise ValueError(f"bad filter byte {f}")
        out[y * rowlen : (y + 1) * rowlen] = line
        prev = line
    return width, height, ch, out


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode(width: int, height: int, channels: int, pixels) -> bytes:
    """Row-major samples -> spec-valid PNG (filter 0 rows, one IDAT)."""
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    rowlen = width * channels
    scan = bytearray()
    for y in range(height):
        scan.append(0)
        scan += pixels[y * rowlen : (y + 1) * rowlen]
    return (
        _SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(bytes(scan), 6))
        + _chunk(b"IEND", b"")
    )


def resize_nearest(pixels, width: int, height: int, channels: int,
                   tw: int, th: int) -> bytearray:
    """Nearest-neighbor resample (deterministic, no float math)."""
    out = bytearray(tw * th * channels)
    for ty in range(th):
        sy = min(ty * height // th, height - 1)
        ro = sy * width * channels
        to = ty * tw * channels
        for tx in range(tw):
            sx = min(tx * width // tw, width - 1)
            out[to + tx * channels : to + (tx + 1) * channels] = pixels[
                ro + sx * channels : ro + (sx + 1) * channels
            ]
    return out


def to_gray(pixels, width: int, height: int, channels: int) -> bytearray:
    """ITU-R BT.601 integer luma — the same (299R+587G+114B)/1000
    weights PIL's convert('L') uses. Alpha is ignored."""
    if channels == 1:
        return bytearray(pixels)
    if channels == 2:  # gray+alpha
        return bytearray(pixels[0::2])
    out = bytearray(width * height)
    for i in range(width * height):
        base = i * channels
        out[i] = (
            pixels[base] * 299 + pixels[base + 1] * 587 + pixels[base + 2] * 114
        ) // 1000
    return out
