"""Minimal stdlib PNG codec (SURVEY.md §2 C5 — real-decode middle tier).

PIL/libpng are not installable in this image (pip/apt blocked —
SCALE.md), which left C5's "real decode" branch unexecutable anywhere.
PNG itself is a small public format (RFC 2083 / W3C PNG spec): chunked
container + zlib-compressed, per-scanline-filtered raster. For the
8-bit non-interlaced images the multimodal fixtures use, a complete
decoder is ~100 lines of ``zlib`` + ``struct`` — so the decode path can
be REAL in this container, not a stub.

Scope (asserted, not silently wrong):
- 8-bit samples, non-interlaced only (interlace 0).
- Color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA).
- All five scanline filters (None/Sub/Up/Average/Paeth) — required by
  the spec for any conformant decoder; encoders choose per line.

The encoder writes filter-0 grayscale; the decoder is tested against
every filter type via hand-filtered fixtures
(tests/test_operators_props.py::test_png_codec_roundtrip_and_filters).
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode_gray(width: int, height: int, pixels: bytes) -> bytes:
    """Encode an 8-bit grayscale image (row-major ``pixels``) as PNG.

    Filter type 0 (None) per scanline — valid output for any decoder;
    compression level 6 via zlib.
    """
    if len(pixels) != width * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, want {width * height}"
        )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_decode(data: bytes) -> tuple[int, int, int, bytearray]:
    """Decode a PNG → (width, height, channels, raster bytes).

    Raster is row-major, ``channels`` samples per pixel, de-filtered.
    Raises ValueError on anything outside the supported scope (16-bit,
    palette, interlaced) rather than guessing.
    """
    if data[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = channels = -1
    bpp = 0  # bytes per pixel
    idat = bytearray()
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        crc = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])[0]
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth} (only 8)")
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported color type {ctype}")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            channels = _CHANNELS[ctype]
            bpp = channels  # 8-bit samples -> channels bytes per pixel
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width < 0:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * bpp
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"raster is {len(raw)} bytes, want {height * (stride + 1)}"
        )
    out = bytearray(height * stride)
    prev_start = -1  # start of the previous reconstructed row in `out`
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)]
        row_start = y * stride
        if ftype == 0:  # None
            out[row_start : row_start + stride] = line
        elif ftype == 1:  # Sub
            for x in range(stride):
                left = out[row_start + x - bpp] if x >= bpp else 0
                out[row_start + x] = (line[x] + left) & 0xFF
        elif ftype == 2:  # Up
            for x in range(stride):
                up = out[prev_start + x] if y else 0
                out[row_start + x] = (line[x] + up) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = out[row_start + x - bpp] if x >= bpp else 0
                up = out[prev_start + x] if y else 0
                out[row_start + x] = (line[x] + (left + up) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = out[row_start + x - bpp] if x >= bpp else 0
                up = out[prev_start + x] if y else 0
                ul = out[prev_start + x - bpp] if (y and x >= bpp) else 0
                out[row_start + x] = (line[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype} on row {y}")
        prev_start = row_start
    return width, height, channels, out
