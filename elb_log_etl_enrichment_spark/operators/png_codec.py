"""Minimal pure-stdlib PNG codec (round 4).

The multimodal tier's decode ladder was: deterministic fake →
header sniff → Pillow (environment-gated). This module adds a REAL
pixel-level rung with zero dependencies beyond ``zlib``/``struct``:
a complete encoder/decoder for the PNG subset that matters for
synthetic fixtures and audits — bit depth 8, color types 0
(grayscale), 2 (RGB) and 6 (RGBA), no interlace, ALL five scanline
filters (None/Sub/Up/Average/Paeth, implemented from the public PNG
specification, RFC 2083). The encoder can cycle filter types across
scanlines so a round-trip exercises every inverse-filter branch.

Scale/role note: this is a CORRECTNESS rung, not a throughput rung —
the inverse filters run byte-at-a-time in Python, which is fine for
the small fixture images the engine audits with (a 16×16 RGB tile is
~800 filter steps) and for validating payload plumbing end-to-end;
production-volume decode belongs to Pillow/ffmpeg on the executors
(``decode_media(real=True)``). What this rung buys is an
oracle-checkable decode: when pixel content derives from a formula,
DuckDB can compute the expected statistics straight from the formula
while Spark round-trips actual PNG bytes through this codec — the
only way to hash-verify a codec path in a container with no media
libraries.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(
    pixels: list[list[list[int]]] | "object",
    color_type: int = 2,
    filter_mode: str = "cycle",
) -> bytes:
    """Encode ``pixels`` (height × width × channels, values 0-255;
    nested lists or a numpy array) as a PNG. ``filter_mode``:
    ``"none"`` writes filter 0 everywhere; ``"cycle"`` writes filter
    ``row % 5`` so decoders must implement every inverse filter."""
    try:  # accept numpy without requiring it
        import numpy as np

        if isinstance(pixels, np.ndarray):
            pixels = pixels.tolist()
    except ImportError:  # pragma: no cover
        pass
    h = len(pixels)
    w = len(pixels[0])
    ch = _CHANNELS[color_type]
    raw_rows = [
        bytes(int(v) & 0xFF for px in row for v in (px if ch > 1 else [px[0]]))
        for row in pixels
    ]
    stride = w * ch
    out = bytearray()
    prev = bytes(stride)
    for r, raw in enumerate(raw_rows):
        f = 0 if filter_mode == "none" else r % 5
        out.append(f)
        if f == 0:
            out += raw
        elif f == 1:  # Sub
            out += bytes(
                (raw[i] - (raw[i - ch] if i >= ch else 0)) & 0xFF
                for i in range(stride)
            )
        elif f == 2:  # Up
            out += bytes((raw[i] - prev[i]) & 0xFF for i in range(stride))
        elif f == 3:  # Average
            out += bytes(
                (raw[i] - (((raw[i - ch] if i >= ch else 0) + prev[i]) >> 1))
                & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            out += bytes(
                (
                    raw[i]
                    - _paeth(
                        raw[i - ch] if i >= ch else 0,
                        prev[i],
                        prev[i - ch] if i >= ch else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        prev = raw
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """Decode a PNG in the supported subset. Returns
    ``(width, height, channels, rows)`` with ``rows`` a list of
    ``height`` byte strings of ``width * channels`` unfiltered
    samples. Raises ``ValueError`` on signatures/layouts outside the
    subset (interlace, palette, 16-bit) — loud, never wrong."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG")
    pos, w = 8, None
    h = bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("missing IHDR")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace != 0:
        raise ValueError(
            f"unsupported PNG layout: depth={bit_depth} "
            f"color={color_type} interlace={interlace}"
        )
    ch = _CHANNELS[color_type]
    stride = w * ch
    stream = zlib.decompress(bytes(idat))
    if len(stream) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    rows: list[bytes] = []
    prev = bytes(stride)
    for r in range(h):
        base = r * (stride + 1)
        f = stream[base]
        raw = bytearray(stream[base + 1 : base + 1 + stride])
        if f == 1:  # Sub
            for i in range(ch, stride):
                raw[i] = (raw[i] + raw[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                raw[i] = (raw[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                a = raw[i - ch] if i >= ch else 0
                raw[i] = (raw[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                a = raw[i - ch] if i >= ch else 0
                c = prev[i - ch] if i >= ch else 0
                raw[i] = (raw[i] + _paeth(a, prev[i], c)) & 0xFF
        elif f != 0:
            raise ValueError(f"bad filter byte {f}")
        row = bytes(raw)
        rows.append(row)
        prev = row
    return (w, h, ch, rows)
