"""Minimal pure-stdlib Y4M (YUV4MPEG2) codec (round 4).

The video rung of the multimodal decode ladder, completing the
image (``png_codec``) / audio (``wav_codec``) / video trio with real
bytes and zero dependencies. YUV4MPEG2 is the uncompressed video
interchange format mplayer/ffmpeg speak: an ASCII stream header
(``YUV4MPEG2 W.. H.. F..`` + parameters), then per frame an ASCII
``FRAME`` marker followed by raw Y, U, V planes. This module
implements the C444 (full-resolution chroma) 8-bit subset — enough
for REAL demuxing: frame boundaries come from parsing actual marker
bytes and plane strides, so a frame-sampling operator over this
codec exercises the same seek/stride arithmetic a production demuxer
does, and formula-generated content keeps it oracle-checkable.
"""

from __future__ import annotations

_MAGIC = b"YUV4MPEG2"


def encode_y4m(
    frames: list[tuple[bytes, bytes, bytes]], width: int, height: int
) -> bytes:
    """Encode ``frames`` — (Y, U, V) plane byte strings, each
    ``width*height`` long (C444) — as a YUV4MPEG2 stream."""
    plane = width * height
    out = bytearray(
        _MAGIC + f" W{width} H{height} F25:1 Ip A1:1 C444\n".encode()
    )
    for y, u, v in frames:
        if not (len(y) == len(u) == len(v) == plane):
            raise ValueError("bad plane size")
        out += b"FRAME\n" + y + u + v
    return bytes(out)


def decode_y4m(
    data: bytes,
) -> tuple[int, int, list[tuple[bytes, bytes, bytes]]]:
    """Decode a C444 8-bit YUV4MPEG2 stream. Returns
    ``(width, height, frames)``. Raises ``ValueError`` outside the
    subset (other chroma samplings, parameter-less headers)."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(_MAGIC):
        raise ValueError("not a YUV4MPEG2 stream")
    width = height = None
    chroma = "C420jpeg"  # spec default when the C tag is absent
    for tok in data[len(_MAGIC) : nl].split():
        t = tok.decode()
        if t.startswith("W"):
            width = int(t[1:])
        elif t.startswith("H"):
            height = int(t[1:])
        elif t.startswith("C"):
            chroma = t
    if width is None or height is None:
        raise ValueError("missing W/H header parameters")
    if chroma != "C444":
        raise ValueError(f"unsupported chroma sampling: {chroma}")
    plane = width * height
    frames = []
    pos = nl + 1
    while pos < len(data):
        fnl = data.find(b"\n", pos)
        if fnl < 0 or data[pos : pos + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at offset {pos}")
        pos = fnl + 1
        if pos + 3 * plane > len(data):
            raise ValueError("truncated frame")
        frames.append(
            (
                data[pos : pos + plane],
                data[pos + plane : pos + 2 * plane],
                data[pos + 2 * plane : pos + 3 * plane],
            )
        )
        pos += 3 * plane
    return (width, height, frames)
