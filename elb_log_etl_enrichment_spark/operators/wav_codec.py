"""Minimal pure-stdlib WAV (RIFF/PCM) codec (round 4).

The audio rung of the multimodal decode ladder, sibling of
``png_codec``: a complete encoder/decoder for 16-bit little-endian
PCM WAV (mono or interleaved multi-channel, the canonical RIFF
layout from the public format spec). Zero dependencies beyond
``struct``. Like the PNG rung, its role is an ORACLE-CHECKABLE real
decode: waveforms generated from an integer formula round-trip
through actual RIFF bytes in Spark while DuckDB computes the
expected signal statistics straight from the formula — any header
arithmetic, endianness, or interleave bug breaks the hash.
Production-volume audio belongs to ffmpeg/soundfile on executors;
this rung verifies the payload plumbing without them.
"""

from __future__ import annotations

import struct


def encode_wav(
    samples: list[int], sample_rate: int = 16_000, channels: int = 1
) -> bytes:
    """Encode 16-bit PCM samples (interleaved if multi-channel,
    values in [-32768, 32767]) as a RIFF/WAVE byte string."""
    n = len(samples)
    data = struct.pack(f"<{n}h", *samples)
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """Decode a 16-bit PCM RIFF/WAVE byte string. Returns
    ``(sample_rate, channels, samples)`` (samples interleaved).
    Raises ``ValueError`` outside the subset (compressed formats,
    other bit depths) — loud, never wrong."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    sample_rate = channels = None
    raw = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        if pos + 8 + length > len(data):
            # a chunk whose declared length overruns the buffer is a
            # cut-off transfer: silently decoding the short slice
            # would return wrong stats (code-review r05 finding)
            raise ValueError(f"truncated {tag!r} chunk")
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            audio_fmt, channels, sample_rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV layout: fmt={audio_fmt} bits={bits}"
                )
        elif tag == b"data":
            raw = body
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if sample_rate is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    if len(raw) % 2:
        raise ValueError("odd data chunk length for 16-bit samples")
    samples = list(struct.unpack(f"<{len(raw) // 2}h", raw))
    return (sample_rate, channels, samples)
