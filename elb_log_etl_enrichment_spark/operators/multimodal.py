"""Multimodal column plumbing (BASELINE.json north-star tier).

Media assets ride through the engine as opaque ``binary`` payload
columns plus a typed metadata struct — the schema/partitioning layer
is real and tested; the actual codec work (image decode, audio
resample, video frame extraction) is STUBBED because no media
libraries exist in this container:

* ``decode_media`` with ``real=True`` raises ``NotImplementedError``
  at the point where Pillow/ffmpeg would be invoked;
* the default deterministic fake derives metadata purely from the
  payload bytes, so the Arrow batch shapes, UDF signatures and
  downstream aggregations are exercised end-to-end.

Scale notes: payloads stay in executor-side Arrow batches
(``mapInPandas``), never on the driver; batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so a partition of
large blobs can't blow Python memory; derived metadata is columnar so
downstream filters/groupBys never touch the payload again (column
pruning drops the binary column at the scan when only metadata is
referenced).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FORMATS = ["png", "jpeg", "webp"]

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_format", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_bytes", LongType()),
    ]
)


def attach_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Wrap a source column as an opaque binary payload (stand-in for
    reading real media blobs from object storage)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def fake_decode(payload: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in for an image decoder: format and
    dimensions derived from the payload bytes."""
    n = len(payload)
    return (FORMATS[n % 3], 64 + n % 256, 64 + (n * 7) % 256)


def sniff_header(payload: bytes) -> tuple[str, int, int] | None:
    """Pure-Python container-header sniff: format + pixel dimensions
    from magic bytes, no codec library. Covers the PNG IHDR and
    baseline-JPEG SOF0/SOF2 layouts (public file-format specs). This
    is the zero-dependency middle tier between the deterministic fake
    and a full Pillow decode — dimension metadata at scan time without
    decompressing a single pixel, which is all the partitioning /
    filtering / resize-planning stages actually need.
    """
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
        w = int.from_bytes(payload[16:20], "big")
        h = int.from_bytes(payload[20:24], "big")
        return ("png", w, h)
    if payload[:2] == b"\xff\xd8":  # JPEG SOI; walk segments to a SOF
        i = 2
        # <=: the SOF dimension bytes may END exactly at the buffer
        # boundary (payload[i+5:i+9] needs i+9 bytes, not i+10)
        while i + 9 <= len(payload):
            if payload[i] != 0xFF:
                break
            marker = payload[i + 1]
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                h = int.from_bytes(payload[i + 5 : i + 7], "big")
                w = int.from_bytes(payload[i + 7 : i + 9], "big")
                return ("jpeg", w, h)
            i += 2 + seg_len
    return None


def _pillow_decode(payload: bytes) -> tuple[str, int, int]:
    """Real codec decode — requires Pillow on the executors."""
    import io

    from PIL import Image  # noqa: PLC0415 — optional dependency

    with Image.open(io.BytesIO(payload)) as img:
        return ((img.format or "unknown").lower(), img.width, img.height)


def decode_media(media: DataFrame, real: bool = False) -> DataFrame:
    """Arrow-batched "decode": payload → typed metadata columns.

    ``real=True`` runs the actual codec (Pillow) and raises
    ``NotImplementedError`` eagerly when the library is missing — the
    boundary is tested both ways (a hand-crafted valid PNG fixture
    behind an importable-Pillow guard, and the raise path when the
    codec is absent). The eager probe runs on the DRIVER, which is
    exact in local mode (one Python env) but only a proxy on a real
    cluster: executors with a different image can still fail at task
    time inside ``mapInPandas`` — ship Pillow in the executor
    environment, don't rely on this probe. ``real=False`` is the
    deterministic fake for plumbing tests.
    """
    if real:
        try:
            import PIL  # noqa: F401, PLC0415 — probe only
        except ImportError as exc:
            raise NotImplementedError(
                "real media decoding requires Pillow, which is not "
                "installed; use sniff_header() for codec-free dimension "
                "metadata or the deterministic fake decoder (real=False)"
            ) from exc

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _pillow_decode if real else fake_decode
        for pdf in batches:
            meta = [decode(p) for p in pdf["payload"]]
            out = pdf[["media_id", "payload"]].copy()
            out["media_format"] = [m[0] for m in meta]
            out["width"] = [m[1] for m in meta]
            out["height"] = [m[2] for m in meta]
            out["n_bytes"] = [len(p) for p in pdf["payload"]]
            yield out

    return media.mapInPandas(decode_batches, schema=MEDIA_SCHEMA)


def sniff_media(media: DataFrame) -> DataFrame:
    """Header-sniff variant of ``decode_media``: real bytes, real
    dimensions, zero codec dependencies (``sniff_header``). Unknown
    containers yield NULL metadata instead of failing the batch."""

    def sniff_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = [sniff_header(p) for p in pdf["payload"]]
            out = pdf[["media_id", "payload"]].copy()
            out["media_format"] = [m[0] if m else None for m in meta]
            out["width"] = [m[1] if m else None for m in meta]
            out["height"] = [m[2] if m else None for m in meta]
            out["n_bytes"] = [len(p) for p in pdf["payload"]]
            yield out

    return media.mapInPandas(sniff_batches, schema=MEDIA_SCHEMA)


def resize_stub(decoded: DataFrame, max_side: int = 128) -> DataFrame:
    """Resize planning: computes target dims columnar-side (the real
    pixel work would be another mapInPandas over the payload)."""
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")),
    )
    return decoded.withColumns(
        {
            "target_width": F.floor(F.col("width") * scale).cast("long"),
            "target_height": F.floor(F.col("height") * scale).cast("long"),
        }
    )


def synthetic_png_roundtrip_stats(ids: DataFrame, side: int = 16) -> DataFrame:
    """REAL pixel-level decode with zero codec dependencies: per id,
    generate a ``side``×``side`` RGB tile from the integer formula
    ``v(id, r, c, k) = (id·31 + r·17 + c·13 + k·7) mod 256``, encode
    it as an actual PNG (cycling all five scanline filters), decode
    the bytes back through the stdlib codec, and report per-channel
    means FROM THE DECODED SAMPLES. Because the pixel content is a
    pure formula, an independent engine can compute the expected
    means without touching PNG at all — which is what turns a codec
    path into an oracle-checkable query in a container with no media
    libraries. Means are sums of 8-bit ints divided by side² (a power
    of two), so they are exact doubles in every engine.

    Arrow/mapInPandas shape identical to the other decode rungs: the
    payload exists only inside the executor-side batch, and only the
    tiny metadata row leaves it."""
    from .png_codec import decode_png, encode_png

    n_px = side * side

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_rows = []
            for media_id in pdf["media_id"]:
                mid = int(media_id)
                px = [
                    [
                        [
                            (mid * 31 + r * 17 + c * 13 + k * 7) % 256
                            for k in range(3)
                        ]
                        for c in range(side)
                    ]
                    for r in range(side)
                ]
                w, h, ch, rows = decode_png(
                    encode_png(px, color_type=2, filter_mode="cycle")
                )
                sums = [0, 0, 0]
                for row in rows:
                    for i, b in enumerate(row):
                        sums[i % ch] += b
                out_rows.append(
                    (
                        mid,
                        w,
                        h,
                        sums[0] / n_px,
                        sums[1] / n_px,
                        sums[2] / n_px,
                    )
                )
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "mean_r",
                    "mean_g",
                    "mean_b",
                ],
            )

    return ids.mapInPandas(
        batches,
        schema=(
            "media_id long, width long, height long, "
            "mean_r double, mean_g double, mean_b double"
        ),
    )


def synthetic_wav_roundtrip_stats(
    ids: DataFrame, n_samples: int = 1024, sample_rate: int = 16_000
) -> DataFrame:
    """Audio sibling of ``synthetic_png_roundtrip_stats``: per id, a
    16-bit PCM waveform from the integer formula
    ``s(id, i) = ((id·37 + i·73) mod 2048) − 1024`` round-trips
    through ACTUAL RIFF/WAVE bytes (stdlib codec), and the signal
    statistics — mean, RMS, zero crossings — come from the DECODED
    samples. The oracle recomputes them from the formula: header
    arithmetic, endianness, or interleave bugs break the hash. Mean
    and mean-square are integer sums over a power-of-two count (exact
    doubles); sqrt is correctly rounded IEEE in both engines."""
    import math

    from .wav_codec import decode_wav, encode_wav

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id in pdf["media_id"]:
                mid = int(media_id)
                samples = [
                    ((mid * 37 + i * 73) % 2048) - 1024
                    for i in range(n_samples)
                ]
                sr, ch, decoded = decode_wav(
                    encode_wav(samples, sample_rate=sample_rate)
                )
                mean = sum(decoded) / len(decoded)
                rms = math.sqrt(
                    sum(v * v for v in decoded) / len(decoded)
                )
                zc = sum(
                    1
                    for a, b in zip(decoded, decoded[1:])
                    if a * b < 0
                )
                rows.append((mid, len(decoded), sr, mean, rms, zc))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_samples",
                    "sample_rate",
                    "mean_amp",
                    "rms",
                    "zero_crossings",
                ],
            )

    return ids.mapInPandas(
        batches,
        schema=(
            "media_id long, n_samples long, sample_rate long, "
            "mean_amp double, rms double, zero_crossings long"
        ),
    )


def frame_sample_stub(decoded: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-style frame sampling plumbing: explode a deterministic
    frame index per asset (real path would demux the payload)."""
    n_frames = (F.col("n_bytes") % 30 + 1).cast("int")
    return decoded.select(
        "media_id",
        "media_format",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).filter(F.col("frame_idx") % every_n == 0)
