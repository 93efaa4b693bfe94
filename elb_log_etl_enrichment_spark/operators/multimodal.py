"""Multimodal column plumbing (BASELINE.json north-star tier).

Media assets ride through the engine as opaque ``binary`` payload
columns plus a typed metadata struct — the schema/partitioning layer
is real and tested, and since round 4 so are three zero-dependency
codec rungs with formula oracles (each a real wire-format
encoder/decoder written against the public spec, not a library
binding):

* **PNG** (``png_codec.py``, RFC 2083): all five scanline filters,
  zlib via stdlib — drives ``multimodal_pixel_roundtrip_stats`` and
  the resize rung (``multimodal_image_resize_stats``);
* **WAV** (``wav_codec.py``, RIFF/PCM-16): drives the roundtrip and
  framed audio-feature rungs (``multimodal_audio_frame_features``);
* **Y4M** (``y4m_codec.py``, YUV4MPEG2): demux + frame sampling +
  frame-SAD motion features (``multimodal_video_*``).

These pure-Python codecs are the CORRECTNESS rung — they prove the
Spark-side plumbing (schema, partitioning, mapInPandas batch shape,
metadata pruning) on real bytes. Production-rate decode remains the
env-gated library path: ``decode_media`` with ``real=True`` raises
``NotImplementedError`` at the point where Pillow/ffmpeg would be
invoked (neither exists in this container), and the default
deterministic fake derives metadata purely from the payload bytes so
the UDF signatures and downstream aggregations exercise end-to-end
even without the codec rungs.

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
            # JPEG allows any number of 0xFF FILL bytes before the
            # marker byte (code-review r05: treating a fill byte as
            # the marker desynced the walk — the real marker byte was
            # read as the length's high byte, skipping garbage)
            while i + 9 <= len(payload) and payload[i + 1] == 0xFF:
                i += 1
            marker = payload[i + 1]
            if marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
                h = int.from_bytes(payload[i + 5 : i + 7], "big")
                w = int.from_bytes(payload[i + 7 : i + 9], "big")
                return ("jpeg", w, h)
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                # standalone markers (TEM, RSTn) carry NO length field
                i += 2
                continue
            if marker == 0xD9:  # EOI: no SOF found
                break
            seg_len = int.from_bytes(payload[i + 2 : i + 4], "big")
            if seg_len < 2:  # malformed length would loop forever
                break
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


def synthetic_y4m_frame_sample_stats(
    ids: DataFrame,
    n_frames: int = 8,
    side: int = 16,
    every_n: int = 2,
) -> DataFrame:
    """Video rung, completing the real-decode trio: per id an
    ``n_frames``-frame C444 Y4M clip is generated from the formula
    ``Y(id,f,r,c) = (id·11 + f·29 + r·17 + c·13) mod 256`` (U, V
    shifted by 85/170), encoded as an actual YUV4MPEG2 stream, and
    REALLY demuxed back — frame boundaries come from parsing marker
    bytes and plane strides, not from trusting the generator. Every
    ``every_n``-th frame is sampled (the frame-sampling operator a
    video pipeline needs) and per-channel means over the sampled
    frames come from the DECODED planes. Sampled plane volume is
    (n_frames/every_n)·side² = a power of two, so the means are exact
    doubles and the oracle recomputes them from the formula."""
    from .y4m_codec import decode_y4m, encode_y4m

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id in pdf["media_id"]:
                mid = int(media_id)
                frames = []
                for f in range(n_frames):
                    base = [
                        (mid * 11 + f * 29 + r * 17 + c * 13) % 256
                        for r in range(side)
                        for c in range(side)
                    ]
                    frames.append(
                        (
                            bytes(base),
                            bytes((v + 85) % 256 for v in base),
                            bytes((v + 170) % 256 for v in base),
                        )
                    )
                w, h, decoded = decode_y4m(encode_y4m(frames, side, side))
                sampled = decoded[::every_n]
                n_px = len(sampled) * w * h
                sums = [0, 0, 0]
                for y, u, v in sampled:
                    sums[0] += sum(y)
                    sums[1] += sum(u)
                    sums[2] += sum(v)
                rows.append(
                    (
                        mid,
                        len(decoded),
                        len(sampled),
                        sums[0] / n_px,
                        sums[1] / n_px,
                        sums[2] / n_px,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_frames",
                    "n_sampled",
                    "mean_y",
                    "mean_u",
                    "mean_v",
                ],
            )

    return ids.mapInPandas(
        batches,
        schema=(
            "media_id long, n_frames long, n_sampled long, "
            "mean_y double, mean_u double, mean_v double"
        ),
    )


def synthetic_png_resize_stats(
    ids: DataFrame, side: int = 16, factor: int = 2
) -> DataFrame:
    """REAL image resize on REALLY decoded pixels: the feature-extract
    sibling of ``synthetic_png_roundtrip_stats``. Per id the same
    formula tile round-trips through actual PNG bytes, then a
    ``factor``×``factor`` box downsample runs over the DECODED samples
    (each output sample is the floor mean of its source block — the
    integer box filter every thumbnail pipeline starts from), the
    RESIZED image round-trips through PNG a second time, and
    per-channel means come from that second decode. The oracle
    recomputes the block floor-means straight from the formula, so a
    bug in either decode, the stride walk, or the box arithmetic
    breaks the hash. Output means are integer sums over (side/factor)²
    = a power of two: exact doubles in both engines."""
    from .png_codec import decode_png, encode_png

    out_side = side // factor
    n_out = out_side * out_side

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
                resized = [
                    [
                        [
                            sum(
                                rows[r * factor + dr][
                                    (c * factor + dc) * ch + k
                                ]
                                for dr in range(factor)
                                for dc in range(factor)
                            )
                            // (factor * factor)
                            for k in range(ch)
                        ]
                        for c in range(out_side)
                    ]
                    for r in range(out_side)
                ]
                rw, rh, rch, rrows = decode_png(
                    encode_png(resized, color_type=2, filter_mode="cycle")
                )
                sums = [0, 0, 0]
                for row in rrows:
                    for i, b in enumerate(row):
                        sums[i % rch] += b
                out_rows.append(
                    (
                        mid,
                        w,
                        rw,
                        rh,
                        sums[0] / n_out,
                        sums[1] / n_out,
                        sums[2] / n_out,
                    )
                )
            yield pd.DataFrame(
                out_rows,
                columns=[
                    "media_id",
                    "src_side",
                    "out_width",
                    "out_height",
                    "mean_r",
                    "mean_g",
                    "mean_b",
                ],
            )

    return ids.mapInPandas(
        batches,
        schema=(
            "media_id long, src_side long, out_width long, "
            "out_height long, mean_r double, mean_g double, mean_b double"
        ),
    )


def synthetic_wav_frame_features(
    ids: DataFrame,
    n_samples: int = 2048,
    frame_len: int = 256,
    sample_rate: int = 16_000,
) -> DataFrame:
    """REAL audio feature extraction on REALLY decoded samples:
    framing — the first stage of every audio DSP chain (energy, ZCR,
    MFCC all start from it) — over the RIFF round-trip. Per id the
    formula waveform ``s(id, i) = ((id·37 + i·5 + (i·i·31) mod 997)
    mod 2048) − 1024`` (a quadratic term so frame energies genuinely
    differ) round-trips through actual WAV bytes, the DECODED stream
    is split into ``n_samples/frame_len`` frames, and per-frame
    energy (Σ s², an exact integer) + in-frame zero crossings are
    reduced to: the peak-energy frame index (ties → lowest index),
    its energy, total energy, and total in-frame zero crossings. All
    outputs are integers, so the oracle — which re-frames the formula
    with window functions, never touching WAV — must match
    bit-for-bit."""
    from .wav_codec import decode_wav, encode_wav

    n_frames = n_samples // frame_len
    if n_frames < 1:
        # a frame longer than the waveform yields zero frames and
        # max()/index() over an empty list would kill the whole job
        # inside mapInPandas (code-review r05) — fail at plan time
        raise ValueError(
            f"frame_len={frame_len} exceeds n_samples={n_samples}: "
            "no full frame exists"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id in pdf["media_id"]:
                mid = int(media_id)
                samples = [
                    ((mid * 37 + i * 5 + (i * i * 31) % 997) % 2048) - 1024
                    for i in range(n_samples)
                ]
                _sr, _ch, decoded = decode_wav(
                    encode_wav(samples, sample_rate=sample_rate)
                )
                energies = []
                zcs = []
                for f in range(n_frames):
                    frame = decoded[f * frame_len : (f + 1) * frame_len]
                    energies.append(sum(v * v for v in frame))
                    zcs.append(
                        sum(
                            1
                            for a, b in zip(frame, frame[1:])
                            if a * b < 0
                        )
                    )
                peak = energies.index(max(energies))
                rows.append(
                    (
                        mid,
                        n_frames,
                        peak,
                        energies[peak],
                        sum(energies),
                        sum(zcs),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_frames",
                    "peak_frame",
                    "peak_energy",
                    "total_energy",
                    "total_zero_crossings",
                ],
            )

    return ids.mapInPandas(
        batches,
        schema=(
            "media_id long, n_frames long, peak_frame long, "
            "peak_energy long, total_energy long, total_zero_crossings long"
        ),
    )


def synthetic_y4m_motion_stats(
    ids: DataFrame, n_frames: int = 8, side: int = 16
) -> DataFrame:
    """REAL video temporal analysis on REALLY demuxed frames: the
    scene-change / motion-estimation primitive (sum of absolute
    luma differences between consecutive frames) over the Y4M
    round-trip. The luma formula ``Y(id,f,r,c) = (id·11 + f²·29 +
    r·17 + c·13) mod 256`` carries a quadratic frame term so
    inter-frame deltas genuinely vary; chroma planes are constant
    128 (motion is a luma statistic). After encode→demux, per
    consecutive pair the SAD (Σ|ΔY|, an exact integer) is computed
    from the DECODED Y planes, reduced to total SAD, the peak
    transition index (frame f whose delta from f−1 is largest, ties
    → lowest f), and the peak SAD. All-integer outputs: the oracle
    re-derives them from the formula with window functions and never
    touches Y4M."""
    from .y4m_codec import decode_y4m, encode_y4m

    if n_frames < 2:
        # motion is defined over consecutive PAIRS; one frame has no
        # transition and max() over the empty SAD list would kill the
        # job inside mapInPandas (code-review r05) — fail at plan time
        raise ValueError(
            f"n_frames={n_frames}: motion stats need at least 2 frames"
        )
    plane = side * side

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for media_id in pdf["media_id"]:
                mid = int(media_id)
                frames = []
                for f in range(n_frames):
                    y = bytes(
                        (mid * 11 + f * f * 29 + r * 17 + c * 13) % 256
                        for r in range(side)
                        for c in range(side)
                    )
                    grey = bytes([128]) * plane
                    frames.append((y, grey, grey))
                _w, _h, decoded = decode_y4m(
                    encode_y4m(frames, side, side)
                )
                sads = [
                    sum(
                        abs(a - b)
                        for a, b in zip(decoded[f][0], decoded[f - 1][0])
                    )
                    for f in range(1, len(decoded))
                ]
                peak = sads.index(max(sads))
                rows.append(
                    (
                        mid,
                        len(decoded),
                        sum(sads),
                        peak + 1,
                        sads[peak],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "n_frames",
                    "total_sad",
                    "peak_transition",
                    "peak_sad",
                ],
            )

    return ids.mapInPandas(
        batches,
        schema=(
            "media_id long, n_frames long, total_sad long, "
            "peak_transition long, peak_sad long"
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
