"""Multimodal columns: image/audio/video as opaque BINARY + typed
metadata (beyond-reference surface).

Design (the part that matters at 100 TB):

- media travels as a ``binary`` column next to a ``STRUCT`` of typed
  metadata (modality, mime, width/height/duration, sha256) — the struct
  prunes independently of the blob, so metadata-only queries never read
  media bytes (Parquet column pruning);
- decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages — one Python worker per partition, batch-sized
  by ``spark.sql.execution.arrow.maxRecordsPerBatch``, no driver
  involvement;
- UNCOMPRESSED formats decode FOR REAL with stdlib+numpy only (r9):
  8/24/32-bpp BMP (``decode_bmp``) and PCM WAV (``decode_wav``) —
  vectorized frombuffer parses, no codec library needed;
- COMPRESSED codecs (PNG/JPEG/MP3/...) are STUBBED (PIL/opencv/
  soundfile etc. are not in this container — re-probed each round,
  ROADMAP.md): ``decode_image`` raises ``NotImplementedError`` on them
  unless ``fake=True``, in which case a deterministic fake decoder
  (seeded by the blob's sha256) produces stable "pixels" so the
  Spark-side plumbing — schema, partitioning, UDF signature, batch
  shape — is exercised with reproducible outputs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("blob", BinaryType()),
        StructField("modality", StringType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
    ]
)


def attach_media_metadata(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Compute the typed metadata struct JVM-side (no Python): byte
    length + sha256 — the dedup/id key for blobs."""
    b = F.col(blob_col)
    return df.select(
        "*",
        F.length(b).cast("bigint").alias("n_bytes"),
        F.sha2(b, 256).alias("sha256"),
    )


def documents_as_media(df: DataFrame) -> DataFrame:
    """Adapter: treat the documents table's text payload as a binary blob
    (the container has no real media files; byte semantics are identical)."""
    return df.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "utf-8").alias("blob"),
        F.lit("image").alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
    )


FEATURES_SCHEMA = (
    "media_id BIGINT, width INT, height INT, n_channels INT, "
    "mean_intensity DOUBLE, feature STRING"
)


def decode_bmp(blob: bytes) -> dict:
    """REAL image decode for uncompressed BMP (BITMAPINFOHEADER, 8/24/32
    bpp) — stdlib struct + numpy only, no external codec library (r9:
    the container blocks PIL/opencv, but uncompressed rasters don't
    need them). Vectorized: the pixel block is one ``np.frombuffer``
    reshape; per-batch cost is memory-bandwidth, not Python loops.
    Top-down (negative height) and bottom-up files both normalize to
    positive height; row padding (rows align to 4 bytes) is sliced off
    before the intensity mean so padding bytes never skew it."""
    import struct

    import numpy as np

    if len(blob) < 54 or blob[:2] != b"BM":
        raise ValueError("not a BMP blob (missing 'BM' magic)")
    data_offset = struct.unpack_from("<I", blob, 10)[0]
    width, height = struct.unpack_from("<ii", blob, 18)
    bpp = struct.unpack_from("<H", blob, 28)[0]
    compression = struct.unpack_from("<I", blob, 30)[0]
    if compression != 0 or bpp not in (8, 24, 32):
        raise NotImplementedError(
            f"only uncompressed 8/24/32-bpp BMP decodes natively "
            f"(got bpp={bpp}, compression={compression})"
        )
    channels = bpp // 8
    h = abs(height)
    row_bytes = ((bpp * width + 31) // 32) * 4
    need = data_offset + row_bytes * h
    if len(blob) < need:
        raise ValueError(f"truncated BMP: {len(blob)} bytes, need {need}")
    px = np.frombuffer(blob, dtype=np.uint8, offset=data_offset,
                       count=row_bytes * h)
    px = px.reshape(h, row_bytes)[:, : width * channels]
    return {
        "width": width,
        "height": h,
        "n_channels": channels,
        "mean_intensity": float(px.mean()) / 255.0 if px.size else 0.0,
        "feature": hashlib.sha256(px.tobytes()).hexdigest()[:16],
    }


def decode_wav(blob: bytes) -> dict:
    """REAL audio decode for PCM WAV — stdlib ``wave`` + numpy (16/8/32
    bit integer PCM). Returns sample rate, channel count, duration and
    normalized RMS; the feature fingerprint hashes the raw samples."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(blob), "rb") as w:
        nch = w.getnchannels()
        sampwidth = w.getsampwidth()
        rate = w.getframerate()
        nframes = w.getnframes()
        frames = w.readframes(nframes)
    dtypes = {1: np.uint8, 2: np.int16, 4: np.int32}
    if sampwidth not in dtypes:
        raise NotImplementedError(f"unsupported PCM sample width {sampwidth}")
    samples = np.frombuffer(frames, dtype=dtypes[sampwidth]).astype(np.float64)
    if sampwidth == 1:
        samples = samples - 128.0  # 8-bit WAV is unsigned, centred at 128
    full_scale = float(2 ** (8 * sampwidth - 1))
    rms = (
        float(np.sqrt(np.mean((samples / full_scale) ** 2)))
        if samples.size
        else 0.0
    )
    return {
        "sample_rate": rate,
        "n_channels": nch,
        "duration_sec": nframes / rate if rate else 0.0,
        "rms": rms,
        "feature": hashlib.sha256(frames).hexdigest()[:16],
    }


def decode_image(blob: bytes, fake: bool = False) -> dict:
    """Image decode with format sniffing. Uncompressed BMP decodes FOR
    REAL (stdlib+numpy — ``decode_bmp``); compressed codecs (PNG/JPEG)
    need PIL/opencv, which this container blocks (re-probed every
    round, ROADMAP.md), so they raise unless ``fake=True`` — the
    deterministic pseudo-decode seeded by content hash that keeps the
    distributed plumbing testable with reproducible outputs."""
    if not fake:
        if blob[:2] == b"BM":
            return decode_bmp(blob)
        if blob[:2] in (b"P5", b"P6"):
            return decode_ppm(blob)
        raise NotImplementedError(
            "compressed image codecs (PNG/JPEG) require PIL/opencv which "
            "are not available; uncompressed BMP/netpbm decode natively, "
            "or pass fake=True for the deterministic test decoder"
        )
    digest = hashlib.sha256(blob).digest()
    width = 16 + digest[0] % 240
    height = 16 + digest[1] % 240
    channels = 1 + digest[2] % 3
    mean_intensity = digest[3] / 255.0
    return {
        "width": width,
        "height": height,
        "n_channels": channels,
        "mean_intensity": mean_intensity,
        "feature": digest[:8].hex(),
    }


def decode_media(df: DataFrame, fake: bool = True) -> DataFrame:
    """Distributed decode via mapInPandas (Arrow batches; executor-side).

    Each batch arrives as a pandas DataFrame of (media_id, blob); the
    stub decoder emits fixed-schema feature rows. Swapping in a real
    decoder changes only the inner function.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, blob in zip(pdf["media_id"], pdf["blob"]):
                feats = decode_image(bytes(blob), fake=fake)
                out.append({"media_id": media_id, **feats})
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "n_channels",
                    "mean_intensity",
                    "feature",
                ],
            )

    return df.select("media_id", "blob").mapInPandas(decode_batches, FEATURES_SCHEMA)


AUDIO_SCHEMA = (
    "media_id BIGINT, sample_rate INT, n_channels INT, "
    "duration_sec DOUBLE, rms DOUBLE, feature STRING"
)


def decode_audio_media(df: DataFrame) -> DataFrame:
    """Distributed PCM-WAV decode via mapInPandas (same Arrow-batched
    shape as ``decode_media``; the decoder is REAL — stdlib wave +
    numpy, r9)."""

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, blob in zip(pdf["media_id"], pdf["blob"]):
                feats = decode_wav(bytes(blob))
                out.append({"media_id": media_id, **feats})
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "sample_rate",
                    "n_channels",
                    "duration_sec",
                    "rms",
                    "feature",
                ],
            )

    return df.select("media_id", "blob").mapInPandas(decode_batches, AUDIO_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling stub: deterministic 1-in-N selection by
    content-hash bucket (JVM-side modulo on sha256 — no Python)."""
    return df.filter(
        F.conv(F.substring(F.sha2(F.col("blob"), 256), 1, 8), 16, 10).cast("long")
        % every_n
        == 0
    )


# --------------------------------------------------------------------------
# r10: netpbm decode, real nearest-neighbor resize, audio features


def _ppm_header(blob: bytes) -> tuple[int, int, int, int]:
    """Parse a binary netpbm (P5/P6) header → (width, height, channels,
    raster_offset). '#' comments run to end-of-line; a single whitespace
    byte terminates the header before the raster."""
    if blob[:2] not in (b"P5", b"P6"):
        raise ValueError("not a binary netpbm blob (need P5/P6 magic)")
    channels = 3 if blob[:2] == b"P6" else 1
    pos, fields = 2, []
    while len(fields) < 3:
        if pos >= len(blob):
            raise ValueError("truncated netpbm header")
        c = blob[pos : pos + 1]
        if c == b"#":
            nl = blob.find(b"\n", pos)
            pos = len(blob) if nl < 0 else nl + 1
        elif c.isspace():
            pos += 1
        else:
            end = pos
            while end < len(blob) and not blob[end : end + 1].isspace():
                end += 1
            fields.append(int(blob[pos:end]))
            pos = end
    pos += 1  # the single whitespace after maxval
    width, height, maxval = fields
    if maxval > 255:
        raise NotImplementedError(
            f"16-bit netpbm (maxval={maxval}) not supported — 8-bit only"
        )
    need = width * height * channels
    if len(blob) - pos < need:
        raise ValueError(
            f"truncated netpbm raster: {len(blob) - pos} bytes, need {need}"
        )
    return width, height, channels, pos


def decode_ppm(blob: bytes) -> dict:
    """REAL image decode for binary netpbm rasters — P5 (grayscale) and
    P6 (RGB), maxval ≤ 255: pure header parse + one ``np.frombuffer``,
    no codec library. netpbm is the simplest interchange format real
    pipelines meet (ImageMagick/ffmpeg intermediates), and the second
    natively-decodable family next to BMP."""
    import numpy as np

    width, height, channels, pos = _ppm_header(blob)
    px = np.frombuffer(
        blob, dtype=np.uint8, offset=pos, count=width * height * channels
    )
    return {
        "width": width,
        "height": height,
        "n_channels": channels,
        "mean_intensity": float(px.mean()) / 255.0 if px.size else 0.0,
        "feature": hashlib.sha256(px.tobytes()).hexdigest()[:16],
    }


def _raster_pixels(blob: bytes):
    """Decode a natively-supported raster (BMP or netpbm) to a
    top-down ``(h, w, c)`` uint8 ndarray — the shared substrate for
    resize/feature stages."""
    import struct

    import numpy as np

    if blob[:2] == b"BM":
        meta_offset = struct.unpack_from("<I", blob, 10)[0]
        width, height = struct.unpack_from("<ii", blob, 18)
        bpp = struct.unpack_from("<H", blob, 28)[0]
        compression = struct.unpack_from("<I", blob, 30)[0]
        if compression != 0 or bpp not in (8, 24, 32):
            raise NotImplementedError("only uncompressed 8/24/32-bpp BMP")
        ch = bpp // 8
        h = abs(height)
        row_bytes = ((bpp * width + 31) // 32) * 4
        px = np.frombuffer(
            blob, dtype=np.uint8, offset=meta_offset, count=row_bytes * h
        ).reshape(h, row_bytes)[:, : width * ch]
        if height > 0:
            px = px[::-1]  # bottom-up storage → top-down array
        return px.reshape(h, width, ch)
    if blob[:2] in (b"P5", b"P6"):
        w, h, ch, pos = _ppm_header(blob)
        px = np.frombuffer(blob, dtype=np.uint8, offset=pos, count=w * h * ch)
        return px.reshape(h, w, ch)
    raise NotImplementedError("resize supports BMP/netpbm rasters natively")


RESIZE_SCHEMA = (
    "media_id BIGINT, width INT, height INT, n_channels INT, "
    "mean_intensity DOUBLE, feature STRING"
)


def resize_media(df: DataFrame, max_side: int = 64) -> DataFrame:
    """REAL distributed image resize (nearest-neighbor downscale so the
    longest side is ≤ ``max_side``): the training-data normalization
    pass every vision pipeline runs before feature extraction. Pure
    numpy index striding inside Arrow-batched ``mapInPandas`` — the
    resize is a gather, deterministic on every platform (no
    interpolation arithmetic, so no float divergence), and the output
    fingerprint hashes the RESIZED pixels. Upscaling never happens
    (images already within budget pass through with their original
    pixels hashed)."""
    import numpy as np

    def resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, blob in zip(pdf["media_id"], pdf["blob"]):
                px = _raster_pixels(bytes(blob))
                h, w, ch = px.shape
                scale = max(h, w) / max_side
                if scale > 1.0:
                    nh = max(1, int(h / scale))
                    nw = max(1, int(w / scale))
                    # nearest-neighbor: integer source index per target cell
                    rows = (np.arange(nh) * h) // nh
                    cols = (np.arange(nw) * w) // nw
                    px = px[rows][:, cols]
                else:
                    nh, nw = h, w
                out.append(
                    {
                        "media_id": media_id,
                        "width": nw,
                        "height": nh,
                        "n_channels": ch,
                        "mean_intensity": float(px.mean()) / 255.0
                        if px.size
                        else 0.0,
                        "feature": hashlib.sha256(px.tobytes()).hexdigest()[:16],
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "n_channels",
                    "mean_intensity",
                    "feature",
                ],
            )

    return df.select("media_id", "blob").mapInPandas(resize_batches, RESIZE_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "media_id BIGINT, sample_rate INT, n_samples BIGINT, zcr DOUBLE, "
    "peak DOUBLE, rms DOUBLE, n_frames INT, max_frame_rms DOUBLE"
)


def audio_features(df: DataFrame, frame_ms: int = 25) -> DataFrame:
    """REAL audio feature extraction over PCM WAV blobs (the speech-
    pipeline pre-filter tier): zero-crossing rate (voiced/unvoiced and
    noise discriminator), normalized peak (clipping detector), global
    RMS, and framewise RMS max over ``frame_ms`` windows (transient /
    silence detector — a file whose max frame RMS ≈ global RMS is
    steady-state; ≫ means bursts). All vectorized numpy over the
    decoded sample array inside ``mapInPandas``; multi-channel files
    fold channels into the sample stream the way ``decode_wav`` does."""
    import io
    import wave

    import numpy as np

    def feat_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, blob in zip(pdf["media_id"], pdf["blob"]):
                with wave.open(io.BytesIO(bytes(blob)), "rb") as w:
                    sampwidth = w.getsampwidth()
                    rate = w.getframerate()
                    frames = w.readframes(w.getnframes())
                dtypes = {1: np.uint8, 2: np.int16, 4: np.int32}
                if sampwidth not in dtypes:
                    raise NotImplementedError(
                        f"unsupported PCM sample width {sampwidth}"
                    )
                s = np.frombuffer(frames, dtype=dtypes[sampwidth]).astype(
                    np.float64
                )
                if sampwidth == 1:
                    s = s - 128.0
                full = float(2 ** (8 * sampwidth - 1))
                s = s / full
                n = s.size
                zcr = (
                    float(np.mean(np.signbit(s[1:]) != np.signbit(s[:-1])))
                    if n > 1
                    else 0.0
                )
                peak = float(np.max(np.abs(s))) if n else 0.0
                rms = float(np.sqrt(np.mean(s * s))) if n else 0.0
                flen = max(1, int(rate * frame_ms / 1000))
                nfr = n // flen
                if nfr:
                    fr = s[: nfr * flen].reshape(nfr, flen)
                    max_fr = float(np.sqrt((fr * fr).mean(axis=1)).max())
                else:
                    max_fr = rms
                out.append(
                    {
                        "media_id": media_id,
                        "sample_rate": rate,
                        "n_samples": n,
                        "zcr": zcr,
                        "peak": peak,
                        "rms": rms,
                        "n_frames": nfr,
                        "max_frame_rms": max_fr,
                    }
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "sample_rate",
                    "n_samples",
                    "zcr",
                    "peak",
                    "rms",
                    "n_frames",
                    "max_frame_rms",
                ],
            )

    return df.select("media_id", "blob").mapInPandas(
        feat_batches, AUDIO_FEATURES_SCHEMA
    )
