"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery is real and tested — schema, partition-friendly
``mapInPandas`` batch shape, Arrow transfer of binary columns, typed
metadata structs.  The codec layer: **PNG decode is REAL** (stdlib
``zlib`` inflate + per-filter scanline reconstruction + numpy luma — no
image libraries needed), **baseline JPEG decode is REAL**
(operators/jpeg.py — Huffman + dequant + IDCT + chroma upsample, stdlib
struct + numpy; progressive raises), and **WAV decode is REAL** (stdlib
``struct`` RIFF chunk walk + numpy PCM/float normalization);
compressed-audio/video decode would need ffmpeg (absent in this
container) and raise ``NotImplementedError`` unless ``fake=True``
routes them through the deterministic fake decoder.

At 100 TB the pattern holds: binaries stay columnar (parquet binary +
Arrow), decode happens executor-side in Arrow batches, and metadata-only
queries never touch the payload bytes (column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# decoded-feature schema produced by decode_image_batches
IMAGE_FEATURES_DDL = (
    "asset_id bigint, media_type string, n_bytes int, "
    "width int, height int, mean_luma double"
)


def with_media_metadata(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Cheap metadata derivable without decoding: size + magic-byte type.

    Pure JVM expressions — a metadata-only query prunes the payload column
    entirely at the parquet scan."""
    b = F.col(bin_col)
    magic = F.hex(F.substring(b, 1, 4))
    return df.withColumn("n_bytes", F.length(b)).withColumn(
        "media_type",
        F.when(magic.startswith("FFD8"), "jpeg")
        .when(magic.startswith("89504E47"), "png")
        .when(magic.startswith("52494646"), "wav")
        .otherwise("unknown"),
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (8-bit, non-interlaced support)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(data: bytes) -> "np.ndarray":
    """Pure stdlib+numpy PNG decode → ``(height, width, channels)`` uint8.

    Full inverse of the PNG scanline pipeline (RFC 2083): chunk walk →
    concatenated-IDAT zlib inflate → per-row unfilter (None/Sub/Up/
    Average/Paeth).  Supports the dominant web shapes: bit depth 8,
    grayscale / gray+alpha / RGB / RGBA, non-interlaced.  Up is
    vectorized across the row; Sub/Average/Paeth are sequential by
    definition (each pixel depends on the reconstructed left neighbor),
    so they loop per pixel — fine for a feature-extraction codec where
    the surrounding mapInPandas batching is the scale lever."""
    if data[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    import struct
    import zlib

    pos, ihdr, idat = len(_PNG_SIG), None, []
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    width, height, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG shape unsupported by the stdlib codec: depth={depth} "
            f"color_type={color} interlace={interlace} (8-bit non-interlaced "
            "gray/GA/RGB/RGBA only)"
        )
    ch = _PNG_CHANNELS[color]
    stride = width * ch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1)
        if f == 0:  # None
            rec = line.copy()
        elif f == 2:  # Up
            rec = line + prev
        else:
            rec = line.astype(np.int32)
            up = prev.astype(np.int32)
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0  # reconstructed left
                b = int(up[x])
                if f == 1:  # Sub
                    rec[x] = (rec[x] + a) & 0xFF
                elif f == 3:  # Average
                    rec[x] = (rec[x] + (a + b) // 2) & 0xFF
                elif f == 4:  # Paeth
                    c = int(up[x - ch]) if x >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    rec[x] = (rec[x] + pred) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter byte {f}")
            rec = rec.astype(np.uint8)
        out[y] = rec
        prev = rec
    return out.reshape(height, width, ch)


def _png_features(payload: bytes) -> tuple[int, int, float]:
    """(width, height, mean_luma∈[0,1]) from a real PNG decode — Rec.601
    luma over RGB; the gray channel directly for grayscale; alpha
    ignored (feature extraction, not compositing)."""
    px = decode_png(payload).astype(np.float64)
    h, w, ch = px.shape
    if ch >= 3:
        luma = px[:, :, 0] * 0.299 + px[:, :, 1] * 0.587 + px[:, :, 2] * 0.114
    else:
        luma = px[:, :, 0]
    return w, h, round(float(luma.mean()) / 255.0, 4)


def _jpeg_features(payload: bytes) -> tuple[int, int, float]:
    """(width, height, mean_luma∈[0,1]) from a real baseline-JPEG decode
    (operators/jpeg.py — stdlib struct + numpy Huffman/IDCT)."""
    from rocket_etl_spark.operators.jpeg import decode_jpeg

    px = decode_jpeg(payload).astype(np.float64)
    if px.ndim == 3:
        h, w, _ = px.shape
        luma = px[:, :, 0] * 0.299 + px[:, :, 1] * 0.587 + px[:, :, 2] * 0.114
    else:
        h, w = px.shape
        luma = px
    return w, h, round(float(luma.mean()) / 255.0, 4)


def _fake_decode(payload: bytes) -> tuple[int, int, float]:
    """Deterministic stand-in for a real codec: pretends the byte length
    encodes dimensions and brightness."""
    n = len(payload)
    return (n % 640) + 1, (n % 480) + 1, round((sum(payload[:64]) % 256) / 255.0, 4)


def decode_image_batches(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "asset_id",
    fake: bool = False,
) -> DataFrame:
    """Decode/feature-extract via ``mapInPandas`` (Arrow-batched binary).

    PNG payloads decode for REAL (``decode_png`` — stdlib zlib + filter
    reconstruction, executor-side).  Other formats need PIL/ffmpeg
    (absent here) and raise ``NotImplementedError``; ``fake=True``
    routes EVERY payload through the deterministic fake decoder instead,
    exercising the identical plumbing (schema, batching, partitioning).
    """

    out_cols = [f.split()[0] for f in IMAGE_FEATURES_DDL.split(", ")]

    def decode_one(p: bytes) -> tuple[int, int, float]:
        if fake:
            return _fake_decode(p)
        if not p:
            # NULL/empty payload: a zero feature row, never a dead executor
            # (one bad row must not kill a corpus-scale decode pass — same
            # convention as similarity._pad_row / ivf_assign)
            return 0, 0, 0.0
        if p[: len(_PNG_SIG)] == _PNG_SIG:
            return _png_features(p)
        if p[:2] == b"\xff\xd8":
            return _jpeg_features(p)
        raise NotImplementedError(
            "non-PNG/JPEG image decode requires PIL/ffmpeg (not in this "
            "container); pass fake=True for the deterministic test decoder"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # vectorized batch shape: one Series.map over the payload column
            # (a batch-API codec would drop in here the same way — the
            # whole batch stays a columnar frame end to end, never
            # per-row iterrows)
            payloads = pdf[bin_col].map(lambda p: bytes(p) if p is not None else b"")
            decoded = payloads.map(decode_one)
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].to_numpy(),
                    "media_type": (
                        pdf["media_type"].to_numpy()
                        if "media_type" in pdf.columns
                        else "unknown"
                    ),
                    "n_bytes": payloads.map(len).to_numpy(),
                    "width": decoded.map(lambda t: t[0]).to_numpy(),
                    "height": decoded.map(lambda t: t[1]).to_numpy(),
                    "mean_luma": decoded.map(lambda t: t[2]).to_numpy(),
                },
                columns=out_cols,
            )

    cols = [id_col, bin_col] + (["media_type"] if "media_type" in df.columns else [])
    return df.select(*cols).mapInPandas(run, IMAGE_FEATURES_DDL)


# decoded-feature schema produced by decode_audio_batches
AUDIO_FEATURES_DDL = (
    "asset_id bigint, media_type string, n_bytes int, "
    "sample_rate int, n_channels int, bit_depth int, n_frames bigint, "
    "duration_s double, mean_abs_amp double, peak_amp double"
)


def decode_wav(data: bytes) -> dict:
    """Pure stdlib+numpy WAV/RIFF decode → samples + format metadata.

    Walks the RIFF chunk list (word-aligned; odd-sized chunks carry a pad
    byte), parses ``fmt `` (PCM=1: 8-bit unsigned / 16- / 32-bit signed;
    IEEE float=3: float32/float64) and ``data``, and returns
    ``{"sample_rate", "n_channels", "bit_depth", "frames"}`` where
    ``frames`` is a float64 array shaped (n_frames, n_channels),
    normalized to [-1, 1].  Compressed formats (ADPCM, MP3-in-RIFF…)
    are a codec library's job and raise ``NotImplementedError``."""
    import struct

    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos, fmt, payload = 12, None, None
    while pos + 8 <= len(data):
        cid, size = data[pos : pos + 4], struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        body = data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # odd chunks are padded to word size
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            payload = body
    if fmt is None or payload is None:
        raise ValueError("truncated WAV (missing fmt/data chunk)")
    audio_format, n_ch, rate, _brate, _balign, bits = fmt
    if audio_format == 0xFFFE and len(data) >= 12:  # WAVE_FORMAT_EXTENSIBLE
        raise NotImplementedError("WAVE_FORMAT_EXTENSIBLE needs subformat parsing")
    if audio_format == 1:  # integer PCM
        if bits == 8:
            x = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
            x = (x - 128.0) / 128.0
        elif bits == 16:
            x = np.frombuffer(payload, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 32:
            x = np.frombuffer(payload, dtype="<i4").astype(np.float64) / 2147483648.0
        else:
            raise NotImplementedError(f"PCM bit depth {bits} unsupported (8/16/32)")
    elif audio_format == 3:  # IEEE float
        x = np.frombuffer(payload, dtype="<f4" if bits == 32 else "<f8").astype(np.float64)
    else:
        raise NotImplementedError(
            f"WAV audio format {audio_format} needs a codec library (PCM/float only)"
        )
    n_ch = max(int(n_ch), 1)
    n_frames = len(x) // n_ch
    return {
        "sample_rate": int(rate),
        "n_channels": n_ch,
        "bit_depth": int(bits),
        "frames": x[: n_frames * n_ch].reshape(n_frames, n_ch),
    }


def _wav_features(payload: bytes) -> tuple[int, int, int, int, float, float, float]:
    w = decode_wav(payload)
    fr = w["frames"]
    dur = fr.shape[0] / w["sample_rate"] if w["sample_rate"] else 0.0
    a = np.abs(fr)  # amplitude stats over ALL samples, channels included
    return (
        w["sample_rate"],
        w["n_channels"],
        w["bit_depth"],
        fr.shape[0],
        round(float(dur), 6),
        round(float(a.mean()), 6) if a.size else 0.0,
        round(float(a.max()), 6) if a.size else 0.0,
    )


def decode_audio_batches(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "asset_id",
    fake: bool = False,
) -> DataFrame:
    """Audio twin of ``decode_image_batches``: WAV payloads decode for
    REAL (``decode_wav`` — stdlib struct + numpy, executor-side through
    the same Arrow-batched ``mapInPandas`` path); other audio formats
    need ffmpeg and raise unless ``fake=True``.  NULL/empty payloads
    yield a zero row, never a dead executor."""

    out_cols = [f.split()[0] for f in AUDIO_FEATURES_DDL.split(", ")]
    zero = (0, 0, 0, 0, 0.0, 0.0, 0.0)

    def decode_one(p: bytes) -> tuple[int, int, int, int, float, float, float]:
        if fake:
            n = len(p)
            return 8000 + n % 48000, 1 + n % 2, 16, n, round(n / 8000.0, 6), 0.1, 0.5
        if not p:
            return zero
        if p[:4] == b"RIFF":
            return _wav_features(p)
        raise NotImplementedError(
            "non-WAV audio decode requires ffmpeg (not in this container); "
            "pass fake=True for the deterministic test decoder"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[bin_col].map(lambda p: bytes(p) if p is not None else b"")
            decoded = payloads.map(decode_one)
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col].to_numpy(),
                    "media_type": (
                        pdf["media_type"].to_numpy()
                        if "media_type" in pdf.columns
                        else "unknown"
                    ),
                    "n_bytes": payloads.map(len).to_numpy(),
                    "sample_rate": decoded.map(lambda t: t[0]).to_numpy(),
                    "n_channels": decoded.map(lambda t: t[1]).to_numpy(),
                    "bit_depth": decoded.map(lambda t: t[2]).to_numpy(),
                    "n_frames": decoded.map(lambda t: t[3]).to_numpy(),
                    "duration_s": decoded.map(lambda t: t[4]).to_numpy(),
                    "mean_abs_amp": decoded.map(lambda t: t[5]).to_numpy(),
                    "peak_amp": decoded.map(lambda t: t[6]).to_numpy(),
                },
                columns=out_cols,
            )

    cols = [id_col, bin_col] + (["media_type"] if "media_type" in df.columns else [])
    return df.select(*cols).mapInPandas(run, AUDIO_FEATURES_DDL)


def sample_frames(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "asset_id",
    every_n_bytes: int = 1024,
    max_frames: int = 8,
) -> DataFrame:
    """'Frame sampling' plumbing: explode a video-ish binary into frame
    offsets (the real version would demux; the offsets/explode shape and
    per-frame rows are what matter for the pipeline)."""
    n = F.length(F.col(bin_col))
    idx = F.sequence(
        F.lit(0),
        F.least(
            F.greatest((n / every_n_bytes).cast("int") - 1, F.lit(0)), F.lit(max_frames - 1)
        ),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(idx).alias("frame_no", "_i"),
    ).select(
        id_col, "frame_no", (F.col("frame_no") * every_n_bytes).alias("byte_offset")
    )
