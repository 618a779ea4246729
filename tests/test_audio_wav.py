"""Real stdlib WAV/RIFF decode, round-tripped against an INDEPENDENT
encoder (python's stdlib ``wave`` module writes the PCM bytes; our
decoder only ever sees the serialized RIFF stream)."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from rocket_etl_spark.operators.multimodal import (
    decode_audio_batches,
    decode_wav,
)


def _wav_bytes(x: np.ndarray, rate: int, sampwidth: int) -> bytes:
    """Encode float frames (n, ch) in [-1, 1] via the stdlib wave module."""
    n_ch = x.shape[1]
    if sampwidth == 1:
        raw = (np.clip(x, -1, 1) * 127 + 128).astype(np.uint8).tobytes()
    elif sampwidth == 2:
        raw = (np.clip(x, -1, 1) * 32767).astype("<i2").tobytes()
    else:
        raw = (np.clip(x, -1, 1) * 2147483647).astype("<i4").tobytes()
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        w.writeframes(raw)
    return buf.getvalue()


def _sine(n: int, ch: int, amp: float = 0.5) -> np.ndarray:
    t = np.arange(n) / n
    return np.stack([amp * np.sin(2 * np.pi * 5 * t + k) for k in range(ch)], axis=1)


@pytest.mark.parametrize("sampwidth,bits,ch,rate", [
    (1, 8, 1, 8000), (2, 16, 2, 44100), (4, 32, 1, 16000),
])
def test_wav_roundtrip_pcm_depths(sampwidth, bits, ch, rate):
    x = _sine(400, ch)
    got = decode_wav(_wav_bytes(x, rate, sampwidth))
    assert got["sample_rate"] == rate
    assert got["n_channels"] == ch
    assert got["bit_depth"] == bits
    assert got["frames"].shape == (400, ch)
    # quantization tolerance scales with depth
    tol = {8: 2 / 127, 16: 2 / 32767, 32: 1e-6}[bits]
    assert np.abs(got["frames"] - x).max() <= tol


def test_wav_float32_and_odd_chunk_padding():
    # hand-built RIFF: float32 fmt + an ODD-sized junk chunk BEFORE data
    # (word alignment: decoder must skip the pad byte to find 'data')
    x = _sine(100, 1).astype("<f4")
    fmt = struct.pack("<HHIIHH", 3, 1, 22050, 22050 * 4, 4, 32)
    junk = b"\x07\x08\x09"  # 3 bytes -> padded to 4
    data = x.tobytes()
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"junk" + struct.pack("<I", len(junk)) + junk + b"\x00"
        + b"data" + struct.pack("<I", len(data)) + data
    )
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    got = decode_wav(blob)
    assert got["sample_rate"] == 22050 and got["bit_depth"] == 32
    assert np.allclose(got["frames"][:, 0], x.astype(np.float64).ravel(), atol=1e-7)


def test_wav_rejects_garbage_and_compressed():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"\x89PNGnot-audio")
    # ADPCM (format 2) is a codec library's job
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 4) + b"\x00" * 4)
    with pytest.raises(NotImplementedError, match="format 2"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_wav_decode_executor_side_real_path(spark):
    """The features must be computed on executors through the Arrow
    mapInPandas path; NULL payloads yield a zero row, never a crash."""
    x1 = _sine(800, 2, amp=0.5)
    x2 = _sine(200, 1, amp=0.9)
    rows = [
        (1, bytearray(_wav_bytes(x1, 16000, 2))),
        (2, bytearray(_wav_bytes(x2, 8000, 2))),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "asset_id bigint, payload binary")
    out = (
        decode_audio_batches(df)
        .toPandas()
        .set_index("asset_id")
        .sort_index()
    )
    assert out.loc[1, "sample_rate"] == 16000
    assert out.loc[1, "n_channels"] == 2
    assert out.loc[1, "n_frames"] == 800
    assert out.loc[1, "duration_s"] == pytest.approx(800 / 16000)
    assert out.loc[1, "peak_amp"] == pytest.approx(0.5, abs=0.01)
    assert out.loc[2, "peak_amp"] == pytest.approx(0.9, abs=0.01)
    # mean |sin| = 2/pi * amp
    assert out.loc[1, "mean_abs_amp"] == pytest.approx(0.5 * 2 / np.pi, abs=0.02)
    assert out.loc[3, "n_frames"] == 0 and out.loc[3, "sample_rate"] == 0
