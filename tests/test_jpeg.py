"""Baseline JPEG codec (operators/jpeg.py): primitive inversions, encoder/
decoder round-trips bounded against the ORIGINAL pixels, subsampling +
restart-marker paths, honest failure on progressive, and the executor-side
mapInPandas feature extraction."""

from __future__ import annotations

import numpy as np
import pytest

from rocket_etl_spark.operators.jpeg import (
    _BitReader,
    _BitWriter,
    _UNZIG,
    _ZIGZAG,
    _build_codes,
    _build_decode_map,
    _H_AC_LUMA,
    dct2,
    decode_jpeg,
    encode_jpeg,
    idct2,
)


def _gradient_rgb(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 5) % 256, (yy * 3) % 256, ((xx * 2 + yy) * 3) % 256], axis=-1
    ).astype(np.uint8)


# ------------------------------------------------------------- primitives
def test_dct_idct_exact_inverse():
    rng = np.random.default_rng(1)
    for _ in range(20):
        b = rng.uniform(-128, 127, (8, 8))
        assert np.allclose(idct2(dct2(b)), b, atol=1e-9)


def test_zigzag_is_a_permutation():
    assert sorted(_ZIGZAG.tolist()) == list(range(64))
    x = np.arange(64)
    assert (x[_ZIGZAG][_UNZIG] == x).all()


def test_huffman_bitstream_roundtrip():
    """Encode a random symbol stream with the Annex-K AC-luma table and
    decode it back bit-exactly — pins the canonical code construction,
    byte stuffing, and the (length, code) decode map together."""
    codes = _build_codes(*_H_AC_LUMA)
    dec_map = _build_decode_map(*_H_AC_LUMA)
    rng = np.random.default_rng(2)
    syms = rng.choice(list(codes), size=500).tolist()
    w = _BitWriter()
    for s in syms:
        code, ln = codes[int(s)]
        w.write(code, ln)
    data = w.flush() + b"\xff\xd9"  # terminate like a real scan
    r = _BitReader(data, 0)
    got = [r.huffman(dec_map) for _ in range(len(syms))]
    assert got == [int(s) for s in syms]


# ------------------------------------------------------------ round-trips
def test_flat_image_reconstructs_exactly():
    img = np.full((24, 24), 128, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=90))
    assert out.shape == (24, 24)
    assert int(np.abs(out.astype(int) - 128).max()) == 0


@pytest.mark.parametrize(
    "kw",
    [dict(), dict(subsample=True), dict(restart_interval=3),
     dict(subsample=True, restart_interval=2)],
)
def test_rgb_roundtrip_error_bounded(kw):
    rgb = _gradient_rgb(37, 51)  # odd, non-multiple-of-8 dims
    dec = decode_jpeg(encode_jpeg(rgb, quality=95, **kw))
    assert dec.shape == rgb.shape
    err = np.abs(dec.astype(int) - rgb.astype(int))
    # 4:2:0 box-averaged chroma has big LOCAL errors at the pattern's wrap
    # edges (inherent to subsampling), so the bound is on the mean
    assert err.mean() < (4.0 if kw.get("subsample") else 1.5), err.mean()


def test_grayscale_roundtrip():
    yy, xx = np.mgrid[0:37, 0:51]
    gray = ((xx * yy) % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(gray, quality=90, restart_interval=4))
    assert dec.shape == gray.shape and dec.ndim == 2
    assert np.abs(dec.astype(int) - gray.astype(int)).mean() < 6.0


def test_quality_tradeoff_monotone():
    rgb = _gradient_rgb(32, 32)
    errs = []
    for q in (30, 60, 95):
        dec = decode_jpeg(encode_jpeg(rgb, quality=q))
        errs.append(np.abs(dec.astype(int) - rgb.astype(int)).mean())
    assert errs[0] > errs[1] > errs[2]


def test_deterministic_bytes():
    rgb = _gradient_rgb(16, 16)
    assert encode_jpeg(rgb, quality=77) == encode_jpeg(rgb, quality=77)


# ------------------------------------------------------------ error paths
def test_rejects_progressive():
    rgb = _gradient_rgb(16, 16)
    data = bytearray(encode_jpeg(rgb))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(bytes(data))


def test_rejects_non_jpeg_and_truncated():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)
    with pytest.raises(ValueError, match="truncated|SOS"):
        decode_jpeg(b"\xff\xd8\xff\xe0\x00\x02")


# ------------------------------------------------- executor-side plumbing
def test_decode_image_batches_handles_jpeg(spark):
    from rocket_etl_spark.operators.multimodal import (
        decode_image_batches,
        with_media_metadata,
    )

    imgs = {1: _gradient_rgb(24, 40), 2: _gradient_rgb(9, 13)}
    rows = [
        {"asset_id": k, "payload": bytearray(encode_jpeg(v, quality=92))}
        for k, v in imgs.items()
    ]
    df = with_media_metadata(
        spark.createDataFrame(rows, "asset_id bigint, payload binary")
    )
    got = {
        r["asset_id"]: r
        for r in decode_image_batches(df).collect()
    }
    for k, v in imgs.items():
        assert got[k]["media_type"] == "jpeg"
        assert got[k]["width"] == v.shape[1] and got[k]["height"] == v.shape[0]
        # luma from the decoded pixels tracks the original's luma closely
        luma = (
            v[:, :, 0] * 0.299 + v[:, :, 1] * 0.587 + v[:, :, 2] * 0.114
        ).mean() / 255.0
        assert abs(got[k]["mean_luma"] - luma) < 0.02
