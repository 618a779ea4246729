"""Baseline JPEG (JFIF) codec — pure stdlib + numpy, no image libraries.

Decoder: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr with
arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0 MCU interleave),
restart markers, byte-stuffed entropy data.  Progressive (SOF2),
arithmetic coding, and 12-bit precision are out of scope and raise
``NotImplementedError`` — at that point a codec library is the right
tool; this exists so a corpus pipeline in a library-less container can
still extract real features (dimensions, luma) from the dominant web
image format, executor-side through the same Arrow ``mapInPandas`` path
as the PNG decoder (see operators/multimodal.py).

Encoder: the test oracle's independent path — baseline, ITU-T T.81
Annex K quantization + Huffman tables (public spec constants), libjpeg
quality scaling, optional 2x2 chroma subsampling.  Round-trip tests
bound the reconstruction error against the ORIGINAL pixels (not against
the decoder's own inverse), and the DCT/Huffman/zigzag primitives are
each inverted exactly in isolation, so encoder and decoder cannot hide
mirrored bugs behind each other.

All heavy math is numpy (the 2-D DCT is two 8x8 matmuls per block); the
bit-serial entropy layer is honest Python — inherently sequential, and
the mapInPandas batching above it is the scale lever, exactly as for
PNG scanline reconstruction.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables
# zigzag scan order: index i of the scan -> (row, col) flat offset
_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int32)
_UNZIG = np.argsort(_ZIGZAG)

# ITU-T T.81 Annex K.1 example quantization tables (the de-facto standard)
_Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64)
_Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64)

# Annex K.3 typical Huffman tables: (bits[1..16], values)
_H_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_H_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_H_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_H_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal DCT-II matrix: block_freq = C @ block @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


def dct2(block: np.ndarray) -> np.ndarray:
    """Orthonormal 2-D DCT-II of an 8x8 block (level-shifted input)."""
    return _C @ block @ _C.T


def idct2(coef: np.ndarray) -> np.ndarray:
    """Exact inverse of ``dct2`` (orthonormal: the transpose IS the inverse)."""
    return _C.T @ coef @ _C


# --------------------------------------------------------------- huffman
def _build_codes(bits, values) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per T.81 C.2 canonical code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _build_decode_map(bits, values) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, the decoder-side inverse of _build_codes."""
    return {(ln, code): sym for sym, (code, ln) in _build_codes(bits, values).items()}


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing: FF in entropy data -> FF 00
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec
        return bytes(self.buf)


class _BitReader:
    """Entropy-segment bit reader: un-stuffs FF00, stops AT markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise EOFError("read past restart/end marker")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:  # stuffed FF
                self.pos += 2
            else:  # a real marker terminates the segment
                self.marker = nxt
                raise EOFError("entropy segment ended at marker")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def huffman(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG stream")

    def align_to_marker(self) -> int:
        """Skip to and consume the pending marker (after an EOFError)."""
        if self.marker is None:
            # scan forward for the next FF xx
            while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
                self.pos += 1
            self.marker = self.data[self.pos + 1]
        else:
            # _fill stopped at self.pos pointing AT the FF byte
            pass
        m = self.marker
        self.pos = self.data.index(bytes([0xFF, m]), self.pos) + 2
        self.marker = None
        self.acc = 0
        self.n = 0
        return m


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 sign extension of an s-bit magnitude."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _category(v: int) -> int:
    """Bit length of |v| (0 for 0) — the DC/AC size category."""
    return int(abs(v)).bit_length()


# ---------------------------------------------------------------- encode
def _quality_scale(q: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's quality->table scaling (public formula)."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((q * scale + 50) // 100, 1, 255)


def _encode_block(
    w: _BitWriter, block: np.ndarray, qtab: np.ndarray, dc_codes, ac_codes, pred: int
) -> int:
    coef = dct2(block - 128.0)
    quant = np.round(coef.flatten() / qtab.reshape(8, 8).flatten()).astype(np.int64)
    zz = quant[_ZIGZAG]
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    code, ln = dc_codes[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if zz[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_codes[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz != 63:
        code, ln = ac_codes[0x00]  # EOB
        w.write(code, ln)
    return dc


def encode_jpeg(
    img: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encode of ``(h, w)`` grayscale or ``(h, w, 3)`` RGB
    uint8.  ``subsample=True`` emits 4:2:0 (2x2 chroma subsampling) —
    used by the tests to exercise the decoder's MCU interleave path;
    ``restart_interval=N`` emits DRI + RSTn markers every N MCUs (the
    decoder's resync path)."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    ql = _quality_scale(_Q_LUMA, quality)
    qc = _quality_scale(_Q_CHROMA, quality)

    if gray:
        planes = [img.astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
        if subsample:
            # pad to even, then 2x2 box average
            ph, pw = (h + 1) & ~1, (w + 1) & ~1
            def pad(p):
                return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = pad(cb).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = pad(cr).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    hmax = max(sx for sx, _ in samp)
    vmax = max(sy for _, sy in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    # pad each plane to its MCU-aligned size
    padded = []
    for p, (sx, sy) in zip(planes, samp):
        th, tw = mcuy * sy * 8, mcux * sx * 8
        padded.append(
            np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        )

    dc_l = _build_codes(*_H_DC_LUMA)
    ac_l = _build_codes(*_H_AC_LUMA)
    dc_c = _build_codes(*_H_DC_CHROMA)
    ac_c = _build_codes(*_H_AC_CHROMA)
    wtr = _BitWriter()
    preds = [0] * len(planes)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # pad-close the current entropy segment, emit RSTn, reset DC
                seg = wtr.flush()
                wtr = _BitWriter()
                wtr.buf = bytearray(seg)
                wtr.buf += bytes([0xFF, 0xD0 + ((mcu_count // restart_interval - 1) % 8)])
                preds = [0] * len(planes)
            mcu_count += 1
            for ci, (p, (sx, sy)) in enumerate(zip(padded, samp)):
                qtab = ql if ci == 0 else qc
                dc_t = dc_l if ci == 0 else dc_c
                ac_t = ac_l if ci == 0 else ac_c
                for by in range(sy):
                    for bx in range(sx):
                        r0 = (my * sy + by) * 8
                        c0 = (mx * sx + bx) * 8
                        preds[ci] = _encode_block(
                            wtr, p[r0 : r0 + 8, c0 : c0 + 8], qtab, dc_t, ac_t, preds[ci]
                        )
    entropy = wtr.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in ((0, ql),) + (() if gray else ((1, qc),)):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(
            int(q.flatten()[z]) for z in _ZIGZAG
        )
    ncomp = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        sx, sy = samp[ci]
        out += bytes([ci + 1, (sx << 4) | sy, 0 if ci == 0 else 1])
    for tc, th, (bits, values) in (
        (0, 0, _H_DC_LUMA), (1, 0, _H_AC_LUMA),
    ) + (() if gray else ((0, 1, _H_DC_CHROMA), (1, 1, _H_AC_CHROMA))):
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(values), (tc << 4) | th)
        out += bytes(bits) + bytes(values)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 Ah/Al=0 (baseline)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decode
def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF decode → ``(h, w)`` uint8 grayscale or ``(h, w, 3)``
    uint8 RGB.  Supports SOF0, 8-bit, any sampling factors up to 2x2,
    restart intervals; progressive/arithmetic raise."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    sof = None
    restart_interval = 0
    comps: list[dict] = []
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        body = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables (12-bit JPEG)")
                tab = np.zeros(64)
                tab[_ZIGZAG] = np.frombuffer(body[i + 1 : i + 65], dtype=np.uint8)
                qtabs[tq] = tab
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                values = list(body[i + 17 : i + 17 + n])
                htabs[(tc, th)] = _build_decode_map(bits, values)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (both baseline-decodable)
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "sx": hv >> 4, "sy": hv & 0xF, "tq": tq})
            sof = (h, w, nc)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}: progressive/"
                "hierarchical/arithmetic) — needs a codec library"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            ns = body[0]
            for i in range(ns):
                cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                for c in comps:
                    if c["id"] == cid:
                        c["td"], c["ta"] = tabs >> 4, tabs & 0xF
            pos = pos + 2 + seglen
            return _decode_scan(
                data, pos, sof, comps, qtabs, htabs, restart_interval
            )
        # APPn/COM/unknown: skip
        pos += 2 + seglen
    raise ValueError("no SOS marker found (truncated JPEG)")


def _decode_scan(data, pos, sof, comps, qtabs, htabs, restart_interval):
    if sof is None:
        raise ValueError("SOS before SOF")
    h, w, nc = sof
    hmax = max(c["sx"] for c in comps)
    vmax = max(c["sy"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * c["sy"] * 8, mcux * c["sx"] * 8), dtype=np.float64)
        for c in comps
    ]
    rdr = _BitReader(data, pos)
    preds = [0] * nc
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                m = rdr.align_to_marker()
                if not (0xD0 <= m <= 0xD7):
                    raise ValueError(f"expected RSTn, got 0xFF{m:02X}")
                preds = [0] * nc
            for ci, c in enumerate(comps):
                dc_tab = htabs[(0, c["td"])]
                ac_tab = htabs[(1, c["ta"])]
                qtab = qtabs[c["tq"]]
                for by in range(c["sy"]):
                    for bx in range(c["sx"]):
                        zz = np.zeros(64)
                        s = rdr.huffman(dc_tab)
                        diff = _extend(rdr.bits(s), s) if s else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = rdr.huffman(ac_tab)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC coefficient index overflow")
                            zz[k] = _extend(rdr.bits(s), s)
                            k += 1
                        coef = np.zeros(64)
                        coef[_ZIGZAG] = zz
                        block = idct2((coef * qtab).reshape(8, 8)) + 128.0
                        r0 = (my * c["sy"] + by) * 8
                        c0 = (mx * c["sx"] + bx) * 8
                        planes[ci][r0 : r0 + 8, c0 : c0 + 8] = block
            mcu_count += 1

    # upsample chroma to full res (nearest) and crop to (h, w)
    full = []
    for c, p in zip(comps, planes):
        fx, fy = hmax // c["sx"], vmax // c["sy"]
        if fx > 1 or fy > 1:
            p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
        full.append(p[:h, :w])
    if nc == 1:
        return np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
