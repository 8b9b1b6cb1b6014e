"""Baseline JPEG (ITU-T T.81) encoder/decoder in pure numpy + stdlib.

Closes the last codec gap in the media tier (codecs.py handles
PNG/BMP/PPM/WAV; JPEG was previously "recognized but NOT decodable").
Everything here is implemented from the public ITU-T T.81 spec (Annex
A DCT/quantization, Annex C canonical Huffman assignment, Annex F
entropy coding, Annex K reference quantization + Huffman tables) and
the public JFIF 1.02 note for the RGB<->YCbCr matrices. Mirrors the
reference's media-ingest surface (hi-csa-db reads scraped page assets;
see SURVEY.md §2.1) without any external codec library.

Scope: baseline sequential DCT, 8-bit, single interleaved scan,
sampling factors in {1, 2} (4:4:4 and 4:2:0 on both encode and
decode), DRI/RSTn restart intervals (the camera-JPEG error-resilience
layout) with sequence checking and DC-predictor resets. Progressive
(SOF2) and arithmetic coding are out of scope and raise cleanly.

Determinism contract (relied on by the mm6 oracle): quantization and
all pixel roundings use HALF-AWAY-FROM-ZERO (sign * floor(|x| + 0.5)),
matching SQL ROUND in both Spark and DuckDB, so a solid-colour block's
round-trip is predictable in closed form: every AC coefficient
quantizes to 0 and the DC path is
    X' = clamp(round(round(8*(X-128)/q) * q / 8 + 128)).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

# --------------------------------------------------------------------------
# Annex K reference tables
# --------------------------------------------------------------------------

QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# (bits-per-length[1..16], symbol list) — Annex K.3
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
_UNZIGZAG = np.argsort(ZIGZAG)

# Orthonormal 8-point DCT-II basis; forward block transform is
# D @ B @ D.T, inverse is D.T @ B @ D (Annex A.3.3 with the C(u)/2
# scaling folded into the matrix rows).
_D = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _D[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _round_half_away(x: np.ndarray) -> np.ndarray:
    """sign(x) * floor(|x| + 0.5) — matches SQL ROUND on both engines
    (numpy's np.round is banker's rounding, which does NOT)."""
    return np.sign(x) * np.floor(np.abs(x) + 0.5)


def scaled_quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling of the Annex K tables (public libjpeg
    formula): S = 5000/Q below 50 else 200 - 2Q; q' = max(1,
    floor((q*S + 50)/100)), clamped to 255 so the table stays
    encodable as 8-bit baseline DQT."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    luma = np.clip((QUANT_LUMA * s + 50) // 100, 1, 255).astype(np.int32)
    chroma = np.clip((QUANT_CHROMA * s + 50) // 100, 1, 255).astype(np.int32)
    return luma, chroma


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF full-range RGB -> YCbCr, kept in float (no rounding until
    after the decoder's IDCT — the determinism contract)."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    """Integer YCbCr planes -> uint8 RGB with half-away rounding."""
    y = ycc[..., 0].astype(np.float64)
    cb = ycc[..., 1].astype(np.float64) - 128.0
    cr = ycc[..., 2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = _round_half_away(np.stack([r, g, b], axis=-1))
    return np.clip(out, 0, 255).astype(np.uint8)


# --------------------------------------------------------------------------
# Canonical Huffman (Annex C): code k in length order, doubling per bit
# --------------------------------------------------------------------------


def _build_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    return {(ln, c): sym for sym, (c, ln) in _build_codes(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            byte = (self._acc >> (self._nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (F.1.2.3)
                self.out.append(0x00)
            self._nbits -= 8
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # 1-fill (F.1.2.3)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._nbits = 0

    def read_bit(self) -> int:
        if self._nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("jpeg: entropy stream exhausted")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1  # un-stuff
                else:
                    raise ValueError("jpeg: unexpected marker in scan")
            self._acc = byte
            self._nbits = 8
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code")

    def sync_restart(self, expected: int) -> None:
        """Consume a restart marker at an MCU-row boundary (E.2.4):
        drop the padding bits of the current byte, then expect
        FFD0+expected (modulo-8 sequence checked)."""
        self._nbits = 0
        if self.pos + 1 >= len(self.data):
            raise ValueError("jpeg: truncated at restart marker")
        if self.data[self.pos] != 0xFF or self.data[self.pos + 1] != (
            0xD0 + (expected & 7)
        ):
            raise ValueError("jpeg: missing/mis-sequenced restart marker")
        self.pos += 2


def _magnitude(v: int) -> tuple[int, int]:
    """(ssss, value-bits) per F.1.2.1.1: negatives store v - 1 in
    ssss bits of the one's-complement range."""
    if v == 0:
        return 0, 0
    a = abs(v)
    ssss = a.bit_length()
    bits = v if v > 0 else v + (1 << ssss) - 1
    return ssss, bits


def _extend(bits: int, ssss: int) -> int:
    if ssss == 0:
        return 0
    if bits < (1 << (ssss - 1)):
        return bits - (1 << ssss) + 1
    return bits


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------


def _pad_to_8(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _plane_block_grid(plane: np.ndarray, quant: np.ndarray) -> list[list[np.ndarray]]:
    """Quantized zigzag coefficient vectors per 8x8 block, as a
    [block_row][block_col] grid."""
    padded = _pad_to_8(plane)
    h, w = padded.shape
    grid = []
    for by in range(0, h, 8):
        row = []
        for bx in range(0, w, 8):
            block = padded[by : by + 8, bx : bx + 8] - 128.0
            coeffs = _D @ block @ _D.T
            q = _round_half_away(coeffs / quant).astype(np.int64)
            row.append(q.reshape(-1)[ZIGZAG])
        grid.append(row)
    return grid


def _subsample_2x2(plane: np.ndarray) -> np.ndarray:
    """2x2 box-average chroma subsampling (edge-replicated to even
    dims first), kept in float."""
    h, w = plane.shape
    p = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge")
    return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0


def _write_block(
    writer: "_BitWriter",
    zz: np.ndarray,
    prev_dc: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    """Entropy-code one block (F.2 flow: DPCM DC, run-length AC);
    returns the block's DC for the next prediction."""
    diff = int(zz[0]) - prev_dc
    ssss, bits = _magnitude(diff)
    code, ln = dc_codes[ssss]
    writer.write(code, ln)
    if ssss:
        writer.write(bits, ssss)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            code, ln = ac_codes[0x00]  # EOB
            writer.write(code, ln)
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        ssss, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | ssss]
        writer.write(code, ln)
        writer.write(bits, ssss)
        run = 0
    return int(zz[0])


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 75,
    subsample: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Encode HxWx3 uint8 RGB (or HxW grayscale) to a baseline
    sequential JFIF byte stream with Annex K Huffman tables.
    subsample: '444' (one block per component per MCU) or '420'
    (2x2 luma sampling with box-averaged chroma — the common
    photographic layout). restart_interval > 0 emits a DRI segment
    and RSTn markers every that-many MCUs (DC prediction resets at
    each — the error-resilience layout camera JPEGs use)."""
    if subsample not in ("444", "420"):
        raise ValueError("jpeg: subsample must be '444' or '420'")
    if arr.ndim == 2:
        arr = arr[..., None]
    h, w, nc = arr.shape
    if nc not in (1, 3):
        raise ValueError("jpeg: expected 1 or 3 channels")
    luma_q, chroma_q = scaled_quant_tables(quality)
    use_420 = subsample == "420" and nc == 3
    if nc == 3:
        ycc = rgb_to_ycbcr(arr)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        if use_420:
            planes[1] = _subsample_2x2(planes[1])
            planes[2] = _subsample_2x2(planes[2])
        quants = [luma_q, chroma_q, chroma_q]
        samp = [(2, 2), (1, 1), (1, 1)] if use_420 else [(1, 1)] * 3
    else:
        planes = [arr[..., 0].astype(np.float64)]
        quants = [luma_q]
        samp = [(1, 1)]

    dc_codes = [_build_codes(DC_LUMA_BITS, DC_LUMA_VALS)]
    ac_codes = [_build_codes(AC_LUMA_BITS, AC_LUMA_VALS)]
    if nc == 3:
        dc_codes += [_build_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)] * 2
        ac_codes += [_build_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)] * 2

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    grids = []
    for (sh, sv), p, q in zip(samp, planes, quants):
        # pad each plane's block grid out to the full MCU coverage
        need_h, need_w = mcus_y * sv * 8, mcus_x * sh * 8
        ph, pw = p.shape
        p = np.pad(p, ((0, need_h - ph), (0, need_w - pw)), mode="edge")
        grids.append(_plane_block_grid(p, q))

    writer = _BitWriter()
    prev_dc = [0] * nc
    n_mcus = mcus_x * mcus_y
    rst = 0
    for mcu_idx in range(n_mcus):
        my, mx = divmod(mcu_idx, mcus_x)
        for ci in range(nc):
            sh, sv = samp[ci]
            for v_i in range(sv):
                for h_i in range(sh):
                    zz = grids[ci][my * sv + v_i][mx * sh + h_i]
                    prev_dc[ci] = _write_block(
                        writer, zz, prev_dc[ci], dc_codes[ci], ac_codes[ci]
                    )
        if (
            restart_interval
            and mcu_idx + 1 < n_mcus
            and (mcu_idx + 1) % restart_interval == 0
        ):
            writer.flush()
            writer.out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
            prev_dc = [0] * nc
    writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    for tid, q in enumerate([luma_q] + ([chroma_q] if nc == 3 else [])):
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid)
        out += bytes(int(v) for v in q.reshape(-1)[ZIGZAG])
    # SOF0
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        hv = (samp[ci][0] << 4) | samp[ci][1]
        out += struct.pack("BBB", ci + 1, hv, 0 if ci == 0 else 1)
    # DHT
    huff_defs = [(0x00, DC_LUMA_BITS, DC_LUMA_VALS), (0x10, AC_LUMA_BITS, AC_LUMA_VALS)]
    if nc == 3:
        huff_defs += [
            (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
        ]
    for tc_th, bits, vals in huff_defs:
        out += b"\xff\xc4" + struct.pack(">HB", 3 + 16 + len(vals), tc_th)
        out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += struct.pack("BB", ci + 1, 0x00 if ci == 0 else 0x11)
    out += b"\x00\x3f\x00"
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline sequential JPEG to HxWx3 uint8 RGB (or HxW
    grayscale for 1-component streams). Supports 1 or 3 components
    with sampling factors in {1, 2}, standard or custom DQT/DHT,
    single interleaved scan, no restart intervals."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    scan_comps = None
    data_start = None
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("jpeg: expected marker")
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seg_len,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0x0F
                if pq != 0:
                    raise ValueError("jpeg: 16-bit quant tables unsupported")
                tbl = np.zeros(64, np.int32)
                tbl[ZIGZAG] = np.frombuffer(seg[off + 1 : off + 65], np.uint8)
                quants[tq] = tbl.reshape(8, 8)
                off += 65
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0x0F
                bits = list(seg[off + 1 : off + 17])
                n = sum(bits)
                vals = list(seg[off + 17 : off + 17 + n])
                huff[(tc, th)] = _build_decode_map(bits, vals)
                off += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline)
            precision, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise ValueError("jpeg: only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("jpeg: only baseline sequential DCT supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for si in range(ns):
                cs, tdta = seg[1 + 2 * si : 3 + 2 * si]
                scan_comps.append({"id": cs, "td": tdta >> 4, "ta": tdta & 0x0F})
            data_start = pos + seg_len
            break
        pos += seg_len
    if frame is None or scan_comps is None or data_start is None:
        raise ValueError("jpeg: missing SOF/SOS")

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
        raise ValueError("jpeg: sampling factors beyond 2 unsupported")
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-frame["w"] // mcu_w)
    mcus_y = -(-frame["h"] // mcu_h)

    planes = []
    for c in comps:
        pw = mcus_x * c["h"] * 8
        ph = mcus_y * c["v"] * 8
        planes.append(np.zeros((ph, pw), np.float64))

    by_id = {c["id"]: i for i, c in enumerate(comps)}
    reader = _BitReader(payload[data_start:])
    prev_dc = [0] * len(comps)
    rst_seq = 0
    for mcu_idx in range(mcus_y * mcus_x):
        my, mx = divmod(mcu_idx, mcus_x)
        if restart_interval and mcu_idx and mcu_idx % restart_interval == 0:
            reader.sync_restart(rst_seq)
            rst_seq += 1
            prev_dc = [0] * len(comps)
        for sc in scan_comps:
            ci = by_id[sc["id"]]
            c = comps[ci]
            for v_i in range(c["v"]):
                for h_i in range(c["h"]):
                    zz = np.zeros(64, np.int64)
                    ssss = reader.read_symbol(huff[(0, sc["td"])])
                    diff = _extend(reader.read_bits(ssss), ssss)
                    prev_dc[ci] += diff
                    zz[0] = prev_dc[ci]
                    k = 1
                    while k < 64:
                        rs = reader.read_symbol(huff[(1, sc["ta"])])
                        r, s = rs >> 4, rs & 0x0F
                        if rs == 0x00:  # EOB
                            break
                        if rs == 0xF0:  # ZRL
                            k += 16
                            continue
                        k += r
                        if k > 63:
                            raise ValueError("jpeg: AC index overflow")
                        zz[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    block = (zz[_UNZIGZAG].reshape(8, 8) * quants[c["tq"]]).astype(
                        np.float64
                    )
                    pix = _D.T @ block @ _D + 128.0
                    py = (my * c["v"] + v_i) * 8
                    px = (mx * c["h"] + h_i) * 8
                    planes[ci][py : py + 8, px : px + 8] = pix

    h, w = frame["h"], frame["w"]
    out_planes = []
    for c, plane in zip(comps, planes):
        plane = np.clip(_round_half_away(plane), 0, 255)
        if c["h"] != hmax or c["v"] != vmax:  # nearest-neighbour upsample
            plane = np.repeat(
                np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
            )
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        return out_planes[0].astype(np.uint8)
    ycc = np.stack(out_planes, axis=-1)
    return ycbcr_to_rgb(ycc)


def dc_roundtrip_value(x: float, q: int) -> int:
    """Closed-form round-trip of a solid-colour plane value through
    quantize/dequantize at DC-table entry q — the oracle formula the
    mm6 query checks the real codec against (see module docstring)."""

    def rha(v: float) -> float:
        return float(np.sign(v) * np.floor(abs(v) + 0.5))

    dcq = rha(8.0 * (x - 128.0) / q)
    return int(min(255.0, max(0.0, rha(dcq * q / 8.0 + 128.0))))
