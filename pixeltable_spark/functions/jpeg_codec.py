"""Pure-python JPEG codec (encode + decode), stdlib + numpy only.

Implements ISO/IEC 10918-1 with the standard Annex K quantization and
Huffman tables:

* encoder: JFIF; baseline SOF0 or progressive SOF2 (successive
  approximation: DC first/refine + per-component AC first/refine with
  EOB-run coding); 4:4:4, 4:2:2 or 4:2:0 chroma subsampling (box
  average); single-component grayscale; quality scaling per the public
  libjpeg formula.
* decoder: baseline SOF0, extended sequential SOF1 and progressive SOF2
  (spectral selection + successive approximation, G.1.2.2/G.1.2.3
  including the AC refinement correction-bit protocol), any integer
  sampling factors, any per-table DQT/DHT layout incl. between-scan
  redefinition, restart markers. Arithmetic/lossless/hierarchical
  processes raise.

All DCT/IDCT work is batched numpy (one (N,8,8) tensordot per plane);
only the Huffman bit-twiddling is per-symbol python. That keeps decode
fast enough for Arrow-batched UDFs while staying dependency-free.

Reference parity: the reference's image functions decode via PIL
(reference functions/image.py); this module is the sandbox-real stand-in
wired behind the same surfaces.
"""

from __future__ import annotations

import struct
from typing import Optional

import numpy as np

# ---------------------------------------------------------------------------
# constants (ISO 10918-1 Annex K — public)
# ---------------------------------------------------------------------------

STD_LUMA_QUANT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int32).reshape(8, 8)

STD_CHROMA_QUANT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int32).reshape(8, 8)

# (bits[1..16], values) per Annex K
STD_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
               list(range(12)))
STD_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                 list(range(12)))
STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])

# DCT-II basis matrix: X = C @ x @ C.T
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = (np.sqrt(0.125) if _k == 0 else 0.5) * \
            np.cos((2 * _n + 1) * _k * np.pi / 16)


def _scale_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling (public jcparam.c formula)."""
    quality = min(100, max(1, int(quality)))
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    q = (table * s + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


# ---------------------------------------------------------------------------
# huffman tables
# ---------------------------------------------------------------------------

def _build_codes(bits, values):
    """symbol -> (code, length) per the canonical JPEG procedure.
    Cached: the standard tables are rebuilt for every encode call
    otherwise (hot in per-row UDFs)."""
    key = (tuple(bits), tuple(values))
    hit = _CODES_CACHE.get(key)
    if hit is not None:
        return hit
    codes, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    _CODES_CACHE[key] = codes
    return codes


def _build_decode_map(bits, values):
    """(length, code) -> symbol for the decoder (cached — per-payload
    rebuild dominates small-image decode otherwise)."""
    key = (tuple(bits), tuple(values))
    hit = _DECODE_CACHE.get(key)
    if hit is not None:
        return hit
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    _DECODE_CACHE[key] = out
    return out


_CODES_CACHE: dict = {}
_DECODE_CACHE: dict = {}


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:          # byte stuffing
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                # stuffed zero or marker; markers are stripped before us,
                # so 0xFF here must be followed by 0x00
                if self.pos < len(self.data) and self.data[self.pos] == 0x00:
                    self.pos += 1
            self.acc = (self.acc << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code in JPEG stream")


def _extend(v: int, t: int) -> int:
    """Sign-extend a t-bit magnitude per F.2.2.1."""
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _magnitude(v: int) -> tuple:
    """(category, raw bits) for a signed coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    t = a.bit_length()
    return t, (v if v > 0 else v + (1 << t) - 1)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(H, W) -> (N, 8, 8) with edge replication to multiples of 8."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    p = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    hh, ww = p.shape
    return (p.reshape(hh // 8, 8, ww // 8, 8)
            .transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def _dct2(blocks: np.ndarray) -> np.ndarray:
    # C @ B @ C.T as broadcast matmul (einsum's optimize=True re-derives
    # the contraction path on EVERY call — measurable at one call per
    # tiny image inside a UDF)
    return _C @ blocks @ _C.T


def _idct2(blocks: np.ndarray) -> np.ndarray:
    return _C.T @ blocks @ _C


def _encode_block_zz(bw: "_BitWriter", zz, dc_codes, ac_codes,
                     pred: int) -> int:
    """Sequential encode of one zigzag-ordered 64-coef block."""
    diff = int(zz[0]) - pred
    pred = int(zz[0])
    t, bits = _magnitude(diff)
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(bits, t)
    run = 0
    for i in range(1, 64):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        t, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | t]
        bw.write(code, ln)
        bw.write(bits, t)
        run = 0
    if run:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return pred


def _dqt_segment(tid: int, table: np.ndarray) -> bytes:
    return (b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tid])
            + bytes(int(x) for x in table.flatten()[_ZZ]))


def _dht_segment(cls: int, tid: int, bits, values) -> bytes:
    payload = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values)
    return b"\xFF\xC4" + struct.pack(">H", 2 + len(payload)) + payload


def _box_downsample(plane: np.ndarray, fy: int, fx: int) -> np.ndarray:
    if fy == 1 and fx == 1:
        return plane
    h, w = plane.shape
    p = np.pad(plane, ((0, -h % fy), (0, -w % fx)), mode="edge")
    hh, ww = p.shape
    return p.reshape(hh // fy, fy, ww // fx, fx).mean(axis=(1, 3))


_SAMPLING = {"4:4:4": [(1, 1), (1, 1), (1, 1)],
             "4:2:2": [(2, 1), (1, 1), (1, 1)],
             "4:2:0": [(2, 2), (1, 1), (1, 1)]}


# Progressive AC scans need EOBn symbols (n<<4, n=0..14) that the Annex K
# SEQUENTIAL tables don't contain; emit this flat custom table (all 176
# needed symbols at code length 8 — canonically valid, 176 < 255, the
# all-ones 8-bit code stays unused as required) via DHT before AC scans.
_PROG_AC_SYMBOLS = sorted({n << 4 for n in range(15)} | {0xF0}
                          | {(r << 4) | c for r in range(16)
                             for c in range(1, 11)})
_PROG_AC = ([0, 0, 0, 0, 0, 0, 0, len(_PROG_AC_SYMBOLS),
             0, 0, 0, 0, 0, 0, 0, 0], _PROG_AC_SYMBOLS)


class _ProgressiveACWriter:
    """AC-scan state for progressive encoding: EOB-run accumulation with
    the refinement correction-bit queue (ISO 10918-1 G.1.2.2/G.1.2.3)."""

    def __init__(self, bw: "_BitWriter", ac_codes):
        self.bw = bw
        self.ac = ac_codes
        self.eobrun = 0
        self.queued: list = []  # correction bits riding with the EOB run

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            n = self.eobrun.bit_length() - 1
            code, ln = self.ac[n << 4]
            self.bw.write(code, ln)
            if n:
                self.bw.write(self.eobrun - (1 << n), n)
            self.eobrun = 0
        for b in self.queued:
            self.bw.write(b, 1)
        self.queued = []

    def end_scan(self) -> None:
        self.flush_eobrun()


def encode_jpeg(arr: np.ndarray, mode: str = "RGB", quality: int = 85,
                subsampling: str = "4:4:4",
                progressive: bool = False) -> bytes:
    """JFIF encode of an (H, W, C) uint8 array; mode 'L' or 'RGB'.

    ``subsampling``: '4:4:4' (default), '4:2:2', or '4:2:0' (box-averaged
    chroma). ``progressive=True`` writes an SOF2 stream with successive
    approximation: DC first (Al=1) + DC refine, then per-component AC
    first (Al=1) + AC refine — exercising every progressive scan kind."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nch = arr.shape
    if mode == "L" or nch == 1:
        planes = [arr[:, :, 0].astype(np.float64)]
    elif mode == "RGB" and nch == 3:
        r, g, b = (arr[:, :, i].astype(np.float64) for i in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    elif mode == "CMYK" and nch == 4:
        # Adobe convention: store INVERTED CMYK (255 = no ink), no
        # component transform; an APP14 marker with transform=0 is written
        planes = [arr[:, :, i].astype(np.float64) for i in range(4)]
    else:
        raise ValueError(
            f"encode_jpeg supports L/RGB/CMYK, got mode={mode} nch={nch}")

    ncomp = len(planes)
    if ncomp == 1:
        samps = [(1, 1)]
    elif ncomp == 4:
        if subsampling != "4:4:4":
            raise ValueError("CMYK encode supports 4:4:4 only")
        samps = [(1, 1)] * 4
    else:
        if subsampling not in _SAMPLING:
            raise ValueError(f"subsampling must be one of {sorted(_SAMPLING)}")
        samps = _SAMPLING[subsampling]
    hmax = max(sx for sx, _ in samps)
    vmax = max(sy for _, sy in samps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    ql = _scale_quant(STD_LUMA_QUANT, quality)
    qc = _scale_quant(STD_CHROMA_QUANT, quality)
    quants = [ql] + [qc] * (ncomp - 1)

    # per-component zigzag coefficient grids, padded to the MCU lattice
    zzs = []
    for ci, plane in enumerate(planes):
        sx, sy = samps[ci]
        sub = _box_downsample(plane, vmax // sy, hmax // sx)
        bwid, bhei = mcux * sx, mcuy * sy
        ph, pw = bhei * 8 - sub.shape[0], bwid * 8 - sub.shape[1]
        sub = np.pad(sub, ((0, ph), (0, pw)), mode="edge")
        co = _dct2(_to_blocks(sub - 128.0))
        q = np.round(co / quants[ci]).astype(np.int32)
        # _to_blocks yields blocks in raster order; flatten each to its
        # 64 natural-order coefs, then reorder to zigzag
        nat = q.reshape(bhei, bwid, 64)
        zzs.append(nat[:, :, _ZZ])

    dc_l, ac_l = _build_codes(*STD_DC_LUMA), _build_codes(*STD_AC_LUMA)
    dc_c, ac_c = _build_codes(*STD_DC_CHROMA), _build_codes(*STD_AC_CHROMA)
    dc_for = lambda ci: dc_l if ci == 0 else dc_c  # noqa: E731
    ac_for = lambda ci: ac_l if ci == 0 else ac_c  # noqa: E731

    out = bytearray()
    out += b"\xFF\xD8"
    out += (b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    if ncomp == 4:
        app14 = b"Adobe" + bytes([0, 100, 0, 0, 0, 0, 0])  # transform=0
        out += b"\xFF\xEE" + struct.pack(">H", 2 + len(app14)) + app14
    out += _dqt_segment(0, ql)
    if ncomp > 1:
        out += _dqt_segment(1, qc)
    sof_marker = b"\xFF\xC2" if progressive else b"\xFF\xC0"
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sx, sy = samps[ci]
        sof += bytes([ci + 1, (sx << 4) | sy, 0 if ci == 0 else 1])
    out += sof_marker + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0, 0, *STD_DC_LUMA)
    out += _dht_segment(1, 0, *STD_AC_LUMA)
    if ncomp > 1:
        out += _dht_segment(0, 1, *STD_DC_CHROMA)
        out += _dht_segment(1, 1, *STD_AC_CHROMA)

    def sos_header(comps_in_scan, ss, se, ah, al) -> bytes:
        sos = bytes([len(comps_in_scan)])
        for ci in comps_in_scan:
            sos += bytes([ci + 1, (0 if ci == 0 else 1) * 0x11])
        sos += bytes([ss, se, (ah << 4) | al])
        return b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos

    def mcu_blocks(ci):
        """Blocks of component ci in interleaved MCU order."""
        sx, sy = samps[ci]
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(sy):
                    for bx in range(sx):
                        yield zzs[ci][my * sy + by, mx * sx + bx]

    def interleaved_units():
        """Yield per-MCU lists of (ci, block)."""
        for my in range(mcuy):
            for mx in range(mcux):
                unit = []
                for ci in range(ncomp):
                    sx, sy = samps[ci]
                    for by in range(sy):
                        for bx in range(sx):
                            unit.append((ci, zzs[ci][my * sy + by,
                                                     mx * sx + bx]))
                yield unit

    if not progressive:
        out += sos_header(list(range(ncomp)), 0, 63, 0, 0)
        bw = _BitWriter()
        preds = [0] * ncomp
        if ncomp == 1:
            for blk in mcu_blocks(0):
                preds[0] = _encode_block_zz(bw, blk, dc_l, ac_l, preds[0])
        else:
            for unit in interleaved_units():
                for ci, blk in unit:
                    preds[ci] = _encode_block_zz(
                        bw, blk, dc_for(ci), ac_for(ci), preds[ci])
        out += bw.flush()
        out += b"\xFF\xD9"
        return bytes(out)

    # ---- progressive: DC first(Al=1) / DC refine / per-comp AC first(Al=1)
    # / per-comp AC refine ---------------------------------------------
    AL = 1

    # scan 1: DC first, all components, Al=AL
    out += sos_header(list(range(ncomp)), 0, 0, 0, AL)
    bw = _BitWriter()
    preds = [0] * ncomp
    units = interleaved_units() if ncomp > 1 else (
        [(0, blk)] for blk in mcu_blocks(0))
    for unit in units:
        for ci, blk in unit:
            tv = int(blk[0]) >> AL
            diff = tv - preds[ci]
            preds[ci] = tv
            t, bits = _magnitude(diff)
            code, ln = dc_for(ci)[t]
            bw.write(code, ln)
            if t:
                bw.write(bits, t)
    out += bw.flush()

    # scan 2: DC refine (Ah=AL, Al=0): one magnitude bit per block
    out += sos_header(list(range(ncomp)), 0, 0, AL, 0)
    bw = _BitWriter()
    units = interleaved_units() if ncomp > 1 else (
        [(0, blk)] for blk in mcu_blocks(0))
    for unit in units:
        for ci, blk in unit:
            bw.write(int(blk[0]) & 1, 1)
    out += bw.flush()

    # AC scans are non-interleaved: raster over the component's REAL
    # (non-padded) block grid
    def ac_blocks(ci):
        sx, sy = samps[ci]
        cw = (w * sx + hmax - 1) // hmax
        ch = (h * sy + vmax - 1) // vmax
        nbw, nbh = (cw + 7) // 8, (ch + 7) // 8
        for by in range(nbh):
            for bx in range(nbw):
                yield zzs[ci][by, bx]

    # redefine the AC tables for the progressive scans (EOBn symbols)
    out += _dht_segment(1, 0, *_PROG_AC)
    if ncomp > 1:
        out += _dht_segment(1, 1, *_PROG_AC)
    prog_ac = _build_codes(*_PROG_AC)

    for ci in range(ncomp):
        # scan: AC first, Ss=1..63, Al=AL
        out += sos_header([ci], 1, 63, 0, AL)
        bw = _BitWriter()
        ac = prog_ac
        wtr = _ProgressiveACWriter(bw, ac)
        for blk in ac_blocks(ci):
            vs = [int(v) for v in blk[1:64]]
            sv = [(abs(v) >> AL) * (1 if v > 0 else -1) for v in vs]
            if not any(sv):
                wtr.eobrun += 1
                if wtr.eobrun == 0x7FFF:
                    wtr.flush_eobrun()
                continue
            wtr.flush_eobrun()
            run = 0
            last_nz = max(i for i, v in enumerate(sv) if v)
            for i, v in enumerate(sv):
                if i > last_nz:
                    break
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac[0xF0]
                    bw.write(code, ln)
                    run -= 16
                t, bits = _magnitude(v)
                code, ln = ac[(run << 4) | t]
                bw.write(code, ln)
                bw.write(bits, t)
                run = 0
            if last_nz < 62:
                wtr.eobrun += 1
        wtr.end_scan()
        out += bw.flush()

    for ci in range(ncomp):
        # scan: AC refine, Ss=1..63, Ah=AL, Al=0
        out += sos_header([ci], 1, 63, AL, 0)
        bw = _BitWriter()
        ac = prog_ac
        wtr = _ProgressiveACWriter(bw, ac)
        for blk in ac_blocks(ci):
            vs = [int(v) for v in blk[1:64]]
            absv = [abs(v) for v in vs]
            newly = [i for i, a in enumerate(absv) if a == 1]
            if not newly:
                # no newly-nonzero coef: whole band joins the EOB run;
                # correction bits for history coefficients ride along
                wtr.eobrun += 1
                wtr.queued.extend(a & 1 for a in absv if a > 1)
                if wtr.eobrun == 0x7FFF:
                    wtr.flush_eobrun()
                continue
            # mirror the decoder's crossing exactly: each unit (ZRL or
            # coefficient symbol) carries ONLY the correction bits of the
            # nonzero-history positions it crosses, in position order
            k = 0
            for nxt in newly:
                run = 0
                unit_bits: list = []
                i = k
                while i < nxt:
                    a = absv[i]
                    if a == 0:
                        if run == 15:
                            # 16th zero-history position: close a ZRL unit
                            wtr.flush_eobrun()
                            code, ln = ac[0xF0]
                            bw.write(code, ln)
                            for bbit in unit_bits:
                                bw.write(bbit, 1)
                            unit_bits = []
                            run = 0
                        else:
                            run += 1
                    else:  # a > 1: history coefficient, correction bit
                        unit_bits.append(a & 1)
                    i += 1
                wtr.flush_eobrun()
                code, ln = ac[(run << 4) | 1]
                bw.write(code, ln)
                bw.write(1 if vs[nxt] > 0 else 0, 1)
                for bbit in unit_bits:
                    bw.write(bbit, 1)
                k = nxt + 1
            # tail beyond the last newly-nonzero joins the EOB run
            tail_bits = [absv[i] & 1 for i in range(k, 63) if absv[i] > 1]
            if k < 63:
                wtr.eobrun += 1
                wtr.queued.extend(tail_bits)
                if wtr.eobrun == 0x7FFF:
                    wtr.flush_eobrun()
        wtr.end_scan()
        out += bw.flush()

    out += b"\xFF\xD9"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder — baseline AND progressive, any sampling factors
# ---------------------------------------------------------------------------

def _parse_sos(seg):
    ncomp_s = seg[0]
    scomps = []
    for ci in range(ncomp_s):
        cid, tabs = seg[1 + 2 * ci], seg[2 + 2 * ci]
        scomps.append((cid, tabs >> 4, tabs & 0x0F))
    ss, se, a = seg[1 + 2 * ncomp_s:4 + 2 * ncomp_s]
    return scomps, ss, se, a >> 4, a & 0x0F


def _entropy_end(payload: bytes, start: int) -> int:
    """Index just past the entropy-coded data beginning at `start`:
    the next marker that is not a stuffed 0x00, a fill 0xFF, or RSTn."""
    i, n = start, len(payload)
    while i + 1 < n:
        if payload[i] != 0xFF:
            i += 1
            continue
        b = payload[i + 1]
        if b == 0x00 or 0xD0 <= b <= 0xD7:
            i += 2
            continue
        if b == 0xFF:  # fill byte
            i += 1
            continue
        return i
    return n


class _Comp:
    __slots__ = ("cid", "sx", "sy", "qid", "bw", "bh", "nbw", "nbh")


def _split_restarts(data: bytes, restart_interval: int) -> list:
    if not restart_interval:
        return [data]
    segments, seg, i = [], bytearray(), 0
    while i < len(data):
        if (data[i] == 0xFF and i + 1 < len(data)
                and 0xD0 <= data[i + 1] <= 0xD7):
            segments.append(bytes(seg))
            seg = bytearray()
            i += 2
            continue
        seg.append(data[i])
        i += 1
    segments.append(bytes(seg))
    return segments


def decode_jpeg(payload: bytes) -> tuple:
    """Decode a JFIF stream; returns (array (H, W, C) uint8, mode).

    Supports baseline (SOF0), extended sequential (SOF1) and progressive
    (SOF2) with any integer sampling factors (4:4:4 / 4:2:2 / 4:2:0 ...),
    restart markers, and multi-scan table redefinition. Arithmetic-coded,
    lossless and hierarchical processes raise ValueError."""
    if not payload.startswith(b"\xFF\xD8"):
        raise ValueError("not a JPEG")
    pos, n = 2, len(payload)
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple, dict] = {}
    comps: list = []
    img_h = img_w = 0
    progressive = False
    restart_interval = 0
    coefs: list = []
    mcux = mcuy = 0
    got_scan = False
    adobe_transform = None  # APP14: 0=CMYK/RGB as-is, 1=YCbCr, 2=YCCK

    while pos + 2 <= n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01, 0xFF) or 0xD0 <= marker <= 0xD7:
            pos += 2 if marker != 0xFF else 1
            continue
        if marker == 0xD9:
            break
        if pos + 4 > n:
            break
        seglen = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
        seg = payload[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            s = 0
            while s < len(seg):
                prec, tid = seg[s] >> 4, seg[s] & 0x0F
                width = 128 if prec else 64
                raw = seg[s + 1:s + 1 + width]
                vals = (np.frombuffer(raw, dtype=">u2" if prec else np.uint8)
                        .astype(np.int32))
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZZ] = vals
                quant[tid] = tbl.reshape(8, 8)
                s += 1 + width
        elif marker == 0xC4:  # DHT (may be redefined between scans)
            s = 0
            while s < len(seg):
                cls, tid = seg[s] >> 4, seg[s] & 0x0F
                bits = list(seg[s + 1:s + 17])
                cnt = sum(bits)
                values = list(seg[s + 17:s + 17 + cnt])
                huff[(cls, tid)] = _build_decode_map(bits, values)
                s += 17 + cnt
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1/2
            progressive = marker == 0xC2
            _prec, img_h, img_w = seg[0], *struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for ci in range(ncomp):
                c = _Comp()
                c.cid, samp, c.qid = seg[6 + 3 * ci:9 + 3 * ci]
                c.sx, c.sy = samp >> 4, samp & 0x0F
                comps.append(c)
            hmax = max(c.sx for c in comps)
            vmax = max(c.sy for c in comps)
            if any(hmax % c.sx or vmax % c.sy for c in comps):
                raise ValueError("non-integer sampling ratios unsupported")
            mcux = (img_w + 8 * hmax - 1) // (8 * hmax)
            mcuy = (img_h + 8 * vmax - 1) // (8 * vmax)
            for c in comps:
                c.bw, c.bh = mcux * c.sx, mcuy * c.sy
                cw = (img_w * c.sx + hmax - 1) // hmax
                ch = (img_h * c.sy + vmax - 1) // vmax
                c.nbw, c.nbh = (cw + 7) // 8, (ch + 7) // 8
            coefs = [np.zeros((c.bh, c.bw, 64), dtype=np.int32)
                     for c in comps]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (marker FF{marker:02X}: "
                "arithmetic/lossless/hierarchical)")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xEE and seg[:5] == b"Adobe":  # APP14
            adobe_transform = seg[11] if len(seg) > 11 else 0
        elif marker == 0xDA:  # SOS
            if not comps:
                raise ValueError("SOS before SOF")
            scomps, ss, se, ah, al = _parse_sos(seg)
            data_start = pos + 2 + seglen
            end = _entropy_end(payload, data_start)
            _decode_scan(payload[data_start:end], scomps, ss, se, ah, al,
                         comps, coefs, huff, restart_interval,
                         progressive, mcux, mcuy)
            got_scan = True
            pos = end
            continue
        pos += 2 + seglen

    if not got_scan:
        raise ValueError("no SOS marker found")
    return _reconstruct(comps, coefs, quant, img_h, img_w, adobe_transform)


def _decode_scan(data, scomps, ss, se, ah, al, comps, coefs, huff,
                 restart_interval, progressive, mcux, mcuy):
    cidx = {c.cid: i for i, c in enumerate(comps)}
    idxs = [cidx[cid] for cid, _, _ in scomps]
    tabs = {cidx[cid]: (dcid, acid) for cid, dcid, acid in scomps}
    interleaved = len(scomps) > 1
    if interleaved:
        units = mcux * mcuy
    else:
        c = comps[idxs[0]]
        units = c.nbw * c.nbh

    segments = _split_restarts(data, restart_interval)
    unit = 0
    for seg in segments:
        br = _BitReader(seg)
        preds = {ci: 0 for ci in idxs}
        eobrun = 0
        limit = (min(unit + restart_interval, units)
                 if restart_interval else units)
        while unit < limit:
            if interleaved:
                my, mx = divmod(unit, mcux)
                for ci in idxs:
                    c = comps[ci]
                    dcid, acid = tabs[ci]
                    for by in range(c.sy):
                        for bx in range(c.sx):
                            zz = coefs[ci][my * c.sy + by, mx * c.sx + bx]
                            if not progressive:
                                preds[ci] = _dec_block_seq(
                                    br, zz, huff[(0, dcid)],
                                    huff[(1, acid)], preds[ci])
                            elif ss == 0 and ah == 0:
                                preds[ci] = _dec_dc_first(
                                    br, zz, huff[(0, dcid)], preds[ci], al)
                            elif ss == 0:
                                _dec_dc_refine(br, zz, al)
                            else:
                                raise ValueError(
                                    "interleaved progressive AC scan is "
                                    "illegal (T.81 B.2.3)")
            else:
                ci = idxs[0]
                c = comps[ci]
                dcid, acid = tabs[ci]
                by, bx = divmod(unit, c.nbw)
                zz = coefs[ci][by, bx]
                if not progressive:
                    preds[ci] = _dec_block_seq(
                        br, zz, huff[(0, dcid)], huff[(1, acid)], preds[ci])
                elif ss == 0 and ah == 0:
                    preds[ci] = _dec_dc_first(
                        br, zz, huff[(0, dcid)], preds[ci], al)
                elif ss == 0:
                    _dec_dc_refine(br, zz, al)
                elif ah == 0:
                    eobrun = _dec_ac_first(
                        br, zz, huff[(1, acid)], ss, se, al, eobrun)
                else:
                    eobrun = _dec_ac_refine(
                        br, zz, huff[(1, acid)], ss, se, al, eobrun)
            unit += 1


def _dec_block_seq(br, zz, dct, act, pred):
    t = br.decode_symbol(dct)
    diff = _extend(br.read_bits(t), t) if t else 0
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        rs = br.decode_symbol(act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC coefficient index out of range")
        zz[k] = _extend(br.read_bits(s), s)
        k += 1
    return pred


def _dec_dc_first(br, zz, dct, pred, al):
    t = br.decode_symbol(dct)
    diff = _extend(br.read_bits(t), t) if t else 0
    pred += diff
    zz[0] = pred << al
    return pred


def _dec_dc_refine(br, zz, al):
    if br.read_bit():
        zz[0] = int(zz[0]) | (1 << al)


def _dec_ac_first(br, zz, act, ss, se, al, eobrun):
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = br.decode_symbol(act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.read_bits(r)
                break
            k += 16
            continue
        k += r
        if k > se:
            raise ValueError("AC index out of band in progressive scan")
        zz[k] = _extend(br.read_bits(s), s) << al
        k += 1
    return eobrun


def _dec_ac_refine(br, zz, act, ss, se, al, eobrun):
    """Successive-approximation AC refinement (ISO 10918-1 G.1.2.3):
    newly-nonzero coefficients arrive as ±1<<Al; every already-nonzero
    coefficient crossed on the way appends one correction bit."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = br.decode_symbol(act)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    break
                newval = 0  # ZRL: skip 16 zero-history positions
            else:
                # s is always 1 in a refinement scan
                newval = p1 if br.read_bit() else m1
            while k <= se:
                v = int(zz[k])
                if v != 0:
                    if br.read_bit() and (v & p1) == 0:
                        zz[k] = v + (p1 if v > 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if newval and k <= se:
                zz[k] = newval
            k += 1
    if eobrun > 0:
        # remaining positions of the band: correction bits for nonzeros
        while k <= se:
            v = int(zz[k])
            if v != 0 and br.read_bit() and (v & p1) == 0:
                zz[k] = v + (p1 if v > 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct(comps, coefs, quant, h, w, adobe_transform=None):
    hmax = max(c.sx for c in comps)
    vmax = max(c.sy for c in comps)
    planes = []
    for ci, c in enumerate(comps):
        zz = coefs[ci].reshape(-1, 64)
        blk = np.zeros((zz.shape[0], 64), dtype=np.float64)
        blk[:, _ZZ] = zz * quant[c.qid].flatten()[_ZZ]
        px = _idct2(blk.reshape(-1, 8, 8)) + 128.0
        full = (px.reshape(c.bh, c.bw, 8, 8).transpose(0, 2, 1, 3)
                .reshape(c.bh * 8, c.bw * 8))
        cw = (w * c.sx + hmax - 1) // hmax
        ch = (h * c.sy + vmax - 1) // vmax
        sub = full[:ch, :cw]
        fy, fx = vmax // c.sy, hmax // c.sx
        if fy > 1 or fx > 1:
            sub = np.repeat(np.repeat(sub, fy, axis=0), fx, axis=1)
        planes.append(sub[:h, :w])

    if len(planes) == 1:
        return (np.clip(np.round(planes[0]), 0, 255)
                .astype(np.uint8)[:, :, None], "L")
    if len(planes) == 4:
        # Adobe CMYK (stored INVERTED: 255 = no ink) or YCCK (transform 2)
        if adobe_transform == 2:  # YCCK: YCbCr -> inverted CMY, K as-is
            y, cb, cr, k = planes
            c = y + 1.402 * (cr - 128.0)
            m = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
            ye = y + 1.772 * (cb - 128.0)
        else:  # plain (inverted) CMYK
            c, m, ye, k = planes
        # inverted-CMYK -> RGB: R = C*K/255 on the stored values
        r = c * k / 255.0
        g = m * k / 255.0
        b = ye * k / 255.0
        rgb = np.stack([r, g, b], axis=2)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8), "RGB"
    if len(planes) != 3:
        raise ValueError(f"{len(planes)}-component JPEG unsupported")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8), "RGB"
