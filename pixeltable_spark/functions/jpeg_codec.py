"""Pure-python baseline JPEG codec (encode + decode), stdlib + numpy only.

Implements the ISO/IEC 10918-1 baseline sequential process with the
standard Annex K quantization and Huffman tables:

* encoder: JFIF, SOF0, 4:4:4 (no chroma subsampling) for RGB (YCbCr) and
  single-component for grayscale; quality scaling per the public libjpeg
  formula.
* decoder: baseline SOF0, any per-table DQT/DHT layout, restart markers,
  grayscale or 3-component 4:4:4. Progressive (SOF2) and subsampled scans
  raise — the probe in image_codec still reports their metadata.

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


def _encode_plane(bw: _BitWriter, coefs: np.ndarray, dc_codes, ac_codes,
                  pred: int) -> int:
    for blk in coefs:
        zz = blk.flatten()[_ZZ]
        diff = int(zz[0]) - pred
        pred = int(zz[0])
        t, bits = _magnitude(diff)
        code, ln = dc_codes[t]
        bw.write(code, ln)
        if t:
            bw.write(bits, t)
        run = 0
        last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
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
        if last_nz < 63:
            code, ln = ac_codes[0x00]  # EOB
            bw.write(code, ln)
    return pred


def _dqt_segment(tid: int, table: np.ndarray) -> bytes:
    return (b"\xFF\xDB" + struct.pack(">H", 67) + bytes([tid])
            + bytes(int(x) for x in table.flatten()[_ZZ]))


def _dht_segment(cls: int, tid: int, bits, values) -> bytes:
    payload = bytes([(cls << 4) | tid]) + bytes(bits) + bytes(values)
    return b"\xFF\xC4" + struct.pack(">H", 2 + len(payload)) + payload


def encode_jpeg(arr: np.ndarray, mode: str = "RGB", quality: int = 85) -> bytes:
    """Baseline JFIF encode of an (H, W, C) uint8 array; mode 'L' or 'RGB'
    (RGB is written 4:4:4 YCbCr)."""
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
    else:
        raise ValueError(f"encode_jpeg supports L/RGB, got mode={mode} nch={nch}")

    ql = _scale_quant(STD_LUMA_QUANT, quality)
    qc = _scale_quant(STD_CHROMA_QUANT, quality)
    quants = [ql] + [qc] * (len(planes) - 1)

    dc_l, ac_l = _build_codes(*STD_DC_LUMA), _build_codes(*STD_AC_LUMA)
    dc_c, ac_c = _build_codes(*STD_DC_CHROMA), _build_codes(*STD_AC_CHROMA)

    out = bytearray()
    out += b"\xFF\xD8"  # SOI
    out += (b"\xFF\xE0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    out += _dqt_segment(0, ql)
    if len(planes) > 1:
        out += _dqt_segment(1, qc)
    # SOF0
    ncomp = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += b"\xFF\xC0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0, 0, *STD_DC_LUMA)
    out += _dht_segment(1, 0, *STD_AC_LUMA)
    if ncomp > 1:
        out += _dht_segment(0, 1, *STD_DC_CHROMA)
        out += _dht_segment(1, 1, *STD_AC_CHROMA)
    # SOS
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xFF\xDA" + struct.pack(">H", 2 + len(sos)) + sos

    # interleaved MCU scan: with 1x1 sampling the MCU is one block of each
    # component in raster order
    blocks = []
    for pi, plane in enumerate(planes):
        co = _dct2(_to_blocks(plane - 128.0))
        q = np.round(co / quants[pi]).astype(np.int32)
        blocks.append(q)
    bw = _BitWriter()
    preds = [0] * ncomp
    nblk = blocks[0].shape[0]
    for bi in range(nblk):
        for ci in range(ncomp):
            dc = dc_l if ci == 0 else dc_c
            ac = ac_l if ci == 0 else ac_c
            preds[ci] = _encode_plane(
                bw, blocks[ci][bi:bi + 1], dc, ac, preds[ci])
    out += bw.flush()
    out += b"\xFF\xD9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> tuple:
    """Decode a baseline JPEG; returns (array (H, W, C) uint8, mode).
    Raises ValueError for progressive/subsampled/arithmetic streams."""
    if not payload.startswith(b"\xFF\xD8"):
        raise ValueError("not a JPEG")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple, dict] = {}
    sof = None
    restart_interval = 0
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:
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
        elif marker == 0xC4:  # DHT
            s = 0
            while s < len(seg):
                cls, tid = seg[s] >> 4, seg[s] & 0x0F
                bits = list(seg[s + 1:s + 17])
                cnt = sum(bits)
                values = list(seg[s + 17:s + 17 + cnt])
                huff[(cls, tid)] = _build_decode_map(bits, values)
                s += 17 + cnt
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, ncomp = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            comps = []
            for ci in range(ncomp):
                cid, samp, qid = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append((cid, samp >> 4, samp & 0x0F, qid))
            sof = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"only baseline SOF0 JPEG is supported (marker FF{marker:02X})")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ncomp_s = seg[0]
            scomps = []
            for ci in range(ncomp_s):
                cid, tabs = seg[1 + 2 * ci], seg[2 + 2 * ci]
                scomps.append((cid, tabs >> 4, tabs & 0x0F))
            data_start = pos + 2 + seglen
            return _decode_scan(payload, data_start, sof, scomps, quant,
                                huff, restart_interval)
        pos += 2 + seglen
    raise ValueError("no SOS marker found")


def _decode_scan(payload, start, sof, scomps, quant, huff, restart_interval):
    if sof is None:
        raise ValueError("SOS before SOF")
    h, w, comps = sof
    if any(c[1] != 1 or c[2] != 1 for c in comps):
        raise ValueError("subsampled JPEG needs a real codec (4:4:4 only)")
    # entropy data runs to EOI; restart markers handled by resetting state
    end = payload.rfind(b"\xFF\xD9")
    data = payload[start:end if end > start else len(payload)]
    segments = []
    if restart_interval:
        # split on RSTn markers
        seg, i = bytearray(), 0
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
    else:
        segments = [data]

    bw = (w + 7) // 8
    bh = (h + 7) // 8
    nmcu = bw * bh
    ncomp = len(comps)
    coefs = [np.zeros((nmcu, 64), dtype=np.int32) for _ in range(ncomp)]
    tabs = {cid: (dcid, acid) for cid, dcid, acid in scomps}

    mcu = 0
    for seg in segments:
        br = _BitReader(seg)
        preds = [0] * ncomp
        limit = (min(mcu + restart_interval, nmcu)
                 if restart_interval else nmcu)
        while mcu < limit:
            for ci, (cid, _, _, _qid) in enumerate(comps):
                dcid, acid = tabs[cid]
                dct = huff[(0, dcid)]
                act = huff[(1, acid)]
                t = br.decode_symbol(dct)
                diff = _extend(br.read_bits(t), t) if t else 0
                preds[ci] += diff
                zz = coefs[ci][mcu]
                zz[0] = preds[ci]
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
            mcu += 1
        if restart_interval and mcu >= nmcu:
            break

    planes = []
    for ci, (cid, _, _, qid) in enumerate(comps):
        blk = np.zeros((nmcu, 64), dtype=np.float64)
        blk[:, _ZZ] = coefs[ci] * quant[qid].flatten()[_ZZ]
        px = _idct2(blk.reshape(-1, 8, 8)) + 128.0
        full = (px.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
                .reshape(bh * 8, bw * 8))
        planes.append(full[:h, :w])

    if ncomp == 1:
        return (np.clip(np.round(planes[0]), 0, 255)
                .astype(np.uint8)[:, :, None], "L")
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8), "RGB"
