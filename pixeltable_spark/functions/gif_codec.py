"""Pure-python GIF codec (encode + decode), stdlib + numpy only.

Implements the public GIF87a/89a specification: logical screen
descriptor, global/local color tables, LZW-compressed image data with
variable code width, interlaced scans (deinterlaced on decode), and the
89a graphic-control extension's transparency index. Animated GIFs decode
to their FIRST frame (the reference's PIL path does the same unless the
caller seeks). The encoder writes a GIF89a with a global palette and
real LZW compression; inputs with more than 256 distinct colors raise
(palette quantization is out of scope — callers convert first).

Reference parity: the reference decodes GIF via PIL (reference
functions/image.py); this is the sandbox-real stand-in behind the same
narrow waist.
"""

from __future__ import annotations

import struct

import numpy as np


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------

def _lzw_decode(min_code_size: int, data: bytes) -> list:
    clear = 1 << min_code_size
    eoi = clear + 1
    # bit reader: LSB-first within bytes (GIF order)
    acc = 0
    nbits = 0
    pos = 0
    out: list[int] = []

    def init_table():
        return {i: [i] for i in range(clear)}

    table = init_table()
    next_code = eoi + 1
    code_size = min_code_size + 1
    prev: list | None = None

    while True:
        while nbits < code_size:
            if pos >= len(data):
                return out  # truncated stream: emit what we have
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size

        if code == clear:
            table = init_table()
            next_code = eoi + 1
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + [prev[0]]
        else:
            raise ValueError("corrupt GIF LZW stream")
        out.extend(entry)
        if prev is not None:
            table[next_code] = prev + [entry[0]]
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    buf: tuple = ()
    for px in indices.flatten().tolist():
        cand = buf + (px,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], code_size)
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            emit(clear, code_size)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        buf = (px,)
    if buf:
        emit(table[buf], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def decode_gif(payload: bytes) -> tuple:
    """Decode the first frame; returns (array (H, W, C) uint8, mode) with
    mode 'RGB' or 'RGBA' (when a transparency index is declared)."""
    if not payload[:6] in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    global_table = None
    if flags & 0x80:
        gsize = 2 << (flags & 0x07)
        global_table = np.frombuffer(
            payload[pos:pos + 3 * gsize], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * gsize

    transparent = None
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control
                blksz = payload[pos]
                gce = payload[pos + 1:pos + 1 + blksz]
                if blksz >= 4 and gce[0] & 0x01:
                    transparent = gce[3]
            # skip sub-blocks
            while payload[pos] != 0:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b == 0x2C:  # image descriptor
            left, top, w, h, iflags = struct.unpack(
                "<HHHHB", payload[pos + 1:pos + 10])
            pos += 10
            table = global_table
            if iflags & 0x80:
                lsize = 2 << (iflags & 0x07)
                table = np.frombuffer(
                    payload[pos:pos + 3 * lsize], dtype=np.uint8).reshape(-1, 3)
                pos += 3 * lsize
            if table is None:
                raise ValueError("GIF image without any color table")
            min_code = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                n = payload[pos]
                data += payload[pos + 1:pos + 1 + n]
                pos += 1 + n
            pos += 1
            idx = np.array(_lzw_decode(min_code, bytes(data)),
                           dtype=np.int32)[:w * h]
            if idx.size < w * h:
                idx = np.pad(idx, (0, w * h - idx.size))
            grid = idx.reshape(h, w)
            if iflags & 0x40:  # interlaced: rows in 4 passes
                out_rows = np.empty_like(grid)
                order = (list(range(0, h, 8)) + list(range(4, h, 8))
                         + list(range(2, h, 4)) + list(range(1, h, 2)))
                for src_i, dst_i in enumerate(order):
                    out_rows[dst_i] = grid[src_i]
                grid = out_rows
            grid = np.clip(grid, 0, len(table) - 1)
            rgb = table[grid]
            if transparent is not None:
                alpha = np.where(grid == transparent, 0, 255).astype(np.uint8)
                return np.dstack([rgb, alpha]), "RGBA"
            return rgb, "RGB"
        raise ValueError(f"unknown GIF block 0x{b:02X}")
    raise ValueError("GIF contains no image data")


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def encode_gif(arr: np.ndarray, mode: str = "RGB") -> bytes:
    """GIF89a encode of an (H, W, 3|4) uint8 array (RGBA alpha<128 maps to
    one transparent index). Requires <= 256 distinct colors."""
    if arr.ndim == 2:
        arr = np.dstack([arr] * 3)
    h, w = arr.shape[:2]
    has_alpha = arr.shape[2] == 4
    rgb = arr[:, :, :3]
    opaque = (arr[:, :, 3] >= 128) if has_alpha else np.ones((h, w), bool)

    flat = rgb.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    transparent = None
    if has_alpha and not opaque.all():
        if len(colors) > 255:
            raise ValueError("GIF encode: more than 255 colors + transparency")
        transparent = len(colors)
        colors = np.vstack([colors, [[0, 0, 0]]])
    elif len(colors) > 256:
        raise ValueError("GIF encode supports at most 256 distinct colors "
                         "(quantize/convert first)")
    indices = inverse.reshape(h, w).astype(np.int32)
    if transparent is not None:
        indices = np.where(opaque, indices, transparent)

    tbits = max(1, int(len(colors) - 1).bit_length())
    tsize = 1 << tbits
    palette = np.zeros((tsize, 3), dtype=np.uint8)
    palette[:len(colors)] = colors

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (tbits - 1), 0, 0)
    out += palette.tobytes()
    if transparent is not None:
        out += b"\x21\xF9\x04" + bytes([0x01, 0, 0, transparent]) + b"\x00"
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    min_code = max(2, tbits)
    out += bytes([min_code])
    lzw = _lzw_encode(min_code, indices)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3B"
    return bytes(out)
