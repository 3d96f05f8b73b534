"""Pure-stdlib/numpy TIFF codec (TIFF 6.0 baseline + common extensions).

Decode: stripped images, chunky planar config, compressions 1 (none),
5 (LZW, MSB-first with EarlyChange per spec §13), 8/32946 (Deflate),
32773 (PackBits); photometric 0/1 (gray, incl. 1/4/16-bit), 2 (RGB/RGBA),
3 (palette); horizontal-differencing predictor (tag 317 = 2).
Encode: 8-bit L/LA/RGB/RGBA little-endian, one IFD, compression
none/deflate/packbits/lzw.

Reference parity: pixeltable reads TIFF via PIL (reference
functions/image.py); this is the offline pure-python equivalent behind the
same narrow waist (functions/image.py `decode`). Tiled (322/323) and
planar=2 files raise with a precise message.
"""
from __future__ import annotations

import struct
import zlib

import numpy as np

# IFD entry type -> (struct code, byte size)
_TYPES = {1: ("B", 1), 2: ("s", 1), 3: ("H", 2), 4: ("I", 4), 5: ("II", 8),
          6: ("b", 1), 8: ("h", 2), 9: ("i", 4), 10: ("ii", 8)}


def _read_ifd(payload: bytes, off: int, bo: str) -> dict:
    """Parse one IFD into {tag: [values]} (rationals as float)."""
    n = struct.unpack(bo + "H", payload[off:off + 2])[0]
    tags: dict = {}
    for i in range(n):
        e = off + 2 + 12 * i
        tag, typ, cnt = struct.unpack(bo + "HHI", payload[e:e + 8])
        if typ not in _TYPES:
            continue
        code, size = _TYPES[typ]
        total = size * cnt
        if total <= 4:
            raw = payload[e + 8:e + 8 + total]
        else:
            voff = struct.unpack(bo + "I", payload[e + 8:e + 12])[0]
            raw = payload[voff:voff + total]
        if typ == 2:
            tags[tag] = [raw.rstrip(b"\x00").decode("latin-1")]
        elif typ in (5, 10):
            pairs = struct.unpack(bo + code * cnt, raw)
            tags[tag] = [pairs[2 * j] / (pairs[2 * j + 1] or 1)
                         for j in range(cnt)]
        else:
            tags[tag] = list(struct.unpack(bo + code * cnt, raw))
    return tags


def _parse_header(payload: bytes) -> tuple:
    if len(payload) < 8:
        raise ValueError("not a TIFF")
    order = payload[:2]
    if order == b"II":
        bo = "<"
    elif order == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    magic, ifd_off = struct.unpack(bo + "HI", payload[2:8])
    if magic != 42:
        raise ValueError("not a TIFF (bad magic)")
    return bo, _read_ifd(payload, ifd_off, bo)


def probe_tiff(payload: bytes):
    """Format/dims/mode from the first IFD, or None if not a TIFF."""
    try:
        bo, tags = _parse_header(bytes(payload))
    except (ValueError, struct.error, IndexError):
        return None
    if 256 not in tags or 257 not in tags:
        return None
    spp = tags.get(277, [1])[0]
    photo = tags.get(262, [1])[0]
    if photo == 3:
        mode = "RGB"
    elif spp >= 4:
        mode = "RGBA"
    elif spp == 3:
        mode = "RGB"
    elif spp == 2:
        mode = "LA"
    else:
        mode = "L"
    return {"format": "TIFF", "width": int(tags[256][0]),
            "height": int(tags[257][0]), "mode": mode,
            "bit_depth": int(tags.get(258, [8])[0])}


# ---------------------------------------------------------------------------
# strip decompressors
# ---------------------------------------------------------------------------

def _packbits_decode(data: bytes, expected: int) -> bytes:
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        c = data[i]
        i += 1
        if c < 128:          # literal run of c+1
            out += data[i:i + c + 1]
            i += c + 1
        elif c > 128:        # replicate next byte 257-c times
            out += data[i:i + 1] * (257 - c)
            i += 1
        # c == 128: noop
    return bytes(out[:expected])


def _packbits_encode(row: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        # find run length at i
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            out.append(257 - run)
            out.append(row[i])
            i += run
        else:
            # literal stretch until a >=3 run starts
            j = i + 1
            while j < n and j - i < 128:
                if j + 2 < n and row[j] == row[j + 1] == row[j + 2]:
                    break
                j += 1
            out.append(j - i - 1)
            out += row[i:j]
            i = j
    return bytes(out)


_CLEAR, _EOI = 256, 257


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """TIFF LZW: MSB-first bit packing, EarlyChange=1 (spec §13)."""
    out = bytearray()
    bitbuf = 0
    nbits = 0
    width = 9
    table: list = []
    prev = None
    pos = 0
    n = len(data)
    while len(out) < expected:
        while nbits < width:
            if pos >= n:
                return bytes(out[:expected])
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == _CLEAR:
            table = [bytes((i,)) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == _EOI:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(table[prev] + entry[:1])
        elif code == len(table):
            entry = table[prev] + table[prev][:1]
            table.append(entry)
        else:
            raise ValueError("corrupt TIFF LZW stream")
        out += entry
        prev = code
        if len(table) == (1 << width) - 1 and width < 12:  # early change
            width += 1
    return bytes(out[:expected])


def _lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    width = 9
    table = {bytes((i,)): i for i in range(256)}
    next_code = 258
    emit(_CLEAR, width)
    s = b""
    for b in data:
        sc = s + bytes((b,))
        if sc in table:
            s = sc
            continue
        emit(table[s], width)
        table[sc] = next_code
        next_code += 1
        # the decoder's table is one entry behind at read time, so the
        # encoder widens one entry after the decoder's 2^w - 1 early change
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:
            emit(_CLEAR, width)
            table = {bytes((i,)): i for i in range(256)}
            next_code = 258
            width = 9
        s = bytes((b,))
    if s:
        emit(table[s], width)
    emit(_EOI, width)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _decompress(data: bytes, comp: int, expected: int) -> bytes:
    if comp == 1:
        return data[:expected]
    if comp in (8, 32946):
        return zlib.decompress(data)[:expected]
    if comp == 32773:
        return _packbits_decode(data, expected)
    if comp == 5:
        return _lzw_decode(data, expected)
    raise ValueError(
        f"TIFF compression {comp} outside the pure-python subset "
        "(none/LZW/Deflate/PackBits; install PIL for CCITT/JPEG-in-TIFF)")


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _bits_to_gray(row_bytes: np.ndarray, width: int, depth: int) -> np.ndarray:
    """Unpack one row of sub-byte gray samples (MSB-first) to uint8 0-255."""
    bits = np.unpackbits(row_bytes)
    spb = 8 // depth
    vals = np.zeros(width, dtype=np.uint8)
    for k in range(depth):
        vals = (vals << 1) | bits[k::depth][:width]
    return (vals.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)


def decode_tiff(payload: bytes) -> tuple:
    """Decode the first IFD; returns (H×W×C uint8 array, mode)."""
    payload = bytes(payload)
    bo, tags = _parse_header(payload)
    if 322 in tags or 323 in tags:
        raise ValueError("tiled TIFF outside the pure-python subset "
                         "(stripped images only; install PIL)")
    if tags.get(284, [1])[0] == 2:
        raise ValueError("planar TIFF (PlanarConfiguration=2) outside the "
                         "pure-python subset")
    w = int(tags[256][0])
    h = int(tags[257][0])
    spp = int(tags.get(277, [1])[0])
    bps = tags.get(258, [8] * spp)
    comp = int(tags.get(259, [1])[0])
    photo = int(tags.get(262, [1])[0])
    predictor = int(tags.get(317, [1])[0])
    rps = int(tags.get(278, [2 ** 32 - 1])[0])
    rps = min(rps, h)
    offs = tags.get(273)
    counts = tags.get(279)
    if offs is None:
        raise ValueError("TIFF missing StripOffsets")
    depth = int(bps[0])
    if any(int(b) != depth for b in bps):
        raise ValueError("TIFF with mixed per-channel bit depths unsupported")
    if depth not in (1, 2, 4, 8, 16):
        raise ValueError(f"TIFF bit depth {depth} unsupported")
    if depth != 8 and spp != 1 and photo != 3:
        raise ValueError("sub-byte/16-bit TIFF only supported for 1 sample")
    row_bytes = (w * spp * depth + 7) // 8
    if counts is None:
        counts = [row_bytes * rps] * len(offs)

    raw = bytearray()
    rows_done = 0
    for i, off in enumerate(offs):
        nrows = min(rps, h - rows_done)
        expected = row_bytes * nrows
        raw += _decompress(payload[off:off + int(counts[i])], comp, expected)
        rows_done += nrows
    if len(raw) < row_bytes * h:
        raise ValueError("truncated TIFF pixel data")
    data = np.frombuffer(bytes(raw[:row_bytes * h]), dtype=np.uint8)
    rows = data.reshape(h, row_bytes)

    if depth == 16:
        dt = np.dtype(np.uint16).newbyteorder(bo)
        arr16 = rows.reshape(h, -1).view(np.uint8).copy().view(dt)
        arr16 = arr16.reshape(h, w, spp).astype(np.uint16)
        if predictor == 2:
            arr16 = np.cumsum(arr16, axis=1, dtype=np.uint32).astype(np.uint16)
        arr = (arr16 >> 8).astype(np.uint8)
    elif depth == 8:
        arr = rows[:, :w * spp].reshape(h, w, spp).copy()
        if predictor == 2:
            arr = np.cumsum(arr, axis=1, dtype=np.uint32).astype(np.uint8)
    else:
        if predictor == 2:
            raise ValueError("predictor 2 with sub-byte samples unsupported")
        arr = np.stack([_bits_to_gray(rows[y], w, depth) for y in range(h)])
        arr = arr[:, :, None]
        if photo == 3:
            # palette indices must stay raw, undo the gray scaling
            arr = (arr.astype(np.uint16) * ((1 << depth) - 1) // 255
                   ).astype(np.uint8)

    if photo == 0:                       # WhiteIsZero
        if spp == 2:
            arr = arr.copy()
            arr[:, :, 0] = 255 - arr[:, :, 0]   # alpha stays
            mode = "LA"
        else:
            arr = 255 - arr
            mode = "L"
    elif photo == 3:
        cmap = tags.get(320)
        if cmap is None:
            raise ValueError("palette TIFF missing ColorMap")
        ncolors = len(cmap) // 3
        pal = (np.array(cmap, dtype=np.uint32).reshape(3, ncolors).T
               >> 8).astype(np.uint8)
        arr = pal[arr[:, :, 0]]
        mode = "RGB"
    elif photo == 2:
        mode = "RGBA" if spp >= 4 else "RGB"
        arr = arr[:, :, :4]
    else:
        mode = {1: "L", 2: "LA", 3: "RGB", 4: "RGBA"}.get(spp, "L")
    if arr.shape[2] == 1 and mode == "L":
        pass
    return arr, mode


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def encode_tiff(arr: np.ndarray, mode: str = "RGB",
                compression: str = "deflate") -> bytes:
    """Little-endian 8-bit chunky TIFF, one strip, one IFD."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    arr = np.ascontiguousarray(arr.astype(np.uint8))
    h, w, spp = arr.shape
    pix = arr.tobytes()
    comp_tag = {"none": 1, "deflate": 8, "packbits": 32773, "lzw": 5}.get(
        compression)
    if comp_tag is None:
        raise ValueError(f"unknown TIFF compression '{compression}'")
    if comp_tag == 1:
        strip = pix
    elif comp_tag == 8:
        strip = zlib.compress(pix, 6)
    elif comp_tag == 5:
        strip = _lzw_encode(pix)
    else:
        row_bytes = w * spp
        strip = b"".join(_packbits_encode(pix[y * row_bytes:(y + 1) * row_bytes])
                         for y in range(h))
    photo = 2 if spp >= 3 else 1

    entries = []           # (tag, type, count, packed-value-or-None, payload)

    def short(tag, *vals):
        entries.append((tag, 3, len(vals),
                        struct.pack("<" + "H" * len(vals), *vals)))

    def long_(tag, *vals):
        entries.append((tag, 4, len(vals),
                        struct.pack("<" + "I" * len(vals), *vals)))

    short(256, w)
    short(257, h)
    short(258, *([8] * spp))
    short(259, comp_tag)
    short(262, photo)
    # 273 StripOffsets patched below
    long_(273, 0)
    short(277, spp)
    long_(278, h)
    long_(279, len(strip))
    if spp in (2, 4):
        short(338, 2)      # unassociated alpha
    entries.sort(key=lambda e: e[0])

    # layout: header(8) + IFD + overflow values + strip
    ifd_off = 8
    ifd_size = 2 + 12 * len(entries) + 4
    overflow_off = ifd_off + ifd_size
    overflow = bytearray()
    packed = []
    for tag, typ, cnt, val in entries:
        if len(val) <= 4:
            packed.append((tag, typ, cnt, val.ljust(4, b"\x00")))
        else:
            packed.append((tag, typ, cnt,
                           struct.pack("<I", overflow_off + len(overflow))))
            overflow += val
    strip_off = overflow_off + len(overflow)
    out = bytearray()
    out += b"II" + struct.pack("<HI", 42, ifd_off)
    out += struct.pack("<H", len(packed))
    for tag, typ, cnt, val in packed:
        if tag == 273:
            val = struct.pack("<I", strip_off)
        out += struct.pack("<HHI", tag, typ, cnt) + val
    out += struct.pack("<I", 0)          # next-IFD = none
    out += overflow
    out += strip
    return bytes(out)


# ---------------------------------------------------------------------------
# EXIF (the TIFF IFD structure embedded in JPEG APP1 per the public EXIF
# spec; TIFF files carry the same tags in IFD0 directly)
# ---------------------------------------------------------------------------

_EXIF_TAGS = {271: "make", 272: "model", 274: "orientation",
              306: "datetime", 305: "software", 315: "artist",
              33434: "exposure_time", 33437: "f_number",
              34855: "iso", 36867: "datetime_original",
              37386: "focal_length", 40962: "pixel_x", 40963: "pixel_y"}
_EXIF_IFD_PTR = 34665


def exif_from_tiff_body(body: bytes) -> dict:
    """Named EXIF fields from a TIFF-structured blob (IFD0 + Exif sub-IFD)."""
    out: dict = {}
    try:
        bo, tags = _parse_header(body)
    except (ValueError, struct.error, IndexError):
        return out
    ifds = [tags]
    ptr = tags.get(_EXIF_IFD_PTR)
    if ptr:
        try:
            ifds.append(_read_ifd(body, int(ptr[0]), bo))
        except (struct.error, IndexError):
            pass
    for ifd in ifds:
        for tag, vals in ifd.items():
            name = _EXIF_TAGS.get(tag)
            if name is None or name in out or not vals:
                continue
            v = vals[0]
            out[name] = round(v, 6) if isinstance(v, float) else v
    return out


def exif_from_jpeg(payload: bytes) -> dict:
    """EXIF fields from a JPEG's APP1 'Exif\\0\\0' segment, or {}."""
    p = bytes(payload)
    if not p.startswith(b"\xff\xd8"):
        return {}
    i, n = 2, len(p)
    while i + 4 < n:
        if p[i] != 0xFF:
            i += 1
            continue
        marker = p[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xDA:                 # SOS: no EXIF past here
            return {}
        seg_len = struct.unpack(">H", p[i + 2:i + 4])[0]
        if marker == 0xE1 and p[i + 4:i + 10] == b"Exif\x00\x00":
            return exif_from_tiff_body(p[i + 10:i + 2 + seg_len])
        i += 2 + seg_len
    return {}
