"""Pure-stdlib image codec: REAL pixel kernels without PIL.

Implements the subset of image handling the engine needs from public
format specs (PNG: RFC 2083 / W3C PNG spec; BMP: Windows BITMAPINFOHEADER;
PPM: Netpbm P6; baseline JPEG via jpeg_codec.py; GIF via gif_codec.py):

* ``probe(payload)`` — format/width/height/mode from file headers (PNG,
  JPEG via SOF scan, GIF, BMP, PPM).
* ``decode(payload)`` — full pixel decode to a numpy array for PNG
  (bit depths 1/2/4/8/16, color types 0/2/3/4/6, Adam7 or
  non-interlaced, all five scanline
  filters), BMP (24/32-bit uncompressed), PPM (P6), JPEG — baseline AND
  progressive (SOF2 successive approximation), any chroma subsampling
  (jpeg_codec.py) — GIF87a/89a incl. interlace + transparency
  (gif_codec.py).
* ``MiniImage`` — width/height/mode + resize (nearest-neighbor), crop,
  convert, right-angle rotate/transpose, getchannel, point, histogram,
  extrema, entropy, bbox, colors — the numpy forms of the PIL calls the
  reference uses (reference functions/image.py).
* ``encode_png(arr, mode)`` — PNG writer (filter 0 + zlib + CRC chunks).

Kept deliberately separate from functions/image.py: that module's narrow
waist (`_load_image`) prefers PIL when installed and falls back here, so
a real PIL install still takes over with no other change.
"""

from __future__ import annotations

import math
import struct
import zlib
from typing import Any, Optional

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

_MODE_CHANNELS = {"L": 1, "LA": 2, "RGB": 3, "RGBA": 4}


# ---------------------------------------------------------------------------
# header probing
# ---------------------------------------------------------------------------

def probe(payload: bytes) -> Optional[dict]:
    """Format + dimensions + mode from the file header, or None if the
    payload is not a recognizable image."""
    if payload is None or len(payload) < 10:
        return None
    p = bytes(payload[:64])
    if p.startswith(_PNG_SIG):
        if len(payload) < 26:  # truncated header: not a decodable image
            return None
        w, h = struct.unpack(">II", payload[16:24])
        bit_depth, color_type = payload[24], payload[25]
        mode = {0: "L", 2: "RGB", 3: "RGB", 4: "LA", 6: "RGBA"}.get(
            color_type, "RGB")
        return {"format": "PNG", "width": int(w), "height": int(h),
                "mode": mode, "bit_depth": int(bit_depth)}
    if p.startswith(b"\xff\xd8"):
        return _probe_jpeg(payload)
    if p.startswith((b"GIF87a", b"GIF89a")):
        if len(payload) < 10:
            return None
        w, h = struct.unpack("<HH", payload[6:10])
        return {"format": "GIF", "width": int(w), "height": int(h),
                "mode": "P"}
    if p.startswith(b"BM"):
        if len(payload) < 30:
            return None
        w, h = struct.unpack("<ii", payload[18:26])
        bpp = struct.unpack("<H", payload[28:30])[0]
        return {"format": "BMP", "width": int(w), "height": abs(int(h)),
                "mode": "RGBA" if bpp == 32 else "RGB"}
    if p.startswith(b"P6"):
        try:
            w, h, _maxv, _off = _parse_ppm_header(payload)
            return {"format": "PPM", "width": w, "height": h, "mode": "RGB"}
        except ValueError:
            return None
    if p.startswith(b"RIFF") and p[8:12] == b"WEBP":
        from .webp_codec import probe_webp
        return probe_webp(payload)
    if p.startswith((b"II*\x00", b"MM\x00*")):
        from .tiff_codec import probe_tiff
        return probe_tiff(payload)
    if p.startswith(b"\x00\x00\x01\x00"):
        return probe_ico(payload)
    if p[4:8] == b"ftyp":                  # AVIF/HEIC image-in-BMFF
        from .video_codec import probe_mp4
        info = probe_mp4(payload)
        if info and info.get("format") in ("AVIF", "HEIC"):
            return {"format": info["format"], "mode": "RGB",
                    "width": info.get("width", 0),
                    "height": info.get("height", 0)}
        return None
    # TGA last: it has no magic number, so every other signature wins
    # first and recognition relies on the footer or a plausible header
    return probe_tga(payload)


def _probe_jpeg(payload: bytes) -> Optional[dict]:
    """Scan JPEG markers for the SOFn frame header (public JFIF layout)."""
    i = 2
    n = len(payload)
    while i + 9 < n:
        if payload[i] != 0xFF:
            i += 1
            continue
        marker = payload[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            return None
        seg_len = struct.unpack(">H", payload[i + 2:i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 10 > n:  # truncated SOF segment
                return None
            h, w = struct.unpack(">HH", payload[i + 5:i + 9])
            ncomp = payload[i + 9]
            mode = {1: "L", 3: "RGB", 4: "CMYK"}.get(ncomp, "RGB")
            return {"format": "JPEG", "width": int(w), "height": int(h),
                    "mode": mode}
        i += 2 + seg_len
    return None


def _parse_ppm_header(payload: bytes) -> tuple:
    toks: list[bytes] = []
    i = 2
    while len(toks) < 3 and i < len(payload):
        while i < len(payload) and payload[i:i + 1].isspace():
            i += 1
        if payload[i:i + 1] == b"#":
            while i < len(payload) and payload[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j:j + 1].isspace():
            j += 1
        toks.append(payload[i:j])
        i = j
    if len(toks) < 3:
        raise ValueError("truncated PPM header")
    return int(toks[0]), int(toks[1]), int(toks[2]), i + 1


# ---------------------------------------------------------------------------
# PNG decode
# ---------------------------------------------------------------------------

def _png_unfilter_bytes(raw: bytes, stride: int, bpp: int,
                        height: int) -> np.ndarray:
    """Reverse PNG scanline filters at the BYTE level (the spec defines
    filtering over bytes with a bytes-per-pixel distance `bpp`, which is
    what makes one routine serve 1/2/4/8/16-bit depths). Returns the
    (height, stride) unfiltered byte matrix."""
    out = np.empty((height, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8,
                             count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        if ftype == 0:
            cur = line
        elif ftype == 1:  # Sub
            cur = line
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line.astype(np.uint16) + prev).astype(np.uint8)
        elif ftype == 3:  # Average
            cur = line
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                pp = a + b - c
                pa, pb, pc = abs(pp - a), abs(pp - b), abs(pp - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y] = cur
        prev = out[y]
    return out


def _png_line_geometry(width: int, depth: int, nch: int) -> tuple:
    """(stride_bytes, bytes_per_pixel) for one scanline."""
    stride = (width * depth * nch + 7) // 8
    bpp = max(1, (depth * nch) // 8)
    return stride, bpp


def _png_bytes_to_pixels(rows: np.ndarray, width: int, depth: int,
                         nch: int, scale_gray: bool) -> np.ndarray:
    """Unfiltered byte rows -> (h, width, nch) uint8 pixels.
    depth 16 keeps the high byte (the standard to-8-bit conversion);
    sub-byte depths unpack MSB-first; grayscale sub-byte values scale to
    0..255 (1-bit -> 0/255) while palette indices stay raw."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, :width * nch].reshape(h, width, nch)
    if depth == 16:
        return rows[:, :width * nch * 2].reshape(h, width, nch, 2)[..., 0]
    # depths 1/2/4 are single-channel (gray or palette index) per spec
    bits = np.unpackbits(rows, axis=1)
    per = bits[:, :width * depth].reshape(h, width, depth)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    v = (per * weights[None, None, :]).sum(axis=2).astype(np.uint8)
    if scale_gray:
        v = (v.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
    return v[:, :, None]


def _png_unfilter(raw: bytes, width: int, height: int, nch: int,
                  depth: int = 8, scale_gray: bool = False) -> np.ndarray:
    stride, bpp = _png_line_geometry(width, depth, nch)
    rows = _png_unfilter_bytes(raw, stride, bpp, height)
    return _png_bytes_to_pixels(rows, width, depth, nch, scale_gray)


# Adam7 pass layout: (x0, y0, dx, dy) per W3C PNG spec §8.2
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _png_deinterlace_adam7(raw: bytes, width: int, height: int, nch: int,
                           depth: int = 8,
                           scale_gray: bool = False) -> np.ndarray:
    """Decode an Adam7-interlaced scan: each of the 7 passes is its own
    filtered sub-image (per-pass scanline filters and byte strides),
    placed back on the (dx, dy) grid."""
    out = np.zeros((height, width, nch), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        stride, _bpp = _png_line_geometry(pw, depth, nch)
        sub_raw = raw[pos:pos + ph * (1 + stride)]
        pos += ph * (1 + stride)
        sub = _png_unfilter(sub_raw, pw, ph, nch, depth, scale_gray)
        out[y0::dy, x0::dx] = sub
    return out


def _decode_png(payload: bytes) -> "MiniImage":
    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG")
    pos = 8
    idat = bytearray()
    ihdr = None
    plte = None
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack(">I4s", payload[pos:pos + 8])
        data = payload[pos + 8:pos + 8 + length]
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"PLTE":
            plte = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if interlace not in (0, 1):
        raise ValueError(f"unsupported PNG interlace {interlace}")
    # legal (depth, color_type) combos per PNG spec table 11.1
    legal = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
             4: (8, 16), 6: (8, 16)}
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if nch is None:
        raise ValueError(f"unsupported PNG color type {color_type}")
    if depth not in legal[color_type]:
        raise ValueError(
            f"illegal PNG bit depth {depth} for color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    scale_gray = color_type == 0  # sub-byte gray scales; indices stay raw
    if interlace == 1:
        arr = _png_deinterlace_adam7(raw, w, h, nch, depth, scale_gray)
    else:
        arr = _png_unfilter(raw, w, h, nch, depth, scale_gray)
    if color_type == 3:
        if plte is None:
            raise ValueError("paletted PNG missing PLTE")
        arr = plte[arr[:, :, 0]]
        mode = "RGB"
    else:
        mode = {0: "L", 2: "RGB", 4: "LA", 6: "RGBA"}[color_type]
    return MiniImage(arr, mode, "PNG")


def _decode_bmp(payload: bytes) -> "MiniImage":
    data_off = struct.unpack("<I", payload[10:14])[0]
    w, h = struct.unpack("<ii", payload[18:26])
    bpp = struct.unpack("<H", payload[28:30])[0]
    compression = struct.unpack("<I", payload[30:34])[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    nch = bpp // 8
    flipped = h > 0
    h = abs(h)
    row_size = (w * nch + 3) & ~3
    arr = np.empty((h, w, nch), dtype=np.uint8)
    for y in range(h):
        row = np.frombuffer(payload, dtype=np.uint8, count=w * nch,
                            offset=data_off + y * row_size)
        arr[h - 1 - y if flipped else y] = row.reshape(w, nch)
    # BMP stores BGR(A) → RGB(A)
    if nch >= 3:
        arr = arr[:, :, [2, 1, 0] + ([3] if nch == 4 else [])]
    return MiniImage(arr, "RGBA" if nch == 4 else "RGB", "BMP")


def _decode_ppm(payload: bytes) -> "MiniImage":
    w, h, maxv, off = _parse_ppm_header(payload)
    if maxv != 255:
        raise ValueError(f"unsupported PPM maxval {maxv}")
    arr = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                        offset=off).reshape(h, w, 3).copy()
    return MiniImage(arr, "RGB", "PPM")


def decode(payload: bytes) -> "MiniImage":
    """Full pixel decode, or ValueError when the format/variant is outside
    the pure-python subset (PNG any depth, BMP 24/32 uncompressed, PPM P6,
    JPEG baseline/progressive/subsampled/CMYK, GIF, lossless WebP, stripped
    TIFF none/LZW/Deflate/PackBits)."""
    info = probe(payload)
    if info is None:
        raise ValueError("not a recognizable image payload")
    if info["format"] == "PNG":
        return _decode_png(bytes(payload))
    if info["format"] == "BMP":
        return _decode_bmp(bytes(payload))
    if info["format"] == "PPM":
        return _decode_ppm(bytes(payload))
    if info["format"] == "JPEG":
        from .jpeg_codec import decode_jpeg
        arr, mode = decode_jpeg(bytes(payload))
        return MiniImage(arr, mode, "JPEG")
    if info["format"] == "WEBP":
        from .webp_codec import decode_webp
        arr, mode = decode_webp(bytes(payload))
        return MiniImage(arr, mode, "WEBP")
    if info["format"] == "GIF":
        from .gif_codec import decode_gif
        arr, mode = decode_gif(bytes(payload))
        return MiniImage(arr, mode, "GIF")
    if info["format"] == "TIFF":
        from .tiff_codec import decode_tiff
        arr, mode = decode_tiff(bytes(payload))
        return MiniImage(arr, mode, "TIFF")
    if info["format"] == "ICO":
        return decode_ico(bytes(payload))
    if info["format"] == "TGA":
        return decode_tga(bytes(payload))
    raise ValueError(
        f"{info['format']} pixel decode needs a real codec (header "
        "probing works; install PIL for full decode)")


# ---------------------------------------------------------------------------
# PNG encode
# ---------------------------------------------------------------------------

def encode_png(arr: np.ndarray, mode: str) -> bytes:
    """Minimal PNG writer: filter 0 scanlines, one zlib IDAT."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    idat = zlib.compress(raw, 6)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    return (_PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# MiniImage — the numpy forms of the PIL calls the engine uses
# ---------------------------------------------------------------------------

def _resample_kernel(name: str):
    """(support, f(x)) for the classic resampling filters (public
    formulas; PIL implements the same kernels): triangle, Keys bicubic
    with a=-0.5, Lanczos-3, box."""
    if name == "bilinear":
        return 1.0, lambda x: np.maximum(0.0, 1.0 - np.abs(x))
    if name == "bicubic":
        def keys(x, a=-0.5):
            ax = np.abs(x)
            r = np.where(ax < 1,
                         (a + 2) * ax ** 3 - (a + 3) * ax ** 2 + 1,
                         a * ax ** 3 - 5 * a * ax ** 2
                         + 8 * a * ax - 4 * a)
            return np.where(ax < 2, r, 0.0)
        return 2.0, keys
    if name == "lanczos":
        def lanczos3(x):
            with np.errstate(invalid="ignore", divide="ignore"):
                r = np.sinc(x) * np.sinc(x / 3.0)
            return np.where(np.abs(x) < 3, r, 0.0)
        return 3.0, lanczos3
    if name == "box":
        return 0.5, lambda x: np.where(np.abs(x) <= 0.5, 1.0, 0.0)
    raise ValueError(f"unknown resample filter {name!r}; expected "
                     "nearest/bilinear/bicubic/lanczos/box")


def _resample_axis(arr: "np.ndarray", out_size: int, axis: int,
                   name: str) -> "np.ndarray":
    """Resample one axis: normalized-weight matrix multiply. Kernel
    support scales with the downscale factor (antialiasing); weights
    per output pixel are normalized so constants are reproduced
    exactly. Edge handling = renormalization over in-bounds taps (the
    same as clamping, up to normalization — PIL's scheme)."""
    in_size = arr.shape[axis]
    out_size = max(1, int(out_size))
    if in_size == out_size:
        return arr
    support, f = _resample_kernel(name)
    scale = in_size / out_size
    fscale = max(scale, 1.0)
    centers = (np.arange(out_size) + 0.5) * scale          # input coords
    x = (centers[:, None] - (np.arange(in_size) + 0.5)) / fscale
    w = f(x)
    norm = w.sum(axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    w = w / norm
    return np.moveaxis(
        np.tensordot(w, arr, axes=([1], [axis])), 0, axis)


class MiniImage:
    def __init__(self, arr: np.ndarray, mode: str, fmt: str = "PNG"):
        if arr.ndim == 2:
            arr = arr[:, :, None]
        self.arr = np.ascontiguousarray(arr, dtype=np.uint8)
        self.mode = mode
        self.format = fmt

    # PIL-compatible surface ------------------------------------------------
    @property
    def width(self) -> int:
        return self.arr.shape[1]

    @property
    def height(self) -> int:
        return self.arr.shape[0]

    @property
    def size(self) -> tuple:
        return (self.width, self.height)

    def tobytes(self) -> bytes:
        return self.arr.tobytes()

    def save_bytes(self, fmt: Optional[str] = None, quality: int = 85) -> bytes:
        fmt = (fmt or "PNG").upper()
        if fmt in ("JPEG", "JPG"):
            from .jpeg_codec import encode_jpeg
            return encode_jpeg(self.arr, self.mode, quality)
        if fmt == "GIF":
            from .gif_codec import encode_gif
            return encode_gif(self.arr, self.mode)
        if fmt == "WEBP":
            from .webp_codec import encode_webp
            return encode_webp(self.arr, self.mode)
        if fmt in ("TIFF", "TIF"):
            from .tiff_codec import encode_tiff
            return encode_tiff(self.arr, self.mode)
        return encode_png(self.arr, self.mode)

    def copy(self) -> "MiniImage":
        return MiniImage(self.arr.copy(), self.mode, self.format)

    def resize(self, size: tuple, resample: str = "nearest") -> "MiniImage":
        """Resize with a real resampling filter (separable convolution,
        the textbook scheme PIL implements): nearest (the engine's
        deterministic historical default), bilinear (triangle, support
        1), bicubic (Keys a=-0.5, support 2 — PIL's BICUBIC kernel),
        lanczos (sinc windowed to 3 lobes) and box (area average).
        Downscales widen the kernel support by the scale factor
        (antialiasing), exactly as PIL's ANTIALIAS path does."""
        w, h = int(size[0]), int(size[1])
        if resample in (None, "nearest"):
            ys = (np.arange(h) * (self.height / h)) \
                .astype(int).clip(0, self.height - 1)
            xs = (np.arange(w) * (self.width / w)) \
                .astype(int).clip(0, self.width - 1)
            return MiniImage(self.arr[np.ix_(ys, xs)], self.mode,
                             self.format)
        arr = self.arr.astype(np.float64)
        arr = _resample_axis(arr, h, 0, resample)
        arr = _resample_axis(arr, w, 1, resample)
        if self.arr.dtype == np.uint8:
            arr = np.rint(arr).clip(0, 255).astype(np.uint8)
        else:
            arr = arr.astype(self.arr.dtype)
        return MiniImage(arr, self.mode, self.format)

    def thumbnail(self, size: tuple) -> None:
        ratio = min(size[0] / self.width, size[1] / self.height, 1.0)
        w = max(1, int(self.width * ratio))
        h = max(1, int(self.height * ratio))
        self.arr = self.resize((w, h)).arr

    def reduce(self, factor: int) -> "MiniImage":
        return self.resize((max(1, self.width // factor),
                            max(1, self.height // factor)))

    def crop(self, box: tuple) -> "MiniImage":
        x1, y1, x2, y2 = (int(v) for v in box)
        return MiniImage(self.arr[y1:y2, x1:x2], self.mode, self.format)

    def convert(self, target: str) -> "MiniImage":
        if target == self.mode:
            return self.copy()
        a = self.arr
        # to RGB first
        if self.mode == "L":
            rgb = np.repeat(a, 3, axis=2)
        elif self.mode == "LA":
            rgb = np.repeat(a[:, :, :1], 3, axis=2)
        elif self.mode == "RGBA":
            rgb = a[:, :, :3]
        else:
            rgb = a
        if target == "RGB":
            return MiniImage(rgb, "RGB", self.format)
        if target == "RGBA":
            alpha = (a[:, :, -1:] if self.mode in ("LA", "RGBA")
                     else np.full(rgb.shape[:2] + (1,), 255, np.uint8))
            return MiniImage(np.concatenate([rgb, alpha], axis=2), "RGBA",
                             self.format)
        if target == "L":
            # ITU-R 601-2 luma, PIL's formula. Accumulate in int32:
            # uint8 * 299 promotes only to uint16 (numpy value-based
            # promotion), which WRAPS for any pixel brighter than ~109
            # — a silent garbled-grayscale bug found via the SSIM
            # inversion property test.
            r32 = rgb.astype(np.int32)
            lum = (r32[:, :, 0] * 299 + r32[:, :, 1] * 587
                   + r32[:, :, 2] * 114) // 1000
            return MiniImage(lum.astype(np.uint8), "L", self.format)
        raise ValueError(f"unsupported convert target {target!r}")

    def rotate(self, degrees: float) -> "MiniImage":
        d = degrees % 360
        if d == 0:
            return self.copy()
        if d == 90:
            return MiniImage(np.rot90(self.arr, 1), self.mode, self.format)
        if d == 180:
            return MiniImage(np.rot90(self.arr, 2), self.mode, self.format)
        if d == 270:
            return MiniImage(np.rot90(self.arr, 3), self.mode, self.format)
        raise ValueError(
            "pure-python rotate supports right angles only (install PIL "
            "for arbitrary-angle resampling)")

    def transpose(self, method: int = 0) -> "MiniImage":
        # PIL constants: 0=FLIP_LEFT_RIGHT 1=FLIP_TOP_BOTTOM 2=ROTATE_90
        # 3=ROTATE_180 4=ROTATE_270 5=TRANSPOSE 6=TRANSVERSE
        if method == 0:
            return MiniImage(self.arr[:, ::-1], self.mode, self.format)
        if method == 1:
            return MiniImage(self.arr[::-1], self.mode, self.format)
        if method in (2, 3, 4):
            return self.rotate({2: 90, 3: 180, 4: 270}[method])
        if method == 5:
            return MiniImage(np.swapaxes(self.arr, 0, 1), self.mode, self.format)
        if method == 6:
            return MiniImage(np.swapaxes(self.arr, 0, 1)[::-1, ::-1],
                             self.mode, self.format)
        raise ValueError(f"unknown transpose method {method}")

    def getchannel(self, channel: int) -> "MiniImage":
        return MiniImage(self.arr[:, :, channel], "L", self.format)

    def point(self, fn) -> "MiniImage":
        lut = np.array([max(0, min(255, int(fn(v)))) for v in range(256)],
                       dtype=np.uint8)
        return MiniImage(lut[self.arr], self.mode, self.format)

    def getbands(self) -> tuple:
        return tuple(self.mode)

    def histogram(self) -> list:
        out = []
        for c in range(self.arr.shape[2]):
            out.extend(np.bincount(self.arr[:, :, c].ravel(),
                                   minlength=256).tolist())
        return out

    def getextrema(self):
        ext = [(int(self.arr[:, :, c].min()), int(self.arr[:, :, c].max()))
               for c in range(self.arr.shape[2])]
        return ext[0] if len(ext) == 1 else ext

    def entropy(self) -> float:
        counts = np.bincount(self.convert("L").arr.ravel(), minlength=256)
        p = counts[counts > 0] / counts.sum()
        return float(-(p * np.log2(p)).sum())

    def getbbox(self):
        nz = np.argwhere(self.arr.any(axis=2))
        if len(nz) == 0:
            return None
        (y1, x1), (y2, x2) = nz.min(0), nz.max(0)
        return (int(x1), int(y1), int(x2) + 1, int(y2) + 1)

    def getcolors(self, maxcolors: int = 256):
        flat = self.arr.reshape(-1, self.arr.shape[2])
        uniq, counts = np.unique(flat, axis=0, return_counts=True)
        if len(uniq) > maxcolors:
            return None
        return [(int(c), tuple(int(v) for v in u) if len(u) > 1 else int(u[0]))
                for c, u in zip(counts, uniq)]

    def getpalette(self):
        return None  # MiniImage images are always truecolor/grayscale

    def getpixel(self, xy: tuple):
        x, y = int(xy[0]), int(xy[1])
        v = self.arr[y, x]
        return tuple(int(c) for c in v) if len(v) > 1 else int(v[0])

    def getprojection(self) -> tuple:
        nz = self.arr.any(axis=2)
        return ([1 if c else 0 for c in nz.any(axis=0)],
                [1 if r else 0 for r in nz.any(axis=1)])


# module-level binary ops (the PIL.Image module functions the engine uses)

def alpha_composite(a: MiniImage, b: MiniImage) -> MiniImage:
    """Porter-Duff 'over' of b onto a (both RGBA)."""
    fa = a.convert("RGBA").arr.astype(np.float32) / 255.0
    fb = b.convert("RGBA").arr.astype(np.float32) / 255.0
    aa, ab = fa[:, :, 3:4], fb[:, :, 3:4]
    ao = ab + aa * (1 - ab)
    safe = np.where(ao == 0, 1.0, ao)
    rgb = (fb[:, :, :3] * ab + fa[:, :, :3] * aa * (1 - ab)) / safe
    out = np.concatenate([rgb, ao], axis=2)
    return MiniImage((out * 255 + 0.5).astype(np.uint8), "RGBA")


def blend(a: MiniImage, b: MiniImage, alpha: float) -> MiniImage:
    fa = a.arr.astype(np.float32)
    fb = b.convert(a.mode).arr.astype(np.float32)
    return MiniImage(((1 - alpha) * fa + alpha * fb + 0.5).astype(np.uint8),
                     a.mode)


def composite(a: MiniImage, b: MiniImage, mask: MiniImage) -> MiniImage:
    m = mask.convert("L").arr[:, :, 0].astype(np.float32) / 255.0
    fa = a.arr.astype(np.float32)
    fb = b.convert(a.mode).arr.astype(np.float32)
    out = fa * m[:, :, None] + fb * (1 - m[:, :, None])
    return MiniImage((out + 0.5).astype(np.uint8), a.mode)


# ---------------------------------------------------------------------------
# ICO (Windows icon container: PNG or BMP-DIB entries)
# ---------------------------------------------------------------------------

def _ico_entries(p: bytes) -> list:
    """Parsed ICONDIRENTRY list [(w, h, bpp, size, offset)] or [] if the
    payload is not a plausible ICO (the 4-byte magic is weak, so entry
    bounds are sanity-checked)."""
    if len(p) < 6 or p[:4] != b"\x00\x00\x01\x00":
        return []
    count = struct.unpack("<H", p[4:6])[0]
    if not 1 <= count <= 64 or len(p) < 6 + 16 * count:
        return []
    out = []
    for i in range(count):
        e = p[6 + 16 * i:6 + 16 * i + 16]
        w, h = e[0] or 256, e[1] or 256
        bpp = struct.unpack("<H", e[6:8])[0]
        size, off = struct.unpack("<II", e[8:16])
        if off + size > len(p) or size < 16:
            return []
        out.append((w, h, bpp, size, off))
    return out


def probe_ico(payload: bytes) -> Optional[dict]:
    ents = _ico_entries(bytes(payload))
    if not ents:
        return None
    w, h, _bpp, _sz, _off = max(ents, key=lambda e: (e[0] * e[1], e[2]))
    return {"format": "ICO", "width": int(w), "height": int(h),
            "mode": "RGBA", "n_images": len(ents)}


def _decode_ico_dib(body: bytes) -> np.ndarray:
    """BMP DIB as stored in ICO: BITMAPINFOHEADER with doubled height
    (XOR pixels + 1-bit AND transparency mask), bottom-up rows padded to
    4 bytes, BGRA palette quads for <=8 bpp. -> RGBA array."""
    (size, w, h2, _planes, bpp, comp) = struct.unpack(
        "<IiiHHI", body[:20])
    if comp != 0:
        raise ValueError(f"compressed ICO DIB (BI_{comp}) unsupported")
    h = h2 // 2
    pos = size
    palette = None
    if bpp <= 8:
        n_colors = struct.unpack("<I", body[32:36])[0] or (1 << bpp)
        palette = np.frombuffer(
            body[pos:pos + 4 * n_colors], dtype=np.uint8).reshape(-1, 4)
        pos += 4 * n_colors
    row_bytes = (w * bpp + 31) // 32 * 4
    xor = body[pos:pos + row_bytes * h]
    pos += row_bytes * h
    mask_row = (w + 31) // 32 * 4
    mask = body[pos:pos + mask_row * h]
    out = np.zeros((h, w, 4), dtype=np.uint8)
    for row in range(h):
        src = xor[row * row_bytes:(row + 1) * row_bytes]
        y = h - 1 - row          # bottom-up
        if bpp == 32:
            line = np.frombuffer(src[:w * 4], dtype=np.uint8).reshape(-1, 4)
            out[y, :, 0], out[y, :, 1] = line[:, 2], line[:, 1]
            out[y, :, 2], out[y, :, 3] = line[:, 0], line[:, 3]
        elif bpp == 24:
            line = np.frombuffer(src[:w * 3], dtype=np.uint8).reshape(-1, 3)
            out[y, :, 0], out[y, :, 1] = line[:, 2], line[:, 1]
            out[y, :, 2], out[y, :, 3] = line[:, 0], 255
        elif bpp in (1, 4, 8):
            bits = np.unpackbits(np.frombuffer(src, dtype=np.uint8))
            if bpp == 8:
                idx = np.frombuffer(src[:w], dtype=np.uint8)
            elif bpp == 4:
                nib = np.frombuffer(src, dtype=np.uint8)
                idx = np.empty(len(nib) * 2, dtype=np.uint8)
                idx[0::2], idx[1::2] = nib >> 4, nib & 0xF
                idx = idx[:w]
            else:
                idx = bits[:w]
            quad = palette[idx]
            out[y, :, 0], out[y, :, 1] = quad[:, 2], quad[:, 1]
            out[y, :, 2], out[y, :, 3] = quad[:, 0], 255
        else:
            raise ValueError(f"unsupported ICO DIB bpp {bpp}")
    # AND mask: bit set = transparent. 32bpp entries with a real alpha
    # channel keep it; the all-zero-alpha quirk falls back to the mask.
    if mask and (bpp != 32 or not out[:, :, 3].any()):
        for row in range(h):
            mbits = np.unpackbits(np.frombuffer(
                mask[row * mask_row:(row + 1) * mask_row], dtype=np.uint8))
            out[h - 1 - row, :, 3] = np.where(mbits[:w] == 1, 0,
                                              255).astype(np.uint8)
    return out


def decode_ico(payload: bytes) -> "MiniImage":
    """Decode the best (largest, deepest) ICO entry -> RGBA MiniImage.
    Entries are PNG (Vista+) or BMP DIBs with AND masks."""
    p = bytes(payload)
    ents = _ico_entries(p)
    if not ents:
        raise ValueError("not an ICO payload")
    _w, _h, _bpp, size, off = max(ents, key=lambda e: (e[0] * e[1], e[2]))
    body = p[off:off + size]
    if body.startswith(_PNG_SIG):
        img = _decode_png(body)
        arr, mode = img.arr, img.mode
        if mode != "RGBA":
            rgba = np.zeros((*arr.shape[:2], 4), dtype=np.uint8)
            rgb = arr if arr.ndim == 3 else np.repeat(arr[:, :, None], 3, 2)
            rgba[:, :, :3], rgba[:, :, 3] = rgb[:, :, :3], 255
            arr = rgba
        return MiniImage(arr, "RGBA", "ICO")
    return MiniImage(_decode_ico_dib(body), "RGBA", "ICO")


def encode_ico(arr: np.ndarray, mode: str = "RGBA",
               png_entry: bool = False) -> bytes:
    """Single-entry ICO from an array: a 32bpp BGRA DIB with AND mask by
    default, or a PNG entry (both layouts occur in the wild; the tests
    round-trip each through decode_ico)."""
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    h, w = arr.shape[:2]
    if w > 256 or h > 256:
        raise ValueError("ICO entries are at most 256x256")
    if arr.shape[2] == 3:
        a = np.concatenate([arr, np.full((h, w, 1), 255, np.uint8)], axis=2)
    else:
        a = arr
    if png_entry:
        body = encode_png(a, "RGBA")
    else:
        bgra = a[:, :, [2, 1, 0, 3]][::-1]   # bottom-up BGRA
        mask_row = (w + 31) // 32 * 4
        hdr = struct.pack("<IiiHHIIiiII", 40, w, h * 2, 1, 32, 0,
                          len(bgra.tobytes()) + mask_row * h, 0, 0, 0, 0)
        body = hdr + bgra.tobytes() + b"\x00" * (mask_row * h)
    e_w, e_h = (0 if w == 256 else w), (0 if h == 256 else h)
    entry = struct.pack("<BBBBHHII", e_w, e_h, 0, 0, 1, 32, len(body), 22)
    return b"\x00\x00\x01\x00\x01\x00" + entry + body


# ---------------------------------------------------------------------------
# TGA (Truevision Targa) — raw/RLE truecolor + colormapped
# ---------------------------------------------------------------------------

def probe_tga(payload: bytes) -> Optional[dict]:
    """TGA has no magic; the footer signature ("TRUEVISION-XFILE.") or a
    plausible header gates recognition. Returns dims/mode or None."""
    p = bytes(payload)
    if len(p) < 18:
        return None
    has_footer = p[-26:-8].startswith(b"TRUEVISION-XFILE") if len(p) >= 26 \
        else False
    id_len, cmap_type, img_type = p[0], p[1], p[2]
    w, h = struct.unpack("<HH", p[12:16])
    bpp, desc = p[16], p[17]
    plausible = (cmap_type in (0, 1) and img_type in (1, 2, 3, 9, 10, 11)
                 and 0 < w <= 16384 and 0 < h <= 16384
                 and bpp in (8, 15, 16, 24, 32) and (desc & 0xC0) == 0)
    if not (has_footer or plausible):
        return None
    mode = "L" if img_type in (3, 11) else ("RGBA" if bpp == 32 else "RGB")
    return {"format": "TGA", "width": int(w), "height": int(h),
            "mode": mode, "bits": int(bpp),
            "rle": img_type in (9, 10, 11)}


def _tga_unrle(data: bytes, n_px: int, bpp_bytes: int) -> bytes:
    out = bytearray()
    i = 0
    while len(out) < n_px * bpp_bytes and i < len(data):
        hdr = data[i]
        i += 1
        count = (hdr & 0x7F) + 1
        if hdr & 0x80:            # run packet: one pixel repeated
            out += data[i:i + bpp_bytes] * count
            i += bpp_bytes
        else:                     # raw packet
            out += data[i:i + count * bpp_bytes]
            i += count * bpp_bytes
    return bytes(out[:n_px * bpp_bytes])


def decode_tga(payload: bytes) -> "MiniImage":
    info = probe_tga(payload)
    if info is None:
        raise ValueError("not a TGA payload")
    p = bytes(payload)
    id_len, cmap_type, img_type = p[0], p[1], p[2]
    cm_start, cm_len, cm_bpp = struct.unpack("<HHB", p[3:8])
    w, h, bpp, desc = info["width"], info["height"], info["bits"], p[17]
    pos = 18 + id_len
    palette = None
    if cmap_type == 1:
        cbytes = (cm_bpp + 7) // 8
        palette = p[pos:pos + cm_len * cbytes]
        pos += cm_len * cbytes
    bpx = (bpp + 7) // 8
    raw = p[pos:]
    if info["rle"]:
        raw = _tga_unrle(raw, w * h, bpx)
    else:
        raw = raw[:w * h * bpx]
    if len(raw) < w * h * bpx:
        raise ValueError("truncated TGA pixel data")
    px = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, bpx)
    if img_type in (3, 11):                      # grayscale
        arr, mode = px[:, :, 0], "L"
    elif img_type in (1, 9):                     # colormapped
        if palette is None:
            raise ValueError("colormapped TGA without a palette")
        cbytes = (cm_bpp + 7) // 8
        pal = np.frombuffer(palette, dtype=np.uint8).reshape(-1, cbytes)
        idx = px[:, :, 0].astype(np.intp) - cm_start
        quad = pal[np.clip(idx, 0, len(pal) - 1)]
        arr = quad[:, :, [2, 1, 0]]              # BGR -> RGB
        mode = "RGB"
    elif bpp == 32:
        arr, mode = px[:, :, [2, 1, 0, 3]], "RGBA"
    elif bpp == 24:
        arr, mode = px[:, :, [2, 1, 0]], "RGB"
    elif bpp in (15, 16):
        v = px[:, :, 0].astype(np.uint16) | (px[:, :, 1].astype(np.uint16)
                                             << 8)
        arr = np.stack([((v >> 10) & 31) * 255 // 31,
                        ((v >> 5) & 31) * 255 // 31,
                        (v & 31) * 255 // 31], axis=2).astype(np.uint8)
        mode = "RGB"
    else:
        raise ValueError(f"unsupported TGA bpp {bpp}")
    if not desc & 0x20:        # origin bottom-left -> flip to top-down
        arr = arr[::-1]
    if desc & 0x10:            # right-to-left
        arr = arr[:, ::-1]
    return MiniImage(np.ascontiguousarray(arr), mode, "TGA")


def encode_tga(arr: np.ndarray, mode: str = "RGB",
               rle: bool = False) -> bytes:
    """Top-left-origin truecolor (or L) TGA, optionally RLE (type 10)."""
    if arr.ndim == 2:
        img_type, bpx = 3, 1
        body_px = arr[:, :, None]
    elif arr.shape[2] == 4:
        img_type, bpx = 2, 4
        body_px = arr[:, :, [2, 1, 0, 3]]
    else:
        img_type, bpx = 2, 3
        body_px = arr[:, :, [2, 1, 0]]
    h, w = arr.shape[:2]
    flat = body_px.reshape(-1, bpx)
    if rle and img_type == 2:
        img_type = 10
        out = bytearray()
        i = 0
        n = len(flat)
        while i < n:
            run = 1
            while (i + run < n and run < 128
                   and (flat[i + run] == flat[i]).all()):
                run += 1
            if run > 1:
                out.append(0x80 | (run - 1))
                out += flat[i].tobytes()
                i += run
            else:
                j = i + 1
                while (j < n and j - i < 128
                       and not (j + 1 < n and (flat[j] == flat[j + 1]).all())):
                    j += 1
                out.append(j - i - 1)
                out += flat[i:j].tobytes()
                i = j
        body = bytes(out)
    else:
        body = flat.tobytes()
    hdr = struct.pack("<BBBHHBHHHHBB", 0, 0, img_type, 0, 0, 0, 0, 0,
                      w, h, bpx * 8, 0x20)   # top-left origin
    footer = b"\x00" * 8 + b"TRUEVISION-XFILE." + b"\x00"
    return hdr + body + footer
