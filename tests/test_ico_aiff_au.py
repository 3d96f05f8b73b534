"""ICO, AIFF and Sun AU codecs — fully-derivable real-world formats
wired into the image/audio waists. Round trips exercise both ICO entry
layouts (BMP-DIB + AND mask, PNG), hand-built bitstreams exercise the
paletted-DIB and mask paths, and the audio formats round-trip through
the shared probe()/decode() dispatch."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pixeltable_spark.functions import audio_codec as ac
from pixeltable_spark.functions import image_codec as ic


def _rgba(h, w, seed=3):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (h, w, 4), dtype=np.uint8)


class TestIco:
    def test_dib_round_trip(self):
        arr = _rgba(9, 13)
        ico = ic.encode_ico(arr)
        info = ic.probe(ico)
        assert info == {"format": "ICO", "width": 13, "height": 9,
                        "mode": "RGBA", "n_images": 1}
        img = ic.decode(ico)
        assert img.mode == "RGBA"
        assert np.array_equal(img.arr, arr)

    def test_png_entry_round_trip(self):
        arr = _rgba(16, 16, seed=5)
        ico = ic.encode_ico(arr, png_entry=True)
        img = ic.decode(ico)
        assert np.array_equal(img.arr, arr)

    def test_256_encoded_as_zero(self):
        arr = _rgba(256, 256, seed=7)
        ico = ic.encode_ico(arr, png_entry=True)
        assert ico[6] == 0 and ico[7] == 0     # 256 stored as 0
        assert ic.probe(ico)["width"] == 256
        assert np.array_equal(ic.decode(ico).arr, arr)

    def test_paletted_dib_with_mask(self):
        # hand-built 4x2, 8bpp, 2-color palette, right half masked out
        w, h = 4, 2
        hdr = struct.pack("<IiiHHIIiiII", 40, w, h * 2, 1, 8, 0, 0,
                          0, 0, 0, 0)
        pal = bytes([0, 0, 255, 0,      # index 0: red (BGRA quad)
                     0, 255, 0, 0]) + b"\x00" * 4 * 254
        rows = bytes([0, 1, 0, 1]) + bytes([1, 0, 1, 0])   # bottom-up
        mask = bytes([0b00110000, 0, 0, 0]) * 2            # cols 2,3 clear
        body = hdr + pal + rows + mask
        entry = struct.pack("<BBBBHHII", w, h, 0, 0, 1, 8, len(body), 22)
        ico = b"\x00\x00\x01\x00\x01\x00" + entry + body
        img = ic.decode(ico)
        assert img.arr.shape == (2, 4, 4)
        # top row is the LAST stored row: indices 1,0,1,0
        assert tuple(img.arr[0, 0]) == (0, 255, 0, 255)    # green
        assert tuple(img.arr[0, 1]) == (255, 0, 0, 255)    # red
        assert img.arr[0, 2, 3] == 0 and img.arr[0, 3, 3] == 0  # masked
        assert img.arr[1, 0, 3] == 255

    def test_not_ico(self):
        assert ic.probe_ico(b"\x00\x00\x01\x00\xff\xff" + b"x" * 100) is None
        assert ic.probe_ico(b"GIF89a") is None


class TestAiff:
    def test_round_trip(self):
        sig = (np.sin(np.arange(800) / 7.0) * 12000).astype(np.int16)
        stereo = np.stack([sig, -sig], axis=1)
        payload = ac.encode_aiff(stereo, 8000)
        info = ac.probe(payload)
        assert info["format"] == "AIFF" and info["channels"] == 2
        assert info["sample_rate"] == 8000 and info["n_frames"] == 800
        assert info["duration_s"] == pytest.approx(0.1)
        dec, rate, width = ac.decode(payload)
        assert rate == 8000 and width == 2
        assert np.array_equal(dec, stereo)

    def test_ext80_round_trip(self):
        for r in (8000.0, 44100.0, 48000.0, 11025.0, 96000.0):
            assert ac._ext80_to_float(ac._float_to_ext80(r)) == r

    def test_compressed_aifc_raises(self):
        comm = struct.pack(">HIH", 1, 10, 16) + ac._float_to_ext80(8000.0) \
            + b"ima4" + b"\x00"
        body = b"COMM" + struct.pack(">I", len(comm)) + comm + b"\x00"
        payload = b"FORM" + struct.pack(">I", 4 + len(body)) + b"AIFC" + body
        with pytest.raises(ValueError, match="ima4"):
            ac.decode_aiff(payload)


class TestAu:
    def test_pcm16_round_trip(self):
        sig = (np.sin(np.arange(500) / 5.0) * 9000).astype(np.int16)
        payload = ac.encode_au(sig, 16000)
        info = ac.probe(payload)
        assert info["format"] == "AU" and info["encoding"] == "pcm16"
        assert info["sample_rate"] == 16000 and info["n_frames"] == 500
        dec, rate, width = ac.decode(payload)
        assert rate == 16000 and np.array_equal(dec[:, 0], sig)

    def test_g711_round_trip_near(self):
        sig = (np.sin(np.arange(300) / 3.0) * 8000).astype(np.int16)
        for law in ("ulaw", "alaw"):
            payload = ac.encode_au(sig, 8000, encoding=law)
            info = ac.probe(payload)
            assert info["encoding"] == law and "_data_off" not in info
            dec, rate, width = ac.decode(payload)
            assert width == 2
            err = np.abs(dec[:, 0].astype(np.int32) - sig.astype(np.int32))
            assert err.max() < 300   # G.711 quantization error bound

    def test_not_au(self):
        assert ac.probe_au(b".sndXX") is None
        assert ac.probe_au(b"RIFF" + b"\x00" * 30) is None


class TestTga:
    def test_rgb_round_trip(self):
        arr = _rgba(7, 11)[:, :, :3]
        tga = ic.encode_tga(arr, "RGB")
        info = ic.probe(tga)
        assert info["format"] == "TGA" and (info["width"], info["height"]) \
            == (11, 7) and info["mode"] == "RGB"
        img = ic.decode(tga)
        assert np.array_equal(img.arr, arr)

    def test_rgba_rle_round_trip(self):
        rng = np.random.RandomState(9)
        # runs + noise to exercise both packet kinds
        arr = np.repeat(rng.randint(0, 256, (5, 4, 4), dtype=np.uint8),
                        5, axis=1)
        arr[2, 7] = [1, 2, 3, 4]
        tga = ic.encode_tga(arr, "RGBA", rle=True)
        img = ic.decode(tga)
        assert img.mode == "RGBA"
        assert np.array_equal(img.arr, arr)

    def test_grayscale(self):
        arr = np.arange(48, dtype=np.uint8).reshape(6, 8)
        img = ic.decode(ic.encode_tga(arr))
        # MiniImage normalizes L to (h, w, 1)
        assert img.mode == "L" and np.array_equal(img.arr[:, :, 0], arr)

    def test_bottom_left_origin_and_15bit(self):
        # hand-built: 2x2 raw truecolor 16-bit, bottom-left origin
        import struct as st
        px = [0b0111110000000000, 0b0000001111100000,   # bottom row: R, G
              0b0000000000011111, 0b0111111111111111]   # top row: B, W
        hdr = st.pack("<BBBHHBHHHHBB", 0, 0, 2, 0, 0, 0, 0, 0, 2, 2, 16, 0)
        body = b"".join(st.pack("<H", v) for v in px)
        img = ic.decode_tga(hdr + body)
        assert tuple(img.arr[1, 0]) == (255, 0, 0)   # flipped to bottom
        assert tuple(img.arr[0, 0]) == (0, 0, 255)
        assert tuple(img.arr[0, 1]) == (255, 255, 255)

    def test_colormapped(self):
        import struct as st
        # 3x1, 8-bit indices into a 2-entry BGR palette, top-left origin
        hdr = st.pack("<BBBHHBHHHHBB", 0, 1, 1, 0, 2, 24, 0, 0, 3, 1, 8,
                      0x20)
        pal = bytes([255, 0, 0,   0, 255, 0])   # blue, green (BGR)
        body = bytes([0, 1, 0])
        img = ic.decode_tga(hdr + pal + body)
        assert tuple(img.arr[0, 0]) == (0, 0, 255)
        assert tuple(img.arr[0, 1]) == (0, 255, 0)

    def test_not_tga(self):
        assert ic.probe_tga(b"\x00" * 18) is None
        assert ic.probe(b"\xff\xfe" + b"\x00" * 40) is None
