"""FLAC codec (functions/flac_codec.py): lossless round-trips through
our own encoder, plus hand-built bitstreams for the decoder paths the
encoder does not emit (LPC subframes, mid/right-side stereo, the Rice
escape code, wasted bits)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pixeltable_spark.functions import flac_codec as fc
from pixeltable_spark.functions.flac_codec import (_BitsW, _crc8, _crc16,
                                                   _utf8_number,
                                                   decode_flac, encode_flac,
                                                   probe_flac)


def _signal(n=6000, ch=1, amp=9000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 40, n)
    cols = [(np.sin(t * (1 + c)) * amp + rng.integers(-50, 50, n))
            .astype(np.int32) for c in range(ch)]
    return np.stack(cols, axis=1)


class TestRoundtrip:
    def test_mono_stereo_exact(self):
        for ch in (1, 2):
            a = _signal(ch=ch)
            out, rate, bits = decode_flac(encode_flac(a, 22050))
            assert rate == 22050 and bits == 16
            assert (out == a).all()

    def test_left_side_stereo_exact(self):
        a = _signal(ch=2)
        p = encode_flac(a, 16000, stereo_mode="left-side")
        out, _, _ = decode_flac(p)
        assert (out == a).all()

    def test_multiple_blocks_and_partial_tail(self):
        a = _signal(n=10000)
        p = encode_flac(a, 8000, block_size=4096)  # 2 full + 1 partial
        out, _, _ = decode_flac(p)
        assert (out == a).all()

    def test_compresses_smooth_audio(self):
        a = (np.sin(np.linspace(0, 60, 20000)) * 12000).astype(np.int32)
        p = encode_flac(a, 16000)
        assert len(p) < 0.3 * a.size * 2  # real compression, not a wrapper

    def test_probe(self):
        a = _signal(n=4444, ch=2)
        info = probe_flac(encode_flac(a, 44100))
        assert info["channels"] == 2 and info["sample_rate"] == 44100
        assert info["n_frames"] == 4444
        assert info["bits_per_sample"] == 16

    def test_not_flac(self):
        assert probe_flac(b"RIFF....WAVE") is None
        with pytest.raises(ValueError):
            decode_flac(b"not flac data at all, truly")


def _frame(subframe_bits_fn, n, rate=8000, bits=16, ch_code=0,
           nch=1, total=None):
    """Hand-build a one-frame FLAC stream; subframe_bits_fn(bw) writes
    the subframe(s)."""
    out = bytearray(b"fLaC")
    si = _BitsW()
    si.write(n, 16); si.write(n, 16)
    si.write(0, 24); si.write(0, 24)
    si.write(rate, 20); si.write(nch - 1, 3); si.write(bits - 1, 5)
    si.write(total if total is not None else n, 36)
    body = si.bytes() + b"\x00" * 16
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body
    hw = _BitsW()
    hw.write(0x3FFE, 14); hw.write(0, 1); hw.write(0, 1)
    hw.write(7, 4)   # 16-bit blocksize-1 follows
    hw.write(0, 4)   # rate from streaminfo
    hw.write(ch_code, 4)
    hw.write(4, 3)   # 16-bit samples
    hw.write(0, 1)
    head = bytearray(hw.bytes())
    head += _utf8_number(0)
    head += struct.pack(">H", n - 1)
    head.append(_crc8(bytes(head)))
    fw = _BitsW()
    fw.buf = bytearray(head)
    subframe_bits_fn(fw)
    fw.align()
    frame = bytes(fw.buf)
    return bytes(out + frame + struct.pack(">H", _crc16(frame)))


class TestHandBuiltPaths:
    def test_lpc_subframe(self):
        """Order-1 LPC, coef 2 with shift 1 (i.e. predictor x[i-1]):
        warmup 100, residuals +1 each -> 100,101,102,..."""
        n = 8

        def sub(bw):
            bw.write(0, 1)
            bw.write(32 + 0, 6)   # LPC order 1 (type 100000 = 32 + order-1)
            bw.write(0, 1)        # no wasted bits
            bw.write(100, 16)     # warmup
            bw.write(3, 4)        # precision-1 = 3 -> 4 bits
            bw.write(1, 5)        # shift 1
            bw.write(2, 4)        # qcoef = 2 -> pred = (2*prev)>>1 = prev
            bw.write(0, 2)        # rice
            bw.write(0, 4)        # partition order 0
            bw.write(0, 4)        # rice param 0
            for _ in range(n - 1):  # residual +1 -> zigzag 2 -> unary 2,"1"
                bw.write_unary(2)

        out, rate, bits = decode_flac(_frame(sub, n))
        assert list(out[:, 0]) == [100 + i for i in range(n)]

    def test_rice_escape_raw_residual(self):
        n = 4

        def sub(bw):
            bw.write(0, 1)
            bw.write(8, 6)        # FIXED order 0
            bw.write(0, 1)
            bw.write(0, 2)        # rice 4-bit params
            bw.write(0, 4)        # partition order 0
            bw.write(0xF, 4)      # escape
            bw.write(7, 5)        # 7 raw bits per residual
            for v in (5, -5, 63, -64):
                bw.write(v & 0x7F, 7)

        out, _, _ = decode_flac(_frame(sub, n))
        assert list(out[:, 0]) == [5, -5, 63, -64]

    def test_wasted_bits(self):
        n = 3

        def sub(bw):
            bw.write(0, 1)
            bw.write(0, 6)        # CONSTANT
            bw.write(1, 1)        # wasted bits follow
            bw.write_unary(1)     # 2 wasted bits
            bw.write(25, 14)      # constant value in bits-wasted width

        out, _, _ = decode_flac(_frame(sub, n))
        assert list(out[:, 0]) == [100, 100, 100]  # 25 << 2

    def test_mid_side_and_right_side(self):
        left = np.array([100, 104, 96, 120], dtype=np.int64)
        right = np.array([90, 98, 100, 118], dtype=np.int64)
        n = 4

        def verbatim(bw, vals, bits):
            bw.write(0, 1)
            bw.write(1, 6)
            bw.write(0, 1)
            for v in vals:
                bw.write(int(v), bits)

        def ms(bw):
            mid = (left + right) >> 1
            side = left - right
            verbatim(bw, mid, 16)
            verbatim(bw, side, 17)

        out, _, _ = decode_flac(_frame(ms, n, ch_code=10, nch=2))
        assert (out[:, 0] == left).all() and (out[:, 1] == right).all()

        def rs(bw):
            side = left - right
            verbatim(bw, side, 17)
            verbatim(bw, right, 16)

        out, _, _ = decode_flac(_frame(rs, n, ch_code=9, nch=2))
        assert (out[:, 0] == left).all() and (out[:, 1] == right).all()


class TestAudioCodecIntegration:
    def test_probe_and_decode_dispatch(self):
        from pixeltable_spark.functions import audio_codec as ac
        a = _signal(n=2000, ch=2)
        p = encode_flac(a, 16000)
        info = ac.probe(p)
        assert info["format"] == "FLAC" and info["channels"] == 2
        samples, rate, width = ac.decode(p)
        assert rate == 16000 and width == 2
        assert (samples == a).all()

    def test_wav_transforms_work_on_flac_input(self):
        from pixeltable_spark.functions import audio_codec as ac
        a = _signal(n=2000, ch=1)
        p = encode_flac(a, 16000)
        louder = ac.multiply_volume(p, 0.5)
        s2, _, _ = ac.decode(louder)  # transforms emit WAV
        assert abs(int(s2[100, 0]) - int(a[100, 0] * 0.5)) <= 1


class TestMp3Probe:
    """MP3 frame-header metadata (ISO 11172-3 layout) — hand-built
    headers; decode stays gated with a precise message."""

    @staticmethod
    def _frame_header(bitrate_idx=9, sr_idx=0, mono=False):
        # MPEG1 Layer III: ver bits 11, layer bits 01
        b1 = 0xFF
        b2 = 0xE0 | (3 << 3) | (1 << 1)
        b3 = (bitrate_idx << 4) | (sr_idx << 2)
        b4 = (3 << 6) if mono else 0x00
        return bytes([b1, b2, b3, b4])

    def test_cbr_stereo(self):
        from pixeltable_spark.functions.audio_codec import probe_mp3
        hdr = self._frame_header(bitrate_idx=9, sr_idx=0)  # 128k, 44100
        payload = hdr + b"\x00" * 16000  # ~1 s at 128 kbps
        info = probe_mp3(payload)
        assert info["sample_rate"] == 44100
        assert info["bitrate_kbps"] == 128 and info["channels"] == 2
        assert not info["vbr"]
        assert 0.9 < info["duration_s"] < 1.1

    def test_xing_vbr_exact_frames(self):
        from pixeltable_spark.functions.audio_codec import probe_mp3
        hdr = self._frame_header(mono=False)
        side = b"\x00" * 32  # MPEG1 stereo side info
        xing = b"Xing" + (1).to_bytes(4, "big") + (38).to_bytes(4, "big")
        payload = hdr + side + xing + b"\x00" * 400
        info = probe_mp3(payload)
        assert info["vbr"] and info["n_frames"] == 38
        # 38 frames * 1152 / 44100
        assert abs(info["duration_s"] - 38 * 1152 / 44100) < 1e-3

    def test_id3v2_skip_and_dispatch(self):
        from pixeltable_spark.functions import audio_codec as ac
        tag = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10
        payload = tag + self._frame_header(mono=True) + b"\x00" * 4000
        info = ac.probe(payload)
        assert info["format"] == "MP3" and info["channels"] == 1
        import pytest as _pytest
        with _pytest.raises(ValueError, match="MP3 decode requires"):
            ac.decode(payload)
