"""IMA ADPCM WAV (fmt 0x11) codec: round trips, hand-computed reference
blocks from the IMA spec algorithm, and wiring through the audio waist.
Reference parity: pixeltable decodes ADPCM WAVs via PyAV/ffmpeg (reference
functions/audio.py); this pins the pure-python equivalent."""

from __future__ import annotations

import struct

import numpy as np

from pixeltable_spark.functions import audio_codec as ac


def _sine(n=5000, rate=8000, freq=440.0, amp=12000, ch=1, seed=0):
    t = np.arange(n) / rate
    base = np.sin(2 * np.pi * freq * t) * amp
    if ch == 2:
        return np.stack([base, np.roll(base, 7)], axis=1).astype(np.int16)
    return base.astype(np.int16)[:, None]


def _snr_db(ref: np.ndarray, out: np.ndarray) -> float:
    ref = ref.astype(np.float64)
    err = out.astype(np.float64) - ref
    return 10 * np.log10((ref ** 2).sum() / max((err ** 2).sum(), 1e-9))


class TestImaAdpcm:
    def test_mono_roundtrip_snr_and_size(self):
        arr = _sine()
        blob = ac.encode_ima_adpcm(arr, 8000)
        info = ac.probe(blob)
        assert info["format"] == "WAV" and info["encoding"] == "ima_adpcm"
        assert info["channels"] == 1 and info["sample_rate"] == 8000
        assert info["n_frames"] == 5000
        out, rate, width = ac.decode(blob)
        assert rate == 8000 and width == 2
        assert out.shape == arr.shape
        assert _snr_db(arr, out) > 25          # 4-bit ADPCM on a smooth sine
        # ~4:1 vs int16 PCM (plus padding of the last partial block)
        assert len(blob) < arr.size * 2 * 0.35

    def test_stereo_roundtrip(self):
        arr = _sine(ch=2)
        blob = ac.encode_ima_adpcm(arr, 16000, block_align=256)
        info = ac.probe(blob)
        assert info["channels"] == 2 and info["n_frames"] == 5000
        out, rate, _ = ac.decode(blob)
        assert out.shape == arr.shape
        # channels must not be swapped or interleaved wrongly
        assert _snr_db(arr[:, 0], out[:, 0]) > 25
        assert _snr_db(arr[:, 1], out[:, 1]) > 25

    def test_hand_computed_reference_block(self):
        # one mono block, predictor 100, index 5 (step 12), nibbles 2,9,15,0
        # IMA algorithm by hand:
        #  n=2: diff=12>>3 + 12>>1 = 1+6=7 -> 107; idx 5-1=4 (step 11)
        #  n=9: diff=11>>3 + 11>>2 = 1+2=3 -> 104; idx 4-1=3 (step 10)
        #  n=15: diff=10>>3+10>>2+10>>1+10=1+2+5+10=18 -> 86; idx 3+8=11 (21)
        #  n=0: diff=21>>3=2 -> 88; idx 11-1=10
        body = bytes([(9 << 4) | 2, (0 << 4) | 15])  # low nibble first
        block = struct.pack("<hBx", 100, 5) + body + b"\x00\x00"
        data = block
        hdr = b"WAVE" + b"fmt " + struct.pack("<I", 20) + struct.pack(
            "<HHIIHHHH", 0x11, 1, 8000, 4000, len(data), 4, 2, 9)
        hdr += b"data" + struct.pack("<I", len(data)) + data
        blob = b"RIFF" + struct.pack("<I", len(hdr)) + hdr
        out, rate = ac.decode_ima_adpcm(blob)
        assert rate == 8000
        assert out[:5, 0].tolist() == [100, 107, 104, 86, 88]

    def test_clamping_at_int16_limits(self):
        arr = np.full((2000, 1), 32767, dtype=np.int16)
        arr[1::2] = -32768
        blob = ac.encode_ima_adpcm(arr, 8000)
        out, _, _ = ac.decode(blob)       # must not overflow/throw
        assert out.shape == arr.shape
        assert int(out.max()) <= 32767 and int(out.min()) >= -32768

    def test_transform_surface_accepts_adpcm(self):
        # the generic audio ops decode ADPCM and re-emit PCM
        arr = _sine(n=3000)
        blob = ac.encode_ima_adpcm(arr, 8000)
        quieter = ac.multiply_volume(blob, 0.5)
        out, rate, width = ac.decode(quieter)
        assert rate == 8000 and width == 2
        assert abs(out.astype(np.float64).std() -
                   0.5 * arr.astype(np.float64).std()) < 250

    def test_duration_metadata(self):
        arr = _sine(n=8000)
        blob = ac.encode_ima_adpcm(arr, 8000)
        assert abs(ac.probe(blob)["duration_s"] - 1.0) < 1e-6
