"""Pure-stdlib WAV codec: real audio kernels without ffmpeg
(functions/audio_codec.py) and their wiring through the audio-function
surface."""

from __future__ import annotations

import json

import numpy as np
import pytest
from pyspark.sql import functions as F

from pixeltable_spark.functions import audio as pxa
from pixeltable_spark.functions import audio_codec as ac


def _sine_wav(freq=440.0, rate=8000, seconds=1.0, channels=1,
              amp=10000) -> bytes:
    t = np.arange(int(rate * seconds)) / rate
    mono = (amp * np.sin(2 * np.pi * freq * t)).astype(np.int16)
    arr = np.stack([mono] * channels, axis=1)
    return ac.encode(arr, rate, 2)


class TestCodecCore:
    def test_probe_and_roundtrip(self):
        wav = _sine_wav(channels=2)
        info = ac.probe(wav)
        assert info["channels"] == 2 and info["sample_rate"] == 8000
        assert info["duration_s"] == pytest.approx(1.0)
        arr, rate, width = ac.decode(wav)
        assert arr.shape == (8000, 2) and rate == 8000 and width == 2
        assert ac.decode(ac.encode(arr, rate, width))[0].tolist() == arr.tolist()

    def test_probe_rejects_non_wav(self):
        assert ac.probe(b"definitely not riff data....") is None

    def test_volume_and_normalize(self):
        wav = _sine_wav(amp=1000)
        loud, _r, _w = ac.decode(ac.multiply_volume(wav, 2.0))
        assert abs(loud).max() == pytest.approx(2000, abs=2)
        norm, _r, _w = ac.decode(ac.normalize(wav, target_db=0.0))
        assert abs(norm).max() == pytest.approx(32767, abs=40)

    def test_fades(self):
        wav = _sine_wav(seconds=0.5)
        fin, _r, _w = ac.decode(ac.fade_in(wav, 0.25))
        assert abs(fin[0]).max() <= 1  # starts silent
        fout, _r, _w = ac.decode(ac.fade_out(wav, 0.25))
        assert abs(fout[-1]).max() <= 1  # ends silent

    def test_clip_and_mono_and_concat(self):
        wav = _sine_wav(seconds=1.0, channels=2)
        half, rate, _w = ac.decode(ac.clip(wav, 0.25, 0.75))
        assert len(half) == 4000
        mono, _r, _w = ac.decode(ac.to_mono(wav))
        assert mono.shape[1] == 1
        both, _r, _w = ac.decode(ac.concat([wav, wav]))
        assert len(both) == 16000


class TestAudioFunctionsReal:
    @pytest.fixture()
    def wav_df(self, spark):
        return spark.createDataFrame(
            [(1, _sine_wav()), (2, b"not audio data ............")],
            "media_id long, payload binary")

    def test_metadata_real_vs_fallback(self, wav_df):
        rows = {r["media_id"]: json.loads(r["m"]) for r in wav_df.select(
            "media_id", pxa.get_metadata(F.col("payload")).alias("m")
        ).collect()}
        assert rows[1]["sample_rate"] == 8000
        assert rows[1]["duration_s"] == pytest.approx(1.0)
        assert set(rows[2]) == {"n_bytes"}  # non-WAV: length only

    def test_transforms_real_for_wav_stub_for_other(self, wav_df):
        rows = {r["media_id"]: r["v"] for r in wav_df.select(
            "media_id",
            pxa.multiply_volume(F.col("payload"), 0.5).alias("v"),
        ).collect()}
        arr, rate, _w = ac.decode(bytes(rows[1]))  # real WAV out
        assert rate == 8000 and abs(arr).max() == pytest.approx(5000, abs=2)
        assert len(rows[2]) == 16  # md5 stub for non-audio

    def test_clip_through_surface(self, wav_df):
        rows = wav_df.filter("media_id = 1").select(
            pxa.clip(F.col("payload"), 0.0, 0.5).alias("c")).collect()
        arr, rate, _w = ac.decode(bytes(rows[0]["c"]))
        assert len(arr) == 4000


class TestG711:
    """G.711 u-law/A-law (ITU-T, public): the telephony WAV variants the
    stdlib wave module refuses — decoded via exact 256-entry LUTs."""

    def test_code_tables_roundtrip_exact(self):
        import numpy as np
        from pixeltable_spark.functions import audio_codec as ac
        for law, fmt in (("ulaw", 7), ("alaw", 6)):
            table = ac._G711_TABLES[fmt]
            wav = ac.encode_g711(table.astype(np.int16)[:, None], 8000, law)
            dec, rate = ac.decode_g711(wav)
            assert rate == 8000 and np.array_equal(dec[:, 0], table), law

    def test_sine_roundtrip_within_quant_error(self):
        import numpy as np
        from pixeltable_spark.functions import audio_codec as ac
        t = np.arange(4000)
        s = (8000 * np.sin(2 * np.pi * 220 * t / 8000)).astype(np.int16)
        for law in ("ulaw", "alaw"):
            d, _ = ac.decode_g711(ac.encode_g711(s, 8000, law))
            assert np.abs(d[:, 0].astype(int) - s.astype(int)).max() < 600

    def test_probe_and_decode_route_g711(self):
        import numpy as np
        from pixeltable_spark.functions import audio_codec as ac
        s = (np.arange(200) % 100 * 50).astype(np.int16)
        wav = ac.encode_g711(s, 8000, "ulaw")
        info = ac.probe(wav)
        assert info["encoding"] == "ulaw" and info["n_frames"] == 200
        assert info["sample_rate"] == 8000
        samples, rate, width = ac.decode(wav)
        assert width == 2 and rate == 8000 and samples.shape == (200, 1)

    def test_stereo(self):
        import numpy as np
        from pixeltable_spark.functions import audio_codec as ac
        s = np.stack([np.arange(100) * 100, -np.arange(100) * 100],
                     axis=1).astype(np.int16)
        d, rate = ac.decode_g711(ac.encode_g711(s, 16000, "alaw"))
        assert d.shape == (100, 2) and rate == 16000


class TestAudioAnalysis:
    """rms / zero-crossing / silence + energy-delta fingerprint feeding
    dedup.hamming_pairs (cross-modal dedup family)."""

    def _wav(self, seed=0, n=8000, rate=8000, amp=8000):
        import numpy as np

        from pixeltable_spark.functions import audio_codec as ac
        rng = np.random.RandomState(seed)
        sig = (rng.randn(n) * amp).clip(-30000, 30000).astype(np.int16)
        return sig, ac.encode(sig.reshape(-1, 1), rate)

    def test_rms_and_zcr(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from pixeltable_spark.functions.audio import (
            rms_energy, zero_crossing_rate)
        sig, p = self._wav()
        df = spark.createDataFrame([(1, bytearray(p))], ["media_id", "payload"])
        row = df.select(rms_energy(F.col("payload")).alias("r"),
                        zero_crossing_rate(F.col("payload")).alias("z")) \
                .collect()[0]
        assert abs(row["r"] - float(np.sqrt((sig.astype(np.float64) ** 2)
                                            .mean()))) < 1e-9
        assert 0.3 < row["z"] < 0.7  # white noise crosses ~half the time

    def test_silence_ratio(self, spark):
        import numpy as np
        from pyspark.sql import functions as F

        from pixeltable_spark.functions import audio_codec as ac
        from pixeltable_spark.functions.audio import silence_ratio
        loud = (np.sin(np.linspace(0, 600, 4000)) * 20000).astype(np.int16)
        quiet = np.zeros(4000, dtype=np.int16)
        p = ac.encode(np.concatenate([loud, quiet]).reshape(-1, 1), 8000)
        df = spark.createDataFrame([(1, bytearray(p))], ["media_id", "payload"])
        r = df.select(silence_ratio(F.col("payload")).alias("s")).collect()[0]["s"]
        assert 0.4 < r < 0.6

    def test_fingerprint_dedup(self, spark):
        from pyspark.sql import functions as F

        from pixeltable_spark.functions.audio import audio_fingerprint
        from pixeltable_spark.operators.dedup import hamming_pairs
        _, pa = self._wav(seed=1)
        _, pb = self._wav(seed=2)
        df = spark.createDataFrame(
            [(1, bytearray(pa)), (2, bytearray(pa)), (3, bytearray(pb))],
            ["doc_id", "payload"])
        fps = df.select("doc_id", audio_fingerprint(F.col("payload")).alias("h"))
        vals = {r["doc_id"]: r["h"] for r in fps.collect()}
        assert vals[1] == vals[2] != vals[3]
        pairs = {(r["id_a"], r["id_b"])
                 for r in hamming_pairs(fps, "h", max_hamming=4).collect()}
        assert pairs == {(1, 2)}
