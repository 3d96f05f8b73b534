"""Windowed-sinc sample-rate conversion (audio_codec.py sinc_resample /
resample_payload; Smith's bandlimited resampling construction — real
derivable DSP, no codec tables)."""
import numpy as np
import pytest

from pixeltable_spark.functions import audio_codec as ac


def _sine(freq, rate, secs=0.5, amp=10000):
    t = np.arange(int(rate * secs)) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.int16)


def _dominant_freq(x, rate):
    x = np.asarray(x, np.float64)
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    return np.fft.rfftfreq(len(x), 1 / rate)[int(np.argmax(spec))]


class TestSincResample:
    def test_dc_exact(self):
        x = np.full(4000, 1234, np.int16)
        up = ac.sinc_resample(x, 8000, 16000)
        assert len(up) == 8000
        assert np.abs(up[100:-100].astype(int) - 1234).max() <= 1

    @pytest.mark.parametrize("sr_out", [16000, 11025, 4000])
    def test_tone_frequency_preserved(self, sr_out):
        x = _sine(440, 8000)
        y = ac.sinc_resample(x, 8000, sr_out)
        assert len(y) == round(len(x) * sr_out / 8000)
        assert abs(_dominant_freq(y, sr_out) - 440) < 8

    def test_round_trip_correlation(self):
        x = _sine(440, 8000)
        y = ac.sinc_resample(ac.sinc_resample(x, 8000, 16000),
                             16000, 8000)
        n = min(len(x), len(y))
        a, b = x[200:n - 200].astype(float), y[200:n - 200].astype(float)
        corr = np.dot(a, b) / np.sqrt(np.dot(a, a) * np.dot(b, b))
        assert corr > 0.999

    def test_antialiasing_on_downsample(self):
        # 3.5 kHz tone at 8 kHz -> 4 kHz (Nyquist 2 kHz): the tone is
        # above the new Nyquist and must be strongly attenuated, NOT
        # folded to 500 Hz at full amplitude
        x = _sine(3500, 8000)
        y = ac.sinc_resample(x, 8000, 4000).astype(np.float64)
        in_rms = np.sqrt(np.mean(x.astype(np.float64) ** 2))
        out_rms = np.sqrt(np.mean(y ** 2))
        assert out_rms < in_rms * 0.25

    def test_stereo_shape(self):
        x = np.stack([_sine(440, 8000), _sine(880, 8000)], axis=1)
        y = ac.sinc_resample(x, 8000, 12000)
        assert y.shape == (round(x.shape[0] * 1.5), 2)
        assert abs(_dominant_freq(y[:, 1], 12000) - 880) < 10

    def test_payload_round_trip(self):
        wav = ac.encode(_sine(440, 8000), 8000)
        out = ac.resample_payload(wav, 16000)
        samples, rate, _w = ac.decode(out)
        assert rate == 16000
        assert abs(_dominant_freq(samples[:, 0], 16000) - 440) < 8

    def test_same_rate_identity(self):
        x = _sine(440, 8000)
        assert ac.sinc_resample(x, 8000, 8000) is x

    def test_spark_fn(self, spark):
        from pixeltable_spark.functions import audio as pxta
        from pyspark.sql import functions as F

        wav = ac.encode(_sine(440, 8000), 8000)
        df = spark.createDataFrame([(bytearray(wav),)], "a binary")
        out = df.select(pxta.resample(F.col("a"), 16000).alias("r")) \
            .collect()[0]["r"]
        samples, rate, _w = ac.decode(bytes(out))
        assert rate == 16000 and len(samples) == 16000 * len(wav) // 1 \
            or rate == 16000


class TestSpectralFeatures:
    """Spectral summary + mel filterbank (audio_codec.spectral_features
    / mel_filterbank_energies — textbook MIR definitions)."""

    def test_pure_tone_centroid_and_flatness(self):
        rate, n = 8192, 1024
        k = 100                              # bin-aligned: 800 Hz
        t = np.arange(n) / rate
        x = (8000 * np.sin(2 * np.pi * 8 * k * t)).astype(np.int16)
        f = ac.spectral_features(x, rate)
        assert abs(f["centroid_hz"] - 800) < 5
        assert f["rolloff_hz"] == pytest.approx(800, abs=8)
        assert f["flatness"] < 0.01          # pure tone
        assert f["zcr"] == pytest.approx(2 * 800 / rate, rel=0.05)

    def test_white_noise_flatness_high(self):
        rng = np.random.RandomState(0)
        x = rng.randint(-8000, 8000, 8192).astype(np.int16)
        f = ac.spectral_features(x, 8192)
        assert f["flatness"] > 0.3
        assert 1500 < f["centroid_hz"] < 2600   # ~half Nyquist

    def test_silence(self):
        f = ac.spectral_features(np.zeros(1000, np.int16), 8000)
        assert f["centroid_hz"] == 0.0 and f["rms"] == 0.0

    def test_mel_energies_tone_localized(self):
        rate, n = 8192, 4096
        t = np.arange(n) / rate
        x = (8000 * np.sin(2 * np.pi * 1000 * t)).astype(np.int16)
        e = ac.mel_filterbank_energies(x, rate, n_mels=20)
        assert e.shape == (20,)
        # the band containing 1 kHz dominates
        def to_mel(f): return 2595 * np.log10(1 + f / 700)
        pts = 700 * (10 ** (np.linspace(0, to_mel(rate / 2), 22)
                            / 2595) - 1)
        want = int(np.argmax(np.argmax(
            [(pts[i] <= 1000 <= pts[i + 2]) for i in range(20)])) or 0)
        assert abs(int(np.argmax(e)) - np.argmax(
            [(pts[i] <= 1000 <= pts[i + 2]) for i in range(20)])) <= 1

    def test_spark_struct_and_array(self, spark):
        from pixeltable_spark.functions import audio as pxta
        from pyspark.sql import functions as F

        t = np.arange(8192) / 8192
        wav = ac.encode((8000 * np.sin(2 * np.pi * 440 * t))
                        .astype(np.int16), 8192)
        df = spark.createDataFrame(
            [(bytearray(wav),), (bytearray(b"junk"),)], "a binary")
        rows = df.select(
            pxta.spectral_features(F.col("a")).alias("f"),
            pxta.mel_energies(F.col("a"), 16).alias("m")).collect()
        good, bad = rows
        assert abs(good["f"]["centroid_hz"] - 440) < 10
        assert len(good["m"]) == 16
        assert bad["f"] is None or bad["f"]["centroid_hz"] is None
        assert bad["m"] is None
