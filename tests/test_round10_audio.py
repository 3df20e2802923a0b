"""Real audio feature extraction (late r10) — the audio analogue of the
JPEG pixel tier: PCM decode → per-frame FFT → log-band energies → rms /
zcr / spectral centroid / Haitsma-Kalker-style bit fingerprint, all
pure numpy over the same mapInPandas plumbing as the image tier.

Pinned: physical correctness of the DSP (tone centroid/zcr/rms land on
closed-form values), fingerprint robustness (amplitude shifts move ≤ a
few bits; different content differs by ~half the bits), honest
degradation (silence/corrupt/no-samples), and the Spark plumbing.
"""
import numpy as np
import pytest

from tests.conftest import *  # noqa: F401,F403  (spark fixture)

from aggo_spark.operators.multimodal import (
    audio_features,
    encode_wav,
    extract_audio_features,
    wav_pcm,
)


def _ham(a: str, b: str) -> int:
    return bin(int(a, 16) ^ int(b, 16)).count("1")


def _tone(hz, n=16000, rate=16000, amp=0.5):
    t = np.arange(n) / rate
    return amp * np.sin(2 * np.pi * hz * t)


class TestDsp:
    def test_tone_physics(self):
        f = audio_features(encode_wav(16000, 1, 16, 16000, tone_hz=1000.0))
        # closed-form: centroid = the tone frequency, zcr = 2f/rate,
        # rms = amp/sqrt(2)
        assert f["centroid_hz"] == pytest.approx(1000.0, abs=1.0)
        assert f["zcr"] == pytest.approx(2 * 1000 / 16000, abs=0.001)
        assert f["rms"] == pytest.approx(0.5 / np.sqrt(2), abs=0.001)
        # the band holding 1 kHz carries the energy peak
        assert max(f["band_energies"]) == f["band_energies"][
            int(np.argmax(f["band_energies"]))]
        assert f["band_energies"][int(np.argmax(f["band_energies"]))] > 0

    def test_stereo_mono_mix(self):
        b = encode_wav(8000, 2, 16, 4000, tone_hz=500.0)
        x, rate = wav_pcm(b)
        assert rate == 8000 and len(x) == 4000
        assert float(np.abs(x).max()) == pytest.approx(0.5, abs=0.01)

    def test_centroid_tracks_frequency(self):
        f1 = audio_features(encode_wav(16000, 1, 16, 16000, tone_hz=1000.0))
        f3 = audio_features(encode_wav(16000, 1, 16, 16000, tone_hz=3000.0))
        assert f3["centroid_hz"] == pytest.approx(3000.0, abs=1.0)
        assert f1["centroid_hz"] < f3["centroid_hz"]


class TestFingerprint:
    def test_amplitude_robust(self):
        a = audio_features(encode_wav(16000, 1, 16,
                                      samples=_tone(1000)))["afp"]
        b = audio_features(encode_wav(16000, 1, 16,
                                      samples=_tone(1000, amp=0.05)))["afp"]
        assert _ham(a, b) <= 4  # 10x amplitude: quantization-noise bits only

    def test_content_discriminates(self):
        t = np.arange(16000) / 16000.0
        rng = np.random.RandomState(3)
        sigs = [
            _tone(1000),
            0.5 * np.sin(2 * np.pi * (500 + 1500 * t) * t),  # chirp
            0.3 * rng.randn(16000).clip(-1, 1),               # noise
        ]
        fps = [audio_features(encode_wav(16000, 1, 16, samples=s))["afp"]
               for s in sigs]
        for i in range(len(fps)):
            for j in range(i + 1, len(fps)):
                assert _ham(fps[i], fps[j]) >= 20, (i, j)

    def test_deterministic(self):
        s = np.random.RandomState(9).randn(8192).clip(-1, 1) * 0.4
        b = encode_wav(16000, 1, 16, samples=s)
        assert audio_features(b)["afp"] == audio_features(b)["afp"]

    @staticmethod
    def _clip(rate, seconds=3.0):
        """Broadband but band-limited (< 4 kHz) clip rendered at the
        given rate — 64 amplitude-modulated tones spread geometrically
        so every fingerprint band carries REAL energy (a spectrally
        sparse signal leaves floor-dominated bands whose delta signs
        are numerical noise — like real speech/music, the fingerprint
        contract assumes broadband content). Same underlying CONTENT at
        every rate, like a re-encode."""
        t = np.arange(int(rate * seconds)) / rate
        rng = np.random.RandomState(7)
        freqs = np.geomspace(65.0, 3900.0, 64)
        amps = 0.5 + rng.rand(64)
        ph = 2 * np.pi * rng.rand(64)
        mods = 0.5 + 2.5 * rng.rand(64)
        mph = 2 * np.pi * rng.rand(64)
        x = np.zeros_like(t)
        for f, a, p, m, q in zip(freqs, amps, ph, mods, mph):
            x += a * (1 + 0.5 * np.sin(2 * np.pi * m * t + q)) \
                * np.sin(2 * np.pi * f * t + p)
        return 0.4 * x / np.abs(x).max()

    def test_short_high_rate_clip_keeps_fingerprint(self):
        # r11 review: a 50 ms clip at 44.1/48 kHz has >= one NATIVE
        # analysis frame but < one fixed-grid frame after the 8 kHz
        # resample — it must keep an (anchor-bits) fingerprint via
        # zero-padding, not silently drop out of near-dup pairing
        t = np.arange(2205) / 44100.0
        clip = 0.4 * np.sin(2 * np.pi * 880.0 * t)
        a = audio_features(encode_wav(44100, 1, 16, samples=clip))
        b = audio_features(encode_wav(48000, 1, 16, samples=(
            0.4 * np.sin(2 * np.pi * 880.0 * np.arange(2400) / 48000.0))))
        assert a["afp"] is not None and b["afp"] is not None
        assert _ham(a["afp"], b["afp"]) <= 2  # same content, two rates

    def test_rate_invariant(self):
        # verdict r10 next #2: the same clip re-encoded at
        # 8/16/22.05/44.1/48 kHz must fingerprint alike — the fixed
        # internal grid removes the native-rate band-edge/frame
        # dependence (measured ≤ 2 bits across all pairs)
        fps = [audio_features(encode_wav(r, 1, 16,
                                         samples=self._clip(r)))["afp"]
               for r in (8000, 16000, 22050, 44100, 48000)]
        for i in range(len(fps)):
            for j in range(i + 1, len(fps)):
                assert _ham(fps[i], fps[j]) <= 4, (i, j, _ham(fps[i],
                                                              fps[j]))


class TestHonestDegradation:
    def test_silence(self):
        f = audio_features(encode_wav(16000, 1, 16, 8000))
        assert f["rms"] == 0.0
        assert f["centroid_hz"] is None and f["afp"] is None

    def test_no_samples(self):
        f = audio_features(encode_wav(16000, 1, 16, 0))
        assert f is not None and f["rms"] is None

    def test_corrupt(self):
        assert audio_features(b"RIFFxxxx") is None
        assert audio_features(b"") is None

    def test_subframe_clip(self):
        f = audio_features(encode_wav(16000, 1, 16, samples=_tone(440, n=512)))
        assert f["rms"] > 0 and f["afp"] is None  # < one analysis frame


class TestNearDupPairs:
    def test_releveled_copy_pairs_different_does_not(self, spark):
        from pyspark.sql import functions as F

        from aggo_spark.operators.multimodal import (
            audio_near_dup_pairs, extract_audio_features)

        rng = np.random.RandomState(4)
        base = 0.4 * rng.randn(16000).clip(-1, 1)
        rows = [
            (1, encode_wav(16000, 1, 16, samples=base)),
            (2, encode_wav(16000, 1, 16, samples=base * 0.2)),
            (3, encode_wav(16000, 1, 16,
                           samples=0.4 * rng.randn(16000).clip(-1, 1))),
            (4, b"RIFFxxxx"),
            (5, encode_wav(16000, 1, 16, 8000)),  # silence: NULL afp
        ]
        df = spark.createDataFrame(rows, "doc_id long, content binary")
        feats = extract_audio_features(df).select(
            "doc_id", F.col("audio_features.afp").alias("afp"))
        pairs = sorted((r["id_a"], r["id_b"], r["hamming"])
                       for r in audio_near_dup_pairs(
                           feats, max_hamming=6).collect())
        # the 5x re-leveled copy pairs (hamming 0 on the matched block);
        # different content / corrupt / silence never pair
        assert pairs == [(1, 2, 0)]

    def test_resampled_copies_pair(self, spark):
        # verdict r10 next #2 "done" criterion: the SAME clip encoded at
        # three sample rates pairs pairwise within max_hamming
        from pyspark.sql import functions as F

        from aggo_spark.operators.multimodal import (
            audio_near_dup_pairs, extract_audio_features)

        clip = TestFingerprint._clip
        rows = [(i + 1, encode_wav(r, 1, 16, samples=clip(r)))
                for i, r in enumerate((22050, 44100, 48000))]
        rng = np.random.RandomState(11)
        rows.append((9, encode_wav(16000, 1, 16,
                                   samples=0.4 * rng.randn(48000)
                                   .clip(-1, 1))))
        df = spark.createDataFrame(rows, "doc_id long, content binary")
        feats = extract_audio_features(df).select(
            "doc_id", F.col("audio_features.afp").alias("afp"))
        pairs = sorted((r["id_a"], r["id_b"]) for r in
                       audio_near_dup_pairs(feats, max_hamming=6)
                       .collect())
        assert pairs == [(1, 2), (1, 3), (2, 3)]


class TestSparkPlumbing:
    def test_extract_audio_features(self, spark):
        rows = [
            (1, encode_wav(16000, 1, 16, 16000, tone_hz=1000.0)),
            (2, encode_wav(16000, 1, 16, 16000, tone_hz=3000.0)),
            (3, b"RIFFxxxx"),
            (4, encode_wav(16000, 1, 16, 4000)),
        ]
        df = spark.createDataFrame(rows, "doc_id long, content binary")
        out = {r["doc_id"]: r["audio_features"]
               for r in extract_audio_features(df).collect()}
        assert out[1]["centroid_hz"] == pytest.approx(1000.0, abs=1.0)
        assert out[2]["centroid_hz"] == pytest.approx(3000.0, abs=1.0)
        assert out[1]["afp"] != out[2]["afp"]
        assert out[3] is None
        assert out[4]["rms"] == 0.0 and out[4]["afp"] is None
