"""MP3 / FLAC header-tier metadata (r11, verdict r10 next #7): frame
walk / STREAMINFO parse give real rate/channels/duration for the
majority-of-crawled-audio containers that previously decoded to NULL.

Pinned: fixture differentials (encode_mp3/encode_flac_header round-trip
to exact metadata), ID3 skip, exact frame-walk duration, chained-sync
rejection of random bytes, corruption fuzz, and the audio_decode
dispatch through the Spark plumbing.
"""
import random

import pytest

from tests.conftest import *  # noqa: F401,F403  (spark fixture)

from aggo_spark.operators.multimodal import (
    audio_decode,
    encode_flac_header,
    encode_mp3,
    encode_wav,
    flac_decode,
    mp3_decode,
)


class TestMp3:
    def test_cbr_roundtrip(self):
        m = mp3_decode(encode_mp3(44100, 128, n_frames=38, channels=2))
        assert (m["format"], m["sample_rate"], m["channels"]) == \
            ("mp3", 44100, 2)
        assert m["bits_per_sample"] is None  # lossy: no PCM depth
        assert m["n_frames"] == 38 * 1152
        assert m["duration_s"] == pytest.approx(38 * 1152 / 44100, abs=1e-6)

    def test_mono_and_rates(self):
        for rate in (32000, 44100, 48000):
            m = mp3_decode(encode_mp3(rate, 64, n_frames=5, channels=1))
            assert m["sample_rate"] == rate and m["channels"] == 1

    def test_id3_envelope_skipped(self):
        m = mp3_decode(encode_mp3(48000, 192, n_frames=7, id3=True))
        assert m is not None and m["n_frames"] == 7 * 1152

    def test_frame_walk_is_exact_not_estimated(self):
        # truncate mid-chain: duration reflects the frames actually
        # present, not a byte-length estimate
        full = encode_mp3(44100, 128, n_frames=10)
        flen = 144 * 128000 // 44100
        m = mp3_decode(full[:4 * flen])
        assert m["n_frames"] == 4 * 1152

    def test_lone_sync_rejected(self):
        # a single valid header with no chained second frame is random-
        # byte territory: reject
        one = encode_mp3(44100, 128, n_frames=1)
        assert mp3_decode(one) is None
        random.seed(3)
        junk = bytes(random.randrange(256) for _ in range(4096))
        r = mp3_decode(junk)
        assert r is None or r["n_frames"] >= 2 * 1152

    def test_leading_junk_scan(self):
        b = b"\x00garbage!" * 20 + encode_mp3(44100, 128, n_frames=4)
        m = mp3_decode(b)
        assert m is not None and m["n_frames"] == 4 * 1152

    def test_corruption_fuzz(self):
        blob = encode_mp3(44100, 128, n_frames=6, id3=True)
        for cut in range(0, len(blob), max(1, len(blob) // 80)):
            r = mp3_decode(blob[:cut])
            assert r is None or isinstance(r, dict)
        random.seed(4)
        for _ in range(150):
            ba = bytearray(blob)
            ba[random.randrange(len(ba))] ^= 0xFF
            r = mp3_decode(bytes(ba))
            assert r is None or isinstance(r, dict)


class TestFlac:
    def test_streaminfo_roundtrip(self):
        m = flac_decode(encode_flac_header(48000, 2, 24, 480000))
        assert (m["format"], m["sample_rate"], m["channels"],
                m["bits_per_sample"], m["n_frames"]) == \
            ("flac", 48000, 2, 24, 480000)
        assert m["duration_s"] == pytest.approx(10.0, abs=1e-6)

    def test_unknown_total_null_duration(self):
        m = flac_decode(encode_flac_header(44100, 1, 16, 0))
        assert m["n_frames"] == 0 and m["duration_s"] is None

    def test_corruption_fuzz(self):
        blob = encode_flac_header(44100, 2, 16, 88200)
        for cut in range(len(blob)):
            r = flac_decode(blob[:cut])
            assert r is None or isinstance(r, dict)
        random.seed(5)
        for _ in range(100):
            ba = bytearray(blob)
            ba[random.randrange(len(ba))] ^= 0xFF
            r = flac_decode(bytes(ba))
            assert r is None or isinstance(r, dict)

    def test_not_flac(self):
        assert flac_decode(b"fLaC") is None
        assert flac_decode(b"OggS" + bytes(40)) is None


class TestOgg:
    def test_vorbis_roundtrip(self):
        from aggo_spark.operators.multimodal import encode_ogg, ogg_decode

        m = ogg_decode(encode_ogg("vorbis", 44100, 2,
                                  total_samples=441000))
        assert (m["format"], m["sample_rate"], m["channels"],
                m["n_frames"]) == ("ogg-vorbis", 44100, 2, 441000)
        assert m["duration_s"] == pytest.approx(10.0, abs=1e-6)

    def test_opus_preskip(self):
        from aggo_spark.operators.multimodal import encode_ogg, ogg_decode

        # Opus granules run at 48 kHz and include pre-skip
        m = ogg_decode(encode_ogg("opus", 48000, 1,
                                  total_samples=96000, pre_skip=312))
        assert (m["format"], m["channels"]) == ("ogg-opus", 1)
        assert m["n_frames"] == 96000
        assert m["duration_s"] == pytest.approx(2.0, abs=1e-6)

    def test_false_sync_in_payload(self):
        # r11 review: 'OggS' occurring INSIDE page payload bytes (any
        # compressed stream can contain it) must not be read as a page
        # header — the granule scan validates candidates structurally
        # and falls back to the real final page
        from aggo_spark.operators.multimodal import encode_ogg, ogg_decode

        base = encode_ogg("vorbis", 44100, 2, total_samples=441000)
        # append a trailing page whose PAYLOAD contains a false sync
        # followed by garbage that would decode as a huge granule
        payload = b"xx" + b"OggS" + b"\x99" * 20
        page = (b"OggS\x00\x04" + (441000).to_bytes(8, "little")
                + (1).to_bytes(4, "little") + (2).to_bytes(4, "little")
                + bytes(4) + bytes([1, len(payload)]) + payload)
        m = ogg_decode(base + page)
        assert m["n_frames"] == 441000
        assert m["duration_s"] == pytest.approx(10.0, abs=1e-6)

    def test_multiplexed_foreign_serial_skipped(self):
        # r12 advisory: a multiplexed/chained Ogg interleaves pages from
        # other logical streams — a structurally-valid trailing page with
        # a DIFFERENT bitstream serial must not supply the granule
        from aggo_spark.operators.multimodal import encode_ogg, ogg_decode

        base = encode_ogg("vorbis", 44100, 2, total_samples=441000)
        foreign = (b"OggS\x00\x04" + (999_999_999).to_bytes(8, "little")
                   + (2).to_bytes(4, "little")  # serial 2, id stream is 1
                   + (7).to_bytes(4, "little")
                   + bytes(4) + bytes([1, 3]) + b"zzz")
        m = ogg_decode(base + foreign)
        assert m["n_frames"] == 441000
        assert m["duration_s"] == pytest.approx(10.0, abs=1e-6)

    def test_opus_zero_input_rate_accepted(self):
        # RFC 7845 §5.1: the OpusHead input-rate field is informational
        # and may be 0 — the stream still decodes (at 48 kHz)
        from aggo_spark.operators.multimodal import encode_ogg, ogg_decode

        m = ogg_decode(encode_ogg("opus", 0, 2, total_samples=48000))
        assert m is not None and m["sample_rate"] == 48000
        assert m["duration_s"] == pytest.approx(1.0, abs=1e-6)

    def test_opus_nframes_rate_convention(self):
        # duration_s == n_frames / sample_rate must hold for every
        # audio tier: opus reports the 48 kHz decode rate, never the
        # advisory input rate (r11 review)
        from aggo_spark.operators.multimodal import encode_ogg, ogg_decode

        m = ogg_decode(encode_ogg("opus", 44100, 2,
                                  total_samples=96000, pre_skip=312))
        assert m["sample_rate"] == 48000
        assert m["duration_s"] == pytest.approx(
            m["n_frames"] / m["sample_rate"], abs=1e-6)

    def test_corruption_fuzz(self):
        from aggo_spark.operators.multimodal import encode_ogg, ogg_decode

        blob = encode_ogg("vorbis", 22050, 1, total_samples=4410)
        for cut in range(len(blob)):
            r = ogg_decode(blob[:cut])
            assert r is None or isinstance(r, dict)
        random.seed(6)
        for _ in range(100):
            ba = bytearray(blob)
            ba[random.randrange(len(ba))] ^= 0xFF
            r = ogg_decode(bytes(ba))
            assert r is None or isinstance(r, dict)

    def test_non_audio_ogg(self):
        from aggo_spark.operators.multimodal import ogg_decode

        # a valid page whose payload is neither vorbis nor opus
        assert ogg_decode(b"OggS\x00\x02" + bytes(20) + bytes([1, 5])
                          + b"theor") is None


class TestDispatch:
    def test_audio_decode_routes(self):
        from aggo_spark.operators.multimodal import encode_ogg

        assert audio_decode(encode_wav(8000, 1, 16, 80))["format"] == "wav-pcm"
        assert audio_decode(encode_flac_header())["format"] == "flac"
        assert audio_decode(encode_mp3(n_frames=3))["format"] == "mp3"
        assert audio_decode(encode_ogg())["format"] == "ogg-vorbis"
        assert audio_decode(encode_ogg("opus", 48000))["format"] == "ogg-opus"
        assert audio_decode(b"RIFFxxxx") is None
        assert audio_decode(b"OggSxxxx") is None
        assert audio_decode(b"\x00" * 64) is None

    def test_spark_plumbing(self, spark):
        from aggo_spark.operators.multimodal import decode_audio_metadata

        rows = [
            (1, encode_mp3(44100, 128, n_frames=5)),
            (2, encode_flac_header(96000, 2, 24, 960000)),
            (3, encode_wav(16000, 1, 16, 1600)),
            (4, b"not audio at all"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, content binary")
        out = {r["doc_id"]: r["audio_meta"]
               for r in decode_audio_metadata(df).collect()}
        assert out[1]["format"] == "mp3" and out[1]["n_frames"] == 5 * 1152
        assert out[2]["format"] == "flac" and out[2]["duration_s"] == 10.0
        assert out[3]["format"] == "wav-pcm" and out[3]["duration_s"] == 0.1
        assert out[4] is None
