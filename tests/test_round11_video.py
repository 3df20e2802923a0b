"""AVI (RIFF) + Matroska/WebM (EBML) video header tiers (r11) — the
video analogue of the MP3/FLAC/OGG audio tiers: real container walks
for duration/dimensions/track count, corrupt bytes → None, dispatched
by video_decode (now the decode_video_metadata default alongside MP4).
"""
import random

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.conftest import *  # noqa: F401,F403  (spark fixture)

from aggo_spark.operators.multimodal import (
    avi_decode,
    encode_avi_header,
    encode_mkv_header,
    encode_mp4_header,
    mkv_decode,
    video_decode,
)


class TestAvi:
    def test_roundtrip(self):
        m = avi_decode(encode_avi_header(2.0, 25.0, 1280, 720, 2))
        assert (m["format"], m["width"], m["height"], m["n_tracks"]) == \
            ("avi", 1280, 720, 2)
        assert m["duration_s"] == pytest.approx(2.0, abs=1e-6)

    def test_fuzz_roundtrip(self):
        @settings(max_examples=50, deadline=None)
        @given(dur=st.floats(0.04, 7200, allow_nan=False),
               fps=st.sampled_from([15.0, 24.0, 25.0, 30.0, 60.0]),
               w=st.integers(1, 8192), h=st.integers(1, 8192),
               streams=st.integers(1, 8))
        def check(dur, fps, w, h, streams):
            m = avi_decode(encode_avi_header(dur, fps, w, h, streams))
            assert (m["width"], m["height"], m["n_tracks"]) == \
                (w, h, streams)
            # mirror the header arithmetic exactly: duration quantizes
            # to whole frames AND to integer microseconds-per-frame
            usec = round(1e6 / fps)
            total = round(dur * fps)
            assert m["duration_s"] == pytest.approx(
                total * usec / 1e6, abs=1e-6)

        check()

    def test_corruption(self):
        blob = encode_avi_header()
        for cut in range(len(blob)):
            r = avi_decode(blob[:cut])
            assert r is None or isinstance(r, dict)
        random.seed(8)
        for _ in range(120):
            ba = bytearray(blob)
            ba[random.randrange(len(ba))] ^= 0xFF
            r = avi_decode(bytes(ba))
            assert r is None or isinstance(r, dict)
        assert avi_decode(b"RIFFxxxxWAVE") is None


class TestMkv:
    def test_webm_roundtrip(self):
        m = mkv_decode(encode_mkv_header("webm", 3.5, 1_000_000,
                                         1920, 1080,
                                         extra_audio_track=True))
        assert (m["format"], m["brand"], m["width"], m["height"],
                m["n_tracks"]) == ("webm", "webm", 1920, 1080, 2)
        assert m["duration_s"] == pytest.approx(3.5, abs=1e-6)

    def test_matroska_nondefault_timescale(self):
        m = mkv_decode(encode_mkv_header("matroska", 1.25, 500_000,
                                         640, 480))
        assert m["format"] == "mkv" and m["n_tracks"] == 1
        assert m["duration_s"] == pytest.approx(1.25, abs=1e-6)

    def test_fuzz_roundtrip(self):
        @settings(max_examples=50, deadline=None)
        @given(doctype=st.sampled_from(["matroska", "webm"]),
               dur=st.floats(0.001, 86400, allow_nan=False),
               tscale=st.sampled_from([100_000, 500_000, 1_000_000]),
               w=st.integers(1, 65535), h=st.integers(1, 65535),
               audio=st.booleans())
        def check(doctype, dur, tscale, w, h, audio):
            m = mkv_decode(encode_mkv_header(doctype, dur, tscale, w, h,
                                             extra_audio_track=audio))
            assert (m["brand"], m["width"], m["height"],
                    m["n_tracks"]) == (doctype, w, h, 2 if audio else 1)
            assert m["duration_s"] == pytest.approx(dur, rel=1e-9,
                                                    abs=1e-6)

        check()

    def test_corruption(self):
        blob = encode_mkv_header("webm", 3.0)
        for cut in range(len(blob)):
            r = mkv_decode(blob[:cut])
            assert r is None or isinstance(r, dict)
        random.seed(9)
        for _ in range(120):
            ba = bytearray(blob)
            ba[random.randrange(len(ba))] ^= 0xFF
            r = mkv_decode(bytes(ba))
            assert r is None or isinstance(r, dict)


class TestDispatch:
    def test_video_decode_routes(self):
        assert video_decode(encode_mp4_header(1.5))["format"] == "mp4"
        assert video_decode(encode_avi_header())["format"] == "avi"
        assert video_decode(encode_mkv_header())["format"] == "mkv"
        assert video_decode(encode_mkv_header("webm"))["format"] == "webm"
        assert video_decode(b"RIFFxxxxWAVE") is None
        assert video_decode(b"\x00" * 32) is None

    def test_spark_plumbing(self, spark):
        from aggo_spark.operators.multimodal import decode_video_metadata

        rows = [
            (1, encode_mp4_header(2.5, 640, 360)),
            (2, encode_mkv_header("webm", 4.0, 1_000_000, 320, 180)),
            (3, encode_avi_header(1.0, 25.0, 160, 120, 1)),
            (4, b"not video"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, content binary")
        out = {r["doc_id"]: r["video_meta"]
               for r in decode_video_metadata(df).collect()}
        assert out[1]["format"] == "mp4" and out[1]["duration_s"] == 2.5
        assert out[2]["format"] == "webm" and out[2]["width"] == 320
        assert out[3]["format"] == "avi" and out[3]["height"] == 120
        assert out[4] is None
