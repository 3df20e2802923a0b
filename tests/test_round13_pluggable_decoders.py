"""Round 13: the production decoder escape hatch actually fits the
schema (r12 verdict next #6).

The image/video tiers document "production plugs in pil_decode /
pyav" for codecs the pure-Python kernels don't cover (lossy WebP,
H.264). These tests ROUTE a real third-party decoder through the same
``decoder=`` plug-in point and assert the contract fields — proving
the escape hatch is a working integration, not a docstring. In this
container PIL/pyav are absent, so they skip (never fail); on a
machine with the libs they run for real. The always-on tests pin the
plug-in mechanics themselves with a hand-rolled decoder, so the
closure-serialization path is exercised here too.
"""

from __future__ import annotations

import importlib.util

import pytest
from pyspark.sql import functions as F

from aggo_spark.operators import multimodal as M

HAVE_PIL = importlib.util.find_spec("PIL") is not None
HAVE_AV = importlib.util.find_spec("av") is not None


class TestCustomDecoderPlumbing:
    """Always-on: any bytes->dict callable rides the same Arrow batch
    path and schema; the decoder choice is driver-side only."""

    def test_custom_image_decoder_fits_schema(self, spark):
        def decoder(b):
            if b is None or len(b) < 4:
                return None
            return {"byte_len": len(b), "format": "custom",
                    "width": 1, "height": 2, "channels": 3,
                    "channel_means": [1.0, 2.0, 3.0],
                    "phash": "00" * 8}

        df = spark.createDataFrame(
            [(1, b"blobblob"), (2, b"x"), (3, None)],
            "doc_id long, content binary")
        rows = {r["doc_id"]: r["img_meta"]
                for r in M.decode_image_metadata(
                    df, decoder=decoder).collect()}
        assert rows[1]["format"] == "custom"
        assert rows[1]["channel_means"] == [1.0, 2.0, 3.0]
        assert rows[2] is None and rows[3] is None

    def test_custom_video_frame_decoder_fits_schema(self, spark):
        def decoder(b):
            return {"byte_len": len(b), "format": "customvid",
                    "frame_count": 2, "width": 4, "height": 4,
                    "sampled_frames": [0, 1],
                    "frame_phashes": ["ab" * 8, "cd" * 8],
                    "channel_means": [0.5]}

        df = spark.createDataFrame(
            [(1, b"vidbytes")], "doc_id long, content binary")
        m = M.decode_video_frames(df, decoder=decoder).collect()[0][
            "frame_meta"]
        assert m["frame_phashes"] == ["ab" * 8, "cd" * 8]
        # and the contract feeds video_near_dup_pairs' phash_to_long
        flat = M.decode_video_frames(df, decoder=decoder).select(
            F.col("frame_meta.frame_phashes").alias("p"))
        longs = flat.select(
            M.phash_to_long(F.element_at("p", 1)).alias("v")).collect()
        assert longs[0]["v"] is not None


@pytest.mark.skipif(not HAVE_PIL, reason="Pillow not in this container")
class TestPilEscapeHatch:
    def test_pil_decode_through_image_tier(self, spark):
        png = M.encode_png(16, 8, (10, 200, 30))
        df = spark.createDataFrame(
            [(1, png), (2, b"junk bytes"), (3, None)],
            "doc_id long, content binary")
        rows = {r["doc_id"]: r["img_meta"]
                for r in M.decode_image_metadata(
                    df, decoder=M.pil_decode).collect()}
        m = rows[1]
        assert (m["format"], m["width"], m["height"], m["channels"]) == (
            "png", 16, 8, 3)
        # differential vs the pure-Python kernel on the same bytes
        ours = M.py_decode(png)
        assert m["phash"] == ours["phash"]
        for a, b in zip(m["channel_means"], ours["channel_means"]):
            assert abs(a - b) < 1e-6
        assert rows[2] is None and rows[3] is None  # quarantine parity

    def test_pil_handles_formats_our_kernels_do_not(self, spark):
        from io import BytesIO

        from PIL import Image

        buf = BytesIO()
        Image.new("RGB", (6, 4), (1, 2, 3)).save(buf, format="TIFF")
        df = spark.createDataFrame(
            [(1, buf.getvalue())], "doc_id long, content binary")
        m = M.decode_image_metadata(
            df, decoder=M.pil_decode).collect()[0]["img_meta"]
        assert m["format"] == "tiff" and (m["width"], m["height"]) == (6, 4)


@pytest.mark.skipif(not HAVE_AV, reason="pyav not in this container")
class TestPyavEscapeHatch:
    def test_pyav_frames_through_video_tier(self, spark):
        """Route a pyav-backed frame sampler through decode_video_frames
        on an animated GIF (ffmpeg decodes GIF), matching the
        _VIDEO_FRAME_FIELDS contract."""
        import io

        import av

        def pyav_frame_stats(b, n_sample=3):
            try:
                with av.open(io.BytesIO(b)) as c:
                    stream = c.streams.video[0]
                    frames = [f.to_image().convert("L").resize((8, 8))
                              for f in c.decode(stream)]
            except Exception:
                return None
            if not frames:
                return None
            idx = sorted({0, len(frames) // 2, len(frames) - 1})[:n_sample]
            phs = []
            for i in idx:
                px = list(frames[i].getdata())
                avg = sum(px) / len(px)
                bits = 0
                for p in px:
                    bits = (bits << 1) | (1 if p >= avg else 0)
                phs.append(f"{bits:016x}")
            return {"byte_len": len(b), "format": "gif",
                    "frame_count": len(frames),
                    "width": frames[0].width, "height": frames[0].height,
                    "sampled_frames": list(idx), "frame_phashes": phs,
                    "channel_means": None}

        frame = [[(200, 0, 0)] * 8 + [(0, 0, 200)] * 8] * 8
        gif = M.encode_gif_anim(16, 8, [frame, frame, frame])
        df = spark.createDataFrame(
            [(1, gif)], "doc_id long, content binary")
        m = M.decode_video_frames(
            df, decoder=pyav_frame_stats).collect()[0]["frame_meta"]
        assert m["frame_count"] == 3
        assert all(len(p) == 16 for p in m["frame_phashes"])


@pytest.mark.skipif(M._load_libwebp() is None,
                    reason="system libwebp not present")
class TestLibwebpEscapeHatch:
    """r13: unlike PIL/pyav, the system libwebp IS in this container,
    so the native-codec branch of the escape hatch runs for real —
    ctypes-loaded per executor worker, routed through the same
    ``decoder=`` plug-in point and Arrow batch path."""

    def test_libwebp_decode_through_image_tier(self, spark):
        from aggo_spark.operators.vp8 import encode_webp_vp8
        webp, *_ = encode_webp_vp8(
            [[200] * 32 for _ in range(32)],
            [[90] * 16 for _ in range(16)],
            [[170] * 16 for _ in range(16)], qindex=0)
        df = spark.createDataFrame(
            [(1, bytearray(webp)), (2, b"notmedia")],
            "doc_id long, content binary")
        rows = {r["doc_id"]: r["img_meta"]
                for r in M.decode_image_metadata(
                    df, decoder=M.libwebp_decode).collect()}
        assert rows[1]["format"] == "webp"
        assert (rows[1]["width"], rows[1]["height"]) == (32, 32)
        assert rows[1]["channels"] == 4
        assert rows[1]["phash"] is not None
        assert rows[2] is None

    def test_solid_frames_agree_with_pure_tier(self):
        # solid colors have no chroma-upsampling ambiguity, so the
        # native decode and the pure-Python BT.601 tier must agree on
        # the RGB means exactly
        from aggo_spark.operators.vp8 import encode_webp_vp8
        for yv, uv, vv in [(16, 128, 128), (200, 90, 170), (81, 240, 110)]:
            webp, *_ = encode_webp_vp8(
                [[yv] * 16 for _ in range(16)],
                [[uv] * 8 for _ in range(8)],
                [[vv] * 8 for _ in range(8)], qindex=0)
            native = M.libwebp_decode(webp)
            pure = M.webp_decode(webp)
            assert native["channel_means"][:3] == pure["channel_means"]

    def test_undecodable_bytes_yield_none(self):
        assert M.libwebp_decode(b"RIFF\x10\x00\x00\x00WEBPVP8 XXXX") is None
        assert M.libwebp_decode(b"\x89PNG\r\n\x1a\n") is None
