"""Round 12: animated-GIF frame sampling (verdict r11 next #5).

``gif_frame_stats`` samples first/middle/last frames, decoding each
INDEPENDENTLY (no disposal compositing — the honest tier), through the
real LZW kernel; ``encode_gif_anim`` provides the multi-frame fixture
(global palette over the union of frame colors, NETSCAPE loop block,
per-frame graphic-control extensions — the layout real encoders
emit)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from aggo_spark.operators import multimodal as M


def _solid_anim(colors, w=6, h=4):
    return M.encode_gif_anim(w, h, [[[c] * w] * h for c in colors])


def _noisy(seed, w=8, h=8):
    rng = random.Random(seed)
    return [[(rng.randrange(256), rng.randrange(256), rng.randrange(256))
             for _ in range(w)] for _ in range(h)]


class TestGifFrameStats:
    def test_sampling_and_exact_means(self):
        cols = [(10, 20, 30), (200, 30, 40), (55, 66, 77), (5, 5, 5),
                (250, 240, 230)]
        anim = _solid_anim(cols)
        assert M.gif_frame_count(anim) == 5
        s = M.gif_frame_stats(anim)
        assert s["format"] == "gif-frames"
        assert s["frame_count"] == 5
        assert s["sampled_frames"] == [0, 2, 4]
        # GIF is lossless RGB: pooled means are EXACT color averages
        assert s["channel_means"] == [
            (10 + 55 + 250) / 3, (20 + 66 + 240) / 3, (30 + 77 + 230) / 3]
        # first-frame decode (gif_decode) is unchanged by animation
        assert M.gif_decode(anim)["channel_means"] == [10.0, 20.0, 30.0]

    def test_distinct_frames_distinct_phashes(self):
        anim = M.encode_gif_anim(8, 8, [_noisy(1), _noisy(2), _noisy(3)])
        s = M.gif_frame_stats(anim)
        assert len(s["frame_phashes"]) == 3
        assert len(set(s["frame_phashes"])) >= 2

    def test_single_frame_and_dispatch(self):
        one = M.encode_gif(6, 4, [[(9, 8, 7)] * 6] * 4)
        s = M.gif_frame_stats(one)
        assert s["frame_count"] == 1 and s["sampled_frames"] == [0]
        assert M.video_frame_stats(one)["format"] == "gif-frames"
        avi = M.encode_avi_mjpeg([M.encode_jpeg(8, 8, (1, 2, 3))],
                                 width=8, height=8)
        assert M.video_frame_stats(avi)["format"] == "avi-mjpeg"
        assert M.video_frame_stats(b"\x00\x00\x00\x18ftypisom") is None
        assert M.gif_frame_stats(b"not a gif") is None
        assert M.gif_frame_stats(b"GIF89a") is None

    def test_corrupt_sampled_frame_keeps_null_slot(self):
        cols = [(1, 2, 3), (4, 5, 6), (7, 8, 9)]
        anim = bytearray(_solid_anim(cols))
        # find the LAST image descriptor and trash its LZW data
        descs = []
        b = bytes(anim)
        n = M.gif_frame_count(b)
        assert n == 3
        # corrupt the tail frame's data: flip bytes just before trailer
        anim[-6:-1] = b"\xff\xff\xff\xff\xff"
        s = M.gif_frame_stats(bytes(anim))
        assert s is not None
        assert s["frame_phashes"][0] is not None  # first frame intact

    def test_corruption_fuzz_never_raises(self):
        anim = _solid_anim([(10, 20, 30), (200, 30, 40), (55, 66, 77)])
        rng = random.Random(5)
        for _ in range(300):
            bb = bytearray(anim)
            for _k in range(rng.randrange(1, 10)):
                bb[rng.randrange(len(bb))] = rng.randrange(256)
            M.gif_frame_stats(bytes(bb))
            M.gif_decode(bytes(bb))
        for cut in range(0, len(anim), 7):
            M.gif_frame_stats(anim[:cut])

    def test_anim_joins_video_near_dup(self, spark):
        a = M.encode_gif_anim(8, 8, [_noisy(1), _noisy(2), _noisy(3)])
        b = M.encode_gif_anim(8, 8, [_noisy(1), _noisy(2), _noisy(3)])
        c = M.encode_gif_anim(8, 8, [_noisy(7), _noisy(8), _noisy(9)])
        df = spark.createDataFrame(
            [(1, a), (2, b), (3, c)], "doc_id long, content binary")
        flat = M.decode_video_frames(df).select(
            "doc_id",
            F.col("frame_meta.frame_phashes").alias("frame_phashes"))
        got = {(r["id_a"], r["id_b"]) for r in M.video_near_dup_pairs(
            flat, max_hamming=3, min_matching_frames=3).collect()}
        assert (1, 2) in got
        assert (1, 3) not in got and (2, 3) not in got
