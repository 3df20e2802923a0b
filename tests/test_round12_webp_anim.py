"""Round 12: animated-WebP (VP8X/ANIM/ANMF) frame sampling — the WebP
member of the video frame-tier family. VP8L subframes decode through
the lossless kernel; lossy VP8 subframes keep a NULL phash slot (the
undecodable-chunk convention); static WebP is an image, not a video,
and returns None here."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from aggo_spark.operators import multimodal as M
from aggo_spark.operators import vp8l as V


def _solid(c, w=6, h=4):
    return [[c] * w] * h


def _noisy(seed, w=8, h=8):
    rng = random.Random(seed)
    return [[(rng.randrange(256), rng.randrange(256), rng.randrange(256))
             for _ in range(w)] for _ in range(h)]


class TestWebpAnim:
    def test_sampling_and_exact_means(self):
        cols = [(10, 20, 30), (200, 30, 40), (55, 66, 77), (5, 5, 5),
                (250, 240, 230)]
        anim = M.encode_webp_anim(6, 4, [_solid(c) for c in cols])
        s = M.webp_frame_stats(anim)
        assert s["format"] == "webp-anim"
        assert s["frame_count"] == 5 and s["sampled_frames"] == [0, 2, 4]
        # VP8L is lossless: pooled means are exact color averages
        assert s["channel_means"] == [
            (10 + 55 + 250) / 3, (20 + 66 + 240) / 3, (30 + 77 + 230) / 3]
        assert (s["width"], s["height"]) == (6, 4)

    def test_lossy_subframe_keeps_null_slot(self):
        cols = [(1, 2, 3), (4, 5, 6), (7, 8, 9)]
        anim = M.encode_webp_anim(6, 4, [_solid(c) for c in cols],
                                  lossy_frame_at=1)
        s = M.webp_frame_stats(anim)
        assert s["frame_phashes"][1] is None
        assert s["frame_phashes"][0] is not None

    def test_static_webp_is_not_a_video(self):
        static = V.encode_webp_vp8l(6, 4, _solid((1, 2, 3)))
        assert M.webp_frame_stats(static) is None
        assert M.video_frame_stats(static) is None
        # webp_decode owns it and still decodes pixels
        assert M.webp_decode(static)["channel_means"] == [1.0, 2.0, 3.0]
        anim = M.encode_webp_anim(6, 4, [_solid((1, 2, 3))])
        assert M.video_frame_stats(anim)["format"] == "webp-anim"

    def test_corruption_fuzz_never_raises(self):
        anim = M.encode_webp_anim(
            8, 8, [_noisy(1), _noisy(2), _noisy(3)])
        rng = random.Random(23)
        for _ in range(300):
            ba = bytearray(anim)
            for _k in range(rng.randrange(1, 6)):
                ba[rng.randrange(len(ba))] = rng.randrange(256)
            M.webp_frame_stats(bytes(ba))
        for cut in range(0, len(anim), 9):
            M.webp_frame_stats(anim[:cut])

    def test_anim_joins_video_near_dup(self, spark):
        a = M.encode_webp_anim(8, 8, [_noisy(1), _noisy(2), _noisy(3)])
        b = M.encode_webp_anim(8, 8, [_noisy(1), _noisy(2), _noisy(3)])
        c = M.encode_webp_anim(8, 8, [_noisy(7), _noisy(8), _noisy(9)])
        df = spark.createDataFrame(
            [(1, a), (2, b), (3, c)], "doc_id long, content binary")
        flat = M.decode_video_frames(df).select(
            "doc_id",
            F.col("frame_meta.frame_phashes").alias("frame_phashes"))
        got = {(r["id_a"], r["id_b"]) for r in M.video_near_dup_pairs(
            flat, max_hamming=3, min_matching_frames=3).collect()}
        assert (1, 2) in got
        assert (1, 3) not in got and (2, 3) not in got
