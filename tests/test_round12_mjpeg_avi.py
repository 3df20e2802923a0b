"""Round 12: MJPEG-in-AVI frame pixel tier (verdict r11 next #3).

The movi walker reuses the real JPEG kernel per sampled frame; these
tests pin the encoder/decoder roundtrip, the strict chunk-bound
handling (forged sizes must never over-read — r11 verdict #8), the
interleaved ``LIST rec `` layout, and the Spark near-dup path over
per-frame perceptual hashes."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from aggo_spark.operators import multimodal as M


def _grad(seed):
    import numpy as np

    rng = np.random.default_rng(seed)
    img = (np.arange(32)[:, None] * 8 + np.arange(48)[None, :] * 2)[..., None]
    img = np.broadcast_to(img % 256, (32, 48, 3)).astype(np.uint8).copy()
    img += rng.integers(0, 40, (32, 48, 3), dtype=np.uint8)
    return img


def _solid_frames():
    return [M.encode_jpeg(16, 12, (200, 30, 30)),
            M.encode_jpeg(16, 12, (30, 200, 30)),
            M.encode_jpeg(16, 12, (30, 30, 200)),
            M.encode_jpeg(16, 12, (25, 25, 25)),
            M.encode_jpeg(16, 12, (250, 250, 250))]


class TestAviFrameWalk:
    def test_roundtrip_and_sampling(self):
        avi = M.encode_avi_mjpeg(_solid_frames(), fps=10, width=16, height=12)
        # header tier unchanged on the same bytes
        hdr = M.avi_decode(avi)
        assert (hdr["format"], hdr["width"], hdr["n_tracks"]) == ("avi", 16, 1)
        s = M.avi_frame_stats(avi)
        assert s["format"] == "avi-mjpeg"
        assert s["frame_count"] == 5
        assert s["sampled_frames"] == [0, 2, 4]  # first / middle / last
        assert (s["width"], s["height"]) == (16, 12)
        # pooled means equal the average of what the JPEG kernel itself
        # decodes per sampled frame (the YCbCr roundtrip may shift a
        # channel by 1, so parity is vs the kernel, not the raw colors)
        frames = _solid_frames()
        want = [M.jpeg_pixel_decode(frames[i])["channel_means"]
                for i in (0, 2, 4)]
        assert s["channel_means"] == pytest.approx(
            [sum(c) / 3 for c in zip(*want)])
        assert s["frame_phashes"] == [
            M.jpeg_pixel_decode(frames[i])["phash"] for i in (0, 2, 4)]

    def test_interleaved_rec_layout(self):
        f = _solid_frames()
        plain = M.avi_frame_stats(M.encode_avi_mjpeg(f, width=16, height=12))
        rec = M.avi_frame_stats(
            M.encode_avi_mjpeg(f, width=16, height=12, interleave_rec=True))
        assert rec["frame_count"] == plain["frame_count"] == 5
        assert rec["frame_phashes"] == plain["frame_phashes"]
        assert rec["channel_means"] == plain["channel_means"]

    def test_truncated_tail_recovers_prefix(self):
        avi = M.encode_avi_mjpeg(_solid_frames(), width=16, height=12)
        t = M.avi_frame_stats(avi[:len(avi) - 40])  # cuts the last frame
        assert t is not None and t["frame_count"] == 4
        assert M.avi_frame_stats(avi[:200]) is None  # nothing recoverable
        assert M.avi_frame_stats(b"RIFF\x00\x00\x00\x00AVI ") is None
        assert M.avi_frame_stats(b"not a riff") is None

    def test_forged_chunk_size_never_overreads(self):
        import struct

        avi = M.encode_avi_mjpeg(_solid_frames(), width=16, height=12)
        off, ln = M._avi_video_chunk_offsets(avi)[1]
        forged = bytearray(avi)
        # blow the second frame chunk's declared size past the buffer
        forged[off - 4:off] = struct.pack("<I", 2 ** 31)
        t = M.avi_frame_stats(bytes(forged))
        assert t is not None and t["frame_count"] == 1  # stops at forgery

    def test_undecodable_frame_keeps_null_slot(self):
        avi = bytearray(M.encode_avi_mjpeg(_solid_frames(), width=16, height=12))
        off, _ = M._avi_video_chunk_offsets(bytes(avi))[4]
        avi[off:off + 3] = b"XXX"  # last sampled frame is not a JPEG
        s = M.avi_frame_stats(bytes(avi))
        assert s["frame_phashes"][2] is None
        assert s["frame_phashes"][0] is not None
        assert len(s["frame_phashes"]) == len(s["sampled_frames"]) == 3

    def test_corruption_fuzz_never_raises(self):
        avi = M.encode_avi_mjpeg(_solid_frames(), width=16, height=12)
        rng = random.Random(7)
        for _ in range(200):
            ba = bytearray(avi)
            for _k in range(rng.randrange(1, 8)):
                ba[rng.randrange(len(ba))] = rng.randrange(256)
            M.avi_frame_stats(bytes(ba))  # any outcome but an exception
        for cut in range(0, len(avi), 61):
            M.avi_frame_stats(avi[:cut])


class TestVideoNearDup:
    def test_near_dup_pairs(self, spark):
        fa = [M.encode_jpeg(image=_grad(s)) for s in (1, 2, 3)]
        fa2 = [M.encode_jpeg(image=_grad(s) ^ 1) for s in (1, 2, 3)]
        fb = [M.encode_jpeg(image=255 - _grad(s)) for s in (40, 50, 60)]
        vids = [(1, M.encode_avi_mjpeg(fa, width=48, height=32)),
                (2, M.encode_avi_mjpeg(fa2, width=48, height=32)),
                (3, M.encode_avi_mjpeg(fb, width=48, height=32))]
        df = spark.createDataFrame(vids, "doc_id long, content binary")
        flat = M.decode_video_frames(df).select(
            "doc_id", F.col("frame_meta.frame_phashes").alias("frame_phashes"))
        got = {(r["id_a"], r["id_b"]): (r["n_frames_matched"], r["min_hamming"])
               for r in M.video_near_dup_pairs(
                   flat, max_hamming=4, min_matching_frames=2).collect()}
        assert (1, 2) in got
        n, h = got[(1, 2)]
        assert n == 3 and h == 0  # XOR-1 perturbation is phash-invariant here
        assert (1, 3) not in got and (2, 3) not in got

    def test_null_phash_slots_drop(self, spark):
        df = spark.createDataFrame(
            [(1, ["00010f3ffffcf880", None, "0003071ffffef0e0"]),
             (2, ["00010f3ffffcf880", None, "0003071ffffef0e0"])],
            "doc_id long, frame_phashes array<string>")
        rows = M.video_near_dup_pairs(df, max_hamming=2).collect()
        assert len(rows) == 1
        assert rows[0]["n_frames_matched"] == 2  # NULL middle slot skipped
