"""Round 12: the video near-dup ENGINE against an arithmetic oracle.

Fixture design makes per-frame perceptual hashes exactly predictable:
each frame is a left/right split (left half color A, right half B) at
16x8, so the 8x8 average-hash collapses to one of THREE literal
patterns decided purely by sign(sum(A) - sum(B)) — left-bright
(f0f0...), right-bright (0f0f...), or flat (ffff...). Distinct
patterns differ by >= 32 bits, so with max_hamming=4 two frames match
iff their sign classes are equal — and the full expected pair set
(which docs pair, on how many positions) is computable by integer
arithmetic with no image code at all. The Spark path runs the REAL
chain: animated-GIF encode -> decode_video_frames (frame walk + LZW +
phash) -> posexplode -> pigeonhole hamming join -> pair aggregation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aggo_spark.operators import multimodal as M

N_DOCS = 24
N_FRAMES = 3
W, H = 16, 8


def _colors(i, j):
    a = ((3 * i + 5 * j) % 256, (7 * i + 11 * j) % 256,
         (13 * i + 17 * j) % 256)
    b = ((9 * i + j) % 256, (5 * i + 3 * j) % 256,
         (11 * i + 7 * j) % 256)
    return a, b


def _frame(i, j):
    a, b = _colors(i, j)
    return [[a] * (W // 2) + [b] * (W // 2)] * H


def _sign_class(i, j):
    a, b = _colors(i, j)
    return (sum(a) > sum(b)) - (sum(a) < sum(b))


def _expected_pairs(min_matching):
    out = {}
    for x in range(N_DOCS):
        for y in range(x + 1, N_DOCS):
            n = sum(_sign_class(x, j) == _sign_class(y, j)
                    for j in range(N_FRAMES))
            if n >= min_matching:
                out[(x, y)] = n
    return out


class TestVideoNearDupOracle:
    def test_pairs_match_arithmetic_oracle(self, spark):
        vids = [(i, M.encode_gif_anim(
            W, H, [_frame(i, j) for j in range(N_FRAMES)]))
            for i in range(N_DOCS)]
        df = spark.createDataFrame(vids, "doc_id long, content binary")
        flat = M.decode_video_frames(df).select(
            "doc_id",
            F.col("frame_meta.frame_phashes").alias("frame_phashes"))
        got = {(r["id_a"], r["id_b"]): (r["n_frames_matched"],
                                        r["min_hamming"])
               for r in M.video_near_dup_pairs(
                   flat, max_hamming=4, min_matching_frames=2,
                   bucket_cap=N_DOCS * N_FRAMES).collect()}
        want = _expected_pairs(min_matching=2)
        assert set(got) == set(want), (
            f"missing={set(want) - set(got)} extra={set(got) - set(want)}")
        for pair, n in want.items():
            assert got[pair] == (n, 0), (pair, got[pair], n)
        # sanity: the fixture isn't degenerate (some pairs, not all)
        assert 0 < len(want) < N_DOCS * (N_DOCS - 1) // 2

    def test_phash_classes_are_the_three_literals(self):
        seen = set()
        for i in range(6):
            for j in range(N_FRAMES):
                anim = M.encode_gif_anim(W, H, [_frame(i, j)])
                ph = M.gif_frame_stats(anim)["frame_phashes"][0]
                cls = _sign_class(i, j)
                want = {1: "f0f0f0f0f0f0f0f0", -1: "0f0f0f0f0f0f0f0f",
                        0: "ffffffffffffffff"}[cls]
                assert ph == want, (i, j, cls, ph)
                seen.add(cls)
        assert len(seen) >= 2  # fixture exercises multiple classes
