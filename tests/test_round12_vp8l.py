"""Round 12: VP8L (lossless WebP) pixel decode (verdict r11 next #5/#4).

Fixture-based parity (no real-encoder webp files exist in this
container): :func:`encode_vp8l` exercises every decoder path — simple
and normal prefix codes, all four transforms singly and composed,
color cache, LZ row copies through BOTH direct distances and plane
codes — and corruption fuzz pins the no-raise / None-not-garbage
contract."""

from __future__ import annotations

import random

import pytest

from aggo_spark.operators import multimodal as M
from aggo_spark.operators import vp8l as V


def _img(w, h, seed, colors=None, alpha=False):
    rng = random.Random(seed)
    pal = colors or [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        + ((rng.randrange(256),) if alpha else ()) for _ in range(12)]
    return [[pal[rng.randrange(len(pal))] for _ in range(w)]
            for _ in range(h)]


def _roundtrip(w, h, rows, **kw):
    got = V.vp8l_pixels(V.encode_vp8l(w, h, rows, **kw))
    assert got is not None
    gw, gh, gch, grows = got
    exp_ch = 4 if kw.get("alpha") else 3
    assert (gw, gh, gch) == (w, h, exp_ch)
    want = [[p if len(p) == exp_ch else p + (255,) * (exp_ch - len(p))
             for p in row] for row in rows]
    assert grows == want


class TestVp8lRoundtrip:
    def test_literals_and_transforms(self):
        rows = _img(13, 7, 1)
        _roundtrip(13, 7, rows)
        _roundtrip(13, 7, rows, subtract_green=True)
        _roundtrip(13, 7, rows, cache_bits=4)
        _roundtrip(13, 7, rows, color_cte=(17, -30, 5))
        _roundtrip(13, 7, rows, palette=True)

    @pytest.mark.parametrize("mode", range(14))
    def test_all_predictor_modes(self, mode):
        _roundtrip(13, 7, _img(13, 7, mode + 10), predictor_mode=mode)

    def test_palette_bundling(self):
        # <=2 colors: 8 px/byte; <=4: 4 px/byte; <=16: 2 px/byte
        _roundtrip(13, 5, _img(13, 5, 2, colors=[(0, 0, 0),
                                                 (255, 255, 255)]),
                   palette=True)
        _roundtrip(13, 5, _img(13, 5, 3, colors=[(1, 2, 3), (4, 5, 6),
                                                 (7, 8, 9)]), palette=True)
        _roundtrip(13, 5, _img(13, 5, 4, colors=[(i, i * 3 % 256,
                                                  i * 7 % 256)
                                                 for i in range(15)]),
                   palette=True)

    def test_lz_row_copies_direct_and_plane(self):
        row = _img(13, 1, 5)[0]
        rows = [row] * 6
        _roundtrip(13, 6, rows, row_copy="direct")
        _roundtrip(13, 6, rows, row_copy="plane")
        _roundtrip(13, 6, rows, row_copy="plane", palette=True)

    def test_alpha_and_composition(self):
        _roundtrip(13, 7, _img(13, 7, 6, alpha=True), alpha=True)
        rows = _img(13, 7, 7)
        _roundtrip(13, 7, rows, subtract_green=True, predictor_mode=7)
        _roundtrip(13, 7, rows, color_cte=(10, 20, 30),
                   subtract_green=True, cache_bits=3)

    def test_plane_code_table_prefix(self):
        # RFC 9649 §5.2.3 prefix — the generated neighborhood must
        # open with the documented pairs
        assert V._PLANE[:8] == [(0, 1), (1, 0), (1, 1), (-1, 1),
                                (0, 2), (2, 0), (1, 2), (-1, 2)]
        assert len(V._PLANE) == 120
        assert V._PLANE[96:101] == [(8, 0), (4, 7), (-4, 7), (7, 4),
                                    (-7, 4)]


class TestWebpContainer:
    def test_webp_decode_pixel_stats(self):
        # checkerboard with EVEN width: means are exactly (A+B)/2
        ca, cb = (10, 200, 30), (40, 100, 90)
        rows = [[ca if (x + y) % 2 == 0 else cb for x in range(8)]
                for y in range(5)]
        m = M.webp_decode(V.encode_webp_vp8l(8, 5, rows))
        assert (m["format"], m["width"], m["height"], m["channels"]) == \
            ("webp", 8, 5, 3)
        assert m["channel_means"] == [25.0, 150.0, 60.0]
        assert m["phash"] is not None
        # py_decode dispatches the container too
        assert M.py_decode(V.encode_webp_vp8l(8, 5, rows)) == m

    def test_corrupt_vp8l_falls_back_to_header(self):
        blob = bytearray(V.encode_webp_vp8l(8, 5, _img(8, 5, 8)))
        blob = blob[:30]  # truncate inside the bitstream
        # rebuild a syntactically-valid container around the stump
        chunk = bytes(blob[20:])
        payload = (b"WEBP" + b"VP8L" + len(chunk).to_bytes(4, "little")
                   + chunk)
        stump = b"RIFF" + len(payload).to_bytes(4, "little") + payload
        m = M.webp_decode(stump)
        assert m is not None
        assert m["width"] == 8 and m["height"] == 5
        assert m["channel_means"] is None and m["phash"] is None

    def test_lossy_stays_header_tier(self):
        b = (b"RIFF" + (22).to_bytes(4, "little") + b"WEBP"
             + b"VP8 " + (10).to_bytes(4, "little") + bytes(3)
             + b"\x9d\x01\x2a" + (320).to_bytes(2, "little")
             + (240).to_bytes(2, "little"))
        m = M.webp_decode(b)
        assert m["channel_means"] is None

    def test_resize_rides_shared_pixel_core(self):
        rows = [[(70, 80, 90)] * 6] * 4
        out = M.resize_nearest(V.encode_webp_vp8l(6, 4, rows), 3, 2)
        assert out is not None
        m = M.png_decode(out)
        assert (m["width"], m["height"]) == (3, 2)
        assert m["channel_means"] == [70.0, 80.0, 90.0]

    def test_corruption_fuzz_never_raises(self):
        base = V.encode_webp_vp8l(11, 6, _img(11, 6, 9),
                                  subtract_green=True, cache_bits=3)
        rng = random.Random(11)
        for _ in range(300):
            ba = bytearray(base)
            for _k in range(rng.randrange(1, 6)):
                ba[rng.randrange(len(ba))] = rng.randrange(256)
            M.webp_decode(bytes(ba))  # any outcome but an exception
        for cut in range(0, len(base), 13):
            M.webp_decode(base[:cut])

    def test_bitstream_fuzz_never_raises(self):
        rng = random.Random(13)
        for _ in range(300):
            blob = b"\x2f" + bytes(rng.randrange(256)
                                   for _ in range(rng.randrange(4, 64)))
            V.vp8l_pixels(blob)  # None or a decode, never a raise
