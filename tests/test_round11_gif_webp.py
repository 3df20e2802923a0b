"""GIF (LZW) pixel decode + WebP header tier (r11, verdict r10 next #3):
real crawls are ~10-20% GIF/WebP, which previously fell to the
env-dependent PIL branch or the fake shim.

Pinned (the jpeg_pixel_decode test pattern): differential equality of
encode_gif → gif_decode against directly-computed pixel statistics
(incl. interlace and the LZW dictionary-reset path), corruption fuzz
(truncations + byte flips never raise; they degrade to None), WebP
VP8/VP8L/VP8X header dims, and the py_decode/auto_decode dispatch.
"""
import random

import numpy as np
import pytest

from aggo_spark.operators.multimodal import (
    _gif_pixels,
    encode_gif,
    gif_decode,
    py_decode,
    py_pixels,
    webp_decode,
)


def _rand_image(h, w, ncolors=180, seed=5):
    rng = np.random.RandomState(seed)
    pal = [(int(r), int(g), int(b))
           for r, g, b in rng.randint(0, 256, (ncolors, 3))]
    return [[pal[rng.randint(0, ncolors)] for _ in range(w)]
            for _ in range(h)]


def _means(pix):
    return [float(np.mean([p[c] for row in pix for p in row]))
            for c in range(3)]


class TestGifDifferential:
    def test_solid_color(self):
        m = gif_decode(encode_gif(7, 5, [[(10, 20, 30)] * 7
                                         for _ in range(5)]))
        assert (m["format"], m["width"], m["height"], m["channels"]) == \
            ("gif", 7, 5, 3)
        assert m["channel_means"] == [10.0, 20.0, 30.0]
        assert m["phash"] is not None

    def test_multicolor_exact_means(self):
        pix = _rand_image(37, 41)
        m = gif_decode(encode_gif(41, 37, pix))
        for got, exp in zip(m["channel_means"], _means(pix)):
            assert got == pytest.approx(exp, abs=1e-9)

    def test_interlace_equals_progressive(self):
        pix = _rand_image(33, 29, seed=7)
        a = gif_decode(encode_gif(29, 33, pix))
        b = gif_decode(encode_gif(29, 33, pix, interlace=True))
        assert {k: v for k, v in a.items() if k != "byte_len"} == \
            {k: v for k, v in b.items() if k != "byte_len"}

    def test_lzw_dictionary_reset(self):
        # 120x130 noisy raster forces > 4096 LZW entries → the encoder's
        # clear-and-rebuild path and the decoder's reset path both run
        pix = _rand_image(120, 130, seed=9)
        m = gif_decode(encode_gif(130, 120, pix))
        for got, exp in zip(m["channel_means"], _means(pix)):
            assert got == pytest.approx(exp, abs=1e-9)

    def test_pixel_rows_roundtrip(self):
        pix = _rand_image(11, 13, seed=3)
        w, h, ch, rows = _gif_pixels(encode_gif(13, 11, pix))
        assert (w, h, ch) == (13, 11, 3)
        assert [list(map(tuple, r)) for r in rows] == \
            [list(map(tuple, r)) for r in pix]

    def test_gif87a_accepted(self):
        b = encode_gif(4, 4, [[(1, 2, 3)] * 4] * 4)
        m = gif_decode(b"GIF87a" + b[6:])
        assert m is not None and m["channel_means"] == [1.0, 2.0, 3.0]


class TestGifDegradation:
    def test_truncation_fuzz(self):
        blob = encode_gif(41, 37, _rand_image(37, 41))
        for cut in range(0, len(blob), max(1, len(blob) // 80)):
            r = gif_decode(blob[:cut])
            assert r is None or isinstance(r, dict)

    def test_bitflip_fuzz(self):
        random.seed(2)
        blob = encode_gif(130, 120, _rand_image(120, 130, seed=9))
        for _ in range(150):
            ba = bytearray(blob)
            ba[random.randrange(len(ba))] ^= 0xFF
            r = gif_decode(bytes(ba))
            assert r is None or isinstance(r, dict)

    def test_forged_pixel_count_bound(self):
        # an LZW stream emitting more pixels than width*height is
        # forged: _gif_lzw_decode must refuse (None) at the max_pixels
        # bound, not allocate unbounded output — tested DIRECTLY on the
        # codec (r11 review: the old splice-based version was vacuous)
        from aggo_spark.operators.multimodal import _gif_lzw_decode

        # encoder-produced stream for a 10x10 raster...
        pix = _rand_image(10, 10, seed=6)
        blob = encode_gif(10, 10, pix)
        # locate the image data STRUCTURALLY (a byte-scan for 0x2C can
        # hit a palette byte): 13-byte header + global table, 10-byte
        # image descriptor (no local table), then mcs + sub-blocks
        npal = 2 << (blob[10] & 0x07)
        dstart = 13 + 3 * npal + 10
        mcs = blob[dstart]
        data = bytearray()
        p = dstart + 1
        while blob[p] != 0:
            ln = blob[p]
            data += blob[p + 1:p + 1 + ln]
            p += 1 + ln
        # ...decodes fine at the true budget
        full = _gif_lzw_decode(bytes(data), mcs, 100)
        assert full is not None and len(full) == 100
        # ...but is REFUSED when the claimed image is smaller than the
        # stream's pixel output (the forged-SOF-dims analogue)
        assert _gif_lzw_decode(bytes(data), mcs, 20) is None

    def test_not_gif(self):
        assert gif_decode(b"GIF89a") is None
        assert gif_decode(b"") is None
        assert gif_decode(b"NOPE" * 10) is None


class TestWebpHeader:
    @staticmethod
    def _vp8(w=320, h=240):
        return (b"RIFF" + (22).to_bytes(4, "little") + b"WEBP"
                + b"VP8 " + (10).to_bytes(4, "little") + bytes(3)
                + b"\x9d\x01\x2a" + w.to_bytes(2, "little")
                + h.to_bytes(2, "little"))

    def test_vp8_lossy(self):
        m = webp_decode(self._vp8())
        assert (m["format"], m["width"], m["height"], m["channels"]) == \
            ("webp", 320, 240, 3)
        assert m["channel_means"] is None and m["phash"] is None

    def test_vp8l_lossless_alpha(self):
        bits = 511 | (299 << 14) | (1 << 28)
        b = (b"RIFF" + (17).to_bytes(4, "little") + b"WEBP"
             + b"VP8L" + (5).to_bytes(4, "little") + b"\x2f"
             + bits.to_bytes(4, "little"))
        m = webp_decode(b)
        assert (m["width"], m["height"], m["channels"]) == (512, 300, 4)

    def test_vp8x_canvas(self):
        b = (b"RIFF" + (22).to_bytes(4, "little") + b"WEBP"
             + b"VP8X" + (10).to_bytes(4, "little") + bytes([0x10])
             + bytes(3) + (639).to_bytes(3, "little")
             + (479).to_bytes(3, "little"))
        m = webp_decode(b)
        assert (m["width"], m["height"], m["channels"]) == (640, 480, 4)

    def test_truncation_fuzz(self):
        blob = self._vp8()
        for cut in range(len(blob)):
            r = webp_decode(blob[:cut])
            assert r is None or isinstance(r, dict)

    def test_bad_sync(self):
        b = bytearray(self._vp8())
        b[23] ^= 0xFF  # break the 9d 01 2a sync
        assert webp_decode(bytes(b)) is None


class TestDispatch:
    def test_py_decode_routes(self):
        gif = encode_gif(4, 4, [[(9, 9, 9)] * 4] * 4)
        assert py_decode(gif)["format"] == "gif"
        assert py_decode(TestWebpHeader._vp8())["format"] == "webp"

    def test_py_pixels_routes(self):
        gif = encode_gif(4, 3, [[(9, 8, 7)] * 4] * 3)
        w, h, ch, rows = py_pixels(gif)
        assert (w, h, ch) == (4, 3, 3) and rows[0][0] == (9, 8, 7)

    def test_frame_count(self):
        # static-vs-animated classification without any LZW decode:
        # assemble a 3-frame GIF by concatenating the per-frame image
        # blocks of single-frame encodes (header+GCT stripped from the
        # later ones, trailer only at the end)
        from aggo_spark.operators.multimodal import gif_frame_count

        def body(blob):
            npal = 2 << (blob[10] & 0x07)
            return blob[13 + 3 * npal:-1]  # image block(s), no trailer

        f1 = encode_gif(5, 4, [[(1, 2, 3)] * 5] * 4)
        f2 = encode_gif(5, 4, [[(9, 8, 7)] * 5] * 4)
        anim = f1[:-1] + body(f2) + body(f2) + b"\x3b"
        assert gif_frame_count(f1) == 1
        assert gif_frame_count(anim) == 3
        assert gif_frame_count(b"notagif") is None
        assert gif_frame_count(b"GIF89a") == 0  # truncated header
        # a corrupt tail reports the frames counted before it
        assert gif_frame_count(anim[:len(f1) + 2]) >= 1
        # r12 advisory: a frame whose 10-byte image descriptor is cut
        # mid-way must NOT count — truncate right after the 0x2C
        npal = 2 << (f1[10] & 0x07)
        desc_at = 13 + 3 * npal
        assert f1[desc_at] == 0x2C
        assert gif_frame_count(f1[:desc_at + 5]) == 0
        # the pixel decoder still reads frame 1 of the animation
        m = gif_decode(anim)
        assert m is not None and m["channel_means"] == [1.0, 2.0, 3.0]

    def test_resize_gif_to_png(self):
        # resize rides the shared pixel core: a solid GIF resizes to a
        # solid PNG of the target dims with identical pixels
        from aggo_spark.operators.multimodal import (png_decode,
                                                     resize_nearest)

        gif = encode_gif(9, 7, [[(40, 80, 120)] * 9 for _ in range(7)])
        out = png_decode(resize_nearest(gif, 4, 3))
        assert (out["width"], out["height"]) == (4, 3)
        assert out["channel_means"] == [40.0, 80.0, 120.0]

    def test_spark_plumbing(self, spark):
        from pyspark.sql import functions as F

        from aggo_spark.operators.multimodal import decode_image_metadata

        rows = [
            (1, encode_gif(8, 8, _rand_image(8, 8, seed=1))),
            (2, TestWebpHeader._vp8(100, 50)),
            (3, b"GIF89a\x01"),  # truncated
        ]
        df = spark.createDataFrame(rows, "doc_id long, content binary")
        out = {r["doc_id"]: r["meta"] for r in
               decode_image_metadata(df, out_col="meta").collect()}
        assert out[1]["format"] == "gif" and out[1]["channel_means"]
        assert out[2]["format"] == "webp" and out[2]["width"] == 100
        assert out[3] is None


from tests.conftest import *  # noqa: F401,F403,E402  (spark fixture)
