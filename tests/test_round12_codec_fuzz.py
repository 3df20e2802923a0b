"""Property-based round-trips for the r12 codecs (the
TestContainerCodecFuzz pattern): whatever the synthesizers write, the
parsers must read back exactly — VP8L pixels bit-exact across random
images and random transform/cache/LZ option combinations, MJPEG-in-AVI
frame walks (count + per-frame kernel parity), animated-GIF sampled
frames bit-exact through the shared LZW pair."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aggo_spark.operators import multimodal as M
from aggo_spark.operators import vp8l as V


class TestR12CodecFuzz:
    def test_vp8l_roundtrip_fuzz(self):
        @settings(max_examples=60, deadline=None)
        @given(data=st.data(),
               w=st.integers(1, 20), h=st.integers(1, 14),
               ncolors=st.integers(1, 14),
               subtract_green=st.booleans(),
               predictor=st.one_of(st.none(), st.integers(0, 13)),
               cte=st.one_of(st.none(), st.tuples(
                   st.integers(-128, 127), st.integers(-128, 127),
                   st.integers(-128, 127))),
               palette=st.booleans(),
               cache_bits=st.sampled_from([0, 0, 2, 5]),
               alpha=st.booleans())
        def check(data, w, h, ncolors, subtract_green, predictor, cte,
                  palette, cache_bits, alpha):
            nch = 4 if alpha else 3
            pal = data.draw(st.lists(
                st.tuples(*[st.integers(0, 255)] * nch),
                min_size=ncolors, max_size=ncolors))
            rows = [[pal[data.draw(st.integers(0, ncolors - 1))]
                     for _ in range(w)] for _ in range(h)]
            blob = V.encode_vp8l(
                w, h, rows, subtract_green=subtract_green,
                predictor_mode=predictor, color_cte=cte,
                palette=palette, cache_bits=cache_bits, alpha=alpha)
            got = V.vp8l_pixels(blob)
            assert got is not None
            gw, gh, gch, grows = got
            assert (gw, gh, gch) == (w, h, nch)
            want = [[p if len(p) == nch else p + (255,) * (nch - len(p))
                     for p in row] for row in rows]
            assert grows == want

        check()

    def test_vp8l_row_copy_fuzz(self):
        @settings(max_examples=30, deadline=None)
        @given(data=st.data(), w=st.integers(2, 16),
               nrows=st.integers(2, 10),
               mode=st.sampled_from(["direct", "plane"]),
               cache_bits=st.sampled_from([0, 3]))
        def check(data, w, nrows, mode, cache_bits):
            base = [tuple(data.draw(st.integers(0, 255)) for _ in range(3))
                    for _ in range(w)]
            # randomly repeat rows so the encoder emits LZ copies
            rows = [base]
            for _ in range(nrows - 1):
                rows.append(base if data.draw(st.booleans())
                            else list(reversed(base)))
            blob = V.encode_vp8l(w, nrows, rows, row_copy=mode,
                                 cache_bits=cache_bits)
            got = V.vp8l_pixels(blob)
            assert got is not None and got[3] == rows

        check()

    def test_mjpeg_avi_framewalk_fuzz(self):
        @settings(max_examples=25, deadline=None)
        @given(data=st.data(), nframes=st.integers(1, 9),
               rec=st.booleans())
        def check(data, nframes, rec):
            colors = [tuple(data.draw(st.integers(0, 255))
                            for _ in range(3)) for _ in range(nframes)]
            frames = [M.encode_jpeg(8, 8, c) for c in colors]
            avi = M.encode_avi_mjpeg(frames, width=8, height=8,
                                     interleave_rec=rec)
            s = M.avi_frame_stats(avi)
            assert s is not None and s["frame_count"] == nframes
            # sampled phashes equal the kernel's own decode per frame
            for pos, i in enumerate(s["sampled_frames"]):
                assert s["frame_phashes"][pos] == \
                    M.jpeg_pixel_decode(frames[i])["phash"]

        check()

    def test_exif_roundtrip_fuzz(self):
        @settings(max_examples=40, deadline=None)
        @given(orientation=st.integers(1, 8),
               byte_order=st.sampled_from(["II", "MM"]),
               make=st.one_of(st.none(), st.text(
                   alphabet=st.characters(min_codepoint=32,
                                          max_codepoint=126),
                   min_size=1, max_size=12)),
               gps=st.one_of(st.none(), st.tuples(
                   st.floats(-90, 90, allow_nan=False),
                   st.floats(-180, 180, allow_nan=False))))
        def check(orientation, byte_order, make, gps):
            jpg = M.encode_jpeg(8, 8, (10, 20, 30))
            app1 = M.encode_exif_app1(
                orientation=orientation, make=make, gps=gps,
                byte_order=byte_order)
            tagged = jpg[:2] + app1 + jpg[2:]
            e = M.jpeg_exif(tagged)
            assert e["has_exif"] and e["orientation"] == orientation
            assert e["make"] == make
            assert e["has_gps"] == (gps is not None)
            clean = M.strip_jpeg_metadata(tagged)
            assert M.jpeg_exif(clean)["has_exif"] is False
            assert (M.jpeg_pixel_decode(clean)["phash"]
                    == M.jpeg_pixel_decode(jpg)["phash"])

        check()

    def test_webp_anim_sampled_frames_fuzz(self):
        @settings(max_examples=25, deadline=None)
        @given(data=st.data(), nframes=st.integers(1, 7),
               w=st.integers(1, 10), h=st.integers(1, 8))
        def check(data, nframes, w, h):
            frames = [[[(data.draw(st.integers(0, 255)),) * 3
                        for _ in range(w)] for _ in range(h)]
                      for _ in range(nframes)]
            anim = M.encode_webp_anim(w, h, frames)
            s = M.webp_frame_stats(anim)
            assert s is not None and s["frame_count"] == nframes
            assert len(s["sampled_frames"]) == min(3, nframes)
            assert all(ph is not None for ph in s["frame_phashes"])

        check()

    def test_gif_anim_sampled_frames_fuzz(self):
        @settings(max_examples=25, deadline=None)
        @given(data=st.data(), nframes=st.integers(1, 8),
               w=st.integers(1, 10), h=st.integers(1, 8),
               ncolors=st.integers(1, 6))
        def check(data, nframes, w, h, ncolors):
            pal = data.draw(st.lists(
                st.tuples(st.integers(0, 255), st.integers(0, 255),
                          st.integers(0, 255)),
                min_size=ncolors, max_size=ncolors))
            frames = [[[pal[data.draw(st.integers(0, ncolors - 1))]
                        for _ in range(w)] for _ in range(h)]
                      for _ in range(nframes)]
            anim = M.encode_gif_anim(w, h, frames)
            assert M.gif_frame_count(anim) == nframes
            s = M.gif_frame_stats(anim)
            assert s["frame_count"] == nframes
            # every sampled frame decodes bit-exact vs its source
            got = M._gif_frames(anim, set(s["sampled_frames"]))
            assert got is not None
            for i in s["sampled_frames"]:
                iw, ih, rows = got[1][i]
                assert (iw, ih) == (w, h)
                assert rows == [[tuple(p) for p in r]
                                for r in frames[i]]

        check()
