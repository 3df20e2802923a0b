"""Property-based round-trips for the r11 container codecs (the
TestContainerCodecFuzz pattern): whatever the synthesizers write, the
parsers must read back exactly — GIF pixels bit-exact through the LZW
encode/decode pair (incl. interlace and palette sizes 1..256), MP3
frame-walk totals, FLAC STREAMINFO bit packing across the full field
widths, OGG granule/pre-skip arithmetic for both codecs.
"""
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from aggo_spark.operators.multimodal import (
    _MP3_BR,
    _gif_pixels,
    encode_flac_header,
    encode_gif,
    encode_mp3,
    encode_ogg,
    flac_decode,
    mp3_decode,
    ogg_decode,
)


class TestR11CodecFuzz:
    def test_gif_pixel_roundtrip_fuzz(self):
        @settings(max_examples=40, deadline=None)
        @given(data=st.data(),
               w=st.integers(1, 24), h=st.integers(1, 24),
               ncolors=st.integers(1, 256),
               interlace=st.booleans())
        def check(data, w, h, ncolors, interlace):
            pal = data.draw(st.lists(
                st.tuples(st.integers(0, 255), st.integers(0, 255),
                          st.integers(0, 255)),
                min_size=ncolors, max_size=ncolors))
            pix = [[pal[data.draw(st.integers(0, ncolors - 1))]
                    for _ in range(w)] for _ in range(h)]
            got = _gif_pixels(encode_gif(w, h, pix, interlace=interlace))
            assert got is not None
            gw, gh, gch, rows = got
            assert (gw, gh, gch) == (w, h, 3)
            assert [list(map(tuple, r)) for r in rows] == \
                [list(map(tuple, r)) for r in pix]

        check()

    def test_mp3_framewalk_fuzz(self):
        @settings(max_examples=60, deadline=None)
        @given(rate=st.sampled_from([32000, 44100, 48000]),
               kbps=st.sampled_from([k for k in _MP3_BR[3] if k]),
               frames=st.integers(2, 40),
               channels=st.integers(1, 2),
               id3=st.booleans())
        def check(rate, kbps, frames, channels, id3):
            m = mp3_decode(encode_mp3(rate, kbps, frames, channels,
                                      id3=id3))
            assert (m["sample_rate"], m["channels"]) == (rate, channels)
            assert m["n_frames"] == frames * 1152
            assert m["duration_s"] == pytest.approx(
                frames * 1152 / rate, abs=1e-6)

        check()

    def test_flac_streaminfo_fuzz(self):
        @settings(max_examples=60, deadline=None)
        @given(rate=st.integers(1, (1 << 20) - 1),
               channels=st.integers(1, 8),
               bits=st.integers(4, 32),
               total=st.integers(0, (1 << 36) - 1))
        def check(rate, channels, bits, total):
            m = flac_decode(encode_flac_header(rate, channels, bits,
                                               total))
            assert (m["sample_rate"], m["channels"],
                    m["bits_per_sample"], m["n_frames"]) == \
                (rate, channels, bits, total)
            if total:
                # the decoder rounds duration to 6 dp
                assert m["duration_s"] == pytest.approx(
                    total / rate, abs=1e-6)
            else:
                assert m["duration_s"] is None

        check()

    def test_ogg_vorbis_fuzz(self):
        @settings(max_examples=60, deadline=None)
        @given(rate=st.integers(1, 192000),
               channels=st.integers(1, 255),
               total=st.integers(0, (1 << 40)))
        def check(rate, channels, total):
            m = ogg_decode(encode_ogg("vorbis", rate, channels,
                                      total_samples=total))
            assert (m["format"], m["sample_rate"], m["channels"],
                    m["n_frames"]) == ("ogg-vorbis", rate, channels,
                                       total)
            assert m["duration_s"] == pytest.approx(total / rate,
                                                    abs=1e-6)

        check()

    def test_ogg_opus_fuzz(self):
        @settings(max_examples=60, deadline=None)
        @given(in_rate=st.integers(0, 192000),
               channels=st.integers(1, 255),
               total=st.integers(0, (1 << 40)),
               pre=st.integers(0, 65535))
        def check(in_rate, channels, total, pre):
            m = ogg_decode(encode_ogg("opus", in_rate, channels,
                                      total_samples=total, pre_skip=pre))
            # opus always reports the 48 kHz decode rate; granules
            # include pre-skip, n_frames excludes it
            assert (m["format"], m["sample_rate"], m["channels"]) == \
                ("ogg-opus", 48000, channels)
            assert m["n_frames"] == total
            assert m["duration_s"] == pytest.approx(total / 48000.0,
                                                    abs=1e-6)

        check()
