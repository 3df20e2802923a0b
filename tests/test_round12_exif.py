"""Round 12: EXIF metadata extraction + image PII stripping.

Real crawled photos carry camera identifiers, timestamps, and GPS
coordinates in EXIF; training-data pipelines must detect and strip
them. The tier is lossless byte surgery: pixels must be bit-identical
before and after the strip (differential-tested through the real JPEG
kernel), and anything unparseable returns None — the quarantine
contract (never pass through bytes whose metadata state is unknown)."""

from __future__ import annotations

import random
import struct
import zlib

import pytest
from pyspark.sql import functions as F

from aggo_spark.operators import multimodal as M


def _tagged(orientation=6, gps=(37.7749, -122.4194), byte_order="II"):
    jpg = M.encode_jpeg(16, 12, (100, 150, 200))
    app1 = M.encode_exif_app1(
        orientation=orientation, datetime="2026:08:16 12:00:00",
        make="Acme", model="Cam 9", gps=gps, byte_order=byte_order)
    return jpg, jpg[:2] + app1 + jpg[2:]


class TestJpegExif:
    @pytest.mark.parametrize("byte_order", ["II", "MM"])
    def test_parse_both_byte_orders(self, byte_order):
        _, tagged = _tagged(byte_order=byte_order)
        e = M.jpeg_exif(tagged)
        assert e["has_exif"] and e["orientation"] == 6
        assert e["make"] == "Acme" and e["model"] == "Cam 9"
        assert e["datetime"] == "2026:08:16 12:00:00"
        assert e["has_gps"] and e["n_gps_tags"] == 4

    def test_no_exif_is_a_real_answer(self):
        jpg, _ = _tagged()
        e = M.jpeg_exif(jpg)
        assert e is not None and e["has_exif"] is False
        assert e["orientation"] is None and e["has_gps"] is False

    def test_corrupt_is_none_not_no_exif(self):
        assert M.jpeg_exif(b"\xff\xd8\xff\x00") is None
        assert M.jpeg_exif(b"not a jpeg") is None
        _, tagged = _tagged()
        assert M.jpeg_exif(tagged[:40]) is None  # truncated pre-SOS

    def test_app1_does_not_change_pixels(self):
        jpg, tagged = _tagged()
        a, b = M.jpeg_pixel_decode(jpg), M.jpeg_pixel_decode(tagged)
        assert a["channel_means"] == b["channel_means"]
        assert a["phash"] == b["phash"]


class TestStrip:
    def test_jpeg_strip_lossless_and_clean(self):
        jpg, tagged = _tagged()
        clean = M.strip_jpeg_metadata(tagged)
        assert M.jpeg_exif(clean)["has_exif"] is False
        p0, p1 = M.jpeg_pixel_decode(jpg), M.jpeg_pixel_decode(clean)
        assert p0["channel_means"] == p1["channel_means"]
        assert p0["phash"] == p1["phash"]

    def test_png_strip_drops_ancillary_chunks(self):
        png = M.encode_png(8, 6, (10, 20, 30))

        def chunk(ct, data):
            c = ct + data
            return (struct.pack(">I", len(data)) + c
                    + struct.pack(">I", zlib.crc32(c)))

        at = png.rindex(b"IEND") - 4
        tainted = (png[:at] + chunk(b"tEXt", b"Author\x00me")
                   + chunk(b"eXIf", b"\x00" * 8)
                   + chunk(b"tIME", b"\x00" * 7) + png[at:])
        assert M.strip_png_metadata(tainted) == png
        assert M.strip_image_metadata_bytes(tainted) == png

    def test_quarantine_contract(self):
        # anything unparseable/unknown -> None, never silent passthrough
        assert M.strip_image_metadata_bytes(b"GIF89a..") is None
        assert M.strip_jpeg_metadata(b"\xff\xd8\xff\x00") is None
        _, tagged = _tagged()
        assert M.strip_jpeg_metadata(tagged[:40]) is None
        png = M.encode_png(4, 4, (1, 2, 3))
        assert M.strip_png_metadata(png[:20]) is None  # no IEND reached

    def test_app14_adobe_survives_strip(self):
        """r12 ADVICE: APP14 carries the Adobe color-transform flag
        that governs CMYK/YCCK decoding — stripping it changes pixel
        interpretation, so it must be preserved (it holds no PII)."""
        jpg, tagged = _tagged()
        app14 = (b"\xff\xee" + struct.pack(">H", 2 + 12)
                 + b"Adobe\x00d\x00\x00\x00\x00\x02")  # transform=YCCK
        adobe = tagged[:2] + app14 + tagged[2:]
        clean = M.strip_jpeg_metadata(adobe)
        assert clean is not None
        assert app14 in clean            # Adobe marker kept verbatim
        assert b"Acme" not in clean      # EXIF (APP1) still stripped
        assert M.jpeg_exif(clean)["has_exif"] is False
        p0, p1 = M.jpeg_pixel_decode(jpg), M.jpeg_pixel_decode(clean)
        assert p0["phash"] == p1["phash"]

    def test_header_only_jpeg_roundtrips_identity(self):
        h = M.encode_jpeg_header(100, 80, 3, progressive=True)
        assert M.strip_jpeg_metadata(h) == h  # APP0 kept, nothing else
        assert M.jpeg_exif(h)["has_exif"] is False

    def test_corruption_fuzz_never_raises(self):
        _, tagged = _tagged()
        rng = random.Random(17)
        for _ in range(400):
            ba = bytearray(tagged)
            for _k in range(rng.randrange(1, 6)):
                ba[rng.randrange(len(ba))] = rng.randrange(256)
            M.jpeg_exif(bytes(ba))
            M.strip_jpeg_metadata(bytes(ba))
        for cut in range(0, len(tagged), 9):
            M.jpeg_exif(tagged[:cut])
            M.strip_jpeg_metadata(tagged[:cut])


class TestDataFramePlumbing:
    def test_extract_and_strip(self, spark):
        jpg, tagged = _tagged()
        png = M.encode_png(8, 6, (10, 20, 30))
        df = spark.createDataFrame(
            [(1, tagged), (2, jpg), (3, png), (4, b"junk"), (5, None)],
            "doc_id long, content binary")
        got = {r["doc_id"]: r for r in M.extract_exif(df).select(
            "doc_id", "exif_meta.has_exif", "exif_meta.has_gps",
            "exif_meta.orientation").collect()}
        assert got[1]["has_exif"] and got[1]["has_gps"]
        assert got[1]["orientation"] == 6
        assert got[2]["has_exif"] is False
        assert got[3]["has_exif"] is None  # PNG: not a JPEG EXIF carrier
        assert got[4]["has_exif"] is None and got[5]["has_exif"] is None
        out = {r["doc_id"]: r["clean_content"]
               for r in M.strip_image_metadata(df).collect()}
        assert M.jpeg_exif(bytes(out[1]))["has_exif"] is False
        assert bytes(out[3]) == png
        assert out[4] is None and out[5] is None  # quarantine + NULL
