"""Round 13: PDF text extraction for the crawl front door.

``application/pdf`` responses were previously dropped by the WARC
chain (r12 verdict "what's missing #1"). Pinned here: encoder/decoder
roundtrip (escapes, unicode, multi-page), xref walk + brute-scan
fallback, Flate + uncompressed streams, literal/hex/octal/UTF-16BE
string forms, T*/Td newline semantics, the quarantine contract
(corrupt deflate, inflate bombs, encryption, truncation), and the
Arrow-batched Spark column surface.
"""

from __future__ import annotations

import random
import re
import zlib

import pytest
from pyspark.sql import functions as F

from aggo_spark.operators import pdf as P

TEXT = ("Training data pipelines need PDF text.\n"
        "Escapes: (parens), back\\slash, 100% coverage.\n"
        "Unicode: café, 中文, emoji ☃.")


class TestRoundtrip:
    @pytest.mark.parametrize("compress", [True, False])
    def test_single_page_exact(self, compress):
        b = P.encode_pdf(TEXT, compress=compress)
        assert P.pdf_extract_text(b) == TEXT

    def test_multi_page_joins_with_newline(self):
        pages = ["page one", "page two\nline 2", "page three"]
        got = P.pdf_extract_text(P.encode_pdf(pages))
        assert got == "\n".join(pages)

    def test_empty_page_is_empty_string_not_none(self):
        assert P.pdf_extract_text(P.encode_pdf("")) == ""

    def test_cr_and_crlf_in_text_survive(self):
        t = "a\rb\r\nc"  # encoder escapes raw CR/LF inside strings
        assert P.pdf_extract_text(P.encode_pdf(t)) == t

    def test_structure_is_valid(self):
        b = P.encode_pdf(["x", "y"])
        assert b.startswith(b"%PDF-1.4")
        assert b.rstrip().endswith(b"%%EOF")
        m = P.pdf_metadata(b)
        assert m["n_pages"] == 2
        assert m["n_streams"] == 2
        assert m["encrypted"] is False
        # xref offsets are real: every in-use entry points at 'N 0 obj'
        at = int(re.search(rb"startxref\s+(\d+)", b).group(1))
        assert b[at:at + 4] == b"xref"


class TestRoundtripProperty:
    def test_any_text_roundtrips(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=150, deadline=None)
        @given(st.text(
            alphabet=st.characters(
                min_codepoint=0x0A, max_codepoint=0x2FFF,
                exclude_characters=[chr(c) for c in range(0x0B, 0x20)]),
            max_size=300), st.booleans())
        def prop(s, compress):
            assert P.pdf_extract_text(
                P.encode_pdf(s, compress=compress)) == s

        prop()


class TestStringForms:
    def test_hex_strings(self):
        content = b"BT <48656c6c6f> Tj ET"
        b = _raw_pdf(content)
        assert P.pdf_extract_text(b) == "Hello"

    def test_hex_odd_digits_pad_zero(self):
        content = b"BT <48656c6c6f2> Tj ET"  # trailing '2' -> 0x20
        assert P.pdf_extract_text(_raw_pdf(content)) == "Hello "

    def test_octal_escapes(self):
        content = rb"BT (\110\151\41) Tj ET"  # Hi!
        assert P.pdf_extract_text(_raw_pdf(content)) == "Hi!"

    def test_nested_balanced_parens(self):
        content = b"BT (a (nested (deep)) b) Tj ET"
        assert P.pdf_extract_text(_raw_pdf(content)) == "a (nested (deep)) b"

    def test_line_continuation_escape(self):
        content = b"BT (split\\\nline) Tj ET"
        assert P.pdf_extract_text(_raw_pdf(content)) == "splitline"

    def test_utf16be_bom_strings(self):
        s = "Hällö".encode("utf-16-be")
        content = b"BT <" + (b"\xfe\xff" + s).hex().encode() + b"> Tj ET"
        assert P.pdf_extract_text(_raw_pdf(content)) == "Hällö"

    def test_tj_array_concatenates(self):
        content = b"BT [(A) -120 (B) 33 (C)] TJ ET"
        assert P.pdf_extract_text(_raw_pdf(content)) == "ABC"

    def test_quote_operator_breaks_line(self):
        content = b"BT (first) Tj (second) ' ET"
        assert P.pdf_extract_text(_raw_pdf(content)) == "first\nsecond"

    def test_text_outside_bt_et_ignored(self):
        content = b"(nope) Tj BT (yes) Tj ET (also nope) Tj"
        assert P.pdf_extract_text(_raw_pdf(content)) == "yes"

    def test_initial_td_no_leading_blank_line(self):
        content = b"BT 72 720 Td (x) Tj T* (y) Tj ET"
        assert P.pdf_extract_text(_raw_pdf(content)) == "x\ny"


class TestResync:
    def test_corrupt_xref_falls_back_to_scan(self):
        b = bytearray(P.encode_pdf(TEXT))
        at = int(re.search(rb"startxref\s+(\d+)", bytes(b)).group(1))
        # stomp the first xref entry so an offset goes stale
        b[at + 10:at + 20] = b"9999999999"
        assert P.pdf_extract_text(bytes(b)) == TEXT

    def test_missing_startxref_falls_back_to_scan(self):
        b = P.encode_pdf(TEXT)
        b = b[:b.rindex(b"startxref")]
        assert P.pdf_extract_text(b) == TEXT


class TestQuarantine:
    def test_not_pdf(self):
        assert P.pdf_extract_text(b"plain text") is None
        assert P.pdf_extract_text(b"") is None
        assert P.pdf_metadata(b"nope") is None

    def test_no_objects(self):
        assert P.pdf_extract_text(b"%PDF-1.4\nnothing here") is None

    def test_corrupt_deflate_quarantines(self):
        b = P.encode_pdf(TEXT)
        # corrupt the middle of the Flate payload
        s = b.index(b"stream\n") + 7
        bad = b[:s + 20] + b"\x00\x00\x00\x00" + b[s + 24:]
        assert P.pdf_extract_text(bad) is None

    def test_inflate_bomb_quarantines(self):
        bomb = zlib.compress(b"\x00" * (P._MAX_STREAM_INFLATED + 4096))
        obj = (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(bomb)).encode()
               + b" /Filter /FlateDecode >>\nstream\n" + bomb
               + b"\nendstream\nendobj\n")
        assert P.pdf_extract_text(obj) is None

    def test_encrypted_quarantines(self):
        b = P.encode_pdf(TEXT)
        b = b.replace(b"trailer\n<<", b"trailer\n<< /Encrypt 9 0 R")
        assert P.pdf_extract_text(b) is None
        assert P.pdf_metadata(b)["encrypted"] is True

    def test_image_streams_skipped_not_fatal(self):
        b = P.encode_pdf(TEXT)
        img = (b"8 0 obj\n<< /Subtype /Image /Filter /DCTDecode "
               b"/Length 4 >>\nstream\n\xff\xd8\xff\xe0\nendstream\nendobj\n")
        at = b.rindex(b"xref")
        mutated = b[:at] + img + b[at:]
        # xref offsets now stale for nothing (we appended before xref),
        # but entry offsets are unchanged so the walk still validates
        assert P.pdf_extract_text(mutated) == TEXT

    def test_corruption_fuzz_never_raises(self):
        b = P.encode_pdf(TEXT)
        rng = random.Random(13)
        for _ in range(300):
            ba = bytearray(b)
            for _k in range(rng.randrange(1, 8)):
                ba[rng.randrange(len(ba))] = rng.randrange(256)
            P.pdf_extract_text(bytes(ba))
            P.pdf_metadata(bytes(ba))
        for cut in range(0, len(b), 17):
            P.pdf_extract_text(b[:cut])
            P.pdf_metadata(b[:cut])


class TestSparkSurface:
    def test_extract_column(self, spark):
        rows = [
            (1, P.encode_pdf("doc one text")),
            (2, P.encode_pdf(["p1", "p2"])),
            (3, b"not a pdf"),
            (4, None),
        ]
        df = spark.createDataFrame(rows, "doc_id long, content binary")
        out = {r["doc_id"]: r["pdf_text"]
               for r in P.extract_pdf_text(df).collect()}
        assert out == {1: "doc one text", 2: "p1\np2", 3: None, 4: None}

    def test_metadata_column(self, spark):
        df = spark.createDataFrame(
            [(1, P.encode_pdf(["a", "b", "c"]))],
            "doc_id long, content binary")
        m = P.extract_pdf_metadata(df).collect()[0]["pdf_meta"]
        assert m["n_pages"] == 3 and m["encrypted"] is False

    def test_plan_is_narrow(self, spark):
        df = spark.createDataFrame(
            [(1, P.encode_pdf("x"))], "doc_id long, content binary")
        plan = P.extract_pdf_text(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan  # per-blob, shuffle-free


def _raw_pdf(content: bytes) -> bytes:
    """Minimal PDF wrapping one uncompressed content stream."""
    return (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
            b"trailer\n<< /Size 2 >>\n%%EOF\n")
