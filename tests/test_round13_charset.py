"""Round 13: charset-aware crawl text decode (html.decode_html_bytes).

Real crawls are not all UTF-8. The sniffing order is BOM > <meta>
declaration > HTTP header charset > utf-8 fallback, and the decode is
a pure-Column CASE over ``F.decode`` literals (JVM-side; malformed
bytes become U+FFFD under the session's replacement conf, never task
failures). The WARC parser now also captures the Content-Type header's
charset= parameter into ``http_charset``.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aggo_spark.operators.html import decode_html_bytes, sniff_charset
from aggo_spark.sources.warc import encode_warc, parse_warc_bytes


def _decode_one(spark, payload: bytes, header: str | None):
    df = spark.createDataFrame([(payload, header)],
                               "payload BINARY, http_charset STRING")
    r = decode_html_bytes(df).select("charset", "text").collect()[0]
    return r["charset"], r["text"]


class TestSniffAndDecode:
    def test_header_charset(self, spark):
        cs, text = _decode_one(
            spark, "<html><body>héllo wörld</body></html>"
            .encode("windows-1252"), "windows-1252")
        assert cs == "windows-1252"
        assert "héllo wörld" in text

    def test_meta_charset_quoted_and_bare(self, spark):
        for meta in ('<meta charset="shift_jis">',
                     "<meta charset=shift_jis>",
                     "<META CHARSET='Shift_JIS'>"):
            cs, text = _decode_one(
                spark, f"<html>{meta}<body>こんにちは世界</body></html>"
                .encode("shift_jis"), None)
            assert cs == "Shift_JIS", meta
            assert "こんにちは世界" in text

    def test_http_equiv_meta(self, spark):
        html = ('<html><meta http-equiv="Content-Type" '
                'content="text/html; charset=gb2312">'
                "<body>你好世界</body></html>")
        cs, text = _decode_one(spark, html.encode("gb2312"), None)
        assert cs == "GB18030"  # superset routing
        assert "你好世界" in text

    def test_meta_beats_header(self, spark):
        html = ('<meta charset="koi8-r"><body>привет</body>')
        cs, text = _decode_one(spark, html.encode("koi8_r"),
                               "windows-1252")
        assert cs == "KOI8-R"
        assert "привет" in text

    def test_bom_beats_everything(self, spark):
        body = b"\xff\xfe" + "<html>текст</html>".encode("utf-16le")
        cs, text = _decode_one(spark, body, "windows-1252")
        assert cs == "UTF-16LE"
        assert "текст" in text
        assert not text.startswith("﻿")

    def test_utf8_bom_stripped(self, spark):
        cs, text = _decode_one(spark, b"\xef\xbb\xbf<html>x</html>", None)
        assert cs == "UTF-8"
        assert text == "<html>x</html>"

    def test_unknown_charset_falls_back_to_utf8(self, spark):
        cs, text = _decode_one(
            spark, "<meta charset=klingon-8><p>ascii body</p>"
            .encode("ascii"), "martian-5")
        assert cs == "UTF-8"
        assert "ascii body" in text

    def test_malformed_bytes_replace_not_fail(self, spark):
        cs, text = _decode_one(spark, b"<p>ok \xff\xfe\x01 bad</p>", None)
        assert "ok" in text and "bad" in text
        assert "�" in text

    def test_latin1_aliases(self, spark):
        for alias in ("latin1", "iso-8859-1", "ISO8859-1", "L1"):
            cs, text = _decode_one(
                spark, "<p>café</p>".encode("latin-1"), alias)
            assert cs == "ISO-8859-1", alias
            assert "café" in text

    def test_sniff_column_form(self, spark):
        df = spark.createDataFrame(
            [(b"\xef\xbb\xbfhello", None)],
            "payload BINARY, http_charset STRING")
        got = df.select(sniff_charset(
            F.col("payload"), F.col("http_charset")).alias("c")).collect()
        assert got[0]["c"] == "UTF-8"


class TestWarcCharsetCapture:
    def _rec(self, ct_header: bytes):
        payload = (b"HTTP/1.1 200 OK\r\nContent-Type: " + ct_header
                   + b"\r\n\r\n<html>x</html>")
        recs = [{"warc_type": "response", "url": "http://e.com/x",
                 "content_type": "application/http; msgtype=response",
                 "payload": payload}]
        return list(parse_warc_bytes(encode_warc(recs)))[0]

    def test_charset_param_captured(self):
        rec = self._rec(b"text/html; charset=UTF-8")
        assert rec["http_content_type"] == "text/html"
        assert rec["http_charset"] == "utf-8"

    def test_quoted_and_spaced(self):
        rec = self._rec(b'text/html; boundary=x; charset="Windows-1252"')
        assert rec["http_charset"] == "windows-1252"

    def test_absent_is_none(self):
        assert self._rec(b"text/html")["http_charset"] is None


class TestFrontDoorCharset:
    def test_read_crawl_text_decodes_sjis_page(self, spark, tmp_path):
        html = ("<html><meta charset=shift_jis><body><p>"
                "こんにちは世界、これは十分に長い日本語の段落です。"
                "</p></body></html>")
        payload = (b"HTTP/1.1 200 OK\r\n"
                   b"Content-Type: text/html\r\n\r\n"
                   + html.encode("shift_jis"))
        blob = encode_warc(
            [{"warc_type": "response", "url": "http://jp.example/x",
              "content_type": "application/http; msgtype=response",
              "payload": payload}])
        p = tmp_path / "jp.warc"
        p.write_bytes(blob)
        from aggo_spark.sources.warc import read_crawl_text
        rows = read_crawl_text(spark, str(p)).collect()
        assert len(rows) == 1
        assert "こんにちは世界" in rows[0]["text"]


# per-target sample text valid in that charset, used for the
# every-Java-name-is-real completeness sweep (an invalid Java charset
# name would throw at runtime, and a mis-mapped alias would garble the
# Python-encode -> Spark-decode equality)
_CS_SAMPLES = {
    "UTF-8": ("utf-8", "héllo 世界 مرحبا"),
    "US-ASCII": ("ascii", "plain ascii"),
    "ISO-8859-1": ("latin-1", "café naïve"),
    "windows-1252": ("cp1252", "café — naïve"),
    "ISO-8859-15": ("iso-8859-15", "café €uro"),
    "ISO-8859-2": ("iso-8859-2", "příliš žluťoučký"),
    "windows-1250": ("cp1250", "příliš žluťoučký"),
    "windows-1251": ("cp1251", "привет мир"),
    "KOI8-R": ("koi8_r", "привет мир"),
    "KOI8-U": ("koi8_u", "привіт світ"),
    "ISO-8859-5": ("iso-8859-5", "привет"),
    "ISO-8859-7": ("iso-8859-7", "γειά σου"),
    "windows-1253": ("cp1253", "γειά σου"),
    "ISO-8859-9": ("iso-8859-9", "merhaba dünya ığş"),
    "windows-1254": ("cp1254", "merhaba dünya ığş"),
    "windows-1255": ("cp1255", "שלום עולם"),
    "windows-1256": ("cp1256", "مرحبا بالعالم"),
    "windows-1257": ("cp1257", "sveika pasaule āžč"),
    "windows-1258": ("cp1258", "xin chào"),
    "Shift_JIS": ("shift_jis", "こんにちは世界"),
    "windows-31j": ("cp932", "こんにちは世界①"),
    "EUC-JP": ("euc_jp", "こんにちは世界"),
    "ISO-2022-JP": ("iso2022_jp", "こんにちは"),
    "GB18030": ("gb18030", "你好世界"),
    "Big5": ("big5", "你好世界"),
    "Big5-HKSCS": ("big5hkscs", "你好世界"),
    "EUC-KR": ("euc_kr", "안녕하세요"),
    "TIS-620": ("tis-620", "สวัสดี"),
    "x-windows-874": ("cp874", "สวัสดี"),
    "UTF-16": ("utf-16", "utf16 世界"),
    "UTF-16LE": ("utf-16-le", "utf16le 世界"),
    "UTF-16BE": ("utf-16-be", "utf16be 世界"),
}


class TestEveryTargetDecodes:
    def test_all_targets_roundtrip_python_to_jvm(self, spark):
        from aggo_spark.operators.html import _CHARSET_ALIASES
        targets = sorted(set(_CHARSET_ALIASES.values()))
        assert set(targets) <= set(_CS_SAMPLES), (
            set(targets) - set(_CS_SAMPLES))
        alias_for = {}
        for alias, tgt in _CHARSET_ALIASES.items():
            alias_for.setdefault(tgt, alias)
        rows = [(tgt, bytearray(_CS_SAMPLES[tgt][1]
                                .encode(_CS_SAMPLES[tgt][0])),
                 alias_for[tgt]) for tgt in targets]
        df = spark.createDataFrame(
            rows, "tgt string, payload binary, http_charset string")
        out = decode_html_bytes(df).select("tgt", "charset",
                                           "text").collect()
        for r in out:
            assert r["text"] == _CS_SAMPLES[r["tgt"]][1], r["tgt"]
