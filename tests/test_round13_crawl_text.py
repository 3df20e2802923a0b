"""Round 13: the assembled crawl front door — one call from WARC
bytes to (url, content_type, text), html and pdf slices routed to
their extractors, everything unverifiable dropped."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from aggo_spark.operators import pdf as P
from aggo_spark.sources import warc as W


@pytest.fixture(scope="module")
def crawl_dir(tmp_path_factory):
    wd = tmp_path_factory.mktemp("crawl")
    html = (b"<html><head><script>x</script></head>"
            b"<body><p>html page text</p></body></html>")
    encrypted = P.encode_pdf("secret").replace(
        b"trailer\n<<", b"trailer\n<< /Encrypt 9 0 R")
    recs = [
        {"warc_type": "response", "http": True,
         "url": "https://x.org/a.html", "payload": html},
        {"warc_type": "response", "http": True,
         "http_content_type": "application/pdf",
         "url": "https://x.org/b.pdf",
         "payload": P.encode_pdf("pdf body text")},
        {"warc_type": "response", "http": True,
         "http_content_type": "application/pdf",
         "url": "https://x.org/locked.pdf", "payload": bytes(encrypted)},
        {"warc_type": "response", "http": True,
         "http_content_type": "image/png",
         "url": "https://x.org/logo.png", "payload": b"\x89PNG..."},
        {"warc_type": "request",
         "content_type": "application/http; msgtype=request",
         "url": "https://x.org/a.html", "payload": b"GET / HTTP/1.1\r\n\r\n"},
        {"warc_type": "response", "http": True,
         "http_content_type": "text/plain",
         "url": "https://x.org/notes.txt", "payload": b"plain notes"},
    ]
    with open(os.path.join(wd, "part-0.warc"), "wb") as f:
        f.write(W.encode_warc(recs))
    return str(wd)


class TestReadCrawlText:
    def test_default_slices(self, spark, crawl_dir):
        out = W.read_crawl_text(spark, crawl_dir + "/*.warc")
        rows = {r["url"]: r for r in out.collect()}
        assert set(rows) == {"https://x.org/a.html", "https://x.org/b.pdf"}
        assert rows["https://x.org/a.html"]["text"] == "html page text"
        assert rows["https://x.org/a.html"]["content_type"] == "text/html"
        assert rows["https://x.org/b.pdf"]["text"] == "pdf body text"
        # encrypted pdf quarantined -> dropped; png/request never enter

    def test_single_slice(self, spark, crawl_dir):
        out = W.read_crawl_text(spark, crawl_dir + "/*.warc",
                                content_types=("application/pdf",))
        assert [r["url"] for r in out.collect()] == ["https://x.org/b.pdf"]

    def test_passthrough_slice(self, spark, crawl_dir):
        out = W.read_crawl_text(
            spark, crawl_dir + "/*.warc",
            content_types=("text/plain",))
        rows = out.collect()
        assert len(rows) == 1 and rows[0]["text"] == "plain notes"

    def test_composes_with_quality(self, spark, crawl_dir):
        from aggo_spark.operators import text as T

        out = W.read_crawl_text(spark, crawl_dir + "/*.warc")
        scored = out.withColumn("tok", T.tokens(F.col("text")))
        scored = scored.withColumn(
            "lang", T.language_id_from_tokens(F.col("tok")))
        assert scored.filter(F.col("lang").isNotNull()).count() == 2
