"""Round 13: distributed WARC/WET sinks (write_warc / write_wet) —
curated subsets written back as standard archives, round-tripped
through the engine's own readers."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from aggo_spark.sources.warc import (
    read_warc,
    read_wet,
    write_warc,
    write_wet,
)


class TestWriteWarc:
    def test_roundtrip(self, spark, tmp_path):
        rows = [(f"https://e.com/p{i}",
                 f"<html><body>page {i}</body></html>".encode())
                for i in range(40)]
        df = spark.createDataFrame(rows, "url string, payload binary")
        d = str(tmp_path / "out")
        man = write_warc(df, d, num_shards=4)
        assert man.count() == 4
        assert sorted(os.path.basename(p)
                      for p in glob.glob(d + "/part-*.warc.gz"))
        back = read_warc(spark, d + "/*.warc.gz")
        got = {r["url"]: bytes(r["payload"]) for r in back.collect()}
        assert got == dict(rows)
        one = back.filter(F.col("url") == "https://e.com/p3").collect()[0]
        assert one["warc_type"] == "response"
        assert one["http_status"] == 200
        assert one["http_content_type"] == "text/html"
        assert one["record_id"].startswith("<urn:uuid:")

    def test_deterministic_rewrite(self, spark, tmp_path):
        rows = [(f"https://e.com/{i}", b"x" * i) for i in range(1, 30)]
        df = spark.createDataFrame(rows, "url string, payload binary")
        d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
        write_warc(df, d1, num_shards=3)
        write_warc(df, d2, num_shards=3)
        for p in glob.glob(d1 + "/part-*"):
            q = os.path.join(d2, os.path.basename(p))
            assert open(p, "rb").read() == open(q, "rb").read()

    def test_content_type_and_date_columns(self, spark, tmp_path):
        df = spark.createDataFrame(
            [("https://e.com/a", b"%PDF-1.4 x", "application/pdf",
              "2025-05-05T05:05:05Z")],
            "url string, payload binary, content_type string,"
            " warc_date string")
        d = str(tmp_path / "out")
        write_warc(df, d, num_shards=1)
        rec = read_warc(spark, d + "/*.warc.gz").collect()[0]
        assert rec["http_content_type"] == "application/pdf"
        assert rec["warc_date"] == "2025-05-05T05:05:05Z"
        assert bytes(rec["payload"]) == b"%PDF-1.4 x"


class TestWriteWet:
    def test_roundtrip_through_read_wet(self, spark, tmp_path):
        rows = [(f"https://e.com/{i}",
                 f"extracted text {i} héllo 世界") for i in range(25)]
        df = spark.createDataFrame(rows, "url string, text string")
        d = str(tmp_path / "wet")
        man = write_wet(df, d, num_shards=2)
        assert man.agg(F.sum("n_records")).collect()[0][0] == 25
        back = read_wet(spark, d + "/*.warc.gz")
        got = {r["url"]: r["text"] for r in back.collect()}
        assert got == dict(rows)
