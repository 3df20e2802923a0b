"""End-to-end crawl curation: the composed path a pretraining pipeline
actually runs, from raw WARC bytes to a curated token-budgeted corpus —
the crawl-tier analogue of q61's composed-curation evidence.

    read_warc → extract_main_text (boilerplate off) → quality/langid
    → URL-level dedup key → exact dedup → token budget

Every stage is the public operator API; assertions are hand-computable
from the synthesized archive.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

ARTICLE = (
    "this is the main article text and it has enough of the usual "
    "english words that both the quality score and the language "
    "classifier will keep it in the corpus for training")
SPANISH = (
    "el texto principal es una larga historia en español con muchas de "
    "las palabras habituales que el clasificador de idioma reconoce "
    "como español y por eso no es un documento en inglés para el corpus")


def _archive(tmp_path):
    from aggo_spark.sources.warc import encode_warc

    def page(body, nav="Home About Contact"):
        return (f"<html><head><script>var x=1;</script></head><body>"
                f"<nav><li>{nav}</li></nav><p>{body}</p>"
                f"<footer>copyright</footer></body></html>").encode()

    recs = [
        # two URL spellings of the SAME page (tracking params / case):
        # URL canonicalization must give them one key, exact dedup one row
        {"warc_type": "response", "http": True,
         "url": "http://a.example/story?id=1&utm_source=tw",
         "payload": page(ARTICLE)},
        {"warc_type": "response", "http": True,
         "url": "http://a.example/story?utm_campaign=x&id=1",
         "payload": page(ARTICLE)},
        # distinct page, same text (content dedup catches it)
        {"warc_type": "response", "http": True,
         "url": "http://b.example/copy", "payload": page(ARTICLE)},
        # non-English page (language filter drops it)
        {"warc_type": "response", "http": True,
         "url": "http://c.example/es", "payload": page(SPANISH)},
        # boilerplate-only page (extraction yields '', length filter drops)
        {"warc_type": "response", "http": True,
         "url": "http://d.example/nav", "payload": page("Short nav thing")},
        # non-HTML response (content-type filter drops it)
        {"warc_type": "response", "http": True,
         "http_content_type": "image/png",
         "url": "http://e.example/img", "payload": b"\x89PNG fake"},
    ]
    p = tmp_path / "crawl.warc.gz"
    p.write_bytes(encode_warc(recs, gzip_members=True))
    return str(tmp_path)


def test_warc_to_curated_corpus(spark, tmp_path):
    from aggo_spark.operators.dedup import exact_dedup
    from aggo_spark.operators.html import extract_main_text
    from aggo_spark.operators.text import (add_language_id, quality_score,
                                           url_dedup_key)
    from aggo_spark.sources.warc import read_warc

    pages = (
        read_warc(spark, _archive(tmp_path))
        .filter("http_content_type = 'text/html'")
        .select(F.col("url"), F.col("payload").cast("string").alias("html"))
    )
    assert pages.count() == 5  # image/png filtered at the source

    # multilingual crawl: classify blocks by LENGTH only (an English
    # stopword-density gate would drop the Spanish article at the
    # extraction stage — language policy belongs to the langid filter
    # downstream, not the boilerplate classifier)
    docs = (
        extract_main_text(pages, id_col="url", stopword_frac=0.0)
        .select("url", F.col("main_text").alias("text"))
        .filter(F.length("text") > 50)  # boilerplate-only page drops here
        .withColumn("url_key", url_dedup_key(F.col("url")))
    )
    assert docs.count() == 4
    # the two story spellings share one canonical URL key
    assert docs.select("url_key").distinct().count() == 3

    # URL-level dedup first (cheap), then quality + language
    by_url = (docs.groupBy("url_key")
              .agg(F.min("url").alias("url"), F.first("text").alias("text")))
    q = quality_score(F.col("text"))
    scored = add_language_id(
        by_url.withColumn("quality", q["quality"]), "text", id_col="url")
    kept = scored.filter((F.col("quality") >= 0.5)
                         & (F.col("pred_lang") == "en"))
    urls = {r.url for r in kept.select("url").collect()}
    assert urls == {"http://a.example/story?id=1&utm_source=tw",
                    "http://b.example/copy"}  # Spanish page dropped

    # content-level exact dedup collapses the surviving mirror copy
    final = exact_dedup(kept, "text", "url")
    rows = final.collect()
    assert len(rows) == 1 and rows[0].n_copies == 2
    # min-key representative: deterministic across runs
    assert rows[0].url == "http://a.example/story?id=1&utm_source=tw"


def test_wet_shortcut_reaches_same_text(spark, tmp_path):
    from aggo_spark.sources.warc import encode_warc, read_wet

    p = tmp_path / "x.wet.gz"
    p.write_bytes(encode_warc([
        {"warc_type": "conversion", "url": "http://a.example/story",
         "content_type": "text/plain", "payload": ARTICLE.encode()},
    ], gzip_members=True))
    rows = read_wet(spark, str(tmp_path)).collect()
    assert len(rows) == 1 and rows[0].text == ARTICLE
