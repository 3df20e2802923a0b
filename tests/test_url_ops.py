"""URL/domain curation operators (C4 §2.2 / RefinedWeb §3.1 style source
filtering): extraction, per-doc stats, broadcast blocklist filtering."""

from __future__ import annotations

import pytest

from aggo_spark.operators import text


DOCS = [
    (1, "see https://example.com/page and http://sub.spam.io/x?q=1 today"),
    (2, "plain text, no links at all"),
    (3, "dup links https://example.com/a https://EXAMPLE.com/b"),
    (4, "blocked one: https://spam.io/landing"),
    (5, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


def test_url_stats(docs):
    rows = {r.doc_id: r for r in text.url_stats(docs).collect()}
    assert rows[1].n_urls == 2 and rows[1].n_unique_domains == 2
    assert rows[2].n_urls == 0 and rows[2].n_unique_domains == 0
    # host is lowercased: EXAMPLE.com and example.com are one domain
    assert rows[3].n_urls == 2 and rows[3].n_unique_domains == 1
    assert rows[5].n_urls == 0 and rows[5].url_char_frac == 0.0
    assert 0.0 < rows[4].url_char_frac < 1.0


def test_extract_url_domains(docs):
    pairs = {(r.doc_id, r.domain)
             for r in text.extract_url_domains(docs).collect()}
    assert pairs == {(1, "example.com"), (1, "sub.spam.io"),
                     (3, "example.com"), (4, "spam.io")}


def test_filter_blocked_domains_subdomains(docs):
    kept = sorted(r.doc_id for r in
                  text.filter_blocked_domains(docs, ["spam.io"]).collect())
    # doc 1 cites sub.spam.io (subdomain), doc 4 cites spam.io directly
    assert kept == [2, 3, 5]


def test_filter_blocked_domains_exact_only(docs):
    kept = sorted(r.doc_id for r in text.filter_blocked_domains(
        docs, ["spam.io"], match_subdomains=False).collect())
    assert kept == [1, 2, 3, 5]  # sub.spam.io survives exact-only matching


def test_filter_blocked_domains_dataframe_blocklist(docs, spark):
    bl = spark.createDataFrame([("SPAM.io",), ("example.com",)], "d string")
    kept = sorted(r.doc_id for r in
                  text.filter_blocked_domains(docs, bl).collect())
    assert kept == [2, 5]  # blocklist lowercased; both domains blocked


def test_blocklist_join_is_broadcast(docs, spark):
    plan = text.filter_blocked_domains(docs, ["spam.io"])._jdf.queryExecution(
        ).executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
