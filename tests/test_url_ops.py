"""URL/domain curation operators (C4 §2.2 / RefinedWeb §3.1 style source
filtering): extraction, per-doc stats, broadcast blocklist filtering."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

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


# ---------------------------------------------------------------------------
# LM-score filter (CCNet-style, unigram-LM honest version) + paragraphs
# ---------------------------------------------------------------------------


def test_unigram_logprob_score(spark):
    from math import log
    df = spark.createDataFrame(
        [(1, "the the the"), (2, "the zzz"), (3, "")],
        "doc_id int, text string")
    out = {r.doc_id: r for r in text.unigram_logprob_score(df, add_k=0.5).collect()}
    # corpus: the×4, zzz×1 → N=5, V=2, denom=6
    p_the, p_zzz = (4 + 0.5) / 6.0, (1 + 0.5) / 6.0
    assert out[1].n_tokens == 3
    assert out[1].mean_logprob == pytest.approx(log(p_the), abs=1e-6)
    assert out[2].mean_logprob == pytest.approx((log(p_the) + log(p_zzz)) / 2, abs=1e-6)
    # common-word doc scores higher than the one with a rare token
    assert out[1].mean_logprob > out[2].mean_logprob
    # empty doc: no evidence → NULL score, zero tokens, row preserved
    assert out[3].n_tokens == 0 and out[3].mean_logprob is None


def test_unigram_logprob_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id int, text string")
    out = text.unigram_logprob_score(df)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["doc_id", "n_tokens", "mean_logprob"]


def test_explode_paragraphs_and_paragraph_dedup(spark):
    from aggo_spark.operators import dedup
    df = spark.createDataFrame(
        [(1, "Alpha beta.\n\nShared paragraph here.\n \nGamma."),
         (2, "Shared paragraph here.\n\nUnique tail.")],
        "doc_id int, text string")
    paras = text.explode_paragraphs(df)
    got = {(r.doc_id, r.para_idx, r.para) for r in paras.collect()}
    assert got == {
        (1, 0, "Alpha beta."), (1, 1, "Shared paragraph here."), (1, 2, "Gamma."),
        (2, 0, "Shared paragraph here."), (2, 1, "Unique tail."),
    }
    # paragraph-granularity exact dedup = compose with the existing operator
    keyed = paras.select(
        F.concat_ws("#", "doc_id", "para_idx").alias("pid"), "para")
    reps = dedup.exact_dedup(keyed, text_col="para", id_col="pid")
    n_copies = {r.pid: r.n_copies for r in reps.collect()}
    assert n_copies["1#1"] == 2  # the shared paragraph, min-id representative
    assert sum(n_copies.values()) == 5


def test_url_trailing_punctuation_stripped(spark):
    """Review r4: sentence punctuation glued to a URL must not defeat host
    parsing — 'see https://spam.io.' cites spam.io."""
    df = spark.createDataFrame(
        [(1, "read https://spam.io, it is bad"),
         (2, "see https://spam.io."),
         (3, "wiki (https://en.example.org/wiki/A) link")],
        "doc_id int, text string")
    pairs = {(r.doc_id, r.domain)
             for r in text.extract_url_domains(df).collect()}
    assert pairs == {(1, "spam.io"), (2, "spam.io"), (3, "en.example.org")}
    kept = sorted(r.doc_id for r in
                  text.filter_blocked_domains(df, ["spam.io"]).collect())
    assert kept == [3]


def test_url_stats_null_text_zeroes(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "x https://a.io y")], "doc_id int, text string")
    rows = {r.doc_id: r for r in text.url_stats(df).collect()}
    assert rows[1].n_urls == 0 and rows[1].n_unique_domains == 0
    assert rows[1].url_char_frac == 0.0
    assert rows[2].n_urls == 1


def test_mixture_negative_weight_rejected(spark):
    from aggo_spark.operators import sampling
    df = spark.createDataFrame(
        [(1, "web", 100)], "doc_id int, source string, n_chars int")
    with pytest.raises(ValueError, match="negative mixture weight"):
        sampling.mixture_token_budgets(df, {"web": 2.0, "code": -0.5}, 100)


def test_upsample_handles_struct_columns(spark):
    from aggo_spark.operators import sampling
    df = spark.range(4).selectExpr(
        "cast(id as int) AS doc_id",
        "CASE WHEN id % 2 = 0 THEN 'web' ELSE 'code' END AS source",
        "named_struct('a', id, 'b', cast(NULL as string)) AS meta")
    out = sampling.upsample_sources(df, {"code": 2.0})
    assert out.filter(F.col("source") == "code").count() == 4
    assert out.filter(F.col("source") == "web").count() == 2

