"""Plan-shape guards for the r4 curation operators — the structural
analogue of the value tests: a lost broadcast, a lost exchange reuse, or a
surprise extra shuffle fails here even while values stay correct."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from aggo_spark.operators import sampling, similarity, text


def _exec_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _n_exchanges(df) -> int:
    return len(re.findall(r"(?<!Reused)Exchange", _exec_plan(df)))


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"doc {i} text with https://ex{i % 3}.io/x words here", "web")
         for i in range(40)],
        "doc_id int, text string, source string")


def test_url_stats_single_agg_exchange(docs):
    # per-doc signals are narrow; the only exchanges serve the per-doc
    # domain count-distinct and its join back
    assert _n_exchanges(text.url_stats(docs)) <= 3


def test_unigram_logprob_single_explode(docs):
    """r6: freq(t) is a window sum riding the per-(doc, term) rows, so the
    tokenize+explode lineage appears ONCE in the plan (the r4 join shape
    ran it three times at execution — cross-branch exchange reuse never
    covered the probe side; measured 8.3 s vs 3.5 s at sf1). The corpus
    scalars are a memoized driver job, not a plan branch."""
    df = text.unigram_logprob_score(docs)
    plan = _exec_plan(df)
    assert plan.count("Generate explode") == 1, plan[:2000]


def test_mixture_sample_single_window_exchange(docs):
    sized = docs.withColumn("n_chars", F.length("text"))
    out = sampling.mixture_sample(sized, {"web": 1.0}, total_tokens=500)
    # one exchange for the per-source window walk (budget-map is a literal)
    assert _n_exchanges(out) <= 1


def test_upsample_sources_is_narrow(docs):
    out = sampling.upsample_sources(docs, {"web": 2.0})
    assert _n_exchanges(out) == 0


def test_semantic_dedup_no_cartesian(spark):
    emb = spark.createDataFrame(
        [(i, [float(i % 7), float((i * 3) % 5), 1.0, 0.5]) for i in range(30)],
        "vec_id int, embedding array<double>")
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    out = similarity.semantic_dedup(emb, threshold=0.99, centroids=cents)
    plan = _exec_plan(out)
    assert "CartesianProduct" not in plan
    # the pair join is equi on cell
    assert "cell" in plan


def test_filter_blocked_domains_corpus_never_shuffles_text(docs):
    out = text.filter_blocked_domains(docs, ["ex0.io"])
    plan = _exec_plan(out)
    # blocklist side broadcast; the anti join against blocked ids is also
    # broadcast at this size — no sort-merge of the corpus
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
