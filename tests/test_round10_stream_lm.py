"""Streaming n-gram LM maintenance (r10) — maintain_ngram_lm keeps the
stupid-backoff model fresh under CDC without retraining.

Pinned:
- model-table equality with batch train-on-live-docs after add / edit /
  remove (the retraining-equivalence contract);
- score equality: lm_score == ngram_logprob_score(reference=live docs);
- retraction: removing a doc removes its grams' mass (vocab shrinks,
  scores change accordingly);
- compaction netting preserves the model.
"""
import pytest
from pyspark.sql import functions as F

from tests.conftest import *  # noqa: F401,F403  (spark fixture)

from aggo_spark.operators import text
from aggo_spark.streaming.core import StreamingCollection

# marked slow (r14): excluded from the default driver gate, run with -m slow
pytestmark = pytest.mark.slow


D1 = "the quick brown fox jumps over the lazy dog"
D2 = "the quick brown cat sleeps under the warm sun"
D3 = "a completely different sentence with other words entirely"
D4 = "the quick brown fox runs through the green field"


def _doc(i, t):
    return {"doc_id": i, "text": t}


def _live_df(spark, live):
    return spark.createDataFrame(
        [(i, t) for i, t in live], "doc_id long, text string")


def _batch_tables(spark, live, n):
    """Oracle: train_ngram_lm's table builder on the live docs."""
    return text._ngram_model_tables(_live_df(spark, live), n, "text",
                                    "doc_id")


def _tab(df, cols):
    return {tuple(r[c] for c in cols): r["cnt"] for r in df.collect()}


def _assert_model_equal(spark, coll, rid, live, n):
    got = coll.lm_tables(rid)
    want = _batch_tables(spark, live, n)
    for k in range(2, n + 1):
        cols = [f"t{i + 1}" for i in range(k)]
        assert _tab(got[f"gram_{k}"], cols) == \
            _tab(want[f"gram_{k}"], cols), f"gram_{k} mismatch"
        assert _tab(got[f"ctx_{k}"], cols[:-1]) == \
            _tab(want[f"ctx_{k}"], cols[:-1]), f"ctx_{k} mismatch"
    assert _tab(got["uni"], ["t2"]) == _tab(want["uni"], ["t2"])


class TestStreamLM:
    def test_model_equals_batch_after_mutations(self, spark, tmp_path):
        coll = StreamingCollection(
            spark, "doc_id long, text string", workdir=str(tmp_path))
        try:
            rid = coll.maintain_ngram_lm(str(tmp_path / "lm"), n=3)
            live = []

            coll.add(_doc(1, D1))
            live.append((1, D1))
            coll.add(_doc(2, D2))
            live.append((2, D2))
            _assert_model_equal(spark, coll, rid, live, 3)

            # EDIT: remove + re-add with different text
            coll.remove(_doc(1, D1))
            coll.add(_doc(1, D4))
            live[0] = (1, D4)
            _assert_model_equal(spark, coll, rid, live, 3)

            # REMOVE: grams fall out as if retrained
            coll.remove(_doc(2, D2))
            live.pop(1)
            _assert_model_equal(spark, coll, rid, live, 3)
        finally:
            coll.stop()

    def test_score_equals_reference_mode(self, spark, tmp_path):
        coll = StreamingCollection(
            spark, "doc_id long, text string", workdir=str(tmp_path))
        try:
            rid = coll.maintain_ngram_lm(str(tmp_path / "lm"), n=3)
            live = [(1, D1), (2, D2), (3, D3)]
            for i, t in live:
                coll.add(_doc(i, t))
            queries = spark.createDataFrame(
                [(10, D4), (11, "totally unseen words appear here")],
                "doc_id long, text string")
            got = {r["doc_id"]: (r["n_ngrams"], r["mean_logprob"])
                   for r in coll.lm_score(rid, queries).collect()}
            want = {r["doc_id"]: (r["n_ngrams"], r["mean_logprob"])
                    for r in text.ngram_logprob_score(
                        queries, model=_live_df(spark, live),
                        n=3).collect()}
            assert got == want
            # exercises all three levels: D4 shares grams with D1,
            # doc 11 is pure unigram-backoff territory
            assert got[10][0] > 0 and got[11][0] > 0
        finally:
            coll.stop()

    def test_retraction_shrinks_vocab(self, spark, tmp_path):
        coll = StreamingCollection(
            spark, "doc_id long, text string", workdir=str(tmp_path))
        try:
            rid = coll.maintain_ngram_lm(str(tmp_path / "lm"), n=2)
            coll.add(_doc(1, D1))
            coll.add(_doc(3, D3))
            v0 = coll.lm_tables(rid)["uni"].count()
            coll.remove(_doc(3, D3))
            v1 = coll.lm_tables(rid)["uni"].count()
            assert v1 < v0
            _assert_model_equal(spark, coll, rid, [(1, D1)], 2)
        finally:
            coll.stop()

    def test_compaction_preserves_model(self, spark, tmp_path):
        coll = StreamingCollection(
            spark, "doc_id long, text string", workdir=str(tmp_path))
        try:
            rid = coll.maintain_ngram_lm(str(tmp_path / "lm"), n=2,
                                         compact_every=2)
            live = []
            for i, t in ((1, D1), (2, D2), (3, D3), (4, D4)):
                coll.add(_doc(i, t))
                live.append((i, t))
            coll.remove(_doc(2, D2))
            live = [(i, t) for i, t in live if i != 2]
            coll.flush()  # drives compaction past compact_every
            _assert_model_equal(spark, coll, rid, live, 2)
        finally:
            coll.stop()
