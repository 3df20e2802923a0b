"""quantile_tiers — exact value-threshold quantile buckets (the CCNet
head/middle/tail partition; r10, pairs with the persisted n-gram LM in
q78_lm_perplexity's oracle chain).

Pinned: integer-arithmetic threshold choice, value semantics under ties
(every row sharing a score shares a tier), tie runs spanning a boundary,
NULL scores, degenerate single-value corpora, and the no-window plan.
"""
import pytest
from pyspark.sql import functions as F

from tests.conftest import *  # noqa: F401,F403  (spark fixture)

from aggo_spark.operators.sampling import quantile_tiers


def _tiers(spark, scores, labels=("tail", "middle", "head")):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(scores)], "id long, s double")
    out = quantile_tiers(df, "s", labels=labels)
    return {r["id"]: r["tier"] for r in out.collect()}


class TestQuantileTiers:
    def test_even_split(self, spark):
        got = _tiers(spark, [1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
        # n=6, targets ceil(6/3)=2, ceil(12/3)=4 -> ths at 2.0 and 4.0
        assert got == {0: "tail", 1: "tail", 2: "middle", 3: "middle",
                       4: "head", 5: "head"}

    def test_value_semantics_ties_share_tier(self, spark):
        # five equal scores + one higher: the tie run's cumulative count
        # (5) crosses BOTH targets (2 and 4), so tail and middle share
        # the same threshold value -> middle is empty, ties stay together
        got = _tiers(spark, [1.0, 1.0, 1.0, 1.0, 1.0, 9.0])
        assert got == {0: "tail", 1: "tail", 2: "tail", 3: "tail",
                       4: "tail", 5: "head"}

    def test_remainder_goes_low(self, spark):
        # n=5: targets ceil(5/3)=2, ceil(10/3)=4
        got = _tiers(spark, [1.0, 2.0, 3.0, 4.0, 5.0])
        assert got == {0: "tail", 1: "tail", 2: "middle", 3: "middle",
                       4: "head"}

    def test_null_scores_get_null_tier(self, spark):
        df = spark.createDataFrame(
            [(0, 1.0), (1, None), (2, 3.0), (3, 2.0)], "id long, s double")
        got = {r["id"]: r["tier"]
               for r in quantile_tiers(df, "s").collect()}
        assert got[1] is None
        assert got[0] == "tail" and got[2] == "head"

    def test_single_value_corpus(self, spark):
        got = _tiers(spark, [2.0, 2.0, 2.0])
        assert set(got.values()) == {"tail"}

    def test_two_labels(self, spark):
        got = _tiers(spark, [1.0, 2.0, 3.0, 4.0], labels=("lo", "hi"))
        assert got == {0: "lo", 1: "lo", 2: "hi", 3: "hi"}

    def test_bad_labels_raise(self, spark):
        df = spark.createDataFrame([(0, 1.0)], "id long, s double")
        with pytest.raises(ValueError, match="tier labels"):
            quantile_tiers(df, "s", labels=("only",))

    def test_all_null_scores(self, spark):
        df = spark.createDataFrame(
            [(0, None), (1, None)], "id long, s double")
        got = {r["id"]: r["tier"]
               for r in quantile_tiers(df, "s").collect()}
        assert got == {0: None, 1: None}

    def test_by_group_tiers(self, spark):
        # per-language tiering (the actual CCNet shape): thresholds are
        # computed within each group, so identical scores can land in
        # different tiers across groups
        df = spark.createDataFrame(
            [(0, "en", 1.0), (1, "en", 2.0), (2, "en", 3.0),
             (3, "fr", 3.0), (4, "fr", 4.0), (5, "fr", 5.0)],
            "id long, lang string, s double")
        got = {r["id"]: r["tier"]
               for r in quantile_tiers(df, "s", by="lang").collect()}
        assert got == {0: "tail", 1: "middle", 2: "head",
                       3: "tail", 4: "middle", 5: "head"}
        # 3.0 is head in en but tail in fr — group-local thresholds

    def test_by_group_null_key_and_null_scores(self, spark):
        df = spark.createDataFrame(
            [(0, None, 1.0), (1, None, 2.0), (2, None, 3.0),
             (3, "en", None)],
            "id long, lang string, s double")
        got = {r["id"]: r["tier"]
               for r in quantile_tiers(df, "s", by="lang").collect()}
        assert got[0] == "tail" and got[1] == "middle" and got[2] == "head"
        assert got[3] is None  # null score -> null tier

    def test_by_matches_global_for_single_group(self, spark):
        scores = [1.0, 5.0, 2.0, 4.0, 3.0, 6.0, 2.0]
        df = spark.createDataFrame(
            [(i, "x", s) for i, s in enumerate(scores)],
            "id long, g string, s double")
        a = {r["id"]: r["tier"]
             for r in quantile_tiers(df, "s").collect()}
        b = {r["id"]: r["tier"]
             for r in quantile_tiers(df, "s", by="g").collect()}
        assert a == b

    def test_no_window_in_plan(self, spark):
        # the assignment is a broadcast-literal CASE: no Window, no
        # second Exchange beyond the histogram's own aggregate
        df = spark.createDataFrame(
            [(i, float(i % 7)) for i in range(100)], "id long, s double")
        out = quantile_tiers(df, "s")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Window" not in plan
