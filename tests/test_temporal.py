"""As-of and interval joins (operators/temporal.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aggo_spark.operators.temporal import asof_join, interval_join


def _trades(spark):
    return spark.createDataFrame(
        [("A", 10, 100.0), ("A", 20, 101.0), ("A", 5, 99.0), ("B", 10, 50.0)],
        "sym string, ts long, px double",
    )


def _quotes(spark):
    return spark.createDataFrame(
        [("A", 8, 1.0), ("A", 10, 2.0), ("A", 15, 3.0), ("B", 99, 9.0)],
        "sym string, ts long, bid double",
    )


def test_asof_backward_inclusive(spark):
    out = asof_join(_trades(spark), _quotes(spark), on="ts", by="sym")
    got = {(r["sym"], r["ts"]): r["bid_r"] for r in out.collect()}
    assert got == {("A", 5): None, ("A", 10): 2.0, ("A", 20): 3.0, ("B", 10): None}


def test_asof_strict(spark):
    out = asof_join(_trades(spark), _quotes(spark), on="ts", by="sym", strict=True)
    got = {(r["sym"], r["ts"]): r["bid_r"] for r in out.collect()}
    # equal-ts quote no longer visible for the ts=10 trade
    assert got[("A", 10)] == 1.0
    assert got[("A", 20)] == 3.0


def test_asof_no_by_and_left_preserved(spark):
    left = spark.createDataFrame([(1,), (100,)], "ts long")
    right = spark.createDataFrame([(50, "x")], "ts long, tag string")
    out = asof_join(left, right, on="ts")
    got = {r["ts"]: r["tag_r"] for r in out.collect()}
    assert got == {1: None, 100: "x"}
    assert out.count() == 2  # every left row survives


def test_asof_one_shuffle_plan(spark):
    out = asof_join(_trades(spark), _quotes(spark), on="ts", by="sym")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union-merge: exactly one exchange (the window partitionBy), no joins
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_interval_join_bucketed_matches_plain(spark):
    pts = spark.createDataFrame(
        [(i, t) for i, t in enumerate([0, 3, 7, 12, 25, 26, 99, 100])],
        "pid long, ts long",
    )
    ivs = spark.createDataFrame(
        [(10, 5, 10), (20, 24, 30), (30, 90, 105), (40, 7, 7)],
        "iid long, start long, end long",
    )
    plain = {(r["pid"], r["iid"])
             for r in interval_join(pts, ivs).collect()}
    bucketed = {(r["pid"], r["iid"])
                for r in interval_join(pts, ivs, bucket_width=4).collect()}
    assert plain == bucketed
    assert (2, 10) in plain and (2, 40) in plain and (6, 30) in plain


def test_interval_join_by_key(spark):
    pts = spark.createDataFrame([("u1", 5), ("u2", 5)], "u string, ts long")
    ivs = spark.createDataFrame([("u1", 0, 10, 7)], "u string, start long, end long, iid long")
    out = interval_join(pts, ivs, by="u", bucket_width=8).collect()
    assert [(r["u"], r["iid"]) for r in out] == [("u1", 7)]
