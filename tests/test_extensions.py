"""Extension coverage: N-accumulators, percentiles, $fill, $densify."""

from __future__ import annotations

import datetime as dt

import pytest

from aggo_spark import Engine


@pytest.fixture(scope="module")
def sales(spark):
    return spark.createDataFrame(
        [
            ("a", 1, 10.0), ("a", 2, 30.0), ("a", 3, 20.0), ("a", 4, 40.0),
            ("b", 5, 5.0), ("b", 6, 15.0),
        ],
        "cat string, id long, amt double",
    )


def agg(df, pipe):
    return [r.asDict(recursive=True) for r in Engine().aggregate(df, pipe).collect()]


class TestNAccumulators:
    def test_top_bottom_n(self, sales):
        out = agg(sales, [
            {"$group": {"_id": "$cat",
                        "top2": {"$topN": {"output": "$id", "sortBy": {"amt": -1}, "n": 2}},
                        "bot2": {"$bottomN": {"output": "$id", "sortBy": {"amt": -1}, "n": 2}},
                        "best": {"$top": {"output": "$id", "sortBy": {"amt": -1}}}}},
            {"$sort": {"_id": 1}},
        ])
        a = next(r for r in out if r["_id"] == "a")
        assert a["top2"] == [4, 2] and a["bot2"] == [3, 1] and a["best"] == 4

    def test_min_max_first_last_n(self, sales):
        out = agg(sales, [
            {"$sort": {"id": 1}},
            {"$group": {"_id": "$cat",
                        "min2": {"$minN": {"input": "$amt", "n": 2}},
                        "max2": {"$maxN": {"input": "$amt", "n": 2}}}},
            {"$sort": {"_id": 1}},
        ])
        a = next(r for r in out if r["_id"] == "a")
        assert a["min2"] == [10.0, 20.0] and a["max2"] == [40.0, 30.0]

    def test_percentile_median(self, sales):
        out = agg(sales, [
            {"$group": {"_id": None,
                        "med": {"$median": {"input": "$amt", "method": "exact"}},
                        "pcts": {"$percentile": {"input": "$amt", "p": [0.0, 1.0],
                                                  "method": "exact"}}}},
        ])
        assert out[0]["pcts"] == [5.0, 40.0]
        assert out[0]["med"] == pytest.approx(17.5)


class TestFill:
    def test_locf_and_value(self, spark):
        df = spark.createDataFrame(
            [("a", 1, None), ("a", 2, 5.0), ("a", 3, None), ("a", 4, None),
             ("b", 1, None)],
            "p string, t long, v double",
        )
        out = agg(df, [
            {"$fill": {"partitionBy": "$p", "sortBy": {"t": 1},
                       "output": {"v": {"method": "locf"}}}},
            {"$fill": {"output": {"v": {"value": -1.0}}}},
            {"$sort": {"p": 1, "t": 1}},
        ])
        assert [r["v"] for r in out] == [-1.0, 5.0, 5.0, 5.0, -1.0]


class TestDensify:
    def test_numeric_partition_bounds(self, spark):
        df = spark.createDataFrame(
            [("a", 1, 1.0), ("a", 4, 2.0), ("b", 10, 3.0)],
            "p string, t long, v double",
        )
        out = agg(df, [
            {"$densify": {"field": "t", "partitionByFields": ["p"],
                          "range": {"step": 1, "bounds": "partition"}}},
            {"$sort": {"p": 1, "t": 1}},
        ])
        assert [(r["p"], r["t"], r["v"]) for r in out] == [
            ("a", 1, 1.0), ("a", 2, None), ("a", 3, None), ("a", 4, 2.0),
            ("b", 10, 3.0),
        ]

    def test_timestamp_full_bounds(self, spark):
        base = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(base, 1.0), (base + dt.timedelta(hours=3), 2.0)],
            "ts timestamp, v double",
        )
        out = agg(df, [
            {"$densify": {"field": "ts", "range": {"step": 1, "unit": "hour",
                                                    "bounds": "full"}}},
            {"$sort": {"ts": 1}},
        ])
        assert len(out) == 4
        assert [r["v"] for r in out] == [1.0, None, None, 2.0]

    def test_densify_then_fill(self, spark):
        """The canonical time-series recipe: densify gaps then locf-fill."""
        df = spark.createDataFrame(
            [(1, 10.0), (4, 40.0)], "t long, v double")
        out = agg(df, [
            {"$densify": {"field": "t", "range": {"step": 1, "bounds": "full"}}},
            {"$fill": {"sortBy": {"t": 1}, "output": {"v": {"method": "locf"}}}},
            {"$sort": {"t": 1}},
        ])
        assert [(r["t"], r["v"]) for r in out] == [
            (1, 10.0), (2, 10.0), (3, 10.0), (4, 40.0)]
