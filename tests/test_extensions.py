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


class TestGraphLookup:
    @pytest.fixture(scope="class")
    def org(self, spark):
        # employee -> manager chain: a <- b <- c ; d isolated
        return spark.createDataFrame(
            [("a", None), ("b", "a"), ("c", "b"), ("d", None)],
            "name string, reports_to string",
        )

    def test_upward_chain(self, spark, org):
        eng = Engine({"org": org})
        out = eng.aggregate("org", [
            {"$graphLookup": {"from": "org", "startWith": "$reports_to",
                              "connectFromField": "reports_to",
                              "connectToField": "name",
                              "as": "chain", "depthField": "lvl"}},
            {"$sort": {"name": 1}},
        ]).collect()
        by = {r["name"]: r for r in out}
        assert [c["name"] for c in sorted(by["c"]["chain"], key=lambda x: x["lvl"])] == ["b", "a"]
        assert [(c["name"], c["lvl"]) for c in by["b"]["chain"]] == [("a", 0)]
        assert by["a"]["chain"] == [] and by["d"]["chain"] == []

    def test_max_depth(self, spark, org):
        eng = Engine({"org": org})
        out = eng.aggregate("org", [
            {"$graphLookup": {"from": "org", "startWith": "$reports_to",
                              "connectFromField": "reports_to",
                              "connectToField": "name",
                              "as": "chain", "maxDepth": 0}},
        ]).collect()
        by = {r["name"]: r for r in out}
        assert len(by["c"]["chain"]) == 1  # only the direct manager

    def test_restrict_search_with_match(self, spark, org):
        eng = Engine({"org": org})
        out = eng.aggregate("org", [
            {"$graphLookup": {"from": "org", "startWith": "$reports_to",
                              "connectFromField": "reports_to",
                              "connectToField": "name",
                              "restrictSearchWithMatch": {"name": {"$ne": "b"}},
                              "as": "chain"}},
            {"$sort": {"name": 1}},
        ]).collect()
        by = {r["name"]: r for r in out}
        # traversal from c stops because hop "b" is filtered out entirely
        assert by["c"]["chain"] == []
        assert [c["name"] for c in by["b"]["chain"]] == ["a"]

    def test_cycle_terminates(self, spark):
        cyc = spark.createDataFrame(
            [("x", "y"), ("y", "x")], "name string, next string")
        eng = Engine({"g": cyc})
        out = eng.aggregate("g", [
            {"$graphLookup": {"from": "g", "startWith": "$next",
                              "connectFromField": "next",
                              "connectToField": "name", "as": "reach"}},
            {"$sort": {"name": 1}},
        ]).collect()
        assert sorted(c["name"] for c in out[0]["reach"]) == ["x", "y"]


class TestOutMerge:
    def test_out_registers(self, spark):
        df = spark.createDataFrame([(1, "a")], "id long, v string")
        eng = Engine()
        eng.aggregate(df, [{"$out": "snapshot"}])
        assert [r.v for r in eng.collection("snapshot").collect()] == ["a"]

    def test_out_writes_path(self, spark, tmp_path):
        df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
        Engine().aggregate(df, [{"$out": {"path": str(tmp_path / "t"), "format": "parquet"}}])
        assert spark.read.parquet(str(tmp_path / "t")).count() == 2

    def test_merge_replace_insert(self, spark):
        eng = Engine()
        base = spark.createDataFrame([(1, "old"), (2, "keep")], "k long, v string")
        eng.register("t", base)
        upd = spark.createDataFrame([(1, "new"), (3, "ins")], "k long, v string")
        eng.aggregate(upd, [{"$merge": {"into": "t", "on": "k"}}])
        got = {r.k: r.v for r in eng.collection("t").collect()}
        assert got == {1: "new", 2: "keep", 3: "ins"}

    def test_merge_fieldwise(self, spark):
        eng = Engine()
        eng.register("t", spark.createDataFrame(
            [(1, "old", 10), (2, "keep", 20)], "k long, v string, w long"))
        upd = spark.createDataFrame(
            [(1, "new", None), (3, "ins", None)], "k long, v string, extra string")
        eng.aggregate(upd, [{"$merge": {"into": "t", "on": "k",
                                        "whenMatched": "merge"}}])
        got = {r.k: (r.v, r.w, r.extra) for r in eng.collection("t").collect()}
        # matched row 1: v overwritten, w kept (absent in source), extra added
        assert got == {1: ("new", 10, None), 2: ("keep", 20, None),
                       3: ("ins", None, None)}

    def test_merge_fieldwise_discard(self, spark):
        eng = Engine()
        eng.register("t", spark.createDataFrame([(1, "old")], "k long, v string"))
        upd = spark.createDataFrame([(1, "new"), (3, "ins")], "k long, v string")
        eng.aggregate(upd, [{"$merge": {"into": "t", "on": "k",
                                        "whenMatched": "merge",
                                        "whenNotMatched": "discard"}}])
        got = {r.k: r.v for r in eng.collection("t").collect()}
        assert got == {1: "new"}

    def test_merge_keep_existing_discard(self, spark):
        eng = Engine()
        eng.register("t", spark.createDataFrame([(1, "old")], "k long, v string"))
        upd = spark.createDataFrame([(1, "new"), (3, "ins")], "k long, v string")
        eng.aggregate(upd, [{"$merge": {"into": "t", "on": "k",
                                        "whenMatched": "keepExisting",
                                        "whenNotMatched": "discard"}}])
        got = {r.k: r.v for r in eng.collection("t").collect()}
        assert got == {1: "old"}

    def test_merge_fail_modes(self, spark):
        from aggo_spark.errors import InvalidPipeline

        eng = Engine()
        eng.register("t", spark.createDataFrame([(1, "old")], "k long, v string"))
        # whenMatched: fail — raises on a matching key
        with pytest.raises(InvalidPipeline, match="whenMatched:fail"):
            eng.aggregate(
                spark.createDataFrame([(1, "dup")], "k long, v string"),
                [{"$merge": {"into": "t", "on": "k", "whenMatched": "fail"}}])
        # no match -> clean append
        eng.aggregate(
            spark.createDataFrame([(3, "ins")], "k long, v string"),
            [{"$merge": {"into": "t", "on": "k", "whenMatched": "fail"}}])
        assert {r.k: r.v for r in eng.collection("t").collect()} == {1: "old", 3: "ins"}
        # whenNotMatched: fail — raises on an unmatched key
        with pytest.raises(InvalidPipeline, match="whenNotMatched:fail"):
            eng.aggregate(
                spark.createDataFrame([(9, "x")], "k long, v string"),
                [{"$merge": {"into": "t", "on": "k",
                             "whenNotMatched": "fail"}}])
        # all matched -> behaves as replace
        eng.aggregate(
            spark.createDataFrame([(1, "new")], "k long, v string"),
            [{"$merge": {"into": "t", "on": "k", "whenNotMatched": "fail"}}])
        assert {r.k: r.v for r in eng.collection("t").collect()} == {1: "new", 3: "ins"}


class TestSkewAndSources:
    def test_salted_group_agg_matches_plain(self, spark):
        from aggo_spark import load_tables
        from aggo_spark.operators.skew import salted_group_agg
        from pyspark.sql import functions as F

        li = load_tables(spark, "/root/testdata/sf0.001", ["lineitem"])["lineitem"]
        salted = {
            r["l_returnflag"]: r
            for r in salted_group_agg(
                li, ["l_returnflag"],
                {"s": ("sum", "l_quantity"), "n": ("count", "*"),
                 "lo": ("min", "l_quantity"), "hi": ("max", "l_quantity")},
            ).collect()
        }
        plain = {
            r["l_returnflag"]: r
            for r in li.groupBy("l_returnflag").agg(
                F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("n"),
                F.min("l_quantity").alias("lo"), F.max("l_quantity").alias("hi"),
            ).collect()
        }
        assert set(salted) == set(plain)
        for k in plain:
            for c in ("s", "n", "lo", "hi"):
                assert salted[k][c] == plain[k][c], (k, c)

    def test_read_csv_roundtrip(self, spark, tmp_path):
        from aggo_spark.sources.io import read_csv

        p = tmp_path / "c.csv"
        p.write_text("a,b\n1,x\n2,y\n")
        df = read_csv(spark, str(p))
        assert sorted((r.a, r.b) for r in df.collect()) == [(1, "x"), (2, "y")]

    def test_write_bucketed_elides_shuffle(self, spark, tmp_path):
        """Bucketed tables joined on the bucket key must not re-shuffle
        either side (no Exchange above the scans)."""
        from aggo_spark import load_tables
        from aggo_spark.sources.io import write_bucketed

        import uuid

        t = load_tables(spark, "/root/testdata/sf0.001", ["orders", "customer"])
        sfx = uuid.uuid4().hex[:8]
        bo, bc = f"b_orders_{sfx}", f"b_customer_{sfx}"
        write_bucketed(t["orders"], bo, ["o_custkey"], 8)
        write_bucketed(t["customer"], bc, ["c_custkey"], 8)
        # force a sort-merge join so the bucketing (not a broadcast) is
        # what elides the Exchange
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table(bo).join(
            spark.table(bc),
            spark.table(bo)["o_custkey"] == spark.table(bc)["c_custkey"],
        )
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, plan[:2000]
            assert joined.count() == t["orders"].count()
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.sql(f"DROP TABLE IF EXISTS {bo}")
            spark.sql(f"DROP TABLE IF EXISTS {bc}")


class TestMergeObjectsAndMixedSort:
    def test_merge_objects_accumulator_struct(self, spark):
        df = spark.createDataFrame(
            [(1, ("x", None)), (1, (None, "b")), (1, ("y", None)), (2, ("p", "q"))],
            "g long, doc struct<a string, b string>",
        )
        out = agg(df, [
            {"$group": {"_id": "$g", "m": {"$mergeObjects": "$doc"}}},
            {"$sort": {"_id": 1}},
        ])
        # field-wise last non-null (SQL-normative merge; COMPAT.md)
        assert out[0]["m"] == {"a": "y", "b": "b"}
        assert out[1]["m"] == {"a": "p", "b": "q"}

    def test_merge_objects_accumulator_expr_object(self, sales):
        out = agg(sales, [
            {"$sort": {"id": 1}},
            {"$group": {"_id": "$cat",
                        "m": {"$mergeObjects": {"last_id": "$id", "last_amt": "$amt"}}}},
            {"$sort": {"_id": 1}},
        ])
        assert out[0]["m"] == {"last_id": 4, "last_amt": 40.0}
        assert out[1]["m"] == {"last_id": 6, "last_amt": 15.0}

    def test_topn_mixed_directions(self, spark):
        df = spark.createDataFrame(
            [("a", 1, 10.0, 5), ("a", 2, 10.0, 1), ("a", 3, 20.0, 9), ("a", 4, 5.0, 2)],
            "cat string, id long, amt double, tie long",
        )
        out = agg(df, [
            {"$group": {"_id": "$cat", "top2": {"$topN": {
                "output": "$id", "sortBy": {"amt": -1, "tie": 1}, "n": 2}}}},
        ])
        # amt desc → 20.0 first; within amt=10.0 tie asc → id 2 before id 1
        assert out[0]["top2"] == [3, 2]

    def test_sort_array_by_fields(self, spark):
        df = spark.createDataFrame(
            [(1, [{"a": 1, "b": "x"}, {"a": 2, "b": "m"}, {"a": 1, "b": "m"}])],
            "id long, arr array<struct<a long, b string>>",
        )
        out = agg(df, [
            {"$project": {"_id": "$id", "s": {"$sortArray": {
                "input": "$arr", "sortBy": {"a": -1, "b": 1}}}}},
        ])
        assert [(e["a"], e["b"]) for e in out[0]["s"]] == [(2, "m"), (1, "m"), (1, "x")]


class TestRedact:
    @pytest.fixture(scope="class")
    def classified(self, spark):
        data = [
            (1, 1, "public", (1, "open"), [(1, "s1"), (5, "secret")]),
            (2, 5, "classified", (5, "hidden"), [(1, "s2")]),
            (3, 1, "mixed", (5, "restricted"), []),
        ]
        return spark.createDataFrame(
            data,
            "`_id` long, level long, title string, "
            "details struct<level long, note string>, "
            "sections array<struct<level long, name string>>")

    def test_descend_prunes_recursively(self, classified):
        out = agg(classified, [
            {"$redact": {"$cond": [{"$lte": ["$level", 2]}, "$$DESCEND", "$$PRUNE"]}},
            {"$sort": {"_id": 1}},
        ])
        assert [r["_id"] for r in out] == [1, 3]
        # high-level array element dropped; high-level subdoc nulled
        assert [s["name"] for s in out[0]["sections"]] == ["s1"]
        assert out[1]["details"] is None

    def test_keep_short_circuits(self, classified):
        out = agg(classified, [
            {"$redact": {"$cond": [{"$lte": ["$level", 2]}, "$$KEEP", "$$PRUNE"]}},
            {"$sort": {"_id": 1}},
        ])
        # $$KEEP keeps the whole subtree without re-evaluating children
        assert out[1]["details"] == {"level": 5, "note": "restricted"}


def test_sample_rate_match(spark):
    df = spark.range(5000).withColumnRenamed("id", "i")
    n = Engine().aggregate(df, [{"$match": {"$sampleRate": 0.3}}]).count()
    assert 1000 < n < 2000  # ~1500 expected
    assert Engine().aggregate(df, [{"$match": {"$sampleRate": 0.0}}]).count() == 0


class TestBucketAuto:
    def test_even_buckets(self, spark):
        df = spark.range(100).withColumnRenamed("id", "v")
        out = agg(df, [{"$bucketAuto": {"groupBy": "$v", "buckets": 4,
                                        "output": {"count": {"$sum": 1},
                                                   "avg": {"$avg": "$v"}}}}])
        assert len(out) == 4
        assert sum(r["count"] for r in out) == 100
        assert all(20 <= r["count"] <= 30 for r in out)  # ~even
        # buckets are ordered and contiguous over the value range
        assert out[0]["_id"]["min"] == 0 and out[-1]["_id"]["max"] == 99

    def test_skewed_data_fewer_buckets(self, spark):
        df = spark.createDataFrame([(1.0,)] * 50 + [(9.0,)], "v double")
        out = agg(df, [{"$bucketAuto": {"groupBy": "$v", "buckets": 3}}])
        assert len(out) <= 2 and sum(r["count"] for r in out) == 51

    def test_null_groupby_excluded(self, spark):
        df = spark.createDataFrame([(1.0,), (2.0,), (None,)], "v double")
        out = agg(df, [{"$bucketAuto": {"groupBy": "$v", "buckets": 1}}])
        assert sum(r["count"] for r in out) == 2


def test_documents_stage(spark):
    eng = Engine()
    df = spark.createDataFrame([(1,)], "x long")
    out = eng.aggregate(df, [
        {"$documents": [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]},
        {"$match": {"a": {"$gte": 2}}},
    ])
    assert [r.asDict() for r in out.collect()] == [{"a": 2, "b": "y"}]


class TestFillLinear:
    def test_linear_interpolation(self, spark):
        from aggo_spark import aggregate
        rows = [
            {"g": "a", "x": 0, "v": 10.0}, {"g": "a", "x": 1, "v": None},
            {"g": "a", "x": 3, "v": None}, {"g": "a", "x": 4, "v": 50.0},
            {"g": "a", "x": 5, "v": None},
            {"g": "b", "x": 0, "v": None}, {"g": "b", "x": 1, "v": 4.0},
        ]
        out = aggregate(rows, [
            {"$fill": {"partitionBy": "$g", "sortBy": {"x": 1},
                       "output": {"v": {"method": "linear"}}}},
            {"$sort": {"g": 1, "x": 1}},
            {"$project": {"_id": 0, "v": 1}},
        ], spark=spark).collect()
        # interpolation is proportional to the sort key (x=3 is 3/4 of the
        # way from 10 to 50); edge nulls stay null (MongoDB semantics)
        assert [r["v"] for r in out] == [10.0, 20.0, 40.0, 50.0, None, None, 4.0]

    def test_linear_requires_single_sort_field(self, spark):
        from aggo_spark import aggregate
        from aggo_spark.errors import InvalidPipeline
        with pytest.raises(InvalidPipeline):
            aggregate([{"g": 1, "v": 2.0}, {"g": 1, "v": None}], [
                {"$fill": {"partitionBy": "$g",
                           "output": {"v": {"method": "linear"}}}},
            ], spark=spark).collect()


def test_merge_fail_respects_discard(spark):
    # r4 review: whenMatched:fail + whenNotMatched:discard must DROP the
    # (all-unmatched) source docs, not append them
    from aggo_spark import Engine

    eng = Engine()
    eng.register("t", spark.createDataFrame([(1, "old")], "k long, v string"))
    eng.aggregate(
        spark.createDataFrame([(9, "x")], "k long, v string"),
        [{"$merge": {"into": "t", "on": "k", "whenMatched": "fail",
                     "whenNotMatched": "discard"}}])
    assert {r.k: r.v for r in eng.collection("t").collect()} == {1: "old"}
