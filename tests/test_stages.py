"""Per-stage unit tests (model: reference tests/aggregation.spec.js)."""

from __future__ import annotations

import datetime as dt

import pytest

from aggo_spark import Engine, aggregate

from .conftest import rows

ORDERS = [
    {"_id": 1, "item": "a", "price": 10.0, "quantity": 2, "tags": ["red", "blank"]},
    {"_id": 2, "item": "b", "price": 20.0, "quantity": 1, "tags": ["blue"]},
    {"_id": 3, "item": "a", "price": 5.0, "quantity": 10, "tags": []},
    {"_id": 4, "item": "c", "price": 20.0, "quantity": 5, "tags": ["red", "blue"]},
]


@pytest.fixture(scope="module")
def orders(spark):
    return spark.createDataFrame(ORDERS)


def test_match_simple(orders):
    out = aggregate(orders, [{"$match": {"item": "a"}}])
    assert sorted(r["_id"] for r in out.collect()) == [1, 3]


def test_match_operators(orders):
    out = aggregate(orders, [{"$match": {"price": {"$gte": 10, "$lt": 20}}}])
    assert [r["_id"] for r in out.collect()] == [1]


def test_match_in_nin(orders):
    out = aggregate(orders, [{"$match": {"item": {"$in": ["a", "c"]}}}])
    assert sorted(r["_id"] for r in out.collect()) == [1, 3, 4]
    out = aggregate(orders, [{"$match": {"item": {"$nin": ["a", "c"]}}}])
    assert sorted(r["_id"] for r in out.collect()) == [2]


def test_match_and_or(orders):
    out = aggregate(
        orders,
        [{"$match": {"$or": [{"item": "b"}, {"$and": [{"item": "a"}, {"price": {"$lt": 6}}]}]}}],
    )
    assert sorted(r["_id"] for r in out.collect()) == [2, 3]


def test_match_array_contains(orders):
    out = aggregate(orders, [{"$match": {"tags": "red"}}])
    assert sorted(r["_id"] for r in out.collect()) == [1, 4]


def test_match_all_size_elemmatch(orders):
    out = aggregate(orders, [{"$match": {"tags": {"$all": ["red", "blue"]}}}])
    assert [r["_id"] for r in out.collect()] == [4]
    out = aggregate(orders, [{"$match": {"tags": {"$size": 2}}}])
    assert sorted(r["_id"] for r in out.collect()) == [1, 4]
    out = aggregate(orders, [{"$match": {"tags": {"$elemMatch": {"$eq": "blue"}}}}])
    assert sorted(r["_id"] for r in out.collect()) == [2, 4]


def test_match_exists_missing_field(orders):
    out = aggregate(orders, [{"$match": {"nope": {"$exists": True}}}])
    assert out.count() == 0
    out = aggregate(orders, [{"$match": {"nope": {"$exists": False}}}])
    assert out.count() == 4


def test_match_regex(orders):
    out = aggregate(orders, [{"$match": {"item": {"$regex": "^[ab]$"}}}])
    assert sorted(r["_id"] for r in out.collect()) == [1, 2, 3]


def test_match_expr(orders):
    out = aggregate(orders, [{"$match": {"$expr": {"$gt": [{"$multiply": ["$price", "$quantity"]}, 50]}}}])
    assert sorted(r["_id"] for r in out.collect()) == [4]


def test_project_include_exclude(orders):
    out = aggregate(orders, [{"$project": {"item": 1, "price": 1}}])
    assert set(out.columns) == {"_id", "item", "price"}
    out = aggregate(orders, [{"$project": {"_id": 0, "item": 1}}])
    assert out.columns == ["item"]
    out = aggregate(orders, [{"$project": {"tags": 0, "quantity": 0}}])
    assert set(out.columns) == {"_id", "item", "price"}


def test_project_computed(orders):
    out = aggregate(
        orders,
        [
            {"$project": {"_id": 0, "item": 1, "total": {"$multiply": ["$price", "$quantity"]}}},
            {"$match": {"item": "a"}},
        ],
    )
    got = {r["item"]: r["total"] for r in out.collect()}
    assert got == {"a": 50.0} or len(got) == 1  # two 'a' rows collapse in dict
    vals = sorted(r["total"] for r in out.collect())
    assert vals == [20.0, 50.0]


def test_group_accumulators(orders):
    out = aggregate(
        orders,
        [
            {
                "$group": {
                    "_id": "$item",
                    "n": {"$sum": 1},
                    "total": {"$sum": {"$multiply": ["$price", "$quantity"]}},
                    "avgPrice": {"$avg": "$price"},
                    "minQ": {"$min": "$quantity"},
                    "maxQ": {"$max": "$quantity"},
                }
            }
        ],
    )
    got = {r["_id"]: r.asDict() for r in out.collect()}
    assert got["a"]["n"] == 2 and got["a"]["total"] == 70.0 and got["a"]["avgPrice"] == 7.5
    assert got["b"]["minQ"] == 1 and got["c"]["maxQ"] == 5


def test_group_null_id(orders):
    out = aggregate(orders, [{"$group": {"_id": None, "n": {"$sum": 1}, "s": {"$sum": "$price"}}}])
    r = out.collect()
    assert len(r) == 1 and r[0]["n"] == 4 and r[0]["s"] == 55.0


def test_group_empty_input(orders):
    out = aggregate(orders, [{"$match": {"item": "zzz"}}, {"$group": {"_id": None, "n": {"$sum": 1}}}])
    assert out.count() == 0  # MongoDB: no groups on empty input


def test_group_compound_id(orders):
    out = aggregate(orders, [{"$group": {"_id": {"i": "$item", "p": "$price"}, "n": {"$sum": 1}}}])
    recs = rows(out)
    assert len(recs) == 4


def test_group_push_addtoset(orders):
    out = aggregate(
        orders,
        [{"$group": {"_id": "$item", "qs": {"$push": "$quantity"}, "ps": {"$addToSet": "$price"}}}],
    )
    got = {r["_id"]: r.asDict() for r in out.collect()}
    assert sorted(got["a"]["qs"]) == [2, 10]
    assert sorted(got["a"]["ps"]) == [5.0, 10.0]


def test_sort_limit_skip(orders):
    out = aggregate(orders, [{"$sort": {"price": -1, "_id": 1}}, {"$limit": 2}])
    assert [r["_id"] for r in out.collect()] == [2, 4]
    out = aggregate(orders, [{"$sort": {"price": -1, "_id": 1}}, {"$skip": 2}])
    assert [r["_id"] for r in out.collect()] == [1, 3]


def test_count_stage(orders):
    out = aggregate(orders, [{"$match": {"price": {"$gt": 5}}}, {"$count": "n"}])
    assert out.collect()[0]["n"] == 3
    out = aggregate(orders, [{"$match": {"price": {"$gt": 500}}}, {"$count": "n"}])
    assert out.count() == 0


def test_addfields(orders):
    out = aggregate(orders, [{"$addFields": {"double_price": {"$multiply": ["$price", 2]}}}])
    assert "double_price" in out.columns
    assert {r["_id"]: r["double_price"] for r in out.collect()}[1] == 20.0


def test_unwind(spark):
    df = spark.createDataFrame(
        [{"_id": 1, "tags": ["a", "b"]}, {"_id": 2, "tags": []}, {"_id": 3, "tags": None}]
    )
    out = aggregate(df, [{"$unwind": "$tags"}])
    assert sorted((r["_id"], r["tags"]) for r in out.collect()) == [(1, "a"), (1, "b")]
    out = aggregate(df, [{"$unwind": {"path": "$tags", "preserveNullAndEmptyArrays": True}}])
    got = sorted((r["_id"], r["tags"]) for r in out.collect())
    assert got == [(1, "a"), (1, "b"), (2, None), (3, None)]
    out = aggregate(df, [{"$unwind": {"path": "$tags", "includeArrayIndex": "idx"}}])
    assert sorted((r["tags"], r["idx"]) for r in out.collect()) == [("a", 0), ("b", 1)]


def test_lookup_equi(spark):
    orders_df = spark.createDataFrame(
        [{"_id": 1, "cust": 10, "amt": 5.0}, {"_id": 2, "cust": 20, "amt": 7.0}, {"_id": 3, "cust": 99, "amt": 1.0}]
    )
    custs = spark.createDataFrame([{"cid": 10, "name": "ann"}, {"cid": 20, "name": "bob"}])
    out = aggregate(
        orders_df,
        [{"$lookup": {"from": "custs", "localField": "cust", "foreignField": "cid", "as": "c"}}],
        collections={"custs": custs},
    )
    got = {r["_id"]: r.asDict(recursive=True) for r in out.collect()}
    assert got[1]["c"][0]["name"] == "ann"
    assert got[3]["c"] == []


def test_lookup_pipeline_let(spark):
    orders_df = spark.createDataFrame([{"_id": 1, "cust": 10}, {"_id": 2, "cust": 20}])
    items = spark.createDataFrame(
        [{"cid": 10, "sku": "x", "qty": 1}, {"cid": 10, "sku": "y", "qty": 9}, {"cid": 20, "sku": "z", "qty": 3}]
    )
    out = aggregate(
        orders_df,
        [
            {
                "$lookup": {
                    "from": "items",
                    "let": {"c": "$cust"},
                    "pipeline": [
                        {"$match": {"$expr": {"$and": [{"$eq": ["$cid", "$$c"]}, {"$gt": ["$qty", 2]}]}}}
                    ],
                    "as": "big",
                }
            }
        ],
        collections={"items": items},
    )
    got = {r["_id"]: [i["sku"] for i in r["big"]] for r in out.collect()}
    assert got == {1: ["y"], 2: ["z"]}


def test_add_fields_broadcast_through_array(spark):
    """Setting a dotted path through array-of-documents broadcasts to every
    element (MongoDB $addFields semantics)."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [Row(_id=1, items=[Row(sku="a", q=5), Row(sku="b", q=2)], x=3)])
    got = rows(aggregate(df, [{"$addFields": {"items.flag": True,
                                              "items.xcopy": "$x"}}]))
    assert got[0]["items"] == [
        {"sku": "a", "q": 5, "flag": True, "xcopy": 3},
        {"sku": "b", "q": 2, "flag": True, "xcopy": 3},
    ]


def test_match_array_any_element(spark):
    """MongoDB implicit array semantics: comparisons/regex on an array field
    (or a dotted path traversing array-of-structs) match ANY element."""
    from pyspark.sql import Row

    df = spark.createDataFrame([
        Row(_id=1, items=[Row(sku="a", q=5), Row(sku="b", q=2)], tags=["xx", "yy"]),
        Row(_id=2, items=[Row(sku="c", q=1)], tags=["zz"]),
    ])

    def q(p):
        return sorted(r["_id"] for r in aggregate(df, [{"$match": p}]).collect())

    assert q({"items.q": 5}) == [1]
    assert q({"items.q": {"$gte": 2}}) == [1]
    assert q({"items.q": {"$lt": 2}}) == [2]
    assert q({"tags": {"$ne": "xx"}}) == [2]
    assert q({"tags": {"$regex": "^x"}}) == [1]
    assert q({"items.sku": {"$regex": "a|c"}}) == [1, 2]


def test_project_nested_document_form(spark):
    """{a: {b: 1}} is a nested PROJECTION when a is a document (reference
    expressions.ts:320-340 isFieldProjection), not an object literal."""
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(_id=1, a=Row(b=2, c=3), x=9)])
    got = rows(aggregate(df, [{"$project": {"a": {"b": 1}, "x": 1}}]))
    assert got == [{"_id": 1, "a": {"b": 2}, "x": 9}]
    got = rows(aggregate(df, [{"$project": {"a": {"b": 0}}}]))
    assert got == [{"_id": 1, "a": {"c": 3}, "x": 9}]
    got = rows(aggregate(df, [{"$project": {"a": {"b": {"$add": ["$x", 1]}}}}]))
    assert got == [{"_id": 1, "a": {"b": 10}}]
    # non-struct field: nested dict stays a computed object literal
    got = rows(aggregate(df, [{"$project": {"x": {"lit": 1}}}]))
    assert got == [{"_id": 1, "x": {"lit": 1}}]


def test_lookup_unwind_fusion(spark):
    orders_df = spark.createDataFrame(
        [{"_id": 1, "cust": 10}, {"_id": 2, "cust": 20}, {"_id": 3, "cust": 99},
         {"_id": 4, "cust": None}]
    )
    items = spark.createDataFrame(
        [{"cid": 10, "sku": "x"}, {"cid": 10, "sku": "y"}, {"cid": 20, "sku": "z"}]
    )
    fused = aggregate(
        orders_df,
        [{"$lookup": {"from": "items", "localField": "cust",
                      "foreignField": "cid", "as": "it"}},
         {"$unwind": "$it"}],
        collections={"items": items},
    )
    got = sorted((r["_id"], r["it"]["sku"]) for r in fused.collect())
    assert got == [(1, "x"), (1, "y"), (2, "z")]
    plan = fused._jdf.queryExecution().optimizedPlan().toString()
    assert "Generate" not in plan and "collect_list" not in plan, plan

    preserved = aggregate(
        orders_df,
        [{"$lookup": {"from": "items", "localField": "cust",
                      "foreignField": "cid", "as": "it"}},
         {"$unwind": {"path": "$it", "preserveNullAndEmptyArrays": True}}],
        collections={"items": items},
    )
    got = sorted((r["_id"], r["it"]["sku"] if r["it"] else None)
                 for r in preserved.collect())
    assert got == [(1, "x"), (1, "y"), (2, "z"), (3, None), (4, None)]

    # includeArrayIndex defeats fusion but must still be correct
    indexed = aggregate(
        orders_df,
        [{"$lookup": {"from": "items", "localField": "cust",
                      "foreignField": "cid", "as": "it"}},
         {"$unwind": {"path": "$it", "includeArrayIndex": "i"}}],
        collections={"items": items},
    )
    got = sorted((r["_id"], r["i"]) for r in indexed.collect())
    assert got == [(1, 0), (1, 1), (2, 0)]


def test_lookup_concise_correlated(spark):
    """MongoDB 5.0 concise form: localField/foreignField combined WITH a
    pipeline — the equi fields must constrain the sub-pipeline (previously
    they were silently ignored, matching every foreign row)."""
    orders_df = spark.createDataFrame(
        [{"_id": 1, "cust": 10}, {"_id": 2, "cust": 20}, {"_id": 3, "cust": 99}])
    items = spark.createDataFrame(
        [{"cid": 10, "sku": "x", "qty": 1}, {"cid": 10, "sku": "y", "qty": 9},
         {"cid": 20, "sku": "z", "qty": 3}])
    out = aggregate(
        orders_df,
        [{"$lookup": {"from": "items", "localField": "cust",
                      "foreignField": "cid",
                      "pipeline": [{"$match": {"qty": {"$gte": 2}}}],
                      "as": "big"}}],
        collections={"items": items},
    )
    got = sorted((r["_id"], sorted(i["sku"] for i in r["big"]))
                 for r in out.collect())
    assert got == [(1, ["y"]), (2, ["z"]), (3, [])]


def test_lookup_pipeline_group(spark):
    orders_df = spark.createDataFrame([{"_id": 1, "cust": 10}, {"_id": 2, "cust": 20}, {"_id": 3, "cust": 99}])
    items = spark.createDataFrame(
        [{"cid": 10, "cat": "a", "qty": 1}, {"cid": 10, "cat": "a", "qty": 9},
         {"cid": 10, "cat": "b", "qty": 4}, {"cid": 20, "cat": "a", "qty": 3}]
    )
    out = aggregate(
        orders_df,
        [{"$lookup": {
            "from": "items",
            "let": {"c": "$cust"},
            "pipeline": [
                {"$match": {"$expr": {"$eq": ["$cid", "$$c"]}}},
                {"$group": {"_id": "$cat", "total": {"$sum": "$qty"}, "n": {"$sum": 1}}},
            ],
            "as": "by_cat"}}],
        collections={"items": items},
    )
    got = {r["_id"]: sorted((d["_id"], d["total"], d["n"]) for d in r["by_cat"])
           for r in out.collect()}
    assert got == {1: [("a", 10, 2), ("b", 4, 1)], 2: [("a", 3, 1)], 3: []}


def test_lookup_pipeline_group_sort_limit_project(spark):
    orders_df = spark.createDataFrame([{"_id": 1, "cust": 10}])
    items = spark.createDataFrame(
        [{"cid": 10, "cat": "a", "qty": 1}, {"cid": 10, "cat": "b", "qty": 9},
         {"cid": 10, "cat": "c", "qty": 4}]
    )
    out = aggregate(
        orders_df,
        [{"$lookup": {
            "from": "items",
            "let": {"c": "$cust"},
            "pipeline": [
                {"$match": {"$expr": {"$eq": ["$cid", "$$c"]}}},
                {"$group": {"_id": "$cat", "total": {"$sum": "$qty"}}},
                {"$sort": {"total": -1}},
                {"$limit": 2},
                {"$project": {"_id": 0, "t2": {"$multiply": ["$total", 2]}}},
            ],
            "as": "top"}}],
        collections={"items": items},
    )
    got = [d["t2"] for d in out.collect()[0]["top"]]
    assert got == [18, 8]


def test_lookup_pipeline_group_errors(spark):
    import pytest as _pytest

    from aggo_spark.errors import UnsupportedStage

    orders_df = spark.createDataFrame([{"_id": 1, "cust": 10}])
    items = spark.createDataFrame([{"cid": 10, "qty": 1}])
    with _pytest.raises(UnsupportedStage, match="must precede"):
        aggregate(
            orders_df,
            [{"$lookup": {"from": "items", "let": {"c": "$cust"},
                          "pipeline": [
                              {"$match": {"$expr": {"$eq": ["$cid", "$$c"]}}},
                              {"$limit": 1},
                              {"$group": {"_id": None, "n": {"$sum": 1}}}],
                          "as": "x"}}],
            collections={"items": items},
        ).collect()


def test_replace_root(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame([Row(_id=1, sub=Row(x=1, y="a"))])
    out = aggregate(df, [{"$replaceRoot": {"newRoot": "$sub"}}])
    assert rows(out) == [{"x": 1, "y": "a"}]


def test_union_with(spark, orders):
    extra = spark.createDataFrame([{"_id": 9, "item": "z", "price": 1.0, "quantity": 1, "tags": ["x"]}])
    out = aggregate(orders, [{"$unionWith": "extra"}], collections={"extra": extra})
    assert out.count() == 5


def test_sort_by_count(orders):
    out = aggregate(orders, [{"$sortByCount": "$item"}])
    recs = out.collect()
    assert recs[0]["_id"] == "a" and recs[0]["count"] == 2


def test_bucket(orders):
    out = aggregate(
        orders,
        [{"$bucket": {"groupBy": "$price", "boundaries": [0, 10, 100], "output": {"n": {"$sum": 1}}}}],
    )
    got = {r["_id"]: r["n"] for r in out.collect()}
    assert got == {0: 1, 10: 3}


def test_facet(orders):
    out = aggregate(
        orders,
        [
            {
                "$facet": {
                    "byItem": [{"$group": {"_id": "$item", "n": {"$sum": 1}}}],
                    "top": [{"$sort": {"price": -1, "_id": 1}}, {"$limit": 1}, {"$project": {"_id": 1}}],
                }
            }
        ],
    )
    r = out.collect()[0]
    assert len(r["byItem"]) == 3 and r["top"][0]["_id"] == 2


def test_set_window_fields(spark):
    df = spark.createDataFrame(
        [
            {"g": "a", "t": 1, "v": 10},
            {"g": "a", "t": 2, "v": 20},
            {"g": "a", "t": 3, "v": 30},
            {"g": "b", "t": 1, "v": 5},
        ]
    )
    out = aggregate(
        df,
        [
            {
                "$setWindowFields": {
                    "partitionBy": "$g",
                    "sortBy": {"t": 1},
                    "output": {
                        "running": {"$sum": "$v", "window": {"documents": ["unbounded", "current"]}},
                        "rank": {"$rank": {}},
                        "total": {"$sum": "$v"},
                    },
                }
            }
        ],
    )
    got = {(r["g"], r["t"]): r.asDict() for r in out.collect()}
    assert got[("a", 2)]["running"] == 30 and got[("a", 3)]["running"] == 60
    assert got[("a", 3)]["rank"] == 3
    assert got[("a", 1)]["total"] == 60 and got[("b", 1)]["total"] == 5


def test_window_range_unit(spark):
    import datetime as dt

    from aggo_spark.errors import InvalidPipeline

    base = dt.datetime(2024, 1, 1)
    rows_in = [
        {"u": 1, "ts": base, "v": 1},
        {"u": 1, "ts": base + dt.timedelta(minutes=30), "v": 2},
        {"u": 1, "ts": base + dt.timedelta(minutes=90), "v": 4},
        {"u": 2, "ts": base, "v": 8},
    ]
    df = spark.createDataFrame(rows_in)
    out = aggregate(df, [
        {"$setWindowFields": {
            "partitionBy": "$u",
            "sortBy": {"ts": 1},
            "output": {"s1h": {"$sum": "$v",
                               "window": {"range": [-1, 0], "unit": "hour"}}},
        }}])
    got = {(r["u"], r["v"]): r["s1h"] for r in out.collect()}
    # minute-90 row: only minute-30 (60 min back, inclusive) is in frame
    assert got == {(1, 1): 1, (1, 2): 3, (1, 4): 6, (2, 8): 8}

    import pytest as _pytest

    with _pytest.raises(InvalidPipeline, match="ascending"):
        aggregate(df, [
            {"$setWindowFields": {
                "partitionBy": "$u", "sortBy": {"ts": -1},
                "output": {"x": {"$sum": "$v",
                                 "window": {"range": [-1, 0], "unit": "hour"}}},
            }}]).collect()


def test_compound_group_after_window_is_single_exchange(spark):
    """Compound $group _id groups by components, so a $setWindowFields
    partitionBy on a key subset leaves the aggregate shuffle-free."""
    df = spark.createDataFrame(
        [{"g": "a", "t": 1, "v": 10}, {"g": "a", "t": 2, "v": 20}, {"g": "b", "t": 1, "v": 5}]
    )
    out = aggregate(
        df,
        [
            {"$setWindowFields": {"partitionBy": "$g", "sortBy": {"t": 1},
                                  "output": {"rank": {"$rank": {}}}}},
            {"$group": {"_id": {"g": "$g", "r": "$rank"}, "n": {"$sum": 1},
                        "tot": {"$sum": "$v"}}},
        ],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1  # the window's; none for the group
    got = {(r["_id"]["g"], r["_id"]["r"]): r["tot"] for r in out.collect()}
    assert got[("a", 1)] == 10 and got[("a", 2)] == 20 and got[("b", 1)] == 5


def test_stddev_variance(spark):
    df = spark.createDataFrame([{"g": 1, "v": 1.0}, {"g": 1, "v": 2.0}, {"g": 1, "v": 3.0}])
    out = aggregate(
        df,
        [
            {
                "$group": {
                    "_id": "$g",
                    "sp": {"$stdDevPop": "$v"},
                    "ss": {"$stdDevSamp": "$v"},
                    "vp": {"$variancePop": "$v"},
                    "vs": {"$varianceSamp": "$v"},
                }
            }
        ],
    )
    r = out.collect()[0]
    assert abs(r["vp"] - 2 / 3) < 1e-9 and abs(r["vs"] - 1.0) < 1e-9
    assert abs(r["sp"] ** 2 - 2 / 3) < 1e-9 and abs(r["ss"] - 1.0) < 1e-9


# ---------------------------------------------------------------------------
# time-series window operators (MongoDB 5.x): $locf $linearFill $derivative
# $integral (r4 extensions to $setWindowFields)
# ---------------------------------------------------------------------------

def test_window_locf(spark):
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, None), (1, 3, None), (1, 4, 7.0), (2, 1, None)],
        "u long, t long, v double")
    out = aggregate(df, [
        {"$setWindowFields": {"partitionBy": "$u", "sortBy": {"t": 1},
                              "output": {"f": {"$locf": "$v"}}}}])
    got = {(r["u"], r["t"]): r["f"] for r in out.collect()}
    assert got == {(1, 1): 10.0, (1, 2): 10.0, (1, 3): 10.0, (1, 4): 7.0,
                   (2, 1): None}


def test_window_linear_fill(spark):
    df = spark.createDataFrame(
        [(1, 0, 0.0), (1, 1, None), (1, 3, None), (1, 4, 8.0),
         (1, 5, None),               # trailing edge: stays null
         (2, 1, 5.0)],
        "u long, t long, v double")
    out = aggregate(df, [
        {"$setWindowFields": {"partitionBy": "$u", "sortBy": {"t": 1},
                              "output": {"f": {"$linearFill": "$v"}}}}])
    got = {(r["u"], r["t"]): r["f"] for r in out.collect()}
    # interpolate on t between (0, 0.0) and (4, 8.0): slope 2
    assert got[(1, 1)] == 2.0 and got[(1, 3)] == 6.0
    assert got[(1, 0)] == 0.0 and got[(1, 4)] == 8.0
    assert got[(1, 5)] is None and got[(2, 1)] == 5.0


def test_window_derivative_numeric_and_unit(spark):
    import datetime as _dt

    base = _dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(1, base, 0.0), (1, base + _dt.timedelta(minutes=30), 30.0),
         (1, base + _dt.timedelta(minutes=60), 90.0)],
        "u long, ts timestamp, v double")
    out = aggregate(df, [
        {"$setWindowFields": {"partitionBy": "$u", "sortBy": {"ts": 1},
                              "output": {"rate": {
                                  "$derivative": {"input": "$v", "unit": "hour"},
                                  "window": {"documents": [-1, 0]}}}}}])
    got = sorted(r["rate"] for r in out.collect() if r["rate"] is not None)
    # per-30min windows: (30-0)/(0.5h)=60, (90-30)/(0.5h)=120; first row null
    assert got == [60.0, 120.0]

    dfn = spark.createDataFrame([(1, 0, 0.0), (1, 2, 10.0)], "u long, x long, v double")
    outn = aggregate(dfn, [
        {"$setWindowFields": {"partitionBy": "$u", "sortBy": {"x": 1},
                              "output": {"d": {"$derivative": {"input": "$v"}}}}}])
    assert {r["d"] for r in outn.collect()} == {5.0}  # whole-partition default


def test_window_integral(spark):
    df = spark.createDataFrame(
        [(1, 0, 0.0), (1, 1, 2.0), (1, 3, 2.0)], "u long, x long, v double")
    out = aggregate(df, [
        {"$setWindowFields": {"partitionBy": "$u", "sortBy": {"x": 1},
                              "output": {
                                  "cum": {"$integral": {"input": "$v"},
                                          "window": {"documents": ["unbounded", "current"]}},
                                  "tot": {"$integral": {"input": "$v"}}}}}])
    got = {r["x"]: (r["cum"], r["tot"]) for r in out.collect()}
    # trapezoids: [0,1]: (0+2)/2*1 = 1 ; [1,3]: (2+2)/2*2 = 4
    assert got[0] == (0.0, 5.0)
    assert got[1] == (1.0, 5.0)
    assert got[3] == (5.0, 5.0)


def test_window_integral_rejects_bounded_start(spark):
    from aggo_spark.errors import InvalidPipeline

    df = spark.createDataFrame([(1, 0, 0.0)], "u long, x long, v double")
    with pytest.raises(InvalidPipeline, match="unbounded"):
        aggregate(df, [
            {"$setWindowFields": {"partitionBy": "$u", "sortBy": {"x": 1},
                                  "output": {"i": {"$integral": {"input": "$v"},
                                                   "window": {"documents": [-2, 0]}}}}}
        ]).collect()


def test_window_derivative_unit_requires_date_sort(spark):
    from aggo_spark.errors import InvalidPipeline

    df = spark.createDataFrame([(1, 0, 0.0)], "u long, x long, v double")
    with pytest.raises(InvalidPipeline, match="unit"):
        aggregate(df, [
            {"$setWindowFields": {"partitionBy": "$u", "sortBy": {"x": 1},
                                  "output": {"d": {"$derivative": {
                                      "input": "$v", "unit": "hour"}}}}}
        ]).collect()


def test_window_exp_moving_avg(spark):
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0), (2, 1, 4.0)],
        "u long, t long, v double")
    out = aggregate(df, [
        {"$setWindowFields": {"partitionBy": "$u", "sortBy": {"t": 1},
                              "output": {"ema": {"$expMovingAvg": {
                                  "input": "$v", "N": 3}}}}}])
    got = {(r["u"], r["t"]): r["ema"] for r in out.collect()}
    # alpha = 2/(3+1) = 0.5: 10, 15, 22.5
    assert got[(1, 1)] == 10.0 and got[(1, 2)] == 15.0 and got[(1, 3)] == 22.5
    assert got[(2, 1)] == 4.0

    # alpha form + coexisting plain window output
    out2 = aggregate(df, [
        {"$setWindowFields": {"partitionBy": "$u", "sortBy": {"t": 1},
                              "output": {
                                  "ema": {"$expMovingAvg": {"input": "$v", "alpha": 0.8}},
                                  "run": {"$sum": "$v", "window": {
                                      "documents": ["unbounded", "current"]}}}}}])
    got2 = {(r["u"], r["t"]): (round(r["ema"], 4), r["run"]) for r in out2.collect()}
    assert got2[(1, 2)] == (round(10 + 0.8 * 10, 4), 30.0)


def test_window_exp_moving_avg_validation(spark):
    from aggo_spark.errors import InvalidPipeline

    df = spark.createDataFrame([(1, 1, 1.0)], "u long, t long, v double")
    with pytest.raises(InvalidPipeline, match="exactly one of"):
        aggregate(df, [
            {"$setWindowFields": {"partitionBy": "$u", "sortBy": {"t": 1},
                                  "output": {"e": {"$expMovingAvg": {
                                      "input": "$v", "N": 3, "alpha": 0.5}}}}}])
    with pytest.raises(InvalidPipeline, match="window"):
        aggregate(df, [
            {"$setWindowFields": {"partitionBy": "$u", "sortBy": {"t": 1},
                                  "output": {"e": {"$expMovingAvg": {"input": "$v", "N": 3},
                                                   "window": {"documents": [-1, 0]}}}}}])
    with pytest.raises(InvalidPipeline, match="sortBy"):
        aggregate(df, [
            {"$setWindowFields": {"partitionBy": "$u",
                                  "output": {"e": {"$expMovingAvg": {"input": "$v", "N": 3}}}}}])


def test_window_ts_ops_review_fixes(spark):
    """r4 review findings: dotted $integral names, EMA overwrite/validation,
    $locf sortBy requirement, date-sort unit requirement."""
    from aggo_spark.errors import InvalidPipeline
    import datetime as _dt

    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0)], "u long, t long, v double")

    # $integral with a dotted output name resolves its hidden column
    out = aggregate(df, [
        {"$setWindowFields": {"partitionBy": "$u", "sortBy": {"t": 1},
                              "output": {"a.b": {"$integral": {"input": "$v"}}}}}])
    assert {r["a.b"] for r in out.collect()} == {15.0}

    # $expMovingAvg may overwrite an existing column
    out2 = aggregate(df, [
        {"$setWindowFields": {"partitionBy": "$u", "sortBy": {"t": 1},
                              "output": {"v": {"$expMovingAvg": {"input": "$v", "N": 1}}}}}])
    assert {(r["t"], r["v"]) for r in out2.collect()} == {(1, 10.0), (2, 20.0)}

    # validation errors (InvalidPipeline, not raw Python/pandas errors)
    with pytest.raises(InvalidPipeline, match="positive integer"):
        aggregate(df, [{"$setWindowFields": {"sortBy": {"t": 1},
                        "output": {"e": {"$expMovingAvg": {"input": "$v", "N": -1}}}}}])
    with pytest.raises(InvalidPipeline, match="alpha"):
        aggregate(df, [{"$setWindowFields": {"sortBy": {"t": 1},
                        "output": {"e": {"$expMovingAvg": {"input": "$v", "alpha": 2.0}}}}}])
    with pytest.raises(InvalidPipeline, match="sortBy"):
        aggregate(df, [{"$setWindowFields": {"partitionBy": "$u",
                        "output": {"f": {"$locf": "$v"}}}}])

    base = _dt.datetime(2024, 1, 1)
    dft = spark.createDataFrame(
        [(1, base, 1.0), (1, base + _dt.timedelta(seconds=1), 2.0)],
        "u long, ts timestamp, v double")
    with pytest.raises(InvalidPipeline, match="requires unit"):
        aggregate(dft, [{"$setWindowFields": {"sortBy": {"ts": 1},
                         "output": {"d": {"$derivative": {"input": "$v"}}}}}])
    with pytest.raises(InvalidPipeline, match="requires unit"):
        aggregate(dft, [{"$setWindowFields": {"sortBy": {"ts": 1},
                         "output": {"i": {"$integral": {"input": "$v"}}}}}])
    # $linearFill over a date sortBy needs no unit (interpolates on millis)
    dfn = spark.createDataFrame(
        [(1, base, 0.0), (1, base + _dt.timedelta(seconds=1), None),
         (1, base + _dt.timedelta(seconds=2), 4.0)],
        "u long, ts timestamp, v double")
    outl = aggregate(dfn, [
        {"$setWindowFields": {"partitionBy": "$u", "sortBy": {"ts": 1},
                              "output": {"f": {"$linearFill": "$v"}}}}])
    assert sorted(r["f"] for r in outl.collect()) == [0.0, 2.0, 4.0]


def test_window_ts_ops_single_exchange(spark):
    """All time-series window outputs (incl. $integral's lag pre-pass) share
    ONE exchange on the partition key — the pre-pass adds a WindowExec, not
    a shuffle."""
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0)], "u long, t long, v double")
    out = aggregate(df, [
        {"$setWindowFields": {"partitionBy": "$u", "sortBy": {"t": 1},
                              "output": {
                                  "f": {"$locf": "$v"},
                                  "lf": {"$linearFill": "$v"},
                                  "ig": {"$integral": {"input": "$v"}},
                                  "run": {"$sum": "$v", "window": {
                                      "documents": ["unbounded", "current"]}}}}}])
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re
    assert len(re.findall(r"(?<!Reused)Exchange", plan)) == 1
