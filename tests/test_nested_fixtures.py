"""Nested-document fixture suite — the reference's fixture specs
(/root/reference/tests/fixtures/ecommerce-orders.spec.js and friends) work
over JSONL docs with embedded arrays of objects; this suite covers the same
shapes (orders with line-item arrays) against inline data, exercising the
paths flat TPC-H tables don't: projection through arrays, $unwind options,
$elemMatch, array higher-order functions over structs, $expressionObject
array broadcast.
"""

from __future__ import annotations

import pytest

from aggo_spark import Engine, aggregate, count, expression, match


@pytest.fixture(scope="module")
def orders(spark):
    data = [
        {"_id": 1, "status": "shipped", "cust": {"name": "ada", "tier": "gold"},
         "items": [{"sku": "a", "price": 10.0, "qty": 2},
                   {"sku": "b", "price": 5.0, "qty": 1}]},
        {"_id": 2, "status": "pending", "cust": {"name": "bob", "tier": "silver"},
         "items": [{"sku": "a", "price": 10.0, "qty": 1}]},
        {"_id": 3, "status": "shipped", "cust": {"name": "cid", "tier": "gold"},
         "items": []},
        {"_id": 4, "status": "shipped", "cust": {"name": "dee", "tier": "bronze"},
         "items": [{"sku": "c", "price": 99.0, "qty": 3},
                   {"sku": "a", "price": 10.0, "qty": 5}]},
    ]
    return spark.createDataFrame(
        data,
        "`_id` long, status string, cust struct<name string, tier string>, "
        "items array<struct<sku string, price double, qty long>>",
    )


def rows(df):
    return [r.asDict(recursive=True) for r in df.collect()]


def test_revenue_per_order_via_reduce(orders):
    out = rows(aggregate(orders, [
        {"$project": {"_id": 1, "revenue": {"$reduce": {
            "input": "$items", "initialValue": 0.0,
            "in": {"$add": ["$$value", {"$multiply": ["$$this.price", "$$this.qty"]}]},
        }}}},
        {"$sort": {"_id": 1}},
    ]))
    assert [(r["_id"], r["revenue"]) for r in out] == [
        (1, 25.0), (2, 10.0), (3, 0.0), (4, 347.0)]


def test_unwind_group_by_sku(orders):
    out = rows(aggregate(orders, [
        {"$unwind": "$items"},
        {"$group": {"_id": "$items.sku",
                    "units": {"$sum": "$items.qty"},
                    "revenue": {"$sum": {"$multiply": ["$items.price", "$items.qty"]}}}},
        {"$sort": {"_id": 1}},
    ]))
    assert [(r["_id"], r["units"], r["revenue"]) for r in out] == [
        ("a", 8, 80.0), ("b", 1, 5.0), ("c", 3, 297.0)]


def test_unwind_preserve_and_index(orders):
    out = rows(aggregate(orders, [
        {"$unwind": {"path": "$items", "includeArrayIndex": "idx",
                     "preserveNullAndEmptyArrays": True}},
        {"$project": {"_id": 1, "idx": 1, "sku": "$items.sku"}},
        {"$sort": {"_id": 1, "idx": 1}},
    ]))
    assert [(r["_id"], r["idx"], r["sku"]) for r in out] == [
        (1, 0, "a"), (1, 1, "b"), (2, 0, "a"),
        (3, None, None),  # empty array preserved
        (4, 0, "c"), (4, 1, "a")]


def test_elem_match_on_struct_array(orders):
    got = rows(match(orders, {"items": {"$elemMatch": {"price": {"$gt": 50},
                                                       "qty": {"$gte": 3}}}}))
    assert [r["_id"] for r in got] == [4]


def test_project_through_array_of_structs(orders):
    out = rows(aggregate(orders, [
        {"$project": {"_id": 1, "skus": "$items.sku",
                      "names": {"upper": {"$toUpper": "$cust.name"}}}},
        {"$sort": {"_id": 1}},
    ]))
    assert out[0]["skus"] == ["a", "b"] and out[0]["names"] == {"upper": "ADA"}
    assert out[3]["skus"] == ["c", "a"]


def test_filter_map_over_items(orders):
    out = rows(aggregate(orders, [
        {"$project": {"_id": 1, "big": {"$map": {
            "input": {"$filter": {"input": "$items", "as": "i",
                                  "cond": {"$gte": ["$$i.qty", 2]}}},
            "as": "i", "in": "$$i.sku"}}}},
        {"$sort": {"_id": 1}},
    ]))
    assert [r["big"] for r in out] == [["a"], [], [], ["c", "a"]]


def test_group_push_addtoset_mergeobjects(orders):
    out = rows(aggregate(orders, [
        {"$group": {"_id": "$cust.tier",
                    "names": {"$addToSet": "$cust.name"},
                    "n": {"$sum": 1}}},
        {"$sort": {"_id": 1}},
    ]))
    by = {r["_id"]: r for r in out}
    assert sorted(by["gold"]["names"]) == ["ada", "cid"] and by["gold"]["n"] == 2


def test_sort_by_nested_field_and_size(orders):
    out = rows(aggregate(orders, [
        {"$addFields": {"n_items": {"$size": "$items"}}},
        {"$sort": {"n_items": -1, "_id": 1}},
        {"$limit": 2},
        {"$project": {"_id": 1, "n_items": 1}},
    ]))
    assert [(r["_id"], r["n_items"]) for r in out] == [(1, 2), (4, 2)]


def test_standalone_helpers(orders, spark):
    assert count(orders) == 4
    assert count([1, 2, 3]) == 3
    v = expression({"a": 3, "b": 4}, {"$sqrt": {"$add": [
        {"$multiply": ["$a", "$a"]}, {"$multiply": ["$b", "$b"]}]}}, spark=spark)
    assert v == 5.0


def test_root_and_replace(orders):
    out = rows(aggregate(orders, [
        {"$match": {"status": "pending"}},
        {"$replaceRoot": {"newRoot": "$cust"}},
    ]))
    assert out == [{"name": "bob", "tier": "silver"}]


def test_standalone_stage_functions(orders, spark):
    from aggo_spark import add_fields, limit, lookup, skip

    two = limit(orders, 2)
    assert two.count() == 2
    assert skip(orders, 3).count() == 1
    af = add_fields(orders, {"n_items": {"$size": "$items"}})
    assert "n_items" in af.columns
    tiers = spark.createDataFrame(
        [("gold", 0.2), ("silver", 0.1)], "tier string, disc double")
    looked = lookup(
        orders,
        {"from": "tiers", "localField": "cust.tier",
         "foreignField": "tier", "as": "t"},
        {"tiers": tiers},
    )
    by = {r["_id"]: r.asDict(recursive=True) for r in looked.collect()}
    assert by[1]["t"] == [{"tier": "gold", "disc": 0.2}]
    assert by[4]["t"] == []  # bronze: no match -> empty array


def test_benchmark_api(orders):
    from aggo_spark import benchmark

    res = benchmark(orders, [{"$group": {"_id": "$status", "n": {"$sum": 1}}}],
                    iterations=2, warmup_runs=1)
    assert res["iterations"] == 2 and res["min_ms"] > 0
    assert res["min_ms"] <= res["median_ms"] <= res["max_ms"]
