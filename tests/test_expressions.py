"""Expression-operator unit tests (model: reference tests/operators.spec.js).

Each case evaluates an expression via $project over a tiny DataFrame and
checks the literal result.
"""

from __future__ import annotations

import datetime as dt

import pytest

from aggo_spark import aggregate


@pytest.fixture(scope="module")
def df(spark):
    from pyspark.sql import Row

    schema = (
        "_id long, s string, n double, neg double, arr array<long>, words array<string>, "
        "empty_s string, ts timestamp, flag boolean, nothing string"
    )
    return spark.createDataFrame(
        [
            Row(
                _id=1,
                s="Hello World",
                n=7.0,
                neg=-3.7,
                arr=[1, 2, 3, 4, 5],
                words=["b", "a", "c"],
                empty_s="  pad  ",
                ts=dt.datetime(2021, 6, 15, 10, 30, 45, 123000),
                flag=True,
                nothing=None,
            )
        ],
        schema=schema,
    )


def ev(df, expr):
    out = aggregate(df, [{"$project": {"_id": 0, "r": expr}}])
    return out.collect()[0]["r"]


# arithmetic (reference operators.ts:208-289)

def test_arithmetic(df):
    assert ev(df, {"$add": [1, 2, 3]}) == 6
    assert ev(df, {"$subtract": [10, "$n"]}) == 3.0
    assert ev(df, {"$multiply": ["$n", 2, 10]}) == 140.0
    assert ev(df, {"$divide": [10, 4]}) == 2.5
    assert ev(df, {"$mod": [10, 3]}) == 1
    assert ev(df, {"$abs": "$neg"}) == 3.7
    assert ev(df, {"$ceil": "$neg"}) == -3
    assert ev(df, {"$floor": "$neg"}) == -4
    assert ev(df, {"$trunc": "$neg"}) == -3
    assert ev(df, {"$round": ["$neg", 1]}) == -3.7
    assert ev(df, {"$sqrt": 16}) == 4.0
    assert ev(df, {"$pow": [2, 10]}) == 1024.0


def test_date_arithmetic(df):
    # Date + ms → Date; Date - Date → ms (reference operators.ts:208-245)
    r = ev(df, {"$add": ["$ts", 1000]})
    assert r == dt.datetime(2021, 6, 15, 10, 30, 46, 123000)
    r = ev(df, {"$subtract": [{"$add": ["$ts", 5000]}, "$ts"]})
    assert r == 5000


# comparison (reference operators.ts:128-205)

def test_comparison(df):
    assert ev(df, {"$eq": ["$n", 7]}) is True
    assert ev(df, {"$ne": ["$n", 7]}) is False
    assert ev(df, {"$gt": ["$n", 6]}) is True
    assert ev(df, {"$lte": ["$n", 7]}) is True
    assert ev(df, {"$cmp": ["$n", 10]}) == -1
    assert ev(df, {"$cmp": [10, "$n"]}) == 1
    assert ev(df, {"$cmp": ["$n", 7]}) == 0
    # null handling: null == null, null < anything
    assert ev(df, {"$eq": ["$nothing", None]}) is True
    assert ev(df, {"$cmp": ["$nothing", 5]}) == -1


def test_boolean(df):
    assert ev(df, {"$and": ["$flag", {"$gt": ["$n", 1]}]}) is True
    assert ev(df, {"$or": [False, False]}) is False
    assert ev(df, {"$not": ["$flag"]}) is False
    assert ev(df, {"$not": ["$nothing"]}) is True  # null falsy under $not


# string (reference operators.ts:292-377)

def test_strings(df):
    assert ev(df, {"$concat": ["$s", "!"]}) == "Hello World!"
    assert ev(df, {"$toUpper": "$s"}) == "HELLO WORLD"
    assert ev(df, {"$toLower": "$s"}) == "hello world"
    assert ev(df, {"$substr": ["$s", 0, 5]}) == "Hello"
    assert ev(df, {"$substr": ["$s", 6, 5]}) == "World"
    assert ev(df, {"$split": ["$s", " "]}) == ["Hello", "World"]
    assert ev(df, {"$strLen": "$s"}) == 11
    assert ev(df, {"$trim": {"input": "$empty_s"}}) == "pad"
    assert ev(df, {"$ltrim": {"input": "$empty_s"}}) == "pad  "
    assert ev(df, {"$rtrim": {"input": "$empty_s"}}) == "  pad"
    assert ev(df, {"$toString": "$n"}) == "7.0"
    # literal-delimiter split must not be treated as regex
    assert ev(df, {"$split": ["a.b.c", "."]}) == ["a", "b", "c"]


# array (reference operators.ts:380-526)

def test_arrays(df):
    assert ev(df, {"$size": "$arr"}) == 5
    assert ev(df, {"$arrayElemAt": ["$arr", 0]}) == 1
    assert ev(df, {"$arrayElemAt": ["$arr", -1]}) == 5
    assert ev(df, {"$arrayElemAt": ["$arr", 99]}) is None
    assert ev(df, {"$slice": ["$arr", 2]}) == [1, 2]
    assert ev(df, {"$slice": ["$arr", -2]}) == [4, 5]
    assert ev(df, {"$slice": ["$arr", 1, 2]}) == [2, 3]
    assert ev(df, {"$concatArrays": ["$arr", [9]]}) == [1, 2, 3, 4, 5, 9]
    assert ev(df, {"$in": [3, "$arr"]}) is True
    assert ev(df, {"$in": [99, "$arr"]}) is False
    assert ev(df, {"$indexOfArray": ["$arr", 3]}) == 2
    assert ev(df, {"$indexOfArray": ["$arr", 99]}) == -1
    assert ev(df, {"$reverseArray": "$arr"}) == [5, 4, 3, 2, 1]
    assert ev(df, {"$range": [0, 5]}) == [0, 1, 2, 3, 4]
    assert ev(df, {"$range": [0, 10, 3]}) == [0, 3, 6, 9]


def test_array_hof(df):
    assert ev(df, {"$filter": {"input": "$arr", "as": "x", "cond": {"$gt": ["$$x", 2]}}}) == [3, 4, 5]
    assert ev(df, {"$map": {"input": "$arr", "as": "x", "in": {"$multiply": ["$$x", 10]}}}) == [
        10, 20, 30, 40, 50,
    ]
    assert (
        ev(df, {"$reduce": {"input": "$arr", "initialValue": 0, "in": {"$add": ["$$value", "$$this"]}}})
        == 15
    )


def test_array_aggregates(df):
    assert ev(df, {"$sum": "$arr"}) == 15.0
    assert ev(df, {"$avg": "$arr"}) == 3.0
    assert ev(df, {"$min": "$arr"}) == 1
    assert ev(df, {"$max": "$arr"}) == 5
    assert ev(df, {"$sum": [1, 2]}) == 3  # n-ary scalar form


# set (reference operators.ts:72-125)

def test_set_ops(df):
    assert ev(df, {"$setIntersection": [["a", "b"], ["b", "c"]]}) == ["b"]
    assert sorted(ev(df, {"$setUnion": [["a", "b"], ["b", "c"]]})) == ["a", "b", "c"]
    assert ev(df, {"$setDifference": [["a", "b"], ["b", "c"]]}) == ["a"]
    assert ev(df, {"$setEquals": [["a", "b"], ["b", "a"]]}) is True
    assert ev(df, {"$setIsSubset": [["a"], ["a", "b"]]}) is True
    assert ev(df, {"$anyElementTrue": [[False, True]]}) is True
    assert ev(df, {"$allElementsTrue": [[False, True]]}) is False


# date (reference operators.ts:577-642)

def test_dates(df):
    assert ev(df, {"$year": "$ts"}) == 2021
    assert ev(df, {"$month": "$ts"}) == 6
    assert ev(df, {"$dayOfMonth": "$ts"}) == 15
    assert ev(df, {"$dayOfWeek": "$ts"}) == 3  # Tuesday, 1=Sunday
    assert ev(df, {"$dayOfYear": "$ts"}) == 166
    assert ev(df, {"$hour": "$ts"}) == 10
    assert ev(df, {"$minute": "$ts"}) == 30
    assert ev(df, {"$second": "$ts"}) == 45
    assert ev(df, {"$millisecond": "$ts"}) == 123


# conditional (reference operators.ts:645-670)

def test_conditionals(df):
    assert ev(df, {"$cond": [{"$gt": ["$n", 5]}, "big", "small"]}) == "big"
    assert ev(df, {"$cond": {"if": {"$lt": ["$n", 5]}, "then": "a", "else": "b"}}) == "b"
    assert ev(df, {"$ifNull": ["$nothing", "fallback"]}) == "fallback"
    assert ev(df, {"$ifNull": ["$s", "fallback"]}) == "Hello World"
    assert (
        ev(
            df,
            {
                "$switch": {
                    "branches": [
                        {"case": {"$lt": ["$n", 5]}, "then": "low"},
                        {"case": {"$lt": ["$n", 10]}, "then": "mid"},
                    ],
                    "default": "high",
                }
            },
        )
        == "mid"
    )


# type (reference operators.ts:673-696)

def test_type_ops(df):
    assert ev(df, {"$type": "$s"}) == "string"
    assert ev(df, {"$type": "$n"}) == "double"
    assert ev(df, {"$type": "$arr"}) == "array"
    assert ev(df, {"$type": "$nothing"}) == "null"
    assert ev(df, {"$isNumber": "$n"}) is True
    assert ev(df, {"$isNumber": "$s"}) is False
    assert ev(df, {"$isArray": "$arr"}) is True


# object / literals / variables

def test_object_and_literals(df):
    r = ev(df, {"$mergeObjects": [{"a": 1, "b": 2}, {"b": "$n", "c": 3}]})
    assert r.asDict() == {"a": 1, "b": 7.0, "c": 3}
    assert ev(df, {"$literal": "$s"}) == "$s"  # not interpreted as a path
    r = ev(df, {"x": "$n", "y": {"$add": [1, 1]}})
    assert r.asDict() == {"x": 7.0, "y": 2}


def test_root_variable(df):
    out = aggregate(df, [{"$project": {"_id": 0, "copy": "$$ROOT"}}])
    r = out.collect()[0]["copy"]
    assert r["s"] == "Hello World" and r["n"] == 7.0


def test_casts(df):
    assert ev(df, {"$toInt": "$n"}) == 7
    assert ev(df, {"$toLong": "3.9"}) is None or ev(df, {"$toLong": 3.9}) == 3
    assert ev(df, {"$toDouble": "2.5"}) == 2.5
