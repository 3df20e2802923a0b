"""Extended expression operators: regex, string search/replace, dynamic
field access, object<->array, $zip, date arithmetic, $convert, trig.

These are MongoDB-standard operators beyond the reference's registry
(/root/reference/src/aggo/operators.ts:729-824) — the reference's README
advertises $dateAdd/$dateDiff (README.md:120) but never implemented them.
All map to native Spark functions: no Python UDFs.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest

from aggo_spark import aggregate


@pytest.fixture(scope="module")
def docs(spark):
    data = [
        {"_id": 1, "s": "hello world hello", "ts": dt.datetime(2024, 3, 15, 10, 30, 45),
         "obj": {"a": 1, "b": 2}, "arr1": [1, 2, 3], "arr2": [10, 20],
         "kv": [{"k": "x", "v": 1}, {"k": "y", "v": 2}]},
        {"_id": 2, "s": "spark SQL", "ts": dt.datetime(2024, 12, 31, 23, 59, 59),
         "obj": {"a": 5, "b": 6}, "arr1": [4], "arr2": [30, 40, 50],
         "kv": [{"k": "z", "v": 9}]},
    ]
    return spark.createDataFrame(
        data,
        "`_id` long, s string, ts timestamp, obj struct<a long, b long>, "
        "arr1 array<long>, arr2 array<long>, kv array<struct<k string, v long>>",
    )


def project(df, spec):
    out = aggregate(df, [{"$project": {"_id": 1, **spec}}, {"$sort": {"_id": 1}}])
    return [r.asDict(recursive=True) for r in out.collect()]


class TestRegex:
    def test_regex_match_options(self, docs):
        out = project(docs, {"m": {"$regexMatch": {"input": "$s", "regex": "HELLO", "options": "i"}}})
        assert [r["m"] for r in out] == [True, False]

    def test_regex_find(self, docs):
        out = project(docs, {"f": {"$regexFind": {"input": "$s", "regex": "l+"}}})
        assert out[0]["f"] == {"match": "ll", "idx": 2}
        assert out[1]["f"] is None

    def test_regex_find_all(self, docs):
        out = project(docs, {"f": {"$regexFindAll": {"input": "$s", "regex": "[a-z]+o"}}})
        assert out[0]["f"] == ["hello", "wo", "hello"]
        assert out[1]["f"] == []


class TestStringSearch:
    def test_replace_one_vs_all(self, docs):
        out = project(docs, {
            "one": {"$replaceOne": {"input": "$s", "find": "hello", "replacement": "X"}},
            "all": {"$replaceAll": {"input": "$s", "find": "hello", "replacement": "X"}},
        })
        assert out[0]["one"] == "X world hello" and out[0]["all"] == "X world X"
        assert out[1]["one"] == "spark SQL"

    def test_index_of_cp(self, docs):
        out = project(docs, {
            "i0": {"$indexOfCP": ["$s", "hello"]},
            "i3": {"$indexOfCP": ["$s", "hello", 3]},
            "bounded": {"$indexOfCP": ["$s", "world", 0, 5]},
        })
        assert (out[0]["i0"], out[0]["i3"], out[0]["bounded"]) == (0, 12, -1)
        assert out[1]["i0"] == -1


class TestFieldAccess:
    def test_get_set_unset_field(self, docs):
        out = project(docs, {
            "g": {"$getField": {"field": "a", "input": "$obj"}},
            "s2": {"$setField": {"field": "b", "input": "$obj", "value": 99}},
            "u": {"$unsetField": {"field": "a", "input": "$obj"}},
        })
        assert out[0]["g"] == 1
        assert out[0]["s2"] == {"a": 1, "b": 99}
        assert out[0]["u"] == {"b": 2}

    def test_object_to_array_roundtrip(self, docs):
        out = project(docs, {
            "o2a": {"$objectToArray": "$obj"},
            "a2o": {"$arrayToObject": "$kv"},
        })
        assert out[0]["o2a"] == [{"k": "a", "v": 1}, {"k": "b", "v": 2}]
        assert out[0]["a2o"] == {"x": 1, "y": 2}


class TestZip:
    def test_shortest(self, docs):
        out = project(docs, {"z": {"$zip": {"inputs": ["$arr1", "$arr2"]}}})
        assert out[0]["z"] == [[1, 10], [2, 20]]
        assert out[1]["z"] == [[4, 30]]

    def test_longest_with_defaults(self, docs):
        out = project(docs, {"z": {"$zip": {
            "inputs": ["$arr1", "$arr2"], "useLongestLength": True, "defaults": [0, -1]}}})
        assert out[0]["z"] == [[1, 10], [2, 20], [3, -1]]
        assert out[1]["z"] == [[4, 30], [0, 40], [0, 50]]


class TestDateArithmetic:
    def test_date_add_subtract(self, docs):
        out = project(docs, {
            "plus": {"$dateAdd": {"startDate": "$ts", "unit": "day", "amount": 30}},
            "minus": {"$dateSubtract": {"startDate": "$ts", "unit": "hour", "amount": 10}},
        })
        assert out[0]["plus"] == dt.datetime(2024, 4, 14, 10, 30, 45)
        assert out[0]["minus"] == dt.datetime(2024, 3, 15, 0, 30, 45)

    def test_date_diff_boundary_semantics(self, spark):
        # MongoDB counts boundary crossings: 23:59 → 00:01 next day = 1 day
        df = spark.createDataFrame(
            [(dt.datetime(2024, 1, 1, 23, 59), dt.datetime(2024, 1, 2, 0, 1))],
            "s timestamp, e timestamp")
        out = aggregate(df, [{"$project": {
            "d": {"$dateDiff": {"startDate": "$s", "endDate": "$e", "unit": "day"}},
            "h": {"$dateDiff": {"startDate": "$s", "endDate": "$e", "unit": "hour"}},
        }}]).collect()
        assert out[0]["d"] == 1 and out[0]["h"] == 1

    def test_date_trunc_to_string_from_string(self, docs):
        out = project(docs, {
            "tr": {"$dateTrunc": {"date": "$ts", "unit": "month"}},
            "str": {"$dateToString": {"date": "$ts", "format": "%Y-%m-%d %H:%M"}},
            "parsed": {"$dateFromString": {"dateString": {"$literal": "2024-06-01 12:00:00"}}},
            "bad": {"$dateFromString": {"dateString": {"$literal": "nope"},
                                        "format": "%Y-%m-%d", "onError": None}},
        })
        assert out[0]["tr"] == dt.datetime(2024, 3, 1)
        assert out[0]["str"] == "2024-03-15 10:30"
        assert out[0]["parsed"] == dt.datetime(2024, 6, 1, 12, 0)
        assert out[0]["bad"] is None

    def test_iso_parts(self, spark):
        df = spark.createDataFrame([(dt.datetime(2021, 1, 1),)], "d timestamp")
        out = aggregate(df, [{"$project": {
            "dow": {"$isoDayOfWeek": "$d"},   # Friday = 5
            "wk": {"$isoWeek": "$d"},         # 2021-01-01 is ISO week 53
            "wy": {"$isoWeekYear": "$d"},     # ...of ISO year 2020
        }}]).collect()
        assert (out[0]["dow"], out[0]["wk"], out[0]["wy"]) == (5, 53, 2020)


class TestConvertTrig:
    def test_convert_on_error_on_null(self, docs):
        out = project(docs, {
            "ok": {"$convert": {"input": {"$literal": "42"}, "to": "int"}},
            "bad": {"$convert": {"input": {"$literal": "12x"}, "to": "int", "onError": -1}},
            "nul": {"$convert": {"input": None, "to": "int", "onNull": 7}},
        })
        assert (out[0]["ok"], out[0]["bad"], out[0]["nul"]) == (42, -1, 7)

    def test_trig_and_log(self, docs):
        out = project(docs, {
            "pi": {"$multiply": [{"$atan2": [1, 1]}, 4]},
            "lg": {"$log": [8, 2]},
            "deg": {"$radiansToDegrees": {"$degreesToRadians": 180}},
        })
        assert abs(out[0]["pi"] - math.pi) < 1e-12
        assert out[0]["lg"] == 3.0
        assert abs(out[0]["deg"] - 180.0) < 1e-12


class TestLetDatePartsBitwise:
    def test_let_binding(self, spark, docs):
        out = project(docs, {"x": {"$let": {
            "vars": {"t": {"$add": ["$obj.a", 10]}},
            "in": {"$multiply": ["$$t", 2]}}}})
        assert [r["x"] for r in out] == [22, 30]

    def test_let_vars_outer_scope(self, spark, docs):
        # vars evaluate in the OUTER scope: `a` here is the field, not the var
        out = project(docs, {"x": {"$let": {
            "vars": {"a": 100, "b": {"$add": ["$obj.a", 0]}},
            "in": {"$add": ["$$a", "$$b"]}}}})
        assert [r["x"] for r in out] == [101, 105]

    def test_date_from_parts(self, spark, docs):
        out = project(docs, {"d": {"$dateFromParts": {
            "year": 2021, "month": 2, "day": 3, "hour": 4,
            "minute": 5, "second": 6, "millisecond": 789}}})
        assert out[0]["d"] == dt.datetime(2021, 2, 3, 4, 5, 6, 789000)

    def test_date_from_parts_iso(self, spark, docs):
        # ISO 2021-W01-1 is Monday 2021-01-04
        out = project(docs, {"d": {"$dateFromParts": {
            "isoWeekYear": 2021, "isoWeek": 1, "isoDayOfWeek": 1}}})
        assert out[0]["d"] == dt.datetime(2021, 1, 4)

    def test_date_to_parts_roundtrip(self, spark, docs):
        out = project(docs, {"p": {"$dateToParts": {"date": "$ts"}},
                             "pi": {"$dateToParts": {"date": "$ts", "iso8601": True}}})
        p = out[0]["p"]
        assert (p["year"], p["month"], p["day"], p["hour"], p["minute"],
                p["second"], p["millisecond"]) == (2024, 3, 15, 10, 30, 45, 0)
        assert out[0]["pi"]["isoDayOfWeek"] == 5  # 2024-03-15 is a Friday

    def test_bitwise(self, spark, docs):
        out = project(docs, {
            "a": {"$bitAnd": [12, 10, 8]}, "o": {"$bitOr": [1, 2, 4]},
            "x": {"$bitXor": [12, 10]}, "n": {"$bitNot": 0}})
        assert (out[0]["a"], out[0]["o"], out[0]["x"], out[0]["n"]) == (8, 7, 6, -1)

    def test_substr_bytes(self, spark, docs):
        out = project(docs, {"x": {"$substrBytes": ["$s", 0, 5]}})
        assert out[0]["x"] == "hello"

    def test_first_last_min_max_n(self, spark, docs):
        out = project(docs, {
            "f": {"$firstN": {"n": 2, "input": "$arr2"}},
            "l": {"$lastN": {"n": 2, "input": "$arr2"}},
            "mn": {"$minN": {"n": 2, "input": "$arr2"}},
            "mx": {"$maxN": {"n": 2, "input": "$arr2"}}})
        assert out[1]["f"] == [30, 40] and out[1]["l"] == [40, 50]
        assert out[1]["mn"] == [30, 40] and out[1]["mx"] == [50, 40]
        # n larger than the array: whole array, no padding
        assert out[0]["f"] == [10, 20] and out[0]["l"] == [10, 20]
