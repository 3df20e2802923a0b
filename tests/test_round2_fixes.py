"""Round-2 behavior pins: ADVICE.md fixes + VERDICT.md contract gaps.

- $project {"_id": 0} alone drops only _id (ADVICE: fell through to an
  empty inclusion list and dropped every field).
- $unwind on a scalar field drops null rows unless preserve; a schema-absent
  path yields no rows (reference aggregation.ts:447-473).
- $sortArray scalar form follows MongoDB null ordering (nulls first asc,
  last desc), agreeing with struct_comparator.
- $text scan strategy matches whole tokens (same normalization as the
  inverted index in operators/search.py), not substrings.
- $first/$last after $sort compile to min_by/max_by (deterministic).
- non-equi $lookup pipeline `let` form warns instead of silently running
  outer×foreign.
- $toJsonString serializes arrays/structs to canonical JSON text.
"""

from __future__ import annotations

import pytest

from aggo_spark import aggregate


def test_project_id_only_exclusion(spark):
    df = spark.createDataFrame([{"_id": 1, "a": 2, "b": "x"}])
    out = aggregate(df, [{"$project": {"_id": 0}}])
    assert sorted(out.columns) == ["a", "b"]
    assert out.collect()[0].asDict() == {"a": 2, "b": "x"}


def test_unset_id_only(spark):
    df = spark.createDataFrame([{"_id": 1, "a": 2}])
    out = aggregate(df, [{"$unset": "_id"}])
    assert out.columns == ["a"]


def test_unwind_scalar_drops_nulls(spark):
    df = spark.createDataFrame(
        [{"_id": 1, "v": "x"}, {"_id": 2, "v": None}], "`_id` long, v string"
    )
    out = aggregate(df, [{"$unwind": "$v"}])
    assert [r["_id"] for r in out.collect()] == [1]
    out = aggregate(df, [{"$unwind": {"path": "$v", "preserveNullAndEmptyArrays": True}}])
    assert sorted(r["_id"] for r in out.collect()) == [1, 2]


def test_unwind_missing_path_drops_all(spark):
    df = spark.createDataFrame([{"_id": 1, "v": "x"}])
    out = aggregate(df, [{"$unwind": "$nope"}])
    assert out.count() == 0
    out = aggregate(
        df, [{"$unwind": {"path": "$nope", "preserveNullAndEmptyArrays": True}}]
    )
    assert out.count() == 1


def test_sort_array_null_ordering(spark):
    df = spark.createDataFrame([{"_id": 1, "a": [3, None, 1]}])
    asc = aggregate(
        df, [{"$project": {"_id": 0, "s": {"$sortArray": {"input": "$a", "sortBy": 1}}}}]
    ).collect()[0]["s"]
    desc = aggregate(
        df, [{"$project": {"_id": 0, "s": {"$sortArray": {"input": "$a", "sortBy": -1}}}}]
    ).collect()[0]["s"]
    assert asc == [None, 1, 3]  # MongoDB: nulls first ascending
    assert desc == [3, 1, None]  # nulls last descending


def test_text_whole_token_match(spark):
    df = spark.createDataFrame(
        [{"_id": 1, "t": "the catalog arrived"}, {"_id": 2, "t": "a cat sat"}]
    )
    out = aggregate(df, [{"$match": {"$text": {"$search": "cat"}}}])
    assert [r["_id"] for r in out.collect()] == [2]  # not "catalog"


def test_first_last_after_sort_deterministic(spark):
    rows = [{"g": i % 7, "k": (i * 37) % 101, "v": i} for i in range(400)]
    df = spark.createDataFrame(rows).repartition(16)
    out = aggregate(
        df,
        [
            {"$sort": {"k": 1, "v": 1}},
            {"$group": {"_id": "$g",
                        "first_v": {"$first": "$v"},
                        "last_v": {"$last": "$v"}}},
        ],
    )
    got = {r["_id"]: (r["first_v"], r["last_v"]) for r in out.collect()}
    expect: dict[int, tuple] = {}
    for g in range(7):
        grp = sorted((r for r in rows if r["g"] == g), key=lambda r: (r["k"], r["v"]))
        expect[g] = (grp[0]["v"], grp[-1]["v"])
    assert got == expect
    # plan uses min_by/max_by, not partition-order-dependent first/last
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "min_by" in plan and "max_by" in plan


def test_first_last_desc_sort(spark):
    df = spark.createDataFrame([{"g": 1, "k": 1, "v": "lo"}, {"g": 1, "k": 9, "v": "hi"}])
    out = aggregate(
        df,
        [{"$sort": {"k": -1}},
         {"$group": {"_id": "$g", "f": {"$first": "$v"}, "l": {"$last": "$v"}}}],
    ).collect()[0]
    assert (out["f"], out["l"]) == ("hi", "lo")


def test_lookup_nonequi_warns(spark):
    a = spark.createDataFrame([{"_id": 1, "x": 5}])
    b = spark.createDataFrame([{"y": 3}, {"y": 7}])
    with pytest.warns(UserWarning, match="equality conjunct"):
        out = aggregate(
            a,
            [{"$lookup": {"from": "b", "let": {"x": "$x"},
                          "pipeline": [{"$match": {"$expr": {"$lt": ["$y", "$$x"]}}}],
                          "as": "small"}}],
            collections={"b": b},
        )
    got = out.collect()[0]
    assert [e["y"] for e in got["small"]] == [3]


def test_lookup_equi_does_not_warn(spark, recwarn):
    a = spark.createDataFrame([{"_id": 1, "x": 3}])
    b = spark.createDataFrame([{"y": 3}, {"y": 7}])
    out = aggregate(
        a,
        [{"$lookup": {"from": "b", "let": {"x": "$x"},
                      "pipeline": [{"$match": {"$expr": {"$eq": ["$y", "$$x"]}}}],
                      "as": "hit"}}],
        collections={"b": b},
    )
    assert [e["y"] for e in out.collect()[0]["hit"]] == [3]
    assert not [w for w in recwarn if "equality conjunct" in str(w.message)]


def test_to_json_string(spark):
    df = spark.createDataFrame([{"_id": 1, "a": ["x", "y"], "n": 5}])
    out = aggregate(
        df,
        [{"$project": {"_id": 0,
                       "aj": {"$toJsonString": "$a"},
                       "sj": {"$toJsonString": {"$sortArray": {"input": "$a", "sortBy": -1}}}}}],
    ).collect()[0]
    assert out["aj"] == '["x","y"]'
    assert out["sj"] == '["y","x"]'
