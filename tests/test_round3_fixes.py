"""Round-3 fixes: mixed-direction $first/$last, $bucketAuto granularity,
$documents expression fields, deep $graphLookup."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from aggo_spark import Engine


@pytest.fixture(scope="module")
def eng(spark):
    rows = [
        (1, "a", 5, dt.datetime(2020, 1, 1)),
        (1, "a2", 9, dt.datetime(2020, 1, 2)),
        (1, "b", 9, dt.datetime(2020, 1, 3)),
        (2, "c", 1, dt.datetime(2020, 2, 1)),
        (2, "d", 1, dt.datetime(2020, 1, 5)),
    ]
    df = spark.createDataFrame(rows, "g long, name string, score long, ts timestamp")
    return Engine({"t": df})


def test_first_last_mixed_direction_deterministic(eng):
    out = eng.aggregate("t", [
        {"$sort": {"score": 1, "ts": -1}},
        {"$group": {"_id": "$g",
                    "first_name": {"$first": "$name"},
                    "last_name": {"$last": "$name"}}},
        {"$sort": {"_id": 1}},
    ]).collect()
    # g=1 sorted: a(5) ; ties at 9 ts desc -> b(Jan3), a2(Jan2)
    assert out[0]["first_name"] == "a" and out[0]["last_name"] == "a2"
    # g=2 ties at score=1, ts desc -> c(Feb1) first, d(Jan5) last
    assert out[1]["first_name"] == "c" and out[1]["last_name"] == "d"


def test_first_last_mixed_direction_plan_uses_min_by(eng):
    q = eng.aggregate("t", [
        {"$sort": {"score": 1, "ts": -1}},
        {"$group": {"_id": "$g", "fn": {"$first": "$name"}}},
    ])
    plan = q._jdf.queryExecution().optimizedPlan().toString()
    assert "min_by" in plan and "first(" not in plan


def test_first_last_mixed_string_desc_uses_rank_surrogate(eng):
    # string desc has no sign inversion -> a dense-rank surrogate keeps the
    # min_by mapping (r4: no more partition-order F.first fallback)
    q = eng.aggregate("t", [
        {"$sort": {"score": 1, "name": -1}},
        {"$group": {"_id": "$g", "fn": {"$first": "$name"}}},
    ])
    plan = q._jdf.queryExecution().optimizedPlan().toString()
    assert "min_by" in plan and "first(" not in plan


def test_first_last_mixed_string_desc_values(eng):
    out = eng.aggregate("t", [
        {"$sort": {"score": 1, "name": -1}},
        {"$group": {"_id": "$g",
                    "fn": {"$first": "$name"},
                    "ln": {"$last": "$name"}}},
        {"$sort": {"_id": 1}},
    ]).collect()
    # g=1 sorted by (score asc, name desc): a(5), b(9), a2(9) -> first a, last a2
    assert out[0]["fn"] == "a" and out[0]["ln"] == "a2"
    # g=2: ties at score=1, name desc -> d, c
    assert out[1]["fn"] == "d" and out[1]["ln"] == "c"


def test_sort_array_field_min_max_element(spark):
    # MongoDB semantics (r4): asc sorts by MIN element, desc by MAX element
    rows = [(1, [5, 9]), (2, [3, 20]), (3, [7])]
    df = spark.createDataFrame(rows, "id long, a array<long>")
    eng2 = Engine({"t": df})
    asc = [r["id"] for r in eng2.aggregate(
        "t", [{"$sort": {"a": 1}}, {"$project": {"id": 1}}]).collect()]
    assert asc == [2, 1, 3]  # mins: 3, 5, 7
    desc = [r["id"] for r in eng2.aggregate(
        "t", [{"$sort": {"a": -1}}, {"$project": {"id": 1}}]).collect()]
    assert desc == [2, 1, 3]  # maxes: 20, 9, 7


def test_first_after_array_sort_uses_same_key(spark):
    rows = [(1, "x", [5, 9]), (1, "y", [3, 20]), (1, "z", [7])]
    df = spark.createDataFrame(rows, "g long, name string, a array<long>")
    eng2 = Engine({"t": df})
    out = eng2.aggregate("t", [
        {"$sort": {"a": -1}},
        {"$group": {"_id": "$g", "fn": {"$first": "$name"},
                    "ln": {"$last": "$name"}}},
    ]).collect()
    # desc by max element: y(20), x(9), z(7)
    assert out[0]["fn"] == "y" and out[0]["ln"] == "z"


def test_first_last_single_null_sort_key_not_dropped(spark):
    # bare min_by/max_by skip rows whose ordering key is null — the r4
    # struct wrap keeps them in the pick with nulls-first placement
    rows = [(1, "n", None), (1, "x", 5), (1, "y", 9)]
    df = spark.createDataFrame(rows, "g long, name string, k long")
    eng2 = Engine({"t": df})
    out = eng2.aggregate("t", [
        {"$sort": {"k": 1}},
        {"$group": {"_id": "$g", "fn": {"$first": "$name"},
                    "ln": {"$last": "$name"}}},
    ]).collect()
    assert out[0]["fn"] == "n" and out[0]["ln"] == "y"  # null key sorts first
    # desc: nulls last (desc_nulls_last), so $last picks the null-key row
    out2 = eng2.aggregate("t", [
        {"$sort": {"k": -1}},
        {"$group": {"_id": "$g", "fn": {"$first": "$name"},
                    "ln": {"$last": "$name"}}},
    ]).collect()
    assert out2[0]["fn"] == "y" and out2[0]["ln"] == "n"
    # all-null keys: the pick returns a document's value, not null
    df3 = spark.createDataFrame([(1, "a", None), (1, "b", None)],
                                "g long, name string, k long")
    out3 = Engine({"t": df3}).aggregate("t", [
        {"$sort": {"k": 1}},
        {"$group": {"_id": "$g", "fn": {"$first": "$name"}}},
    ]).collect()
    assert out3[0]["fn"] in ("a", "b")


def test_first_after_empty_array_sort_key(spark):
    # empty array -> null sort key; must still participate in the pick
    rows = [(1, "e", []), (1, "x", [5])]
    df = spark.createDataFrame(rows, "g long, name string, a array<long>")
    out = Engine({"t": df}).aggregate("t", [
        {"$sort": {"a": 1}},
        {"$group": {"_id": "$g", "fn": {"$first": "$name"}}},
    ]).collect()
    assert out[0]["fn"] == "e"


def test_first_last_string_desc_null_keys(spark):
    # nulls in the desc string component sort LAST, matching the engine's
    # own $sort desc (desc_nulls_last) and MongoDB (r4; the rank surrogate
    # used to rank nulls first, contradicting the sorted stream)
    rows = [(1, None, 5), (1, "z", 5), (1, "a", 5)]
    df = spark.createDataFrame(rows, "g long, name string, score long")
    eng2 = Engine({"t": df})
    out = eng2.aggregate("t", [
        {"$sort": {"score": 1, "name": -1}},
        {"$group": {"_id": "$g", "fn": {"$first": "$name"}, "ln": {"$last": "$name"}}},
    ]).collect()
    assert out[0]["fn"] == "z" and out[0]["ln"] is None


def test_bucket_auto_granularity(spark):
    rows = [(i, float(v)) for i, v in enumerate(
        [3, 7, 12, 19, 24, 31, 48, 55, 70, 92, 110, 150, 210, 330, 480, 700])]
    df = spark.createDataFrame(rows, "id long, price double")
    eng = Engine({"t": df})
    for g, first_lo, last_hi in [
        ("R5", 2.5, 1000.0), ("E12", 2.7, 820.0),
        ("POWERSOF2", 2.0, 1024.0), ("1-2-5", 2.0, 1000.0),
    ]:
        out = eng.aggregate("t", [
            {"$bucketAuto": {"groupBy": "$price", "buckets": 4,
                             "granularity": g}},
        ]).collect()
        assert sum(r["count"] for r in out) == len(rows)
        for a, b in zip(out, out[1:]):  # contiguous series boundaries
            assert a["_id"]["max"] == b["_id"]["min"]
        assert out[0]["_id"]["min"] == first_lo
        assert out[-1]["_id"]["max"] == last_hi


def test_bucket_auto_granularity_rejects_unknown(spark):
    from aggo_spark.errors import InvalidPipeline

    df = spark.createDataFrame([(1, 2.0)], "id long, v double")
    eng = Engine({"t": df})
    with pytest.raises(InvalidPipeline):
        eng.aggregate("t", [{"$bucketAuto": {
            "groupBy": "$v", "buckets": 2, "granularity": "R7"}}])


def test_documents_expression_fields(spark):
    eng = Engine()
    df = spark.createDataFrame([(1,)], "x long")
    out = eng.aggregate(df, [
        {"$documents": [
            {"x": {"$add": [1, 2]}, "tag": "a"},
            {"x": {"$multiply": [2, 5]}, "tag": {"$toUpper": "b"}},
        ]},
        {"$project": {"_id": 0, "x": 1, "tag": 1}},
        {"$sort": {"x": 1}},
    ]).collect()
    assert [(r["x"], r["tag"]) for r in out] == [(3, "a"), (10, "B")]


def test_documents_literals_still_work(spark):
    eng = Engine()
    df = spark.createDataFrame([(1,)], "x long")
    out = eng.aggregate(df, [
        {"$documents": [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]},
        {"$sort": {"a": 1}},
    ]).collect()
    assert [r["a"] for r in out] == [1, 2]


# marked slow (r14): excluded from the default driver gate, run with -m slow
@pytest.mark.slow
def test_graph_lookup_deep_traversal(spark):
    # a 40-deep linked list exercises the every-5-hops localCheckpoint path
    rows = [(i, i - 1) for i in range(1, 41)]
    df = spark.createDataFrame(rows, "node long, parent long")
    eng = Engine({"t": df})
    out = eng.aggregate("t", [
        {"$match": {"node": 40}},
        {"$graphLookup": {"from": "t", "startWith": "$parent",
                          "connectFromField": "parent", "connectToField": "node",
                          "as": "anc", "maxDepth": 50}},
        {"$project": {"_id": 0, "node": 1, "n_anc": {"$size": "$anc"}}},
    ]).collect()
    assert out[0]["n_anc"] == 39


def test_doc_metrics_two_stage_projection_survives_optimizer(spark):
    """Guard the r3 perf fix: the shared __tok materialization must NOT be
    collapsed back into consuming columns (HOFs have no CSE — inlining
    re-evaluates the normalize+split subtree per referencing column)."""
    from aggo_spark.operators import text

    df = spark.createDataFrame(
        [(1, "the quick brown fox. jumps over the lazy dog")],
        "doc_id long, text string")
    plan = text.doc_metrics(df)._jdf.queryExecution().optimizedPlan().toString()
    # the normalize regex should appear ~2x (tok + nch), not once per metric
    assert plan.count("[^a-z0-9 ]") <= 3, plan.count("[^a-z0-9 ]")


def test_word_ngrams_no_subtree_in_lambda(spark):
    """word_ngrams must not re-evaluate its input inside a lambda: the plan
    should contain zip_with over slices, not transform(sequence...)."""
    from aggo_spark.operators import text
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, "a b c d e")], "id long, text string")
    out = df.select(text.word_ngrams(text.tokens(F.col("text")), 3).alias("g"))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "zip_with" in plan
    rows = out.first()["g"]
    assert rows == ["a b c", "b c d", "c d e"]


def test_bucket_auto_granularity_rejects_negative_values(spark):
    df = spark.createDataFrame([(1, 5.0), (2, -3.0)], "id long, v double")
    eng = Engine({"t": df})
    with pytest.raises(Exception, match="non-negative"):
        eng.aggregate("t", [{"$bucketAuto": {
            "groupBy": "$v", "buckets": 2, "granularity": "R5"}}]).collect()


def test_documents_large_literal_list_single_source(spark):
    # 300 literal docs + 1 expression doc: plan must not be a 301-way union
    eng = Engine()
    df = spark.createDataFrame([(1,)], "x long")
    spec = [{"a": i} for i in range(300)] + [{"a": {"$add": [1000, 1]}}]
    out = eng.aggregate(df, [{"$documents": spec}])
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Union") <= 2, plan.count("Union")
    rows = out.collect()
    assert len(rows) == 301 and max(r["a"] for r in rows) == 1001


def test_word_ngrams_null_text_yields_empty(spark):
    from aggo_spark.operators import text

    df = spark.createDataFrame([(1, None)], "id long, text string")
    r = df.select(text.word_ngrams(text.tokens(F.col("text")), 2).alias("g")).first()
    assert r["g"] == []


def test_bm25_empty_corpus_preserves_id_type(spark):
    from aggo_spark.operators import search

    empty = spark.createDataFrame([], "doc_id string, text string")
    out = search.bm25_search(empty, "spark", limit=5)
    assert dict(out.dtypes)["doc_id"] == "string"


def test_first_last_mixed_long_min_no_overflow(spark):
    rows = [(1, "min", -(1 << 63)), (1, "five", 5)]
    df = spark.createDataFrame(rows, "g long, name string, b long")
    eng = Engine({"t": df})
    out = eng.aggregate("t", [
        {"$sort": {"g": 1, "b": -1}},
        {"$group": {"_id": "$g", "fn": {"$first": "$name"}}},
    ]).collect()
    # desc order of b: 5 comes before Long.MIN — "five" must be first
    assert out[0]["fn"] == "five"
