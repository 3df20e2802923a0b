"""Plugin-package parity: reactive (rxjs) combinators and NL→pipeline (ai).

Reference surfaces: /root/reference/packages/rxjs/src/index.ts (aggregate /
streamingAggregate / aggregateCollections / reactiveAggregation with
distinctUntilChanged semantics) and /root/reference/packages/ai/src
(schema-inferred prompt → JSON pipeline → validate → execute)."""

from __future__ import annotations

import json

import pytest

from aggo_spark.plugins import (
    PipelineGenerationError,
    RuleBasedClient,
    Subject,
    aggregate,
    aggregate_collections,
    ai_query,
    build_prompt,
    observe,
    parse_response,
    reactive_aggregation,
    streaming_aggregate,
    validate_pipeline,
)

GROUP_SUM = [{"$group": {"_id": "$g", "n": {"$sum": "$v"}}}, {"$sort": {"_id": 1}}]


def _ids(result):
    return [(r["_id"], r["n"]) for r in result]


# ---------------------------------------------------------------------------
# reactive
# ---------------------------------------------------------------------------

def test_reactive_aggregate_per_batch(spark):
    src = Subject()
    seen = []
    aggregate(src, GROUP_SUM, spark=spark).subscribe(seen.append)
    src.next([{"g": "a", "v": 1}, {"g": "a", "v": 2}])
    src.next({"g": "b", "v": 5})
    assert _ids(seen[0]) == [("a", 3)]
    assert _ids(seen[1]) == [("b", 5)]  # non-incremental: batch stands alone


def test_reactive_aggregate_incremental_accumulates(spark):
    src = Subject()
    seen = []
    aggregate(src, GROUP_SUM, incremental=True, spark=spark).subscribe(seen.append)
    src.next({"g": "a", "v": 1})
    src.next({"g": "b", "v": 5})
    assert _ids(seen[-1]) == [("a", 1), ("b", 5)]


def test_reactive_distinct_suppresses_duplicate_results(spark):
    src = Subject()
    seen = []
    # count of docs with v >= 0 is unchanged by a doc that fails the match
    pipe = [{"$match": {"v": {"$gte": 0}}},
            {"$group": {"_id": None, "n": {"$sum": 1}}}]
    aggregate(src, pipe, incremental=True, spark=spark).subscribe(seen.append)
    src.next({"g": "a", "v": 1})
    src.next({"g": "a", "v": -1})  # same result -> suppressed
    src.next({"g": "a", "v": 2})
    assert len(seen) == 2


def test_streaming_aggregate_sliding_cap(spark):
    src = Subject()
    seen = []
    streaming_aggregate(src, GROUP_SUM, batch_size=2, spark=spark).subscribe(seen.append)
    for v in (1, 2, 4):
        src.next({"g": "a", "v": v})
    # cap=2 keeps the LAST two docs: 2 + 4
    assert _ids(seen[-1]) == [("a", 6)]


def test_aggregate_collections_and_reactive(spark):
    src = Subject()
    seen = []
    aggregate_collections(src, GROUP_SUM, spark=spark).subscribe(seen.append)
    src.next([{"g": "a", "v": 1}, {"g": "b", "v": 2}])
    assert _ids(seen[0]) == [("a", 1), ("b", 2)]

    src2 = Subject()
    seen2 = []
    reactive_aggregation(src2, GROUP_SUM, spark=spark).subscribe(seen2.append)
    src2.next([{"g": "a", "v": 1}])
    src2.next([{"g": "a", "v": 1}])  # unchanged -> suppressed
    assert len(seen2) == 1


def test_unsubscribe_stops_emissions(spark):
    src = Subject()
    seen = []
    off = aggregate(src, GROUP_SUM, spark=spark).subscribe(seen.append)
    src.next({"g": "a", "v": 1})
    off()
    src.next({"g": "a", "v": 2})
    assert len(seen) == 1


def test_unsubscribe_tears_down_source_subscription(spark):
    # last unsubscribe releases the source subscription entirely — no
    # transform (= no Spark job) runs for later emissions
    src = Subject()
    seen = []
    obs = aggregate(src, GROUP_SUM, spark=spark)
    off = obs.subscribe(seen.append)
    src.next({"g": "a", "v": 1})
    off()
    assert not src._subs  # upstream released, not just the downstream cb
    # resubscribing re-attaches
    obs.subscribe(seen.append)
    src.next({"g": "b", "v": 2})
    assert len(seen) == 2 and _ids(seen[-1]) == [("b", 2)]


def test_observe_dispose_detaches_update_callback(spark):
    from aggo_spark.engine import create_streaming_collection

    coll = create_streaming_collection(
        spark, "g string, v long", initial_data=[{"g": "a", "v": 1}]
    )
    try:
        obs = observe(coll, GROUP_SUM, rid="obs-dispose")
        seen = []
        obs.subscribe(seen.append)
        obs.dispose()
        coll.add({"g": "b", "v": 5})
        coll.flush()
        assert len(seen) == 1  # only the on-subscribe snapshot
        assert not coll._registered["obs-dispose"].on_update
    finally:
        coll.stop()


def test_observe_streaming_collection(spark, tmp_path):
    from aggo_spark.engine import create_streaming_collection

    coll = create_streaming_collection(
        spark, "g string, v long", initial_data=[{"g": "a", "v": 1}]
    )
    try:
        obs = observe(coll, GROUP_SUM)
        seen = []
        obs.subscribe(seen.append)
        assert _ids(seen[0]) == [("a", 1)]  # current result on subscribe
        coll.add({"g": "b", "v": 5})
        coll.flush()
        assert _ids(seen[-1]) == [("a", 1), ("b", 5)]
    finally:
        coll.stop()


# ---------------------------------------------------------------------------
# nlq
# ---------------------------------------------------------------------------

DOCS = [
    {"name": "Alice", "age": 30, "department": "Engineering"},
    {"name": "Bob", "age": 25, "department": "Marketing"},
    {"name": "Carol", "age": 35, "department": "Engineering"},
]


def test_ai_query_end_to_end(spark):
    res = ai_query(DOCS, "average age by department",
                   client=RuleBasedClient(), spark=spark)
    assert res["pipeline"][0] == {
        "$group": {"_id": "$department", "avg": {"$avg": "$age"}}}
    by = {r["_id"]: r["avg"] for r in res["results"]}
    assert by == {"Engineering": 32.5, "Marketing": 25.0}
    assert res["schema"]["age"] == "integer" and "total_ms" in res["performance"]


def test_ai_query_on_dataframe_uses_catalyst_schema(spark):
    df = spark.createDataFrame(DOCS)
    res = ai_query(df, "count by department", client=RuleBasedClient(), spark=spark)
    assert {r["_id"]: r["count"] for r in res["results"]} == {
        "Engineering": 2, "Marketing": 1}
    assert res["schema"]["age"] == "integer"


def test_parse_response_tolerates_fences_and_prose():
    raw = 'Sure! Here is the pipeline:\n```json\n{"pipeline": [{"$limit": 2}], "explanation": "e"}\n```\nEnjoy.'
    pipe, expl = parse_response(raw)
    assert pipe == [{"$limit": 2}] and expl == "e"
    pipe2, _ = parse_response('{"pipeline": []} trailing garbage')
    assert pipe2 == []


def test_parse_response_skips_prose_braces():
    # a brace in prose before the real object must not derail parsing
    raw = 'Given {N} docs, the object {"pipeline": ...} looks like:\n{"pipeline": [{"$limit": 3}]}'
    pipe, _ = parse_response(raw)
    assert pipe == [{"$limit": 3}]
    with pytest.raises(PipelineGenerationError):
        parse_response("no json here { at all")


def test_validate_pipeline_rejects_unknown_stage():
    with pytest.raises(PipelineGenerationError, match="unknown stage"):
        validate_pipeline([{"$frobnicate": 1}])
    with pytest.raises(PipelineGenerationError, match="exactly one"):
        validate_pipeline([{"$match": {}, "$limit": 1}])
    validate_pipeline([{"$match": {"a": 1}}, {"$group": {"_id": None}}])


def test_rule_based_client_refuses_unknown_pattern():
    prompt = build_prompt("summon the data spirits", {}, [])
    with pytest.raises(PipelineGenerationError, match="no pattern"):
        RuleBasedClient()("sys", prompt)


def test_top_n_pattern(spark):
    res = ai_query(DOCS, "top 2 by age", client=RuleBasedClient(), spark=spark)
    assert [r["name"] for r in res["results"]] == ["Carol", "Alice"]
