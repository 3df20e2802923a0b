"""Docs-as-tests: the README's examples must run (reference strategy:
tests/documentation-examples.spec.js executes every README example)."""

from __future__ import annotations

from aggo_spark import Engine, StreamingCollection, load_tables


def test_readme_quickstart(spark):
    eng = Engine(load_tables(spark, "/root/testdata/sf0.001"))
    df = eng.aggregate("orders", [
        {"$match": {"o_orderstatus": "O"}},
        {"$group": {"_id": "$o_custkey", "revenue": {"$sum": "$o_totalprice"},
                    "n": {"$sum": 1}}},
        {"$sort": {"revenue": -1}}, {"$limit": 10},
    ])
    rows = df.collect()
    assert len(rows) == 10
    assert rows[0]["revenue"] >= rows[-1]["revenue"]
    plan = eng.explain("orders", [{"$match": {"o_orderstatus": "O"}}])
    assert "PushedFilters" in plan or "Filter" in plan


def test_readme_streaming(spark, tmp_path):
    coll = StreamingCollection(spark, "category string, price double",
                               workdir=str(tmp_path))
    try:
        rid = "by_cat"
        coll.stream([{"$group": {"_id": "$category", "n": {"$sum": 1},
                                 "avg": {"$avg": "$price"}}}], rid)
        coll.add({"category": "a", "price": 10.0})
        assert coll.result(rid) == [{"_id": "a", "n": 1, "avg": 10.0}]
        coll.remove({"category": "a", "price": 10.0})
        assert coll.result(rid) == []
    finally:
        coll.stop()


def test_readme_standalone_api(spark):
    from aggo_spark import benchmark, expression, load_tables, match

    df = load_tables(spark, "/root/testdata/sf0.001", ["orders"])["orders"]
    assert match(df, {"o_totalprice": {"$gte": 100.0}}).count() > 0
    v = expression({"a": 3, "b": 4}, {"$sqrt": {"$add": [
        {"$multiply": ["$a", "$a"]}, {"$multiply": ["$b", "$b"]}]}}, spark=spark)
    assert v == 5.0
    res = benchmark(df, [{"$group": {"_id": "$o_orderstatus", "n": {"$sum": 1}}}],
                    iterations=1, warmup_runs=0)
    assert res["avg_ms"] > 0


def test_explain_pipeline_mapping(spark):
    from aggo_spark import Engine, load_tables

    eng = Engine(load_tables(spark, "/root/testdata/sf0.001"))
    info = eng.explain_pipeline("orders", [
        {"$match": {"o_orderstatus": "O"}},
        {"$group": {"_id": "$o_custkey", "n": {"$sum": 1}}},
        {"$sort": {"n": -1}}, {"$limit": 5},
    ])
    assert [s["stage"] for s in info["stages"]] == ["$match", "$group", "$sort", "$limit"]
    assert "pushdown" in info["stages"][0]["spark"]
    assert "TakeOrderedAndProject" in info["optimized_plan"]
    assert "PushedFilters" in info["optimized_plan"]


def test_readme_training_ops_examples(spark):
    from aggo_spark import infer_schema, load_tables
    from aggo_spark.operators import dedup, temporal

    docs = load_tables(spark, "/root/testdata/sf0.001", ["documents"])["documents"]
    pairs = dedup.minhash_lsh_pairs(docs, k=3, unit="word")
    clusters = dedup.dedup_clusters(docs, pairs)
    assert set(clusters.columns) == {"doc_id", "component", "is_representative"}
    assert clusters.count() == docs.count()

    trades = spark.createDataFrame([("A", 10, 1.0)], "sym string, ts long, px double")
    quotes = spark.createDataFrame([("A", 9, 2.0)], "sym string, ts long, bid double")
    out = temporal.asof_join(trades, quotes, on="ts", by="sym")
    assert out.collect()[0]["bid_r"] == 2.0

    assert infer_schema([{"a": 1, "tags": ["x"]}]) == {
        "a": "integer", "tags": "array<string>"}
    assert infer_schema(docs)["doc_id"] == "integer"
