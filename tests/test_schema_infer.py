"""Schema inference (reference packages/ai/src/schema-inference.ts)."""

from __future__ import annotations

from aggo_spark import infer_schema, sample_documents, simplified_schema


def test_infer_scalar_types():
    docs = [
        {"name": "a", "age": 3, "score": 1.5, "ok": True, "x": None},
        {"name": "b", "age": 4, "score": 2.0, "ok": False, "x": 7},
    ]
    got = infer_schema(docs)
    # 2.0.is_integer() → integer on one doc, number on the other → number
    assert got == {"name": "string", "age": "integer", "score": "number",
                   "ok": "boolean", "x": "integer"}


def test_infer_arrays_and_unions():
    docs = [
        {"tags": ["a", "b"], "mixed": [1, "x"], "empty": [], "v": 1},
        {"tags": ["c"], "v": "one"},
    ]
    got = infer_schema(docs)
    assert got["tags"] == "array<string>"
    assert got["mixed"] == "array<mixed>"
    assert got["empty"] == "array"
    assert got["v"] == "union<integer|string>"


def test_infer_nested_and_depth():
    docs = [{"a": {"b": {"c": {"d": 1}}}}]
    assert infer_schema(docs) == {"a": {"b": {"c": {"d": "integer"}}}}
    assert infer_schema(docs, max_depth=2) == {"a": {"b": {"c": "object"}}}


def test_infer_empty_and_sampling():
    assert infer_schema([]) == {}
    docs = [{"i": n} for n in range(1000)]
    assert infer_schema(docs, sample_size=10) == {"i": "integer"}
    s = sample_documents(list(range(100)), 3)
    assert len(s) == 3 and s[0] == 0 and s[-1] >= 66  # spread, not head


def test_simplified_schema_from_dataframe(spark):
    df = spark.createDataFrame(
        [(1, "x", [1.0, 2.0], {"k": 5})],
        "id long, name string, vec array<double>, sub struct<k: long>",
    )
    got = infer_schema(df)
    assert got == {"id": "integer", "name": "string",
                   "vec": "array<number>", "sub": {"k": "integer"}}
    assert simplified_schema(df.schema) == got


def test_engine_output_schema_static(spark):
    from aggo_spark import Engine, load_tables

    eng = Engine(load_tables(spark, "/root/testdata/sf0.001"))
    got = eng.output_schema("orders", [
        {"$group": {"_id": "$o_orderstatus", "n": {"$sum": 1},
                    "rev": {"$sum": "$o_totalprice"}}},
    ])
    assert got == {"_id": "string", "n": "integer", "rev": "number"}
