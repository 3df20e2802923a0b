"""Schema inference — the reference's ``packages/ai`` non-LLM surface
(``/root/reference/packages/ai/src/schema-inference.ts:24-243``).

Two forms:

- :func:`infer_schema` over in-memory documents mirrors the reference:
  bounded evenly-spaced sample, per-path type collection, consolidation
  (numeric merge, ``array<T>``/``array<mixed>``, ``union<a|b>``), nested
  objects to ``max_depth``.
- :func:`simplified_schema` over a DataFrame derives the same shape from
  ``df.schema`` — at scale the type evidence is already in the Catalyst
  schema (Spark's JSON/Parquet readers did the distributed inference), so
  there is nothing to re-sample.

``infer_schema(df)`` accepts either, so callers can hand over whatever
they have.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["infer_schema", "simplified_schema", "sample_documents"]


def sample_documents(documents: list, count: int = 3) -> list:
    """Evenly-spaced representative sample (reference ``sampleDocuments`` /
    ``getSampleDocuments``: spread over the collection, not the head)."""
    n = len(documents)
    if n <= count:
        return list(documents)
    step = n / count
    return [documents[min(int(i * step), n - 1)] for i in range(count)]


def _value_type(value, depth: int, max_depth: int) -> str | dict:
    if value is None:
        return "null"
    if isinstance(value, bool):
        return "boolean"
    if isinstance(value, int):
        return "integer"
    if isinstance(value, float):
        return "integer" if value.is_integer() else "number"
    if isinstance(value, str):
        return "string"
    if isinstance(value, (list, tuple)):
        if not value:
            return "array"
        elem = {t for t in (_scalar_name(v) for v in value)}
        return f"array<{next(iter(elem))}>" if len(elem) == 1 else "array<mixed>"
    if isinstance(value, dict):
        return "object"
    return type(value).__name__


def _scalar_name(v) -> str:
    t = _value_type(v, 0, 0)
    return t if isinstance(t, str) else "object"


def _collect(doc: dict, out: dict[str, set], prefix: str, depth: int, max_depth: int):
    for k, v in doc.items():
        path = f"{prefix}{k}"
        if isinstance(v, dict) and depth < max_depth:
            _collect(v, out, f"{path}.", depth + 1, max_depth)
        else:
            out.setdefault(path, set()).add(_value_type(v, depth, max_depth))


def _consolidate(types: set[str]) -> str:
    real = sorted(t for t in types if t not in ("null", "undefined"))
    if not real:
        return "unknown"
    if len(real) == 1:
        return real[0]
    if all(t in ("integer", "number") for t in real):
        return "number"
    if any(t.startswith("array") for t in real):
        return "array"
    return f"union<{'|'.join(real)}>"


def _set_nested(schema: dict, path: str, value: str) -> None:
    parts = path.split(".")
    cur = schema
    for p in parts[:-1]:
        nxt = cur.get(p)
        if not isinstance(nxt, dict):
            nxt = cur[p] = {}
        cur = nxt
    cur.setdefault(parts[-1], value)


def infer_schema(documents, sample_size: int = 100, max_depth: int = 5) -> dict:
    """Simplified schema (``{field: type | nested}``) from documents or a
    DataFrame (reference ``inferSchema``, schema-inference.ts:24-55)."""
    if isinstance(documents, DataFrame):
        return simplified_schema(documents.schema, max_depth)
    if not documents:
        return {}
    field_types: dict[str, set] = {}
    for doc in sample_documents(documents, sample_size):
        if isinstance(doc, dict):
            _collect(doc, field_types, "", 0, max_depth)
    schema: dict = {}
    for path, types in field_types.items():
        _set_nested(schema, path, _consolidate(types))
    return schema


_SPARK_SCALARS = {
    T.StringType: "string",
    T.BooleanType: "boolean",
    T.ByteType: "integer",
    T.ShortType: "integer",
    T.IntegerType: "integer",
    T.LongType: "integer",
    T.FloatType: "number",
    T.DoubleType: "number",
    T.DateType: "date",
    T.TimestampType: "date",
    T.TimestampNTZType: "date",
    T.BinaryType: "binary",
}


def _spark_type(dt: T.DataType, depth: int, max_depth: int) -> str | dict:
    for cls, name in _SPARK_SCALARS.items():
        if isinstance(dt, cls):
            return name
    if isinstance(dt, T.DecimalType):
        return "number"
    if isinstance(dt, T.ArrayType):
        inner = _spark_type(dt.elementType, depth + 1, max_depth)
        return f"array<{inner}>" if isinstance(inner, str) else "array<object>"
    if isinstance(dt, T.StructType):
        if depth >= max_depth:
            return "object"
        return {f.name: _spark_type(f.dataType, depth + 1, max_depth) for f in dt.fields}
    if isinstance(dt, T.MapType):
        return "object"
    return "unknown"


def simplified_schema(schema: T.StructType, max_depth: int = 5) -> dict:
    """df.schema → the same simplified shape as :func:`infer_schema`."""
    out = _spark_type(schema, 0, max_depth)
    return out if isinstance(out, dict) else {}
