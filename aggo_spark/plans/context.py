"""Compilation context: schema-aware field resolution and light type inference.

The reference engine is schemaless — a missing field silently evaluates to
``undefined`` (reference ``src/aggo/expressions.ts:129-134``). Spark errors on
unknown columns, so the compiler resolves every field path against the current
DataFrame schema and substitutes ``lit(None)`` for paths that cannot resolve.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field, replace

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Sentinel returned for `$$REMOVE` — stages interpret it as "omit this field".
REMOVE = object()


def _walk_schema(schema: T.DataType | None, segments: list[str]) -> tuple[bool, T.DataType | None]:
    """Walk ``segments`` down ``schema``; return (found, leaf_type).

    Paths through ``ArrayType(StructType)`` follow MongoDB's broadcast
    semantics (``a.b`` over an array of structs yields the array of ``b``).
    """
    dt = schema
    wrapped_in_array = False
    for seg in segments:
        if isinstance(dt, T.ArrayType):
            dt = dt.elementType
            wrapped_in_array = True
        if isinstance(dt, T.StructType):
            if seg not in dt.fieldNames():
                return False, None
            dt = dt[seg].dataType
        elif isinstance(dt, T.MapType):
            dt = dt.valueType
        else:
            return False, None
    if wrapped_in_array and dt is not None:
        dt = T.ArrayType(dt)
    return True, dt


@dataclass
class ExprContext:
    """Holds the current schema plus lambda/let variable bindings.

    ``variables`` maps bare variable names (``this``, ``value``, user ``let``
    names) to Columns; ``variable_types`` optionally records their Spark types
    for type-directed translation (dates, struct merges).
    """

    schema: T.StructType | None = None
    variables: dict[str, Column] = field(default_factory=dict)
    variable_types: dict[str, T.DataType] = field(default_factory=dict)
    # Optional override for what `$$ROOT` / bare paths resolve against
    # (used by $elemMatch / sub-document matching).
    root_column: Column | None = None

    def with_vars(self, new_vars: dict[str, Column], new_types: dict[str, T.DataType] | None = None) -> "ExprContext":
        merged = dict(self.variables)
        merged.update(new_vars)
        mt = dict(self.variable_types)
        if new_types:
            mt.update(new_types)
        return replace(self, variables=merged, variable_types=mt)

    def with_root(self, root: Column, root_type: T.DataType | None = None) -> "ExprContext":
        ctx = replace(self, root_column=root)
        ctx._root_type = root_type  # type: ignore[attr-defined]
        return ctx

    # -- field paths ------------------------------------------------------

    def resolve_path(self, path: str) -> Column:
        """Resolve dotted field path ``a.b.c`` → Column; missing → lit(None)."""
        segments = path.split(".")
        if self.root_column is not None:
            rt = getattr(self, "_root_type", None)
            if rt is not None:
                found, _ = _walk_schema(rt, segments)
                if not found:
                    return F.lit(None)
            col = self.root_column
            for seg in segments:
                col = col.getField(seg)
            return col
        if self.schema is not None:
            found, _ = _walk_schema(self.schema, segments)
            if not found:
                return F.lit(None)
        col = F.col(f"`{segments[0]}`")
        for seg in segments[1:]:
            col = col.getField(seg)
        return col

    def path_type(self, path: str) -> T.DataType | None:
        segments = path.split(".")
        if self.root_column is not None:
            rt = getattr(self, "_root_type", None)
            if rt is None:
                return None
            found, dt = _walk_schema(rt, segments)
            return dt if found else None
        if self.schema is None:
            return None
        found, dt = _walk_schema(self.schema, segments)
        return dt if found else None

    def root(self) -> Column:
        if self.root_column is not None:
            return self.root_column
        if self.schema is None:
            raise ValueError("$$ROOT requires a known schema")
        return F.struct(*[F.col(f"`{n}`") for n in self.schema.fieldNames()])

    # -- light type inference --------------------------------------------

    def infer_type(self, expr: object) -> T.DataType | None:
        """Best-effort static type of an expression; None when unknown.

        Used only for type-directed choices (Date arithmetic, struct merge,
        $size on string-vs-array) — never required for correctness of the
        common numeric/string paths.
        """
        if isinstance(expr, bool):
            return T.BooleanType()
        if isinstance(expr, int):
            return T.LongType()
        if isinstance(expr, float):
            return T.DoubleType()
        if isinstance(expr, _dt.datetime):
            return T.TimestampType()
        if expr is None:
            return T.NullType()
        if isinstance(expr, str):
            if expr.startswith("$$"):
                name = expr[2:].split(".")[0]
                if name in ("ROOT", "CURRENT"):
                    base = getattr(self, "_root_type", None) or self.schema
                    rest = expr[2:].split(".")[1:]
                    if base is None:
                        return None
                    if not rest:
                        return base
                    found, dt = _walk_schema(base, rest)
                    return dt if found else None
                if name == "NOW":
                    return T.TimestampType()
                return self.variable_types.get(name)
            if expr.startswith("$"):
                return self.path_type(expr[1:])
            return T.StringType()
        if isinstance(expr, dict) and len(expr) == 1:
            op = next(iter(expr))
            if op in _KNOWN_RETURN_TYPES:
                return _KNOWN_RETURN_TYPES[op]
            if op == "$literal":
                return self.infer_type(expr[op]) if not isinstance(expr[op], dict) else None
            if op in ("$add", "$subtract"):
                args = expr[op]
                if isinstance(args, list):
                    ts = [self.infer_type(a) for a in args]
                    if any(isinstance(t, (T.TimestampType, T.DateType)) for t in ts):
                        if op == "$add" or not isinstance(ts[-1] if len(ts) > 1 else None, (T.TimestampType, T.DateType)):
                            return T.TimestampType()
                        return T.LongType()
                    return T.DoubleType()
            if op in ("$cond", "$ifNull", "$coalesce"):
                args = expr[op]
                if isinstance(args, list) and args:
                    return self.infer_type(args[1] if op == "$cond" and len(args) > 1 else args[0])
        return None


_KNOWN_RETURN_TYPES: dict[str, T.DataType] = {
    "$concat": T.StringType(),
    "$toString": T.StringType(),
    "$substr": T.StringType(),
    "$toLower": T.StringType(),
    "$toUpper": T.StringType(),
    "$trim": T.StringType(),
    "$ltrim": T.StringType(),
    "$rtrim": T.StringType(),
    "$strLen": T.LongType(),
    "$strLenCP": T.LongType(),
    "$size": T.IntegerType(),
    "$year": T.IntegerType(),
    "$month": T.IntegerType(),
    "$dayOfMonth": T.IntegerType(),
    "$dayOfWeek": T.IntegerType(),
    "$dayOfYear": T.IntegerType(),
    "$week": T.IntegerType(),
    "$hour": T.IntegerType(),
    "$minute": T.IntegerType(),
    "$second": T.IntegerType(),
    "$millisecond": T.IntegerType(),
    "$cmp": T.IntegerType(),
    "$eq": T.BooleanType(),
    "$ne": T.BooleanType(),
    "$gt": T.BooleanType(),
    "$gte": T.BooleanType(),
    "$lt": T.BooleanType(),
    "$lte": T.BooleanType(),
    "$and": T.BooleanType(),
    "$or": T.BooleanType(),
    "$not": T.BooleanType(),
    "$in": T.BooleanType(),
    "$isNumber": T.BooleanType(),
    "$isArray": T.BooleanType(),
    "$setIsSubset": T.BooleanType(),
    "$anyElementTrue": T.BooleanType(),
    "$allElementsTrue": T.BooleanType(),
    "$setEquals": T.BooleanType(),
    "$multiply": T.DoubleType(),
    "$divide": T.DoubleType(),
    "$abs": T.DoubleType(),
    "$sqrt": T.DoubleType(),
    "$pow": T.DoubleType(),
}
