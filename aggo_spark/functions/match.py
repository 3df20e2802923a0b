"""MongoDB query-predicate dialect ($match) → boolean Column compiler.

Reference semantics: ``matchDocument``, ``/root/reference/src/aggo/
aggregation.ts:133-325``. Compiled to a single boolean Column so Catalyst
pushes it into the scan (PushedFilters) wherever possible.

MongoDB-isms preserved where they matter at no cost to pushdown:
``$ne``/``$nin``/``$not`` match *missing* fields (null-inclusive), ``{f:
null}`` matches null-or-missing, arrays match on containment for implicit
equality. SQL-normative elsewhere (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..errors import InvalidPipeline, UnsupportedExpression
from ..plans.context import ExprContext
from .expressions import literal_to_column, translate_expr
from .regex_prefilter import regex_prefilter

__all__ = ["match_to_column"]

_FIELD_OPS = {
    "$eq", "$ne", "$gt", "$gte", "$lt", "$lte", "$in", "$nin", "$exists",
    "$regex", "$options", "$all", "$elemMatch", "$size", "$not", "$mod",
    "$type",
}

_LOGICAL = {"$and", "$or", "$nor", "$expr", "$text", "$comment", "$where"}


def match_to_column(query: dict, ctx: ExprContext) -> Column:
    """Translate a $match query document to one boolean Column."""
    if not isinstance(query, dict):
        raise InvalidPipeline("$match requires a query document")
    if not query:
        return F.lit(True)
    conds: list[Column] = []
    for key, value in query.items():
        if key == "$and":
            conds.append(_combine([match_to_column(q, ctx) for q in value], "and"))
        elif key == "$or":
            conds.append(_combine([match_to_column(q, ctx) for q in value], "or"))
        elif key == "$nor":
            # none may match; null sub-results count as non-match
            # (reference aggregation.ts:186-203)
            sub = [F.coalesce(match_to_column(q, ctx), F.lit(False)) for q in value]
            conds.append(~_combine(sub, "or"))
        elif key == "$expr":
            conds.append(translate_expr(value, ctx).cast("boolean"))
        elif key == "$sampleRate":
            # MongoDB 4.4.2: random per-document inclusion at the given rate
            conds.append(F.rand() < F.lit(float(value)))
        elif key == "$text":
            conds.append(_text_search(value, ctx))
        elif key == "$comment":
            continue
        elif key.startswith("$"):
            raise UnsupportedExpression(f"unsupported query operator {key}")
        else:
            conds.append(_field_condition(key, value, ctx))
    return _combine(conds, "and")


def _combine(cols: list[Column], how: str) -> Column:
    if not cols:
        return F.lit(True)
    out = cols[0]
    for c in cols[1:]:
        out = (out & c) if how == "and" else (out | c)
    return out


def _field_condition(path: str, cond: object, ctx: ExprContext) -> Column:
    col = ctx.resolve_path(path)
    ftype = ctx.path_type(path)
    if isinstance(cond, dict) and cond and all(k in _FIELD_OPS for k in cond):
        return _operator_condition(col, ftype, cond, ctx, path)
    # implicit equality (reference aggregation.ts:206-207)
    return _implicit_eq(col, ftype, cond)


def _implicit_eq(col: Column, ftype, value) -> Column:
    if value is None:
        return col.isNull()
    lit = literal_to_column(value)
    if isinstance(ftype, T.ArrayType) and not isinstance(value, list):
        # MongoDB: scalar query against array field matches on containment
        return F.array_contains(col, lit)
    return col.eqNullSafe(lit)


def _operator_condition(col, ftype, cond: dict, ctx, path: str) -> Column:
    parts: list[Column] = []
    regex_opts = cond.get("$options", "")
    for op, arg in cond.items():
        if op == "$options":
            continue
        parts.append(_one_op(col, ftype, op, arg, ctx, path, regex_opts))
    return _combine(parts, "and")


def _one_op(col, ftype, op, arg, ctx, path, regex_opts="") -> Column:
    if op == "$eq":
        return _implicit_eq(col, ftype, arg)
    if op == "$ne":
        # matches when value differs OR field missing/null (MongoDB)
        if (isinstance(ftype, T.ArrayType) and arg is not None
                and not isinstance(arg, list)):
            # array field: $ne means "does not contain" (negated containment)
            return F.coalesce(~F.array_contains(col, literal_to_column(arg)),
                              F.lit(True))
        return ~_implicit_eq(col, ftype, arg) if arg is None else F.coalesce(
            ~col.eqNullSafe(literal_to_column(arg)), F.lit(True)
        )
    if op in ("$gt", "$gte", "$lt", "$lte"):
        lit = literal_to_column(arg)
        if isinstance(ftype, T.ArrayType) and not isinstance(arg, list):
            # any-element match over an array field / dotted traversal
            # (MongoDB implicit array semantics)
            preds = {"$gt": lambda e: e > lit, "$gte": lambda e: e >= lit,
                     "$lt": lambda e: e < lit, "$lte": lambda e: e <= lit}
            return F.coalesce(F.exists(col, preds[op]), F.lit(False))
        return {"$gt": col > lit, "$gte": col >= lit, "$lt": col < lit, "$lte": col <= lit}[op]
    if op == "$in":
        if not isinstance(arg, list):
            raise InvalidPipeline("$in requires an array")
        non_null = [v for v in arg if v is not None]
        cond = col.isin(non_null) if non_null else F.lit(False)
        if None in arg:
            cond = cond | col.isNull()
        if isinstance(ftype, T.ArrayType):
            overlap = F.arrays_overlap(col, F.array(*[literal_to_column(v) for v in non_null]))
            cond = cond | overlap
        return cond
    if op == "$nin":
        return ~_one_op(col, ftype, "$in", arg, ctx, path) | col.isNull()
    if op == "$exists":
        present = ctx.path_type(path) is not None or ctx.schema is None
        if arg:
            return col.isNotNull() if present else F.lit(False)
        return col.isNull() if present else F.lit(True)
    if op == "$regex":
        pattern = arg
        flags = ""
        if "i" in regex_opts:
            flags += "i"
        if "m" in regex_opts:
            flags += "m"
        if "s" in regex_opts:
            flags += "s"
        if "x" in regex_opts:
            flags += "x"
        if flags:
            pattern = f"(?{flags}){pattern}"
        if isinstance(ftype, T.ArrayType):
            # any-element regex over an array of strings
            return F.coalesce(
                F.exists(col, lambda e: e.rlike(pattern)), F.lit(False))
        cond = col.rlike(pattern)
        # Scan-side trigram-style prefilter (reference regex-search.ts:99+ /
        # bloom-filter.ts): required literal substrings become contains()
        # conjuncts — necessary conditions, so semantics are unchanged, but
        # they push to the parquet scan as StringContains and short-circuit
        # codegen before the regex NFA runs (see functions/regex_prefilter).
        pre = regex_prefilter(col, str(arg), regex_opts)
        if pre is not None:
            cond = pre & cond
        return cond
    if op == "$all":
        if not isinstance(arg, list):
            raise InvalidPipeline("$all requires an array")
        return _combine([F.array_contains(col, literal_to_column(v)) for v in arg], "and")
    if op == "$elemMatch":
        return _elem_match(col, ftype, arg, ctx)
    if op == "$size":
        return F.size(col) == F.lit(arg)
    if op == "$not":
        inner = _operator_condition(col, ftype, arg, ctx, path)
        return F.coalesce(~inner, F.lit(True))
    if op == "$mod":
        divisor, remainder = arg
        return col % F.lit(divisor) == F.lit(remainder)
    if op == "$type":
        from .expressions import _TYPE_NAMES  # static schema-based check

        name = "missing" if ftype is None else _TYPE_NAMES.get(type(ftype), "object")
        wanted = arg if isinstance(arg, list) else [arg]
        return F.lit(name in wanted) & col.isNotNull()
    raise UnsupportedExpression(f"unsupported field operator {op}")


def _elem_match(col, ftype, sub: dict, ctx) -> Column:
    """$elemMatch — some array element satisfies the sub-query
    (reference aggregation.ts:305-313). Compiled to F.exists (HOF)."""
    elem_type = ftype.elementType if isinstance(ftype, T.ArrayType) else None

    def pred(e: Column) -> Column:
        if sub and all(k.startswith("$") for k in sub):
            # operator form: conditions on the element itself
            inner = _operator_condition(e, elem_type, sub, ctx, path="")
        else:
            # document form: conditions on element fields
            inner_ctx = ctx.with_root(e, elem_type)
            inner = match_to_column(sub, inner_ctx)
        return F.coalesce(inner, F.lit(False))

    return F.coalesce(F.exists(col, pred), F.lit(False))


def _text_search(spec, ctx: ExprContext) -> Column:
    """$text {$search: "..."} — tokenized full-text match over string columns.

    The reference builds a Bloom-prefiltered inverted index
    (``src/aggo/text-search.ts:87+``); correctness semantics are "document
    contains every search token, case-insensitive". We compile to token
    containment over the document's string columns — at scale the parquet
    scan + codegen'd `contains` is the right first strategy, with an inverted
    index table as an opt-in materialization.
    """
    # lazy import: operators package imports this module at init time
    from ..operators.search import query_tokens
    from ..operators.text import tokens as text_tokens

    if isinstance(spec, dict):
        search = spec.get("$search", "")
    else:
        search = str(spec)
    toks = query_tokens(str(search))
    if not toks:
        return F.lit(True)
    if ctx.schema is None:
        raise UnsupportedExpression("$text requires a known schema")
    string_cols = [f.name for f in ctx.schema.fields if isinstance(f.dataType, T.StringType)]
    if not string_cols:
        return F.lit(False)
    # Whole-token membership with the same normalization as the inverted
    # index (operators/search.py), so scan and index strategies agree —
    # substring `contains` would match "cat" against "catalog".
    blob = text_tokens(F.concat_ws(" ", *[F.col(f"`{c}`") for c in string_cols]))
    conds = [F.array_contains(blob, tok) for tok in toks]
    return _combine(conds, "and")
