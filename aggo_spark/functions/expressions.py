"""MongoDB aggregation-expression dialect → pyspark.sql.Column compiler.

Covers the full operator surface of the reference engine
(``/root/reference/src/aggo/operators.ts:729-824`` registry, evaluator
``src/aggo/expressions.ts:101-127``) re-expressed as *pure Column
construction* — no Python UDFs anywhere, so every expression stays inside
Catalyst/whole-stage-codegen on the JVM.

Normative-semantics note (SURVEY.md §7.4): where the reference's JS semantics
deviate from SQL (truthiness, null-joining `$concat`, string-coerced mixed
compares) this compiler implements SQL/Spark semantics; deviations are listed
in COMPAT.md.
"""

from __future__ import annotations

import datetime as _dt
import re as _re

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..errors import InvalidPipeline, UnsupportedExpression
from ..plans.context import REMOVE, ExprContext

__all__ = ["translate_expr", "literal_to_column", "struct_comparator", "OPERATORS"]


def struct_comparator(keys: list):
    """Build an ``F.array_sort`` comparator over struct fields.

    ``keys`` is ``[(field_name, 1|-1), ...]`` in priority order. MongoDB sort
    semantics: nulls sort before everything ascending (reference
    ``src/aggo/aggregation.ts:366-407``); descending is the exact reversal.
    The comparator stays pure Column construction (codegen-able lambda).
    """

    def cmp(x: Column, y: Column) -> Column:
        result = F.lit(0)
        for name, d in reversed(keys):
            a, b = x[name], y[name]
            step = (
                F.when(a.isNull() & b.isNull(), F.lit(0))
                .when(a.isNull(), F.lit(-d))
                .when(b.isNull(), F.lit(d))
                .when(a < b, F.lit(-d))
                .when(a > b, F.lit(d))
                .otherwise(F.lit(0))
            )
            result = F.when(step != F.lit(0), step).otherwise(result)
        return result

    return cmp


# ---------------------------------------------------------------------------
# entry point
# ---------------------------------------------------------------------------

def translate_expr(expr: object, ctx: ExprContext) -> Column:
    """Translate one aggregation expression to a Column.

    Dispatch mirrors the reference evaluator
    (``src/aggo/expressions.ts:101-127``): system variable → field path →
    operator object → expression object → literal.
    """
    if isinstance(expr, Column):  # already translated (internal reuse)
        return expr
    if isinstance(expr, str):
        if expr.startswith("$$"):
            return _system_variable(expr, ctx)
        if expr.startswith("$"):
            return ctx.resolve_path(expr[1:])
        return F.lit(expr)
    if isinstance(expr, (bool, int, float, _dt.datetime, _dt.date)) or expr is None:
        return F.lit(expr)
    if isinstance(expr, list):
        return F.array(*[translate_expr(e, ctx) for e in expr])
    if isinstance(expr, dict):
        keys = list(expr)
        if len(keys) == 1 and keys[0].startswith("$"):
            op = keys[0]
            fn = OPERATORS.get(op)
            if fn is None:
                raise UnsupportedExpression(f"unsupported expression operator: {op}")
            return fn(expr[op], ctx)
        if any(k.startswith("$") for k in keys):
            raise InvalidPipeline(f"cannot mix operators and fields in expression object: {keys}")
        # expression object → struct (reference $expressionObject,
        # src/aggo/expressions.ts:252-403)
        return F.struct(*[translate_expr(v, ctx).alias(k) for k, v in expr.items()])
    raise UnsupportedExpression(f"cannot translate expression of type {type(expr)!r}")


def literal_to_column(value: object) -> Column:
    """$literal — value used verbatim, no operator interpretation
    (reference ``src/aggo/expressions.ts:475-477``)."""
    if isinstance(value, list):
        return F.array(*[literal_to_column(v) for v in value])
    if isinstance(value, dict):
        return F.struct(*[literal_to_column(v).alias(k) for k, v in value.items()])
    return F.lit(value)


def _system_variable(expr: str, ctx: ExprContext) -> Column:
    path = expr[2:]
    head, _, rest = path.partition(".")
    if head in ("ROOT", "CURRENT"):
        col = ctx.root()
    elif head == "NOW":
        col = F.current_timestamp()
    elif head == "REMOVE":
        return REMOVE  # type: ignore[return-value]
    elif head in ("KEEP", "PRUNE", "DESCEND"):
        # $redact control values (MongoDB 2.6); compared by the $redact stage
        return F.lit(f"__redact_{head}__")
    elif head in ctx.variables:
        col = ctx.variables[head]
    else:
        raise UnsupportedExpression(f"unknown system variable $${path}")
    for seg in rest.split(".") if rest else []:
        col = col.getField(seg)
    return col


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _args(spec, n=None, at_least=None):
    args = spec if isinstance(spec, list) else [spec]
    if n is not None and len(args) != n:
        raise InvalidPipeline(f"expected {n} args, got {len(args)}")
    if at_least is not None and len(args) < at_least:
        raise InvalidPipeline(f"expected >= {at_least} args, got {len(args)}")
    return args


def _tx(args, ctx):
    return [translate_expr(a, ctx) for a in args]


def _is_temporal(dt: T.DataType | None) -> bool:
    return isinstance(dt, (T.TimestampType, T.DateType, T.TimestampNTZType))


def _millis(col: Column) -> Column:
    """Epoch millis of a temporal column; unix_millis rejects TIMESTAMP_NTZ,
    so route through a TIMESTAMP cast (session-tz-relative, which cancels in
    Date−Date differences and Date±num round trips)."""
    return F.unix_millis(col.cast("timestamp"))


def _as_bool(col: Column) -> Column:
    return col.cast("boolean")


# ---------------------------------------------------------------------------
# boolean (reference operators.ts:59-69)
# ---------------------------------------------------------------------------

def _op_and(spec, ctx):
    cols = [_as_bool(c) for c in _tx(_args(spec, at_least=1), ctx)]
    out = cols[0]
    for c in cols[1:]:
        out = out & c
    return out


def _op_or(spec, ctx):
    cols = [_as_bool(c) for c in _tx(_args(spec, at_least=1), ctx)]
    out = cols[0]
    for c in cols[1:]:
        out = out | c
    return out


def _op_not(spec, ctx):
    (a,) = _tx(_args(spec, 1), ctx)
    # MongoDB $not: null/missing is falsy → $not yields true
    return ~F.coalesce(_as_bool(a), F.lit(False))


# ---------------------------------------------------------------------------
# comparison (reference operators.ts:128-205)
# ---------------------------------------------------------------------------

def _op_cmp(spec, ctx):
    a, b = _tx(_args(spec, 2), ctx)
    return (
        F.when(a.eqNullSafe(b), 0)
        .when(a.isNull(), -1)  # null sorts lowest (reference operators.ts:136-148)
        .when(b.isNull(), 1)
        .when(a < b, -1)
        .when(a > b, 1)
    )


def _cmp_factory(fn):
    def _op(spec, ctx):
        a, b = _tx(_args(spec, 2), ctx)
        return fn(a, b)

    return _op


# ---------------------------------------------------------------------------
# arithmetic (reference operators.ts:208-289, 717-720)
# ---------------------------------------------------------------------------

def _op_add(spec, ctx):
    args = _args(spec, at_least=1)
    types = [ctx.infer_type(a) for a in args]
    cols = _tx(args, ctx)
    if any(_is_temporal(t) for t in types):
        # Date + number(ms) → Date (reference operators.ts:208-228)
        millis = F.lit(0).cast("long")
        base = None
        for col, t in zip(cols, types):
            if _is_temporal(t) and base is None:
                base = col
            else:
                millis = millis + col.cast("long")
        return F.timestamp_millis(_millis(base) + millis)
    out = cols[0]
    for c in cols[1:]:
        out = out + c
    return out


def _op_subtract(spec, ctx):
    args = _args(spec, 2)
    ta, tb = (ctx.infer_type(a) for a in args)
    a, b = _tx(args, ctx)
    if _is_temporal(ta) and _is_temporal(tb):
        # Date − Date → milliseconds (reference operators.ts:230-245)
        return _millis(a) - _millis(b)
    if _is_temporal(ta):
        return F.timestamp_millis(_millis(a) - b.cast("long"))
    return a - b


def _op_multiply(spec, ctx):
    cols = _tx(_args(spec, at_least=1), ctx)
    out = cols[0]
    for c in cols[1:]:
        out = out * c
    return out


def _op_mod(spec, ctx):
    a, b = _tx(_args(spec, 2), ctx)
    return a % b  # JS % truncates toward zero == Spark % (operators.ts:259-261)


def _op_trunc(spec, ctx):
    (a,) = _tx(_args(spec, 1), ctx)
    # toward-zero truncation (reference operators.ts:717-720)
    return F.when(a >= 0, F.floor(a)).otherwise(F.ceil(a))


def _op_round(spec, ctx):
    args = _args(spec, at_least=1)
    col = translate_expr(args[0], ctx)
    place = args[1] if len(args) > 1 else 0
    if isinstance(place, int):
        return F.round(col, place)
    return F.round(col, translate_expr(place, ctx))


# ---------------------------------------------------------------------------
# string (reference operators.ts:292-377, 723-727)
# ---------------------------------------------------------------------------

def _op_concat(spec, ctx):
    return F.concat(*_tx(_args(spec, at_least=1), ctx))


def _op_substr(spec, ctx):
    s, start, length = _args(spec, 3)
    col = translate_expr(s, ctx)
    if isinstance(start, int) and isinstance(length, int):
        return F.substring(col, start + 1, length)
    return col.substr(translate_expr(start, ctx) + F.lit(1), translate_expr(length, ctx))


def _op_split(spec, ctx):
    s, delim = _args(spec, 2)
    col = translate_expr(s, ctx)
    if isinstance(delim, str):
        # JS String.split with a string delimiter is literal, Spark's is a
        # regex (reference operators.ts:316-323) → escape metacharacters.
        return F.split(col, _re.escape(delim), -1)
    return F.split(col, translate_expr(delim, ctx), F.lit(-1))


def _trim_factory(fn_name):
    def _op(spec, ctx):
        if isinstance(spec, dict):
            col = translate_expr(spec["input"], ctx)
            chars = spec.get("chars")
        else:
            col = translate_expr(spec, ctx)
            chars = None
        if chars is None:
            return getattr(F, fn_name)(col)
        c = translate_expr(chars, ctx) if not isinstance(chars, str) else F.lit(chars)
        if fn_name == "trim":
            return F.btrim(col, c)
        return getattr(F, fn_name)(col, c)

    return _op


def _op_to_string(spec, ctx):
    (a,) = _tx(_args(spec, 1), ctx)
    return a.cast("string")


# ---------------------------------------------------------------------------
# array (reference operators.ts:380-526, expressions.ts:200-237)
# ---------------------------------------------------------------------------

def _op_size(spec, ctx):
    args = _args(spec, 1)
    t = ctx.infer_type(args[0])
    (a,) = _tx(args, ctx)
    if isinstance(t, T.StringType):
        # reference $size also measures strings (operators.ts:380-386)
        return F.length(a)
    return F.size(a)


def _op_array_elem_at(spec, ctx):
    arr_e, idx = _args(spec, 2)
    arr = translate_expr(arr_e, ctx)
    if isinstance(idx, int):
        i = F.lit(idx + 1 if idx >= 0 else idx)
    else:
        ic = translate_expr(idx, ctx)
        i = F.when(ic >= 0, ic + 1).otherwise(ic)
    return F.try_element_at(arr, i.cast("int"))


def _lambda_var(spec, default="this"):
    return spec.get("as", default) if isinstance(spec, dict) else default


def _op_filter(spec, ctx):
    var = _lambda_var(spec)
    input_col = translate_expr(spec["input"], ctx)

    def pred(x):
        inner = ctx.with_vars({var: x})
        return _as_bool(translate_expr(spec["cond"], inner))

    return F.filter(input_col, pred)


def _op_map(spec, ctx):
    var = _lambda_var(spec)
    input_col = translate_expr(spec["input"], ctx)

    def fn(x):
        inner = ctx.with_vars({var: x})
        return translate_expr(spec["in"], inner)

    return F.transform(input_col, fn)


def _op_reduce(spec, ctx):
    # $reduce {input, initialValue, in} with $$value / $$this
    # (reference expressions.ts:200-237)
    input_col = translate_expr(spec["input"], ctx)
    init = translate_expr(spec["initialValue"], ctx)
    # Spark's `aggregate` requires init type == merge return type; widen
    # numeric literal inits to match the array's element type.
    iv = spec["initialValue"]
    if isinstance(iv, (int, float)) and not isinstance(iv, bool):
        t = ctx.infer_type(spec["input"])
        elem = t.elementType if isinstance(t, T.ArrayType) else None
        if isinstance(iv, float) or isinstance(elem, (T.DoubleType, T.FloatType)):
            init = init.cast("double")
        elif isinstance(elem, (T.LongType, T.IntegerType, T.ShortType)) or isinstance(iv, int):
            init = init.cast("long")

    def merge(acc, x):
        inner = ctx.with_vars({"value": acc, "this": x})
        return translate_expr(spec["in"], inner)

    return F.aggregate(input_col, init, merge)


def _op_slice(spec, ctx):
    args = _args(spec, at_least=2)
    arr = translate_expr(args[0], ctx)
    if len(args) == 2:
        n = args[1]
        if not isinstance(n, int):
            raise UnsupportedExpression("$slice with non-literal count")
        # [arr, n]: n>=0 → first n; n<0 → last |n| (operators.ts:449-477)
        return F.slice(arr, 1, n) if n >= 0 else F.slice(arr, n, -n)
    start, count = args[1], args[2]
    if not (isinstance(start, int) and isinstance(count, int)):
        raise UnsupportedExpression("$slice with non-literal bounds")
    if count < 0:
        raise InvalidPipeline("$slice count must be positive in 3-arg form")
    pos = start + 1 if start >= 0 else start
    return F.slice(arr, pos, count)


def _op_concat_arrays(spec, ctx):
    return F.concat(*_tx(_args(spec, at_least=1), ctx))


def _op_in(spec, ctx):
    v, arr = _tx(_args(spec, 2), ctx)
    return F.array_contains(arr, v)


def _op_index_of_array(spec, ctx):
    args = _args(spec, at_least=2)
    arr = translate_expr(args[0], ctx)
    val = translate_expr(args[1], ctx)
    start = args[2] if len(args) > 2 else 0
    end = args[3] if len(args) > 3 else None
    if start or end is not None:
        if not isinstance(start, int) or (end is not None and not isinstance(end, int)):
            raise UnsupportedExpression("$indexOfArray with non-literal bounds")
        length = (end - start) if end is not None else F.size(arr)
        window = F.slice(arr, start + 1, length if isinstance(length, int) else length)
        pos = F.array_position(window, val)
        return F.when(arr.isNull(), F.lit(None)).when(pos > 0, pos + start - 1).otherwise(F.lit(-1))
    pos = F.array_position(arr, val)
    return F.when(arr.isNull(), F.lit(None)).otherwise(pos - 1)


def _array_numeric_only(col: Column) -> Column:
    return F.filter(col, lambda x: x.isNotNull())


def _op_array_sum(spec, ctx):
    args = spec if isinstance(spec, list) else [spec]
    if len(args) == 1:
        t = ctx.infer_type(args[0])
        col = translate_expr(args[0], ctx)
        if isinstance(t, T.ArrayType) or t is None:
            # $sum over an array expression (operators.ts:529-574)
            return F.aggregate(
                F.coalesce(_array_numeric_only(col), F.array()),
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double"),
            )
        return col
    out = None
    for c in _tx(args, ctx):
        out = c if out is None else out + c
    return out


def _op_array_avg(spec, ctx):
    args = spec if isinstance(spec, list) else [spec]
    if len(args) == 1:
        col = _array_numeric_only(translate_expr(args[0], ctx))
        total = F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x.cast("double"))
        n = F.size(col)
        return F.when(n > 0, total / n)
    cols = _tx(args, ctx)
    s = cols[0]
    for c in cols[1:]:
        s = s + c
    return s / F.lit(len(cols))


def _op_array_min(spec, ctx):
    (a,) = _tx(_args(spec, 1), ctx)
    return F.array_min(a)


def _op_array_max(spec, ctx):
    (a,) = _tx(_args(spec, 1), ctx)
    return F.array_max(a)


def _op_reverse_array(spec, ctx):
    (a,) = _tx(_args(spec, 1), ctx)
    return F.reverse(a)


def _op_range(spec, ctx):
    args = _args(spec, at_least=2)
    cols = _tx(args, ctx)
    start, end = cols[0].cast("long"), cols[1].cast("long")
    step = cols[2].cast("long") if len(cols) > 2 else F.lit(1).cast("long")
    # MongoDB $range is end-exclusive; F.sequence is inclusive.
    out = F.sequence(start, end - F.signum(step.cast("double")).cast("long"), step)
    return F.when((end - start) * step > 0, out).otherwise(F.array().cast("array<long>"))


# ---------------------------------------------------------------------------
# set (reference operators.ts:72-125)
# ---------------------------------------------------------------------------

def _op_set_equals(spec, ctx):
    a, b = _tx(_args(spec, 2), ctx)
    da, db = F.array_distinct(a), F.array_distinct(b)
    return (F.size(F.array_except(da, db)) == 0) & (F.size(F.array_except(db, da)) == 0)


def _op_set_is_subset(spec, ctx):
    a, b = _tx(_args(spec, 2), ctx)
    return F.size(F.array_except(F.array_distinct(a), b)) == 0


def _op_any_element_true(spec, ctx):
    (a,) = _tx(_args(spec, 1), ctx)
    return F.exists(a, lambda x: _as_bool(x))


def _op_all_elements_true(spec, ctx):
    (a,) = _tx(_args(spec, 1), ctx)
    return F.forall(a, lambda x: _as_bool(x))


# ---------------------------------------------------------------------------
# date (reference operators.ts:577-642) — all UTC-normative (SURVEY §2.6)
# ---------------------------------------------------------------------------

def _date_factory(fn):
    def _op(spec, ctx):
        (a,) = _tx(_args(spec, 1), ctx)
        return fn(a)

    return _op


def _op_millisecond(spec, ctx):
    (a,) = _tx(_args(spec, 1), ctx)
    return (_millis(a) % 1000).cast("int")


# ---------------------------------------------------------------------------
# conditional (reference operators.ts:645-670, expressions.ts:152-198)
# ---------------------------------------------------------------------------

def _op_cond(spec, ctx):
    if isinstance(spec, dict):
        if_, then, else_ = spec["if"], spec["then"], spec["else"]
    else:
        if_, then, else_ = _args(spec, 3)
    c = _as_bool(translate_expr(if_, ctx))
    return F.when(c, translate_expr(then, ctx)).otherwise(translate_expr(else_, ctx))


def _op_if_null(spec, ctx):
    return F.coalesce(*_tx(_args(spec, at_least=2), ctx))


def _op_switch(spec, ctx):
    branches = spec.get("branches", [])
    if not branches:
        raise InvalidPipeline("$switch requires branches")
    out = None
    for br in branches:
        c = _as_bool(translate_expr(br["case"], ctx))
        v = translate_expr(br["then"], ctx)
        out = F.when(c, v) if out is None else out.when(c, v)
    if "default" in spec:
        out = out.otherwise(translate_expr(spec["default"], ctx))
    return out


# ---------------------------------------------------------------------------
# type (reference operators.ts:673-696)
# ---------------------------------------------------------------------------

_TYPE_NAMES = {
    T.StringType: "string",
    T.BooleanType: "bool",
    T.LongType: "long",
    T.IntegerType: "int",
    T.ShortType: "int",
    T.DoubleType: "double",
    T.FloatType: "double",
    T.TimestampType: "date",
    T.DateType: "date",
    T.ArrayType: "array",
    T.StructType: "object",
    T.MapType: "object",
    T.NullType: "null",
    T.BinaryType: "binData",
}


def _op_type(spec, ctx):
    args = _args(spec, 1)
    t = ctx.infer_type(args[0])
    col = translate_expr(args[0], ctx)
    name = "missing" if t is None else _TYPE_NAMES.get(type(t), "object")
    if t is None:
        return F.lit("missing")
    return F.when(col.isNull(), F.lit("null")).otherwise(F.lit(name))


def _op_is_number(spec, ctx):
    args = _args(spec, 1)
    t = ctx.infer_type(args[0])
    col = translate_expr(args[0], ctx)
    is_num = isinstance(t, (T.LongType, T.IntegerType, T.DoubleType, T.FloatType, T.ShortType, T.DecimalType))
    return col.isNotNull() & F.lit(is_num)


def _op_is_array(spec, ctx):
    args = _args(spec, 1)
    t = ctx.infer_type(args[0])
    col = translate_expr(args[0], ctx)
    return col.isNotNull() & F.lit(isinstance(t, T.ArrayType))


def _op_sort_array(spec, ctx):
    """MongoDB 5.2 $sortArray: scalar sortBy 1/-1 or per-field {f: 1|-1, ...}
    (mixed directions) over arrays of documents."""
    if not isinstance(spec, dict) or "input" not in spec:
        raise InvalidPipeline("$sortArray requires {input, sortBy}")
    arr = translate_expr(spec["input"], ctx)
    sort_by = spec.get("sortBy", 1)
    if isinstance(sort_by, dict):
        keys = [(k, 1 if v in (1, True) else -1) for k, v in sort_by.items()]
        return F.array_sort(arr, struct_comparator(keys))
    # MongoDB null ordering: nulls first ascending, last descending —
    # F.sort_array matches exactly; array_sort/reverse(array_sort) would
    # invert it and disagree with struct_comparator's per-field form.
    if sort_by in (1, True):
        return F.sort_array(arr, asc=True)
    return F.sort_array(arr, asc=False)


# ---------------------------------------------------------------------------
# object (reference operators.ts:699-714)
# ---------------------------------------------------------------------------

def _op_merge_objects(spec, ctx):
    args = _args(spec, at_least=1)
    # Collect (name, column) in order; later keys override earlier ones
    # (reference operators.ts:699-714).
    fields: dict[str, Column] = {}
    for a in args:
        if isinstance(a, dict) and not any(k.startswith("$") for k in a):
            for k, v in a.items():
                fields[k] = translate_expr(v, ctx)
            continue
        t = ctx.infer_type(a)
        if isinstance(t, T.StructType):
            col = translate_expr(a, ctx)
            for f in t.fieldNames():
                fields[f] = col.getField(f)
            continue
        raise UnsupportedExpression(
            "$mergeObjects args must be expression objects or struct-typed fields"
        )
    return F.struct(*[c.alias(k) for k, c in fields.items()])


# ---------------------------------------------------------------------------
# regex (MongoDB 4.2 $regexMatch/$regexFind/$regexFindAll — extensions; the
# reference only has the $regex *query* operator, aggregation.ts:272-298)
# ---------------------------------------------------------------------------

def _regex_args(spec, ctx):
    if not isinstance(spec, dict) or "input" not in spec or "regex" not in spec:
        raise InvalidPipeline("regex operators require {input, regex[, options]}")
    col = translate_expr(spec["input"], ctx)
    pattern = spec["regex"]
    if not isinstance(pattern, str):
        raise UnsupportedExpression("regex pattern must be a string literal")
    options = spec.get("options", "")
    if options:
        bad = set(options) - set("imsx")
        if bad:
            raise InvalidPipeline(f"unsupported regex options: {''.join(bad)}")
        pattern = f"(?{options}){pattern}"
    return col, pattern


def _op_regex_match(spec, ctx):
    col, pattern = _regex_args(spec, ctx)
    return col.rlike(pattern)


def _op_regex_find(spec, ctx):
    # Returns struct<match string, idx int> (idx 0-based), null when no
    # match; MongoDB also returns `captures` — deviation noted in COMPAT.md.
    col, pattern = _regex_args(spec, ctx)
    m = F.regexp_substr(col, F.lit(pattern))
    idx = (F.regexp_instr(col, F.lit(pattern)) - F.lit(1)).cast("int")
    return F.when(m.isNotNull(), F.struct(m.alias("match"), idx.alias("idx")))


def _op_regex_find_all(spec, ctx):
    col, pattern = _regex_args(spec, ctx)
    return F.regexp_extract_all(col, F.lit(pattern), 0)


# ---------------------------------------------------------------------------
# string search/replace (MongoDB 4.0/4.4 extensions)
# ---------------------------------------------------------------------------

def _op_replace_all(spec, ctx):
    if not isinstance(spec, dict):
        raise InvalidPipeline("$replaceAll requires {input, find, replacement}")
    col = translate_expr(spec["input"], ctx)
    return F.replace(col, translate_expr(spec["find"], ctx), translate_expr(spec["replacement"], ctx))


def _op_replace_one(spec, ctx):
    if not isinstance(spec, dict):
        raise InvalidPipeline("$replaceOne requires {input, find, replacement}")
    col = translate_expr(spec["input"], ctx)
    find = translate_expr(spec["find"], ctx)
    repl = translate_expr(spec["replacement"], ctx)
    pos = F.instr(col, find)
    return F.when(pos == 0, col).otherwise(
        F.concat(
            F.substr(col, F.lit(1), pos - F.lit(1)),
            repl,
            F.substr(col, pos + F.length(find), F.length(col)),
        )
    )


def _op_index_of_cp(spec, ctx):
    """$indexOfCP / $indexOfBytes [string, sub, start?, end?] → 0-based idx,
    -1 when absent (bytes≡codepoints deviation for non-ASCII: COMPAT.md)."""
    args = _args(spec, at_least=2)
    s = translate_expr(args[0], ctx)
    sub = translate_expr(args[1], ctx)
    start = translate_expr(args[2], ctx).cast("int") if len(args) > 2 else F.lit(0)
    if len(args) > 3:
        end = translate_expr(args[3], ctx).cast("int")
        window = F.substr(s, start + F.lit(1), F.greatest(end - start, F.lit(0)))
    else:
        window = F.substr(s, start + F.lit(1), F.length(s))
    hit = F.position(sub, window)  # 1-based within window, 0 = absent
    return F.when(hit == 0, F.lit(-1)).otherwise((hit - F.lit(1) + start).cast("int"))


# ---------------------------------------------------------------------------
# dynamic field access (MongoDB 5.0 $getField/$setField/$unsetField)
# ---------------------------------------------------------------------------

def _op_get_field(spec, ctx):
    # {field, input} or bare string — the bare form reads the *current
    # document* field literally (no dot-splitting, unlike `$a.b` paths)
    if isinstance(spec, str):
        field_name, inp = spec, None
    elif isinstance(spec, dict):
        field_name, inp = spec.get("field"), spec.get("input")
    else:
        raise InvalidPipeline("$getField requires a field name")
    if not isinstance(field_name, str):
        raise UnsupportedExpression("$getField field must be a string literal")
    if inp is None:
        if ctx.root_column is not None:
            return ctx.root_column.getField(field_name)
        return F.col(f"`{field_name}`")
    return translate_expr(inp, ctx).getField(field_name)


def _op_set_field(spec, ctx):
    if not isinstance(spec, dict) or "field" not in spec or "input" not in spec:
        raise InvalidPipeline("$setField requires {field, input, value}")
    inp = translate_expr(spec["input"], ctx)
    if spec.get("value") == "$$REMOVE":
        return inp.dropFields(f"`{spec['field']}`")
    return inp.withField(f"`{spec['field']}`", translate_expr(spec.get("value"), ctx))


def _op_unset_field(spec, ctx):
    if not isinstance(spec, dict) or "field" not in spec or "input" not in spec:
        raise InvalidPipeline("$unsetField requires {field, input}")
    return translate_expr(spec["input"], ctx).dropFields(f"`{spec['field']}`")


# ---------------------------------------------------------------------------
# object <-> array (MongoDB 3.4.4 $objectToArray/$arrayToObject, $zip)
# ---------------------------------------------------------------------------

def _op_object_to_array(spec, ctx):
    (arg,) = _args(spec, 1)
    t = ctx.infer_type(arg)
    col = translate_expr(arg, ctx)
    if isinstance(t, T.MapType):
        return F.transform(
            F.map_entries(col),
            lambda e: F.struct(e["key"].alias("k"), e["value"].alias("v")),
        )
    if isinstance(t, T.StructType):
        vals = [col.getField(f.name) for f in t.fields]
        # heterogeneous field types widen to string so the array is typeable
        if len({f.dataType.simpleString() for f in t.fields}) > 1:
            vals = [v.cast("string") for v in vals]
        return F.array(*[
            F.struct(F.lit(f.name).alias("k"), v.alias("v"))
            for f, v in zip(t.fields, vals)
        ])
    raise UnsupportedExpression("$objectToArray requires a struct- or map-typed expression")


def _op_array_to_object(spec, ctx):
    (arg,) = _args(spec, 1)
    col = translate_expr(arg, ctx)
    t = ctx.infer_type(arg)
    elem = t.elementType if isinstance(t, T.ArrayType) else None
    if isinstance(elem, T.ArrayType):  # [[k, v], ...] pair form
        entries = F.transform(
            col, lambda p: F.struct(
                F.element_at(p, 1).cast("string").alias("k"),
                F.element_at(p, 2).alias("v"),
            )
        )
    else:  # [{k, v}, ...] form
        entries = F.transform(col, lambda e: F.struct(e["k"].cast("string"), e["v"]))
    # result is MapType (Spark's dynamic-keyed document); COMPAT.md
    return F.map_from_entries(entries)


def _op_zip(spec, ctx):
    if not isinstance(spec, dict) or "inputs" not in spec:
        raise InvalidPipeline("$zip requires {inputs: [...]}")
    arrs = [translate_expr(a, ctx) for a in spec["inputs"]]
    longest = bool(spec.get("useLongestLength", False))
    defaults = spec.get("defaults")
    sizes = [F.size(a) for a in arrs]
    n = F.greatest(*sizes) if longest and len(arrs) > 1 else (
        F.least(*sizes) if len(arrs) > 1 else sizes[0])
    def elem(i, j, a):
        v = F.try_element_at(a, i)
        if longest and defaults is not None:
            v = F.coalesce(v, translate_expr(defaults[j], ctx))
        return v
    full = F.transform(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
        lambda i: F.array(*[elem(i, j, a) for j, a in enumerate(arrs)]),
    )
    null_in = arrs[0].isNull()
    for a in arrs[1:]:
        null_in = null_in | a.isNull()
    return F.when(~null_in, F.slice(full, 1, F.greatest(n, F.lit(0))))


# ---------------------------------------------------------------------------
# date arithmetic (MongoDB 5.0 $dateAdd/$dateSubtract/$dateDiff/$dateTrunc,
# 3.6 $dateToString/$dateFromString — extensions; README.md:120 advertises
# them but the reference never implemented them, SURVEY.md §2.6)
# ---------------------------------------------------------------------------

_DATE_UNITS = {
    "year": "YEAR", "quarter": "QUARTER", "month": "MONTH", "week": "WEEK",
    "day": "DAY", "hour": "HOUR", "minute": "MINUTE", "second": "SECOND",
    "millisecond": "MILLISECOND",
}


def _unit(spec) -> str:
    u = spec.get("unit")
    if u not in _DATE_UNITS:
        raise InvalidPipeline(f"unsupported date unit: {u!r}")
    return _DATE_UNITS[u]


def _op_date_add(spec, ctx, sign=1):
    if not isinstance(spec, dict) or "startDate" not in spec:
        raise InvalidPipeline("$dateAdd requires {startDate, unit, amount}")
    ts = translate_expr(spec["startDate"], ctx)
    amount = translate_expr(spec["amount"], ctx).cast("long") * F.lit(sign)
    return F.timestamp_add(_unit(spec), amount, ts)


def _op_date_diff(spec, ctx):
    """Boundary-crossing count (MongoDB semantics): truncate both endpoints
    to the unit, then count whole units between — not elapsed-time division."""
    if not isinstance(spec, dict) or "startDate" not in spec or "endDate" not in spec:
        raise InvalidPipeline("$dateDiff requires {startDate, endDate, unit}")
    u = _unit(spec)
    s = translate_expr(spec["startDate"], ctx)
    e = translate_expr(spec["endDate"], ctx)
    return F.timestamp_diff(u, F.date_trunc(u, s), F.date_trunc(u, e))


def _op_date_trunc(spec, ctx):
    if not isinstance(spec, dict) or "date" not in spec:
        raise InvalidPipeline("$dateTrunc requires {date, unit}")
    if spec.get("binSize", 1) != 1:
        raise UnsupportedExpression("$dateTrunc binSize != 1 not supported")
    return F.date_trunc(_unit(spec), translate_expr(spec["date"], ctx))


# Mongo strftime-style directive → Spark DateTimeFormatter pattern
_FMT_MAP = {
    "Y": "yyyy", "m": "MM", "d": "dd", "H": "HH", "M": "mm", "S": "ss",
    "L": "SSS", "j": "DDD", "%": "%",
}


def _mongo_format_to_java(fmt: str) -> str:
    out: list[str] = []
    lit_buf: list[str] = []
    def flush():
        if lit_buf:
            chunk = "".join(lit_buf).replace("'", "''")
            out.append(f"'{chunk}'")
            lit_buf.clear()
    i = 0
    while i < len(fmt):
        ch = fmt[i]
        if ch == "%":
            if i + 1 >= len(fmt):
                raise InvalidPipeline("trailing % in date format")
            d = fmt[i + 1]
            if d == "%":
                lit_buf.append("%")
            elif d in _FMT_MAP:
                flush()
                out.append(_FMT_MAP[d])
            else:
                raise UnsupportedExpression(f"unsupported date format directive %{d}")
            i += 2
        else:
            lit_buf.append(ch)
            i += 1
    flush()
    return "".join(out)


_DEFAULT_DATE_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"


def _op_date_to_string(spec, ctx):
    if not isinstance(spec, dict) or "date" not in spec:
        raise InvalidPipeline("$dateToString requires {date[, format, onNull]}")
    fmt = _mongo_format_to_java(spec["format"]) if "format" in spec else _DEFAULT_DATE_FMT
    out = F.date_format(translate_expr(spec["date"], ctx), fmt)
    if "onNull" in spec:
        return F.coalesce(out, translate_expr(spec["onNull"], ctx))
    return out


def _op_date_from_string(spec, ctx):
    if not isinstance(spec, dict) or "dateString" not in spec:
        raise InvalidPipeline("$dateFromString requires {dateString[, format, onError, onNull]}")
    col = translate_expr(spec["dateString"], ctx)
    if "format" in spec:
        parsed = F.try_to_timestamp(col, F.lit(_mongo_format_to_java(spec["format"])))
    else:
        parsed = col.try_cast("timestamp")
    if "onError" in spec:
        parsed = F.coalesce(parsed, translate_expr(spec["onError"], ctx))
    if "onNull" in spec:
        return F.when(col.isNull(), translate_expr(spec["onNull"], ctx)).otherwise(parsed)
    return parsed


def _iso_day_of_week(col: Column) -> Column:
    # dayofweek: 1=Sun..7=Sat → ISO 1=Mon..7=Sun
    return ((F.dayofweek(col) + F.lit(5)) % F.lit(7)) + F.lit(1)


def _op_iso_week_year(spec, ctx):
    # ISO week-year = calendar year of that week's Thursday
    (a,) = _tx(_args(spec, 1), ctx)
    thursday = F.date_add(a.cast("date"), F.lit(4) - _iso_day_of_week(a))
    return F.year(thursday)


def _op_date_from_parts(spec, ctx):
    """$dateFromParts — calendar form (year/month/...) and ISO week form
    (isoWeekYear/isoWeek/isoDayOfWeek). MongoDB 3.6."""
    if not isinstance(spec, dict):
        raise InvalidPipeline("$dateFromParts requires a document")
    if spec.get("timezone") not in (None, "UTC", "+00:00", "Z"):
        raise UnsupportedExpression("$dateFromParts: only UTC timezone supported")

    def part(name, default):
        return (translate_expr(spec[name], ctx).cast("int")
                if name in spec else F.lit(default))

    hour, minute = part("hour", 0), part("minute", 0)
    # seconds may carry a fraction; fold millisecond in as fractional seconds
    sec = (translate_expr(spec["second"], ctx).cast("double")
           if "second" in spec else F.lit(0.0))
    if "millisecond" in spec:
        sec = sec + translate_expr(spec["millisecond"], ctx).cast("double") / F.lit(1000.0)
    if "isoWeekYear" in spec:
        y = part("isoWeekYear", None)
        week = translate_expr(spec.get("isoWeek", 1), ctx).cast("int")
        dow = translate_expr(spec.get("isoDayOfWeek", 1), ctx).cast("int")
        # ISO week 1 contains Jan 4; Monday of week 1 anchors the grid
        jan4 = F.make_date(y, F.lit(1), F.lit(4))
        week1_monday = F.date_sub(jan4, _iso_day_of_week(jan4) - F.lit(1))
        day = F.date_add(week1_monday, (week - F.lit(1)) * F.lit(7) + dow - F.lit(1))
        base = F.make_timestamp_ntz(
            F.year(day), F.month(day), F.dayofmonth(day), hour, minute, sec)
        return base
    if "year" not in spec:
        raise InvalidPipeline("$dateFromParts requires year or isoWeekYear")
    return F.make_timestamp_ntz(
        part("year", None), part("month", 1), part("day", 1), hour, minute, sec)


def _op_date_to_parts(spec, ctx):
    """$dateToParts — struct of calendar (or iso8601) parts. MongoDB 3.6."""
    if not isinstance(spec, dict) or "date" not in spec:
        raise InvalidPipeline("$dateToParts requires {date[, iso8601]}")
    d = translate_expr(spec["date"], ctx)
    common = [
        F.hour(d).alias("hour"), F.minute(d).alias("minute"),
        F.second(d).alias("second"),
        (_millis(d) % F.lit(1000)).cast("int").alias("millisecond"),
    ]
    if spec.get("iso8601"):
        thursday = F.date_add(d.cast("date"), F.lit(4) - _iso_day_of_week(d))
        return F.struct(
            F.year(thursday).alias("isoWeekYear"),
            F.weekofyear(d).alias("isoWeek"),
            _iso_day_of_week(d).alias("isoDayOfWeek"), *common)
    return F.struct(
        F.year(d).alias("year"), F.month(d).alias("month"),
        F.dayofmonth(d).alias("day"), *common)


def _op_let(spec, ctx):
    """$let {vars, in} — bindings evaluated in the OUTER scope (MongoDB
    semantics: vars cannot see each other), then `in` under the new scope."""
    if not isinstance(spec, dict) or "in" not in spec:
        raise InvalidPipeline("$let requires {vars, in}")
    bound, types = {}, {}
    for name, vexpr in (spec.get("vars") or {}).items():
        bound[name] = translate_expr(vexpr, ctx)
        t = ctx.infer_type(vexpr)
        if t is not None:
            types[name] = t
    return translate_expr(spec["in"], ctx.with_vars(bound, types))


def _bit_factory(fold):
    def op(spec, ctx):
        cols = [c.cast("long") for c in _tx(_args(spec, at_least=1), ctx)]
        out = cols[0]
        for c in cols[1:]:
            out = fold(out, c)
        return out
    return op


def _op_first_n(spec, ctx, last=False):
    """$firstN/$lastN array expressions (MongoDB 5.2): leading/trailing n."""
    if not isinstance(spec, dict) or "n" not in spec or "input" not in spec:
        raise InvalidPipeline("requires {n, input}")
    arr = translate_expr(spec["input"], ctx)
    n = translate_expr(spec["n"], ctx).cast("int")
    if last:
        return F.slice(arr, F.greatest(F.size(arr) - n + F.lit(1), F.lit(1)), n)
    return F.slice(arr, F.lit(1), n)


def _op_min_n(spec, ctx, desc=False):
    if not isinstance(spec, dict) or "n" not in spec or "input" not in spec:
        raise InvalidPipeline("requires {n, input}")
    arr = translate_expr(spec["input"], ctx)
    # MongoDB $minN/$maxN ignore nulls in the input array
    arr = F.filter(arr, lambda x: x.isNotNull())
    arr = F.sort_array(arr, asc=not desc)
    return F.slice(arr, F.lit(1), translate_expr(spec["n"], ctx).cast("int"))


# ---------------------------------------------------------------------------
# $convert (MongoDB 4.0) — general checked conversion
# ---------------------------------------------------------------------------

_CONVERT_TYPES = {
    "double": "double", 1: "double",
    "string": "string", 2: "string",
    "bool": "boolean", 8: "boolean",
    "date": "timestamp", 9: "timestamp",
    "int": "int", 16: "int",
    "long": "long", 18: "long",
    "decimal": "decimal(38,10)", 19: "decimal(38,10)",
}


def _op_convert(spec, ctx):
    if not isinstance(spec, dict) or "input" not in spec or "to" not in spec:
        raise InvalidPipeline("$convert requires {input, to}")
    to = _CONVERT_TYPES.get(spec["to"])
    if to is None:
        raise UnsupportedExpression(f"$convert: unsupported target type {spec['to']!r}")
    col = translate_expr(spec["input"], ctx)
    out = col.try_cast(to)
    if "onError" in spec:
        out = F.when(
            col.isNotNull() & out.isNull(), translate_expr(spec["onError"], ctx)
        ).otherwise(out)
    if "onNull" in spec:
        out = F.when(col.isNull(), translate_expr(spec["onNull"], ctx)).otherwise(out)
    return out


# ---------------------------------------------------------------------------
# casts (extensions beyond the reference: $toInt/$toLong/$toDouble/...)
# ---------------------------------------------------------------------------

def _cast_factory(spark_type):
    def _op(spec, ctx):
        (a,) = _tx(_args(spec, 1), ctx)
        return a.cast(spark_type)

    return _op


# ---------------------------------------------------------------------------
# registry (mirrors EXPRESSION_OPERATORS, reference operators.ts:729-824)
# ---------------------------------------------------------------------------

OPERATORS: dict[str, object] = {
    # boolean
    "$and": _op_and,
    "$or": _op_or,
    "$not": _op_not,
    # comparison
    "$cmp": _op_cmp,
    "$eq": _cmp_factory(lambda a, b: a.eqNullSafe(b)),
    "$ne": _cmp_factory(lambda a, b: ~a.eqNullSafe(b)),
    "$gt": _cmp_factory(lambda a, b: a > b),
    "$gte": _cmp_factory(lambda a, b: a >= b),
    "$lt": _cmp_factory(lambda a, b: a < b),
    "$lte": _cmp_factory(lambda a, b: a <= b),
    # arithmetic
    "$add": _op_add,
    "$subtract": _op_subtract,
    "$multiply": _op_multiply,
    "$divide": _cmp_factory(lambda a, b: a / b),
    "$mod": _op_mod,
    "$abs": _date_factory(F.abs),
    "$ceil": _date_factory(F.ceil),
    "$floor": _date_factory(F.floor),
    "$sqrt": _date_factory(F.sqrt),
    "$exp": _date_factory(F.exp),
    "$ln": _date_factory(F.log),
    "$log10": _date_factory(F.log10),
    "$pow": _cmp_factory(lambda a, b: F.pow(a, b)),
    "$trunc": _op_trunc,
    "$round": _op_round,
    # string
    "$concat": _op_concat,
    "$substr": _op_substr,
    "$substrCP": _op_substr,
    "$toLower": _date_factory(F.lower),
    "$toUpper": _date_factory(F.upper),
    "$split": _op_split,
    "$strLen": _date_factory(F.length),
    "$strLenCP": _date_factory(F.length),
    "$strLenBytes": _date_factory(F.octet_length),
    "$trim": _trim_factory("trim"),
    "$ltrim": _trim_factory("ltrim"),
    "$rtrim": _trim_factory("rtrim"),
    "$toString": _op_to_string,
    # extension: serialize array/struct/map to canonical JSON text — the
    # portable way to emit complex values through hash-compared interfaces
    "$toJsonString": _date_factory(F.to_json),
    "$literal": lambda spec, ctx: literal_to_column(spec),
    # array
    "$size": _op_size,
    "$arrayElemAt": _op_array_elem_at,
    "$first": lambda spec, ctx: F.try_element_at(translate_expr(spec, ctx), F.lit(1)),
    "$last": lambda spec, ctx: F.try_element_at(translate_expr(spec, ctx), F.lit(-1)),
    "$filter": _op_filter,
    "$map": _op_map,
    "$reduce": _op_reduce,
    "$slice": _op_slice,
    "$concatArrays": _op_concat_arrays,
    "$in": _op_in,
    "$indexOfArray": _op_index_of_array,
    "$reverseArray": _op_reverse_array,
    "$range": _op_range,
    "$sum": _op_array_sum,
    "$avg": _op_array_avg,
    "$min": _op_array_min,
    "$max": _op_array_max,
    "$sortArray": _op_sort_array,
    "$arrayToSet": lambda spec, ctx: F.array_distinct(translate_expr(spec, ctx)),
    # set
    "$setEquals": _op_set_equals,
    "$setIntersection": lambda spec, ctx: F.array_intersect(*_tx(_args(spec, 2), ctx)),
    "$setUnion": lambda spec, ctx: F.array_union(*_tx(_args(spec, 2), ctx)),
    "$setDifference": lambda spec, ctx: F.array_except(*_tx(_args(spec, 2), ctx)),
    "$setIsSubset": _op_set_is_subset,
    "$anyElementTrue": _op_any_element_true,
    "$allElementsTrue": _op_all_elements_true,
    # date
    "$year": _date_factory(F.year),
    "$month": _date_factory(F.month),
    "$dayOfMonth": _date_factory(F.dayofmonth),
    "$dayOfWeek": _date_factory(F.dayofweek),  # 1=Sun..7=Sat, same convention
    "$dayOfYear": _date_factory(F.dayofyear),
    "$week": _date_factory(F.weekofyear),
    "$hour": _date_factory(F.hour),
    "$minute": _date_factory(F.minute),
    "$second": _date_factory(F.second),
    "$millisecond": _op_millisecond,
    # conditional
    "$cond": _op_cond,
    "$ifNull": _op_if_null,
    "$coalesce": _op_if_null,
    "$switch": _op_switch,
    # type
    "$type": _op_type,
    "$isNumber": _op_is_number,
    "$isArray": _op_is_array,
    # object
    "$mergeObjects": _op_merge_objects,
    # cast extensions (not in the reference; MongoDB 4.0 operators)
    "$toInt": _cast_factory("int"),
    "$toLong": _cast_factory("long"),
    "$toDouble": _cast_factory("double"),
    "$toBool": _cast_factory("boolean"),
    "$toDate": _cast_factory("timestamp"),
    "$toDecimal": _cast_factory("decimal(38,10)"),
    "$convert": _op_convert,
    # regex (MongoDB 4.2 extensions)
    "$regexMatch": _op_regex_match,
    "$regexFind": _op_regex_find,
    "$regexFindAll": _op_regex_find_all,
    # string search/replace (MongoDB 4.0/4.4 extensions)
    "$replaceOne": _op_replace_one,
    "$replaceAll": _op_replace_all,
    "$indexOfCP": _op_index_of_cp,
    "$indexOfBytes": _op_index_of_cp,  # bytes≡codepoints for ASCII; COMPAT.md
    "$binarySize": _date_factory(F.octet_length),
    # dynamic field access (MongoDB 5.0)
    "$getField": _op_get_field,
    "$setField": _op_set_field,
    "$unsetField": _op_unset_field,
    # object <-> array
    "$objectToArray": _op_object_to_array,
    "$arrayToObject": _op_array_to_object,
    "$zip": _op_zip,
    # date arithmetic (MongoDB 5.0/3.6 — advertised in reference README.md:120
    # but never implemented there)
    "$dateAdd": _op_date_add,
    "$dateSubtract": lambda spec, ctx: _op_date_add(spec, ctx, sign=-1),
    "$dateDiff": _op_date_diff,
    "$dateTrunc": _op_date_trunc,
    "$dateToString": _op_date_to_string,
    "$dateFromString": _op_date_from_string,
    "$isoDayOfWeek": _date_factory(_iso_day_of_week),
    "$isoWeek": _date_factory(F.weekofyear),
    "$isoWeekYear": _op_iso_week_year,
    # trigonometry / transcendental (MongoDB 4.2)
    "$sin": _date_factory(F.sin),
    "$cos": _date_factory(F.cos),
    "$tan": _date_factory(F.tan),
    "$asin": _date_factory(F.asin),
    "$acos": _date_factory(F.acos),
    "$atan": _date_factory(F.atan),
    "$atan2": _cmp_factory(lambda a, b: F.atan2(a, b)),
    "$sinh": _date_factory(F.sinh),
    "$cosh": _date_factory(F.cosh),
    "$tanh": _date_factory(F.tanh),
    "$degreesToRadians": _date_factory(F.radians),
    "$radiansToDegrees": _date_factory(F.degrees),
    "$log": _cmp_factory(lambda num, base: F.log(num) / F.log(base)),
    # random (MongoDB 4.4)
    "$rand": lambda spec, ctx: F.rand(),
    # variable binding (MongoDB 2.6)
    "$let": _op_let,
    # date construction/deconstruction (MongoDB 3.6)
    "$dateFromParts": _op_date_from_parts,
    "$dateToParts": _op_date_to_parts,
    # bitwise (MongoDB 6.3)
    "$bitAnd": _bit_factory(lambda a, b: a.bitwiseAND(b)),
    "$bitOr": _bit_factory(lambda a, b: a.bitwiseOR(b)),
    "$bitXor": _bit_factory(lambda a, b: a.bitwiseXOR(b)),
    "$bitNot": lambda spec, ctx: F.bitwise_not(
        translate_expr(_args(spec, 1)[0], ctx).cast("long")),
    # byte-indexed substring (legacy $substr is byte-based; ASCII≡CP, COMPAT.md)
    "$substrBytes": _op_substr,
    # n-element array selectors (MongoDB 5.2 expression forms)
    "$firstN": _op_first_n,
    "$lastN": lambda spec, ctx: _op_first_n(spec, ctx, last=True),
    "$minN": _op_min_n,
    "$maxN": lambda spec, ctx: _op_min_n(spec, ctx, desc=True),
}
