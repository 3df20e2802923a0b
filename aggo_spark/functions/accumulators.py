"""$group accumulator dialect → Spark aggregate Columns.

Reference registry: ``/root/reference/src/aggo/accumulators.ts:20-34``
(dispatch 52-71). Every accumulator maps to a native Spark aggregate —
partial (map-side) aggregation, spill-to-disk, and codegen come free from
``HashAggregateExec``; the reference's incremental (IVM) variants are
subsumed by Structured Streaming state when the same spec is used in a
streaming pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..errors import InvalidPipeline, UnsupportedExpression
from ..plans.context import ExprContext
from .expressions import struct_comparator, translate_expr

__all__ = ["accumulator_to_column", "window_function_to_column"]


def accumulator_to_column(
    name: str, spec: object, ctx: ExprContext, order_by: dict | None = None
) -> Column:
    """Translate ``{field: {$acc: expr}}`` to an aliased aggregate Column.

    ``order_by`` is the spec of a still-live preceding ``$sort`` (or None):
    with it, ``$first``/``$last`` compile to ``min_by``/``max_by`` over the
    sort keys — deterministic under distributed grouping, unlike partition-
    order-dependent ``F.first``.
    """
    if not isinstance(spec, dict) or len(spec) != 1:
        raise InvalidPipeline(f"accumulator spec for {name!r} must be a single-operator object")
    op, arg = next(iter(spec.items()))
    col = _accumulator(op, arg, ctx, order_by=order_by)
    return col.alias(name)


def _order_inverted(col: Column, dtype: T.DataType | None) -> Column | None:
    """A column whose ASCENDING order equals the DESCENDING order of ``col``
    for non-null, non-NaN values.

    Only types with an order-preserving negation qualify; None otherwise.
    (Strings have no such transform — the caller falls back.) Null and NaN
    do NOT invert in place (null stays null, -NaN is NaN), so the caller
    prepends a placement flag to restore $sort desc's NaN-first /
    nulls-last order — see `_ordered_pick`.
    """
    if isinstance(dtype, T.LongType):
        # plain negation wraps (or throws under ANSI) at Long.MIN_VALUE —
        # widen to decimal(20,0), where every long's negation is exact
        return -col.cast("decimal(20,0)")
    if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType)):
        # widen first: -Int.MIN overflows int but fits long
        return -col.cast("long")
    if isinstance(dtype, (T.FloatType, T.DoubleType, T.DecimalType)):
        return -col
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return -F.unix_micros(col.cast("timestamp"))
    if isinstance(dtype, T.DateType):
        return -F.datediff(col, F.lit("1970-01-01").cast("date"))
    if isinstance(dtype, T.BooleanType):
        return ~col
    return None


def uninvertible_desc_keys(order_by: dict, ctx: ExprContext) -> list[str]:
    """Sort-spec paths that block a mixed-direction min_by/max_by mapping.

    A descending component whose type has no order-preserving sign inversion
    (strings, and any other type `_order_inverted` declines) can't join the
    ascending struct key directly. ``stage_group`` pre-computes a dense-rank
    surrogate for each returned path (see `stages._rank_invert_keys`) so
    `$first`/`$last` stay deterministic instead of falling back to
    partition-order ``F.first``. Uniform-direction sorts never need this —
    min_by/max_by just flips — so only mixed-direction specs return paths.
    """
    dirs = [1 if v in (1, True) else -1 for v in order_by.values()]
    if len(set(dirs)) == 1:
        return []
    out = []
    for k, v in order_by.items():
        if v in (1, True):
            continue
        col, dtype = _mongo_sort_key(ctx.resolve_path(k), ctx.path_type(k), asc=False)
        if _order_inverted(col, dtype) is None:
            out.append(k)
    return out


def _mongo_sort_key(col: Column, dtype: T.DataType | None, asc: bool):
    """(key column, key dtype) under MongoDB sort semantics: array fields
    sort by min element ascending / max element descending (matching
    stages._sort_cols), everything else as-is."""
    if isinstance(dtype, T.ArrayType):
        return (F.array_min(col) if asc else F.array_max(col)), dtype.elementType
    return col, dtype


def empty_array_flag(raw: Column, dtype: T.DataType | None) -> Column | None:
    """0 for an EMPTY array, 1 otherwise; None for non-array fields.

    MongoDB ranks an empty array below null ascending (BSON Undefined <
    Null), but `array_min([])` is NULL so the value key alone ties them
    (was COMPAT row 6, closed r5). Ordering this flag ahead of the min/max
    value key — asc for ascending sorts, desc for descending — reproduces
    asc `[] < null < values` and desc `values > null > []`. Shared by
    `$sort` (stages._sort_cols) and the `$first/$last` pick keys so sort
    and pick can never disagree."""
    if not isinstance(dtype, T.ArrayType):
        return None
    return F.when(raw.isNotNull() & (F.size(raw) == 0), F.lit(0)).otherwise(F.lit(1))


def _ordered_pick(arg, ctx: ExprContext, order_by: dict, last: bool) -> Column | None:
    """min_by/max_by mapping for $first/$last after $sort.

    Uniform-direction sorts use the keys as-is. Mixed-direction sorts
    (e.g. ``{a: 1, b: -1}``) normalize every component to ascending by
    sign-inverting the descending ones (numeric / date / timestamp /
    boolean) so a single min_by/max_by struct key still works —
    deterministic under distributed grouping. Descending components with no
    order-preserving inversion (strings) never reach this in the $group path:
    `stage_group` pre-substitutes dense-rank surrogates (uninvertible_desc_keys
    + stages._rank_invert_keys), so returning None here only hits callers
    without a prepass hook. Reference semantics: src/aggo/accumulators.ts:96-106.
    """
    dirs = [1 if v in (1, True) else -1 for v in order_by.values()]
    out = translate_expr(arg, ctx)
    if len(set(dirs)) == 1:
        ascending = dirs[0] == 1
        keys = []
        for i, k in enumerate(order_by):
            raw, rdt = ctx.resolve_path(k), ctx.path_type(k)
            # empty-array flag ahead of the value key: min/max over the
            # struct then lands [] below null exactly like $sort (the same
            # 0/1 flag works for both directions because desc only swaps
            # min_by <-> max_by, never the struct field comparison)
            eflag = empty_array_flag(raw, rdt)
            if eflag is not None:
                keys.append(eflag.alias(f"__of{i}"))
            keys.append(
                _mongo_sort_key(raw, rdt, asc=ascending)[0].alias(f"__ok{i}"))
        # ALWAYS struct-wrap, even a single key: min_by/max_by SKIP rows
        # whose bare ordering key is null, which would silently drop
        # null-key documents from the pick (and array sort keys produce
        # exactly that for empty arrays). A one-field struct is never null,
        # and its nulls-first field ordering matches $sort's placement.
        key = F.struct(*keys)
        # $first under asc = smallest key; $last under asc = largest; flipped desc
        want_min = ascending != last
        return F.min_by(out, key) if want_min else F.max_by(out, key)
    keys = []
    for i, (k, v) in enumerate(order_by.items()):
        asc = v in (1, True)
        raw, rdt = ctx.resolve_path(k), ctx.path_type(k)
        eflag = empty_array_flag(raw, rdt)
        col, dtype = _mongo_sort_key(raw, rdt, asc=asc)
        if asc:
            if eflag is not None:  # [] below null ascending, like $sort
                keys.append(eflag.alias(f"__of{i}"))
            keys.append(col.alias(f"__ok{i}"))
            continue
        inv = _order_inverted(col, dtype)
        if inv is None:
            return None
        # $sort desc places NaN FIRST (Spark orders NaN largest) and nulls
        # LAST (desc_nulls_last), but both survive sign inversion in place:
        # null stays null (struct nulls-first would pick it first) and -NaN
        # is still NaN (sorts last ascending, so min_by would skip it). A
        # 0/1/2 placement flag ahead of the inverted value restores the
        # $sort desc order in the ascending space (r4; NaN leg from the
        # late-r4 review).
        if isinstance(dtype, (T.FloatType, T.DoubleType)):
            flag = (F.when(col.isNull(), F.lit(2))
                    .when(F.isnan(col), F.lit(0)).otherwise(F.lit(1)))
        else:
            flag = F.when(col.isNull(), F.lit(2)).otherwise(F.lit(1))
        if eflag is not None:
            # desc places [] after null ($sort: values, null, []): in the
            # normalized-ascending space that is placement 3, past null's 2
            flag = F.when(eflag == 0, F.lit(3)).otherwise(flag)
        keys.append(flag.alias(f"__on{i}"))
        keys.append(inv.alias(f"__ok{i}"))
    key = F.struct(*keys)
    return F.max_by(out, key) if last else F.min_by(out, key)


def _accumulator(op: str, arg: object, ctx: ExprContext, order_by: dict | None = None) -> Column:
    if op == "$sum":
        # $sum: <number literal> counts docs weighted by the literal
        # (reference accumulators.ts:73-88)
        if isinstance(arg, (int, float)) and not isinstance(arg, bool):
            if arg == 1:
                return F.count(F.lit(1))
            return F.count(F.lit(1)) * F.lit(arg)
        return F.sum(translate_expr(arg, ctx))
    if op == "$avg":
        return F.avg(translate_expr(arg, ctx))
    if op == "$min":
        return F.min(translate_expr(arg, ctx))
    if op == "$max":
        return F.max(translate_expr(arg, ctx))
    if op == "$first":
        if order_by:
            picked = _ordered_pick(arg, ctx, order_by, last=False)
            if picked is not None:
                return picked
        return F.first(translate_expr(arg, ctx))
    if op == "$last":
        if order_by:
            picked = _ordered_pick(arg, ctx, order_by, last=True)
            if picked is not None:
                return picked
        return F.last(translate_expr(arg, ctx))
    if op == "$push":
        return F.collect_list(translate_expr(arg, ctx))
    if op == "$addToSet":
        return F.collect_set(translate_expr(arg, ctx))
    if op == "$stdDevPop":
        return F.stddev_pop(translate_expr(arg, ctx))
    if op == "$stdDevSamp":
        return F.stddev_samp(translate_expr(arg, ctx))
    if op == "$variancePop":
        return F.var_pop(translate_expr(arg, ctx))
    if op == "$varianceSamp":
        return F.var_samp(translate_expr(arg, ctx))
    if op == "$count":
        # MongoDB 5.0 {$count: {}} accumulator form
        return F.count(F.lit(1))
    if op == "$countDistinct":
        # extension: exact distinct count
        return F.count_distinct(translate_expr(arg, ctx))
    if op == "$approxCountDistinct":
        # extension: HLL sketch — the 100 TB-scale variant of $addToSet+$size
        return F.approx_count_distinct(translate_expr(arg, ctx))
    if op == "$median":
        # MongoDB 7.0 accumulator; approx by default (t-digest-style sketch
        # merges across partitions — the only shape that scales), exact on
        # request
        method = arg.get("method", "approximate") if isinstance(arg, dict) else "approximate"
        inp = arg.get("input", arg) if isinstance(arg, dict) else arg
        c = translate_expr(inp, ctx)
        if method == "exact":
            return F.percentile(c, F.lit(0.5))
        return F.percentile_approx(c, F.lit(0.5), F.lit(10000))
    if op == "$percentile":
        # MongoDB 7.0: {$percentile: {input, p: [..], method}} → array
        if not isinstance(arg, dict) or "input" not in arg or "p" not in arg:
            raise InvalidPipeline("$percentile requires {input, p}")
        c = translate_expr(arg["input"], ctx)
        ps = F.array(*[F.lit(float(p)) for p in arg["p"]])
        if arg.get("method") == "exact":
            return F.percentile(c, ps)
        return F.percentile_approx(c, ps, F.lit(10000))
    if op in ("$topN", "$bottomN", "$firstN", "$lastN", "$minN", "$maxN"):
        return _n_accumulator(op, arg, ctx)
    if op == "$top":
        return F.element_at(_n_accumulator("$topN", {**arg, "n": 1}, ctx), 1)
    if op == "$bottom":
        return F.element_at(_n_accumulator("$bottomN", {**arg, "n": 1}, ctx), 1)
    if op == "$mergeObjects":
        # Merge the group's documents in order; per MongoDB, the last
        # document's field wins when present. With a fixed struct schema
        # "missing" collapses to NULL, so per-field last-non-null is the
        # SQL-normative mapping (explicit-null overwrite deviation: COMPAT.md).
        # Stays a native aggregate — struct of F.last(ignorenulls) — so
        # map-side partial aggregation applies; no collect_list blowup.
        if isinstance(arg, dict) and not any(k.startswith("$") for k in arg):
            items = [(k, translate_expr(v, ctx)) for k, v in arg.items()]
        else:
            t = ctx.infer_type(arg)
            if not isinstance(t, T.StructType):
                raise UnsupportedExpression(
                    "$mergeObjects accumulator requires a struct-typed expression "
                    "or an expression object"
                )
            col = translate_expr(arg, ctx)
            items = [(f, col.getField(f)) for f in t.fieldNames()]
        return F.struct(*[F.last(c, ignorenulls=True).alias(k) for k, c in items])
    if op in ("$covariancePop", "$covarianceSamp"):
        # MongoDB 5.0 window operators; also usable in $group here (natural
        # extension — they are plain mergeable aggregates in Spark)
        if not isinstance(arg, list) or len(arg) != 2:
            raise InvalidPipeline(f"{op} requires a two-element array [x, y]")
        x = translate_expr(arg[0], ctx).cast("double")
        y = translate_expr(arg[1], ctx).cast("double")
        return (F.covar_pop if op == "$covariancePop" else F.covar_samp)(x, y)
    if op == "$minBy":
        # extension: deterministic first-by-order ($first after $sort is
        # nondeterministic under distributed grouping; min_by is the
        # scale-correct equivalent)
        return F.min_by(translate_expr(arg["output"], ctx), translate_expr(arg["by"], ctx))
    if op == "$maxBy":
        return F.max_by(translate_expr(arg["output"], ctx), translate_expr(arg["by"], ctx))
    raise UnsupportedExpression(f"unsupported accumulator {op}")


def _n_accumulator(op: str, arg: object, ctx: ExprContext) -> Column:
    """MongoDB 5.2 N-accumulators ($topN/$bottomN/$firstN/$lastN/$minN/$maxN).

    Spark has no bounded-top-k *aggregate*, so these collect the group and
    slice — correct everywhere, and fine when groups are modest. For
    top-k-per-group over huge groups, the scale-correct plan is a window
    rank + filter (row_number() over partition ≤ n), which the engine's
    $setWindowFields stage already expresses; see COMPAT.md.
    """
    if not isinstance(arg, dict):
        raise InvalidPipeline(f"{op} requires an object spec")
    n = int(arg.get("n", 1))
    if op in ("$firstN", "$lastN", "$minN", "$maxN"):
        c = translate_expr(arg["input"], ctx)
        lst = F.collect_list(c)
        if op == "$firstN":
            return F.slice(lst, 1, n)
        if op == "$lastN":
            start = F.greatest(F.size(lst) - F.lit(n - 1), F.lit(1))
            return F.slice(lst, start, n)
        if op == "$minN":
            return F.slice(F.sort_array(lst), 1, n)
        return F.slice(F.sort_array(lst, asc=False), 1, n)
    # $topN / $bottomN: {output, sortBy: {field: 1|-1, ...}, n}
    sort_by = arg.get("sortBy")
    if not isinstance(sort_by, dict) or not sort_by:
        raise InvalidPipeline(f"{op} requires sortBy")
    dirs = [1 if v in (1, True) else -1 for v in sort_by.values()]
    fields = [ctx.resolve_path(k).alias(f"__k{i}") for i, k in enumerate(sort_by)]
    packed = F.collect_list(
        F.struct(*fields, translate_expr(arg["output"], ctx).alias("__out"))
    )
    if len(set(dirs)) == 1:
        # uniform direction: struct-ordered sort_array (fast builtin)
        ordered = F.sort_array(packed, asc=dirs[0] == 1)
    else:
        # mixed directions: codegen-able comparator lambda
        keys = [(f"__k{i}", d) for i, d in enumerate(dirs)]
        ordered = F.array_sort(packed, struct_comparator(keys))
    if op == "$topN":
        sliced = F.slice(ordered, 1, n)
    else:
        start = F.greatest(F.size(ordered) - F.lit(n - 1), F.lit(1))
        sliced = F.slice(ordered, start, n)
    return F.transform(sliced, lambda s: s["__out"])


# window-function forms for $setWindowFields (MongoDB 5.0 stage; a natural
# Spark extension — reference lacks it, SURVEY.md §2.2 "cheaply add" list)
_RANK_OPS = {
    "$rank": F.rank,
    "$denseRank": F.dense_rank,
    "$documentNumber": F.row_number,
}

# shared with stages._RANGE_UNIT_MS (defined here to avoid a circular import)
RANGE_UNIT_MS = {
    "millisecond": 1,
    "second": 1000,
    "minute": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
    "week": 604_800_000,
}


def _numeric_sort_key(sort_by: dict | None, ctx: ExprContext, op: str,
                      unit: str | None, require_unit: bool = False) -> Column:
    """The single ascending sortBy key as a double, for the time-series
    window operators ($derivative/$integral/$linearFill): numeric keys pass
    through; date/timestamp keys become epoch millis scaled by ``unit``.
    ``require_unit`` enforces MongoDB's rule that $derivative/$integral over
    a date sortBy MUST name a unit (a silent per-millisecond default would
    wrong-scale ported pipelines); $linearFill interpolates on raw millis,
    so it passes unit=None without the requirement."""
    if not sort_by or len(sort_by) != 1:
        raise InvalidPipeline(f"{op} requires exactly one sortBy key")
    key, direction = next(iter(sort_by.items()))
    if direction not in (1, True):
        raise InvalidPipeline(f"{op} requires an ascending sortBy")
    col = ctx.resolve_path(key)
    dtype = ctx.path_type(key)
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        if unit is None:
            if require_unit:
                raise InvalidPipeline(f"{op} over a date sortBy requires unit")
            factor = 1
        else:
            if unit not in RANGE_UNIT_MS:
                raise InvalidPipeline(f"unsupported unit {unit!r}")
            factor = RANGE_UNIT_MS[unit]
        return F.unix_millis(col.cast("timestamp")).cast("double") / F.lit(float(factor))
    if unit is not None:
        raise InvalidPipeline(f"{op}: unit requires a date/timestamp sortBy")
    return col.cast("double")


def window_function_to_column(
    spec: dict, ctx: ExprContext, sort_by: dict | None = None,
    out_name: str = "out",
):
    """Translate one $setWindowFields output spec →
    (fn, takes_frame, pre_cols).

    ``fn(window_spec) -> Column``; ``pre_cols`` maps hidden column names to
    builders ``(base_window) -> Column`` that the stage materializes BEFORE
    applying ``fn`` (used by $integral, whose per-row trapezoid needs a lag
    that Spark can't nest inside the framed sum). Both window layers share
    the same partitioning, so the pre-pass adds a WindowExec but no
    exchange.
    """
    items = [(k, v) for k, v in spec.items() if k != "window"]
    if len(items) != 1:
        raise InvalidPipeline("window output spec must have exactly one operator")
    op, arg = items[0]
    if op in _RANK_OPS:
        fn = _RANK_OPS[op]
        return (lambda w: fn().over(w)), False, {}
    if op == "$shift":
        offset = arg.get("by", 1)
        default = arg.get("default")
        out_expr = translate_expr(arg["output"], ctx)
        if offset >= 0:
            return (lambda w: F.lead(out_expr, offset, default).over(w)), False, {}
        return (lambda w: F.lag(out_expr, -offset, default).over(w)), False, {}
    if op == "$locf":
        # last observation carried forward (MongoDB 5.2): last non-null of
        # the expression up to the current document in sort order; ignores
        # any window spec, like MongoDB
        if not sort_by:
            # without a sort the carry order is physical row order —
            # nondeterministic under repartition; MongoDB rejects it too
            raise InvalidPipeline("$locf requires sortBy")
        out_expr = translate_expr(arg, ctx)

        def _locf(w):
            from pyspark.sql import Window as W

            return F.last(out_expr, ignorenulls=True).over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow))

        return _locf, False, {}
    if op == "$linearFill":
        # linear interpolation between the surrounding non-null values,
        # positioned on the sortBy key (MongoDB 5.3). Edge nulls (no
        # neighbor on one side) stay null, as in MongoDB.
        v = translate_expr(arg, ctx).cast("double")
        x = _numeric_sort_key(sort_by, ctx, "$linearFill", None)

        def _lfill(w):
            from pyspark.sql import Window as W

            wb = w.rowsBetween(W.unboundedPreceding, W.currentRow)
            wf = w.rowsBetween(W.currentRow, W.unboundedFollowing)
            pv = F.last(F.when(v.isNotNull(), v), ignorenulls=True).over(wb)
            px = F.last(F.when(v.isNotNull(), x), ignorenulls=True).over(wb)
            nv = F.first(F.when(v.isNotNull(), v), ignorenulls=True).over(wf)
            nx = F.first(F.when(v.isNotNull(), x), ignorenulls=True).over(wf)
            interp = pv + (nv - pv) * (x - px) / (nx - px)
            return F.when(v.isNotNull(), v).otherwise(
                F.when(px.isNotNull() & nx.isNotNull() & (nx != px), interp))

        return _lfill, False, {}
    if op == "$derivative":
        # (last input − first input) / Δ(sort key) over the frame
        # (MongoDB 5.0); dates need `unit`, numeric sort keys forbid it
        inp = translate_expr(arg["input"], ctx).cast("double")
        x = _numeric_sort_key(sort_by, ctx, "$derivative", arg.get("unit"),
                              require_unit=True)

        def _deriv(w):
            dx = F.last(x).over(w) - F.first(x).over(w)
            dv = F.last(inp).over(w) - F.first(inp).over(w)
            return F.when(dx != 0, dv / dx)

        return _deriv, True, {}
    if op == "$integral":
        # trapezoidal rule over the frame (MongoDB 5.0). The per-row
        # trapezoid (v_i + v_{i-1})/2 · Δx references the PREVIOUS document,
        # so only frames starting at unbounded-preceding sum exactly the
        # trapezoids inside the frame (the frame-first row's lag is either
        # the partition edge → null → skipped, or inside the frame).
        win = spec.get("window", {})
        bounds = win.get("documents") or win.get("range")
        if bounds is not None and bounds[0] != "unbounded":
            raise InvalidPipeline(
                "$integral requires an unbounded-preceding window frame")
        inp = translate_expr(arg["input"], ctx).cast("double")
        x = _numeric_sort_key(sort_by, ctx, "$integral", arg.get("unit"),
                              require_unit=True)
        # hidden-column name must be a plain identifier: dotted/special
        # output names would otherwise parse as struct access in F.col
        import re as _re

        hid = "__aggo_trap_" + _re.sub(r"\W", "_", out_name)

        def _trap(w0):
            return (inp + F.lag(inp).over(w0)) / 2 * (x - F.lag(x).over(w0))

        def _integ(w):
            return F.coalesce(F.sum(F.col(f"`{hid}`")).over(w), F.lit(0.0))

        return _integ, True, {hid: _trap}
    agg = _accumulator(op, arg, ctx)
    return (lambda w: agg.over(w)), True, {}
