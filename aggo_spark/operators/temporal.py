"""Temporal joins — as-of (point-in-time) and interval-overlap joins.

Spark has no native ASOF JOIN (DuckDB/Pandas do); the naive theta-join
``l.ts >= r.ts`` explodes into a BroadcastNestedLoopJoin. The scalable
re-expression is the *union-merge* trick used by every large-scale
point-in-time-correctness system: tag both sides, union them into one
stream, sort within each ``by`` partition by time, and carry the most
recent right-side payload forward with ``last(ignoreNulls)`` over an
unbounded-preceding window. One shuffle (the window partitionBy), no
range probe, no nested loop — O(n log n) per key regardless of how many
right rows precede each left row.

Interval joins (point-in-range, range-overlap) use the other standard
trick: bucketize the range dimension so candidates meet on an equi key,
then apply the exact predicate — turning a cross product into a
hash join whose fan-out is bounded by range_width / bucket_width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | list[str] | None = None,
    right_cols: list[str] | None = None,
    suffix: str = "_r",
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.on <= left.on`` (or ``<`` when ``strict``), matching on the
    optional ``by`` keys — left-join semantics (unmatched rows keep nulls).

    ``right_cols`` limits which right columns are carried (default: all
    except ``on``/``by``); they are appended with ``suffix``. Duplicate
    right timestamps within a key are resolved to the row that sorts last
    by the carried payload — pre-aggregate the right side to one row per
    (by, on) when that matters.
    """
    by_list = [by] if isinstance(by, str) else list(by or [])
    if right_cols is None:
        right_cols = [c for c in right.columns if c != on and c not in by_list]
    payload = F.struct(*[F.col(f"`{c}`") for c in right_cols])

    lcols = left.columns
    l_tag = left.select(
        *[F.col(f"`{c}`") for c in lcols],
        F.lit(1).alias("__src"),
        F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType
        ).alias("__rp"),
    )
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in lcols if c not in by_list and c != on],
        *[F.col(f"`{c}`") for c in by_list],
        F.col(f"`{on}`").alias(on),
        F.lit(0).alias("__src"),
        payload.alias("__rp"),
    ).select(*[F.col(f"`{c}`") for c in lcols], "__src", "__rp")

    unioned = l_tag.unionByName(r_tag)
    # right rows sort before left at equal ts (inclusive <=); strict mode
    # flips the tag order so an equal-ts right row is NOT visible
    order = [F.col(on).asc_nulls_first(),
             (F.col("__src") if not strict else -F.col("__src")).asc()]
    w = (
        Window.partitionBy(*[F.col(f"`{c}`") for c in by_list])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    # In strict mode the frame excludes the current row, so a left row never
    # sees itself; the flipped tag keeps equal-ts right rows out of frame.
    carried = unioned.withColumn("__rv", F.last("__rp", ignorenulls=True).over(w))
    out = carried.filter(F.col("__src") == 1).drop("__src", "__rp")
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}", F.col("__rv").getField(c))
    return out.drop("__rv")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: str | list[str] | None = None,
    bucket_width: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= point <= end`` (plus optional equi ``by`` keys).

    With ``bucket_width`` (same units as the columns — e.g. ms for epoch
    timestamps cast to long), both sides are bucketized so candidates meet
    on an equi (bucket, by) key: intervals explode into the buckets they
    overlap, points land in exactly one — a hash join with fan-out
    ceil(interval_len / bucket_width), never a nested loop. Without it the
    join is a plain range predicate (fine when one side broadcasts).
    """
    by_list = [by] if isinstance(by, str) else list(by or [])
    p, i = points.alias("p"), intervals.alias("i")
    eq = [F.col(f"p.`{c}`") == F.col(f"i.`{c}`") for c in by_list]
    rng = [F.col(f"p.`{point_col}`") >= F.col(f"i.`{start_col}`"),
           F.col(f"p.`{point_col}`") <= F.col(f"i.`{end_col}`")]
    icols = [F.col(f"i.`{c}`") for c in intervals.columns if c not in by_list]
    if bucket_width is None:
        cond = eq + rng
        joined = p.join(i, cond, how)
        return joined.select("p.*", *icols)
    bw = int(bucket_width)
    pb = p.withColumn("__bk", (F.col(f"p.`{point_col}`").cast("long") / bw).cast("long"))
    ib = i.withColumn(
        "__bk",
        F.explode(
            F.sequence(
                (F.col(f"i.`{start_col}`").cast("long") / bw).cast("long"),
                (F.col(f"i.`{end_col}`").cast("long") / bw).cast("long"),
            )
        ),
    )
    cond = [pb["__bk"] == ib["__bk"]] + eq + rng
    joined = pb.join(ib, cond, how)
    return joined.select("p.*", *icols)
