"""Skew-aware aggregation: two-phase salted group-by.

AQE's skew-join splitting handles skewed *joins* automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in build_session), but a
groupBy whose hottest key holds a large share of all rows still funnels that
key's rows through one reducer. The standard fix is salting: aggregate on
(key, salt) first — spreading the hot key over ``salt_buckets`` reducers —
then combine the partials on key alone. Works for algebraic aggregates
(sum/count/min/max), i.e. everything with a merge function.

This is an opt-in utility rather than the default $group translation
because the extra shuffle costs ~2× on well-distributed keys; use it (or
let AQE's partial-agg pushdown help) when a key histogram says so.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_group_agg"]

_MERGE = {
    "sum": F.sum,
    "count": F.sum,  # counts merge by summing partial counts
    "min": F.min,
    "max": F.max,
    # the genuinely skew-prone op: partial aggregation does NOT collapse a
    # hot key's collect_list map-side (unlike sum/count, where the partial
    # agg already defuses key skew) — partial lists merge by flattening
    "collect_list": lambda c: F.flatten(F.collect_list(c)),
}


def salted_group_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output name → (op, column) with
    op ∈ {sum, count, min, max, collect_list}. (``collect_list`` output
    order follows partial-merge order — a multiset, like Spark's own
    collect_list under shuffle.)

    Phase 1 groups by (keys…, salt) where salt = pmod(rand-free row hash,
    salt_buckets) — deterministic (spark_partition_id + a per-row hash), so
    retries are safe. Phase 2 merges partials on the true keys. The hot key
    now occupies ``salt_buckets`` reducers in the expensive phase; phase 2
    only sees ``salt_buckets`` rows per key.
    """
    salt = F.pmod(F.xxhash64(*[F.col(k) for k in keys], F.spark_partition_id(),
                             F.monotonically_increasing_id()), F.lit(salt_buckets))
    phase1_aggs = []
    for name, (op, col) in aggs.items():
        if op == "count":
            phase1_aggs.append(F.count(F.lit(1) if col == "*" else F.col(col)).alias(name))
        elif op in _MERGE:
            phase1_aggs.append(getattr(F, op)(col).alias(name))
        else:
            raise ValueError(f"non-algebraic op {op!r}; salting needs a merge function")
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*phase1_aggs)
    phase2_aggs = [_MERGE[op](name).alias(name) for name, (op, _) in aggs.items()]
    return partial.groupBy(*keys).agg(*phase2_aggs)
