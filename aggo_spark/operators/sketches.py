"""Mergeable cardinality sketches for corpus accounting at crawl scale.

The 100 TB bookkeeping problem: "how many distinct URLs / content
hashes / token types does the corpus hold, per source and overall,
updated per crawl snapshot" — an exact countDistinct re-shuffles every
historical row on every update. The sketch pattern stores one small
binary per (group, snapshot) and MERGES: new data only ever scans
itself, and any rollup (per-source, global, across snapshots) is a
union of sketches — the same pattern as Delta/Iceberg column stats.

Built entirely on Spark 4's native Apache DataSketches functions —
HLL for cardinality (``hll_sketch_agg`` / ``hll_union_agg`` /
``hll_sketch_estimate``) and, r8, KLL for quantiles
(``kll_sketch_agg_double`` / ``kll_merge_agg_double`` /
``kll_sketch_get_quantile_double``): map-side combinable aggregates,
JVM-side, no UDFs. The same two sketches Delta/Iceberg-class table
stats and crawl accounting pipelines standardize on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "distinct_sketch_table",
    "merge_sketch_tables",
    "sketch_estimates",
    "quantile_sketch_table",
    "merge_quantile_tables",
    "quantile_estimates",
    "theta_sketch_table",
    "merge_theta_tables",
    "snapshot_set_stats",
    "topk_sketch_table",
    "merge_topk_tables",
    "topk_estimates",
]

_LG_K_MIN, _LG_K_MAX = 4, 21  # datasketches HLL bounds


def _check_lgk(lg_k: int) -> int:
    if not (_LG_K_MIN <= lg_k <= _LG_K_MAX):
        raise ValueError(
            f"lg_k must be in [{_LG_K_MIN}, {_LG_K_MAX}], got {lg_k}")
    return lg_k


def distinct_sketch_table(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    lg_k: int = 12,
) -> DataFrame:
    """Per-group HLL sketch of ``value_col``'s distinct values:
    ``(*by, sketch, estimate)``. ``lg_k=12`` ≈ 1.6% standard error in
    ~2.5 KB per sketch. One map-side-combinable aggregate — the
    exchange carries one sketch per (partition × group), never rows.

    Persist the ``sketch`` column (parquet binary) per snapshot; later
    snapshots union via :func:`merge_sketch_tables` without touching
    this data again.
    """
    _check_lgk(lg_k)
    by = by or []
    agg = F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch")
    out = (df.groupBy(*by).agg(agg) if by else df.agg(agg))
    return out.withColumn(
        "estimate", F.hll_sketch_estimate("sketch").cast("long"))


def merge_sketch_tables(
    tables: list[DataFrame],
    by: list[str] | None = None,
) -> DataFrame:
    """Union sketch tables (e.g. one per crawl snapshot) into one
    ``(*by, sketch, estimate)`` rollup. ``allowDifferentLgConfigK``:
    snapshots written with different precisions still merge (the union
    downgrades to the coarsest). Grouping on a subset of the original
    ``by`` keys rolls the hierarchy up — per-source sketches union into
    a global one with ``by=[]``."""
    if not tables:
        raise ValueError("merge_sketch_tables needs at least one table")
    by = by or []
    # project to (keys, sketch) first: a table read back from a
    # sketch-only parquet (no estimate column) merges the same as a
    # freshly-built one, and extra bookkeeping columns never block union
    proj = [t.select(*by, "sketch") for t in tables]
    u = proj[0]
    for t in proj[1:]:
        u = u.unionByName(t)
    agg = F.hll_union_agg("sketch", F.lit(True)).alias("sketch")
    out = (u.groupBy(*by).agg(agg) if by else u.agg(agg))
    return out.withColumn(
        "estimate", F.hll_sketch_estimate("sketch").cast("long"))


def sketch_estimates(table: DataFrame) -> DataFrame:
    """Refresh the ``estimate`` column of a stored sketch table (e.g.
    after reading back from parquet, where only ``sketch`` persists)."""
    return table.withColumn(
        "estimate", F.hll_sketch_estimate("sketch").cast("long"))


# ---------------------------------------------------------------------------
# quantile sketches (KLL) — the distribution complement of the HLL tables
# ---------------------------------------------------------------------------

_KLL_K_MIN, _KLL_K_MAX = 8, 65535  # datasketches KllDoublesSketch bounds


def _check_kll_k(k: int) -> int:
    if not (_KLL_K_MIN <= k <= _KLL_K_MAX):
        raise ValueError(
            f"k must be in [{_KLL_K_MIN}, {_KLL_K_MAX}], got {k}")
    return k


def quantile_sketch_table(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    k: int = 200,
) -> DataFrame:
    """Per-group KLL quantile sketch of ``value_col`` — the distribution
    complement of :func:`distinct_sketch_table` (r8, r7-verdict #6):
    corpus length/score distributions per (source, snapshot) with the
    same update-scans-only-new-data property. Spark 4.1 ships the
    Apache DataSketches KllDoublesSketch as NATIVE aggregates
    (``kll_sketch_agg_double`` — map-side combinable, JVM-side, no
    UDFs), so no t-digest Python kernel is needed.

    Returns ``(*by, qsketch, n)``; ``k=200`` (the library default) gives
    ~1.65% rank error in a few KB. Persist ``qsketch`` (parquet binary)
    per snapshot; roll up with :func:`merge_quantile_tables`; read
    percentiles with :func:`quantile_estimates`."""
    _check_kll_k(k)
    by = by or []
    agg = F.kll_sketch_agg_double(
        F.col(value_col).cast("double"), F.lit(k)).alias("qsketch")
    out = (df.groupBy(*by).agg(agg) if by else df.agg(agg))
    return out.withColumn(
        "n", F.kll_sketch_get_n_double("qsketch").cast("long"))


def merge_quantile_tables(
    tables: list[DataFrame],
    by: list[str] | None = None,
) -> DataFrame:
    """Union KLL quantile-sketch tables (one per crawl snapshot) into a
    ``(*by, qsketch, n)`` rollup — sketch merges, never re-scanned rows;
    grouping on a subset of the original ``by`` keys rolls the hierarchy
    up (per-source → global with ``by=[]``), exactly like
    :func:`merge_sketch_tables`."""
    if not tables:
        raise ValueError("merge_quantile_tables needs at least one table")
    by = by or []
    proj = [t.select(*by, "qsketch") for t in tables]
    u = proj[0]
    for t in proj[1:]:
        u = u.unionByName(t)
    agg = F.kll_merge_agg_double("qsketch").alias("qsketch")
    out = (u.groupBy(*by).agg(agg) if by else u.agg(agg))
    return out.withColumn(
        "n", F.kll_sketch_get_n_double("qsketch").cast("long"))


# ---------------------------------------------------------------------------
# theta sketches — SET OPERATIONS across snapshots (new-vs-seen accounting)
# ---------------------------------------------------------------------------

def theta_sketch_table(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
) -> DataFrame:
    """Per-group Theta sketch of ``value_col``'s distinct values —
    ``(*by, tsketch, estimate)``. HLL answers "how many distinct"; Theta
    additionally supports INTERSECTION and DIFFERENCE, the two crawl
    questions HLL can't: "how many of snapshot N's URLs are NEW vs
    snapshot N−1" and "how much do two sources overlap". Native Spark
    4.1 DataSketches aggregate (map-side combinable, JVM-side)."""
    by = by or []
    agg = F.theta_sketch_agg(F.col(value_col)).alias("tsketch")
    out = (df.groupBy(*by).agg(agg) if by else df.agg(agg))
    return out.withColumn(
        "estimate", F.theta_sketch_estimate("tsketch").cast("long"))


def merge_theta_tables(
    tables: list[DataFrame],
    by: list[str] | None = None,
) -> DataFrame:
    """Union Theta sketch tables into a ``(*by, tsketch, estimate)``
    rollup — same hierarchy semantics as :func:`merge_sketch_tables`."""
    if not tables:
        raise ValueError("merge_theta_tables needs at least one table")
    by = by or []
    proj = [t.select(*by, "tsketch") for t in tables]
    u = proj[0]
    for t in proj[1:]:
        u = u.unionByName(t)
    agg = F.theta_union_agg("tsketch").alias("tsketch")
    out = (u.groupBy(*by).agg(agg) if by else u.agg(agg))
    return out.withColumn(
        "estimate", F.theta_sketch_estimate("tsketch").cast("long"))


def snapshot_set_stats(
    a: DataFrame,
    b: DataFrame,
    by: list[str] | None = None,
) -> DataFrame:
    """New-vs-seen accounting between two Theta sketch tables (e.g. crawl
    snapshot N vs N−1), per group: ``(*by, a_est, b_est, union_est,
    intersection_est, only_a_est, only_b_est)`` — all sketch arithmetic,
    no row data touched. Groups present in only one side count the other
    as empty (full outer join; estimates 0). The standard dashboard row
    for "this crawl added X new URLs, re-saw Y"."""
    by = by or []
    sa = a.select(*by, F.col("tsketch").alias("__ta"))
    sb = b.select(*by, F.col("tsketch").alias("__tb"))
    j = (sa.join(sb, by, "full_outer") if by
         else sa.crossJoin(sb))  # two 1-row global tables
    est = F.theta_sketch_estimate

    def _safe(expr: F.Column, fallback: F.Column) -> F.Column:
        return F.when(F.col("__ta").isNull() | F.col("__tb").isNull(),
                      fallback).otherwise(expr)

    zero = F.lit(0).cast("long")
    a_est = F.coalesce(est("__ta").cast("long"), zero)
    b_est = F.coalesce(est("__tb").cast("long"), zero)
    return j.select(
        *by,
        a_est.alias("a_est"),
        b_est.alias("b_est"),
        _safe(est(F.theta_union("__ta", "__tb")).cast("long"),
              a_est + b_est).alias("union_est"),
        _safe(est(F.theta_intersection("__ta", "__tb")).cast("long"),
              zero).alias("intersection_est"),
        _safe(est(F.theta_difference("__ta", "__tb")).cast("long"),
              a_est).alias("only_a_est"),
        _safe(est(F.theta_difference("__tb", "__ta")).cast("long"),
              b_est).alias("only_b_est"),
    )


# ---------------------------------------------------------------------------
# heavy hitters (approx_top_k sketches) — "top domains/tokens per snapshot"
# ---------------------------------------------------------------------------

def topk_sketch_table(
    df: DataFrame,
    value_col: str,
    by: list[str] | None = None,
    max_items: int = 10_000,
) -> DataFrame:
    """Per-group heavy-hitter sketch of ``value_col`` —
    ``(*by, ksketch)`` — via Spark 4's ``approx_top_k_accumulate``
    (mergeable frequent-items state, map-side combinable). The fourth
    corpus-accounting sketch: "which domains/tokens/templates dominate
    this snapshot", updatable per snapshot and rolled up with
    :func:`merge_topk_tables` without re-scanning history.
    ``max_items`` bounds tracked-item state (items beyond it can be
    under-counted — the standard frequent-items trade; size it ≫ the k
    you will read)."""
    if max_items < 1:
        raise ValueError(f"max_items must be >= 1, got {max_items}")
    by = by or []
    # approx_top_k_* are SQL-only (no F. binding); alias the value
    # column to a fixed name first so arbitrary column names (spaces,
    # dots, backtick-needing) never splice into SQL text (r8 review)
    src = df.select(*by, F.col(value_col).alias("__topk_v"))
    agg = F.expr(
        f"approx_top_k_accumulate(__topk_v, {int(max_items)})"
    ).alias("ksketch")
    return src.groupBy(*by).agg(agg) if by else src.agg(agg)


def merge_topk_tables(
    tables: list[DataFrame],
    by: list[str] | None = None,
    max_items: int = 10_000,
) -> DataFrame:
    """Union heavy-hitter sketch tables into a ``(*by, ksketch)`` rollup
    (``approx_top_k_combine``); same hierarchy semantics as the other
    sketch merges."""
    if not tables:
        raise ValueError("merge_topk_tables needs at least one table")
    by = by or []
    proj = [t.select(*by, "ksketch") for t in tables]
    u = proj[0]
    for t in proj[1:]:
        u = u.unionByName(t)
    agg = F.expr(
        f"approx_top_k_combine(ksketch, {int(max_items)})").alias("ksketch")
    return u.groupBy(*by).agg(agg) if by else u.agg(agg)


def topk_estimates(table: DataFrame, k: int = 10) -> DataFrame:
    """Explode a heavy-hitter sketch table into its top-``k`` items:
    ``(*keys, item, count, rank)`` — one row per heavy hitter per
    group."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    keys = [c for c in table.columns if c != "ksketch"]
    return (
        table.select(
            *keys,
            F.posexplode(F.expr(f"approx_top_k_estimate(ksketch, {int(k)})"))
            .alias("__rank0", "__it"))
        .select(*keys, F.col("__it.item").alias("item"),
                F.col("__it.count").alias("count"),
                (F.col("__rank0") + 1).cast("int").alias("rank"))
    )


def quantile_estimates(
    table: DataFrame, quantiles: list[float] | None = None
) -> DataFrame:
    """Materialize percentile columns from a stored quantile-sketch
    table: one ``q<percent>`` column per requested rank (default
    p50/p90/p99) plus the stream length ``n``."""
    qs = quantiles if quantiles is not None else [0.5, 0.9, 0.99]
    for q in qs:
        if not (0.0 <= q <= 1.0):
            raise ValueError(f"quantile ranks must be in [0, 1], got {q}")
    out = table.withColumn(
        "n", F.kll_sketch_get_n_double("qsketch").cast("long"))
    for q in qs:
        pct = q * 100
        name = (f"q{int(pct)}" if float(pct).is_integer()
                else f"q{str(q)[2:]}")
        out = out.withColumn(
            name,
            F.kll_sketch_get_quantile_double("qsketch", F.lit(float(q))))
    return out
