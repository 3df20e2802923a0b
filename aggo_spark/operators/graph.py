"""Link-graph operators — crawl prioritization over page link structure.

A crawl-curation pipeline ranks URLs by link structure (which pages to
fetch next, which to keep when budgets bind — the classic crawl
frontier signal). This module supplies the two standard pieces,
Spark-first:

- :func:`extract_links` — (src, dst) edges from an HTML column: one
  pure-Column ``regexp_extract_all`` over ``href`` attributes +
  explode. Absolute http(s) links only (relative-URL resolution needs
  the base URL's directory semantics; production resolves upstream or
  joins ``text.canonicalize_url``), fragments stripped, deduplicated.
- :func:`pagerank` — damped PageRank by iterative DataFrame joins:
  per-iteration one equi-join (edges x ranks on src), one aggregate
  on dst, and a bounded dangling-mass aggregate; every iteration
  localCheckpoints so the plan stays ONE join deep (no
  exponential lineage growth in the analyzer). At
  1000 executors this is the standard GraphX-free PageRank shape:
  shuffle cost is one exchange per iteration on the dst key, and the
  rank state never visits the driver (the dangling mass is a single
  scalar aggregate).

Driver-contract: q89 routes arithmetic link structure through the REAL
href extraction and 10 PageRank iterations and hash-matches a DuckDB
oracle that unrolls the same iterations in SQL (__spark_entry__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["extract_links", "pagerank"]

_HREF_RE = r'''(?i)<a[^>]{0,2048}?href\s*=\s*["']?(https?://[^"'\s>#]+)'''


def extract_links(
    df: DataFrame,
    html_col: str = "text",
    url_col: str = "url",
) -> DataFrame:
    """(src, dst) edges: every absolute http(s) ``href`` in
    ``html_col``, fragment stripped, distinct. Pure Column (regexp +
    explode), no UDF; pages without links contribute no rows."""
    return (df.select(
        F.col(url_col).alias("src"),
        F.explode(F.regexp_extract_all(html_col, F.lit(_HREF_RE), 1))
        .alias("dst"))
        .distinct())


def pagerank(
    edges: DataFrame,
    n_iter: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """(node, rank) after ``n_iter`` damped PageRank iterations over
    the DISTINCT edge set. Dangling nodes (no out-edges) redistribute
    their mass uniformly; ranks sum to 1 at every iteration. Each
    iteration materializes via ``localCheckpoint`` (persist alone
    keeps the full nested lineage in the logical plan — analyzer
    cost grows per iteration even though execution reads cache) so
    the plan stays one join deep — the loop is driver-side control
    flow over distributed state, never a driver collect of ranks."""
    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .distinct())
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct())
    nodes = nodes.persist()
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # edge weight 1/outdeg, precomputed once
    w = e.join(outdeg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("deg")).alias("w"))
    w = w.persist()
    w.count()
    has_out = outdeg.select(F.col("src").alias("node"))

    # iterative state carries via localCheckpoint: persist alone keeps
    # the FULL nested lineage in the logical plan (analyzer cost and
    # plan size grow per iteration even though execution reads cache);
    # checkpointing truncates it, so every iteration's plan is exactly
    # one join deep
    ranks = (nodes.withColumn("rank", F.lit(1.0 / n))
             .localCheckpoint(eager=True))
    base = (1.0 - damping) / n
    # the DANGLING SET is static (the node/edge structure never
    # changes); only its mass moves. When it is empty — the common
    # well-linked-graph case — the per-iteration mass aggregate (a
    # full extra job) is skipped entirely.
    dangling_nodes = nodes.join(has_out, "node", "left_anti").persist()
    n_dangling = dangling_nodes.count()
    for _ in range(n_iter):
        dangling = 0.0
        if n_dangling:
            dangling = (ranks.join(dangling_nodes, "node", "left_semi")
                        .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                        .collect()[0][0])
        contrib = (w.join(ranks.withColumnRenamed("node", "src"), "src")
                   .groupBy("dst")
                   .agg(F.sum(F.col("w") * F.col("rank")).alias("rin"))
                   .withColumnRenamed("dst", "node"))
        new_ranks = (nodes.join(contrib, "node", "left")
                     .select("node",
                             (F.lit(base)
                              + F.lit(damping)
                              * (F.coalesce(F.col("rin"), F.lit(0.0))
                                 + F.lit(dangling / n)))
                             .alias("rank")))
        ranks = new_ranks.localCheckpoint(eager=True)
    nodes.unpersist()
    w.unpersist()
    dangling_nodes.unpersist()
    return ranks
