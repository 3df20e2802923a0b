"""Similarity search over embedding columns (array<float>).

Two paths:

- brute-force cosine top-k — the correctness baseline. Query set broadcast
  (it's small by construction); one pass over the corpus, per-partition
  partial top-k via window rank. At 100 TB the scan dominates; no shuffle of
  the corpus itself, only of k rows per query per partition.
- sign-bucket (SRP/IVF-style) top-k — the scale path. Every vector gets a
  deterministic coarse code (sign bits of leading dimensions = a fixed
  axis-aligned random-hyperplane LSH); candidates come from the query's
  bucket (optionally hamming-1 neighbors), cutting the scanned fraction to
  ~1/2^bits at some recall cost.

No UDFs: dot products are zip_with + aggregate, codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["cosine", "brute_force_topk", "sign_bucket", "bucketed_topk"]


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Returns (query_id, neighbor_id, score, rank); self-matches excluded.
    ``queries`` is expected small → broadcast join, corpus streamed once.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def sign_bucket(vec: Column, bits: int = 8) -> Column:
    """Deterministic coarse quantization code: sign bits of the first
    ``bits`` dimensions packed into an int (axis-aligned SRP-LSH)."""
    code = F.lit(0)
    for i in range(bits):
        code = code + F.when(F.element_at(vec, i + 1) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return code


def bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: candidates restricted to the query's sign
    bucket (nprobe=1). Same output shape as brute_force_topk; recall < 1.

    The corpus-side bucket column is a pure projection — in a real deployment
    you'd *partition/cluster the table by it* so a probe prunes file groups;
    here it turns the cross join into an equi join on the bucket.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        sign_bucket(F.col(vec_col), bits).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        sign_bucket(F.col(vec_col), bits).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
