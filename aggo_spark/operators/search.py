"""Full-text search: scan strategy (see functions/match.py `$text`) plus an
opt-in inverted-index materialization.

The reference accelerates `$text` with an in-process Bloom-prefiltered
inverted index (``/root/reference/src/aggo/text-search.ts:87+``). The Spark
re-expression is a *posting-list table* — `(token, doc_id)` rows — because
that is the shape a distributed engine can join, prune, and persist:

- build: explode distinct tokens per doc (codegen), one shuffle to cluster
  by token. Persisted with `partitionBy(token_bucket)` so a query prunes
  file groups — the parquet-native analogue of the reference's Bloom gate.
- query (AND semantics, like the reference's all-tokens match): filter the
  index to the query's tokens (partition-pruned), count distinct tokens per
  doc, keep docs matching all tokens, semi-join back to the corpus. No
  full-corpus scan touches text at query time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import normalize_text, tokens

__all__ = ["build_text_index", "search_with_index", "query_tokens"]

N_BUCKETS = 64


def query_tokens(query: str) -> list[str]:
    import re

    norm = re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", " ", query.lower())).strip()
    return sorted({t for t in norm.split(" ") if t})


def build_text_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    path: str | None = None,
) -> DataFrame:
    """(token, token_bucket, id) posting rows, one per distinct (doc, token).

    ``path`` writes the index partitioned by token_bucket (64 buckets) so
    lookups prune ~63/64 of the files; returns the (re-read) index frame.
    """
    postings = (
        df.select(F.col(id_col).alias("id"),
                  F.explode(tokens(F.col(text_col))).alias("token"))
        .distinct()
        .withColumn("token_bucket", F.pmod(F.xxhash64("token"), F.lit(N_BUCKETS)))
    )
    if path:
        postings.write.mode("overwrite").partitionBy("token_bucket").parquet(path)
        return df.sparkSession.read.parquet(path)
    return postings


def search_with_index(
    df: DataFrame, index: DataFrame, query: str, id_col: str = "doc_id"
) -> DataFrame:
    """Documents containing ALL query tokens, via the posting table.

    Plan: token-bucket + token filters reach the index scan (partition
    pruning + predicate pushdown), per-doc distinct-token count == number
    of query tokens, then a semi join back to the corpus — the corpus'
    text column is never read at query time.
    """
    toks = query_tokens(query)
    if not toks:
        return df
    spark = df.sparkSession
    # token_bucket values for partition pruning; xxhash64 must match Spark's
    # own implementation, so compute them with one tiny Spark job
    buckets = [
        r["b"]
        for r in spark.createDataFrame([(t,) for t in toks], "t string")
        .select(F.pmod(F.xxhash64("t"), F.lit(N_BUCKETS)).alias("b"))
        .distinct()
        .collect()
    ]
    hits = (
        index.filter(F.col("token_bucket").isin(buckets))  # partition pruning
        .filter(F.col("token").isin(toks))                 # pushed to scan
        .groupBy("id")
        .agg(F.count_distinct("token").alias("__nt"))
        .filter(F.col("__nt") == len(toks))
        .select(F.col("id").alias(id_col))
    )
    return df.join(hits, id_col, "left_semi")
