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

__all__ = [
    "build_text_index", "search_with_index", "query_tokens",
    "build_trigram_index", "regex_search_with_index",
]

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


# ---------------------------------------------------------------------------
# trigram index for $regex (reference regex-search.ts:99+ / bloom-filter.ts)
# ---------------------------------------------------------------------------

def _raw_char_grams(col, n: int = 3):
    """Raw (un-normalized) character n-grams — regexes match raw text, so
    unlike the $text tokenizer this must not lowercase or strip anything."""
    ln = F.length(col)
    idx = F.when(ln >= n, F.sequence(F.lit(1), ln - F.lit(n - 1))).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(idx, lambda i: col.substr(i, F.lit(n)))


def build_trigram_index(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    path: str | None = None,
) -> DataFrame:
    """(gram, gram_bucket, id) posting rows, one per distinct (doc, trigram).

    The distributed analogue of the reference's per-document trigram Bloom
    filters (``bloom-filter.ts:15-371``): instead of probing n in-memory
    filters, candidate ids fall out of an equi semi-join against a posting
    table whose files are partitioned by gram bucket (partition pruning ≈
    the Bloom gate's "definitely absent" fast path).
    """
    postings = (
        df.select(F.col(id_col).alias("id"),
                  F.explode(F.array_distinct(_raw_char_grams(F.col(text_col)))).alias("gram"))
        .distinct()
        .withColumn("gram_bucket", F.pmod(F.xxhash64("gram"), F.lit(N_BUCKETS)))
    )
    if path:
        postings.write.mode("overwrite").partitionBy("gram_bucket").parquet(path)
        return df.sparkSession.read.parquet(path)
    return postings


def regex_search_with_index(
    df: DataFrame, index: DataFrame, pattern: str, options: str = "",
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Rows whose ``text_col`` matches ``pattern``, pruned via the trigram
    index before any corpus text is read.

    Plan: required literals → trigrams → posting-table filter (partition-
    pruned, AND semantics over distinct grams) → semi-join ids → exact
    ``rlike`` on the survivors only. Patterns that yield no trigram
    (alternations, pure wildcards, case-insensitive) fall back to the
    scan strategy — which still carries the contains() prefilter from
    functions/regex_prefilter when literals exist.
    """
    from ..functions.match import match_to_column
    from ..plans.context import ExprContext
    from ..functions.regex_prefilter import _parse, required_literals

    exact = match_to_column({text_col: {"$regex": pattern, "$options": options}},
                            ExprContext(schema=df.schema))
    _tree, ci = _parse(pattern, options)
    lits = [] if ci else required_literals(pattern, options)  # index is case-exact
    grams = sorted({l[i:i + 3] for l in lits for i in range(len(l) - 2)})
    if not grams:
        return df.filter(exact)
    spark = df.sparkSession
    buckets = [
        r["b"]
        for r in spark.createDataFrame([(g,) for g in grams], "g string")
        .select(F.pmod(F.xxhash64("g"), F.lit(N_BUCKETS)).alias("b"))
        .distinct()
        .collect()
    ]
    hits = (
        index.filter(F.col("gram_bucket").isin(buckets))
        .filter(F.col("gram").isin(grams))
        .groupBy("id")
        .agg(F.count_distinct("gram").alias("__ng"))
        .filter(F.col("__ng") == len(grams))
        .select(F.col("id").alias(id_col))
    )
    return df.join(hits, id_col, "left_semi").filter(exact)
