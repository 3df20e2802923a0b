"""$regex scan prefilter (required-literal contains) + trigram index.

The prefilter must be a *necessary condition*: it may never exclude a row
the regex would match. Soundness is property-tested in pure Python against
re.search (rlike has the same find-anywhere semantics), then the Spark
wiring is checked for result-equivalence and for parquet pushdown of the
derived StringContains filters.
"""

from __future__ import annotations

import random
import re
import string

import pytest
from pyspark.sql import functions as F

from aggo_spark import aggregate
from aggo_spark.functions.regex_prefilter import regex_prefilter, required_literals

PATTERNS = [
    (r"hello", ""),
    (r"^foo.*bar$", ""),
    (r"(abc)+", ""),
    (r"colou?r", ""),
    (r"err(or|ors) code=(\d+)", ""),
    (r"user_[0-9]+@example\.com", ""),
    (r"(?:prefix)suffix", ""),
    (r"a{2,5}bcd", ""),
    (r"\bword\b", ""),
    (r"HeLLo", "i"),
    (r"(?i)MiXeD", ""),
    (r"foo|bar", ""),      # alternation: no required literal
    (r"x*y*z*", ""),       # all-optional: no required literal
]


def _py_flags(options: str) -> int:
    f = 0
    for ch, fl in (("i", re.I), ("m", re.M), ("s", re.S), ("x", re.X)):
        if ch in options:
            f |= fl
    return f


def test_required_literals_are_necessary_conditions():
    """Fuzz: any string re.search matches must contain every extracted
    literal (case-normalized when the pattern is case-insensitive)."""
    rng = random.Random(7)
    alphabet = string.ascii_letters + string.digits + " _@.=-"
    corpus = ["".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
              for _ in range(300)]
    # seed strings that actually match each pattern
    corpus += ["hello there", "foo middle bar", "abcabc", "colour color",
               "error code=42 errors code=7", "user_123@example.com",
               "prefixsuffix", "aaabcd", "a word here", "heLLo", "mixed MiXeD",
               "foo", "bar", "xyz", ""]
    for pattern, options in PATTERNS:
        rx = re.compile(pattern, _py_flags(options))
        lits = required_literals(pattern, options)
        ci = bool(rx.flags & re.I)
        for s in corpus:
            if rx.search(s) is None:
                continue
            hay = s.lower() if ci else s
            for lit in lits:
                needle = lit.lower() if ci else lit
                assert needle in hay, (
                    f"{pattern!r} matched {s!r} but required literal {lit!r} absent")


def test_prefilter_preserves_match_results(spark):
    docs = [
        {"_id": i, "t": t}
        for i, t in enumerate([
            "hello there", "foo middle bar", "say foobar", "abcabc", "xabc",
            "colour", "color", "colr", "error code=42", "errors code=7",
            "user_123@example.com", "user_@example.com", "prefixsuffix",
            "aaabcd", "abcd", "a word here", "sword", "heLLo", "HELLO x",
            "mixed MiXeD", "foo", "bar", "baz", "", "xyz",
        ])
    ]
    df = spark.createDataFrame(docs)
    for pattern, options in PATTERNS:
        spec = {"$regex": pattern}
        if options:
            spec["$options"] = options
        got = {r["_id"] for r in aggregate(df, [{"$match": {"t": spec}}]).collect()}
        # plain rlike without the prefilter = ground truth
        jpat = (f"(?{options})" if options else "") + pattern
        want = {r["_id"] for r in df.filter(F.col("t").rlike(jpat)).collect()}
        assert got == want, f"prefilter changed results for {pattern!r}"


def test_prefilter_pushes_string_contains_to_parquet(spark, tmp_path):
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [{"_id": i, "t": f"row {i} user_{i}@example.com"} for i in range(50)]
    ).write.parquet(p)
    df = spark.read.parquet(p)
    out = aggregate(df, [{"$match": {"t": {"$regex": r"user_[0-9]+@example\.com"}}}])
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert "StringContains" in plan, plan


def test_regex_search_with_index_agrees_with_scan(spark):
    from aggo_spark.operators.search import build_trigram_index, regex_search_with_index

    docs = [
        {"doc_id": i, "text": t}
        for i, t in enumerate([
            "the quick brown fox", "error code=99 in log", "user_7@example.com",
            "nothing to see", "prefixsuffix and more", "errors code=3",
            "Code=5 uppercase", "user_@example.com broken", "",
        ])
    ]
    df = spark.createDataFrame(docs)
    idx = build_trigram_index(df)
    for pattern, options in [
        (r"err(or|ors) code=(\d+)", ""),
        (r"user_[0-9]+@example\.com", ""),
        (r"quick.*fox", ""),
        (r"code=\d", "i"),   # ci → index fallback path
        (r"foo|bar", ""),    # no grams → fallback path
    ]:
        got = {r["doc_id"]
               for r in regex_search_with_index(df, idx, pattern, options).collect()}
        jpat = (f"(?{options})" if options else "") + pattern
        want = {r["doc_id"] for r in df.filter(F.col("text").rlike(jpat)).collect()}
        assert got == want, f"index strategy diverged for {pattern!r}"
