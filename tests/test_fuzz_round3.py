"""Randomized differential tests for the round-3 primitives: word_ngrams,
pack_chunks bookkeeping, $bucketAuto granularity snapping, and the
md5-mode MinHash base hash — each against a pure-Python reference over the
same rows, evaluated in one Spark job per suite."""

from __future__ import annotations

import hashlib
import random

import pytest
from pyspark.sql import functions as F

from aggo_spark import Engine
from aggo_spark.operators import text
from aggo_spark.operators.stages import _GRANULARITIES, _R_SERIES

# marked slow (r14): excluded from the default driver gate, run with -m slow
pytestmark = pytest.mark.slow


SEED = 20260813


def _py_ngrams(toks: list[str], n: int) -> list[str]:
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def test_word_ngrams_matches_python(spark):
    rng = random.Random(SEED)
    rows = []
    for i in range(60):
        toks = [rng.choice("ab cd efg h ij klm".split())
                for _ in range(rng.randint(0, 12))]
        rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, "id long, text string")
    for n in (1, 2, 3, 5):
        got = {
            r["id"]: r["g"]
            for r in df.select(
                "id", text.word_ngrams(text.tokens(F.col("text")), n).alias("g")
            ).collect()
        }
        for i, t in rows:
            toks = [x for x in t.split(" ") if x]
            assert got[i] == _py_ngrams(toks, n), (i, n, toks)


def test_minhash_md5_base_hash_matches_python(spark):
    from aggo_spark.operators.dedup import _MAX31, _base_hash

    rng = random.Random(SEED)
    words = ["".join(rng.choice("abcdefgh") for _ in range(rng.randint(1, 10)))
             for _ in range(50)]
    df = spark.createDataFrame([(w,) for w in words], "s string")
    got = {r["s"]: r["h"] for r in
           df.select("s", _base_hash(F.col("s"), "md5").alias("h")).collect()}
    for w in words:
        expect = int(hashlib.md5(w.encode()).hexdigest()[:15], 16) % _MAX31
        assert got[w] == expect, w


@pytest.mark.parametrize("granularity", sorted(_GRANULARITIES))
def test_bucket_auto_series_snapping(spark, granularity):
    """Every emitted boundary must lie on the series (scaled by a power of
    ten / two), boundaries strictly increase, and counts cover all rows."""
    rng = random.Random(SEED)
    vals = [round(rng.uniform(0.5, 9000.0), 3) for _ in range(80)]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "id long, v double")
    eng = Engine({"t": df})
    out = eng.aggregate("t", [
        {"$bucketAuto": {"groupBy": "$v", "buckets": 5,
                         "granularity": granularity}},
    ]).collect()
    assert sum(r["count"] for r in out) == len(vals)
    bounds = [out[0]["_id"]["min"]] + [r["_id"]["max"] for r in out]
    assert bounds == sorted(set(bounds))  # strictly increasing
    if granularity == "POWERSOF2":
        import math
        for b in bounds:
            assert b > 0 and abs(math.log2(b) - round(math.log2(b))) < 1e-9, b
    else:
        series = _R_SERIES[granularity]
        for b in bounds:
            # mantissa must match a series value (within float tolerance)
            m = b
            while m >= 10:
                m /= 10
            while m < 1:
                m *= 10
            assert any(abs(m - s) < 1e-6 * max(1.0, s) for s in series), (b, m)
    assert bounds[0] <= min(vals) and bounds[-1] > max(vals)
