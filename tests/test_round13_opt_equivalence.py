"""Round 13 (optimization): equivalence pins for operator-internal swaps.

Two r13-opt changes replaced expressions inside hot aggregates with
cheaper forms that are only equivalent under preconditions proved in the
code comments. These tests pin the equivalence itself, so a future edit
that breaks a precondition (e.g. lets a negative value reach the plain
``%``) fails here instead of silently changing signatures.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from aggo_spark.operators.dedup import (
    _MAX31,
    _base_hash,
    _perm_params,
    explode_shingles,
    minhash_signatures,
    simhash_table,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again"),
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "pack my box with five dozen liquor jugs right now please ok"),
    (3, "completely different content that shares nothing with others"),
    (4, ""),          # no shingles -> no signature row
    (5, None),        # NULL text
    (6, "zzzz ÿþ unicode edge 中文 tokens mixed in"),
]


class TestMinhashRemainderEqualsPmod:
    def test_signatures_match_explicit_pmod_form(self, spark):
        """The scale path uses plain ``%`` (Remainder); rebuild the
        signature aggregate with ``F.pmod`` (the pre-r13 form) from the
        same params and assert row-identical output."""
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        num_perm, k = 16, 3
        got = (minhash_signatures(df, num_perm=num_perm, k=k)
               .orderBy("id").collect())

        params = _perm_params(num_perm)
        ex = explode_shingles(df, "text", "doc_id", k).select(
            "id", _base_hash(F.col("s"), "xxhash64").alias("h"))
        aggs = [
            F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b),
                         F.lit(_MAX31))).alias(f"m{i}")
            for i, (a, b) in enumerate(params)
        ]
        ref = (ex.groupBy("id").agg(*aggs)
               .select("id", F.array(*[f"m{i}" for i in range(num_perm)])
                       .alias("sig"))
               .orderBy("id").collect())
        assert [r.asDict() for r in got] == [r.asDict() for r in ref]
        # empty/NULL docs produce no signature rows (ids 4 and 5)
        assert [r["id"] for r in got] == [0, 1, 2, 3, 6]

    def test_precondition_bounds_no_overflow(self):
        """a*h+b stays non-negative and < 2^63 at the extreme corner, so
        Remainder == Pmod everywhere the aggregate evaluates."""
        params = _perm_params(256)
        h_max = _MAX31 - 1
        for a, b in params:
            assert 1 <= a < _MAX31 and 0 <= b < _MAX31
            worst = a * h_max + b
            assert 0 <= worst < (1 << 63)
            assert worst % _MAX31 == worst - (worst // _MAX31) * _MAX31

    def test_base_hash_is_non_negative(self, spark):
        """The plain-% rewrite is safe only while _base_hash keeps its
        pmod (xxhash64 itself can be negative)."""
        df = spark.createDataFrame(
            [("a",), ("édge",), ("",), ("0",)], "s string")
        rows = df.select(
            _base_hash(F.col("s"), "xxhash64").alias("h1"),
            _base_hash(F.col("s"), "md5").alias("h2")).collect()
        for r in rows:
            assert 0 <= r["h1"] < _MAX31
            assert 0 <= r["h2"] < _MAX31


class TestSimhashMaxCarryEqualsFirst:
    def test_fingerprints_match_first_carry_form(self, spark):
        """r13-opt swapped the per-doc ``tnull`` carry from first() to
        max() (equivalent: tnull is functionally dependent on the id).
        Pin NULL/empty/regular docs against a first()-carry rebuild."""
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        got = {r["id"]: r["sh"]
               for r in simhash_table(df, "text", "doc_id").collect()}
        # NULL text -> NULL fingerprint; empty text -> all-ones (every
        # bit ties 0*2 >= 0); duplicate docs share a fingerprint
        assert got[5] is None
        assert got[4] == -1
        assert got[0] == got[1]
        assert got[2] is not None and got[2] != got[0]

        from aggo_spark.operators.text import tokens
        h = F.when(F.col("tk").isNotNull(), F.xxhash64(F.col("tk")))
        ex = df.select(
            F.col("doc_id").alias("id"),
            F.col("text").isNull().alias("tnull"),
            F.explode_outer(tokens(F.col("text"))).alias("tk"),
        ).select("id", "tnull", h.alias("h"))
        aggs = [
            F.coalesce(
                F.sum(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1))),
                F.lit(0)).alias(f"c{i}")
            for i in range(64)
        ]
        cnt = ex.groupBy("id").agg(
            F.count(F.col("h")).alias("n"),
            F.first("tnull").alias("tnull"), *aggs)
        pow2 = [1 << i if i < 63 else -(1 << 63) for i in range(64)]
        sh = F.lit(0).cast("long")
        for i in range(64):
            sh = sh.bitwiseOR(
                F.when(F.col(f"c{i}") * 2 >= F.col("n"),
                       F.lit(pow2[i]).cast("long"))
                .otherwise(F.lit(0).cast("long")))
        ref = {r["id"]: r["sh"] for r in cnt.select(
            "id", F.when(~F.col("tnull"), sh).alias("sh")).collect()}
        assert got == ref
