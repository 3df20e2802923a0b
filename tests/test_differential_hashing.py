"""Differential verification of the hash-seeded dedup operators.

q32 (MinHash LSH) and q33 (SimHash) are rows-only in the driver's
correctness gate because DuckDB has no xxhash64 — so the algorithms would
otherwise be self-certified. This suite re-implements XXH64, MinHash, and
SimHash in pure Python (from the published XXH64 spec) and asserts
bit-exact equality with the Spark columnar implementations on a real
document sample (VERDICT r01 next-step #5).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from aggo_spark.operators import dedup
from aggo_spark.operators.dedup import _MAX31, _perm_params

# The pure-Python XXH64 mirror lives in the package (r4: it now serves the
# index-search bucket computation, functions/pyhash.py) — this suite is what
# pins it bit-exact against the JVM implementation.
from aggo_spark.functions.pyhash import bucket_of, xxh64, xxh64_signed


# ---------------------------------------------------------------------------
# pure-Python reference text pipeline (mirrors operators/text.py)
# ---------------------------------------------------------------------------

def _normalize(s: str) -> str:
    import re

    return re.sub(r" +", " ", re.sub(r"[^a-z0-9 ]", " ", s.lower())).strip()


def _char_shingles(s: str, k: int = 5) -> list[str]:
    n = _normalize(s)
    return [n[i : i + k] for i in range(max(len(n) - k + 1, 0))]


def _tokens(s: str) -> list[str]:
    return [t for t in _normalize(s).split(" ") if t]


def _word_shingles(s: str, k: int = 3) -> list[str]:
    # mirrors explode_shingles(unit="word"): split the normalized text on
    # single spaces (no empty-token filter — normalize collapses runs)
    w = _normalize(s).split(" ")
    return [" ".join(w[i : i + k]) for i in range(max(len(w) - k + 1, 0))]


def py_minhash(text: str, num_perm: int = 64, k: int = 5, seed: int = 42,
               unit: str = "char"):
    mk = _char_shingles if unit == "char" else _word_shingles
    shingles = set(mk(text, k))
    if not shingles:
        return None
    hs = [xxh64_signed(s) % _MAX31 for s in shingles]
    return [
        min((a * h + b) % _MAX31 for h in hs) for a, b in _perm_params(num_perm, seed)
    ]


def py_simhash(text: str) -> int:
    toks = _tokens(text)
    n = len(toks)
    hashes = [xxh64(t.encode("utf-8")) for t in toks]  # unsigned ≡ 2's-compl bits
    counts = [sum((h >> i) & 1 for h in hashes) for i in range(64)]
    out = 0
    for i in range(64):
        if counts[i] * 2 >= n:
            out |= 1 << i
    return out - (1 << 64) if out >= (1 << 63) else out


# ---------------------------------------------------------------------------
# differential tests
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def sample(spark):
    from aggo_spark import load_tables

    docs = load_tables(spark, "/root/testdata/sf0.001", names=["documents"])["documents"]
    return docs.select("doc_id", "text").orderBy("doc_id").limit(50)


def test_xxh64_matches_spark(spark):
    cases = ["", "a", "hello", "the quick brown fox", "x" * 31, "y" * 32,
             "z" * 100, "héllo wörld", "0123456789abcdef"]
    got = (
        spark.createDataFrame([(c,) for c in cases], "s string")
        .select("s", F.xxhash64("s").alias("h"))
        .collect()
    )
    for r in got:
        assert xxh64_signed(r["s"]) == r["h"], f"xxh64 mismatch on {r['s']!r}"


def test_bucket_of_matches_spark_pmod(spark):
    from aggo_spark.operators.search import N_BUCKETS

    cases = ["", "a", "token", "the", "lorem", "héllo", "x" * 40]
    got = (
        spark.createDataFrame([(c,) for c in cases], "s string")
        .select("s", F.pmod(F.xxhash64("s"), F.lit(N_BUCKETS)).alias("b"))
        .collect()
    )
    for r in got:
        assert bucket_of(r["s"], N_BUCKETS) == r["b"], f"bucket mismatch on {r['s']!r}"


def test_minhash_signatures_match_python(sample):
    spark_sigs = {
        r["id"]: list(r["sig"])
        for r in dedup.minhash_signatures(sample, "text", "doc_id").collect()
    }
    pdocs = {r["doc_id"]: r["text"] for r in sample.collect()}
    py_sigs = {d: py_minhash(t) for d, t in pdocs.items()}
    py_sigs = {d: s for d, s in py_sigs.items() if s is not None}
    assert set(spark_sigs) == set(py_sigs)
    for d in py_sigs:
        assert spark_sigs[d] == py_sigs[d], f"signature mismatch for doc {d}"


def test_minhash_word_shingles_match_python(sample):
    spark_sigs = {
        r["id"]: list(r["sig"])
        for r in dedup.minhash_signatures(
            sample, "text", "doc_id", k=3, unit="word"
        ).collect()
    }
    pdocs = {r["doc_id"]: r["text"] for r in sample.collect()}
    py_sigs = {d: py_minhash(t, k=3, unit="word") for d, t in pdocs.items()}
    py_sigs = {d: s for d, s in py_sigs.items() if s is not None}
    assert set(spark_sigs) == set(py_sigs)
    for d in py_sigs:
        assert spark_sigs[d] == py_sigs[d], f"word-shingle sig mismatch for doc {d}"


def test_minhash_column_form_matches_scale_form(sample):
    """The interpreted zip_with form and the codegen groupBy form must agree."""
    col_form = {
        r["doc_id"]: list(r["sig"])
        for r in sample.select(
            "doc_id", dedup.minhash_signature(F.col("text")).alias("sig")
        ).collect()
        if r["sig"]
    }
    scale_form = {
        r["id"]: list(r["sig"])
        for r in dedup.minhash_signatures(sample, "text", "doc_id").collect()
    }
    for d, sig in scale_form.items():
        assert col_form[d] == sig


def test_simhash_matches_python(sample):
    spark_sh = {
        r["doc_id"]: r["sh"]
        for r in sample.select(
            "doc_id", dedup.simhash(F.col("text")).alias("sh")
        ).collect()
    }
    for d, t in {r["doc_id"]: r["text"] for r in sample.collect()}.items():
        assert spark_sh[d] == py_simhash(t), f"simhash mismatch for doc {d}"


def test_simhash_table_matches_column_form(sample, spark):
    """The codegen scale path (simhash_table: explode + per-bit sum aggs)
    must be bit-for-bit the Column HOF form, in both hash modes — including
    the empty-doc all-ones majority vote (0*2 >= 0 sets every bit) and the
    NULL-text → NULL fingerprint propagation (review r4: explode_outer
    emits the same NULL token for an empty and a NULL array, so the table
    form must track text nullness explicitly)."""
    with_empty = sample.union(
        spark.createDataFrame([(999999, ""), (999998, None)],
                              "doc_id bigint, text string"))
    for mode in ("xxhash64", "md5"):
        col_form = {
            r["doc_id"]: r["sh"]
            for r in with_empty.select(
                "doc_id", dedup.simhash(F.col("text"), hash_fn=mode).alias("sh")
            ).collect()
        }
        tbl_form = {
            r["id"]: r["sh"]
            for r in dedup.simhash_table(with_empty, hash_fn=mode).collect()
        }
        assert tbl_form == col_form, f"simhash_table diverges in {mode} mode"
        nbits = 64 if mode == "xxhash64" else 60
        allones = -1 if nbits == 64 else (1 << nbits) - 1
        assert tbl_form[999999] == allones
        assert tbl_form[999998] is None
