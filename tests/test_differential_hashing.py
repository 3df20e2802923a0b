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

# ---------------------------------------------------------------------------
# pure-Python XXH64 (public algorithm; Spark's xxhash64 = XXH64(utf8, seed=42)
# returned as a signed 64-bit long)
# ---------------------------------------------------------------------------

_M64 = (1 << 64) - 1
_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M64, 31) * _P1) & _M64


def xxh64(data: bytes, seed: int = 42) -> int:
    n, i = len(data), 0
    if n >= 32:
        v1, v2 = (seed + _P1 + _P2) & _M64, (seed + _P2) & _M64
        v3, v4 = seed & _M64, (seed - _P1) & _M64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_rotl(h ^ k, 27) * _P1) + _P4) & _M64
        i += 8
    if i + 4 <= n:
        h = ((_rotl(h ^ ((int.from_bytes(data[i : i + 4], "little") * _P1) & _M64), 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & _M64), 11) * _P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def xxh64_signed(s: str, seed: int = 42) -> int:
    h = xxh64(s.encode("utf-8"), seed)
    return h - (1 << 64) if h >= (1 << 63) else h


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
