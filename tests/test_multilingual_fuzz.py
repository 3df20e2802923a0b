"""Property-based fuzz for the multilingual text tier + a full-recipe
integration test.

The normalizer/tokenizer consume arbitrary crawl text: the properties
that matter are (1) normalize is idempotent (a second pass changes
nothing — boundary insertion and punctuation stripping must not feed
each other), (2) tokens never contain whitespace or out-of-charset
characters, (3) unspaced-script bigram tokens are at most 2 codepoints,
and (4) the latin subset behaves exactly like the oracle-pinned
normalize_text. Generated corpora run as ONE Spark job (the
test_crawl_fuzz pattern), not one job per example.
"""
from __future__ import annotations

import pytest

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.conftest import *  # noqa: F401,F403  (spark fixture)

# marked slow (r14): excluded from the default driver gate, run with -m slow
pytestmark = pytest.mark.slow


# mixed-script soup: latin words, CJK runs, cyrillic/greek/arabic/thai
# runs, in-range script punctuation, ascii punctuation, whitespace
_FRAGMENTS = st.one_of(
    st.from_regex(r"[a-zA-Z0-9]{1,8}", fullmatch=True),
    st.from_regex(r"[一-鿿぀-ゟ가-힯]{1,6}", fullmatch=True),
    st.from_regex(r"[а-яё]{1,8}", fullmatch=True),
    st.from_regex(r"[α-ω]{1,8}", fullmatch=True),
    st.from_regex(r"[ا-ي]{1,8}", fullmatch=True),
    st.from_regex(r"[ก-ฮ]{1,8}", fullmatch=True),
    st.sampled_from(["।", "॥", "،", "؟", "۔", ".", ",", "!", "—", "«",
                     " ", "\t", "\n", "  "]),
)
texts = st.lists(_FRAGMENTS, min_size=0, max_size=12).map("".join)


class TestMultilingualNormalizerProperties:
    @settings(max_examples=60, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(texts, min_size=1, max_size=40))
    def test_idempotent_and_token_charset(self, spark, corpus):
        from aggo_spark.operators import text as T

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(corpus)],
            "doc_id long, text string")
        out = df.select(
            T.normalize_text_multilingual(F.col("text")).alias("once"),
        ).select(
            "once",
            T.normalize_text_multilingual(F.col("once")).alias("twice"),
        ).collect()
        allowed = re.compile(
            f"^[a-z0-9 {T.MULTILINGUAL_RANGES}]*$")
        for r in out:
            assert r["once"] == r["twice"], "normalizer not idempotent"
            assert allowed.match(r["once"]), r["once"]
            assert "  " not in r["once"]
            assert r["once"] == r["once"].strip()

    @settings(max_examples=40, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(texts, min_size=1, max_size=30))
    def test_token_shapes(self, spark, corpus):
        from aggo_spark.operators import text as T

        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(corpus)],
            "doc_id long, text string")
        toks = [r["tok"] for r in T.token_table_multilingual(df).collect()]
        unspaced = re.compile(f"^[{T.UNSPACED_RANGES}]")
        for t in toks:
            assert t and " " not in t
            if unspaced.match(t):
                assert len(t) <= 2, f"bigram too long: {t!r}"

    def test_latin_subset_matches_base_normalizer(self, spark):
        from aggo_spark.operators import text as T

        rows = [(i, t) for i, t in enumerate([
            "Plain ASCII text, with punctuation!",
            "MiXeD Case AND   spacing\t\n tabs",
            "", None, "numbers 123 and-dashes_under",
        ])]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = df.select(
            T.normalize_text(F.col("text")).alias("base"),
            T.normalize_text_multilingual(F.col("text")).alias("multi"),
        ).collect()
        for r in got:
            assert r["base"] == r["multi"]


class TestFullRecipeIntegration:
    """The whole FineWeb-shape recipe composed end-to-end on the driver
    parquet: langid (script router) → quality classifier → MinHash
    near-dup → chunk/pack. Schema- and sanity-level assertions; each
    stage's exact values are pinned in its own suite — this test pins
    that the stages COMPOSE."""

    def test_pipeline_composes(self, spark):
        import aggo_spark
        from aggo_spark.operators import classify, dedup, text

        docs = aggo_spark.load_tables(
            spark, "/root/testdata/sf0.001")["documents"]

        lang = text.language_id_table(docs, script_route=True)
        docs2 = docs.join(lang, "doc_id")

        lab = docs2.select(
            "doc_id", "text",
            (F.length("text") > 200).cast("int").alias("label"))
        w, b = classify.train_nb(lab, n_buckets=1024)
        kept = classify.quality_filter(
            docs2, w, b, threshold=0.3, n_buckets=1024)

        pairs = dedup.minhash_lsh_pairs(
            kept, num_perm=32, bands=8, charset="multilingual")
        reps = dedup.exact_dedup(kept)

        chunks = kept.join(reps.select("doc_id"), "doc_id").select(
            "doc_id", F.lit(0).alias("chunk_id"),
            F.length("text").alias("n_chunk_tokens"),
            (F.col("doc_id") % 4).cast("string").alias("shard"))
        packed = text.pack_chunks(
            chunks, tokens_col="n_chunk_tokens", example_size=2048,
            sub_buckets=2)

        n_docs = docs.count()
        n_kept = kept.count()
        n_packed = packed.count()
        assert 0 < n_kept <= n_docs
        assert n_packed == reps.count()
        assert pairs.count() >= 0  # executes the LSH plan end-to-end
        assert {"pack_cum_tokens", "example_id"} <= set(packed.columns)
        assert packed.filter(F.col("example_id") < 0).count() == 0
