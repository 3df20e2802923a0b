"""Round-7 fixes: the five r6 ADVICE findings.

1. rank_fusion max_rank membership caveat (docstring + behavior pinned).
2. quantile_threshold_filter: relative_error > 1 rejected; __thr/__by
   user-column collisions survive.
3. $scoreFusion: a $limit before a row-expanding stage no longer skips the
   maxDocs bound; avg with all-zero weights fuses to 0.0, not NULL.
4. StreamingCollection keyed recompute: array/struct group keys fall back
   to full recompute instead of crashing isin() at flush time.
5. clear_scalar_memo(scope=...): a streaming write burst no longer wipes
   stats memoized over unrelated immutable batch tables.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aggo_spark.functions import scalar_memo


class TestRankFusionMaxRankMembership:
    """advice r6 #1: max_rank changes membership — pinned both ways."""

    def test_default_drops_deep_only_docs_none_keeps_them(self, spark):
        from aggo_spark.operators.similarity import rank_fusion

        l1 = spark.createDataFrame(
            [("a", 1), ("deep", 1500)], "doc_id string, rank int")
        l2 = spark.createDataFrame(
            [("a", 2), ("deep", 2000)], "doc_id string, rank int")
        got_default = {r.doc_id for r in rank_fusion([l1, l2]).collect()}
        assert got_default == {"a"}  # membership change, documented
        got_none = {r.doc_id
                    for r in rank_fusion([l1, l2], max_rank=None).collect()}
        assert got_none == {"a", "deep"}


class TestQuantileThresholdValidation:
    """advice r6 #2: relative_error > 1 must fail fast; internal temp
    columns must not clobber user columns named __thr/__by."""

    def test_relative_error_above_one_rejected(self, spark):
        from aggo_spark.operators.sampling import quantile_threshold_filter

        df = spark.createDataFrame([(1, 0.5)], "id int, score double")
        with pytest.raises(ValueError, match="relative_error"):
            quantile_threshold_filter(df, "score", relative_error=1.5)

    def test_user_columns_named_like_internals_survive(self, spark):
        from aggo_spark.operators.sampling import quantile_threshold_filter

        rows = [(i, float(i), "u", "v") for i in range(10)]
        df = spark.createDataFrame(
            rows, "id int, score double, __thr string, __by string")
        out = quantile_threshold_filter(df, "score", keep_top=0.3)
        assert set(out.columns) == {"id", "score", "__thr", "__by"}
        got = out.orderBy("id").collect()
        # top ~30%: the approx quantile boundary may include the cut row
        assert {r.id for r in got} <= {6, 7, 8, 9}
        assert {8, 9} <= {r.id for r in got}
        assert all(r["__thr"] == "u" and r["__by"] == "v" for r in got)

    def test_user_by_column_with_groups(self, spark):
        from aggo_spark.operators.sampling import quantile_threshold_filter

        rows = [(i, float(i % 5), "g" + str(i % 2), "keep") for i in range(20)]
        df = spark.createDataFrame(
            rows, "id int, score double, src string, __by string")
        out = quantile_threshold_filter(df, "score", keep_top=0.4, by="src")
        assert "__by" in out.columns
        assert out.count() > 0
        assert all(r["__by"] == "keep" for r in out.collect())


class TestScoreFusionBoundAndZeroWeights:
    """advice r6 #3: $limit before $unwind must not skip the maxDocs
    bound; all-zero avg weights must fuse to 0.0, not 0/0 NULL."""

    def test_limit_before_unwind_still_bounded(self, spark):
        from aggo_spark import Engine

        df = spark.createDataFrame(
            [(1, [10, 20, 30])], "doc_id int, items array<int>")
        out = Engine().aggregate(df, [{"$scoreFusion": {
            "input": {"pipelines": {
                # $limit 3 is NOT an output bound: the later $unwind
                # re-expands to 3 rows per doc — maxDocs=2 must re-bound
                "p": [{"$limit": 3},
                      {"$unwind": "$items"},
                      {"$addFields": {"doc_id": "$items",
                                      "score": "$items"}}],
            }, "normalization": "none"},
            "idField": "doc_id",
            "maxDocs": 2,
        }}]).collect()
        assert [r.doc_id for r in out] == [30, 20]  # top-2 by score only

    def test_trailing_limit_still_skips_rebound(self, spark):
        from aggo_spark import Engine

        df = spark.createDataFrame(
            [(1, 3.0), (2, 2.0), (3, 1.0)], "doc_id int, pop double")
        out = Engine().aggregate(df, [{"$scoreFusion": {
            "input": {"pipelines": {
                "p": [{"$addFields": {"score": "$pop"}},
                      {"$sort": {"score": -1}}, {"$limit": 2}],
            }, "normalization": "none"},
            "idField": "doc_id",
            "maxDocs": 1000,
        }}]).collect()
        assert [r.doc_id for r in out] == [1, 2]

    def test_avg_all_zero_weights_gives_zero_not_null(self, spark):
        from aggo_spark import Engine

        df = spark.createDataFrame(
            [(1, 5.0), (2, 1.0)], "doc_id int, pop double")
        out = Engine().aggregate(df, [{"$scoreFusion": {
            "input": {"pipelines": {
                "p": [{"$addFields": {"score": "$pop"}},
                      {"$sort": {"score": -1}}, {"$limit": 5}],
            }, "normalization": "none"},
            "combination": {"weights": {"p": 0.0}, "method": "avg"},
            "idField": "doc_id",
        }}]).collect()
        assert len(out) == 2
        assert all(r.score == 0.0 for r in out)


class TestStreamingArrayGroupKey:
    """advice r6 #4: an array-typed group key is a legal pipeline for the
    recompute path — it must take the FULL path (isin() can't carry array
    literals), not crash at the second flush."""

    def test_array_key_group_full_recompute(self, spark, tmp_path):
        from aggo_spark.streaming.core import StreamingCollection

        sc = StreamingCollection(
            spark, "tags array<string>, v long", workdir=str(tmp_path))
        # $min is non-invertible -> recompute path; _id is a plain field
        # path so keyed_recompute_field would have claimed it pre-fix
        pipeline = [{"$group": {"_id": "$tags", "lo": {"$min": "$v"}}}]
        sc.stream(pipeline, rid="r")
        reg = sc._registered["r"]
        assert reg.keyed_field is None  # array type disqualifies keyed path
        sc.add({"tags": ["a", "b"], "v": 5})
        sc.add({"tags": ["a", "b"], "v": 3})  # second flush: the old crash
        assert reg.last_recompute_mode == "full"
        got = {tuple(r["_id"]): r["lo"] for r in sc.result("r")}
        assert got == {("a", "b"): 3}

    def test_scalar_key_still_keyed(self, spark, tmp_path):
        from aggo_spark.streaming.core import StreamingCollection

        sc = StreamingCollection(
            spark, "k string, v long", workdir=str(tmp_path))
        sc.stream([{"$group": {"_id": "$k", "lo": {"$min": "$v"}}}], rid="r")
        reg = sc._registered["r"]
        assert reg.keyed_field == "k"
        sc.add({"k": "a", "v": 5})
        sc.add({"k": "a", "v": 3})
        assert reg.last_recompute_mode == "keyed"
        assert {r["_id"]: r["lo"] for r in sc.result("r")} == {"a": 3}


class TestScopedScalarMemoClear:
    """advice r6 #5: clearing must be scoped to the mutated source — a
    streaming write burst keeps unrelated batch-table stats memoized."""

    def test_scoped_clear_spares_unrelated_entries(self, spark, tmp_path):
        d1, d2 = str(tmp_path / "t1"), str(tmp_path / "t2")
        spark.range(3).write.parquet(d1)
        spark.range(4).write.parquet(d2)
        df1, df2 = spark.read.parquet(d1), spark.read.parquet(d2)
        calls = {"a": 0, "b": 0}

        def mk(tag):
            def compute():
                calls[tag] += 1
                return calls[tag]
            return compute

        assert scalar_memo.plan_scalar(df1, "r7scope", mk("a")) == 1
        assert scalar_memo.plan_scalar(df2, "r7scope", mk("b")) == 1
        scalar_memo.clear_scalar_memo(scope=d1)
        # df1's entry recomputes, df2's survives
        assert scalar_memo.plan_scalar(df1, "r7scope", mk("a")) == 2
        assert scalar_memo.plan_scalar(df2, "r7scope", mk("b")) == 1
        scalar_memo.clear_scalar_memo()  # unscoped: wipes everything
        assert scalar_memo.plan_scalar(df2, "r7scope", mk("b")) == 2

    def test_streaming_write_spares_batch_stats(self, spark, tmp_path):
        from aggo_spark.streaming.core import StreamingCollection

        batch_dir = str(tmp_path / "batch")
        spark.range(5).write.parquet(batch_dir)
        bdf = spark.read.parquet(batch_dir)
        calls = []
        v = scalar_memo.plan_scalar(
            bdf, "r7batch", lambda: calls.append(1) or 42)
        assert v == 42 and len(calls) == 1
        sc = StreamingCollection(
            spark, "k string, v long", workdir=str(tmp_path / "stream"))
        sc.add({"k": "a", "v": 1})  # write burst: scoped clear only
        v2 = scalar_memo.plan_scalar(
            bdf, "r7batch", lambda: calls.append(1) or 42)
        assert v2 == 42 and len(calls) == 1  # memo survived


class TestByteLevelBPE:
    """judge r6 #3: GPT-2-style byte-level BPE (bytes→unicode table,
    GPT-2 split regex, no </w>) — hand-computed merges, and #4: dropped
    word-mass surfaced when max_vocab_words truncates."""

    def test_hand_computed_byte_merges(self, spark):
        from aggo_spark.operators.tokenize import train_bpe

        # pieces: "aaab" (a,a,a,b) and " aaab" (Ġ,a,a,a,b); Ġ = chr(288)
        # is the byte-0x20 image in the GPT-2 table.
        # round 1: (a,a) count 4 -> merge; round 2: tie (a,b)=2 vs
        # (aa,a)=2 -> lexicographic (a,b); round 3: (aa,ab)=2; round 4:
        # only (Ġ,aaab)=1 < 2 -> stop.
        df = spark.createDataFrame([("aaab aaab",)], "text string")
        got = train_bpe(df, num_merges=10, byte_level=True)
        assert got == [["a", "a"], ["a", "b"], ["aa", "ab"]]

    def test_byte_encode_roundtrip_and_space_marker(self, spark):
        from aggo_spark.operators.tokenize import bpe_encode, train_bpe

        df = spark.createDataFrame([(1, "aaab aaab")], "doc_id int, text string")
        merges = train_bpe(df, num_merges=10, byte_level=True)
        enc = bpe_encode(df, merges, byte_level=True).collect()[0].bpe_tokens
        assert enc == ["aaab", chr(288), "aaab"]  # Ġ carries the space

    def test_gpt2_split_contractions_and_case(self, spark):
        from aggo_spark.operators.tokenize import gpt2_pretokens
        from pyspark.sql import functions as F

        df = spark.createDataFrame([("Don't STOP now",)], "text string")
        got = df.select(gpt2_pretokens(F.col("text")).alias("p")).collect()[0].p
        # contraction split off; case and leading spaces preserved —
        # exactly what word-level tokens() normalizes away
        assert got == ["Don", "'t", " STOP", " now"]

    def test_budget_delta_word_vs_byte_on_documents(self, spark):
        from aggo_spark.operators.tokenize import bpe_token_stats, train_bpe

        docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
                .select("doc_id", "text").limit(40).cache())
        mw = train_bpe(docs, num_merges=30)
        mb = train_bpe(docs, num_merges=30, byte_level=True)
        nw = {r.doc_id: r.n_bpe_real
              for r in bpe_token_stats(docs, mw).collect()}
        nb = {r.doc_id: r.n_bpe_real
              for r in bpe_token_stats(docs, mb, byte_level=True).collect()}
        assert set(nw) == set(nb) and all(v > 0 for v in nw.values())
        # the conventions count differently (punct/space/case survive
        # byte-level pre-tokenization) — a budget computed with the wrong
        # mode is measurably off
        total_w, total_b = sum(nw.values()), sum(nb.values())
        assert total_w != total_b

    def test_vocab_cap_surfaces_dropped_mass(self, spark):
        from aggo_spark.operators.tokenize import train_bpe

        # 5 distinct words, masses 5/4/3/2/1; cap keeps top 3 (mass 12),
        # drops 2 words carrying mass 3 of 15
        text = " ".join(["aa"] * 5 + ["bb"] * 4 + ["cc"] * 3
                        + ["dd"] * 2 + ["ee"])
        df = spark.createDataFrame([(text,)], "text string")
        merges, stats = train_bpe(
            df, num_merges=5, max_vocab_words=3, return_stats=True)
        assert stats == {
            "distinct_words": 5, "kept_words": 3, "dropped_words": 2,
            "total_word_mass": 15, "dropped_word_mass": 3,
            "dropped_mass_frac": 3 / 15,
        }
        # without return_stats the truncation warns instead of silence
        import warnings

        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            train_bpe(df, num_merges=5, max_vocab_words=3)
        assert any("dropped" in str(x.message) for x in w)

    def test_uncapped_run_reports_zero_dropped(self, spark):
        from aggo_spark.operators.tokenize import train_bpe

        df = spark.createDataFrame([("aa bb aa",)], "text string")
        _, stats = train_bpe(df, num_merges=2, return_stats=True)
        assert stats["dropped_words"] == 0
        assert stats["dropped_word_mass"] == 0


class TestIncrementalBpeTrainer:
    """judge r6 'what's wrong' #4: the merge loop was O(num_merges ×
    vocab) full rescans; the incremental trainer (lazy max-heap +
    occurrence index) must be EXACTLY the rescan spec — same merges,
    same tie-breaks, same stops — at O(affected words) per merge."""

    def _vocab_from_texts(self, texts, byte_level=False):
        from collections import Counter

        from aggo_spark.operators.tokenize import _EOW, _byte_syms

        words = Counter(w for t in texts for w in t.split())
        if byte_level:
            return {tuple(_byte_syms(w)): n for w, n in words.items()}
        return {tuple(w) + (_EOW,): n for w, n in words.items()}

    def test_differential_vs_rescan_random_corpora(self):
        import random

        from aggo_spark.operators.tokenize import (_learn_merges,
                                                   _learn_merges_rescan)

        rng = random.Random(7)
        for trial in range(20):
            n_words = rng.randint(1, 60)
            texts = [" ".join(
                "".join(rng.choice("abcde") for _ in range(rng.randint(1, 8)))
                for _ in range(rng.randint(1, 30)))]
            vocab = self._vocab_from_texts(texts)
            for num_merges in (1, 5, 50):
                assert (_learn_merges(dict(vocab), num_merges)
                        == _learn_merges_rescan(dict(vocab), num_merges)), (
                    f"trial {trial} num_merges {num_merges}")

    def test_differential_on_documents_fixture(self, spark):
        from aggo_spark.operators.tokenize import (_learn_merges,
                                                   _learn_merges_rescan)

        texts = [r.text for r in spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet")
            .select("text").limit(60).collect()]
        for byte_level in (False, True):
            vocab = self._vocab_from_texts(texts, byte_level)
            assert (_learn_merges(dict(vocab), 120)
                    == _learn_merges_rescan(dict(vocab), 120))

    def test_early_stop_parity(self):
        from aggo_spark.operators.tokenize import (_learn_merges,
                                                   _learn_merges_rescan)

        # every pair unique → frequency 1 < 2 → zero merges both ways
        vocab = {("a", "b", "c"): 1, ("d", "e"): 1}
        assert _learn_merges(vocab, 10) == [] == _learn_merges_rescan(vocab, 10)
        # single-symbol words → no pairs at all
        assert _learn_merges({("x",): 5}, 3) == []

    def test_production_merge_count_is_tractable(self):
        """A 4k-merge run over a 30k-distinct-word zipfian vocabulary —
        the shape a 32k production vocab scales from — completes promptly
        (the rescan form does 4k full vocab rewrites here). The synthetic
        corpus is needed because the test fixtures' documents draw from a
        ~31-word vocabulary, which saturates after ~100 merges."""
        import random
        import time

        from aggo_spark.operators.tokenize import _EOW, _learn_merges

        rng = random.Random(42)
        vocab = {}
        for i in range(30_000):
            w = "".join(rng.choice("abcdefghijklmnop")
                        for _ in range(rng.randint(3, 12)))
            vocab[tuple(w) + (_EOW,)] = max(1, 30_000 // (i + 1))  # zipf
        t0 = time.monotonic()
        merges = _learn_merges(vocab, 4000)
        dt = time.monotonic() - t0
        assert len(merges) == 4000  # rich vocab: never hits the <2 stop
        assert dt < 60, f"incremental trainer took {dt:.1f}s for 4k merges"


class TestFacetScansSourceOnce:
    """judge r6 #9: an N-branch $facet must not re-scan the source per
    branch — the input is lazily localCheckpoint'ed so one materialization
    feeds every branch."""

    PIPE = [{"$facet": {
        "by_a": [{"$group": {"_id": "$k", "n": {"$sum": 1}}}],
        "top": [{"$sort": {"v": -1}}, {"$limit": 2}],
        "stats": [{"$group": {"_id": None, "s": {"$sum": "$v"}}}],
    }}]

    def test_three_branch_facet_single_scan(self, spark, tmp_path):
        from aggo_spark import Engine

        p = str(tmp_path / "t")
        spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 3)], "k string, v int"
        ).write.parquet(p)
        df = spark.read.parquet(p)
        out = Engine().aggregate(df, self.PIPE)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan parquet") == 0  # source behind checkpoint
        row = out.collect()[0]
        assert {r["_id"]: r["n"] for r in row.by_a} == {"a": 2, "b": 1}
        assert [r["v"] for r in row.top] == [3, 2]
        assert row.stats[0]["s"] == 6

        # opt-out restores per-branch pushdown scans
        out2 = Engine(facet_reuse_source=False).aggregate(df, self.PIPE)
        plan2 = out2._jdf.queryExecution().executedPlan().toString()
        assert plan2.count("Scan parquet") == 3


class TestSaltedCollectList:
    """judge r6 #5 support: collect_list is the genuinely skew-prone agg
    (no map-side collapse) — salted form must merge partial lists to the
    same multiset as the unsalted aggregate."""

    def test_salted_collect_list_multiset_parity(self, spark):
        from aggo_spark.operators.skew import salted_group_agg

        rows = [("hot", float(i)) for i in range(500)] + [
            ("k" + str(i % 7), float(i)) for i in range(100)]
        df = spark.createDataFrame(rows, "k string, v double").repartition(8)
        exp = {r["k"]: sorted(r["vals"]) for r in df.groupBy("k").agg(
            F.collect_list("v").alias("vals")).collect()}
        got = {r["k"]: sorted(r["vals"]) for r in salted_group_agg(
            df, ["k"], {"vals": ("collect_list", "v")}).collect()}
        assert got == exp

    def test_salted_two_phase_plan(self, spark):
        from aggo_spark.operators.skew import salted_group_agg

        df = spark.createDataFrame([("a", 1.0)], "k string, v double")
        out = salted_group_agg(df, ["k"], {"vals": ("collect_list", "v")})
        plan = out._jdf.queryExecution().executedPlan().toString()
        import re
        assert len(re.findall(r"(?<!Reused)Exchange", plan)) == 2


# marked slow (r14): excluded from the default driver gate, run with -m slow
@pytest.mark.slow
class TestDistributedPQTrain:
    """judge r6 #6: pq_train(distributed=True) trains codebooks with
    pyspark.ml KMeans (no vector collect) — recall parity with the
    driver-Lloyd path pinned on the sf0.001 embeddings fixture."""

    def _recall(self, spark, emb, books, k=10):
        from aggo_spark.operators.similarity import (
            brute_force_topk, pq_encode, pq_topk)

        queries = emb.limit(50)
        exact = brute_force_topk(emb, queries, k=k)
        truth = {(r.query_id, r.neighbor_id) for r in exact.collect()}
        codes = pq_encode(emb, books)
        approx = pq_topk(codes, queries, books, k=k)
        got = {(r.query_id, r.neighbor_id) for r in approx.collect()}
        return len(got & truth) / len(truth)

    def test_ml_kmeans_recall_parity_with_lloyd(self, spark):
        from aggo_spark.operators.similarity import pq_train

        emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
               .select("vec_id", "embedding").cache())
        lloyd = pq_train(emb, m=8, k_codes=128, iters=15)
        ml = pq_train(emb, m=8, k_codes=128, iters=15, distributed=True)
        # same nested shape, JSON-serializable
        assert len(ml) == 8 and len(ml[0]) == 128
        assert len(ml[0][0]) == len(lloyd[0][0])
        r_lloyd = self._recall(spark, emb, lloyd)
        r_ml = self._recall(spark, emb, ml)
        # pinned (measured r7: lloyd 0.548, ml 0.558 at this config) —
        # both trainers clear the floor and neither drifts from the other
        assert r_lloyd >= 0.45 and r_ml >= 0.45
        assert abs(r_lloyd - r_ml) <= 0.1

    def test_distributed_validates_like_driver_path(self, spark):
        from aggo_spark.operators.similarity import pq_train

        emb = spark.createDataFrame(
            [(1, [1.0, 2.0, 3.0])], "vec_id int, embedding array<double>")
        with pytest.raises(ValueError, match="divisible"):
            pq_train(emb, m=2, k_codes=2, distributed=True)
        with pytest.raises(ValueError, match="exceeds"):
            pq_train(emb.select("vec_id",
                                F.col("embedding")).withColumn(
                "embedding", F.expr("array(1.0d, 2.0d)")),
                m=1, k_codes=16, distributed=True)


class TestByteBPELosslessProperty:
    """Invariant: BPE segmentation is a partition of the byte-mapped word
    — concatenating a word's tokens reproduces the mapped bytes exactly,
    for ANY merge table (merges only ever join adjacent symbols)."""

    def test_segmentation_partitions_bytes(self, spark):
        import random

        from aggo_spark.operators.tokenize import (
            _byte_syms, bpe_segment_word, train_bpe)

        rng = random.Random(7)
        words = ["lower", "newest", "café", "naïve", "日本語", "don't",
                 " spaced", "x" * 40, "@#$%", "MiXeD123"]
        corpus = " ".join(rng.choice(words) for _ in range(300))
        df = spark.createDataFrame([(corpus,)], "text string")
        merges = train_bpe(df, num_merges=40, byte_level=True)
        ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
        for w in words:
            toks = bpe_segment_word(w, ranks, byte_level=True)
            assert "".join(toks) == "".join(_byte_syms(w))
            assert all(toks)  # no empty symbols

    def test_word_level_keeps_eow_exactly_once(self, spark):
        from aggo_spark.operators.tokenize import bpe_segment_word

        toks = bpe_segment_word("lower", {("l", "o"): 0, ("lo", "w"): 1})
        assert toks == ["low", "e", "r", "</w>"]
        assert "".join(toks) == "lower</w>"


class TestArrowBruteForce:
    """r7: brute_force_topk's default path is an Arrow matmul kernel
    (query matrix in the task closure, tie-safe per-batch top-(k+1) cut,
    exact final rank window) replacing the per-pair interpreted-HOF
    cosine over a corpus-sized cross join. Must be EXACTLY the HOF form
    on scorable vectors."""

    def test_differential_vs_hof_on_fixture(self, spark):
        from aggo_spark.operators.similarity import brute_force_topk

        emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
               .select("vec_id", "embedding"))
        q = emb.filter("vec_id < 7")
        key = ["query_id", "neighbor_id", "score", "rank"]
        arrow = sorted(tuple(r) for r in
                       brute_force_topk(emb, q, k=10).select(*key).collect())
        hof = sorted(tuple(r) for r in
                     brute_force_topk(emb, q, k=10, method="hof")
                     .select(*key).collect())
        assert arrow == hof and len(arrow) == 70

    def test_differential_on_int8_quantized(self, spark):
        from pyspark.sql import functions as F

        from aggo_spark.operators.similarity import (brute_force_topk,
                                                     quantize8)

        emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
               .select("vec_id", "embedding"))
        qd = emb.select(
            "vec_id", quantize8(F.col("embedding"))["q"].alias("embedding"))
        key = ["query_id", "neighbor_id", "score", "rank"]
        a = sorted(tuple(r) for r in brute_force_topk(
            qd, qd.filter("vec_id < 3"), k=5).select(*key).collect())
        h = sorted(tuple(r) for r in brute_force_topk(
            qd, qd.filter("vec_id < 3"), k=5, method="hof")
            .select(*key).collect())
        assert a == h and len(a) == 15

    def test_ties_and_small_corpus(self, spark):
        from aggo_spark.operators.similarity import brute_force_topk

        # identical vectors everywhere -> every score ties at 1.0; the
        # tie-safe cut must keep the id-ascending winners exactly
        rows = [(i, [1.0, 2.0, 3.0]) for i in range(6)]
        df = spark.createDataFrame(
            rows, "vec_id int, embedding array<double>").repartition(3)
        out = brute_force_topk(df, df.filter("vec_id = 0"), k=3).collect()
        assert [(r.neighbor_id, r.score, r.rank) for r in
                sorted(out, key=lambda r: r.rank)] == [
            (1, 1.0, 1), (2, 1.0, 2), (3, 1.0, 3)]

    def test_zero_and_null_vectors_never_match(self, spark):
        from aggo_spark.operators.similarity import brute_force_topk

        df = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.5, 0.5]), (2, [0.0, 0.0]), (3, None)],
            "vec_id int, embedding array<double>")
        # method="arrow" pinned: this is the arrow kernel's documented
        # contract (NULL/zero-norm corpus rows emit no candidate rows);
        # the hof form carries them as NULL scores ranking last, visible
        # only when scorable rows < k as here (divergence documented in
        # the brute_force_topk docstring)
        out = brute_force_topk(df, df.filter("vec_id = 0"), k=4,
                               method="arrow").collect()
        assert sorted(r.neighbor_id for r in out) == [1]

    def test_auto_resolves_by_corpus_size(self, spark):
        # r8: method="auto" (the new default) takes the broadcast-
        # crossJoin form under AUTO_SMALL_CORPUS and the arrow kernel
        # above it; both must agree on a NULL-free corpus
        from aggo_spark.operators.similarity import brute_force_topk

        rows = [(i, [float(i % 7 + 1), float(i % 3 + 1)])
                for i in range(40)]
        df = spark.createDataFrame(
            rows, "vec_id int, embedding array<double>")
        key = ["query_id", "neighbor_id", "score", "rank"]
        auto = sorted(tuple(r) for r in brute_force_topk(
            df, df.filter("vec_id < 2"), k=3).select(*key).collect())
        arrow = sorted(tuple(r) for r in brute_force_topk(
            df, df.filter("vec_id < 2"), k=3, method="arrow")
            .select(*key).collect())
        hof = sorted(tuple(r) for r in brute_force_topk(
            df, df.filter("vec_id < 2"), k=3, method="hof")
            .select(*key).collect())
        assert auto == arrow == hof and len(auto) == 6

    def test_closure_bound_falls_back_to_hof(self, spark, monkeypatch):
        # ADVICE r7: a query set exceeding the arrow task-closure bound
        # degrades to the distributed hof form instead of raising
        import aggo_spark.operators.similarity as sim

        def tiny_cap(nq, m, kc, cap_mb=512):
            raise ValueError("ADC tables would exceed the closure bound")

        monkeypatch.setattr(sim, "_check_table_bytes", tiny_cap)
        df = spark.createDataFrame(
            [(i, [float(i + 1), 1.0]) for i in range(5)],
            "vec_id int, embedding array<double>")
        import warnings as _w

        with _w.catch_warnings(record=True) as rec:
            _w.simplefilter("always")
            out = sim.brute_force_topk(
                df, df.filter("vec_id = 0"), k=2, method="arrow").collect()
        assert len(out) == 2
        assert any("falling back" in str(w.message) for w in rec)

    def test_bad_method_rejected(self, spark):
        import pytest as _pytest

        from aggo_spark.operators.similarity import brute_force_topk

        df = spark.createDataFrame([(0, [1.0])],
                                   "vec_id int, embedding array<double>")
        with _pytest.raises(ValueError, match="method"):
            brute_force_topk(df, df, k=1, method="bogus")


class TestLangidBitmaskMap:
    """r7: language_id_table's per-token probe is ONE literal-map lookup
    to a language bitmask instead of five InSet probes (~1.35x at sf1).
    Shared stopwords ("la" is es+fr+it, "de" is de+es+fr) must still
    count for EVERY containing language, exactly like the isin sets."""

    def test_differential_vs_column_form(self, spark):
        from pyspark.sql import functions as F

        from aggo_spark.operators.text import language_id, language_id_table

        rows = [
            (1, "the of and to in la la la"),
            (2, "el la de que y los en un"),
            (3, "le la les de des et est un"),
            (4, "der die und das ist von de de"),
            (5, "il la di che e un una per"),
            (6, "zzz qqq frobnicate"),
            (7, ""),
            (8, None),
            (9, "la la la la"),  # shared-only tokens: tie -> dict order
        ]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        table = {r.doc_id: r.pred_lang
                 for r in language_id_table(df).collect()}
        column = {r.doc_id: r.lang for r in df.select(
            "doc_id", language_id(F.col("text")).alias("lang")).collect()}
        # the Column HOF form returns NULL for NULL text; the table form
        # labels every input id (explode_outer) -> 'und'
        column[8] = column[8] or "und"
        assert table == column
        assert table[9] == "es"  # earliest dict entry containing "la"

    def test_fixture_differential(self, spark):
        from pyspark.sql import functions as F

        from aggo_spark.operators.text import language_id, language_id_table

        docs = (spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "text").limit(200))
        table = {r.doc_id: r.pred_lang
                 for r in language_id_table(docs).collect()}
        column = {r.doc_id: r.lang for r in docs.select(
            "doc_id", language_id(F.col("text")).alias("lang")).collect()}
        assert table == column and len(table) == 200


# marked slow (r14): excluded from the default driver gate, run with -m slow
@pytest.mark.slow
class TestArrowPairScorers:
    """r7: candidate/verify cosine moved off the interpreted HOF fold —
    pair sites score via cosine_arrow (einsum per Arrow batch) and
    embedding_near_dup_pairs defaults to a bucket-grouped gram-matrix
    kernel (V@V.T per bucket; candidate pairs never exist as rows).
    All forms differentially pinned."""

    def test_neardup_three_forms_identical(self, spark):
        from aggo_spark.operators.similarity import embedding_near_dup_pairs

        emb = (spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet")
            .select("vec_id", "embedding"))
        outs = []
        for kw in ({"method": "gram"}, {"method": "join", "scorer": "arrow"},
                   {"method": "join", "scorer": "column"}, {}):  # {} = auto
            outs.append(sorted(
                tuple(r) for r in embedding_near_dup_pairs(
                    emb, threshold=0.3, bits=8, **kw).collect()))
        assert outs[0] == outs[1] == outs[2] == outs[3] and len(outs[0]) > 0

    def test_neardup_gram_edges(self, spark):
        from aggo_spark.operators.similarity import embedding_near_dup_pairs

        # dup ids never self-pair; NULL and zero vectors never match;
        # dup-id rows still pair with OTHER ids once per row (join parity)
        rows = [(1, [1.0, 1.0]), (1, [1.0, 1.0]), (2, [1.0, 1.0]),
                (3, None), (4, [0.0, 0.0]), (5, [0.9, 1.1])]
        df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
        g = sorted(tuple(r) for r in embedding_near_dup_pairs(
            df, threshold=0.9, bits=2, method="gram").collect())
        j = sorted(tuple(r) for r in embedding_near_dup_pairs(
            df, threshold=0.9, bits=2, method="join",
            scorer="column").collect())
        assert g == j
        assert [(a, b) for a, b, _ in g] == [(1, 2), (1, 2), (1, 5),
                                             (1, 5), (2, 5)]

    def test_bucketed_and_ivf_scorers_identical(self, spark):
        from aggo_spark.operators.similarity import bucketed_topk, ivf_topk

        emb = (spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet")
            .select("vec_id", "embedding"))
        q = emb.filter("vec_id < 6")
        key = ["query_id", "neighbor_id", "score", "rank"]
        b_a = sorted(tuple(r) for r in bucketed_topk(
            emb, q, k=5, bits=4, tables=4, probe_hamming=1, scorer="arrow")
            .select(*key).collect())
        b_c = sorted(tuple(r) for r in bucketed_topk(
            emb, q, k=5, bits=4, tables=4, probe_hamming=1,
            scorer="column").select(*key).collect())
        assert b_a == b_c and len(b_a) > 0
        seeds = [r.embedding for r in emb.orderBy("vec_id").limit(8).collect()]
        centers = [[float(x) for x in v] for v in seeds]
        i_a = sorted(tuple(r) for r in ivf_topk(
            emb, q, k=5, nprobe=2, centroids=centers, scorer="arrow")
            .select(*key).collect())
        i_c = sorted(tuple(r) for r in ivf_topk(
            emb, q, k=5, nprobe=2, centroids=centers, scorer="column")
            .select(*key).collect())
        assert i_a == i_c and len(i_a) > 0

    def test_bad_args_rejected(self, spark):
        import pytest as _pytest

        from aggo_spark.operators.similarity import (
            bucketed_topk, embedding_near_dup_pairs)

        df = spark.createDataFrame([(0, [1.0, -1.0])],
                                   "vec_id int, embedding array<double>")
        with _pytest.raises(ValueError, match="scorer"):
            bucketed_topk(df, df, k=1, bits=1, scorer="bogus").collect()
        with _pytest.raises(ValueError, match="method"):
            embedding_near_dup_pairs(df, method="bogus")


class TestVectorSearchArrowScorer:
    """r7: $vectorSearch corpus scoring via cosine_arrow by default;
    scorer:'column' is the spec-level differential mirror."""

    def test_scorers_identical(self, spark):
        from aggo_spark import Engine

        emb = (spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet")
            .select("vec_id", "embedding"))
        qv = [float(x) for x in emb.filter("vec_id = 0")
              .collect()[0].embedding]
        eng = Engine()
        spec = {"path": "$embedding", "queryVector": qv, "limit": 8}
        a = [(r.vec_id, r.score) for r in eng.aggregate(
            emb, [{"$vectorSearch": dict(spec, scorer="arrow")}]).collect()]
        c = [(r.vec_id, r.score) for r in eng.aggregate(
            emb, [{"$vectorSearch": dict(spec, scorer="column")}]).collect()]
        auto = [(r.vec_id, r.score) for r in eng.aggregate(
            emb, [{"$vectorSearch": dict(spec)}]).collect()]
        assert a == c == auto and len(a) == 8
        assert a[0][0] == 0 and a[0][1] == 1.0  # self-match, (1+1)/2

    def test_auto_scorer_resolution(self, spark):
        from aggo_spark.operators.similarity import (AUTO_SMALL_CORPUS,
                                                     _auto_scorer)

        small = spark.range(10).selectExpr(
            "id as vec_id", "array(1.0d, 2.0d) as embedding")
        assert _auto_scorer(small, "auto") == "column"
        assert _auto_scorer(small, "arrow") == "arrow"  # explicit wins
        assert AUTO_SMALL_CORPUS == 10_000


class TestReviewPassFixes:
    """Late-r7 adversarial review findings over the round diff."""

    def test_brute_force_empty_queries_returns_empty(self, spark):
        from aggo_spark.operators.similarity import brute_force_topk

        corpus = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
            "vec_id int, embedding array<double>")
        empty_q = corpus.filter("vec_id > 99")
        null_q = spark.createDataFrame(
            [(9, None)], "vec_id int, embedding array<double>")
        for method in ("arrow", "hof"):
            out = brute_force_topk(corpus, empty_q, k=3, method=method)
            assert out.columns == ["query_id", "neighbor_id", "score", "rank"]
            assert out.count() == 0
        # all-NULL-vector query set: arrow returns empty; hof carries
        # NULL-scored rows (the docstring's documented divergence)
        assert brute_force_topk(corpus, null_q, k=3, method="arrow").count() == 0
        hof_rows = brute_force_topk(corpus, null_q, k=3, method="hof").collect()
        assert len(hof_rows) == 2 and all(r.score is None for r in hof_rows)

    def test_adaptive_deadline_timer_fires_on_idle_producer(
            self, spark, tmp_path):
        import time as _time

        from aggo_spark.streaming.batching import AdaptiveBatchPolicy
        from aggo_spark.streaming.core import StreamingCollection

        c = StreamingCollection(
            spark, "category string, price double, qty long",
            workdir=str(tmp_path), autoflush="adaptive",
            batch_policy=AdaptiveBatchPolicy(
                batch_size=1000, max_delay_sec=0.2))
        try:
            fired = []
            c.on("data-added", lambda docs: fired.append(list(docs)))
            c.add({"category": "a", "price": 1.0, "qty": 1})
            assert c.delta_metrics()["pending"] == 1
            # NO further enqueue/read: only the deadline timer can drain
            deadline = _time.monotonic() + 20.0
            while not fired and _time.monotonic() < deadline:
                _time.sleep(0.05)
            assert fired and len(fired[0]) == 1
            assert c.delta_metrics()["pending"] == 0
        finally:
            c.stop()

    def test_result_df_snapshot_survives_compaction(self, spark, tmp_path):
        import os as _os

        from aggo_spark.streaming.core import StreamingCollection

        pipeline = [{"$group": {"_id": "$category", "n": {"$sum": 1}}}]
        c = StreamingCollection(
            spark, "category string, price double, qty long",
            workdir=str(tmp_path))
        try:
            c.stream(pipeline, "g", sink="parquet", compact_every=2)
            c.add({"category": "a", "price": 1.0, "qty": 1})
            held = c.result_df("g")
            n_before = held.count()
            reg = c._registered["g"]
            gen0 = reg.result_dir
            # force a compaction: sink_batches reaches compact_every
            c.add({"category": "b", "price": 2.0, "qty": 1})
            assert reg.result_gen >= 1 and reg.result_dir != gen0
            # ONE compaction after the snapshot: the held (pre-compaction)
            # snapshot still reads — stale, not FileNotFound (the r9
            # one-generation grace period, ADVICE r8)
            assert gen0 in reg.retired_dirs and _os.path.isdir(gen0)
            assert held.count() == n_before
            c.add({"category": "a", "price": 3.0, "qty": 1})
            # disk stays bounded: at most one retired generation on disk
            # regardless of how many compactions have run
            assert len(reg.retired_dirs) <= 1
            if reg.retired_dirs != [gen0]:
                assert not _os.path.isdir(gen0)
            fresh = {r["_id"]: r["n"] for r in c.result_df("g").collect()}
            assert fresh == {"a": 2, "b": 1}
            retired = list(reg.retired_dirs)
        finally:
            c.stop()
        for d in retired:
            assert not _os.path.isdir(d)  # released with the collection

    def test_backpressure_bound_reachable_below_batch_size(self):
        from aggo_spark.streaming.batching import AdaptiveBatchPolicy

        tight = AdaptiveBatchPolicy(batch_size=64, max_pending=8,
                                    max_delay_sec=99.0)
        assert not tight.should_flush(7, 0.0)
        assert tight.should_flush(8, 0.0)


class TestDuplicateSpans:
    """Exact duplicate-substring spans + removal (Lee et al. 2022
    ExactSubstr, Spark-first: rolling-window hash match + islands merge)."""

    def _df(self, spark, docs):
        return spark.createDataFrame(docs, "doc_id string, text string")

    def test_cross_doc_span_detected_and_merged(self, spark):
        from aggo_spark.operators.dedup import duplicate_spans

        # A and B share a 6-token passage; min_len=5 gives two overlapping
        # redundant windows in B that must merge into ONE maximal span
        df = self._df(spark, [
            ("a", "the quick brown fox jumps over x1 y1"),
            ("b", "z2 the quick brown fox jumps over w2"),
        ])
        got = {(r.doc_id, r.span_start, r.span_end, r.span_tokens)
               for r in duplicate_spans(df, min_len=5).collect()}
        # keeper is the globally minimal (doc_id, pos) — doc a keeps all
        assert got == {("b", 1, 7, 6)}

    def test_within_doc_self_duplication(self, spark):
        from aggo_spark.operators.dedup import duplicate_spans

        df = self._df(spark, [
            ("c", "a b c d e f9 g9 a b c d e"),
        ])
        got = {(r.doc_id, r.span_start, r.span_end)
               for r in duplicate_spans(df, min_len=5).collect()}
        assert got == {("c", 7, 12)}  # second copy redundant, first kept

    def test_removal_keeps_one_global_copy(self, spark):
        from aggo_spark.operators.dedup import remove_duplicate_spans

        df = self._df(spark, [
            ("a", "the quick brown fox jumps over x1 y1"),
            ("b", "z2 the quick brown fox jumps over w2"),
            ("c", "a b c d e f9 g9 a b c d e"),
            ("d", "nothing duplicated here at all"),
        ])
        out = {r.doc_id: (r.text_dedup, r.n_removed_tokens)
               for r in remove_duplicate_spans(df, min_len=5).collect()}
        assert out["a"] == ("the quick brown fox jumps over x1 y1", 0)
        assert out["b"] == ("z2 w2", 6)
        assert out["c"] == ("a b c d e f9 g9", 5)
        assert out["d"] == ("nothing duplicated here at all", 0)

    def test_null_and_short_docs(self, spark):
        from aggo_spark.operators.dedup import (duplicate_spans,
                                                remove_duplicate_spans)

        df = self._df(spark, [("n", None), ("s", "too short")])
        assert duplicate_spans(df, min_len=5).count() == 0
        out = {r.doc_id: (r.text_dedup, r.n_removed_tokens)
               for r in remove_duplicate_spans(df, min_len=5).collect()}
        assert out["n"] == (None, 0)
        assert out["s"] == ("too short", 0)

    def test_min_len_validation(self, spark):
        from aggo_spark.operators.dedup import duplicate_spans

        with pytest.raises(ValueError, match="min_len"):
            duplicate_spans(self._df(spark, [("a", "x y")]), min_len=1)

    def test_differential_vs_python_mirror(self, spark):
        import random

        from aggo_spark.operators.dedup import duplicate_spans

        rng = random.Random(7)
        vocab = [f"w{i}" for i in range(12)]
        docs = []
        for d in range(10):
            n = rng.randint(0, 24)
            docs.append((f"d{d:02d}", " ".join(rng.choice(vocab)
                                               for _ in range(n))))
        min_len = 3

        # pure-Python mirror of the operator's contract
        occ = []  # (doc, pos, gram)
        for did, text in docs:
            toks = text.split()
            for p in range(len(toks) - min_len + 1):
                occ.append((did, p, " ".join(toks[p:p + min_len])))
        from collections import defaultdict
        by_gram = defaultdict(list)
        for did, p, g in occ:
            by_gram[g].append((did, p))
        redundant = defaultdict(list)
        for g, occs in by_gram.items():
            if len(occs) < 2:
                continue
            keeper = min(occs)
            for o in occs:
                if o != keeper:
                    redundant[o[0]].append(o[1])
        expected = set()
        for did, starts in redundant.items():
            spans = []
            for p in sorted(starts):
                if spans and p <= spans[-1][1]:
                    spans[-1][1] = max(spans[-1][1], p + min_len)
                else:
                    spans.append([p, p + min_len])
            for s, e in spans:
                expected.add((did, s, e))

        got = {(r.doc_id, r.span_start, r.span_end)
               for r in duplicate_spans(self._df(spark, docs),
                                        min_len=min_len).collect()}
        assert got == expected and len(expected) > 0

        # removal mirror: cut the expected spans from each token stream
        from aggo_spark.operators.dedup import remove_duplicate_spans

        spans_by_doc = {}
        for did, s, e in expected:
            spans_by_doc.setdefault(did, []).append((s, e))
        want = {}
        for did, text in docs:
            toks = text.split()
            cut = set()
            for s, e in spans_by_doc.get(did, []):
                cut.update(range(s, e))
            keep = [t for i, t in enumerate(toks) if i not in cut]
            want[did] = (" ".join(keep), len(toks) - len(keep))
        out = {r.doc_id: (r.text_dedup, r.n_removed_tokens)
               for r in remove_duplicate_spans(
                   self._df(spark, docs), min_len=min_len).collect()}
        assert out == want
        assert any(n > 0 for _, n in want.values())

    def test_key_modes_agree_on_fixture(self, spark):
        from aggo_spark.operators.dedup import duplicate_spans

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet")
        h = {tuple(r) for r in duplicate_spans(
            docs, min_len=8, key="hash").collect()}
        g = {tuple(r) for r in duplicate_spans(
            docs, min_len=8, key="gram").collect()}
        assert h == g and len(h) > 0

    def test_key_validation(self, spark):
        from aggo_spark.operators.dedup import duplicate_spans

        with pytest.raises(ValueError, match="key"):
            duplicate_spans(self._df(spark, [("a", "x y z")]), key="md5")

    def test_spans_stats_modes_agree(self, spark):
        from aggo_spark.operators.dedup import duplicate_spans

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet")
        w = sorted(tuple(r) for r in duplicate_spans(
            docs, min_len=8, stats="window").collect())
        j = sorted(tuple(r) for r in duplicate_spans(
            docs, min_len=8, stats="join").collect())
        assert w == j and len(w) > 0
        with pytest.raises(ValueError, match="stats"):
            duplicate_spans(docs, stats="salted").collect()


class TestHtmlExtraction:
    """HTML -> text tier (strip_html regex chain, jusText-lite block
    classification, main-text reassembly) — the C4/CCNet front door."""

    HTML = (
        '<html><head><title>T</title><style>.x{color:red}</style></head>'
        '<body><script>var x = "<p>not text</p>";</script>'
        '<nav><ul><li>Home</li><li>About</li><li>Contact</li></ul></nav>'
        '<h1>The Article &amp; Its Title</h1>'
        '<p>This is the first paragraph of the article and it has enough '
        'words to be considered content by the classifier because the '
        'stopword density is high.</p>'
        '<p>Short nav thing</p>'
        '<div>Here is another long paragraph which should also be kept '
        'as content since it is made of normal English prose with many '
        'of the usual words.</div>'
        '<!-- a comment -->footer &copy; 2026</body></html>'
    )

    def _df(self, spark):
        return spark.createDataFrame(
            [(1, self.HTML), (2, None), (3, "<p></p>")],
            "doc_id int, html string")

    def test_strip_html_removes_markup_decodes_entities(self, spark):
        from aggo_spark.operators.html import strip_html

        t = self._df(spark).select(
            strip_html(F.col("html")).alias("t")).collect()[0].t
        assert "not text" not in t          # script body gone
        assert "color:red" not in t         # style body gone
        assert "a comment" not in t         # comment gone
        assert "<" not in t and ">" not in t.replace("& ", "")
        assert "The Article & Its Title" in t  # &amp; decoded
        assert not t.startswith("\n") and not t.endswith("\n")
        assert "\n\n\n" not in t            # collapsed block breaks

    def test_block_classification(self, spark):
        from aggo_spark.operators.html import html_blocks

        rows = html_blocks(self._df(spark)).filter(
            "doc_id = 1").orderBy("block_no").collect()
        content = [r.block for r in rows if r.is_content]
        boiler = [r.block for r in rows if not r.is_content]
        assert len(content) == 2
        assert all("paragraph" in b for b in content)
        assert any(b == "Home" for b in boiler)     # nav items rejected
        assert all(r.n_words >= 0 for r in rows)    # no legacy -1

    def test_null_and_empty_docs(self, spark):
        from aggo_spark.operators.html import extract_main_text, html_blocks

        out = {r.doc_id: r.main_text
               for r in extract_main_text(self._df(spark)).collect()}
        assert out[2] is None       # NULL html stays NULL
        assert out[3] == ""         # all-boilerplate -> empty, not NULL
        null_rows = html_blocks(self._df(spark)).filter(
            "doc_id in (2, 3)").collect()
        assert all(r.n_words is None and not r.is_content
                   for r in null_rows)

    def test_main_text_order_and_joinability(self, spark):
        from aggo_spark.operators.html import extract_main_text

        out = extract_main_text(self._df(spark))
        main = out.filter("doc_id = 1").collect()[0].main_text
        first = main.index("first paragraph")
        second = main.index("another long paragraph")
        assert first < second and "\n\n" in main
        assert set(out.columns) == {"doc_id", "html", "main_text"}

    def test_lang_validation(self, spark):
        from aggo_spark.operators.html import html_blocks

        with pytest.raises(ValueError, match="lang"):
            html_blocks(self._df(spark), lang="xx")

    def test_no_shuffle_in_blocks_plan(self, spark):
        from aggo_spark.operators.html import html_blocks

        plan = html_blocks(self._df(spark))._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan       # scan-parallel, no shuffle
        assert plan.count("Generate") == 1  # one explode


class TestWarcSource:
    """WARC crawl-archive source: record parsing (plain + per-record
    gzip members), HTTP envelope splitting, truncation tolerance, and
    the WARC -> strip_html composition."""

    RECORDS = [
        {"warc_type": "warcinfo", "payload": b"software: test\r\n"},
        {"warc_type": "response", "url": "http://a.example/x",
         "http": True,
         "payload": b"<html><body><p>hello crawl world</p></body></html>"},
        {"warc_type": "response", "url": "http://b.example/y",
         "http": True, "http_content_type": "text/plain",
         "payload": b"just text"},
    ]

    def _write(self, tmp_path, name, data):
        p = tmp_path / name
        p.write_bytes(data)
        return str(p)

    def test_parse_plain_and_gzip_members(self, spark, tmp_path):
        from aggo_spark.sources.warc import encode_warc, read_warc

        self._write(tmp_path, "a.warc", encode_warc(self.RECORDS))
        self._write(tmp_path, "b.warc.gz",
                    encode_warc(self.RECORDS, gzip_members=True))
        df = read_warc(spark, str(tmp_path))
        rows = df.orderBy("warc_file", "record_no").collect()
        assert len(rows) == 6  # 3 records x 2 files
        for half in (rows[:3], rows[3:]):
            assert [r.warc_type for r in half] == [
                "warcinfo", "response", "response"]
            assert half[1].url == "http://a.example/x"
            assert half[1].http_status == 200
            assert half[1].http_content_type == "text/html"
            assert bytes(half[1].payload).startswith(b"<html>")
            assert half[2].http_content_type == "text/plain"
            assert bytes(half[2].payload) == b"just text"

    def test_truncated_tail_keeps_parsed_records(self, spark, tmp_path):
        from aggo_spark.sources.warc import encode_warc, parse_warc_bytes

        data = encode_warc(self.RECORDS)
        recs = list(parse_warc_bytes(data[:len(data) - 30]))  # cut tail
        assert [r["warc_type"] for r in recs] == ["warcinfo", "response"]
        assert list(parse_warc_bytes(b"not a warc")) == []

    def test_compose_with_html_extraction(self, spark, tmp_path):
        from aggo_spark.operators.html import strip_html
        from aggo_spark.sources.warc import encode_warc, read_warc
        from pyspark.sql import functions as F

        self._write(tmp_path, "c.warc.gz",
                    encode_warc(self.RECORDS, gzip_members=True))
        pages = (
            read_warc(spark, str(tmp_path))
            .filter("warc_type = 'response' and http_content_type = 'text/html'")
            .select("url", strip_html(
                F.col("payload").cast("string")).alias("text"))
        )
        got = pages.collect()
        assert len(got) == 1
        assert got[0].url == "http://a.example/x"
        assert got[0].text == "hello crawl world"


class TestCrawlReviewFixes:
    """Second review pass over the crawl-tier additions."""

    def test_warc_negative_content_length_terminates(self):
        from aggo_spark.sources.warc import parse_warc_bytes

        evil = (b"WARC/1.0\r\nWARC-Type: response\r\n"
                b"Content-Length: -00057\r\n\r\n")
        assert list(parse_warc_bytes(evil)) == []  # no infinite loop

    def test_warc_content_type_params_split_and_head_request(
            self, spark, tmp_path):
        from aggo_spark.sources.warc import encode_warc, parse_warc_bytes

        recs = list(parse_warc_bytes(encode_warc([
            {"warc_type": "response", "url": "http://x/1", "http": True,
             "http_content_type": "TEXT/HTML; charset=UTF-8",
             "payload": b"<p>x</p>"},
        ])))
        assert recs[0]["http_content_type"] == "text/html"  # params off
        # a HEAD request is an HTTP message too: headers must split
        head = (b"WARC/1.0\r\nWARC-Type: request\r\n"
                b"Content-Type: application/http; msgtype=request\r\n"
                b"Content-Length: 59\r\n\r\n"
                b"HEAD /x HTTP/1.1\r\nHost: a\r\n"
                b"Content-Type: text/plain\r\n\r\nBODY")
        (rec,) = parse_warc_bytes(head)
        assert rec["http_content_type"] == "text/plain"
        assert bytes(rec["payload"]) == b"BODY"

    def test_html_escaped_entities_single_decode(self, spark):
        from aggo_spark.operators.html import strip_html

        df = spark.createDataFrame(
            [("<p>use &amp;lt;div&amp;gt; tags &amp; enjoy</p>",)],
            "html string")
        t = df.select(strip_html(F.col("html")).alias("t")).collect()[0].t
        # '&amp;lt;' is the ESCAPED text '&lt;' — never a live '<'
        assert t == "use &lt;div&gt; tags & enjoy"

    def test_removal_single_normalization_regime(self, spark):
        from aggo_spark.operators.dedup import remove_duplicate_spans

        df = spark.createDataFrame(
            [("a", "Hello, World! No Duplicates Here.")],
            "doc_id string, text string")
        out = remove_duplicate_spans(df, min_len=5).collect()[0]
        # no-span docs get the SAME token-stream regime as span docs
        assert out.text_dedup == "hello world no duplicates here"
        assert out.n_removed_tokens == 0

    def test_removal_key_modes_agree(self, spark):
        from aggo_spark.operators.dedup import remove_duplicate_spans

        df = spark.createDataFrame(
            [("a", "a b c d e f9 g9 a b c d e")],
            "doc_id string, text string")
        h = remove_duplicate_spans(df, min_len=5, key="hash").collect()[0]
        g = remove_duplicate_spans(df, min_len=5, key="gram").collect()[0]
        assert h.text_dedup == g.text_dedup == "a b c d e f9 g9"

    def test_read_wet_conversion_records(self, spark, tmp_path):
        from aggo_spark.sources.warc import encode_warc, read_wet

        data = encode_warc([
            {"warc_type": "warcinfo", "payload": b"software: x\r\n"},
            {"warc_type": "conversion", "url": "http://a/x",
             "content_type": "text/plain",
             "payload": "extracted text body é".encode("utf-8")},
        ], gzip_members=True)
        (tmp_path / "w.wet.gz").write_bytes(data)
        rows = read_wet(spark, str(tmp_path)).collect()
        assert len(rows) == 1
        assert rows[0].url == "http://a/x"
        assert rows[0].text == "extracted text body é"


class TestClusterBalancedSample:
    """Embedding-tier diversity sampling: per-cell quotas with
    deterministic hash/near/far selection."""

    def _df(self, spark):
        # two tight clusters around (0,10) and (10,0), sizes 4 and 2
        rows = [(0, [0.0, 10.0]), (1, [0.1, 10.1]), (2, [0.2, 9.9]),
                (3, [0.3, 10.3]),
                (10, [10.0, 0.0]), (11, [10.4, 0.1]),
                (99, None)]
        return spark.createDataFrame(
            rows, "vec_id int, embedding array<double>")

    CENTERS = [[0.0, 10.0], [10.0, 0.0]]

    def test_quota_and_cells(self, spark):
        from aggo_spark.operators.similarity import cluster_balanced_sample

        out = cluster_balanced_sample(
            self._df(spark), n_per_cell=2, centroids=self.CENTERS)
        rows = out.collect()
        by_cell = {}
        for r in rows:
            by_cell.setdefault(r.cell, []).append(r.vec_id)
        assert len(by_cell[0]) == 2 and len(by_cell[1]) == 2
        assert set(by_cell[0]) <= {0, 1, 2, 3}
        assert set(by_cell[1]) == {10, 11}  # cell smaller than quota: all
        assert all(r.vec_id != 99 for r in rows)  # NULL vector excluded

    def test_near_and_far_orders(self, spark):
        from aggo_spark.operators.similarity import cluster_balanced_sample

        near = cluster_balanced_sample(
            self._df(spark), 1, centroids=self.CENTERS, order="near")
        far = cluster_balanced_sample(
            self._df(spark), 1, centroids=self.CENTERS, order="far")
        n = {r.cell: r.vec_id for r in near.collect()}
        f = {r.cell: r.vec_id for r in far.collect()}
        assert n[0] == 0     # exactly on the centroid
        assert f[0] == 3     # farthest from (0,10)
        assert n[1] == 10 and f[1] == 11

    def test_hash_order_deterministic(self, spark):
        from aggo_spark.operators.similarity import cluster_balanced_sample

        a = sorted(r.vec_id for r in cluster_balanced_sample(
            self._df(spark), 2, centroids=self.CENTERS).collect())
        b = sorted(r.vec_id for r in cluster_balanced_sample(
            self._df(spark), 2, centroids=self.CENTERS).collect())
        assert a == b

    def test_validation(self, spark):
        from aggo_spark.operators.similarity import cluster_balanced_sample

        with pytest.raises(ValueError, match="n_per_cell"):
            cluster_balanced_sample(self._df(spark), 0, centroids=self.CENTERS)
        with pytest.raises(ValueError, match="order"):
            cluster_balanced_sample(self._df(spark), 1,
                                    centroids=self.CENTERS, order="rand")

    def test_kmeans_mode_on_fixture(self, spark):
        from aggo_spark.operators.similarity import cluster_balanced_sample

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet")
        out = cluster_balanced_sample(emb, 5, n_centroids=8)
        cells = out.groupBy("cell").count().collect()
        assert all(r["count"] <= 5 for r in cells)
        assert out.count() <= 40 and len(cells) <= 8


class TestSecondCrawlReviewFixes:
    """Review pass over the post-crawl additions."""

    def test_warc_truncated_gzip_keeps_decoded_members(self):
        from aggo_spark.sources.warc import encode_warc, parse_warc_bytes

        data = encode_warc([
            {"warc_type": "warcinfo", "payload": b"a" * 50},
            {"warc_type": "response", "url": "http://x/1", "http": True,
             "payload": b"<p>hello</p>"},
        ], gzip_members=True)
        # cut inside the SECOND gzip member: member 1 must still parse
        recs = list(parse_warc_bytes(data[:len(data) - 20]))
        assert [r["warc_type"] for r in recs] == ["warcinfo"]
        # pure garbage after the gzip magic: empty, no raise
        assert list(parse_warc_bytes(b"\x1f\x8b" + b"junk" * 10)) == []

    def test_cluster_sample_kmeans_with_null_vector(self, spark):
        from aggo_spark.operators.similarity import cluster_balanced_sample

        df = spark.createDataFrame(
            [(0, [0.0, 10.0]), (1, [10.0, 0.0]), (2, None)],
            "vec_id int, embedding array<double>")
        out = cluster_balanced_sample(df, 1, n_centroids=2)  # kmeans mode
        assert sorted(r.vec_id for r in out.collect()) == [0, 1]

    def test_cluster_sample_single_cell_evaluation(self, spark):
        from aggo_spark.operators.similarity import cluster_balanced_sample

        out = cluster_balanced_sample(
            spark.createDataFrame([(0, [1.0, 2.0])],
                                  "vec_id int, embedding array<double>"),
            1, centroids=[[0.0, 0.0], [9.0, 9.0]])
        opt = out._jdf.queryExecution().optimizedPlan().toString()
        # the ranked-cell struct (interpreted HOF distances) must be
        # projected once, not inlined into both derived columns
        assert opt.count("sort_array") == 1

    def test_dup_ngram_stats_modes_agree(self, spark):
        from aggo_spark.operators.dedup import duplicate_ngram_fraction

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet")
        w = sorted(tuple(r) for r in duplicate_ngram_fraction(
            docs, n=5, stats="window").collect())
        j = sorted(tuple(r) for r in duplicate_ngram_fraction(
            docs, n=5, stats="join").collect())
        assert w == j and len(w) > 0
        with pytest.raises(ValueError, match="stats"):
            duplicate_ngram_fraction(docs, stats="salted")


class TestUrlCanonicalization:
    """URL-level dedup keys: scheme/host case, default ports, tracking
    params, param order, fragments."""

    def _c(self, spark, urls, **kw):
        from aggo_spark.operators.text import canonicalize_url
        df = spark.createDataFrame([(u,) for u in urls], "u string")
        return [r.c for r in df.select(
            canonicalize_url(F.col("u"), **kw).alias("c")).collect()]

    def test_normalizations(self, spark):
        got = self._c(spark, [
            "HTTP://Example.COM:80/Path?b=2&utm_source=x&a=1#frag",
            "https://a.io:443/",
            "https://a.io:8443/x",
            "http://example.com",
            "http://user:pw@example.com/x",
            "not a url at all",
        ])
        assert got[0] == "http://example.com/Path?a=1&b=2"
        assert got[1] == "https://a.io/"
        assert got[2] == "https://a.io:8443/x"
        assert got[3] == "http://example.com/"
        assert got[4] == "http://example.com/x"  # userinfo dropped
        assert got[5] is None

    def test_param_order_and_tracking_equivalence(self, spark):
        from aggo_spark.operators.text import url_dedup_key
        df = spark.createDataFrame([
            ("http://a.com/p?x=1&y=2",),
            ("http://A.com/p?y=2&x=1&gclid=abc&utm_campaign=z",),
            ("http://www.a.com/p?fbclid=q&x=1&y=2#sec",),
        ], "u string")
        keys = {r.k for r in df.select(
            url_dedup_key(F.col("u")).alias("k")).collect()}
        assert len(keys) == 1  # all three are the same resource

    def test_strip_www_option(self, spark):
        a = self._c(spark, ["http://www.a.com/x"], strip_www=True)[0]
        b = self._c(spark, ["http://www.a.com/x"])[0]
        assert a == "http://a.com/x" and b == "http://www.a.com/x"

    def test_tracking_params_case_insensitive_and_ref_kept(self, spark):
        got = self._c(spark, [
            "http://a.com/p?UTM_SOURCE=x&b=1",
            "http://a.com/raw?ref=develop",
            "http://a.com/raw?ref=main",
        ])
        assert got[0] == "http://a.com/p?b=1"   # case-variant tracker off
        assert got[1] != got[2]                  # semantic ?ref= preserved


class TestThirdReviewFixes:
    """Review pass over the slice-builder / URL / spans-mirror commits."""

    def test_explode_word_ngrams_differential_vs_column_form(self, spark):
        import random

        from aggo_spark.operators.text import (explode_word_ngrams,
                                               word_ngrams, tokens)

        rng = random.Random(11)
        vocab = [f"w{i}" for i in range(9)]
        rows = [(i, " ".join(rng.choice(vocab)
                             for _ in range(rng.randint(0, 20))))
                for i in range(60)] + [(98, None), (99, "one")]
        df = spark.createDataFrame(rows, "doc_id int, text string")
        for n in (1, 2, 5, 13):
            new = sorted((r.doc_id, r.g) for r in
                         explode_word_ngrams(df, n=n).collect())
            old = sorted((r.doc_id, r.g) for r in df.select(
                "doc_id", F.explode(word_ngrams(
                    tokens(F.col("text")), n)).alias("g")).collect())
            assert new == old, f"divergence at n={n}"

    def test_remove_spans_stats_plumbed(self, spark):
        from aggo_spark.operators.dedup import remove_duplicate_spans

        df = spark.createDataFrame(
            [("a", "a b c d e f9 g9 a b c d e")],
            "doc_id string, text string")
        w = remove_duplicate_spans(df, min_len=5).collect()[0]
        j = remove_duplicate_spans(df, min_len=5, stats="join").collect()[0]
        assert w.text_dedup == j.text_dedup == "a b c d e f9 g9"

    def test_jaccard_word_unit(self, spark):
        from aggo_spark.operators.dedup import ngram_jaccard_pairs

        df = spark.createDataFrame([
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "the quick brown fox jumps over the lazy dog today"),
            (3, "completely different text with no shared word grams here"),
        ], "doc_id int, text string")
        pairs = ngram_jaccard_pairs(
            df, k=3, threshold=0.5, unit="word").collect()
        assert [(r.id_a, r.id_b) for r in pairs] == [(1, 2)]
        assert 0.5 <= pairs[0].jaccard < 1.0
        with pytest.raises(ValueError, match="unit"):
            ngram_jaccard_pairs(df, unit="byte").collect()


class TestDistinctSketches:
    """Mergeable HLL sketch tables for corpus accounting: per-snapshot
    sketches union into rollups without rescanning old data."""

    def test_snapshot_merge_matches_exact(self, spark, tmp_path):
        from aggo_spark.operators.sketches import (distinct_sketch_table,
                                                   merge_sketch_tables,
                                                   sketch_estimates)

        # two "crawl snapshots" with overlapping URL sets per source
        snap1 = spark.range(600).selectExpr(
            "concat('s', id % 2) as source",
            "concat('http://h/', id % 200) as url")
        snap2 = spark.range(600).selectExpr(
            "concat('s', id % 2) as source",
            "concat('http://h/', 100 + (id % 200)) as url")
        t1 = distinct_sketch_table(snap1, "url", by=["source"])
        t2 = distinct_sketch_table(snap2, "url", by=["source"])
        # per-snapshot estimates are near-exact at this cardinality
        assert {r.source: r.estimate for r in t1.collect()} == {
            "s0": 100, "s1": 100}  # ids of one parity -> 100 urls each
        # write/read round-trip: sketches persist as parquet binary
        p = str(tmp_path / "sk1")
        t1.select("source", "sketch").write.parquet(p)
        t1r = sketch_estimates(spark.read.parquet(p))
        assert {r.source: r.estimate for r in t1r.collect()} == {
            "s0": 100, "s1": 100}
        # snapshot union per source, then global rollup — no re-scan
        per_source = merge_sketch_tables([t1r, t2], by=["source"])
        got = {r.source: r.estimate for r in per_source.collect()}
        exact = {r.source: r.n for r in snap1.unionByName(snap2)
                 .groupBy("source")
                 .agg(F.countDistinct("url").alias("n")).collect()}
        assert got == exact  # near-exact at these cardinalities
        overall = merge_sketch_tables([t1r, t2]).collect()[0].estimate
        assert overall == snap1.unionByName(snap2).select("url") \
            .distinct().count()

    def test_lgk_validation(self, spark):
        from aggo_spark.operators.sketches import distinct_sketch_table

        df = spark.range(3).selectExpr("cast(id as string) as v")
        with pytest.raises(ValueError, match="lg_k"):
            distinct_sketch_table(df, "v", lg_k=2)
        from aggo_spark.operators.sketches import merge_sketch_tables
        with pytest.raises(ValueError, match="at least one"):
            merge_sketch_tables([])
