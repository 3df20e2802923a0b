"""Round-9 fixes: r8-verdict items + ADVICE items.

Covered here:
- CJK tier (verdict #2): codepoint-range langid routing (zh/ja/ko),
  char-bigram tokenization (Column HOF form vs codegen table form
  differential), non-degenerate token stats on CJK, html_blocks
  per-block CJK routing.
- warc._local_path URI handling (ADVICE: file://<authority> and
  non-file schemes).
See also (in their home files): bounded retired index generations
(test_streaming.test_compaction_nets_postings,
test_round7_fixes.test_result_df_snapshot_survives_compaction),
bigram self-scoring corpus job removal (covered by the existing
differential tests in test_training_ops).
"""
import pytest
from pyspark.sql import functions as F

from tests.conftest import *  # noqa: F401,F403  (spark fixture)

ZH = "这是一个中文测试文档内容"
JA = "これは日本語のテストです"
KO = "이것은 한국어 테스트입니다"
EN_ONE_HAN = "the cat and the dog are in the house 中"
MIXED_JA = "日本語のテキスト with some english words here"


@pytest.fixture(scope="module")
def cjk_df(spark):
    rows = [
        (1, ZH),
        (2, JA),
        (3, KO),
        (4, EN_ONE_HAN),   # 1 han char over ~30 nonspace -> UNROUTED
        (5, "der Hund und die Katze sind nicht da"),
        (6, ""),
        (7, None),
        (8, MIXED_JA),     # ~50% CJK -> routed, kana present -> ja
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestCjkLanguageId:
    """Verdict #2: langid must return zh/ja/ko on CJK fixtures instead
    of 'und', while space-delimited text keeps the stopword argmax and
    a below-threshold CJK sprinkle stays unrouted."""

    EXPECTED = {1: "zh", 2: "ja", 3: "ko", 4: "en",
                5: "de", 6: "und", 7: "und", 8: "ja"}

    def test_table_form(self, spark, cjk_df):
        from aggo_spark.operators import text

        got = {r["doc_id"]: r["pred_lang"]
               for r in text.language_id_table(cjk_df, cjk_route=True).collect()}
        assert got == self.EXPECTED

    def test_column_form_matches_table_form(self, spark, cjk_df):
        from aggo_spark.operators import text

        got = {r["doc_id"]: r["p"] for r in cjk_df.select(
            "doc_id", text.language_id_cjk(F.col("text")).alias("p")).collect()}
        assert got == self.EXPECTED

    def test_route_off_is_backward_compatible(self, spark, cjk_df):
        from aggo_spark.operators import text

        old = {r["doc_id"]: r["pred_lang"]
               for r in text.language_id_table(cjk_df).collect()}
        # without routing, CJK collapses to 'und' (the r7-documented
        # limitation this tier fixes) and nothing else changes
        assert old[1] == old[2] == old[3] == "und"
        assert old[4] == "en" and old[5] == "de"

    def test_threshold_boundary_integer_arithmetic(self, spark):
        from aggo_spark.operators import text

        # exactly at the 15% boundary: 3 han chars, 20 nonspace chars
        # -> 3*100 >= 20*15 is TRUE (>=, not >)
        at = "中中中" + "a" * 17          # 20 nonspace, 3 cjk = 15%
        below = "中中中" + "a" * 18        # 21 nonspace, 3 cjk < 15%
        df = spark.createDataFrame(
            [(1, at), (2, below)], "doc_id long, text string")
        got = {r["doc_id"]: r["pred_lang"]
               for r in text.language_id_table(df, cjk_route=True).collect()}
        assert got[1] == "zh"
        assert got[2] == "und"  # unrouted, no stopwords -> und


class TestCjkTokens:
    """Char-bigram tokenization: the interpreted Column (HOF) form and
    the whole-stage-codegen table form must be row-identical (the
    codegen-over-HOF differential rule)."""

    def test_forms_identical(self, spark, cjk_df):
        from aggo_spark.operators import text

        a = cjk_df.select(
            "doc_id", F.explode(text.tokens_cjk(F.col("text"))).alias("tok"))
        b = text.token_table_cjk(cjk_df)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0

    def test_bigrams_hand_computed(self, spark):
        from aggo_spark.operators import text

        df = spark.createDataFrame(
            [(1, "abc 中文字 x 日")], "doc_id long, text string")
        got = [r["tok"] for r in text.token_table_cjk(df)
               .orderBy("tok").collect()]
        # latin tokens whole; CJK runs as char bigrams; isolated CJK
        # char yields itself
        assert sorted(got) == sorted(["abc", "x", "中文", "文字", "日"])

    def test_script_boundary_separation(self, spark):
        from aggo_spark.operators import text

        df = spark.createDataFrame(
            [(1, "abc中文def")], "doc_id long, text string")
        got = sorted(r["tok"] for r in text.token_table_cjk(df).collect())
        assert got == sorted(["abc", "中文", "def"])

    def test_stats_non_degenerate_on_cjk(self, spark, cjk_df):
        from aggo_spark.operators import text

        stats = {r["doc_id"]: (r["n_tokens"], r["n_unique_tokens"])
                 for r in text.token_stats_cjk(cjk_df).collect()}
        # pure-CJK docs produce MANY tokens (bigrams), not one giant one
        assert stats[1][0] >= 10 and stats[1][1] >= 10
        assert stats[2][0] >= 10
        assert stats[3][0] >= 8
        # whitespace path unchanged for latin text
        assert stats[5] == (8, 8)


class TestHtmlBlocksCjkRouting:
    """Verdict #2: cjk_aware html_blocks routes CJK blocks to the
    length-only rule (bigram pseudo-words, stop_frac NULL) instead of
    scoring them stop_frac=0 -> always boilerplate."""

    HTML = ("<html><body>"
            "<p>これは日本語の長い本文ですこれは日本語の長い本文です</p>"
            "<p>the cat and the dog are in the house with the other cats"
            " and the dogs of the town</p>"
            "<p>短い</p>"
            "</body></html>")

    def test_routing(self, spark):
        from aggo_spark.operators.html import html_blocks

        df = spark.createDataFrame([(1, self.HTML)], "doc_id long, html string")
        out = {r["block_no"]: r for r in
               html_blocks(df, min_words=10, cjk_aware=True).collect()}
        ja, en, short = out[0], out[1], out[2]
        # CJK block: bigram pseudo-word count, NULL stop_frac, content
        # by length alone
        assert ja["n_words"] >= 20 and ja["stop_frac"] is None
        assert ja["is_content"] is True
        # latin block: classified exactly as the non-CJK path
        assert en["stop_frac"] is not None and en["is_content"] is True
        # short CJK block: routed but below min_words -> boilerplate
        assert short["stop_frac"] is None and short["is_content"] is False

    def test_default_stays_legacy(self, spark):
        from aggo_spark.operators.html import html_blocks

        df = spark.createDataFrame([(1, self.HTML)], "doc_id long, html string")
        out = {r["block_no"]: r for r in
               html_blocks(df, min_words=10).collect()}
        # without cjk_aware the r7-documented degradation stands: the
        # CJK chars are stripped by normalize_text entirely (0 words,
        # stop_frac 0.0), so the block always scores boilerplate
        assert out[0]["n_words"] == 0 and out[0]["is_content"] is False


class TestTrigramStupidBackoff:
    """Verdict #3: trigram stupid-backoff LM scoring — hand-computed
    mirror for all three backoff levels + the self-vs-reference
    differential (the bigram pattern one order up)."""

    DOCS = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the rug and the cat sat still"),
        (3, "one two"),          # < 3 tokens -> no trigram evidence
        (4, ""),
        (5, None),
    ]

    def _df(self, spark, rows=None):
        return spark.createDataFrame(rows or self.DOCS,
                                     "doc_id long, text string")

    @staticmethod
    def _mirror(docs, ref, add_k=0.5, backoff=0.4):
        import math

        def toks(t):
            return t.lower().split() if t else []

        tri, ctx2, big, ctx1, uni = {}, {}, {}, {}, {}
        for _, t in ref:
            ws = toks(t)
            for g in zip(ws, ws[1:], ws[2:]):
                tri[g] = tri.get(g, 0) + 1
                ctx2[g[:2]] = ctx2.get(g[:2], 0) + 1
            for v, w in zip(ws, ws[1:]):
                big[(v, w)] = big.get((v, w), 0) + 1
                ctx1[v] = ctx1.get(v, 0) + 1
                uni[w] = uni.get(w, 0) + 1
        n, vocab = sum(uni.values()), len(uni)
        out = {}
        for i, t in docs:
            ws = toks(t)
            gs = list(zip(ws, ws[1:], ws[2:]))
            if not gs:
                out[i] = (0, None)
                continue
            lp = 0.0
            for u, v, w in gs:
                if (u, v, w) in tri:
                    lp += math.log(tri[(u, v, w)] / ctx2[(u, v)])
                elif (v, w) in big:
                    lp += math.log(backoff * big[(v, w)] / ctx1[v])
                else:
                    p_u = (uni.get(w, 0) + add_k) / (n + add_k * vocab)
                    lp += math.log(backoff * backoff * p_u)
            out[i] = (len(gs), round(lp / len(gs), 6))
        return out

    def test_self_scoring_matches_mirror(self, spark):
        from aggo_spark.operators.text import trigram_logprob_score

        got = {r.doc_id: (r.n_trigrams, r.mean_logprob) for r in
               trigram_logprob_score(self._df(spark)).collect()}
        want = self._mirror(self.DOCS, self.DOCS)
        assert set(got) == set(want)
        for i in got:
            assert got[i][0] == want[i][0], (i, got, want)
            if want[i][1] is None:
                assert got[i][1] is None
            else:
                assert abs(got[i][1] - want[i][1]) < 1e-6, (i,)

    def test_reference_equals_self_when_same_corpus(self, spark):
        from aggo_spark.operators.text import trigram_logprob_score

        df = self._df(spark)
        a = {r.doc_id: (r.n_trigrams, r.mean_logprob) for r in
             trigram_logprob_score(df).collect()}
        b = {r.doc_id: (r.n_trigrams, r.mean_logprob) for r in
             trigram_logprob_score(df, reference=df).collect()}
        c = {r.doc_id: (r.n_trigrams, r.mean_logprob) for r in
             trigram_logprob_score(df, reference=df,
                                   broadcast_model=True).collect()}
        assert a == b == c

    def test_all_three_backoff_levels(self, spark):
        from aggo_spark.operators.text import trigram_logprob_score

        ref = [(10, "a b c a b d")]
        # level 1: (a,b,c) in model -> log(1/2)
        # level 2: (x,a,b)? no — craft per level:
        docs = [
            (1, "a b c"),    # trigram hit: count(a,b,c)=1 / ctx2(a,b)=2
            (2, "x b c"),    # trigram miss, bigram (b,c) hit: 1/ctx1(b)=2
            (3, "x y d"),    # both miss -> backoff^2 * addk-unigram(d)
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        rdf = spark.createDataFrame(ref, "doc_id long, text string")
        got = {r.doc_id: r.mean_logprob for r in
               trigram_logprob_score(df, reference=rdf).collect()}
        import math
        assert abs(got[1] - round(math.log(1 / 2), 6)) < 1e-6
        assert abs(got[2] - round(math.log(0.4 * 1 / 2), 6)) < 1e-6
        # continuation counts: b:2, c:1, a:1, d:1 -> n=5, vocab=4
        p_d = (1 + 0.5) / (5 + 0.5 * 4)
        assert abs(got[3] - round(math.log(0.4 * 0.4 * p_d), 6)) < 1e-6
        # mirror agrees end to end
        want = self._mirror(docs, ref)
        for i in got:
            assert abs(got[i] - want[i][1]) < 1e-6

    def test_short_docs_null(self, spark):
        from aggo_spark.operators.text import trigram_logprob_score

        got = {r.doc_id: (r.n_trigrams, r.mean_logprob) for r in
               trigram_logprob_score(self._df(spark)).collect()}
        for i in (3, 4, 5):
            assert got[i] == (0, None)


class TestWetIndexed:
    """Verdict #5: WET through the splittable CDX-index path — same
    record-range fan-out as read_warc_indexed, rows identical to the
    un-indexed read_wet."""

    def _write_wet(self, tmp_path, n=10):
        from aggo_spark.sources.warc import encode_warc

        recs = [
            {"warc_type": "conversion", "url": f"http://x/{i}",
             "content_type": "text/plain",
             "payload": f"extracted text body {i}".encode()}
            for i in range(n)
        ]
        p = tmp_path / "a.warc.wet.gz"
        p.write_bytes(encode_warc(recs, gzip_members=True))
        return str(p)

    def test_rows_match_unindexed(self, spark, tmp_path):
        from aggo_spark.sources.warc import (build_warc_index, read_wet,
                                             read_wet_indexed)

        path = self._write_wet(tmp_path)
        idx = build_warc_index(spark, path)
        full = {(r.url, r.text) for r in read_wet(spark, path).collect()}
        ranged = {(r.url, r.text)
                  for r in read_wet_indexed(spark, idx).collect()}
        assert ranged == full and len(full) == 10

    def test_single_wet_archive_fans_out(self, spark, tmp_path):
        from aggo_spark.sources.warc import build_warc_index, read_wet_indexed

        path = self._write_wet(tmp_path, n=12)
        idx = build_warc_index(spark, path)
        out = read_wet_indexed(spark, idx, num_partitions=4)
        # the input-split requirement: ONE archive, >1 task
        parts = out.rdd.glom().map(len).collect()
        assert len(parts) == 4 and sum(1 for p in parts if p) > 1
        assert sum(parts) == 12


class TestFuzzySearchRegistryAutoUse:
    """Verdict #7: fuzzy_token_search auto-uses a registered posting
    index — the no-index double-tokenize (two Generates in the plan)
    disappears on a registry hit."""

    ROWS = [(1, "the spark engine runs fast"),
            (2, "a slow database engine"),
            (3, "completely unrelated prose")]

    @staticmethod
    def _n_live_generates(df):
        """Generate nodes that EXECUTE: lines inside an InMemoryRelation
        subtree are the cached index's build lineage (shown by Spark but
        replaced by the InMemoryTableScan above them at runtime)."""
        plan = df._jdf.queryExecution().executedPlan().toString()
        n, cache_indent = 0, None
        for line in plan.splitlines():
            indent = len(line) - len(line.lstrip(" :+-"))
            if cache_indent is not None and indent > cache_indent:
                continue  # still inside the cached lineage
            cache_indent = None
            if "InMemoryRelation" in line:
                cache_indent = indent
            elif "Generate " in line:
                n += 1
        return n

    def test_registry_hit_drops_generates(self, spark):
        from aggo_spark.operators import search as S

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        try:
            no_idx = S.fuzzy_token_search(df, "sparc engnie", max_dist=2)
            # the documented no-index cost: vocab + posting explodes
            assert self._n_live_generates(no_idx) >= 2
            assert "InMemoryTableScan" not in \
                no_idx._jdf.queryExecution().executedPlan().toString()
            # register the index the enhanced_text_search way
            S.enhanced_text_search(df, "engine", build_index=True)
            hit = S.fuzzy_token_search(df, "sparc engnie", max_dist=2)
            plan = hit._jdf.queryExecution().executedPlan().toString()
            # both passes read the registered index: no executing
            # Generate, two InMemoryTableScans
            assert self._n_live_generates(hit) == 0
            assert plan.count("InMemoryTableScan") >= 2
            # identical rows either way
            assert ({r.doc_id for r in hit.collect()}
                    == {r.doc_id for r in no_idx.collect()} == {1})
        finally:
            S.clear_text_search_index()

    def test_explicit_index_still_wins(self, spark):
        from aggo_spark.operators import search as S

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        idx = S.build_text_index(df, "text", "doc_id")
        out = S.fuzzy_token_search(df, "databse", max_dist=1, index=idx)
        assert {r.doc_id for r in out.collect()} == {2}


class TestVectorIndexMaintenance:
    """Verdict #6: maintain_index(kind='vector') + similarity.vector_probe
    — the embedding member of the maintained-index family. Mutations
    reach the index delta-only; retractions net per (id, cell, vec) so
    an edited doc's stale embedding cannot survive."""

    CENTROIDS = [[1.0, 0.0], [0.0, 1.0]]

    def _coll(self, spark, tmp_path):
        from aggo_spark.streaming.core import StreamingCollection

        return StreamingCollection(
            spark, "doc_id long, embedding array<double>",
            workdir=str(tmp_path))

    def test_mutate_probe_delta_only(self, spark, tmp_path):
        from aggo_spark.operators.similarity import vector_probe

        coll = self._coll(spark, tmp_path)
        try:
            coll.add_bulk([
                {"doc_id": 1, "embedding": [0.9, 0.1]},   # cell 0
                {"doc_id": 2, "embedding": [0.1, 0.9]},   # cell 1
            ])
            path = str(tmp_path / "vecidx")
            rid = coll.maintain_index(path, kind="vector",
                                      centroids=self.CENTROIDS)
            q = coll._queries[rid]
            idx = coll.index_df(rid)
            assert idx.count() == 2
            cells = {r["id"]: r["cell"] for r in idx.collect()}
            assert cells == {1: 0, 2: 1}

            qdf = spark.createDataFrame(
                [(100, [1.0, 0.05])], "vec_id long, embedding array<double>")
            got = vector_probe(coll.index_df(rid), qdf, self.CENTROIDS,
                               k=5, nprobe=1).collect()
            # nprobe=1 scans cell 0 only: doc 1 hits, doc 2 never scored
            assert [r["neighbor_id"] for r in got] == [1]

            # mutate -> the maintenance query consumes ONLY the delta
            coll.add({"doc_id": 3, "embedding": [0.8, 0.2]})
            assert coll.index_df(rid).count() == 3
            # input-metrics bound: the batch read the delta, not the
            # spool (file-source numInputRows is approximate — can
            # over-count by a row; a full reprocess would report >= the
            # whole corpus row count)
            prog = q.lastProgress
            assert prog is not None and prog["numInputRows"] <= 2
            got = {r["neighbor_id"] for r in
                   vector_probe(coll.index_df(rid), qdf, self.CENTROIDS,
                                k=5, nprobe=1).collect()}
            assert got == {1, 3}
        finally:
            coll.stop()

    def test_retraction_nets_stale_embedding(self, spark, tmp_path):
        from aggo_spark.operators.similarity import vector_probe

        coll = self._coll(spark, tmp_path)
        try:
            path = str(tmp_path / "vecidx")
            rid = coll.maintain_index(path, kind="vector",
                                      centroids=self.CENTROIDS,
                                      compact_every=10_000)
            coll.add({"doc_id": 1, "embedding": [0.9, 0.1]})   # cell 0
            # edit: remove + re-add with an embedding in the OTHER cell
            coll.remove({"doc_id": 1, "embedding": [0.9, 0.1]})
            coll.add({"doc_id": 1, "embedding": [0.05, 0.95]})  # cell 1
            idx = coll.index_df(rid)
            assert idx.count() == 3  # signed changelog rows
            q0 = spark.createDataFrame(
                [(100, [1.0, 0.0])], "vec_id long, embedding array<double>")
            q1 = spark.createDataFrame(
                [(101, [0.0, 1.0])], "vec_id long, embedding array<double>")
            # the stale cell-0 embedding netted out...
            assert vector_probe(idx, q0, self.CENTROIDS,
                                nprobe=1).count() == 0
            # ...and only the live cell-1 embedding answers
            got = vector_probe(idx, q1, self.CENTROIDS, nprobe=1).collect()
            assert [r["neighbor_id"] for r in got] == [1]
        finally:
            coll.stop()

    def test_compaction_nets_vector_rows(self, spark, tmp_path):
        coll = self._coll(spark, tmp_path)
        try:
            path = str(tmp_path / "vecidx")
            rid = coll.maintain_index(path, kind="vector",
                                      centroids=self.CENTROIDS,
                                      compact_every=2)
            coll.add({"doc_id": 1, "embedding": [0.9, 0.1]})
            coll.remove({"doc_id": 1, "embedding": [0.9, 0.1]})
            coll.add({"doc_id": 2, "embedding": [0.1, 0.9]})
            coll.add({"doc_id": 3, "embedding": [0.7, 0.3]})
            # compaction ran (generation swap): storage holds only the
            # net-positive rows — doc 1's add+remove are GONE
            assert coll.index_path(rid) != path
            rows = coll.index_df(rid).collect()
            ids = sorted(r["id"] for r in rows)
            assert 1 not in ids and set(ids) <= {2, 3}
            assert all(r["sign"] > 0 for r in rows)
        finally:
            coll.stop()

    def test_vector_kind_requires_centroids(self, spark, tmp_path):
        coll = self._coll(spark, tmp_path)
        try:
            with pytest.raises(ValueError, match="centroid"):
                coll.maintain_index(str(tmp_path / "v"), kind="vector")
        finally:
            coll.stop()


# marked slow (r14): excluded from the default driver gate, run with -m slow
@pytest.mark.slow
class TestPackChunksSubBuckets:
    """r8-verdict blemish #3: pack_chunks two-level distributed prefix
    sum — sub_buckets=N must equal the single-window result exactly."""

    def _df(self, spark):
        import random

        rng = random.Random(5)
        rows = [(d, c, rng.randint(1, 50), f"s{d % 3}")
                for d in range(40) for c in range(rng.randint(1, 4))]
        return spark.createDataFrame(
            rows, "doc_id long, chunk_id long, n_chunk_tokens int, shard string")

    def test_differential_vs_single_window(self, spark):
        from aggo_spark.operators.text import pack_chunks

        df = self._df(spark)
        base = pack_chunks(df, example_size=64)
        for n in (2, 4, 7):
            split = pack_chunks(df, example_size=64, sub_buckets=n)
            assert base.exceptAll(split).count() == 0
            assert split.exceptAll(base).count() == 0

    def test_parallelism_multiplies(self, spark):
        from aggo_spark.operators.text import pack_chunks

        df = self._df(spark)
        split = pack_chunks(df, example_size=64, sub_buckets=4)
        # the local cumsum window partitions on (shard, __sub): distinct
        # (shard, sub) groups exceed the 3 shards — the parallelism knob
        # the single-window form lacks
        plan = split._jdf.queryExecution().optimizedPlan().toString()
        assert "__sub" in plan


class TestCjkDedupShingles:
    """Verdict #2 (dedup leg): charset='cjk' keeps CJK codepoints in the
    shingle stream, so MinHash finds CJK near-dups that the latin
    normalizer collapses to nothing."""

    ROWS = [
        (1, "これは日本語のテスト文書ですこれは長い本文を持っています"),
        (2, "これは日本語のテスト文書ですこれは長い本文を持っている"),  # near-dup of 1
        (3, "全く別の内容で構成された中国語風の文書内容がここに入る"),
    ]

    def test_cjk_charset_finds_near_dups(self, spark):
        from aggo_spark.operators import dedup

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        pairs = dedup.minhash_lsh_pairs(
            df, num_perm=32, bands=16, k=3, threshold=0.3,
            charset="cjk").collect()
        got = {(min(r.id_a, r.id_b), max(r.id_a, r.id_b)) for r in pairs}
        assert (1, 2) in got
        assert (1, 3) not in got and (2, 3) not in got

    def test_latin_charset_degenerates_documented(self, spark):
        from aggo_spark.operators import dedup, text
        from pyspark.sql import functions as F

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        # the r7-documented limitation this flag fixes: latin normalize
        # strips CJK entirely -> no shingles -> no signatures at all
        assert text.explode_shingles(df, k=3).count() == 0
        assert dedup.minhash_signatures(df, num_perm=8, k=3).count() == 0

    def test_charset_validated(self, spark):
        from aggo_spark.operators import text

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        with pytest.raises(ValueError, match="charset"):
            text.explode_shingles(df, charset="utf8")


class TestBaselineJpegCodec:
    """Verdict #4: real baseline JPEG pixel decode (DHT-driven Huffman +
    dequant + IDCT + upsample + YCbCr->RGB) — no Spark session needed,
    the codec is plain numpy/stdlib."""

    @staticmethod
    def _expected_solid(r, g, b):
        import math

        def fl(x):
            return min(max(math.floor(x + 0.5), 0), 255)

        y = fl(0.299 * r + 0.587 * g + 0.114 * b)
        cb = fl(128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b)
        cr = fl(128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b)
        return [float(fl(y + 1.402 * (cr - 128.0))),
                float(fl(y - 0.344136 * (cb - 128.0)
                         - 0.714136 * (cr - 128.0))),
                float(fl(y + 1.772 * (cb - 128.0)))]

    def test_solid_roundtrip_exact(self):
        from aggo_spark.operators import multimodal as M

        for w, h, px, sub in [(13, 9, (200, 30, 99), "444"),
                              (8, 8, (0, 0, 0), "444"),
                              (24, 17, (255, 128, 7), "444"),
                              (13, 9, (10, 200, 77), "420")]:
            meta = M.jpeg_pixel_decode(M.encode_jpeg(w, h, px,
                                                     subsampling=sub))
            assert meta is not None
            assert (meta["width"], meta["height"],
                    meta["channels"]) == (w, h, 3)
            # identity quant: the solid color round-trips EXACTLY —
            # the q40 arithmetic-oracle property
            assert meta["channel_means"] == self._expected_solid(*px)
            assert meta["phash"] == "ffffffffffffffff"

    def test_grayscale(self):
        from aggo_spark.operators import multimodal as M

        meta = M.jpeg_pixel_decode(M.encode_jpeg(10, 6, 150))
        assert meta["channels"] == 1
        assert meta["channel_means"] == [150.0]

    def test_random_image_roundtrip_within_dct_rounding(self):
        import numpy as np

        from aggo_spark.operators import multimodal as M

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, size=(19, 23, 3), dtype=np.uint8)
        meta = M.jpeg_pixel_decode(M.encode_jpeg(image=img))
        # independent mirror: the JFIF color round-trip alone — identity
        # quant bounds the extra DCT-coefficient rounding at 0.5/coef
        # (orthonormal IDCT -> per-pixel error <= 4, mean error << 1)
        R, G, B = (img[..., c].astype(np.float64) for c in range(3))
        r2, g2, b2 = M._ycbcr_to_rgb_arrays(*M._rgb_to_ycbcr_arrays(R, G, B))
        exp = [float(np.mean(c)) for c in (r2, g2, b2)]
        for got, want in zip(meta["channel_means"], exp):
            assert abs(got - want) < 1.5

    def test_restart_intervals(self):
        import numpy as np

        from aggo_spark.operators import multimodal as M

        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, size=(19, 23, 3), dtype=np.uint8)
        plain = M.jpeg_pixel_decode(M.encode_jpeg(image=img))
        rst = M.jpeg_pixel_decode(M.encode_jpeg(image=img,
                                                restart_interval=2))
        assert rst is not None
        assert rst["channel_means"] == plain["channel_means"]

    def test_lossy_quant_still_decodes(self):
        import numpy as np

        from aggo_spark.operators import multimodal as M

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        q = [16] * 64
        meta = M.jpeg_pixel_decode(M.encode_jpeg(image=img, quant=[q, q]))
        assert meta is not None
        R, G, B = (img[..., c].astype(np.float64) for c in range(3))
        r2, g2, b2 = M._ycbcr_to_rgb_arrays(*M._rgb_to_ycbcr_arrays(R, G, B))
        for got, want in zip(meta["channel_means"],
                             [float(np.mean(c)) for c in (r2, g2, b2)]):
            assert abs(got - want) < 8  # q=16 quantization noise bound

    def test_fallbacks_never_fabricate(self):
        from aggo_spark.operators import multimodal as M

        # progressive -> header-only (real dims, NULL means)
        meta = M.jpeg_decode(M.encode_jpeg_header(100, 50, 3,
                                                  progressive=True))
        assert meta["width"] == 100 and meta["channel_means"] is None
        # SOF0 header with no scan -> header-only
        meta = M.jpeg_decode(M.encode_jpeg_header(64, 32, 3))
        assert meta["width"] == 64 and meta["channel_means"] is None
        # corrupt magic -> None
        assert M.jpeg_decode(b"\xff\xd8\xff\x00") is None
        # truncated scan -> header-only or None, never fake stats
        blob = M.encode_jpeg(16, 16, (5, 5, 5))
        meta = M.jpeg_decode(blob[:len(blob) // 2])
        assert meta is None or meta["channel_means"] is None


class TestLocalPathUriHandling:
    """ADVICE r8: file://<authority> resolution + clear errors for
    non-file schemes (instead of ENOENT through open())."""

    def test_forms(self):
        from aggo_spark.sources.warc import _local_path

        assert _local_path("/tmp/x.warc.gz") == "/tmp/x.warc.gz"
        assert _local_path("file:/tmp/x") == "/tmp/x"
        assert _local_path("file:///tmp/x") == "/tmp/x"
        assert _local_path("file://localhost/tmp/x") == "/tmp/x"
        assert _local_path("relative/path.warc") == "relative/path.warc"

    def test_rejections(self):
        from aggo_spark.sources.warc import _local_path

        with pytest.raises(ValueError, match="authority"):
            _local_path("file://otherhost/tmp/x")
        for uri in ("hdfs://nn/x", "s3a://bucket/key", "http://h/x"):
            with pytest.raises(ValueError, match="scheme"):
                _local_path(uri)


class TestReviewPass2:
    """Second r9 adversarial review pass findings."""

    def test_exotic_sampling_factor_falls_back(self):
        from aggo_spark.operators import multimodal as M

        blob = bytearray(M.encode_jpeg(16, 16, (40, 80, 120)))
        # patch SOF sampling to a NON-DIVISIBLE mix (luma sh=3, chroma
        # sh=2 -> hmax=3, 3 % 2 != 0): the nearest upsample assumes
        # integer replication factors, so the decoder must fall back to
        # the header tier, never decode wrong pixels
        i = blob.find(b"\xff\xc0")
        comp0_hv = i + 2 + 2 + 6 + 1  # marker+len+prec/h/w/nc+cid
        assert blob[comp0_hv] == 0x11
        blob[comp0_hv] = 0x31
        assert blob[comp0_hv + 3] == 0x11
        blob[comp0_hv + 3] = 0x21
        assert M.jpeg_pixel_decode(bytes(blob)) is None
        meta = M.jpeg_decode(bytes(blob))
        assert meta is not None and meta["channel_means"] is None

    def test_pack_chunks_string_lead_clear_error(self, spark):
        from aggo_spark.operators.text import pack_chunks

        df = spark.createDataFrame(
            [("a", 1, 5, "s0"), ("b", 2, 7, "s0")],
            "doc_id string, chunk_id long, n_chunk_tokens int, shard string")
        with pytest.raises(ValueError, match="numeric/date leading"):
            pack_chunks(df, example_size=8, sub_buckets=2,
                        order_cols=("doc_id", "chunk_id"))
        # numeric lead unaffected
        ok = pack_chunks(df, example_size=8, sub_buckets=2,
                         order_cols=("chunk_id", "doc_id"))
        assert ok.count() == 2


class TestScriptRouter:
    """Late r9: language_id_table(script_route=True) — the router
    generalized beyond CJK. Single-language scripts get the language,
    shared scripts get the honest BCP-47-style script tag, CJK keeps
    its kana/hangul/han cascade, latin text keeps the stopword argmax,
    and cjk_route=True behavior (the q36 oracle contract) is untouched."""

    ROWS = [
        (1, "αυτό είναι ένα ελληνικό κείμενο δοκιμής"),           # el
        (2, "זהו טקסט בדיקה בעברית עם מילים"),                    # he
        (3, "นี่คือข้อความทดสอบภาษาไทยสำหรับระบบ"),                # th
        (4, "это тестовый текст на русском языке"),               # ru (refined)
        (5, "هذا نص اختبار باللغة العربية للنظام"),               # ar (refined)
        (6, "यह परीक्षण के लिए हिंदी पाठ है"),                     # hi (refined)
        (7, "これは日本語のテストです"),                           # ja (CJK cascade)
        (8, "the cat and the dog are in the house"),              # en (stopwords)
        (9, "das ist ein α test mit einem griechischen zeichen"), # de: 1 greek
                                                                  # char < 15%
        (10, None),                                               # und
    ]
    EXPECTED = {1: "el", 2: "he", 3: "th", 4: "ru", 5: "ar",
                6: "hi", 7: "ja", 8: "en", 9: "de", 10: "und"}

    def test_script_route_labels(self, spark):
        from aggo_spark.operators import text

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        got = {r["doc_id"]: r["pred_lang"] for r in
               text.language_id_table(df, script_route=True).collect()}
        assert got == self.EXPECTED

    def test_cjk_route_unchanged_by_superset(self, spark, cjk_df):
        from aggo_spark.operators import text

        base = {r["doc_id"]: r["pred_lang"] for r in
                text.language_id_table(cjk_df, cjk_route=True).collect()}
        sup = {r["doc_id"]: r["pred_lang"] for r in
               text.language_id_table(cjk_df, script_route=True).collect()}
        # the CJK fixture has no non-CJK routed scripts: identical labels
        assert sup == base

    def test_mixed_script_argmax(self, spark):
        from aggo_spark.operators import text

        # cyrillic majority with a greek minority -> argmax picks the
        # Cyrl family, then the refinement stage lands on ru
        df = spark.createDataFrame(
            [(1, "это русский текст с одним α")],
            "doc_id long, text string")
        got = text.language_id_table(df, script_route=True).first()
        assert got["pred_lang"] == "ru"


class TestMultilingualTokens:
    """Late r9: the multilingual token/shingle tier — spaced scripts get
    whole word tokens, unspaced scripts (CJK, Thai) get char bigrams,
    and the CJK tier's outputs stay byte-identical post-refactor."""

    ROWS = [
        (1, "это тестовый текст"),            # cyrillic: whole tokens
        (2, "αυτό είναι κείμενο"),            # greek: whole tokens
        (3, "هذا نص اختبار"),                 # arabic: whole tokens
        (4, "ไทยสั้น"),                        # thai: char bigrams
        (5, "mixed текст and 中文 here"),      # latin+cyr+cjk
        (6, None),
    ]

    def _df(self, spark):
        return spark.createDataFrame(self.ROWS, "doc_id long, text string")

    def test_hof_and_table_forms_identical(self, spark):
        from aggo_spark.operators import text

        df = self._df(spark)
        a = df.select("doc_id", F.explode(
            text.tokens_multilingual(F.col("text"))).alias("tok"))
        b = text.token_table_multilingual(df)
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0

    def test_spaced_scripts_whole_tokens(self, spark):
        from aggo_spark.operators import text

        got = {}
        for r in text.token_table_multilingual(self._df(spark)).collect():
            got.setdefault(r["doc_id"], []).append(r["tok"])
        assert sorted(got[1]) == sorted(["это", "тестовый", "текст"])
        assert sorted(got[2]) == sorted(["αυτό", "είναι", "κείμενο"])
        assert sorted(got[3]) == sorted(["هذا", "نص", "اختبار"])

    def test_thai_char_bigrams(self, spark):
        from aggo_spark.operators import text

        got = [r["tok"] for r in
               text.token_table_multilingual(self._df(spark))
               .filter(F.col("doc_id") == 4).collect()]
        s = "ไทยสั้น"
        assert sorted(got) == sorted(s[i:i + 2] for i in range(len(s) - 1))

    def test_mixed_script_doc(self, spark):
        from aggo_spark.operators import text

        got = sorted(r["tok"] for r in
                     text.token_table_multilingual(self._df(spark))
                     .filter(F.col("doc_id") == 5).collect())
        assert got == sorted(["mixed", "текст", "and", "中文", "here"])

    def test_stats_non_degenerate(self, spark):
        from aggo_spark.operators import text

        stats = {r["doc_id"]: r["n_tokens"] for r in
                 text.token_stats_multilingual(self._df(spark)).collect()}
        assert stats[1] == 3 and stats[4] == 6

    def test_cjk_tier_byte_identical_post_refactor(self, spark, cjk_df):
        from aggo_spark.operators import text

        # the shared-core refactor must not move the CJK outputs: the
        # hand-computed pin from TestCjkTokens re-asserted here
        df = spark.createDataFrame(
            [(1, "abc 中文字 x 日")], "doc_id long, text string")
        got = sorted(r["tok"] for r in text.token_table_cjk(df).collect())
        assert got == sorted(["abc", "x", "中文", "文字", "日"])

    def test_multilingual_shingles_find_cyrillic_neardups(self, spark):
        from aggo_spark.operators import dedup

        rows = [
            (1, "это очень длинный русский текст для проверки дедупликации"),
            (2, "это очень длинный русский текст для проверки дедупликаций"),
            (3, "совсем другое содержание не похожее ни на что здесь"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = dedup.minhash_lsh_pairs(
            df, num_perm=64, bands=16, k=5, charset="multilingual")
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert (1, 2) in got
        assert (1, 3) not in got and (2, 3) not in got
        # latin charset strips cyrillic entirely -> no candidates at all
        latin = dedup.minhash_lsh_pairs(df, num_perm=64, bands=16, k=5)
        assert all(r["est_jaccard"] >= 0 for r in latin.collect())


class TestCyrillicRefinement:
    """Late r9: second-stage stopword refinement for und-Cyrl — ru/uk/bg
    separate on distinctive function words (что/що/че, он/він/той...),
    an evidence-free Cyrillic doc keeps the honest script tag, and the
    refinement bits can never perturb unrouted (latin) rows."""

    ROWS = [
        (1, "что это было и где он был если не здесь"),        # ru
        (2, "що це було і де він був якщо не тут"),            # uk
        (3, "че това беше и къде той беше ако не тук"),        # bg
        (4, "шарфик коврик зонтик домик"),                     # no stopwords
        (5, "the cat and the dog are in the house"),           # en unrouted
    ]

    def test_refined_labels(self, spark):
        from aggo_spark.operators import text

        df = spark.createDataFrame(self.ROWS, "doc_id long, text string")
        got = {r["doc_id"]: r["pred_lang"] for r in
               text.language_id_table(df, script_route=True).collect()}
        assert got == {1: "ru", 2: "uk", 3: "bg",
                       4: "und-Cyrl", 5: "en"}

    def test_cjk_route_never_refines(self, spark):
        from aggo_spark.operators import text

        # cjk_route=True (the q36 oracle contract) has no script ranges
        # and therefore no refinement: cyrillic stays stopword-routed
        # latin behavior -> 'und'
        df = spark.createDataFrame(self.ROWS[:1], "doc_id long, text string")
        got = text.language_id_table(df, cjk_route=True).first()
        assert got["pred_lang"] == "und"


class TestArabDevaRefinement:
    """Late r9: und-Arab -> ar/fa/ur and und-Deva -> hi/mr/ne second-stage
    refinement, incl. in-range script punctuation stripping (danda, urdu
    full stop glue themselves to tokens otherwise)."""

    ROWS = [
        (1, "هذا النص كان في البيت مع كل شيء بعد ذلك"),    # ar
        (2, "این متن است که با آن از خود می شد برای"),     # fa
        (3, "یہ متن ہے اور اس کے لیے بھی نہیں تھا۔"),      # ur (with ۔)
        (4, "यह पाठ है और इस के लिए भी नहीं था।"),          # hi (with danda)
        (5, "हा मजकूर आहे आणि या साठी नाही होते"),          # mr
        (6, "यो पाठ छ र यस को लागि पनि छैन"),               # ne
        (7, "كلمات غريبة بدون ادوات ربط معروفة"),          # und-Arab kept?
    ]

    def test_refined_labels(self, spark):
        from aggo_spark.operators import text

        df = spark.createDataFrame(self.ROWS[:6], "doc_id long, text string")
        got = {r["doc_id"]: r["pred_lang"] for r in
               text.language_id_table(df, script_route=True).collect()}
        assert got == {1: "ar", 2: "fa", 3: "ur", 4: "hi", 5: "mr", 6: "ne"}

    def test_punct_stripped_from_tokens(self, spark):
        from aggo_spark.operators import text

        df = spark.createDataFrame(
            [(1, "यह है। और۔ ،нет")], "doc_id long, text string")
        toks = sorted(r["tok"] for r in
                      text.token_table_multilingual(df).collect())
        assert toks == sorted(["यह", "है", "और", "нет"])


class TestPortuguese:
    """Late r9: pt added to the base stopword table (appended last, so
    every existing tie-break is preserved); real pt text stops
    argmaxing to es."""

    def test_pt_vs_es(self, spark):
        from aggo_spark.operators import text

        rows = [
            (1, "o texto é para você e não para ele mas foi também"),
            (2, "el texto es para los niños y no para el perro pero"),
            (3, "der Hund und die Katze sind nicht da"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["pred_lang"] for r in
               text.language_id_table(df).collect()}
        assert got == {1: "pt", 2: "es", 3: "de"}

    def test_shared_word_ties_prefer_earlier_langs(self, spark):
        from aggo_spark.operators import text

        # only shared es/pt spellings -> equal scores -> es (earlier) wins,
        # exactly the pre-pt behavior for such text
        df = spark.createDataFrame(
            [(1, "de que para como se no")], "doc_id long, text string")
        assert text.language_id_table(df).first()["pred_lang"] == "es"
