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
