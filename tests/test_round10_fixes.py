"""Round-10 fixes: r9-verdict items + r9 ADVICE items.

Covered here:
- JPEG pixel budget (ADVICE medium): forged/huge SOF dims fall back to
  the header tier instead of allocating O(pixels) planes; MemoryError
  is in the decode's degrade path.
- n_tokens_cjk / n_tokens_multilingual (ADVICE: html_blocks routed word
  count built the full bigram array just to take its size) — arithmetic
  codegen count pinned equal to F.size(HOF form) differentially, and
  html_blocks(cjk_aware=True) output pinned unchanged.
- train_nb(return_unseen=True) + classifier_score(unseen_weight=...)
  (ADVICE: exact smoothed NB gives unseen buckets log(denom_n/denom_p),
  not 0) — exact-mode scoring matches a numpy mirror; default mode
  unchanged.
- maintain_index/stream keep_generations (ADVICE: slow consumers could
  not extend the one-generation compaction grace period).

See test_round10_lm.py for the order-n persisted LM (verdict #2) and
test_streaming (incremental CC) for verdict #3.
"""
import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import *  # noqa: F401,F403  (spark fixture)


MIXED_ROWS = [
    ("a", "hello world"),
    ("b", "中文字 test 漢字"),
    ("c", "中"),
    ("d", ""),
    ("e", None),
    ("f", "日本語のテキストです and english words"),
    ("g", "a 中 b 文 c"),
    ("h", "สวัสดีครับ ภาษาไทย mixed ฟ"),
    ("i", "русский текст здесь"),
    ("j", "  spaces   everywhere  "),
    ("k", "中文中文中文中文 x 字"),
    ("l", "한국어 텍스트 테스트 one two"),
    ("m", "നമസ്കാരം hello"),  # unrouted script chars get stripped
]


class TestArithmeticTokenCounts:
    """codegen-over-HOF rule: the arithmetic count must equal the HOF
    array's size on every script mix (NULL-safe)."""

    def _norm(self, v):
        # legacy sizeOfNull -1 and ANSI NULL are the same "no input"
        return None if v in (-1, None) else v

    def test_cjk_and_multilingual_differential(self, spark):
        from aggo_spark.operators.text import (
            n_tokens_cjk, n_tokens_multilingual, tokens_cjk,
            tokens_multilingual)

        df = spark.createDataFrame(MIXED_ROWS, "id string, t string")
        got = df.select(
            F.size(tokens_cjk(F.col("t"))).alias("hof_cjk"),
            n_tokens_cjk(F.col("t")).alias("arith_cjk"),
            F.size(tokens_multilingual(F.col("t"))).alias("hof_ml"),
            n_tokens_multilingual(F.col("t")).alias("arith_ml"),
        ).collect()
        for r in got:
            assert self._norm(r["hof_cjk"]) == self._norm(r["arith_cjk"])
            assert self._norm(r["hof_ml"]) == self._norm(r["arith_ml"])

    def test_html_blocks_cjk_routing_unchanged(self, spark):
        """The html_blocks(cjk_aware=True) signals must be identical to
        what the HOF form produced (the swap is a pure plan change)."""
        from aggo_spark.operators.html import html_blocks

        rows = [
            (1, "<p>これは日本語のテキストです、長い文章。</p>"
                "<p>short en</p>"
                "<p>the quick brown fox jumps over the lazy dog and"
                " then the other animals in the big red house</p>"),
            (2, None),
            (3, "<div>中文</div>"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, html string")
        got = {(r["doc_id"], r["block_no"]):
               (r["n_words"], r["stop_frac"], r["is_content"])
               for r in html_blocks(df, cjk_aware=True, min_words=5)
               .collect()}
        # routed blocks: bigram pseudo-words, stop_frac NULL,
        # length-only classification
        ja = got[(1, 0)]
        assert ja[0] >= 5 and ja[1] is None and ja[2] is True
        assert got[(3, 0)] == (1, None, False)
        # unrouted blocks keep the stopword rule
        en = got[(1, 2)]
        assert en[0] >= 15 and en[1] > 0.25 and en[2] is True
        assert got[(2, None)] == (None, None, False)


class TestJpegPixelBudget:
    def test_budget_falls_back_to_none(self):
        from aggo_spark.operators.multimodal import (
            encode_jpeg, jpeg_pixel_decode)

        img = encode_jpeg(16, 16, (200, 30, 40))
        assert jpeg_pixel_decode(img) is not None
        assert jpeg_pixel_decode(img, pixel_budget=255) is None

    def test_forged_huge_sof_dims_return_none(self):
        """A legal header claiming 65500x65500 must NOT allocate planes
        — craft it by patching a real fixture's SOF dims."""
        import struct

        from aggo_spark.operators.multimodal import (
            encode_jpeg, jpeg_decode, jpeg_pixel_decode)

        img = bytearray(encode_jpeg(16, 16, (10, 20, 30)))
        sof = img.find(b"\xff\xc0")
        assert sof > 0
        # SOF0 body: len(2) prec(1) H(2) W(2) ...
        struct.pack_into(">HH", img, sof + 5, 65500, 65500)
        out = jpeg_pixel_decode(bytes(img))
        assert out is None
        # jpeg_decode degrades to the header tier: dims visible,
        # channel_means NULL — never a fabricated value, never an OOM
        meta = jpeg_decode(bytes(img))
        assert meta["width"] == 65500 and meta["height"] == 65500
        assert meta.get("channel_means") is None

    def test_memory_error_degrades(self, monkeypatch):
        from aggo_spark.operators import multimodal as mm

        img = mm.encode_jpeg(8, 8, (1, 2, 3))
        monkeypatch.setattr(
            mm, "_dct8",
            lambda: (_ for _ in ()).throw(MemoryError("boom")))
        assert mm.jpeg_pixel_decode(img) is None


class TestExactNbUnseen:
    @pytest.fixture(scope="class")
    def trained(self, spark):
        from aggo_spark.operators import classify

        rows = [(i,
                 ("informative educational article paragraph %d" % i)
                 if i % 2 else ("buy now cheap pills %d" % i),
                 i % 2) for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, text string, label int")
        w, b, u = classify.train_nb(df, n_buckets=256, return_unseen=True)
        return df, w, b, u

    def test_unseen_constant_matches_definition(self, spark, trained):
        """u == log(denom_n/denom_p) recomputed from the histograms."""
        from aggo_spark.operators.sampling import _hashed_gram_rows

        df, w, b, u = trained
        grams = _hashed_gram_rows(df, "text", "doc_id", 256, 2, "xxhash64")
        lab = df.select(F.col("doc_id").alias("id"), "label")
        tot = {r["label"]: r["n"] for r in grams.join(lab, "id")
               .groupBy("label").agg(F.count(F.lit(1)).alias("n"))
               .collect()}
        expect = math.log((tot[0] + 256.0) / (tot[1] + 256.0))
        assert u == pytest.approx(expect, rel=1e-12)

    def test_exact_mode_matches_numpy_mirror(self, spark, trained):
        """score = bias + Σ_seen c·w + (Σc_unseen)·u — mirror per doc."""
        from aggo_spark.operators import classify
        from aggo_spark.operators.sampling import _hashed_gram_rows

        df, w, b, u = trained
        wmap = {r["bucket"]: r["weight"] for r in w.collect()}
        grams = _hashed_gram_rows(df, "text", "doc_id", 256, 2, "xxhash64")
        per_doc = {}
        for r in grams.collect():
            per_doc.setdefault(r["id"], []).append(r["bucket"])
        got = {r["doc_id"]: r["score"] for r in classify.classifier_score(
            df, w, b, n_buckets=256, unseen_weight=u).collect()}
        for did, buckets in per_doc.items():
            expect = b + sum(wmap.get(bk, u) for bk in buckets)
            assert got[did] == pytest.approx(round(expect, 6), abs=2e-6)

    def test_default_mode_unchanged(self, spark, trained):
        """unseen_weight=0.0 keeps the sparse inner-join semantics —
        identical output to the 2-tuple API."""
        from aggo_spark.operators import classify

        df, w, b, u = trained
        w2, b2 = classify.train_nb(df, n_buckets=256)
        assert b2 == b
        a = sorted(map(tuple, classify.classifier_score(
            df, w, b, n_buckets=256).collect()))
        c = sorted(map(tuple, classify.classifier_score(
            df, w2, b2, n_buckets=256).collect()))
        assert a == c


class TestNewCrawlLanguages:
    """r9-verdict #8: nl/sv/pl/tr/id/vi appended to the base stopword
    table — each one bitmask bit on the existing probe, every prior
    tie-break preserved."""

    FIXTURES = {
        "nl": "het is een goed boek en ook niet te duur voor de mensen",
        "sv": "det var en bok som har och att den inte kan om man vid",
        "pl": "to jest tak jak nie ale po co dla nas od za tym",
        "tr": "bu bir kitap ve daha ne gibi ama her sonra kadar olan",
        "id": "ini adalah buku yang bagus dan tidak untuk saya dengan kami juga",
        "vi": "anh em cho nhau khi con theo trong hay ai xem vui",
    }

    def test_new_languages_argmax(self, spark):
        from aggo_spark.operators import text

        rows = [(i, t) for i, t in enumerate(self.FIXTURES.values())]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = [r["pred_lang"] for r in
               text.language_id_table(df).orderBy("doc_id").collect()]
        assert got == list(self.FIXTURES)

    def test_prior_behavior_preserved(self, spark):
        """The r9 fixture sentences must still argmax to their old
        labels with the six new bits compiled in."""
        from aggo_spark.operators import text

        rows = [
            (1, "the cat and the dog are in the house"),
            (2, "der Hund und die Katze sind nicht da"),
            (3, "el texto es para los niños y no para el perro pero"),
            (4, "o texto é para você e não para ele mas foi também"),
            (5, "de que para como se no"),  # es/pt tie -> es (earlier)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["pred_lang"]
               for r in text.language_id_table(df).collect()}
        assert got == {1: "en", 2: "de", 3: "es", 4: "pt", 5: "es"}

    def test_new_lists_survive_normalization(self, spark):
        """The base probe matches normalize_text tokens (ascii), so a
        stopword with diacritics can never fire — the new lists must be
        ascii-pure by construction (the documented contract)."""
        import re

        from aggo_spark.operators.text import LANG_STOPWORDS

        for lang in ("nl", "sv", "pl", "tr", "id", "vi"):
            for w in LANG_STOPWORDS[lang]:
                assert re.fullmatch(r"[a-z0-9]+", w), (lang, w)
