"""Round 13: mojibake repair — the ftfy-core heuristic as an
Arrow-batched kernel with a pure-Column signature gate.

UTF-8-read-as-Latin-1/cp1252 is the single most common crawl text
corruption; repair must be exact on damaged text and a NO-OP on
everything else (clean ASCII, legitimate Latin-1, CJK)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aggo_spark.operators import text as T

ORIG = "Café — “naïve” dishes cost £9.50, ½ off"
GARBLED = ORIG.encode("utf-8").decode("latin-1")
DOUBLE = GARBLED.encode("utf-8").decode("latin-1")


class TestKernel:
    def test_single_and_double_encoding_repair(self):
        assert T.fix_mojibake_text(GARBLED) == ORIG
        assert T.fix_mojibake_text(DOUBLE) == ORIG

    def test_cp1252_smart_punctuation_path(self):
        g = "’tis ‘quoted’ — …".encode("utf-8").decode("cp1252")
        assert T.fix_mojibake_text(g) == "’tis ‘quoted’ — …"

    @pytest.mark.parametrize("clean", [
        "plain ascii only",
        "déjà vu — legitimate Latin-1 accents",
        "中文文本 stays untouched",
        "русский текст",
        "",
    ])
    def test_clean_text_unchanged(self, clean):
        assert T.fix_mojibake_text(clean) == clean

    def test_none_passthrough(self):
        assert T.fix_mojibake_text(None) is None

    def test_bounded_passes(self):
        # triple-encoded: 3 passes recover; the default cap is 3
        g = ORIG
        for _ in range(3):
            g = g.encode("utf-8").decode("latin-1")
        assert T.fix_mojibake_text(g) == ORIG


class TestProperty:
    def test_garble_then_fix_roundtrips(self):
        """For any string that does not ITSELF look like mojibake,
        garble → fix is the identity. (Strings that genuinely contain
        the damage digraphs are the heuristic's documented blind spot
        — same as ftfy's — and are excluded, matching the
        signature-gated production composition.)"""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=200, deadline=None)
        @given(st.text(
            alphabet=st.characters(min_codepoint=0x20,
                                   max_codepoint=0x2FFF),
            min_size=1, max_size=60))
        def prop(s):
            if T._MOJIBAKE_SIG.search(s):
                return
            garbled = s.encode("utf-8").decode("latin-1")
            assert T.fix_mojibake_text(garbled) == s

        prop()


class TestSignature:
    def test_signature_flags_damage_not_clean(self, spark):
        df = spark.createDataFrame(
            [(1, GARBLED), (2, "plain ascii"), (3, "déjà vu"),
             (4, DOUBLE), (5, None)],
            "doc_id long, text string")
        got = {r["doc_id"]: r["flag"] for r in df.select(
            "doc_id",
            T.mojibake_signature(F.col("text")).alias("flag")).collect()}
        assert got[1] is True and got[4] is True
        assert got[2] is False and got[3] is False
        assert got[5] is None


class TestSparkSurface:
    def test_in_place_repair(self, spark):
        df = spark.createDataFrame(
            [(1, GARBLED), (2, "clean"), (3, None)],
            "doc_id long, text string")
        out = {r["doc_id"]: r["text"]
               for r in T.fix_mojibake(df).collect()}
        assert out == {1: ORIG, 2: "clean", 3: None}

    def test_out_col_keeps_original(self, spark):
        df = spark.createDataFrame(
            [(1, GARBLED)], "doc_id long, text string")
        r = T.fix_mojibake(df, out_col="fixed").collect()[0]
        assert r["text"] == GARBLED and r["fixed"] == ORIG

    def test_plan_is_narrow(self, spark):
        df = spark.createDataFrame(
            [(1, GARBLED)], "doc_id long, text string")
        plan = T.fix_mojibake(df)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan
