"""Search diagnostics/config parity (reference text-search.ts:15-51,257-283,
regex-search.ts:297-321, bloom-filter.ts:374-429) and the parquet-native
Bloom filter writer."""

from __future__ import annotations

import pytest

from aggo_spark.operators import search, search_diag


DOCS = [
    {"doc_id": 1, "text": "spark makes distributed queries fast"},
    {"doc_id": 2, "text": "the quick brown fox"},
    {"doc_id": 3, "text": "Spark queries over parquet"},
    {"doc_id": 4, "text": "unrelated document entirely"},
    {"doc_id": 5, "text": "queries about spark streaming"},
]


@pytest.fixture(autouse=True)
def _reset_diag():
    search_diag.reset_text_search_stats()
    search_diag.reset_regex_search_stats()
    search_diag.configure_text_search(enable_stats=False)
    search_diag.configure_regex_search(enable_stats=False)
    yield
    search_diag.configure_text_search(enable_stats=False)
    search_diag.configure_regex_search(enable_stats=False)


def test_extract_tokens_matches_query_tokens():
    assert search_diag.extract_tokens("The QUICK, quick fox!") == ["fox", "quick", "the"]


def test_extract_trigrams_raw_and_ordered():
    assert search_diag.extract_trigrams("Spark") == ["Spa", "par", "ark"]
    assert search_diag.extract_trigrams("ab") == []
    # case-exact (regexes match raw text) and deduped
    assert search_diag.extract_trigrams("aaaa") == ["aaa"]


def test_analyze_regex_pattern_literals_and_suitability():
    info = search_diag.analyze_regex_pattern(r"error: (disk|net) timeout")
    assert "error: " in info["literals"] and " timeout" in info["literals"]
    assert "err" in info["trigrams"]
    assert info["prefilter_pushable"] is True
    assert info["suitable_for_trigram_index"] is True
    # complexity formula: length + metachar count (reference regex-search.ts:310)
    assert info["complexity"] > len(r"error: (disk|net) timeout")


def test_analyze_regex_pattern_case_insensitive_not_indexable():
    info = search_diag.analyze_regex_pattern("spark", options="i")
    # the trigram index is case-exact, so "i" patterns can't use it,
    # but literal extraction itself still succeeds
    assert info["suitable_for_trigram_index"] is False


def test_analyze_regex_pattern_no_literals():
    info = search_diag.analyze_regex_pattern(r"^\d+$")
    assert info["literals"] == []
    assert info["prefilter_pushable"] is False
    assert info["suitable_for_trigram_index"] is False


def test_analyze_regex_pattern_invalid():
    # invalid patterns degrade gracefully to an empty analysis
    info = search_diag.analyze_regex_pattern("(unclosed")
    assert info["suitable_for_trigram_index"] is False
    assert info["prefilter_pushable"] is False
    assert info["literals"] == []


def test_text_search_stats_opt_in(spark):
    df = spark.createDataFrame(DOCS)
    index = search.build_text_index(df)

    # default: disabled — no stats recorded
    search.search_with_index(df, index, "spark queries").count()
    assert search_diag.get_text_search_stats().total_queries == 0

    search_diag.configure_text_search(enable_stats=True)
    n = search.search_with_index(df, index, "spark queries").count()
    stats = search_diag.get_text_search_stats()
    assert n == 3  # docs 1, 3 (tokenizer lowercases "Spark"), 5
    assert stats.total_queries == 1
    assert stats.candidates_before_filter == 5
    assert stats.candidates_after_filter == stats.actual_matches == n
    # posting intersection is exact → FP rate 0 by construction
    assert stats.false_positive_rate == 0.0
    assert stats.average_speedup_ratio == pytest.approx(5 / n)
    assert stats.prefilter_hits == 1
    d = stats.as_dict()
    assert d["total_queries"] == 1 and d["false_positive_rate"] == 0.0


def test_regex_search_stats_fp_rate(spark):
    df = spark.createDataFrame(DOCS)
    index = search.build_trigram_index(df)
    search_diag.configure_regex_search(enable_stats=True)
    # required literal "queries " appears in docs 1, 3, 5; the full regex
    # (one more word, then end-of-string) matches only doc 1
    out = search.regex_search_with_index(df, index, r"queries [a-z]+$").count()
    stats = search_diag.get_regex_search_stats()
    assert out == 1
    assert stats.candidates_after_filter == 3   # trigram candidates
    assert stats.actual_matches == 1
    assert stats.false_positive_rate == pytest.approx(2 / 3)
    assert stats.total_verification_time >= 0.0
    search_diag.reset_regex_search_stats()
    assert search_diag.get_regex_search_stats().total_queries == 0


def test_configure_returns_updated_config():
    cfg = search_diag.configure_text_search(enable_stats=True)
    assert cfg.enable_stats is True
    cfg2 = search_diag.configure_text_search(enable_stats=False)
    assert cfg2.enable_stats is False


def test_write_parquet_bloom_metadata_and_readback(spark, tmp_path):
    from aggo_spark.sources.io import write_parquet_bloom

    df = spark.range(0, 1000).selectExpr(
        "id AS doc_id", "concat('doc-', id) AS name")
    path = str(tmp_path / "bloomed")
    write_parquet_bloom(df.coalesce(1), path, ["doc_id"], expected_ndv=1000)

    # bloom filter actually present in the parquet footer
    import glob

    import pyarrow.parquet as pq

    files = glob.glob(path + "/*.parquet")
    assert files
    meta = pq.ParquetFile(files[0]).metadata
    col_idx = next(i for i in range(meta.num_columns)
                   if meta.schema.column(i).name == "doc_id")
    col_meta = meta.row_group(0).column(col_idx)
    # pyarrow >= 14 exposes the offset; older versions lack the attribute —
    # then the read-back check below still validates the file is sound
    if hasattr(col_meta, "bloom_filter_offset"):
        assert col_meta.bloom_filter_offset is not None

    back = spark.read.parquet(path).filter("doc_id = 437")
    assert [r.name for r in back.collect()] == ["doc-437"]


# ---------------------------------------------------------------------------
# auto-strategy entry points + index lifecycle (reference enhancedRegexMatch
# regex-search.ts:99-200, clear*SearchIndex text-search.ts:302/regex-search.ts:371)
# ---------------------------------------------------------------------------


@pytest.fixture(autouse=True)
def _clear_indexes():
    yield
    search.clear_text_search_index()
    search.clear_regex_search_index()


def test_enhanced_text_search_scan_vs_index_agree(spark):
    df = spark.createDataFrame(DOCS)
    scan = sorted(r.doc_id for r in search.enhanced_text_search(df, "spark queries").collect())
    # first indexed call builds + registers; second reuses the cache
    idx1 = sorted(r.doc_id for r in
                  search.enhanced_text_search(df, "spark queries", build_index=True).collect())
    idx2 = sorted(r.doc_id for r in search.enhanced_text_search(df, "spark queries").collect())
    assert scan == idx1 == idx2 == [1, 3, 5]
    assert len(search._text_indexes) == 1


def test_enhanced_regex_match_strategy_ladder(spark):
    df = spark.createDataFrame(DOCS)
    # no index registered, suitable pattern → scan path (no registry entry)
    out = search.enhanced_regex_match(df, "text", r"queries [a-z]+$")
    assert sorted(r.doc_id for r in out.collect()) == [1]
    assert len(search._regex_indexes) == 0
    # build_index=True registers and routes through the posting table
    out2 = search.enhanced_regex_match(df, "text", r"queries [a-z]+$", build_index=True)
    assert sorted(r.doc_id for r in out2.collect()) == [1]
    assert len(search._regex_indexes) == 1
    # case-insensitive pattern is not index-suitable → scan path even though
    # an index exists (the trigram table is case-exact)
    out3 = search.enhanced_regex_match(df, "text", r"SPARK", options="i")
    assert sorted(r.doc_id for r in out3.collect()) == [1, 3, 5]


def test_enhanced_regex_match_no_literals_falls_back(spark):
    df = spark.createDataFrame(DOCS)
    out = search.enhanced_regex_match(df, "text", r"^[a-z ]+$", build_index=True)
    # pure character-class pattern: no trigrams, nothing registered
    assert len(search._regex_indexes) == 0
    assert sorted(r.doc_id for r in out.collect()) == [1, 2, 4, 5]


def test_clear_search_indexes_release_cache(spark):
    df = spark.createDataFrame(DOCS)
    search.enhanced_text_search(df, "spark", build_index=True).count()
    search.enhanced_regex_match(df, "text", "queries", build_index=True).count()
    assert search._text_indexes and search._regex_indexes
    search.clear_text_search_index()
    search.clear_regex_search_index()
    assert not search._text_indexes and not search._regex_indexes
    # post-clear queries still work (scan strategy)
    assert search.enhanced_text_search(df, "spark").count() == 3


def test_enhanced_text_search_multi_string_column_consistency(spark):
    """Review r4: the scan path must cover ONLY text_col (like the index
    path), not every string column — otherwise results change when an
    index gets registered."""
    rows = [(1, "spark rocks", "en"), (2, "plain words", "en"), (3, "more text", "de")]
    df = spark.createDataFrame(rows, "doc_id int, text string, lang string")
    scan = sorted(r.doc_id for r in search.enhanced_text_search(df, "en").collect())
    idx = sorted(r.doc_id for r in
                 search.enhanced_text_search(df, "en", build_index=True).collect())
    assert scan == idx == []  # "en" appears in lang, never in text


def test_enhanced_text_search_no_id_col_falls_back(spark):
    df = spark.createDataFrame([("spark streaming",), ("other",)], "text string")
    out = search.enhanced_text_search(df, "spark", build_index=True)
    assert out.count() == 1  # scan path; no doc_id needed, no exception
    assert len(search._text_indexes) == 0
