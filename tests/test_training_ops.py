"""Tests for the training-data operators (dedup / similarity / text / multimodal)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aggo_spark.operators import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    data = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "The quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "The quick brown fox jumped over the lazy dog"),  # near dup
        (4, "Der schnelle braune Fuchs springt über den faulen Hund und die Katze"),
        (5, "completely different content about databases and distributed systems"),
    ]
    return spark.createDataFrame(data, "doc_id long, text string")


@pytest.fixture(scope="module")
def vecs(spark):
    data = [
        (1, [1.0, 0.0, 0.0, 0.5]),
        (2, [0.9, 0.1, 0.0, 0.4]),  # close to 1
        (3, [-1.0, 0.2, 0.0, -0.5]),
        (4, [0.0, 1.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(data, "vec_id long, embedding array<float>")


def test_exact_dedup(docs):
    out = dedup.exact_dedup(docs).orderBy("doc_id").collect()
    ids = [r["doc_id"] for r in out]
    assert 1 in ids and 2 not in ids  # doc 2 deduped into doc 1
    by_id = {r["doc_id"]: r["n_copies"] for r in out}
    assert by_id[1] == 2


def test_ngram_jaccard(docs):
    out = dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    assert (1, 5) not in pairs


def test_minhash_lsh(docs):
    out = dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in out}
    assert pairs.get((1, 2)) == 1.0  # identical docs agree on every permutation
    assert (1, 3) in pairs  # near-dup lands in shared band
    assert (4, 5) not in pairs


def test_simhash(docs):
    out = docs.select("doc_id", dedup.simhash(F.col("text")).alias("sh")).collect()
    by_id = {r["doc_id"]: r["sh"] for r in out}
    assert by_id[1] == by_id[2]  # identical text → identical simhash
    ham13 = bin(by_id[1] ^ by_id[3]).count("1")
    ham15 = bin(by_id[1] ^ by_id[5]).count("1")
    assert ham13 < ham15  # near-dup closer than unrelated


def test_connected_components_chain(spark):
    # a long path graph needs multiple propagation rounds to converge
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)] + [(20, 21)], "id_a long, id_b long"
    )
    got = {r["id"]: r["component"]
           for r in dedup.connected_components(pairs).collect()}
    assert all(got[i] == 1 for i in range(1, 13))
    assert got[20] == 20 and got[21] == 20


def test_connected_components_empty_and_self(spark):
    pairs = spark.createDataFrame([(3, 3)], "id_a long, id_b long")
    assert dedup.connected_components(pairs).count() == 0  # self-loops ignored
    empty = pairs.filter("id_a < 0")
    assert dedup.connected_components(empty).count() == 0


def test_dedup_clusters_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 6)], "doc_id long")
    pairs = spark.createDataFrame([(2, 4)], "id_a long, id_b long")
    got = {r["doc_id"]: (r["component"], r["is_representative"])
           for r in dedup.dedup_clusters(docs, pairs).collect()}
    assert got == {1: (1, True), 2: (2, True), 3: (3, True),
                   4: (2, False), 5: (5, True)}


def test_dedup_clusters_string_ids(spark):
    """String doc-hash ids (the advertised use case after the r4
    connected_components fix) must not be NULLed by a long cast in the
    corpus-wide wrapper: singletons keep their own id as component and
    is_representative is never NULL (review r5)."""
    docs = spark.createDataFrame(
        [("h-a",), ("h-b",), ("h-c",), ("h-d",)], "doc_id string")
    pairs = spark.createDataFrame([("h-c", "h-b")], "id_a string, id_b string")
    got = {r["doc_id"]: (r["component"], r["is_representative"])
           for r in dedup.dedup_clusters(docs, pairs).collect()}
    assert got == {"h-a": ("h-a", True), "h-b": ("h-b", True),
                   "h-c": ("h-b", False), "h-d": ("h-d", True)}


def test_simhash_pairs(docs):
    out = dedup.simhash_pairs(docs, max_hamming=3).collect()
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in out}
    assert pairs.get((1, 2)) == 0


def test_brute_force_topk(vecs):
    out = similarity.brute_force_topk(vecs, vecs.filter(F.col("vec_id") == 1), k=2)
    rows = out.orderBy("rank").collect()
    assert rows[0]["neighbor_id"] == 2 and rows[0]["rank"] == 1
    assert rows[0]["score"] > 0.95
    assert len(rows) == 2


def test_bucketed_topk_recall(vecs):
    exact = similarity.brute_force_topk(vecs, vecs, k=1)
    approx = similarity.bucketed_topk(vecs, vecs, k=1, bits=4)
    # bucketed search must be a subset with identical scores where present
    e = {(r["query_id"], r["neighbor_id"]): r["score"] for r in exact.collect()}
    a = {(r["query_id"], r["neighbor_id"]): r["score"] for r in approx.collect()}
    for k_, v in a.items():
        if k_ in e:
            assert abs(e[k_] - v) < 1e-9
    assert a  # finds at least something (1 and 2 share a bucket)


def test_language_id(docs):
    out = docs.select("doc_id", text.language_id(F.col("text")).alias("lang")).collect()
    by_id = {r["doc_id"]: r["lang"] for r in out}
    assert by_id[1] == "en" and by_id[4] == "de"


def test_language_id_table_keeps_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog"), (2, ""), (3, None), (4, "   !!! ")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["pred_lang"] for r in text.language_id_table(df, "text").collect()}
    # every input id appears exactly once; token-free docs label "und"
    assert out == {1: "en", 2: "und", 3: "und", 4: "und"}
    # join-based form agrees
    full = text.add_language_id(df, "text").select("doc_id", "pred_lang").collect()
    assert {r["doc_id"]: r["pred_lang"] for r in full} == out


def test_quality_and_tokens(docs):
    q = text.quality_score(F.col("text"))
    out = docs.select("doc_id", *[v.alias(k) for k, v in q.items()]).collect()
    by_id = {r["doc_id"]: r.asDict() for r in out}
    assert by_id[1]["n_tokens"] == 9
    assert 0 <= by_id[1]["quality"] <= 1
    s = text.token_stats(F.col("text"))
    out2 = docs.select("doc_id", *[v.alias(k) for k, v in s.items()]).collect()
    r1 = {r["doc_id"]: r.asDict() for r in out2}[1]
    assert r1["n_ws_tokens"] == 9 and r1["n_bpe_tokens"] == 9


def test_fingerprint(docs):
    out = docs.select("doc_id", text.fingerprint(F.col("text")).alias("fp")).collect()
    by_id = {r["doc_id"]: r["fp"] for r in out}
    assert by_id[1] == by_id[2] and by_id[1] != by_id[3]
    assert len(by_id[1]) == 32  # md5 hex


def test_multimodal_decode(docs):
    binary = multimodal.attach_binary(docs, "text")
    out = multimodal.decode_image_metadata(binary).collect()
    by_id = {r["doc_id"]: r["img_meta"] for r in out}
    assert by_id[1]["byte_len"] == len("The quick brown fox jumps over the lazy dog")
    assert by_id[1]["phash"] == by_id[2]["phash"]  # deterministic fake
    assert by_id[1]["format"] in ("jpeg", "png", "webp")


def test_frame_sample_plan(docs):
    binary = multimodal.attach_binary(docs, "text")
    out = multimodal.frame_sample_plan(binary, n_frames=4).collect()
    assert len(out) == 4 * docs.count()
    r = [x for x in out if x["doc_id"] == 1 and x["frame_idx"] == 2][0]
    assert r["byte_offset"] == r["total_bytes"] * 2 // 4


# marked slow (r14): excluded from the default driver gate, run with -m slow
@pytest.mark.slow
class TestIVFAndNearDup:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        from aggo_spark import load_tables

        return load_tables(spark, "/root/testdata/sf0.001", ["embeddings"])["embeddings"]

    def test_ivf_recall_against_brute_force(self, spark, emb):
        q = emb.filter(F.col("vec_id") < 3)
        bf = {(r.query_id, r.neighbor_id)
              for r in similarity.brute_force_topk(emb, q, k=5).collect()}
        ivf = {(r.query_id, r.neighbor_id)
               for r in similarity.ivf_topk(emb, q, k=5, n_centroids=8, nprobe=4).collect()}
        assert len(bf) == 15
        # probing half the cells should recover most true neighbors
        assert len(bf & ivf) / len(bf) >= 0.5

    def test_near_dup_pairs_match_threshold(self, spark, emb):
        out = similarity.embedding_near_dup_pairs(
            emb, threshold=0.4, bits=8).collect()
        assert all(r.score >= 0.4 and r.id_a < r.id_b for r in out)

    @pytest.fixture(scope="class")
    def bf10(self, emb):
        """Exact top-10 over ALL 500 queries — the recall denominator."""
        return {(r.query_id, r.neighbor_id)
                for r in similarity.brute_force_topk(emb, emb, k=10).collect()}

    @staticmethod
    def _recall(approx_df, bf_pairs):
        a = {(r.query_id, r.neighbor_id) for r in approx_df.collect()}
        return len(a & bf_pairs) / len(bf_pairs)

    def test_bucketed_recall_pinned(self, emb, bf10):
        """Pinned at the measured levels from the docstring table in
        similarity.py (sf0.001 is fixed data + a deterministic plan, so
        these are exact reproductions, not flaky statistics). The tuned
        (6, 8, 1) configuration clears the >=0.7 target; the cheap
        (8, 8, 1) point documents the 25%-scan trade-off."""
        r_tuned = self._recall(
            similarity.bucketed_topk(emb, emb, k=10, bits=6, tables=8,
                                     probe_hamming=1), bf10)
        assert r_tuned >= 0.85, f"tuned recall {r_tuned:.3f} (measured 0.886)"
        r_cheap = self._recall(
            similarity.bucketed_topk(emb, emb, k=10, bits=8, tables=8,
                                     probe_hamming=1), bf10)
        assert r_cheap >= 0.55, f"cheap recall {r_cheap:.3f} (measured 0.592)"

    def test_bucketed_single_table_unchanged(self, emb, bf10):
        """Default params must keep the historical single-table behavior
        (the oracle-verified q34 contract depends on it)."""
        r = self._recall(similarity.bucketed_topk(emb, emb, k=10, bits=4), bf10)
        assert 0.10 <= r <= 0.16, f"recall {r:.3f} (measured 0.129)"

    def test_ivf_recall_pinned(self, emb, bf10):
        """nprobe sweep pinned at the measured levels from the docstring
        table in similarity.py; nprobe=4 clears the >=0.9 target."""
        floors = {1: 0.35, 2: 0.55, 4: 0.90}
        for nprobe, floor in floors.items():
            r = self._recall(
                similarity.ivf_topk(emb, emb, k=10, n_centroids=8,
                                    nprobe=nprobe), bf10)
            assert r >= floor, f"nprobe={nprobe} recall {r:.3f} < {floor}"

    def test_bucketed_multiprobe_scores_deduped(self, emb):
        """A pair colliding in several tables must appear once, with the
        same score the exact search gives it."""
        out = similarity.bucketed_topk(
            emb, emb.filter(F.col("vec_id") < 5), k=10, bits=4, tables=8,
            probe_hamming=1)
        rows = out.collect()
        pairs = [(r.query_id, r.neighbor_id) for r in rows]
        assert len(pairs) == len(set(pairs))
        exact = {(r.query_id, r.neighbor_id): r.score
                 for r in similarity.brute_force_topk(
                     emb, emb.filter(F.col("vec_id") < 5), k=500).collect()}
        for r in rows:
            assert abs(exact[(r.query_id, r.neighbor_id)] - r.score) < 1e-9

    def test_bucketed_rejects_bad_params(self, emb):
        # probe_hamming 2 is supported since r6 (two-stage explode); 3 is
        # still out of range
        with pytest.raises(ValueError):
            similarity.bucketed_topk(emb, emb, probe_hamming=3)
        with pytest.raises(ValueError):
            similarity.bucketed_topk(emb, emb, tables=0)

    def test_bucketed_rejects_tables_bits_past_dim(self, emb):
        # 64-d embeddings: 16 tables x 8 bits = 128 > 64 would silently
        # degenerate the out-of-range tables to one giant bucket
        with pytest.raises(ValueError, match="exceeds embedding dim"):
            similarity.bucketed_topk(emb, emb, bits=8, tables=16)
        # exactly at the boundary is fine
        similarity.bucketed_topk(emb, emb, bits=8, tables=8)


def test_multimodal_decoder_injection(docs):
    """The decoder is a plug-in point: a custom bytes->dict rides the same
    mapInPandas plumbing (schema, Arrow batches) as the built-ins."""

    def tiny(b: bytes):
        return {"byte_len": len(b), "format": "tiny", "width": 1,
                "height": 2, "phash": "00"}

    binary = multimodal.attach_binary(docs, "text")
    out = multimodal.decode_image_metadata(binary, decoder=tiny).collect()
    assert all(r["img_meta"]["format"] == "tiny" for r in out)
    assert all(r["img_meta"]["byte_len"] == len(r["text"].encode()) for r in out)


def test_pil_decode_branch(monkeypatch):
    """Drive the real-codec branch with a stub PIL module (PIL itself is not
    in this container): metadata + 8x8 average-hash must come from the
    decoded image, and undecodable blobs must yield None."""
    import sys
    import types

    class _FakeImg:
        size = (640, 480)
        format = "PNG"

        def convert(self, mode):
            return self

        def resize(self, wh):
            return self

        def getbands(self):
            return ("L",)

        def split(self):
            return [self]

        def getdata(self):
            # half dark / half bright -> avg hash = 32 zeros then 32 ones
            return [0] * 32 + [255] * 32

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def _open(fh):
        if fh.read(3) != b"IMG":
            raise OSError("not an image")
        return _FakeImg()

    pil = types.ModuleType("PIL")
    pil_image = types.ModuleType("PIL.Image")
    pil_image.open = _open
    pil.Image = pil_image
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", pil_image)

    meta = multimodal.pil_decode(b"IMG" + b"x" * 61)
    assert meta == {
        "byte_len": 64,
        "format": "png",
        "width": 640,
        "height": 480,
        "channels": 1,
        "channel_means": [127.5],
        "phash": f"{(1 << 32) - 1:016x}",
    }
    assert multimodal.pil_decode(b"NOPE") is None


def test_normalize_and_quantize(spark, vecs):
    from pyspark.sql import functions as F

    n = vecs.select("vec_id", similarity.normalize(F.col("embedding")).alias("nv"))
    for r in n.collect():
        mag = sum(x * x for x in r["nv"]) ** 0.5
        assert abs(mag - 1.0) < 1e-9
    z = spark.createDataFrame([(9, [0.0, 0.0])], "vec_id long, embedding array<float>")
    assert similarity.normalize(F.col("embedding")) is not None
    assert z.select(similarity.normalize(F.col("embedding")).alias("nv")).collect()[0]["nv"] == [0.0, 0.0]

    q = vecs.select("vec_id", "embedding",
                    similarity.quantize8(F.col("embedding")).alias("qv"))
    rows_q = q.collect()
    for r in rows_q:
        # reconstruction error bounded by scale/254 per element
        s = r["qv"]["s"]
        for orig, qi in zip(r["embedding"], r["qv"]["q"]):
            assert abs(orig - qi * s / 127.0) <= s / 127.0 + 1e-6
    # cosine is scale-invariant: quantized cosine ≈ exact cosine
    a = q.selectExpr("vec_id as ida", "qv.q as qa", "qv.s as sa", "embedding as ea")
    b = q.selectExpr("vec_id as idb", "qv.q as qb", "qv.s as sb", "embedding as eb")
    both = a.crossJoin(b).filter(F.col("ida") < F.col("idb")).select(
        "ida", "idb",
        similarity.cosine(F.col("qa"), F.col("qb")).alias("cq"),
        similarity.cosine(F.col("ea"), F.col("eb")).alias("ce"),
        similarity.dot_q8(F.col("qa"), F.col("sa"), F.col("qb"), F.col("sb")).alias("dq"),
        similarity._dot(F.col("ea"), F.col("eb")).alias("de"),
    )
    for r in both.collect():
        assert abs(r["cq"] - r["ce"]) < 0.02
        assert abs(r["dq"] - r["de"]) < 0.05


def test_repetition_stats(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat.\nthe cat sat.\nThe dog ran!"),
         (2, "a b a b a b c"),
         (3, "x")],  # fewer tokens than n: empty gram array, frac 0
        "doc_id long, text string")
    cols = text.repetition_stats(F.col("text"))
    out = {r["doc_id"]: r.asDict() for r in df.select(
        "doc_id", *[v.alias(k) for k, v in cols.items()]).collect()}
    # doc1: 9 words, 5 distinct; 3 lines, 2 distinct
    assert abs(out[1]["word_rep_frac"] - (1 - 5 / 9)) < 1e-6
    assert abs(out[1]["line_rep_frac"] - (1 - 2 / 3)) < 1e-6
    # doc2 2-grams: 'a b'×3 (cover 9), 'b a'×2, 'b c'×1; 13 normalized chars
    assert abs(out[2]["top2gram_char_frac"] - 9 / 13) < 1e-5
    assert out[3]["top2gram_char_frac"] == 0.0
    assert out[3]["word_rep_frac"] == 0.0


def test_c4_quality_flags(spark):
    df = spark.createDataFrame(
        [(1, 'Good line.\nAlso fine!\nno punct end'),
         (2, "code { lorem ipsum }")],
        "doc_id long, text string")
    cols = text.c4_quality_flags(F.col("text"))
    out = {r["doc_id"]: r.asDict() for r in df.select(
        "doc_id", *[v.alias(k) for k, v in cols.items()]).collect()}
    assert abs(out[1]["terminal_punct_line_frac"] - 2 / 3) < 1e-6
    assert out[1]["n_sentences"] == 2
    assert not out[1]["has_curly_brace"]
    assert out[2]["has_curly_brace"] and out[2]["has_lorem_ipsum"]


def test_pii_redaction(spark):
    df = spark.createDataFrame(
        [(1, "mail bob@example.com ip 10.0.0.1 tel +1 555 123 4567 end")],
        "doc_id long, text string")
    counts = text.pii_counts(F.col("text"))
    out = df.select(
        *[v.alias(k) for k, v in counts.items()],
        text.redact_pii(F.col("text")).alias("red")).first()
    assert (out["n_email"], out["n_ipv4"], out["n_phone"]) == (1, 1, 1)
    assert out["red"] == "mail [EMAIL] ip [IPV4] tel [PHONE] end"


def test_word_ngrams_short_doc(spark):
    df = spark.createDataFrame([(1, "one two")], "doc_id long, text string")
    out = df.select(
        text.word_ngrams(text.tokens(F.col("text")), 3).alias("g3"),
        text.word_ngrams(text.tokens(F.col("text")), 2).alias("g2")).first()
    assert out["g3"] == [] and out["g2"] == ["one two"]


def test_benchmark_ngram_overlap(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"),   # contains the bench 3-gram
         (2, "beta gamma delta zeta eta"),        # shares 'beta gamma delta'
         (3, "one two three four five")],         # clean
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(99, "xxx beta gamma delta yyy")], "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in
           dedup.benchmark_ngram_overlap(corpus, bench, n=3).collect()}
    assert out[1]["contaminated"] and out[2]["contaminated"]
    assert not out[3]["contaminated"] and out[3]["n_overlap_grams"] == 0
    assert out[1]["n_overlap_grams"] == 1  # only 'beta gamma delta'


def test_sampling_ops(spark):
    from aggo_spark.operators import sampling
    df = spark.createDataFrame(
        [(i, "s%d" % (i % 2), 10) for i in range(20)],
        "doc_id long, source string, n_tok long")
    strat = sampling.stratified_sample(
        df, ["source"], 3,
        order_col=sampling.hash_order(F.col("doc_id").cast("string")))
    assert strat.count() == 6
    assert strat.groupBy("source").count().filter("count != 3").count() == 0
    # deterministic: same rows on rerun
    ids1 = sorted(r["doc_id"] for r in strat.collect())
    ids2 = sorted(r["doc_id"] for r in strat.collect())
    assert ids1 == ids2

    bud = sampling.token_budget_sample(
        df, ["source"], 35, "n_tok",
        order_col=sampling.hash_order(F.col("doc_id").cast("string")))
    kept = bud.filter("kept").groupBy("source").agg(
        F.sum("n_tok").alias("t"), F.count("*").alias("n")).collect()
    for r in kept:  # 3 docs of 10 tokens fit a 35-token budget, never 4
        assert r["t"] == 30 and r["n"] == 3


def test_write_training_shards_roundtrip(docs, tmp_path):
    from aggo_spark.operators import sampling

    path = str(tmp_path / "shards")
    sampling.write_training_shards(docs, path, n_shards=8)
    back = docs.sparkSession.read.parquet(path)
    # every row survives, and the on-disk shard partition matches shard_assign
    assert back.count() == docs.count()
    expected = docs.withColumn("expected_shard", sampling.shard_assign("text", 8))
    joined = back.join(expected.select("doc_id", "expected_shard"), "doc_id")
    assert joined.filter(
        F.col("shard").cast("int") != F.col("expected_shard")
    ).count() == 0
    # overwrite mode: a rerun replaces, not appends
    sampling.write_training_shards(docs, path, n_shards=8)
    assert docs.sparkSession.read.parquet(path).count() == docs.count()


def test_chunk_tokens_validation(docs):
    with pytest.raises(ValueError, match="stride"):
        text.chunk_tokens(docs, size=8, stride=0)
    with pytest.raises(ValueError, match="stride"):
        text.chunk_tokens(docs, size=8, stride=9)
    with pytest.raises(ValueError, match="size"):
        text.chunk_tokens(docs, size=0, stride=1)


def test_bm25_empty_corpus(spark):
    from aggo_spark.operators import search

    empty = spark.createDataFrame([], "doc_id long, text string")
    out = search.bm25_search(empty, "spark query join", limit=5)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["doc_id", "score", "n_hit_terms"]


def test_pack_chunks(docs):
    chunks = text.chunk_tokens(docs, size=4, stride=4).withColumn(
        "shard", F.lit(0))
    out = text.pack_chunks(chunks, example_size=8).orderBy(
        "doc_id", "chunk_id").collect()
    # cumulative sums are inclusive and example_id = floor((cum - n) / 8)
    cum = 0
    for r in out:
        assert r["pack_cum_tokens"] == cum + r["n_chunk_tokens"]
        assert r["example_id"] == (r["pack_cum_tokens"] - r["n_chunk_tokens"]) // 8
        cum = r["pack_cum_tokens"]
    with pytest.raises(ValueError):
        text.pack_chunks(chunks, example_size=0)


def test_mixture_token_budgets_and_sample(spark):
    from aggo_spark.operators import sampling

    rows = [(i, "web" if i < 8 else "code", 100) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id int, source string, n_chars int")
    # web has 800 tokens, code 400; ask for 600 at weights 2:1
    budgets = sampling.mixture_token_budgets(
        df, {"web": 2.0, "code": 1.0}, total_tokens=600)
    assert budgets == {"web": 400, "code": 200}
    # clamped by availability: code share of 6000 would be 2000 > its 400
    budgets2 = sampling.mixture_token_budgets(
        df, {"web": 2.0, "code": 1.0}, total_tokens=6000)
    assert budgets2 == {"web": 800, "code": 400}

    out = sampling.mixture_sample(df, {"web": 2.0, "code": 1.0}, 600)
    got = out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"), F.max("cum_tokens").alias("t")).collect()
    by = {r.source: (r.n, r.t) for r in got}
    assert by == {"web": (4, 400), "code": (2, 200)}
    # deterministic: identical reruns pick identical rows
    ids1 = sorted(r.doc_id for r in out.collect())
    ids2 = sorted(r.doc_id for r in sampling.mixture_sample(
        df, {"web": 2.0, "code": 1.0}, 600).collect())
    assert ids1 == ids2
    # unknown sources are dropped entirely
    assert sampling.mixture_sample(df, {"web": 1.0}, 600).filter(
        F.col("source") == "code").count() == 0

    with pytest.raises(ValueError):
        sampling.mixture_token_budgets(df, {"web": 1.0}, 0)
    with pytest.raises(ValueError):
        sampling.mixture_token_budgets(df, {"web": -1.0, "code": 1.0}, 100)


def test_upsample_sources(spark):
    from aggo_spark.operators import sampling

    rows = [(i, "code" if i % 2 else "web", f"text {i}") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id int, source string, text string")
    out = sampling.upsample_sources(df, {"code": 2.0})
    # integral factor: every code row exactly twice (epoch 0 and 1), web once
    code = out.filter(F.col("source") == "code")
    assert code.count() == 20
    assert sorted(r.epoch for r in code.filter(F.col("doc_id") == 1).collect()) == [0, 1]
    assert out.filter(F.col("source") == "web").count() == 10
    # fractional factor: 1.5 keeps all rows at least once, upsamples ~half,
    # and the choice is content-deterministic (two runs agree row-for-row)
    o1 = sampling.upsample_sources(df, {"code": 1.5})
    o2 = sampling.upsample_sources(df, {"code": 1.5})
    n1 = o1.filter(F.col("source") == "code").count()
    assert 10 <= n1 <= 20
    assert sorted(map(tuple, o1.collect())) == sorted(map(tuple, o2.collect()))
    # factor 0 drops the source
    assert sampling.upsample_sources(df, {"web": 0.0}).filter(
        F.col("source") == "web").count() == 0
    with pytest.raises(ValueError):
        sampling.upsample_sources(df, {"web": -1.0})


def test_semantic_dedup(spark):
    """SemDeDup: two near-identical vectors in one cluster collapse to one
    representative (the one farther from the centroid); distinct vectors
    and other clusters survive as singletons."""
    from aggo_spark.operators import similarity

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0, 0.0]),      # same half-space, not a dup
        (4, [-1.0, 0.0, 0.0, 0.0]),
        (5, [-0.999, -0.01, 0.0, 0.0]), # near-dup of 4
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    cents = [[1.0, 0.5, 0.0, 0.0], [-1.0, -0.5, 0.0, 0.0]]
    out = similarity.semantic_dedup(
        df, threshold=0.98, centroids=cents, n_centroids=2)
    rowsd = {r.vec_id: r for r in out.collect()}
    assert len(rowsd) == 5
    # 1 and 2 share a component; exactly one representative
    assert rowsd[1].component == rowsd[2].component
    reps_12 = [i for i in (1, 2) if rowsd[i].is_representative]
    assert len(reps_12) == 1
    # the kept member is the one with LOWER cosine to the centroid
    kept = reps_12[0]
    other = 3 - kept
    assert rowsd[kept].centroid_sim <= rowsd[other].centroid_sim
    # 3 is a singleton representative in the same cell as 1/2
    assert rowsd[3].is_representative and rowsd[3].component == 3
    assert rowsd[3].cell == rowsd[1].cell
    # the negative half-space pair collapses in the other cell
    assert rowsd[4].component == rowsd[5].component != rowsd[1].component
    assert sum(1 for i in (4, 5) if rowsd[i].is_representative) == 1
    # keep-one-per-group result size: 3 representatives
    assert out.filter("is_representative").count() == 3


def test_semantic_dedup_kmeans_runs(spark):
    """KMeans-trained centroids path: sane output shape on real embeddings."""
    from aggo_spark.operators import similarity
    from aggo_spark import load_tables

    emb = load_tables(spark, "/root/testdata/sf0.001",
                      names=["embeddings"])["embeddings"]
    out = similarity.semantic_dedup(emb, threshold=0.99, n_centroids=4,
                                    max_train_rows=200)
    n = emb.count()
    assert out.count() == n
    reps = out.filter("is_representative").count()
    assert 0 < reps <= n
    # every component has exactly one representative
    bad = (out.groupBy("component")
           .agg(F.sum(F.col("is_representative").cast("int")).alias("k"))
           .filter("k != 1").count())
    assert bad == 0


def test_vector_search_stage_exact(spark):
    from aggo_spark import Engine

    rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    rows.append((9, [0.9, 0.1, 0.0, 0.0]))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    out = Engine().aggregate(df, [
        {"$vectorSearch": {"queryVector": [1.0, 0.0, 0.0, 0.0],
                           "path": "$embedding", "limit": 2}},
        {"$project": {"_id": 0, "vec_id": 1, "score": 1}},
    ]).collect()
    assert [r.vec_id for r in out] == [0, 9]     # exact match, then near
    assert out[0].score == 1.0 and out[1].score > 0.99


def test_vector_search_stage_filter_and_ivf(spark):
    from aggo_spark import Engine

    rows = [(i, "a" if i % 2 == 0 else "b",
             [float(i), 1.0, 0.0, 0.0]) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id int, grp string, embedding array<double>")
    # pre-filter: only grp='a' rows are searchable
    out = Engine().aggregate(df, [
        {"$vectorSearch": {"queryVector": [0.0, 1.0, 0.0, 0.0],
                           "path": "$embedding", "limit": 3,
                           "filter": {"grp": "a"}}},
    ]).collect()
    assert all(r.grp == "a" for r in out)
    assert out[0].vec_id == 0  # [0,1,0,0] is the exact direction match
    # ivf mode with deterministic centroids returns the same top hit
    out2 = Engine().aggregate(df, [
        {"$vectorSearch": {"queryVector": [0.0, 1.0, 0.0, 0.0],
                           "path": "$embedding", "limit": 3, "index": "ivf",
                           "numCandidates": 20, "nCentroids": 2,
                           "centroids": [[0.0, 1.0, 0.0, 0.0],
                                         [10.0, 1.0, 0.0, 0.0]]}},
    ]).collect()
    assert out2[0].vec_id == 0


def test_vector_search_stage_validation(spark):
    from aggo_spark import Engine
    from aggo_spark.errors import InvalidPipeline

    df = spark.createDataFrame([(1, [1.0])], "vec_id int, embedding array<double>")
    for bad in ({"path": "$embedding"}, {"queryVector": []},
                {"queryVector": [1.0]},
                {"queryVector": [1.0], "path": "$embedding", "index": "hnsw"}):
        with pytest.raises(InvalidPipeline):
            Engine().aggregate(df, [{"$vectorSearch": bad}]).collect()


def test_rank_fusion(spark):
    from aggo_spark.operators import similarity

    bm25 = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id int, rank int")
    vect = spark.createDataFrame(
        [(3, 1), (1, 2), (4, 3)], "doc_id int, rank int")
    out = similarity.rank_fusion([bm25, vect], k=60).collect()
    by = {r.doc_id: r for r in out}
    # doc 1: 1/61 + 1/62; doc 3: 1/63 + 1/61; doc 1 wins
    assert by[1].fused_rank == 1 and by[3].fused_rank == 2
    assert by[1].score == pytest.approx(1 / 61 + 1 / 62, abs=1e-6)
    # docs seen in one list only still score
    assert by[2].score == pytest.approx(1 / 62, abs=1e-6)
    assert by[4].score == pytest.approx(1 / 63, abs=1e-6)
    # weights skew the fusion; limit caps output
    wout = similarity.rank_fusion([bm25, vect], weights=[0.0, 1.0], limit=1).collect()
    assert len(wout) == 1 and wout[0].doc_id == 3
    with pytest.raises(ValueError):
        similarity.rank_fusion([])
    with pytest.raises(ValueError):
        similarity.rank_fusion([bm25, vect], weights=[1.0])


def test_semantic_dedup_string_ids(spark):
    """Review r4: string doc ids must dedup too — connected_components used
    to cast ids to long, nulling strings and silently dropping every edge."""
    from aggo_spark.operators import similarity

    rows = [("a", [1.0, 0.0]), ("b", [0.999, 0.01]), ("c", [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
    out = similarity.semantic_dedup(
        df, threshold=0.98, centroids=[[1.0, 0.5]], n_centroids=1)
    by = {r.vec_id: r for r in out.collect()}
    assert by["a"].component == by["b"].component
    assert sum(1 for i in ("a", "b") if by[i].is_representative) == 1
    assert by["c"].is_representative


def test_vector_search_dim_mismatch_raises(spark):
    from aggo_spark import Engine
    from aggo_spark.errors import InvalidPipeline

    df = spark.createDataFrame([(1, [1.0, 0.0, 0.0])],
                               "vec_id int, embedding array<double>")
    with pytest.raises(InvalidPipeline, match="dims"):
        Engine().aggregate(df, [{"$vectorSearch": {
            "queryVector": [1.0, 0.0], "path": "$embedding"}}]).collect()


def test_vector_search_atlas_score_normalization(spark):
    from aggo_spark import Engine

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [-1.0, 0.0])], "vec_id int, embedding array<double>")
    out = Engine().aggregate(df, [{"$vectorSearch": {
        "queryVector": [1.0, 0.0], "path": "$embedding", "limit": 2}}]).collect()
    by = {r.vec_id: r.score for r in out}
    assert by[1] == 1.0      # (1 + 1) / 2
    assert by[2] == 0.0      # (1 - 1) / 2: anti-correlated floors at 0


def test_rank_fusion_limit_zero(spark):
    from aggo_spark.operators import similarity

    bm25 = spark.createDataFrame([(1, 1)], "doc_id int, rank int")
    assert similarity.rank_fusion([bm25], limit=0).count() == 0


def test_rank_fusion_stage(spark):
    """MongoDB 8 $rankFusion: sort-ranked and vector-ranked pipelines fuse
    by RRF(k=60); each doc appears once, ordered by fused score."""
    from aggo_spark import Engine

    rows = [(1, 5.0, [1.0, 0.0]), (2, 9.0, [0.9, 0.1]),
            (3, 7.0, [0.0, 1.0]), (4, 1.0, [0.8, 0.2])]
    df = spark.createDataFrame(rows, "doc_id int, pop double, embedding array<double>")
    out = Engine().aggregate(df, [{"$rankFusion": {
        "input": {"pipelines": {
            "popular": [{"$sort": {"pop": -1}}, {"$limit": 3}],
            "vector": [{"$vectorSearch": {"queryVector": [1.0, 0.0],
                                          "path": "$embedding", "limit": 3}}],
        }},
        "idField": "doc_id",
    }}]).collect()
    ids = [r.doc_id for r in out]
    assert set(ids) == {1, 2, 3, 4}
    by = {r.doc_id: r for r in out}
    # popularity ranks: 2(9.0)=1, 3(7.0)=2, 1(5.0)=3; vector ranks by cosine
    # to [1,0]: 1(cos 1.0)=1, 2(0.994)=2, 4(0.970)=3
    assert by[2].score == pytest.approx(1 / 61 + 1 / 62, abs=1e-6)
    assert by[1].score == pytest.approx(1 / 61 + 1 / 63, abs=1e-6)
    assert by[3].score == pytest.approx(1 / 62, abs=1e-6)
    assert by[4].score == pytest.approx(1 / 63, abs=1e-6)
    assert ids == [2, 1, 3, 4]
    # every doc carries its original columns (first-pipeline version)
    assert by[3].pop == 7.0

    # weights: zeroing the popularity list reorders by pure vector rank
    out2 = Engine().aggregate(df, [{"$rankFusion": {
        "input": {"pipelines": {
            "popular": [{"$sort": {"pop": -1}}, {"$limit": 3}],
            "vector": [{"$vectorSearch": {"queryVector": [1.0, 0.0],
                                          "path": "$embedding", "limit": 3}}],
        }},
        "combination": {"weights": {"popular": 0.0}},
        "idField": "doc_id",
    }}]).collect()
    assert out2[0].doc_id == 1  # exact vector match leads


def test_rank_fusion_stage_validation(spark):
    from aggo_spark import Engine
    from aggo_spark.errors import InvalidPipeline

    df = spark.createDataFrame([(1, 2.0)], "doc_id int, pop double")
    with pytest.raises(InvalidPipeline):  # unranked input pipeline
        Engine().aggregate(df, [{"$rankFusion": {
            "input": {"pipelines": {"a": [{"$match": {"pop": 2.0}}]}},
            "idField": "doc_id"}}]).collect()
    with pytest.raises(InvalidPipeline):  # unknown weight name
        Engine().aggregate(df, [{"$rankFusion": {
            "input": {"pipelines": {"a": [{"$sort": {"pop": 1}}]}},
            "combination": {"weights": {"zz": 1.0}},
            "idField": "doc_id"}}]).collect()
    with pytest.raises(InvalidPipeline):  # missing idField in output
        Engine().aggregate(df, [{"$rankFusion": {
            "input": {"pipelines": {"a": [{"$sort": {"pop": 1}}]}}}}]).collect()


def test_rank_fusion_stage_dedups_within_pipeline(spark):
    """A doc duplicated by $unwind before the trailing sort must contribute
    ONE rank (its best) from that pipeline, not inflate its fused score."""
    from aggo_spark import Engine

    rows = [(1, 9.0, ["x", "y"]), (2, 5.0, ["x"])]
    df = spark.createDataFrame(rows, "doc_id int, pop double, tags array<string>")
    out = Engine().aggregate(df, [{"$rankFusion": {
        "input": {"pipelines": {
            "t": [{"$unwind": "$tags"}, {"$sort": {"pop": -1}}, {"$limit": 10}],
        }},
        "idField": "doc_id",
    }}]).collect()
    by = {r.doc_id: r.score for r in out}
    # doc 1 appears at ranks 1 and 2 → only rank 1 counts
    assert by[1] == pytest.approx(1 / 61, abs=1e-6)
    assert by[2] == pytest.approx(1 / 63, abs=1e-6)


def test_first_last_nan_desc_matches_sort(spark):
    """Mixed-direction picks place NaN where $sort desc does (first)."""
    rows = [(1, 1, float("nan"), "nan-row"), (1, 1, 5.0, "five"),
            (1, 1, None, "null-row")]
    df = spark.createDataFrame(rows, "g int, a int, b double, v string")
    from aggo_spark import Engine

    eng = Engine({"t": df})
    sorted_v = [r["v"] for r in eng.aggregate(
        "t", [{"$sort": {"a": 1, "b": -1}}]).collect()]
    out = eng.aggregate("t", [
        {"$sort": {"a": 1, "b": -1}},
        {"$group": {"_id": "$g", "f": {"$first": "$v"}, "l": {"$last": "$v"}}},
    ]).collect()[0]
    assert out["f"] == sorted_v[0] == "nan-row"
    assert out["l"] == sorted_v[-1] == "null-row"


def test_dedup_corpus_lines_keep_first(spark):
    """C4 §2.2 corpus-level line dedup: the globally-first occurrence of a
    repeated line survives; counts cover examined (content) lines only."""
    boiler = "Accept cookies to continue"
    rows = [
        (1, f"Intro one.\n{boiler}\nBody of doc one."),
        (2, f"{boiler}\nBody of doc two."),
        (3, "Unique throughout."),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: r for r in dedup.dedup_corpus_lines(df).collect()}
    assert len(out) == 4
    assert out[1].text == f"Intro one.\n{boiler}\nBody of doc one."
    assert out[1].n_lines_kept == 3 and out[1].n_lines_dropped == 0
    assert out[2].text == "Body of doc two."
    assert out[2].n_lines_kept == 1 and out[2].n_lines_dropped == 1
    assert out[3].text == "Unique throughout." and out[3].n_lines_dropped == 0
    # NULL-text doc keeps its row with text still NULL (not conflated with
    # empty string — review r5), zero content lines
    assert out[4].text is None and out[4].n_lines_kept == 0


def test_dedup_corpus_lines_drop_all_and_min_chars(spark):
    rows = [
        (1, "dup\nkeep me\n\nx"),
        (2, "dup\nother"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r.doc_id: r for r in dedup.dedup_corpus_lines(
        df, mode="drop_all", min_line_chars=2).collect()}
    # "dup" occurs twice -> every copy dropped; blank line and single "x"
    # are below min_line_chars -> pass through unexamined AND uncounted
    assert out[1].text == "keep me\n\nx"
    assert out[1].n_lines_kept == 1 and out[1].n_lines_dropped == 1
    assert out[2].text == "other"
    with pytest.raises(ValueError):
        dedup.dedup_corpus_lines(df, mode="fancy")
