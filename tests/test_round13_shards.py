"""Round 13: packed binary token shards (sources/shards.py) — the
GPT-2/Megatron-style .bin+index training-data sink, plus the
vocab-id mapping that feeds it."""

from __future__ import annotations

import glob
import json
import os
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from aggo_spark.sources import shards as sh


def _corpus(spark, n=120, seed=3, hi=300):
    rng = random.Random(seed)
    rows = [(i, [rng.randrange(1, hi)
                 for _ in range(rng.randrange(0, 40))])
            for i in range(1, n + 1)]
    return spark.createDataFrame(rows, "doc_id long, token_ids array<int>"), \
        dict(rows)


class TestWriteRead:
    def test_roundtrip_with_eos(self, spark, tmp_path):
        df, orig = _corpus(spark)
        d = str(tmp_path / "sh")
        idx = sh.write_token_shards(df, d, shard_tokens=400, eos_id=0)
        assert idx.count() == len(orig)
        got = {r["doc_id"]: r["token_ids"]
               for r in sh.read_token_shards(spark, d).collect()}
        assert got == orig

    def test_roundtrip_without_eos(self, spark, tmp_path):
        df, orig = _corpus(spark, n=40, seed=9)
        d = str(tmp_path / "sh")
        sh.write_token_shards(df, d, shard_tokens=10_000)
        got = {r["doc_id"]: r["token_ids"]
               for r in sh.read_token_shards(spark, d).collect()}
        assert got == orig
        # single shard, exact token count
        (bin_,) = glob.glob(d + "/shard-*.bin")
        n_tok = sum(len(v) for v in orig.values())
        assert os.path.getsize(bin_) == 2 * n_tok  # uint16

    def test_eos_interleaved_in_stream(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, [5, 6]), (2, [7])], "doc_id long, token_ids array<int>")
        d = str(tmp_path / "sh")
        sh.write_token_shards(df, d, eos_id=9)
        (bin_,) = glob.glob(d + "/shard-*.bin")
        arr = np.fromfile(bin_, dtype=np.uint16).tolist()
        assert arr == [5, 6, 9, 7, 9]

    def test_quarantined_docs_dropped(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, [5]), (2, None), (3, [6])],
            "doc_id long, token_ids array<int>")
        d = str(tmp_path / "sh")
        idx = sh.write_token_shards(df, d)
        assert sorted(r["doc_id"] for r in idx.collect()) == [1, 3]

    def test_empty_token_docs_survive(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, []), (2, [4, 4])], "doc_id long, token_ids array<int>")
        d = str(tmp_path / "sh")
        sh.write_token_shards(df, d, eos_id=0)
        got = {r["doc_id"]: r["token_ids"]
               for r in sh.read_token_shards(spark, d).collect()}
        assert got == {1: [], 2: [4, 4]}

    def test_deterministic_rewrite(self, spark, tmp_path):
        df, _ = _corpus(spark, seed=7)
        d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
        sh.write_token_shards(df, d1, shard_tokens=300, eos_id=0)
        sh.write_token_shards(df, d2, shard_tokens=300, eos_id=0)
        for p in glob.glob(d1 + "/shard-*.bin"):
            q = os.path.join(d2, os.path.basename(p))
            assert open(p, "rb").read() == open(q, "rb").read()

    def test_doc_boundary_split_policy(self, spark, tmp_path):
        # docs of 60 tokens, budget 100: doc0 at offset 0 (shard 0),
        # doc1 at offset 60 -> still shard 0 (overrun), doc2 at 120 ->
        # shard 1
        df = spark.createDataFrame(
            [(i, list(range(60))) for i in range(3)],
            "doc_id long, token_ids array<int>")
        d = str(tmp_path / "sh")
        idx = {r["doc_id"]: r["shard"]
               for r in sh.write_token_shards(
                   df, d, shard_tokens=100).collect()}
        assert idx == {0: 0, 1: 0, 2: 1}


class TestDtype:
    def test_auto_uint16(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, [65535])], "doc_id long, token_ids array<int>")
        d = str(tmp_path / "sh")
        sh.write_token_shards(df, d)
        meta = json.load(open(os.path.join(d, "_meta.json")))
        assert meta["dtype"] == "uint16"

    def test_auto_uint32(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, [70000])], "doc_id long, token_ids array<int>")
        d = str(tmp_path / "sh")
        sh.write_token_shards(df, d)
        meta = json.load(open(os.path.join(d, "_meta.json")))
        assert meta["dtype"] == "uint32"
        got = sh.read_token_shards(spark, d).collect()
        assert got[0]["token_ids"] == [70000]

    def test_explicit_uint16_overflow_raises(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, [70000])], "doc_id long, token_ids array<int>")
        with pytest.raises(ValueError, match="uint16"):
            sh.write_token_shards(df, str(tmp_path / "x"), dtype="uint16")

    def test_negative_id_raises(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, [-3])], "doc_id long, token_ids array<int>")
        with pytest.raises(ValueError, match="negative"):
            sh.write_token_shards(df, str(tmp_path / "x"))


class TestVocab:
    def test_deterministic_ordering_and_reserved(self, spark):
        docs = spark.createDataFrame(
            [(1, ["b", "a", "a"]), (2, ["b", "b", "c"])],
            "doc_id long, bpe_tokens array<string>")
        v = {r["token"]: r["id"]
             for r in sh.build_token_vocab(
                 docs, reserved=("<eos>", "<unk>")).collect()}
        # b count 3, a count 2, c count 1; reserved first
        assert v == {"<eos>": 0, "<unk>": 1, "b": 2, "a": 3, "c": 4}

    def test_count_ties_break_by_token(self, spark):
        docs = spark.createDataFrame(
            [(1, ["z", "a"])], "doc_id long, bpe_tokens array<string>")
        v = {r["token"]: r["id"]
             for r in sh.build_token_vocab(docs).collect()}
        assert v == {"a": 0, "z": 1}

    def test_min_count(self, spark):
        docs = spark.createDataFrame(
            [(1, ["a", "a", "rare"])],
            "doc_id long, bpe_tokens array<string>")
        v = sh.build_token_vocab(docs, min_count=2).collect()
        assert [r["token"] for r in v] == ["a"]

    def test_tokens_to_ids_unk_and_quarantine(self, spark):
        docs = spark.createDataFrame(
            [(1, ["a", "x"]), (2, ["a"])],
            "doc_id long, bpe_tokens array<string>")
        vocab = {"a": 2}
        with_unk = {r["doc_id"]: r["token_ids"] for r in
                    sh.tokens_to_ids(docs, vocab, unk_id=1).collect()}
        assert with_unk == {1: [2, 1], 2: [2]}
        strict = {r["doc_id"]: r["token_ids"] for r in
                  sh.tokens_to_ids(docs, vocab, unk_id=None).collect()}
        assert strict == {1: None, 2: [2]}


# marked slow (r14): excluded from the default driver gate, run with -m slow
@pytest.mark.slow
class TestBpeComposition:
    def test_full_chain(self, spark, tmp_path):
        """documents -> BPE -> vocab ids -> shards -> read back."""
        from aggo_spark.operators import tokenize as tk

        docs = spark.createDataFrame(
            [(i, f"the quick brown fox number {i} jumps over the lazy "
                 f"dog again and again") for i in range(1, 31)],
            "doc_id long, text string")
        merges = tk.train_bpe(docs, num_merges=40)
        enc = tk.bpe_encode(docs, merges)
        vdf = sh.build_token_vocab(enc, reserved=("<eos>",))
        vocab = {r["token"]: r["id"] for r in vdf.collect()}
        ids = sh.tokens_to_ids(enc, vocab)
        d = str(tmp_path / "sh")
        sh.write_token_shards(ids, d, shard_tokens=200, eos_id=0)
        back = {r["doc_id"]: r["token_ids"]
                for r in sh.read_token_shards(spark, d).collect()}
        expect = {r["doc_id"]: [vocab[t] for t in r["bpe_tokens"]]
                  for r in enc.collect()}
        assert back == expect


class TestPackSequences:
    def _stream(self, rows, eos):
        out = []
        for _, ids in sorted(rows):
            out.extend(ids)
            if eos is not None:
                out.append(eos)
        return out

    def test_exact_ctx_packing(self, spark):
        rng = random.Random(5)
        rows = [(i, [rng.randrange(1, 99)
                     for _ in range(rng.randrange(0, 25))])
                for i in range(1, 80)]
        df = spark.createDataFrame(rows,
                                   "doc_id long, token_ids array<int>")
        out = sh.pack_token_sequences(df, 64, eos_id=0)
        seqs = {r["seq_no"]: r["token_ids"] for r in out.collect()}
        stream = self._stream(rows, 0)
        assert len(seqs) == len(stream) // 64
        assert all(len(v) == 64 for v in seqs.values())
        recon = [t for k in sorted(seqs) for t in seqs[k]]
        assert recon == stream[:len(seqs) * 64]

    def test_keep_last_partial(self, spark):
        rows = [(1, [7] * 10), (2, [8] * 10)]
        df = spark.createDataFrame(rows,
                                   "doc_id long, token_ids array<int>")
        out = sh.pack_token_sequences(df, 8, drop_last=False)
        seqs = {r["seq_no"]: r["token_ids"] for r in out.collect()}
        recon = [t for k in sorted(seqs) for t in seqs[k]]
        assert recon == self._stream(rows, None)
        assert len(seqs[max(seqs)]) == 20 % 8

    def test_doc_longer_than_ctx_splits(self, spark):
        rows = [(1, list(range(100)))]
        df = spark.createDataFrame(rows,
                                   "doc_id long, token_ids array<int>")
        out = sh.pack_token_sequences(df, 16)
        seqs = {r["seq_no"]: r["token_ids"] for r in out.collect()}
        assert len(seqs) == 6  # 96 tokens in full sequences
        recon = [t for k in sorted(seqs) for t in seqs[k]]
        assert recon == list(range(96))

    def test_null_docs_dropped(self, spark):
        rows = [(1, [1] * 8), (2, None), (3, [2] * 8)]
        df = spark.createDataFrame(rows,
                                   "doc_id long, token_ids array<int>")
        out = sh.pack_token_sequences(df, 8)
        seqs = sorted(r["token_ids"] for r in out.collect())
        assert seqs == [[1] * 8, [2] * 8]


class TestStringIds:
    def test_url_doc_ids_roundtrip(self, spark, tmp_path):
        """The README recipe keys docs by URL — string ids must flow
        through write/read and packing (caught by the recipe smoke:
        the schemas hard-coded long ids)."""
        rows = [(f"https://e.com/{i:03d}", [i % 50 + 1] * (i % 7 + 1))
                for i in range(40)]
        df = spark.createDataFrame(rows,
                                   "doc_id string, token_ids array<int>")
        d = str(tmp_path / "sh")
        idx = sh.write_token_shards(df, d, shard_tokens=60, eos_id=0)
        assert dict(idx.dtypes)["doc_id"] == "string"
        got = {r["doc_id"]: r["token_ids"]
               for r in sh.read_token_shards(spark, d).collect()}
        assert got == dict(rows)
        seqs = sh.pack_token_sequences(df, 16, eos_id=0)
        stream = [t for _, ids in sorted(rows) for t in ids + [0]]
        recon = [t for r in sorted(seqs.collect(),
                                   key=lambda r: r["seq_no"])
                 for t in r["token_ids"]]
        assert recon == stream[:len(recon)]
        assert len(recon) == (len(stream) // 16) * 16
