"""Randomized mutation fuzz for the r10 streaming maintenance states.

For seeded random add/edit/remove sequences, after EVERY flush point the
maintained state must equal the batch recomputation over the live docs:

- maintain_ngram_lm: netted model tables == train-time tables built from
  the live corpus (the retraining-equivalence contract);
- maintain_clusters: netted (id, label) == batch connected components
  over the live near-dup graph.

This is the strongest evidence class the repo uses for streaming
correctness (the r8 pattern: the registered-pipeline fuzz) applied to
the round-10 states.
"""
import random

import pytest

from tests.conftest import *  # noqa: F401,F403  (spark fixture)

from aggo_spark.streaming.core import StreamingCollection

# marked slow (r14): excluded from the default driver gate, run with -m slow
pytestmark = pytest.mark.slow


WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "one two three four five six seven eight nine ten "
         "red orange yellow green blue indigo violet umber ochre teal"
         ).split()


def _text(rng):
    base = " ".join(rng.choice(WORDS) for _ in range(rng.randint(6, 14)))
    return (base + " ") * rng.randint(1, 3)


def _mutate(rng, coll, live, next_id):
    op = rng.random()
    if op < 0.55 or not live:
        i = next_id[0]
        next_id[0] += 1
        t = _text(rng)
        coll.add({"doc_id": i, "text": t})
        live[i] = t
    elif op < 0.8:
        i = rng.choice(list(live))
        coll.remove({"doc_id": i, "text": live.pop(i)})
    else:
        i = rng.choice(list(live))
        coll.remove({"doc_id": i, "text": live[i]})
        t = _text(rng)
        coll.add({"doc_id": i, "text": t})
        live[i] = t


class TestStreamLMFuzz:
    @pytest.mark.parametrize("seed", [11, 23, 37])
    def test_lm_equals_retrain_under_random_mutations(
            self, spark, tmp_path, seed):
        from aggo_spark.operators import text as T

        rng = random.Random(seed)
        coll = StreamingCollection(
            spark, "doc_id long, text string", workdir=str(tmp_path))
        try:
            rid = coll.maintain_ngram_lm(str(tmp_path / "lm"), n=3,
                                         compact_every=4)
            live: dict = {}
            next_id = [1]
            for step in range(12):
                _mutate(rng, coll, live, next_id)
            coll.flush()
            got = coll.lm_tables(rid)
            ref = spark.createDataFrame(
                sorted(live.items()), "doc_id long, text string")
            want = T._ngram_model_tables(ref, 3, "text", "doc_id")
            for name in ("gram_2", "gram_3", "ctx_2", "ctx_3", "uni"):
                cols = [c for c in want[name].columns if c != "cnt"]
                g = {tuple(r[c] for c in cols): r["cnt"]
                     for r in got[name].collect()}
                w = {tuple(r[c] for c in cols): r["cnt"]
                     for r in want[name].collect()}
                assert g == w, (seed, name)
        finally:
            coll.stop()


class TestClusterFuzz:
    @pytest.mark.parametrize("seed", [5, 17])
    def test_clusters_equal_batch_cc_under_random_mutations(
            self, spark, tmp_path, seed):
        from aggo_spark.operators import dedup

        params = dict(num_perm=64, bands=16, shingle_k=3, unit="word",
                      hash_fn="xxhash64", threshold=0.2)
        rng = random.Random(seed)
        coll = StreamingCollection(
            spark, "doc_id long, text string", workdir=str(tmp_path))
        try:
            rid = coll.maintain_clusters(str(tmp_path / "clu"),
                                         compact_every=4, **params)
            live: dict = {}
            next_id = [1]
            for step in range(10):
                _mutate(rng, coll, live, next_id)
                if step % 5 != 4:
                    continue
                got = {r["id"]: r["label"]
                       for r in coll.clusters_df(rid).collect()}
                ref = spark.createDataFrame(
                    sorted(live.items()), "doc_id long, text string")
                pairs = dedup.minhash_lsh_pairs(
                    ref, num_perm=params["num_perm"],
                    bands=params["bands"], k=params["shingle_k"],
                    threshold=params["threshold"], unit=params["unit"],
                    hash_fn=params["hash_fn"])
                cc = {r["id"]: r["component"]
                      for r in dedup.connected_components(
                          pairs, "id_a", "id_b").collect()}
                assert {i: l for i, l in got.items() if i in cc} == cc, \
                    (seed, step)
                for i in set(live) - set(cc):
                    # singleton: maintained label (if present) is itself
                    assert got.get(i, i) == i, (seed, step, i)
        finally:
            coll.stop()
