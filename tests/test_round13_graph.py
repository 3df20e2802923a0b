"""Round 13: link-graph operators (extract_links / anchor texts /
pagerank / hits)."""

from __future__ import annotations

import numpy as np
import pytest

from aggo_spark.operators.graph import (
    extract_anchor_texts,
    extract_links,
    hits,
    pagerank,
    seed_distance,
)


def _numpy_pagerank(edges, n_iter=10, d=0.85, seeds=None):
    nodes = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    out = {}
    for s, t in sorted(set(edges)):
        out.setdefault(s, []).append(t)
    n = len(nodes)
    if seeds is None:
        p = np.full(n, 1.0 / n)
    else:
        present = [s for s in set(seeds) if s in idx]
        p = np.zeros(n)
        for s in present:
            p[idx[s]] = 1.0 / len(present)
    v = p.copy()
    for _ in range(n_iter):
        dangling = sum(v[idx[x]] for x in nodes if x not in out)
        nv = (1 - d) * p + d * dangling * p
        for s, ts in out.items():
            for t in ts:
                nv[idx[t]] += d * v[idx[s]] / len(ts)
        v = nv
    return {x: v[idx[x]] for x in nodes}


class TestExtractLinks:
    def test_href_forms(self, spark):
        html = ('<a href="https://x.com/1#frag">a</a>'
                " <A HREF='https://y.com/2'>b</A>"
                ' <a class="z" href=https://z.com/3>c</a>'
                ' <a href="/relative">drop</a>'
                ' <a href="mailto:x@y.com">drop</a>')
        df = spark.createDataFrame([("u", html)], "url string, text string")
        got = sorted(r["dst"] for r in extract_links(df).collect())
        assert got == ["https://x.com/1", "https://y.com/2",
                       "https://z.com/3"]

    def test_distinct_edges(self, spark):
        html = '<a href="https://x.com/1">a</a><a href="https://x.com/1">b</a>'
        df = spark.createDataFrame([("u", html)], "url string, text string")
        assert extract_links(df).count() == 1

    def test_no_links_no_rows(self, spark):
        df = spark.createDataFrame([("u", "<p>plain</p>")],
                                   "url string, text string")
        assert extract_links(df).count() == 0


def _numpy_hits(edges, n_iter=10):
    nodes = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    es = sorted(set(edges))
    n = len(nodes)
    h = np.ones(n)
    a = np.ones(n)
    for _ in range(n_iter):
        a = np.zeros(n)
        for s, t in es:
            a[idx[t]] += h[idx[s]]
        a /= np.sqrt((a * a).sum()) or 1.0
        h = np.zeros(n)
        for s, t in es:
            h[idx[s]] += a[idx[t]]
        h /= np.sqrt((h * h).sum()) or 1.0
    return ({x: a[idx[x]] for x in nodes}, {x: h[idx[x]] for x in nodes})


class TestExtractAnchorTexts:
    def test_triples(self, spark):
        html = ('pre <a href="https://x.com/1#f" class="z">Click <b>here'
                '</b>\n now</a> mid <a href=https://y.com/2>Y page</a>'
                ' <a href="/rel">drop</a>')
        df = spark.createDataFrame([("u", html)], "url string, text string")
        got = sorted((r["dst"], r["anchor"])
                     for r in extract_anchor_texts(df).collect())
        assert got == [("https://x.com/1", "Click here now"),
                       ("https://y.com/2", "Y page")]

    def test_repeated_mentions_kept(self, spark):
        html = ('<a href="https://x.com/1">first</a>'
                '<a href="https://x.com/1">second</a>')
        df = spark.createDataFrame([("u", html)], "url string, text string")
        rows = extract_anchor_texts(df).collect()
        assert sorted(r["anchor"] for r in rows) == ["first", "second"]
        assert {r["src"] for r in rows} == {"u"}

    def test_empty_anchor(self, spark):
        html = '<a href="https://x.com/1"></a>'
        df = spark.createDataFrame([("u", html)], "url string, text string")
        rows = extract_anchor_texts(df).collect()
        assert len(rows) == 1 and rows[0]["anchor"] == ""


class TestHits:
    def test_matches_power_iteration(self, spark):
        edges = [("A", "B"), ("A", "C"), ("B", "C"), ("C", "A"),
                 ("D", "C"), ("A", "E")]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["node"]: (r["authority"], r["hub"])
               for r in hits(df, n_iter=7).collect()}
        ref_a, ref_h = _numpy_hits(edges, n_iter=7)
        assert set(got) == set(ref_a)
        for k in ref_a:
            assert got[k][0] == pytest.approx(ref_a[k], abs=1e-12)
            assert got[k][1] == pytest.approx(ref_h[k], abs=1e-12)

    def test_star_graph(self, spark):
        # hub H points at 3 sinks: H is the only hub, sinks share
        # authority 1/sqrt(3)
        edges = [("H", "S1"), ("H", "S2"), ("H", "S3")]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["node"]: (r["authority"], r["hub"])
               for r in hits(df, n_iter=3).collect()}
        assert got["H"][1] == pytest.approx(1.0, abs=1e-12)
        for s in ("S1", "S2", "S3"):
            assert got[s][0] == pytest.approx(1 / np.sqrt(3), abs=1e-12)
            assert got[s][1] == 0.0

    def test_empty_graph(self, spark):
        df = spark.createDataFrame([], "src string, dst string")
        assert hits(df, n_iter=2).count() == 0


class TestPagerank:
    def test_matches_power_iteration_with_dangling(self, spark):
        edges = [("A", "B"), ("A", "C"), ("B", "C"), ("C", "A"),
                 ("D", "A")]  # D dangles? no: D->A; make E dangling
        edges.append(("A", "E"))  # E has no out-edges -> dangling
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["node"]: r["rank"]
               for r in pagerank(df, n_iter=12).collect()}
        ref = _numpy_pagerank(edges, n_iter=12)
        assert set(got) == set(ref)
        for k in ref:
            assert got[k] == pytest.approx(ref[k], abs=1e-12)
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)

    def test_cycle_uniform(self, spark):
        edges = [("A", "B"), ("B", "C"), ("C", "A")]
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["node"]: r["rank"]
               for r in pagerank(df, n_iter=8).collect()}
        for v in got.values():
            assert v == pytest.approx(1 / 3, abs=1e-12)

    def test_empty_graph(self, spark):
        df = spark.createDataFrame([], "src string, dst string")
        assert pagerank(df, n_iter=3).count() == 0

    def test_personalized_matches_power_iteration(self, spark):
        edges = [("A", "B"), ("A", "C"), ("B", "C"), ("C", "A"),
                 ("D", "A"), ("A", "E")]  # E dangling
        df = spark.createDataFrame(edges, "src string, dst string")
        seeds = spark.createDataFrame([("A",), ("D",), ("Z",)],
                                      "node string")  # Z absent -> drops
        got = {r["node"]: r["rank"]
               for r in pagerank(df, n_iter=9, seeds=seeds).collect()}
        ref = _numpy_pagerank(edges, n_iter=9, seeds=["A", "D", "Z"])
        assert set(got) == set(ref)
        for k in ref:
            assert got[k] == pytest.approx(ref[k], abs=1e-12)
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)

    def test_weighted_matches_power_iteration(self, spark):
        # weights sum per duplicate pair; zero/negative rows drop
        rows = [("A", "B", 3.0), ("A", "C", 1.0), ("B", "C", 2.0),
                ("C", "A", 1.0), ("A", "B", 1.0), ("A", "D", 0.0),
                ("B", "A", -5.0)]
        df = spark.createDataFrame(
            rows, "src string, dst string, wt double")
        got = {r["node"]: r["rank"]
               for r in pagerank(df, n_iter=10,
                                 weight_col="wt").collect()}
        # numpy mirror with explicit transition weights
        import collections
        wsum = collections.defaultdict(float)
        for s, t, wt in rows:
            if wt > 0:
                wsum[(s, t)] += wt
        nodes = sorted({x for k in wsum for x in k})
        idx = {x: i for i, x in enumerate(nodes)}
        n = len(nodes)
        deg = collections.defaultdict(float)
        for (s, t), wt in wsum.items():
            deg[s] += wt
        v = np.full(n, 1.0 / n)
        d = 0.85
        for _ in range(10):
            dangling = sum(v[idx[x]] for x in nodes if x not in deg)
            nv = np.full(n, (1 - d) / n) + d * dangling / n
            for (s, t), wt in wsum.items():
                nv[idx[t]] += d * v[idx[s]] * wt / deg[s]
            v = nv
        assert set(got) == set(nodes)
        for k in nodes:
            assert got[k] == pytest.approx(v[idx[k]], abs=1e-12)
        assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)

    def test_personalized_no_seed_in_graph_raises(self, spark):
        df = spark.createDataFrame([("A", "B")], "src string, dst string")
        seeds = spark.createDataFrame([("Z",)], "node string")
        with pytest.raises(ValueError, match="seed"):
            pagerank(df, n_iter=2, seeds=seeds)

    def test_chain_composes_with_extract(self, spark):
        rows = [(f"https://g.test/{i}",
                 f'<a href="https://g.test/{(i + 1) % 4}">n</a>')
                for i in range(4)]
        df = spark.createDataFrame(rows, "url string, text string")
        ranks = pagerank(extract_links(df), n_iter=6)
        got = [r["rank"] for r in ranks.collect()]
        assert len(got) == 4
        for v in got:
            assert v == pytest.approx(0.25, abs=1e-12)


class TestSeedDistance:
    def test_bfs_levels(self, spark):
        # A -> B -> C -> D, A -> C (shortcut), E isolated target of D
        edges = [("A", "B"), ("B", "C"), ("C", "D"), ("A", "C"),
                 ("D", "E")]
        df = spark.createDataFrame(edges, "src string, dst string")
        seeds = spark.createDataFrame([("A",)], "node string")
        got = {r["node"]: r["dist"]
               for r in seed_distance(df, seeds, max_hops=10).collect()}
        assert got == {"A": 0, "B": 1, "C": 1, "D": 2, "E": 3}

    def test_max_hops_cap(self, spark):
        edges = [("A", "B"), ("B", "C"), ("C", "D")]
        df = spark.createDataFrame(edges, "src string, dst string")
        seeds = spark.createDataFrame([("A",)], "node string")
        got = {r["node"]: r["dist"]
               for r in seed_distance(df, seeds, max_hops=2).collect()}
        assert got == {"A": 0, "B": 1, "C": 2}  # D beyond the cap

    def test_multi_seed_min(self, spark):
        edges = [("A", "B"), ("B", "C"), ("Z", "C")]
        df = spark.createDataFrame(edges, "src string, dst string")
        seeds = spark.createDataFrame([("A",), ("Z",)], "node string")
        got = {r["node"]: r["dist"]
               for r in seed_distance(df, seeds, max_hops=5).collect()}
        assert got == {"A": 0, "Z": 0, "B": 1, "C": 1}

    def test_cycle_terminates_early(self, spark):
        edges = [("A", "B"), ("B", "A")]
        df = spark.createDataFrame(edges, "src string, dst string")
        seeds = spark.createDataFrame([("A",)], "node string")
        got = {r["node"]: r["dist"]
               for r in seed_distance(df, seeds, max_hops=50).collect()}
        assert got == {"A": 0, "B": 1}
