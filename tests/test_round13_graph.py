"""Round 13: link-graph operators (extract_links + pagerank)."""

from __future__ import annotations

import numpy as np
import pytest

from aggo_spark.operators.graph import extract_links, pagerank


def _numpy_pagerank(edges, n_iter=10, d=0.85):
    nodes = sorted({x for e in edges for x in e})
    idx = {n: i for i, n in enumerate(nodes)}
    out = {}
    for s, t in sorted(set(edges)):
        out.setdefault(s, []).append(t)
    n = len(nodes)
    v = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        nv = np.full(n, (1 - d) / n)
        nv += d * sum(v[idx[x]] for x in nodes if x not in out) / n
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
