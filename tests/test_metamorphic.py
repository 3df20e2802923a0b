"""Metamorphic invariants over the driver's real tables — the reference's
fixture-suite strategy (/root/reference/tests/fixtures/ecommerce-orders.spec.js:15-50
"metamorphic checks": filter-subset, sum-decomposition) applied to the
TPC-H-ish parquet.

These don't pin golden values; they assert relationships that must hold for
ANY correct engine, so they catch translation bugs the oracle comparison
can't see (e.g. a $match that silently drops rows on both sides).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aggo_spark import Engine, load_tables

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(load_tables(spark, SF))


def rows(df):
    return [r.asDict(recursive=True) for r in df.collect()]


class TestFilterSubset:
    def test_match_is_subset_and_monotone(self, eng):
        """Tightening a $match can only shrink the result; the tighter
        result is a subset of the looser one."""
        loose = eng.aggregate("lineitem", [
            {"$match": {"l_quantity": {"$gte": 30}}}, {"$count": "n"}]).first()["n"]
        tight = eng.aggregate("lineitem", [
            {"$match": {"l_quantity": {"$gte": 30}, "l_discount": {"$lt": 0.05}}},
            {"$count": "n"}]).first()["n"]
        total = eng.aggregate("lineitem", [{"$count": "n"}]).first()["n"]
        assert 0 < tight <= loose <= total

    def test_complement_partitions(self, eng):
        """p and NOT p partition the collection exactly."""
        p = eng.aggregate("orders", [
            {"$match": {"o_totalprice": {"$gte": 150000}}}, {"$count": "n"}]).first()["n"]
        notp = eng.aggregate("orders", [
            {"$match": {"o_totalprice": {"$lt": 150000}}}, {"$count": "n"}]).first()["n"]
        total = eng.aggregate("orders", [{"$count": "n"}]).first()["n"]
        assert p + notp == total  # o_totalprice has no nulls


class TestSumDecomposition:
    def test_group_sums_add_to_total(self, eng):
        """Σ per-group sums == global sum (exact: integer cents)."""
        cents = {"$toLong": {"$round": [{"$multiply": ["$o_totalprice", 100]}, 0]}}
        per_group = rows(eng.aggregate("orders", [
            {"$addFields": {"c": cents}},
            {"$group": {"_id": "$o_orderstatus", "s": {"$sum": "$c"}, "n": {"$sum": 1}}},
        ]))
        total = rows(eng.aggregate("orders", [
            {"$addFields": {"c": cents}},
            {"$group": {"_id": None, "s": {"$sum": "$c"}, "n": {"$sum": 1}}},
        ]))[0]
        assert sum(g["s"] for g in per_group) == total["s"]
        assert sum(g["n"] for g in per_group) == total["n"]

    def test_unionwith_additivity(self, eng):
        """count(A ∪all B) == count(A) + count(B)."""
        a = [{"$match": {"o_orderstatus": "F"}}]
        b = [{"$match": {"o_orderstatus": "O"}}]
        na = eng.aggregate("orders", a + [{"$count": "n"}]).first()["n"]
        nb = eng.aggregate("orders", b + [{"$count": "n"}]).first()["n"]
        nu = eng.aggregate("orders", a + [
            {"$unionWith": {"coll": "orders", "pipeline": b}},
            {"$count": "n"}]).first()["n"]
        assert nu == na + nb


class TestOrderingAndPagination:
    def test_topk_prefix_of_full_sort(self, eng):
        full = rows(eng.aggregate("orders", [
            {"$sort": {"o_totalprice": -1, "o_orderkey": 1}},
            {"$project": {"_id": 0, "o_orderkey": 1}}, {"$limit": 50}]))
        topk = rows(eng.aggregate("orders", [
            {"$sort": {"o_totalprice": -1, "o_orderkey": 1}},
            {"$limit": 10},
            {"$project": {"_id": 0, "o_orderkey": 1}}]))
        assert topk == full[:10]

    def test_pagination_disjoint_and_complete(self, eng):
        pages = []
        for skip in (0, 20, 40):
            pages.append(rows(eng.aggregate("customer", [
                {"$sort": {"c_custkey": 1}},
                {"$skip": skip}, {"$limit": 20},
                {"$project": {"_id": 0, "c_custkey": 1}}])))
        keys = [r["c_custkey"] for p in pages for r in p]
        assert len(keys) == len(set(keys)) == 60
        assert keys == sorted(keys)


class TestJoinInvariants:
    def test_lookup_preserves_left_rows(self, eng):
        """$lookup is a left join: row count is invariant."""
        n_orders = eng.aggregate("orders", [{"$count": "n"}]).first()["n"]
        with_lookup = eng.aggregate("orders", [
            {"$lookup": {"from": "customer", "localField": "o_custkey",
                         "foreignField": "c_custkey", "as": "c"}},
            {"$count": "n"}]).first()["n"]
        assert with_lookup == n_orders

    def test_unwind_size_sum(self, eng):
        """Σ size(as-array) == rows after $unwind (no preserve)."""
        sizes = eng.aggregate("customer", [
            {"$lookup": {"from": "orders", "localField": "c_custkey",
                         "foreignField": "o_custkey", "as": "o"}},
            {"$group": {"_id": None, "s": {"$sum": {"$size": "$o"}}}}]).first()["s"]
        unwound = eng.aggregate("customer", [
            {"$lookup": {"from": "orders", "localField": "c_custkey",
                         "foreignField": "o_custkey", "as": "o"}},
            {"$unwind": "$o"}, {"$count": "n"}]).first()["n"]
        assert sizes == unwound


class TestAccumulatorConsistency:
    def test_avg_equals_sum_over_count(self, eng):
        out = rows(eng.aggregate("lineitem", [
            {"$group": {"_id": "$l_returnflag",
                        "s": {"$sum": "$l_quantity"},
                        "n": {"$sum": 1},
                        "a": {"$avg": "$l_quantity"}}}]))
        for g in out:
            assert g["a"] == pytest.approx(g["s"] / g["n"])

    def test_minmax_bound_push(self, eng):
        out = rows(eng.aggregate("orders", [
            {"$group": {"_id": "$o_orderstatus",
                        "lo": {"$min": "$o_totalprice"},
                        "hi": {"$max": "$o_totalprice"},
                        "all": {"$push": "$o_totalprice"}}}]))
        for g in out:
            assert g["lo"] == min(g["all"]) and g["hi"] == max(g["all"])

    def test_stddev_matches_python(self, eng):
        import statistics

        out = rows(eng.aggregate("supplier", [
            {"$group": {"_id": None,
                        "sd": {"$stdDevSamp": "$s_acctbal"},
                        "all": {"$push": "$s_acctbal"}}}]))[0]
        assert out["sd"] == pytest.approx(statistics.stdev(out["all"]))


class TestWindowInvariants:
    def test_running_sum_final_equals_total(self, eng):
        out = rows(eng.aggregate("orders", [
            {"$addFields": {"c": {"$toLong": {"$round": [
                {"$multiply": ["$o_totalprice", 100]}, 0]}}}},
            {"$setWindowFields": {
                "partitionBy": "$o_custkey",
                "sortBy": {"o_orderkey": 1},
                "output": {
                    "run": {"$sum": "$c",
                            "window": {"documents": ["unbounded", "current"]}},
                    "tot": {"$sum": "$c"}}}},
            {"$group": {"_id": "$o_custkey",
                        "last_run": {"$maxBy": {"output": "$run", "by": "$o_orderkey"}},
                        "tot": {"$max": "$tot"}}},
        ]))
        for g in out:
            assert g["last_run"] == g["tot"]
