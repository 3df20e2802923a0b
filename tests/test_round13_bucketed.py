"""Round 13: bucketed tables — the co-location lever for repeated
big-big joins at 100 TB. The whole point is the PLAN: two tables
bucketed on the same keys with the same bucket count must join with
ZERO shuffle exchange, and a groupBy on the bucket keys must read
pre-partitioned data. These tests pin exactly that."""

from __future__ import annotations

import re
import uuid

import pytest
from pyspark.sql import functions as F

from aggo_spark.sources.io import load_bucketed, save_bucketed


def _exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return len(re.findall(r"(?<!Reused)Exchange", plan))


@pytest.fixture()
def tables(spark, tmp_path):
    suffix = uuid.uuid4().hex[:8]
    ta, tb = f"bk_a_{suffix}", f"bk_b_{suffix}"
    a = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    save_bucketed(a, ta, ["k"], buckets=8, path=str(tmp_path / "a"))
    save_bucketed(b, tb, ["k"], buckets=8, path=str(tmp_path / "b"))
    yield ta, tb
    spark.sql(f"DROP TABLE IF EXISTS {ta}")
    spark.sql(f"DROP TABLE IF EXISTS {tb}")


class TestBucketedJoin:
    def test_join_has_zero_exchanges(self, spark, tables):
        ta, tb = tables
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = load_bucketed(spark, ta).join(
                load_bucketed(spark, tb), "k")
            assert _exchanges(j) == 0, (
                "bucketed-bucketed equi-join must be exchange-free")
            # and the answer is right
            row = j.agg(F.count("*").alias("n"),
                        F.sum(F.col("va") + F.col("vb")).alias("s")
                        ).collect()[0]
            assert row["n"] == 10_000
            assert row["s"] == sum(2 * i + 3 * i for i in range(10_000))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_unbucketed_baseline_shuffles(self, spark, tables):
        """Sanity: the same join WITHOUT bucket metadata shuffles —
        proving the zero above comes from the bucket spec, not AQE."""
        ta, tb = tables
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            loc_a = spark.sql(f"DESCRIBE FORMATTED {ta}") \
                .filter("col_name = 'Location'").collect()[0]["data_type"]
            raw = spark.read.parquet(loc_a)
            j = raw.join(raw.withColumnRenamed("va", "vb"), "k")
            assert _exchanges(j) > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    def test_groupby_on_bucket_keys_is_exchange_free(self, spark, tables):
        ta, _ = tables
        g = load_bucketed(spark, ta).groupBy("k").agg(
            F.sum("va").alias("s"))
        assert _exchanges(g) == 0

    def test_roundtrip_values(self, spark, tables):
        ta, _ = tables
        got = load_bucketed(spark, ta).orderBy("k").limit(3).collect()
        assert [(r["k"], r["va"]) for r in got] == [(0, 0), (1, 2), (2, 4)]
