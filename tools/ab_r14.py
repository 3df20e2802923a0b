"""Interleaved A/B cells for round-14 optimization candidates.

Usage: python tools/ab_r14.py <cell> [reps]

Bench-parity methodology: same session shape as bench.py (local[$CPUS],
cached tables, shuffle.partitions=$CPUS, AQE on), DataFrames built ONCE
per variant (bench queries are _memo-wrapped, so steady-state runs reuse
shuffle files the same way), one untimed warm-up per variant, then
``reps`` interleaved rounds A,B,...  — ambient load hits every variant
equally. Reports per-variant min / median / raw.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _session():
    os.environ.setdefault("AGGO_SPARK_CACHE_TABLES", "1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("ab_r14")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def run_cell(variants: dict, reps: int, spark) -> None:
    times: dict[str, list[float]] = {k: [] for k in variants}
    dfs = {k: build() for k, build in variants.items()}
    for name, df in dfs.items():
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        _noop(df)
    for r in range(reps):
        for name, df in dfs.items():
            spark.sparkContext.setJobDescription(f"rep{r}:{name}")
            t0 = time.time()
            _noop(df)
            times[name].append(round(time.time() - t0, 3))
    out = {}
    for name, ts in times.items():
        st = sorted(ts)
        out[name] = {"min": st[0], "median": st[len(st) // 2], "raw": ts}
    print(json.dumps(out, indent=1))


def main() -> None:
    cell = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = _session()
    import __spark_entry__ as entry
    from aggo_spark.operators import dedup

    docs = entry._t(spark, sf_dir, "documents")

    if cell == "q33_lanes":
        def v(lb):
            return lambda: dedup.simhash_pairs(
                docs, max_hamming=3, hash_fn="md5", lane_bits=lb
            ).orderBy("id_a", "id_b")
        run_cell({"lanes_none": v(None), "lanes_16": v(16), "lanes_32": v(32)},
                 reps, spark)
    elif cell == "q33_fp_only":
        # fingerprint stage isolation (the aggregate under test)
        def v(lb):
            return lambda: dedup.simhash_table(docs, hash_fn="md5", lane_bits=lb)
        run_cell({"fp_none": v(None), "fp_16": v(16), "fp_32": v(32)},
                 reps, spark)
    elif cell == "q32_slim":
        def v(hf, slim):
            return lambda: dedup.minhash_lsh_pairs(
                docs, num_perm=64, bands=16, threshold=0.5, k=3,
                unit="word", hash_fn=hf, slim=slim)
        run_cell({
            "xx_wide": v("xxhash64", False), "xx_slim": v("xxhash64", True),
            "md5_wide": v("md5", False), "md5_slim": v("md5", True),
        }, reps, spark)
    elif cell == "q20_peephole":
        from aggo_spark.operators import stages as _st

        def build_generic():
            saved = _st._size_only_rewrite
            _st._size_only_rewrite = lambda *a, **k: None
            try:
                # fresh pipeline list → bypasses the engine plan cache key?
                # (same JSON → same key, so clear the cache around the patch)
                entry._engine(spark, sf_dir)._plan_cache.clear()
                df = entry.q20_lookup_pipeline(spark, sf_dir)
            finally:
                _st._size_only_rewrite = saved
            return df

        def build_opt():
            entry._engine(spark, sf_dir)._plan_cache.clear()
            return entry.q20_lookup_pipeline(spark, sf_dir)

        run_cell({"generic": build_generic, "size_only": build_opt},
                 reps, spark)
    elif cell.startswith("q32_one:"):
        # one variant per SESSION: the slim path persists its signature
        # table, and Spark's CacheManager substitutes a cached plan into
        # ANY matching subtree — so wide-vs-slim in one session is
        # cross-polluted. Run e.g. q32_one:xx_slim / q32_one:md5_wide.
        _, variant = cell.split(":")
        hf = "xxhash64" if variant.startswith("xx") else "md5"
        slim = variant.endswith("slim")
        run_cell({variant: lambda: dedup.minhash_lsh_pairs(
            docs, num_perm=64, bands=16, threshold=0.5, k=3,
            unit="word", hash_fn=hf, slim=slim)}, reps, spark)
    elif cell == "q61_fused_table":
        # r14 MEASURED NEGATIVE (kept reproducible): fusing the quality
        # panel INTO the language table's explode+mask-probe aggregate
        # wins at sf0.1 but loses 25%+ at sf1 — the per-token carry cost
        # (7 extra slots + buffer updates per exploded token) outgrows
        # the saved second scan. See _q61_curation_fused_form.
        a = entry.q61_curation_pipeline(spark, sf_dir)
        b = entry._q61_curation_fused_form(spark, sf_dir)
        diff = (a.withColumnRenamed("n_docs", "na")
                .withColumnRenamed("total_tokens", "ta")
                .join(b.withColumnRenamed("n_docs", "nb")
                      .withColumnRenamed("total_tokens", "tb"),
                      "source", "full")
                .filter("na is distinct from nb or ta is distinct from tb")
                .count())
        print(json.dumps({"equal_check_mismatches": diff,
                          "schema_a": a.schema.simpleString(),
                          "schema_b": b.schema.simpleString()}))
        run_cell({"join_form": lambda: a, "fused_table": lambda: b},
                 reps, spark)
    elif cell == "class_counts":
        # r14 continuation: length(regexp_replace(strip, "")) allocates a
        # full copy of the text per class count; regexp_count iterates
        # matches with no allocation. Three hot sites, measured
        # separately: alpha chars (quality_score), nonspace (language
        # router), CJK-range count (router). Astral-safety argued in
        # text.py; equality asserted over the whole corpus first.
        from pyspark.sql import functions as F

        from aggo_spark.operators import text as _tx

        t = F.col("text")
        old = {
            "alpha": F.length(F.regexp_replace(t, "[^A-Za-z]", "")),
            "nonspace": F.length(F.regexp_replace(t, _tx._WS_CLASS, "")),
            "cjk": F.length(
                F.regexp_replace(t, f"[^{_tx.CJK_RANGES}]", "")),
        }
        new = {
            "alpha": F.regexp_count(t, F.lit("[A-Za-z]")),
            "nonspace": F.length(t) - F.regexp_count(
                t, F.lit(_tx._WS_CLASS)),
            "cjk": F.regexp_count(t, F.lit(f"[{_tx.CJK_RANGES}]")),
        }
        mism = docs.select(*[
            (old[k].eqNullSafe(new[k])).alias(k) for k in old
        ]).agg(*[F.count(F.when(~F.col(k), 1)).alias(k) for k in old]
               ).collect()[0].asDict()
        print(json.dumps({"equal_check_mismatches": mism}))
        variants = {}
        for k in old:
            variants[f"{k}_replace"] = (
                lambda c=old[k]: docs.select(c.alias("v")))
            variants[f"{k}_count"] = (
                lambda c=new[k]: docs.select(c.alias("v")))
        run_cell(variants, reps, spark)
    elif cell == "q36_router":
        # full-query impact of the _class_count regexp_count swap: build
        # variant A with the old strip-the-complement form monkeypatched
        # back in, variant B with the shipped form.
        from pyspark.sql import functions as F

        from aggo_spark.operators import text as _tx

        saved = _tx._class_count
        _tx._class_count = lambda col, ranges: F.length(
            F.regexp_replace(col, f"[^{ranges}]", ""))
        try:
            a = entry.q36_langid(spark, sf_dir)
        finally:
            _tx._class_count = saved
        b = entry.q36_langid(spark, sf_dir)
        diff = (a.withColumnRenamed("pred_lang", "pa")
                .join(b.withColumnRenamed("pred_lang", "pb"),
                      "doc_id", "full")
                .filter("pa is distinct from pb").count())
        print(json.dumps({"equal_check_mismatches": diff}))
        run_cell({"router_replace": lambda: a, "router_count": lambda: b},
                 reps, spark)
    elif cell == "q36_noexplode":
        from pyspark.sql import functions as F

        from aggo_spark.operators import text as _tx

        def both_docs():
            df = entry._t(spark, sf_dir, "documents")
            fixture = F.array(*[F.lit(t) for t in entry._CJK_FIXTURE_TEXTS])
            n_fix = len(entry._CJK_FIXTURE_TEXTS)
            synth = df.select(
                (F.col("doc_id") + F.lit(entry._CJK_FIXTURE_ID_OFFSET))
                .alias("doc_id"),
                F.element_at(
                    fixture,
                    (F.col("doc_id") % n_fix + 1).cast("int")).alias("text"))
            return df.select("doc_id", "text").unionByName(synth)

        def build_explode():
            return _tx.language_id_table(both_docs(), "text", cjk_route=True)

        def build_noexplode():
            # Column form (per-language size(filter(tok, isin)) HOFs) with
            # the same CJK router — the verdict-#6 candidate. NOT shipped
            # unless it wins; equality vs the table form is asserted by
            # the harness below before timing.
            d = both_docs()
            col = F.col("text")
            cjk_label = (
                F.when(_tx._class_count(col, _tx.KANA_RANGES) > 0, F.lit("ja"))
                .when(_tx._class_count(col, _tx.HANGUL_RANGES) > 0, F.lit("ko"))
                .otherwise(F.lit("zh")))
            routed_cnt = _tx._class_count(col, _tx.CJK_RANGES)
            nonspace = F.length(F.regexp_replace(col, _tx._WS_CLASS, ""))
            routed = (routed_cnt > 0) & (
                routed_cnt.cast("long") * 100
                >= nonspace.cast("long") * _tx.CJK_ROUTE_PCT)
            pred = _tx.language_id(col)
            pred = F.coalesce(F.when(routed, cjk_label), pred)
            return d.select("doc_id", F.coalesce(pred, F.lit("und"))
                            .alias("pred_lang"))

        a, b = build_explode(), build_noexplode()
        diff = (a.withColumnRenamed("pred_lang", "pa")
                .join(b.withColumnRenamed("pred_lang", "pb"), "doc_id", "full")
                .filter("pa is distinct from pb").count())
        print(json.dumps({"equal_check_mismatches": diff}))
        run_cell({"explode_table": lambda: a, "noexplode_column": lambda: b},
                 reps, spark)
    else:
        raise SystemExit(f"unknown cell {cell!r}")
    spark.stop()


if __name__ == "__main__":
    main()
