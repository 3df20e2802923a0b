"""Capture .explain("formatted") for bench/contract queries → plans/<round>/.

Usage: python tools/capture_plans.py <suffix> [query ...]
  suffix: e.g. "before" or "after" → plans/$PLANS_ROUND/<query>_<suffix>.txt
  (PLANS_ROUND defaults to r14)

Runs with the SAME session confs as bench.py (cached tables, AQE on,
shuffle.partitions=32) so the captured plan is the benched plan. explain()
only analyzes/plans — it does not execute the query — so this is cheap and
safe to run alongside other work. Streaming queries (q42/q43/q51/q79/q80)
materialize state at build time and are skipped unless named explicitly.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT = [
    "q01_group_agg", "q02_filter", "q03_complex", "q05_tokens",
    "q11_window", "q12_topk", "q20_lookup_pipeline", "q22_sessionize",
    "q26_lookup_group", "q30_dedup_exact", "q32_dedup_minhash",
    "q33_dedup_simhash", "q34_ann_brute", "q36_langid", "q37_quality",
    "q59_asof_join", "q61_curation_pipeline",
]


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    os.environ.setdefault("AGGO_SPARK_CACHE_TABLES", "1")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("capture_plans")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = dict(entry.queries())

    # bench extras (the xxhash64 production-mode q32)
    from aggo_spark.operators import dedup as _dedup

    def q32_xxhash64(spark, sf_dir):
        return _dedup.minhash_lsh_pairs(
            entry._t(spark, sf_dir, "documents"), num_perm=64, bands=16,
            threshold=0.5, k=3, unit="word", hash_fn="xxhash64")

    qs["q32_dedup_minhash_md5"] = qs["q32_dedup_minhash"]  # oracle (md5) mode
    qs["q32_dedup_minhash"] = q32_xxhash64  # plan the benched (xxhash64) mode

    out_dir = (Path(__file__).resolve().parent.parent / "plans"
               / os.environ.get("PLANS_ROUND", "r14"))
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        # public API capture (ADVICE r13: the _jvm.PythonSQLUtils reach-in
        # is brittle across Spark versions)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        txt = buf.getvalue()
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(txt)
        n_ex = txt.count("Exchange")
        print(f"{name}: {n_ex} Exchange, {len(txt)} chars -> {path.name}")


if __name__ == "__main__":
    main()
