"""Per-branch ANN timing split: q34's four branches (brute / bucketed /
int8 / neardup), each timed with BOTH scorer forms (arrow kernel vs
Column/hof), at the given SF dir. Pins the Arrow-kernel crossover the r7
verdict asked for (verdict #1): at 2k vectors (sf0.1) the Column form
wins on fixed python-worker overhead; at 20k (sf1) the kernel wins.

Usage: SPARK_GRAFT_SF_DIR=... python tools/bench_q34_branches.py
Prints one JSON line: {"sf_dir": ..., "branches": {name: {"arrow": s,
"column": s}}}. Same best-of-3 + noop-sink + cached-tables protocol as
bench.py; every variant is entry._memo-wrapped (memo-parity rule,
SCALE.md r7 note).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("AGGO_SPARK_CACHE_TABLES", "1")

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("aggo_spark_q34_branches")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from aggo_spark.operators import similarity as sim

    def mk(branch: str, form: str):
        # form: "arrow" -> kernel paths; "column" -> Column/hof mirrors
        method = "arrow" if form == "arrow" else "hof"
        scorer = form

        def q(spark, sf_dir):
            emb = entry._t(spark, sf_dir, "embeddings")
            q5 = emb.filter(F.col("vec_id") < 5)
            if branch == "brute":
                return sim.brute_force_topk(emb, q5, k=10, method=method)
            if branch == "bucketed":
                return sim.bucketed_topk(emb, q5, k=10, bits=8,
                                         scorer=scorer)
            if branch == "int8":
                qd = emb.select(
                    "vec_id",
                    sim.quantize8(F.col("embedding"))["q"].alias("embedding"))
                return sim.brute_force_topk(
                    qd, qd.filter(F.col("vec_id") < 3), k=5, method=method)
            if branch == "neardup":
                return sim.embedding_near_dup_pairs(
                    emb, threshold=0.4, bits=8, scorer=scorer)
            raise ValueError(branch)

        q.__name__ = f"q34_{branch}_{form}"
        return entry._memo(q)

    qs = {f"{b}/{f}": mk(b, f)
          for b in ("brute", "bucketed", "int8", "neardup")
          for f in ("arrow", "column")}

    def run(fn) -> float:
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warmup + cache materialization (not timed)
    entry._engine(spark, sf_dir).collection("embeddings") \
        .write.format("noop").mode("overwrite").save()
    run(mk("brute", "column"))

    out = {}
    for name, fn in qs.items():
        best = min(run(fn) for _ in range(3))
        b, f = name.split("/")
        out.setdefault(b, {})[f] = round(best, 3)
    print(json.dumps({"sf_dir": sf_dir, "cpus": int(cpus),
                      "branches": out}))
    spark.stop()


if __name__ == "__main__":
    main()
