"""Round-12 A/B (verdict r11 next #6): attribute q36_langid's sf10
tail (9.63 final 10x ratio in SCALING_r11 — the closest entry to the
bound) via the q75/q77 thread-count experiment: run the query at sf10
under local[32] and local[8] in separate sessions and compare wall
time vs cumulative executor cpu-seconds of the heaviest stage (stages
REST API). Identical wall + a large cpu-contention tax at 32 threads
= DRAM-bandwidth class (a cluster resolves it by construction);
wall scaling with threads = a plan problem worth fixing.

Usage: python tools/ab_q36_threads.py [sf_dir] [query]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF10 = "/root/repo/scaledata/sf10"


def run_once(threads: int, sf_dir: str, qname: str) -> dict:
    os.environ.setdefault("AGGO_SPARK_CACHE_TABLES", "1")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{threads}]")
        .appName(f"ab_q36_{threads}")
        .config("spark.sql.shuffle.partitions", str(threads))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "4000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId

    import importlib

    import __spark_entry__ as entry
    importlib.reload(entry)

    qs = entry.queries()
    # warm codegen + parquet footers
    qs[qname](spark, sf_dir).write.format("noop").mode("overwrite").save()
    t0 = time.monotonic()
    qs[qname](spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0
    with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete") as r:
        stages = json.load(r)
    heavy = max(stages, key=lambda s: s.get("executorRunTime", 0))
    out = {
        "threads": threads,
        "wall_sec": round(wall, 2),
        "heavy_stage_cpu_sec": round(heavy["executorRunTime"] / 1000, 1),
        "heavy_stage_name": heavy.get("name", "")[:60],
        "total_cpu_sec": round(
            sum(s.get("executorRunTime", 0) for s in stages) / 1000, 1),
        "shuffle_write_mb": round(
            sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6, 1),
        "spill_bytes": sum(s.get("memoryBytesSpilled", 0) for s in stages),
    }
    spark.stop()
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else SF10
    qname = sys.argv[2] if len(sys.argv) > 2 else "q36_langid"
    for threads in (32, 8):
        print(json.dumps({"query": qname, **run_once(threads, sf_dir, qname)}))


if __name__ == "__main__":
    main()
