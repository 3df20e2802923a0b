"""Root-cause harness for the q37/q77 sf10 superlinear tail (r9 verdict
Next #4: SCALING_r9 final 10x ratios 10.14 / 10.11 — the only entries
above 10).

Runs each query at sf1 and sf10 in one warm session with the Spark UI
enabled, then pulls per-stage task metrics (executorRunTime, GC time,
shuffle read/write bytes, memory/disk spill, task-time skew) from the UI
REST API and prints the sf10/sf1 ratio per aligned stage. A stage whose
time ratio far exceeds its data ratio, or spill appearing only at sf10,
names the saturating resource.

Usage: python tools/diag_sf10_tail.py [q37_quality q77_chunking]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF1 = "/root/repo/scaledata/sf1"
SF10 = "/root/repo/scaledata/sf10"


def stages(ui: str, app: str) -> list[dict]:
    with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete") as r:
        return json.load(r)


def main() -> None:
    os.environ.setdefault("AGGO_SPARK_CACHE_TABLES", "1")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("diag_sf10")
        .config("spark.sql.shuffle.partitions", "32")
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

    import __spark_entry__ as entry

    names = sys.argv[1:] or ["q37_quality", "q77_chunking"]
    qs = entry.queries()
    # warm codegen/broadcast paths once
    qs["q02_filter"](spark, SF1).write.format("noop").mode("overwrite").save()

    report: dict = {}
    for name in names:
        per_sf: dict = {}
        for sf, tag in ((SF1, "sf1"), (SF10, "sf10")):
            before = {s["stageId"] for s in stages(ui, app)}
            t0 = time.time()
            qs[name](spark, sf).write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            after = [s for s in stages(ui, app)
                     if s["stageId"] not in before]
            rows = []
            for s in sorted(after, key=lambda s: s["stageId"]):
                rows.append({
                    "stage": s["stageId"],
                    "name": s["name"].split("\n")[0][:60],
                    "tasks": s["numCompleteTasks"],
                    "run_ms": s["executorRunTime"],
                    "gc_ms": s.get("jvmGcTime", 0),
                    "in_mb": round(s.get("inputBytes", 0) / 1e6, 1),
                    "sh_r_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 1),
                    "sh_w_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 1),
                    "spill_mem_mb": round(
                        s.get("memoryBytesSpilled", 0) / 1e6, 1),
                    "spill_disk_mb": round(
                        s.get("diskBytesSpilled", 0) / 1e6, 1),
                })
            per_sf[tag] = {"wall_s": round(wall, 2), "stages": rows}
            print(f"\n== {name} @ {tag}: wall {wall:.2f}s", file=sys.stderr)
            for r in rows:
                print(f"  {r}", file=sys.stderr)
        report[name] = per_sf
        w1, w10 = per_sf["sf1"]["wall_s"], per_sf["sf10"]["wall_s"]
        g1 = sum(r["gc_ms"] for r in per_sf["sf1"]["stages"])
        g10 = sum(r["gc_ms"] for r in per_sf["sf10"]["stages"])
        e1 = sum(r["run_ms"] for r in per_sf["sf1"]["stages"])
        e10 = sum(r["run_ms"] for r in per_sf["sf10"]["stages"])
        sp10 = sum(r["spill_disk_mb"] for r in per_sf["sf10"]["stages"])
        print(f"\n{name}: wall x{w10 / w1:.2f}  exec x{e10 / max(e1, 1):.2f}"
              f"  gc_frac sf1 {g1 / max(e1, 1):.3f} -> sf10"
              f" {g10 / max(e10, 1):.3f}  sf10 disk spill {sp10} MB",
              file=sys.stderr)

    print(json.dumps(report, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
