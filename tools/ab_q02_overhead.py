"""A/B: q02 wall floor at sf0.1 vs cached-partition count / AQE / pure-job overhead."""
import os, sys, time
os.environ["AGGO_SPARK_CACHE_TABLES"] = "0"  # we cache manually
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
from pyspark import StorageLevel

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .appName("ab_q02")
         .config("spark.sql.shuffle.partitions", cpus)
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.driver.memory", "24g")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from aggo_spark.sources.io import _restore_nanos, _enable_nanos
_enable_nanos(spark)
path = "/root/testdata/sf0.1/lineitem.parquet"
base = _restore_nanos(spark.read.parquet(path), path)

def q02(df):
    return (df.filter((F.col("l_returnflag") == "R")
                      & (F.col("l_quantity") >= 30)
                      & (F.col("l_discount") < 0.05))
            .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"))

def bench(df, n=10):
    ts = []
    for _ in range(n):
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        ts.append(time.time() - t0)
    return min(ts), sorted(ts)[len(ts)//2]

# pure job overhead floor: 1-partition empty-ish job
r1 = spark.range(0, 32, 1, 1)
r1.write.format("noop").mode("overwrite").save()
print("pure_job_1part", bench(r1))
r32 = spark.range(0, 32, 1, 32)
print("pure_job_32part", bench(r32))

for nparts in (32, 8, 4, 1):
    c = base.repartition(nparts).persist(StorageLevel.MEMORY_ONLY)
    c.write.format("noop").mode("overwrite").save()  # materialize
    plan = q02(c)
    plan.write.format("noop").mode("overwrite").save()  # codegen warm
    print(f"q02_cached_{nparts}parts", bench(plan))
    c.unpersist()

# AQE off comparison at 32
spark.conf.set("spark.sql.adaptive.enabled", "false")
c = base.repartition(32).persist(StorageLevel.MEMORY_ONLY)
c.write.format("noop").mode("overwrite").save()
plan = q02(c)
plan.write.format("noop").mode("overwrite").save()
print("q02_cached_32parts_noAQE", bench(plan))
c.unpersist()
