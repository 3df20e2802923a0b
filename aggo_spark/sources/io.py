"""Sources & sinks.

The reference reads JSONL from stdin/file (``/root/reference/src/cli.ts:
125-158``) and offers a batched async loader with an error strategy
(``src/aggo/api-enhancements.ts:398+``). Spark supplies every format
natively; these helpers just pin the MongoDB-ish defaults.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jsonl(
    spark: SparkSession,
    path: str,
    *,
    schema=None,
    error_strategy: str = "skip",
    multiline: bool = False,
) -> DataFrame:
    """JSONL reader (reference cli.ts:125-158 semantics: skip bad lines).

    ``error_strategy``: 'skip' → DROPMALFORMED, 'fail' → FAILFAST,
    'keep' → PERMISSIVE (bad line lands in _corrupt_record), matching the
    fromJSONL error strategies (api-enhancements.ts:90-113).
    """
    mode = {"skip": "DROPMALFORMED", "fail": "FAILFAST", "keep": "PERMISSIVE"}[error_strategy]
    reader = spark.read.option("mode", mode).option("multiLine", multiline)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_jsonl(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    """JSONL sink (reference cli.ts:160-166)."""
    df.write.mode(mode).json(path)


def _enable_nanos(spark: SparkSession) -> None:
    # Test/bench parquet carries TIMESTAMP(NANOS) which Spark rejects by
    # default; with this conf Spark 4 reads it as TIMESTAMP_NTZ (micros),
    # byte-identical to what DuckDB produces for the same files.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    _enable_nanos(spark)
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    """Load the driver's TPC-H-ish parquet tables from ``sf_dir``."""
    _enable_nanos(spark)
    names = names or [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}
