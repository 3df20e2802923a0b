"""aggo-spark — a PySpark-native MongoDB-aggregation-pipeline engine.

Same query surface as TomNeyland/aggo (see SURVEY.md), compiled to Spark
DataFrame/Catalyst plans: ``aggregate(df, pipeline)`` returns a lazy
DataFrame; Spark supplies optimization, columnar execution, shuffle, and
streaming.
"""

from .engine import (
    Engine,
    add_fields,
    aggregate,
    aggregate_streaming,
    benchmark,
    create_streaming_collection,
    count,
    expression,
    group,
    limit,
    lookup,
    match,
    project,
    set_fields,
    skip,
    sort,
    unwind,
)
from .errors import (
    AggoSparkError,
    InvalidPipeline,
    UnknownCollection,
    UnsupportedExpression,
    UnsupportedStage,
)
from .session import build_session
from .sources.io import (
    load_tables,
    read_jsonl,
    read_jsonl_stream,
    read_parquet,
    read_parquet_stream,
    write_jsonl,
)
from .sources.schema import infer_schema, sample_documents, simplified_schema
from .streaming import StreamingCollection

__version__ = "0.1.0"

__all__ = [
    "Engine",
    "aggregate",
    "match",
    "project",
    "group",
    "sort",
    "unwind",
    "limit",
    "skip",
    "lookup",
    "add_fields",
    "set_fields",
    "count",
    "expression",
    "benchmark",
    "aggregate_streaming",
    "create_streaming_collection",
    "build_session",
    "read_jsonl",
    "read_jsonl_stream",
    "read_parquet",
    "read_parquet_stream",
    "write_jsonl",
    "load_tables",
    "infer_schema",
    "simplified_schema",
    "sample_documents",
    "StreamingCollection",
    "AggoSparkError",
    "InvalidPipeline",
    "UnknownCollection",
    "UnsupportedExpression",
    "UnsupportedStage",
]
