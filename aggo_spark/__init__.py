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
    load_bucketed,
    load_tables,
    read_jsonl,
    read_jsonl_stream,
    read_parquet,
    read_parquet_stream,
    save_bucketed,
    write_jsonl,
)
from .sources.schema import infer_schema, sample_documents, simplified_schema
from .streaming import StreamingCollection

# search diagnostics / auto-strategy surface — top-level exports for parity
# with the reference package root (/root/reference/src/index.ts:457-489)
from .operators.search import (
    clear_regex_search_index,
    clear_text_search_index,
    enhanced_regex_match,
    enhanced_text_search,
)
from .operators.search_diag import (
    analyze_regex_pattern,
    configure_regex_search,
    configure_text_search,
    extract_literals_from_regex,
    extract_tokens,
    extract_trigrams,
    get_regex_search_stats,
    get_text_search_stats,
    reset_regex_search_stats,
    reset_text_search_stats,
)

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
    "save_bucketed",
    "load_bucketed",
    "infer_schema",
    "simplified_schema",
    "sample_documents",
    "StreamingCollection",
    "AggoSparkError",
    "InvalidPipeline",
    "UnknownCollection",
    "UnsupportedExpression",
    "UnsupportedStage",
    # search diagnostics / auto-strategy (reference index.ts:457-489)
    "enhanced_text_search",
    "enhanced_regex_match",
    "clear_text_search_index",
    "clear_regex_search_index",
    "configure_text_search",
    "configure_regex_search",
    "get_text_search_stats",
    "get_regex_search_stats",
    "reset_text_search_stats",
    "reset_regex_search_stats",
    "analyze_regex_pattern",
    "extract_tokens",
    "extract_trigrams",
    "extract_literals_from_regex",
]
