from .core import (
    INVERTIBLE_ACCUMULATORS,
    StreamingCollection,
    materialize_stream,
    pipeline_is_incremental,
    signed_group_rewrite,
)

__all__ = [
    "StreamingCollection",
    "signed_group_rewrite",
    "pipeline_is_incremental",
    "materialize_stream",
    "INVERTIBLE_ACCUMULATORS",
]
