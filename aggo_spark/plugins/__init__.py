"""Plugin-package parity layer.

The reference ships two optional packages beyond the core engine:

- ``@aggo/rxjs`` (``/root/reference/packages/rxjs/src/index.ts``) — push-based
  reactive aggregation over Observables. Re-expressed in ``reactive``:
  a minimal subject/observable pair plus the same four combinators
  (``aggregate``, ``streaming_aggregate``, ``aggregate_collections``,
  ``reactive_aggregation``), and ``observe`` — the bridge that adapts a
  live ``StreamingCollection`` (the engine's real IVM layer) into an
  observable stream.
- ``@aggo/plugin-ai`` (``/root/reference/packages/ai/src``) — natural-language
  → pipeline generation. Re-expressed in ``nlq``: schema-inference prompt
  assembly, strict response parsing/validation against the engine's stage
  registry, and execution — with the LLM call behind a pluggable callable
  (no vendor SDK in this environment; a deterministic rule-based client
  covers tests and offline use).
"""

from .reactive import (
    Observable,
    Subject,
    aggregate,
    aggregate_collections,
    observe,
    reactive_aggregation,
    streaming_aggregate,
)
from .nlq import (
    PipelineGenerationError,
    RuleBasedClient,
    ai_query,
    build_prompt,
    parse_response,
    system_prompt,
    validate_pipeline,
)

__all__ = [
    "Observable", "Subject", "aggregate", "streaming_aggregate",
    "aggregate_collections", "reactive_aggregation", "observe",
    "ai_query", "build_prompt", "system_prompt", "parse_response",
    "validate_pipeline", "RuleBasedClient", "PipelineGenerationError",
]
