"""Natural-language → pipeline generation — parity with ``@aggo/plugin-ai``.

The reference package (``/root/reference/packages/ai/src/index.ts:84-130``,
``openai-client.ts:63-240``, ``schema-inference.ts:24-56``) wires four steps:
infer a simplified schema from the documents, sample a few rows for context,
prompt an LLM for a ``{"pipeline": [...]}`` JSON object, then validate and
execute the pipeline. This module reproduces that flow with the LLM call
behind a *pluggable callable* — ``client(system_prompt, user_prompt) -> str``
— because this environment has no network or vendor SDK; any OpenAI /
Anthropic / local-model wrapper with that signature slots in unchanged.

Two things are deliberately stricter than the reference:

- ``validate_pipeline`` checks stage names against the engine's actual
  ``STAGES`` registry (the reference only checks "single key starting with
  $"), so a hallucinated stage fails fast at generation time rather than
  execution time.
- ``parse_response`` tolerates code fences and leading prose around the
  JSON object, which real LLM output frequently has even when asked for
  bare JSON.

``RuleBasedClient`` is a deterministic, offline pattern matcher covering the
system prompt's documented "common patterns" (sum/avg/min/max/count by
field, top-N). It exists so the plumbing is testable end-to-end without a
model; it is NOT an NL-understanding replacement.
"""

from __future__ import annotations

import json
import re
import time
from typing import Callable

from pyspark.sql import SparkSession

from ..sources.schema import infer_schema, sample_documents

__all__ = [
    "ai_query", "build_prompt", "system_prompt", "parse_response",
    "validate_pipeline", "RuleBasedClient", "PipelineGenerationError",
]


class PipelineGenerationError(ValueError):
    """LLM response could not be parsed/validated into a pipeline."""


def system_prompt() -> str:
    """System prompt mirroring the reference's guidance + common patterns
    (``openai-client.ts:166-189``)."""
    return (
        "You are an expert MongoDB aggregation pipeline generator. Convert "
        "natural language queries into valid MongoDB aggregation pipelines.\n\n"
        "Guidelines:\n"
        "- Always return valid JSON with a \"pipeline\" field\n"
        "- Field references must use \"$fieldName\" format\n"
        "- Sort uses 1 for ascending, -1 for descending\n"
        "- Be precise with field names from the provided schema\n\n"
        "Common patterns:\n"
        '- "sum X where Y": [{"$match": {...}}, {"$group": {"_id": null, "total": {"$sum": "$X"}}}]\n'
        '- "average X by Y": [{"$group": {"_id": "$Y", "avg": {"$avg": "$X"}}}]\n'
        '- "count records where X": [{"$match": {...}}, {"$count": "total"}]\n'
        '- "top N by X": [{"$sort": {"X": -1}}, {"$limit": N}]'
    )


def build_prompt(
    query: str, schema: dict, samples: list[dict],
    include_explanation: bool = False,
) -> str:
    """User prompt with schema + samples (``openai-client.ts:120-160``)."""
    samples_str = (
        "\n".join(json.dumps(s, default=str) for s in samples)
        if samples else "No sample documents provided"
    )
    explain_req = (
        '\n- Include an "explanation" field describing the pipeline logic'
        if include_explanation else ""
    )
    return (
        "Convert this natural language query into a MongoDB aggregation "
        f'pipeline:\n\nQUERY: "{query}"\n\n'
        f"DATA SCHEMA:\n{json.dumps(schema, indent=2)}\n\n"
        f"SAMPLE DOCUMENTS:\n{samples_str}\n\n"
        "Requirements:\n"
        '- Return ONLY a valid JSON object with a "pipeline" field containing '
        "the MongoDB aggregation pipeline array\n"
        "- The pipeline must be executable against the provided schema\n"
        '- Handle field references correctly (use "$fieldName" syntax)'
        f"{explain_req}"
    )


def parse_response(text: str) -> tuple[list, str | None]:
    """Extract ``(pipeline, explanation)`` from an LLM response.

    Accepts bare JSON, ```json fences, or prose surrounding the first
    top-level JSON object; raises PipelineGenerationError otherwise.
    """
    candidate = text.strip()
    fence = re.search(r"```(?:json)?\s*(.*?)```", candidate, re.DOTALL)
    if fence:
        candidate = fence.group(1).strip()
    decoder = json.JSONDecoder()
    # scan successive '{' positions: prose may contain braces before (or
    # instead of) the real object, so the first decodable dict with a
    # "pipeline" list wins rather than the first brace
    err: Exception | None = None
    pos = candidate.find("{")
    while pos >= 0:
        try:
            parsed, _ = decoder.raw_decode(candidate[pos:])
        except json.JSONDecodeError as exc:
            err = exc
        else:
            if isinstance(parsed, dict) and isinstance(parsed.get("pipeline"), list):
                return parsed["pipeline"], parsed.get("explanation")
            err = PipelineGenerationError('response must contain a "pipeline" array')
        pos = candidate.find("{", pos + 1)
    if err is None:
        raise PipelineGenerationError("no JSON object in response")
    if isinstance(err, PipelineGenerationError):
        raise err
    raise PipelineGenerationError(f"invalid JSON in response: {err}") from err


def validate_pipeline(pipeline: list) -> list:
    """Shape-check a generated pipeline against the engine's stage registry.

    Stricter than the reference's single-key/$-prefix check
    (``openai-client.ts:195-219``): unknown stage names are rejected here,
    before execution.
    """
    from ..operators.stages import STAGES

    if not isinstance(pipeline, list):
        raise PipelineGenerationError("pipeline must be a list")
    for stage in pipeline:
        if not isinstance(stage, dict) or len(stage) != 1:
            raise PipelineGenerationError(
                "each pipeline stage must be an object with exactly one operator"
            )
        (name,) = stage
        if not name.startswith("$"):
            raise PipelineGenerationError(f"stage {name!r} must start with $")
        if name not in STAGES:
            raise PipelineGenerationError(f"unknown stage {name!r}")
    return pipeline


def ai_query(
    documents, query: str, *,
    client: Callable[[str, str], str],
    spark: SparkSession | None = None,
    sample_count: int = 3,
    include_explanation: bool = False,
    execute: bool = True,
) -> dict:
    """NL query → pipeline → results (reference ``aiQuery``,
    ``index.ts:84-130``; same result fields incl. per-step timings).

    ``documents`` is a list of dicts (the reference's only input shape) or a
    DataFrame — with a DataFrame, schema comes from the Catalyst schema
    (``sources/schema.simplified_schema``) and samples from ``limit()``, so
    nothing scans the full data at prompt time.
    """
    from pyspark.sql import DataFrame

    t0 = time.perf_counter()
    if isinstance(documents, DataFrame):
        from ..sources.schema import simplified_schema

        schema = simplified_schema(documents.schema)
        samples = [
            r.asDict(recursive=True) for r in documents.limit(sample_count).collect()
        ]
    else:
        schema = infer_schema(documents)
        samples = sample_documents(documents, sample_count)
    t1 = time.perf_counter()

    response = client(system_prompt(),
                      build_prompt(query, schema, samples, include_explanation))
    pipeline, explanation = parse_response(response)
    validate_pipeline(pipeline)
    t2 = time.perf_counter()

    results = None
    if execute:
        from ..engine import aggregate as _aggregate

        out = _aggregate(documents, pipeline, spark=spark)
        results = [r.asDict(recursive=True) for r in out.collect()]
    t3 = time.perf_counter()

    return {
        "pipeline": pipeline,
        "explanation": explanation,
        "schema": schema,
        "samples": samples,
        "results": results,
        "performance": {
            "schema_inference_ms": round((t1 - t0) * 1000, 3),
            "pipeline_generation_ms": round((t2 - t1) * 1000, 3),
            "execution_ms": round((t3 - t2) * 1000, 3),
            "total_ms": round((t3 - t0) * 1000, 3),
        },
    }


class RuleBasedClient:
    """Deterministic offline ``client`` for tests/demos: recognizes the
    system prompt's documented pattern set over the schema's field names.

    Supported: "<sum|total|average|avg|min|max> <X> by <Y>",
    "count [records] by <Y>", "top <N> by <X>". Raises
    PipelineGenerationError otherwise — it never guesses.
    """

    _AGG = {"sum": "$sum", "total": "$sum", "average": "$avg", "avg": "$avg",
            "min": "$min", "max": "$max"}

    def __call__(self, system: str, user: str) -> str:
        query = re.search(r'QUERY: "(.*?)"', user, re.DOTALL)
        q = (query.group(1) if query else user).lower().strip()

        m = re.match(r"(sum|total|average|avg|min|max)\s+(?:of\s+)?(\w+)\s+by\s+(\w+)", q)
        if m:
            op, x, y = m.groups()
            name = {"$sum": "total", "$avg": "avg", "$min": "min", "$max": "max"}[
                self._AGG[op]]
            return json.dumps({"pipeline": [
                {"$group": {"_id": f"${y}", name: {self._AGG[op]: f"${x}"}}},
                {"$sort": {"_id": 1}},
            ], "explanation": f"group by {y}, {op} of {x}"})

        m = re.match(r"count\s+(?:records\s+)?by\s+(\w+)", q)
        if m:
            y = m.group(1)
            return json.dumps({"pipeline": [
                {"$group": {"_id": f"${y}", "count": {"$sum": 1}}},
                {"$sort": {"_id": 1}},
            ], "explanation": f"count per {y}"})

        m = re.match(r"top\s+(\d+)\s+by\s+(\w+)", q)
        if m:
            n, x = m.groups()
            return json.dumps({"pipeline": [
                {"$sort": {x: -1}}, {"$limit": int(n)},
            ], "explanation": f"top {n} by {x} descending"})

        raise PipelineGenerationError(
            f"RuleBasedClient has no pattern for {q!r} — plug in a real LLM client"
        )
