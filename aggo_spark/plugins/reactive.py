"""Reactive (push-based) aggregation — parity with ``@aggo/rxjs``.

The reference package (``/root/reference/packages/rxjs/src/index.ts:1-278``)
adapts the engine to RxJS: each emission from a source Observable re-runs a
pipeline over the received documents and pushes the result downstream,
deduplicating consecutive identical results (``distinctUntilChanged`` by
JSON). Python has no canonical Observable, so this module ships a minimal
``Subject``/``Observable`` pair with the same contract, plus the same four
combinators.

Semantics notes (mirroring the reference exactly):

- ``aggregate(..., incremental=False)`` processes ONLY the emitted batch;
  ``incremental=True`` accumulates all docs seen so far and recomputes.
- ``streaming_aggregate`` accumulates per-document with a sliding
  ``batch_size`` cap (the reference keeps the LAST batch_size docs).
- results are lists of plain dicts; consecutive duplicates are suppressed
  when ``distinct_only`` (default), compared on canonical JSON.

This is a *driver-side convenience surface* like the CLI: emissions run
through ``aggo_spark.aggregate`` on in-memory rows, so use it for reactive
dashboards / tests on modest data. The 100 TB path for live updates is the
IVM layer (``streaming/core.StreamingCollection`` — signed-measure
incremental aggregation over Structured Streaming); ``observe`` bridges a
live StreamingCollection into an Observable so reactive consumers get true
incremental results instead of recomputes.
"""

from __future__ import annotations

import json
from typing import Callable, Iterable

from pyspark.sql import SparkSession

__all__ = [
    "Observable", "Subject", "aggregate", "streaming_aggregate",
    "aggregate_collections", "reactive_aggregation", "observe",
]


class Observable:
    """Minimal push stream: ``subscribe`` returns an unsubscribe callable."""

    def __init__(self) -> None:
        self._subs: list[Callable] = []

    def subscribe(self, on_next: Callable) -> Callable[[], None]:
        self._subs.append(on_next)

        def off() -> None:
            try:
                self._subs.remove(on_next)
            except ValueError:
                pass  # double-unsubscribe race; already gone

        return off

    def _push(self, value) -> None:
        for cb in list(self._subs):
            cb(value)


class Subject(Observable):
    """An Observable whose producer side is public (`next`)."""

    def next(self, value) -> None:
        self._push(value)

    def next_all(self, values: Iterable) -> None:
        for v in values:
            self.next(v)


def _canon(result: list[dict]) -> str:
    return json.dumps(result, sort_keys=True, default=str)


def _run(docs: list[dict], pipeline: list, spark: SparkSession | None):
    from ..engine import aggregate as _aggregate

    if not docs:
        return []
    out = _aggregate(list(docs), pipeline, spark=spark)
    return [r.asDict(recursive=True) for r in out.collect()]


def _derived(
    source: Observable, transform: Callable[[object], list[dict]],
    distinct_only: bool,
) -> Observable:
    """Derived observable with refcounted teardown: the source subscription
    is taken when the FIRST downstream subscriber arrives and released when
    the LAST one unsubscribes, so an abandoned derived stream costs nothing
    — no Spark job runs per emission once nobody is listening (the
    reference relies on RxJS subscription semantics for the same)."""
    out = Observable()
    last: list[str | None] = [None]
    upstream: list[Callable[[], None] | None] = [None]

    def on_next(value) -> None:
        result = transform(value)
        if distinct_only:
            key = _canon(result)
            if key == last[0]:
                return
            last[0] = key
        out._push(result)

    base_subscribe = out.subscribe

    def subscribe(cb: Callable) -> Callable[[], None]:
        if upstream[0] is None:
            upstream[0] = source.subscribe(on_next)
        off_cb = base_subscribe(cb)

        def off() -> None:
            off_cb()
            if not out._subs and upstream[0] is not None:
                upstream[0]()
                upstream[0] = None

        return off

    out.subscribe = subscribe  # type: ignore[method-assign]
    return out


def aggregate(
    source: Observable, pipeline: list, *,
    incremental: bool = False, distinct_only: bool = True,
    spark: SparkSession | None = None,
) -> Observable:
    """Pipe doc/batch emissions through a pipeline (reference ``aggregate``).

    Each emission may be a single document dict or a list; with
    ``incremental`` the docs accumulate across emissions (recompute
    semantics, like the reference), otherwise each batch stands alone.
    """
    acc: list[dict] = []

    def transform(value):
        docs = value if isinstance(value, list) else [value]
        if incremental:
            acc.extend(docs)
            return _run(acc, pipeline, spark)
        return _run(docs, pipeline, spark)

    return _derived(source, transform, distinct_only)


def streaming_aggregate(
    source: Observable, pipeline: list, *,
    batch_size: int = 1000, distinct_only: bool = True,
    spark: SparkSession | None = None,
) -> Observable:
    """Accumulate single docs with a sliding ``batch_size`` cap and re-run
    the pipeline per document (reference ``streamingAggregate``)."""
    acc: list[dict] = []

    def transform(doc):
        acc.append(doc)
        if len(acc) > batch_size:
            del acc[: len(acc) - batch_size]
        return _run(acc, pipeline, spark)

    return _derived(source, transform, distinct_only)


def aggregate_collections(
    source: Observable, pipeline: list, *,
    distinct_only: bool = True, spark: SparkSession | None = None,
) -> Observable:
    """Each emission is a full collection (list of docs); run the pipeline
    over it (reference ``aggregateCollections``)."""
    return _derived(source, lambda coll: _run(coll, pipeline, spark), distinct_only)


def reactive_aggregation(
    source: Observable, pipeline: list, *, spark: SparkSession | None = None,
) -> Observable:
    """Collection emissions → results with change detection (reference
    ``reactiveAggregation`` — ``aggregate_collections`` with distinct on)."""
    return aggregate_collections(source, pipeline, distinct_only=True, spark=spark)


def observe(collection, pipeline: list, *, rid: str | None = None) -> Observable:
    """Bridge a live ``StreamingCollection`` into an Observable.

    Unlike the recompute-per-emission combinators above, this rides the
    engine's IVM layer: the pipeline is registered on the collection
    (incremental signed-measure aggregation where the plan allows,
    ``streaming/core.py``), and every update event pushes the new result.
    The current result is emitted to each NEW subscriber immediately
    (BehaviorSubject semantics — reactive dashboards want the latest value
    on connect). The returned observable carries a ``dispose()`` method that
    detaches its update callback from the collection — call it when done on
    a long-lived collection; the pipeline registration itself (and its
    maintained result) stays, mirroring the reference where registered
    streams outlive individual consumers.
    """
    import uuid

    reg_id = rid or f"observe-{uuid.uuid4().hex[:8]}"
    current = collection.stream(pipeline, rid=reg_id)

    out = Observable()
    state = {"last": current}

    def on_update(result) -> None:
        state["last"] = result
        out._push(result)

    off_update = collection.on_update(reg_id, on_update)

    original_subscribe = out.subscribe

    def subscribe(on_next: Callable) -> Callable[[], None]:
        off = original_subscribe(on_next)
        on_next(state["last"])
        return off

    out.subscribe = subscribe  # type: ignore[method-assign]
    out.dispose = off_update  # type: ignore[attr-defined]
    return out
