"""Adaptive delta batching for ``StreamingCollection`` mutations — the
engine's analogue of the reference's streaming delta optimizer
(``src/aggo/streaming-delta-optimizer.ts:118-408``: ring-buffered delta
queue, multi-factor adaptive batch sizing, batch-grouped event emission,
performance metrics).

Why the Spark shape differs: the reference amortizes per-delta JS
callback overhead; here every flush is a Structured Streaming
micro-batch (``processAllAvailable``) whose cost is dominated by a FIXED
per-trigger overhead (tens of ms locally) that is nearly independent of
row count. Coalescing K mutations into one spool file + one trigger is
therefore a ~K× win on mutation-heavy workloads, and the adaptive part
tunes K against three measured factors, mirroring the reference's
heuristic structure:

- ``latency_high`` — a flush exceeded its latency budget: shrink the
  batch target (×0.7, floor ``min_batch``) so individual triggers stay
  responsive (reference: P99 > 5 ms → ×0.7).
- ``queue_pressure`` — the pending buffer is >80% full: grow (×1.5) to
  drain faster (reference: identical rule).
- ``throughput_low`` — measured delta throughput over the trailing
  window is below 90% of target while flushes are inside the budget:
  grow (×1.3, cap ``max_batch``) to amortize the fixed trigger cost
  (reference: identical rule, inverted mechanism — it grew to amortize
  callback dispatch).

The policy object is pure Python driver-side METADATA (counts and
timestamps only — documents never pass through it), deterministic given
the same measurement sequence, and unit-testable without Spark.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


@dataclass
class AdaptiveBatchPolicy:
    """Multi-factor adaptive batch-size controller.

    The owner feeds it ``record_enqueue()`` per buffered mutation and
    ``record_flush(n_deltas, flush_sec)`` per drain; ``batch_size`` is
    the current coalescing target and ``should_flush(pending, age_sec)``
    the trigger decision (size target reached, deadline passed, or
    buffer full — the reference's ``shouldTriggerImmediateProcessing``
    plus its enqueue-failure backpressure path, which here forces a
    synchronous drain instead of dropping the delta)."""

    min_batch: int = 8
    max_batch: int = 512
    batch_size: int = 32
    max_pending: int = 2048
    max_delay_sec: float = 0.25       # maxBatchDelayMs analogue
    latency_budget_sec: float = 0.75  # per-flush budget (local trigger ~0.1s)
    target_throughput: float = 10_000.0  # deltas/sec through the spool
    window_sec: float = 5.0           # trailing throughput window

    total_deltas: int = 0
    total_flushes: int = 0
    last_flush_sec: float = 0.0
    last_reason: str = "stable"
    _window: list = field(default_factory=list)  # (monotonic_ts, n_deltas)
    _latencies: list = field(default_factory=list)  # recent per-flush secs

    def record_enqueue(self, n: int = 1) -> None:
        self.total_deltas += n

    def should_flush(self, pending: int, age_sec: float) -> bool:
        if pending <= 0:
            return False
        # backpressure first: with batch_size <= max_pending (the normal
        # configuration) the size branch would shadow it into dead code;
        # checked first it stays the binding bound whenever a user
        # configures max_pending below the batch target
        if pending >= self.max_pending:
            return True  # drain, never drop
        if pending >= self.batch_size:
            return True
        return age_sec >= self.max_delay_sec

    def record_flush(self, n_deltas: int, flush_sec: float,
                     pending_after: int = 0,
                     now: float | None = None) -> str:
        """Update measurements and adapt ``batch_size``; returns the
        adjustment reason (mirrors the reference's debug categories)."""
        now = time.monotonic() if now is None else now
        self.total_flushes += 1
        self.last_flush_sec = flush_sec
        self._latencies.append(flush_sec)
        del self._latencies[:-100]
        self._window.append((now, n_deltas))
        self._window = [(t, n) for t, n in self._window
                        if now - t < self.window_sec]

        pressure = pending_after / self.max_pending
        latency_ok = flush_sec <= self.latency_budget_sec
        tp = self.throughput(now)
        throughput_ok = tp >= self.target_throughput * 0.9

        factor, reason = 1.0, "stable"
        if not latency_ok and self.batch_size > self.min_batch:
            factor, reason = 0.7, "latency_high"
        elif pressure > 0.8 and latency_ok:
            factor, reason = 1.5, "queue_pressure"
        elif not throughput_ok and latency_ok and self.batch_size < self.max_batch:
            factor, reason = 1.3, "throughput_low"
        self.batch_size = max(self.min_batch,
                              min(self.max_batch,
                                  round(self.batch_size * factor)))
        self.last_reason = reason
        return reason

    def throughput(self, now: float | None = None) -> float:
        """Deltas/sec over the trailing window (0.0 until two flushes)."""
        now = time.monotonic() if now is None else now
        window = [(t, n) for t, n in self._window if now - t < self.window_sec]
        if len(window) < 2:
            return 0.0
        span = now - window[0][0]
        return sum(n for _, n in window) / span if span > 0 else 0.0

    def metrics(self) -> dict:
        """The reference's ``DeltaMetrics`` surface (getMetrics())."""
        lats = sorted(self._latencies)
        return {
            "total_deltas": self.total_deltas,
            "total_flushes": self.total_flushes,
            "throughput_deltas_per_sec": self.throughput(),
            "avg_batch_size": (self.total_deltas / self.total_flushes
                               if self.total_flushes else 0.0),
            "p99_flush_sec": (lats[min(len(lats) - 1,
                                       int(len(lats) * 0.99))]
                              if lats else 0.0),
            "adaptive_batch_size": self.batch_size,
            "last_reason": self.last_reason,
        }
