"""Custom stateful streaming operators via applyInPandasWithState.

The engine's relational streaming (signed-measure aggregation, event-time
windows) covers the reference's surface; this module is the extension point
for logic Spark's built-in stateful operators can't express — per-key
custom state machines. The canonical example implemented here: **streaming
gap sessionization** (assign a stable session index per user, sessions
split on inactivity > gap), whose state — (last event time, session
counter) — must persist *across micro-batches* per user.

Scale shape: state lives in Spark's StateStore partitioned by the group
key; each micro-batch shuffles only that batch's rows to their key's
partition and the pandas function sees (key, rows, state) — Arrow-batched,
no driver involvement. This is exactly the shape the reference's
crossfilter IVM state would take on a cluster.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

__all__ = ["sessionize_stream"]


def sessionize_stream(
    sdf: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_ms: int = 1_800_000,
) -> DataFrame:
    """Assign (session_idx, event_in_session) per user on a *streaming*
    DataFrame; sessions split when the inter-event gap exceeds ``gap_ms``.

    State per user: (last_ts_ms, session_idx, n_in_session) — persists in
    the StateStore across micro-batches, so an event arriving many batches
    later continues (or splits) the same user's session correctly.

    Within a micro-batch, rows are processed in event-time order. Late
    events that cross already-seen batch boundaries re-open the current
    session only if within the gap of the *latest* seen event (documented
    simplification; full out-of-order repair needs event buffering +
    watermark, which the relational $setWindowFields path handles in batch).
    """
    out_schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("session_idx", T.LongType()),
        T.StructField("event_in_session", T.LongType()),
    ])
    state_schema = T.StructType([
        T.StructField("last_ts", T.LongType()),
        T.StructField("session_idx", T.LongType()),
        T.StructField("n_in_session", T.LongType()),
    ])

    def fn(key, pdf_iter, state: GroupState):
        (user,) = key
        if state.exists:
            last_ts, session_idx, n_in = state.get
        else:
            last_ts, session_idx, n_in = None, -1, 0
        rows = []
        for pdf in pdf_iter:
            pdf = pdf.sort_values("__ts_ms")
            for ts_ms in pdf["__ts_ms"]:
                ts_ms = int(ts_ms)
                if last_ts is None or ts_ms - last_ts > gap_ms:
                    session_idx += 1
                    n_in = 0
                n_in += 1
                last_ts = max(ts_ms, last_ts or ts_ms)
                rows.append((user, ts_ms, session_idx, n_in))
        state.update((last_ts, session_idx, n_in))
        yield pd.DataFrame(rows, columns=["user_id", "ts_ms", "session_idx",
                                          "event_in_session"])

    from pyspark.sql import functions as F

    prepared = sdf.select(
        F.col(user_col).alias("__user"),
        F.unix_millis(F.col(ts_col).cast("timestamp")).alias("__ts_ms"),
    )
    return prepared.groupBy("__user").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )
