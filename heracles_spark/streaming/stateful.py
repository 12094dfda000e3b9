"""Custom stateful streaming operators via applyInPandasWithState —
the escape hatch for semantics windowed aggregation can't express
(per-key running state with custom merge/timeout logic).

``running_user_stats``: per-user event counter + value accumulator that
survives across micro-batches; state times out after ``timeout_ms`` of
processing-time inactivity, emitting nothing further for that key
(bounded state — the scale requirement for unbounded keyspaces).

``streaming_exact_dedup``: first-occurrence-wins dedup within a
watermark window via dropDuplicatesWithinWatermark — the streaming twin
of operators.dedup.exact_dedup (state bounded by the watermark).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATS_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType(), False),
    T.StructField("n_events", T.LongType(), False),
    T.StructField("total_value", T.DoubleType(), True),
])

STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType(), False),
    T.StructField("total", T.DoubleType(), False),
])


def _update_user_stats(key: Tuple[Any], pdfs: Iterator[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    try:
        state.setTimeoutDuration(60 * 60 * 1000)
    except Exception:
        pass   # NoTimeout runs reject timeout registration
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n],
                        "total_value": [total]})


def running_user_stats(events: DataFrame,
                       user_col: str = "user_id",
                       timeout: str | None = "processing") -> DataFrame:
    """Arbitrary stateful per-key aggregation over a stream: counts and
    value totals carried across micro-batches, processing-time timeout
    for state cleanup. Input needs columns (user_id, value).

    ``timeout=None`` disables state timeouts — REQUIRED for finite
    availableNow runs: registered processing-time timeouts keep
    scheduling (empty) micro-batches after the data is exhausted, so
    the query never quiesces and processAllAvailable spins."""
    conf = (GroupStateTimeout.ProcessingTimeTimeout
            if timeout == "processing" else GroupStateTimeout.NoTimeout)
    return (events
            .groupBy(user_col)
            .applyInPandasWithState(
                _update_user_stats,
                outputStructType=STATS_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=conf))


def streaming_exact_dedup(events: DataFrame, id_cols: list[str],
                          ts_col: str = "ts",
                          watermark: str = "1 hour") -> DataFrame:
    """Streaming dedup: keep the first occurrence of each id within the
    watermark horizon; state evicts with the watermark (never unbounded)."""
    return (events
            .withWatermark(ts_col, watermark)
            .dropDuplicatesWithinWatermark(id_cols))
