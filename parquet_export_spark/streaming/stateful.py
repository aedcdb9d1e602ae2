"""Custom stateful streaming operator (SURVEY.md §2B.9 — the
``applyInPandasWithState`` path for semantics the built-in windowed
aggregations can't express).

``running_user_totals``: per-user lifetime counters maintained across
micro-batches — count, exact-decimal value total (as int micros to
stay lossless in state), and last-seen event time. The built-in
aggregations recompute per window; this keeps O(users) state forever
with explicit timeout control — the canonical custom-operator shape
(dedupe-by-key, rate limiting, CDC merge all reduce to it).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

STATE_SCHEMA = "n_events LONG, value_micros LONG, last_ts_micros LONG"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts_micros", T.LongType()),
    ]
)


def _update_user(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, value_micros, last_ts = state.get if state.exists else (0, 0, 0)
    for pdf in pdfs:
        n += len(pdf)
        # exact integer accumulation, rounded PER ROW: batch-boundary
        # placement then cannot change the total (no float drift)
        value_micros += int(
            pdf["value"].mul(1_000_000).round().astype("int64").sum()
        )
        ts_micros = (pdf["ts"].astype("int64") // 1000).max()
        last_ts = max(last_ts, int(ts_micros))
    state.update((n, value_micros, last_ts))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [value_micros / 1_000_000],
            "last_ts_micros": [last_ts],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """events stream -> per-user lifetime totals, one row per user per
    micro-batch (update mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 typed-state API)
# --------------------------------------------------------------------------

TYPE_COUNT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)


def user_event_type_counts(events: DataFrame) -> DataFrame:
    """events stream -> per-(user, event_type) lifetime counts via
    ``transformWithStateInPandas`` — the Spark 4 typed-state API.

    Demonstrates what ``applyInPandasWithState`` (above) can't express
    directly: composite per-key state. ``MapState`` keeps one counter
    per event type under each user key, updated incrementally — state
    size is O(users x event_types), never proportional to the stream.
    Each micro-batch emits the updated (user, type) rows (update mode).

    Runtime requirements (plan construction needs neither): the
    RocksDB state store (``spark.sql.streaming.stateStore.providerClass``
    = ``...state.RocksDBStateStoreProvider``) — transformWithState's
    typed-state backend — and the ``protobuf`` package (the typed-state
    server protocol). Both are standard on real clusters; the test
    suite gates the execution test on their presence.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TypeCounts(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._counts = handle.getMapState(
                "type_counts", "event_type string", "n long"
            )

        def handleInputRows(self, key, rows, timerValues):
            (user_id,) = key
            batch_counts: dict[str, int] = {}
            for pdf in rows:
                for etype, n in pdf["event_type"].value_counts().items():
                    batch_counts[etype] = batch_counts.get(etype, 0) + int(n)
            out = []
            for etype, n in sorted(batch_counts.items()):
                k = (etype,)
                prev = self._counts.getValue(k)[0] if self._counts.containsKey(k) else 0
                total = prev + n
                self._counts.updateValue(k, (total,))
                out.append((user_id, etype, total))
            yield pd.DataFrame(out, columns=["user_id", "event_type", "n"])

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        TypeCounts(),
        outputStructType=TYPE_COUNT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
