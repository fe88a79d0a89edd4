"""Custom stateful streaming operators via applyInPandasWithState.

Spark's built-in windows cover time bucketing; arbitrary per-key state
(running counters, custom session payloads) needs the Pandas state API.
State is partitioned by the grouping key, so the operator scales with the
key cardinality across executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("total", DoubleType())]
)


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, value-sum) maintained as keyed state across
    micro-batches — emits the updated totals for keys seen in each batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- transformWithStateInPandas (Spark 4 stateful processor API) ------------

SESSION_TRACK_SCHEMA = (
    "user_id long, n_events long, total_value double, flushed boolean"
)


def _session_tracker_cls():
    """Deferred import/definition so batch-only environments never touch
    the streaming processor API."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    state_schema = StructType(
        [StructField("n", LongType()), StructField("total", DoubleType())]
    )

    class SessionTracker(StatefulProcessor):
        """Per-user running totals with an inactivity flush.

        ValueState keeps (n_events, total_value); every batch re-arms a
        processing-time timer INACTIVITY_MS out.  If the timer fires with
        no new events, the totals are emitted once more with
        flushed=true and the state cleared — the transformWithState
        pattern for 'close out idle keys', which applyInPandasWithState
        could only approximate with per-batch timeout bookkeeping.
        """

        INACTIVITY_MS = 2_000

        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.totals = handle.getValueState("totals", state_schema)
            # expiry of the currently-armed timer: re-arming must DELETE
            # the previous timer, or a stale timer from an earlier batch
            # fires mid-activity and flushes/clears live state early
            self.armed = handle.getValueState(
                "armed", StructType([StructField("t", LongType())])
            )

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, total = (self.totals.get() or (0, 0.0)) if self.totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self.totals.update((n, total))
            if self.armed.exists():
                self.handle.deleteTimer(self.armed.get()[0])
            expiry = timerValues.getCurrentProcessingTimeInMs() + self.INACTIVITY_MS
            self.handle.registerTimer(expiry)
            self.armed.update((expiry,))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total],
                 "flushed": [False]}
            )

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo) -> Iterator[pd.DataFrame]:
            # belt-and-braces: only the CURRENTLY-armed timer may flush
            # (deleteTimer makes stale firings impossible going forward,
            # but a timer armed before this code shipped could survive in
            # a restarted checkpoint's state store)
            armed_t = self.armed.get()[0] if self.armed.exists() else None
            if armed_t is not None and expiredTimerInfo.getExpiryTimeInMs() < armed_t:
                return
            if self.totals.exists():
                n, total = self.totals.get()
                self.totals.clear()
                self.armed.clear()
                yield pd.DataFrame(
                    {"user_id": [key[0]], "n_events": [n], "total_value": [total],
                     "flushed": [True]}
                )

        def close(self) -> None:
            pass

    return SessionTracker


def user_totals_with_inactivity_flush(events: DataFrame) -> DataFrame:
    """Per-user running totals via the Spark 4 transformWithStateInPandas
    processor: ValueState + processing-time timers, RocksDB-backed state.
    Requires spark.sql.streaming.stateStore.providerClass =
    RocksDBStateStoreProvider (set by tests; the default HDFS-backed
    store does not support the processor API) and the `protobuf` package
    (the processor's state server speaks protobuf to the JVM — the test
    skips where it is missing)."""
    cls = _session_tracker_cls()
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=cls(),
        outputStructType=SESSION_TRACK_SCHEMA,
        outputMode="Update",
        timeMode="ProcessingTime",
    )
