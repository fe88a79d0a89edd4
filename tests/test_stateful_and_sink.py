"""applyInPandasWithState custom operator + shardpack streaming sink."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F

from shardpack_spark.format import codec
from shardpack_spark.format.datasource import register
from shardpack_spark.streaming.stateful import running_user_totals
from tests.test_streaming import EVENT_SCHEMA, _ev, _write_batch

import pytest

pytestmark = pytest.mark.slow  # heavy family: deselect with -m 'not slow'


def test_apply_in_pandas_with_state(spark, tmp_path):
    """State carries across micro-batches: totals accumulate per user."""
    src = tmp_path / "state_src"
    src.mkdir()
    _write_batch(str(src), "b1.json", [_ev(1, "2024-01-01 01:00:00", uid=1, value=1.0),
                                       _ev(2, "2024-01-01 01:01:00", uid=2, value=5.0)])
    _write_batch(str(src), "b2.json", [_ev(3, "2024-01-01 01:02:00", uid=1, value=2.0)])

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"
    rows = spark.sql("SELECT * FROM t_state").collect()
    # last emission per user wins (update mode re-emits on change)
    final = {}
    for r in rows:
        final[r["user_id"]] = (r["n_events"], r["total_value"])
    assert final[1] == (2, 3.0)
    assert final[2] == (1, 5.0)


def test_shardpack_streaming_sink(spark, tmp_path):
    """writeStream.format('shardpack'): rows land in shards + batch markers."""
    register(spark)
    src = tmp_path / "sink_src"
    src.mkdir()
    _write_batch(str(src), "b1.json", [_ev(1, "2024-01-01 01:00:00"), _ev(2, "2024-01-01 01:01:00")])

    out = str(tmp_path / "sink_out")
    os.makedirs(out)
    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
    rows = stream.select(
        F.concat(F.lit("ev/"), F.col("event_id").cast("string")).alias("key"),
        F.create_map(F.lit("type"), F.col("event_type")).alias("metadata"),
        F.array(
            F.struct(
                F.lit("event.json").alias("file_name"),
                F.lit("application/json").alias("content_type"),
                F.lit("none").alias("encoding"),
                F.length(F.col("props")).cast("long").alias("size"),
                F.encode("props", "utf-8").alias("data"),
            )
        ).alias("entries"),
    )
    q = (
        rows.writeStream.format("shardpack")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"

    keys = {r.key for p in codec.list_shards(out) for r in codec.iter_records(p)}
    assert keys == {"ev/1", "ev/2"}
    markers = glob.glob(os.path.join(out, "_batch_*.json"))
    assert markers, "commit marker must exist"
    m = json.load(open(markers[0]))
    assert sum(s["records"] for s in m["shards"]) == 2


def test_transform_with_state_inactivity_flush(spark, tmp_path):
    """Spark 4 transformWithStateInPandas: ValueState accumulates across
    batches, and an expired processing-time timer flushes + clears the
    idle key's state."""
    import time

    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip(
            "transformWithStateInPandas drives its state server over "
            "protobuf, which this environment lacks"
        )

    from shardpack_spark.streaming.stateful import (
        user_totals_with_inactivity_flush,
    )

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src = tmp_path / "tws_src"
        src.mkdir()
        ckpt = str(tmp_path / "tws_ckpt")

        def drain():
            stream = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
            q = (
                user_totals_with_inactivity_flush(stream)
                .writeStream.format("memory")
                .queryName("t_tws")
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(120), "stream did not finish in time"

        _write_batch(str(src), "b1.json",
                     [_ev(1, "2024-01-01 01:00:00", uid=1, value=1.0),
                      _ev(2, "2024-01-01 01:01:00", uid=1, value=2.0)])
        drain()
        live = spark.sql("SELECT * FROM t_tws WHERE NOT flushed").collect()
        assert {(r["user_id"], r["n_events"], r["total_value"]) for r in live} == {(1, 2, 3.0)}

        # let user 1's inactivity timer expire, then trigger a batch with
        # a different user's data — the expired timer must flush user 1
        time.sleep(2.5)
        _write_batch(str(src), "b2.json",
                     [_ev(3, "2024-01-01 01:05:00", uid=2, value=7.0)])
        drain()
        flushed = spark.sql("SELECT * FROM t_tws WHERE flushed").collect()
        assert {(r["user_id"], r["n_events"], r["total_value"]) for r in flushed} == {(1, 2, 3.0)}
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_session_tracker_rearm_deletes_stale_timer():
    """Unit-level check of the SessionTracker timer protocol with fake
    state/handle objects (no real clock, so no flaky sleeps): re-arming
    on new input DELETES the previously registered timer — otherwise a
    stale timer from an earlier batch fires mid-activity and flushes +
    clears live state prematurely — and an expired timer older than the
    armed one is ignored."""
    import pandas as pd

    from shardpack_spark.streaming.stateful import _session_tracker_cls

    class FakeState:
        def __init__(self):
            self.v = None
        def exists(self):
            return self.v is not None
        def get(self):
            return self.v
        def update(self, v):
            self.v = tuple(v)
        def clear(self):
            self.v = None

    class FakeHandle:
        def __init__(self):
            self.states = {}
            self.registered = []
            self.deleted = []
        def getValueState(self, name, schema):
            return self.states.setdefault(name, FakeState())
        def registerTimer(self, t):
            self.registered.append(t)
        def deleteTimer(self, t):
            self.deleted.append(t)

    class FakeTimerValues:
        def __init__(self, now):
            self._now = now
        def getCurrentProcessingTimeInMs(self):
            return self._now

    class FakeExpiredInfo:
        def __init__(self, t):
            self._t = t
        def getExpiryTimeInMs(self):
            return self._t

    tracker = _session_tracker_cls()()
    h = FakeHandle()
    tracker.init(h)
    ia = tracker.INACTIVITY_MS

    def feed(now, values):
        return list(
            tracker.handleInputRows(
                (1,), iter([pd.DataFrame({"value": values})]), FakeTimerValues(now)
            )
        )

    out1 = feed(1000, [1.0, 2.0])
    assert h.registered == [1000 + ia] and h.deleted == []
    assert out1[0]["n_events"][0] == 2

    # activity again before the first timer expires: old timer deleted
    out2 = feed(1500, [4.0])
    assert h.deleted == [1000 + ia]
    assert h.registered == [1000 + ia, 1500 + ia]
    assert out2[0]["total_value"][0] == 7.0

    # a stale pre-fix timer surviving in a restarted checkpoint: ignored
    stale = list(
        tracker.handleExpiredTimer((1,), FakeTimerValues(1000 + ia), FakeExpiredInfo(1000 + ia))
    )
    assert stale == []
    assert h.states["totals"].exists()  # live state NOT cleared

    # the armed timer fires: flush + clear
    fired = list(
        tracker.handleExpiredTimer((1,), FakeTimerValues(1500 + ia), FakeExpiredInfo(1500 + ia))
    )
    assert fired[0]["flushed"][0] and fired[0]["n_events"][0] == 3
    assert not h.states["totals"].exists() and not h.states["armed"].exists()
