"""Behavioral Structured Streaming tests (not oracle-checkable):
micro-batched file source, watermark late-data drop, stateful dedup,
stream-static join.  Uses availableNow + maxFilesPerTrigger to force
deterministic micro-batch boundaries.
"""

from __future__ import annotations

import json
import os
import time

import pytest

pytestmark = pytest.mark.slow  # heavy family: deselect with -m 'not slow'
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from shardpack_spark.streaming import ops
from shardpack_spark.tables import load_table

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def _write_batch(dirpath: str, name: str, rows: list[dict]) -> None:
    path = os.path.join(dirpath, name)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    # file source picks files up in modification-time order
    ts = time.time()
    os.utime(path, (ts, ts))
    time.sleep(0.05)


def _ev(eid: int, ts: str, uid: int = 1, value: float = 1.0) -> dict:
    return {
        "event_id": eid,
        "ts": ts,
        "user_id": uid,
        "event_type": "click",
        "value": value,
        "props": "{}",
    }


def _run_stream(spark, src_dir: str, transform, mode: str, name: str):
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src_dir)
    )
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"
    return spark.sql(f"SELECT * FROM {name}")


def test_stream_tumbling_matches_batch(spark, sf_dir, tmp_path):
    """The same transformation over readStream == over the static table."""
    events = load_table(spark, sf_dir, "events")
    src = tmp_path / "events_json"
    src.mkdir()
    events.coalesce(1).write.mode("overwrite").json(str(src))

    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
    q = (
        ops.tumbling_hour_agg(ops.with_watermark(stream, "1 day"))
        .writeStream.format("memory")
        .queryName("t_tumbling")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"
    got = {tuple(r) for r in spark.sql("SELECT * FROM t_tumbling").collect()}
    want = {tuple(r) for r in ops.tumbling_hour_agg(events).collect()}
    assert got == want


def test_watermark_drops_late_event(spark, tmp_path):
    """An event arriving after its window closed (behind the watermark) is
    dropped from append-mode output.

    Batch boundaries are made deterministic by draining the stream with a
    checkpoint, then adding the late file and restarting from the same
    checkpoint — the watermark (02:30 - 10min = 02:20) is recovered from
    state, so the 01:10 arrival is behind it.
    """
    src = tmp_path / "late"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def run_once():
        stream = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
        q = (
            ops.tumbling_hour_agg(ops.with_watermark(stream, "10 minutes"))
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not finish in time"

    _write_batch(str(src), "b1.json", [_ev(1, "2024-01-01 01:05:00"), _ev(2, "2024-01-01 02:30:00")])
    run_once()
    # late: window [01:00,02:00) closed once watermark passed 02:20
    _write_batch(str(src), "b2.json", [_ev(3, "2024-01-01 01:10:00"), _ev(4, "2024-01-01 03:30:00")])
    _write_batch(str(src), "b3.json", [_ev(5, "2024-01-01 05:00:00")])
    run_once()

    rows = {r["bucket_s"]: r["cnt"] for r in spark.read.parquet(out_dir).collect()}
    h1 = 1704070800  # 2024-01-01 01:00 UTC
    assert rows.get(h1) == 1, f"late event must be dropped, got {rows}"


def test_dedup_within_watermark(spark, tmp_path):
    src = tmp_path / "dup"
    src.mkdir()
    _write_batch(str(src), "b1.json", [_ev(1, "2024-01-01 01:00:00"), _ev(2, "2024-01-01 01:01:00")])
    _write_batch(str(src), "b2.json", [_ev(1, "2024-01-01 01:02:00"), _ev(3, "2024-01-01 01:03:00")])

    out = _run_stream(
        spark,
        str(src),
        lambda s: ops.dedup_within_watermark(s, "1 hour").select("event_id"),
        "append",
        "t_dedup",
    )
    ids = sorted(r["event_id"] for r in out.collect())
    assert ids == [1, 2, 3]


def test_stream_static_join(spark, sf_dir, tmp_path):
    src = tmp_path / "enrich"
    src.mkdir()
    customer = load_table(spark, sf_dir, "customer")
    some_key = customer.select("c_custkey").head()[0]
    _write_batch(str(src), "b1.json", [_ev(1, "2024-01-01 01:00:00", uid=int(some_key))])

    out = _run_stream(
        spark,
        str(src),
        lambda s: ops.stream_static_enrich(s, customer).select("event_id", "c_mktsegment"),
        "append",
        "t_enrich",
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["c_mktsegment"] is not None


def test_stream_stream_interval_join(spark, tmp_path):
    """Two file-source streams joined on user_id within a 5-minute
    event-time interval: matches inside the interval survive, matches
    outside it don't, and the result equals the same join run in batch."""
    left_dir, right_dir = tmp_path / "ss_left", tmp_path / "ss_right"
    left_dir.mkdir(), right_dir.mkdir()
    _write_batch(
        str(left_dir),
        "l0.json",
        [
            _ev(1, "2024-01-01T01:00:00Z", uid=1),
            _ev(2, "2024-01-01T02:00:00Z", uid=2),
            _ev(3, "2024-01-01T03:00:00Z", uid=3),
        ],
    )
    _write_batch(
        str(right_dir),
        "r0.json",
        [
            _ev(101, "2024-01-01T01:03:00Z", uid=1),  # +3 min: in interval
            _ev(102, "2024-01-01T02:30:00Z", uid=2),  # +30 min: outside
            _ev(103, "2024-01-01T02:59:00Z", uid=3),  # -1 min: before left
        ],
    )

    def streams():
        lf = spark.readStream.schema(EVENT_SCHEMA).json(str(left_dir))
        rf = spark.readStream.schema(EVENT_SCHEMA).json(str(right_dir))
        return lf, rf

    lf, rf = streams()
    q = (
        ops.stream_stream_interval_join(lf, rf, interval="5 minutes")
        .writeStream.format("memory")
        .queryName("ss_join")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"
    got = {
        (r["l_event_id"], r["r_event_id"])
        for r in spark.sql("SELECT * FROM ss_join").collect()
    }
    assert got == {(1, 101)}

    lb = spark.read.schema(EVENT_SCHEMA).json(str(left_dir))
    rb = spark.read.schema(EVENT_SCHEMA).json(str(right_dir))
    want = {
        (r["l_event_id"], r["r_event_id"])
        for r in ops.stream_stream_interval_join(lb, rb, interval="5 minutes").collect()
    }
    assert got == want

    with pytest.raises(ValueError):
        ops.stream_stream_interval_join(lb, rb, how="leftSemi")
