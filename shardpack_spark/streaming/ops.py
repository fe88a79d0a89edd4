"""Batch/stream-agnostic windowed transformations over the events schema.

Each builder takes any events-shaped DataFrame (static or streaming) and
returns the transformed DataFrame; Structured Streaming semantics
(watermarks, output modes) are layered on in the streaming entry points.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shardpack_spark.queries.canon import dec, money2
from shardpack_spark.timeutil import ts_micros, ts_seconds

GAP_SECONDS = 30 * 60


def tumbling_hour_agg(events: DataFrame) -> DataFrame:
    """1-hour tumbling windows: count + exact-decimal value sum (Q25)."""
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"), money2(F.sum(dec("value"))).alias("sum_value"))
        .select(ts_seconds(F.col("w.start")).alias("bucket_s"), "cnt", "sum_value")
    )


def sliding_hour_agg(events: DataFrame) -> DataFrame:
    """1-hour windows sliding every 30 minutes (Q26)."""
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"), money2(F.sum(dec("value"))).alias("sum_value"))
        .select(ts_seconds(F.col("w.start")).alias("bucket_s"), "cnt", "sum_value")
    )


def session_agg(events: DataFrame) -> DataFrame:
    """30-minute-gap session windows per user (Q27).

    Spark merges an event into the current session iff its event time is
    strictly before the session end (last_ts + gap); session end is
    last_ts + gap, so session length = (last_ts - first_ts) + gap.
    Output is exact integer microseconds to avoid float boundaries.
    """
    sw = F.session_window("ts", f"{GAP_SECONDS} seconds")
    per_session = events.groupBy("user_id", sw.alias("w")).agg(F.count(F.lit(1)).alias("n_events"))
    return (
        per_session.withColumn(
            "len_us", ts_micros(F.col("w.end")) - ts_micros(F.col("w.start"))
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"), F.max("len_us").alias("max_len_us"))
    )


def with_watermark(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    return events.withWatermark("ts", delay)


def dedup_within_watermark(events: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """Stateful streaming dedup on event_id with bounded state."""
    return events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(["event_id"])


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_wm: str = "10 minutes",
    right_wm: str = "10 minutes",
    interval: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join on `key` within an event-time interval.

    Both sides carry watermarks, and the join condition bounds right.ts
    to [left.ts, left.ts + interval] — together these let Spark expire
    buffered state on BOTH sides (unbounded stream-stream joins would
    otherwise accumulate state forever).  Outer variants additionally
    need the watermark to know when an unmatched row can be emitted,
    which is why `how` is restricted to the types Spark supports for
    stream-stream ('inner', 'leftOuter', 'rightOuter', 'fullOuter').

    Column layout: left columns prefixed `l_`, right prefixed `r_`, so
    the two event schemas never collide.
    """
    allowed = {"inner", "leftOuter", "rightOuter", "fullOuter"}
    if how not in allowed:
        raise ValueError(f"stream-stream join type must be one of {sorted(allowed)}")
    l = left.withWatermark("ts", left_wm).select(
        *[F.col(c).alias(f"l_{c}") for c in left.columns]
    )
    r = right.withWatermark("ts", right_wm).select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns]
    )
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {interval}"))
    )
    return l.join(r, cond, how)


def stream_static_enrich(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream-static join: enrich events with the customer dimension.

    The static side is broadcast — on a cluster this avoids per-microbatch
    shuffles of the stream side.
    """
    return events.join(
        F.broadcast(customer.select("c_custkey", "c_mktsegment")),
        events.user_id == F.col("c_custkey"),
        "left",
    ).drop("c_custkey")
