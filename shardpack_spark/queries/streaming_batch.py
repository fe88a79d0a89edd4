"""Batch-equivalent declared checks for the streaming surface (Q25-Q27).

The builders reuse the batch/stream-agnostic transformations in
``shardpack_spark.streaming.ops``; true streaming behavior (micro-batches,
watermark, late data) is exercised in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from shardpack_spark.operators.skew import spread_if_narrow
from shardpack_spark.queries import register
from shardpack_spark.streaming import ops
from shardpack_spark.tables import load_table

_SUM_VALUE = "CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value"


@register(
    "q25_time_windows",
    oracle=f"""
    SELECT 'tumble' AS variant,
           CAST(FLOOR(epoch(date_trunc('hour', ts))) AS BIGINT) AS bucket_s,
           COUNT(*) AS cnt,
           {_SUM_VALUE}
    FROM events GROUP BY 2
    UNION ALL
    SELECT 'slide' AS variant, ws AS bucket_s, COUNT(*) AS cnt, {_SUM_VALUE}
    FROM (
      SELECT (es // 1800) * 1800 AS ws, value
      FROM (SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS es, value FROM events)
      UNION ALL
      SELECT (es // 1800) * 1800 - 1800 AS ws, value
      FROM (SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS es, value FROM events)
    ) GROUP BY ws
    """,
)
def q25_time_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window + 1-hour/30-min sliding window aggregates,
    tagged and unioned (Q25 + Q26).  The sliding oracle enumerates the
    exactly-two windows each event lands in.

    One aggregation serves BOTH legs (r9): with epoch-aligned windows,
    the 1-hour tumbling bucket starting at h is exactly the 1h/30min
    sliding window starting at h — every event's hour-floor is one of
    its two slide starts — so the tumble rows are the slide rows whose
    bucket is on the hour, with identical cnt and (order-insensitive
    exact decimal) sum.  The old union ran a second full scan + shuffle
    of events to recompute that subset."""
    from pyspark.sql import functions as F

    slide = ops.sliding_hour_agg(load_table(spark, sf_dir, "events"))
    return slide.select(
        F.explode(
            F.when(
                F.col("bucket_s") % 3600 == 0,
                F.array(F.lit("tumble"), F.lit("slide")),
            ).otherwise(F.array(F.lit("slide")))
        ).alias("variant"),
        "bucket_s",
        "cnt",
        "sum_value",
    )


@register(
    "q27_session_window",
    oracle="""
    WITH x AS (
      SELECT user_id, epoch_us(ts) AS us,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM events
    ), marked AS (
      SELECT user_id, us,
             CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000 THEN 1 ELSE 0 END AS new_s
      FROM x
    ), sessions AS (
      SELECT user_id, us,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY us
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked
    ), agg AS (
      SELECT user_id, sid, MAX(us) - MIN(us) + 1800000000 AS len_us
      FROM sessions GROUP BY user_id, sid
    )
    SELECT user_id, COUNT(*) AS n_sessions, CAST(MAX(len_us) AS BIGINT) AS max_len_us
    FROM agg GROUP BY user_id
    """,
)
def q27_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min-gap session windows per user: session count + longest session
    (integer microseconds); the oracle sessionizes via LAG + running sum
    with the same >= gap boundary rule (Q27)."""
    # spread the session-merge stage: AQE coalesces the ~2 MB shuffle to
    # one task and serializes the per-user sort+merge (measured 0.3 s);
    # pinning the user_id exchange to the core count keeps it parallel —
    # the session-window agg's required clustering on user_id is
    # satisfied, so the plan still has one data shuffle.  Done here, not
    # in ops.session_agg, which also serves streaming plans.  r10: the
    # pin fires only when the input is under-parallelized (single-split
    # fixtures); a many-split real input leaves the exchange to AQE.
    events = spread_if_narrow(load_table(spark, sf_dir, "events"), "user_id")
    return ops.session_agg(events)
