"""Batch-equivalent declared checks for the streaming surface (Q25-Q27).

The builders reuse the batch/stream-agnostic transformations in
``shardpack_spark.streaming.ops``; true streaming behavior (micro-batches,
watermark, late data) is exercised in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from shardpack_spark.queries import register
from shardpack_spark.streaming import ops
from shardpack_spark.tables import load_table

_SUM_VALUE = "CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value"


@register(
    "q25_tumbling_window",
    oracle=f"""
    SELECT CAST(FLOOR(epoch(date_trunc('hour', ts))) AS BIGINT) AS bucket_s,
           COUNT(*) AS cnt,
           {_SUM_VALUE}
    FROM events GROUP BY 1
    """,
)
def q25_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window aggregate (Q25)."""
    return ops.tumbling_hour_agg(load_table(spark, sf_dir, "events"))


@register(
    "q26_sliding_window",
    oracle=f"""
    WITH e2 AS (
      SELECT CAST(FLOOR(epoch(ts)) AS BIGINT) AS es, value FROM events
    ), w AS (
      SELECT (es // 1800) * 1800 AS ws, value FROM e2
      UNION ALL
      SELECT (es // 1800) * 1800 - 1800 AS ws, value FROM e2
    )
    SELECT ws AS bucket_s, COUNT(*) AS cnt, {_SUM_VALUE}
    FROM w GROUP BY ws
    """,
)
def q26_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 30 minutes; each event lands in exactly
    two windows, which the oracle enumerates explicitly (Q26)."""
    return ops.sliding_hour_agg(load_table(spark, sf_dir, "events"))


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
    return ops.session_agg(load_table(spark, sf_dir, "events"))
