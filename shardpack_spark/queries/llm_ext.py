"""Additional pipeline operators: time-bucketed rollups (hypertable-style
continuous aggregates) and per-event sessionization (Q54, Q56).
The word n-gram Jaccard check (formerly q55) lives on as q29_fuzzy_dedup's
'word3' variant."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shardpack_spark.operators import dedup
from shardpack_spark.operators.sessionize import sessionize
from shardpack_spark.queries import register
from shardpack_spark.queries.canon import dec, money2, round4d
from shardpack_spark.tables import load_table


@register(
    "q54_hypertable_rollup",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
           COUNT(*) AS cnt,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
    FROM events GROUP BY 1, 2
    """,
)
def q54_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style daily rollup per event type — the materialization
    a continuous aggregate would maintain incrementally (Q54)."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        money2(F.sum(dec("value"))).alias("sum_value"),
        F.countDistinct("user_id").alias("users"),
    )


@register(
    "q56_sessionize",
    oracle="""
    WITH x AS (
      SELECT event_id, user_id, ts, epoch_us(ts) AS us,
             LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM events
    )
    SELECT event_id, user_id,
           CAST(SUM(CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000
                         THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
    FROM x
    """,
)
def q56_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event session sequence numbers (30-min gap) via the sessionize
    library operator (Q56)."""
    e = load_table(spark, sf_dir, "events")
    return sessionize(e, gap_seconds=1800).select("event_id", "user_id", "session_seq")
