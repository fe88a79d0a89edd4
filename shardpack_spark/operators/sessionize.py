"""Batch sessionization operator: assign gap-based session ids to events.

Complements ``F.session_window`` (which aggregates): this keeps one output
row per event with its session sequence number, which downstream feature
pipelines need.  Single shuffle on the by-key; the LAG + running-sum
formulation is the canonical distributed sessionization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from shardpack_spark.timeutil import ts_micros


def sessionize(
    df: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    gap_seconds: int = 1800,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Adds ``session_seq`` (1-based per key) to each row.

    A new session starts when the gap to the previous event is
    >= gap_seconds — the same boundary rule as Spark's session_window
    (window end is exclusive).
    """
    w = Window.partitionBy(by).orderBy(ts, order_tiebreak)
    us = ts_micros(F.col(ts))
    prev = F.lag(us).over(w)
    new_s = F.when(prev.isNull() | (us - prev >= gap_seconds * 1_000_000), 1).otherwise(0)
    run = Window.partitionBy(by).orderBy(ts, order_tiebreak).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return df.withColumn("session_seq", F.sum(new_s).over(run).cast("long"))
