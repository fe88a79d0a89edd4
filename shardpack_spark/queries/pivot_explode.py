"""Pivot and lateral/explode surface (Q57-Q58)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shardpack_spark.queries import register
from shardpack_spark.queries.canon import dec, money2
from shardpack_spark.tables import load_table

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "q57_pivot",
    oracle="""
    SELECT user_id,
    """
    + ",\n    ".join(
        f"CAST(ROUND(SUM(CASE WHEN event_type = '{t}' THEN CAST(value AS DECIMAL(18,4)) "
        f"ELSE CAST(0 AS DECIMAL(18,4)) END), 2) AS DOUBLE) AS {t}"
        for t in _EVENT_TYPES
    )
    + """
    FROM events GROUP BY user_id
    """,
)
def q57_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type into per-type value-sum columns (Q57).

    Spark's pivot with explicit values (no extra distinct pass); the
    oracle is the equivalent conditional aggregation.
    """
    e = load_table(spark, sf_dir, "events")
    out = (
        e.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(money2(F.coalesce(F.sum(dec("value")), F.lit(0).cast("decimal(18,4)"))))
    )
    return out.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0.0)).alias(t) for t in _EVENT_TYPES],
    )


@register(
    "q58_explode_lateral",
    oracle="""
    SELECT vec_id, CAST(idx AS INT) AS idx, CAST(v AS DOUBLE) AS v
    FROM (
      SELECT vec_id,
             generate_subscripts(embedding, 1) AS idx,
             unnest(embedding) AS v
      FROM embeddings
    )
    WHERE idx <= 4
    """,
)
def q58_explode_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode of the embedding array (first 4 dims), the lateral-view
    surface (Q58)."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("vec_id", F.posexplode("embedding").alias("idx0", "v"))
        .filter(F.col("idx0") < 4)
        .select(
            "vec_id",
            (F.col("idx0") + 1).cast("int").alias("idx"),
            F.col("v").cast("double").alias("v"),
        )
    )
