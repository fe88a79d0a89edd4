"""Additional pipeline operators: time-bucketed rollups (hypertable-style
continuous aggregates), word n-gram Jaccard, per-event sessionization
(Q54-Q56)."""

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
    "q55_word_ngram_jaccard",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id AS sid, regexp_split_to_array(trim(text), '\s+') AS t
      FROM documents
    ), sh AS (
      SELECT DISTINCT sid, shingle FROM (
        SELECT sid, array_to_string(list_slice(t, i, i + 2), ' ') AS shingle
        FROM (SELECT sid, t, unnest(generate_series(1, len(t) - 2)) AS i
              FROM toks WHERE len(t) >= 3)
      )
    ), sizes AS (
      SELECT sid, COUNT(*) AS n FROM sh GROUP BY sid
    ), inter AS (
      SELECT a.sid AS sid_a, b.sid AS sid_b, COUNT(*) AS ic
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.sid < b.sid
      GROUP BY 1, 2
    )
    SELECT i.sid_a, i.sid_b,
           FLOOR(CAST(i.ic AS DOUBLE) / (na.n + nb.n - i.ic) * 10000.0 + 0.5) / 10000.0 AS jac
    FROM inter i
    JOIN sizes na ON na.sid = i.sid_a
    JOIN sizes nb ON nb.sid = i.sid_b
    WHERE CAST(i.ic AS DOUBLE) / (na.n + nb.n - i.ic) >= 0.8
    """,
)
def q55_word_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by word 3-gram Jaccard >= 0.8 — the token-level
    variant of Q29 (n-gram Jaccard dedup family) (Q55)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("doc_id").alias("sid"),
        F.split(F.trim(F.col("text")), r"\s+").alias("t"),
    ).filter(F.size("t") >= 3)
    sh = (
        toks.select(
            "sid",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 2),
                    lambda i: F.concat_ws(" ", F.slice("t", i, 3)),
                )
            ).alias("shingle"),
        )
        .distinct()
    )
    pairs = dedup.jaccard_pairs_exact(sh, threshold=0.8)
    return pairs.select("sid_a", "sid_b", round4d(F.col("jac")).alias("jac"))


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
