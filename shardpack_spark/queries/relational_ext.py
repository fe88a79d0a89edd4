"""Extended relational surface: analytic windows with RANGE frames, CUBE,
full-outer/cross joins, scalar subqueries, conditional expressions,
distinct, ordered-list aggregates (Q42-Q49)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from shardpack_spark.operators.skew import spread_if_narrow
from shardpack_spark.queries import register
from shardpack_spark.queries.canon import dec, money2, round4d
from shardpack_spark.tables import load_table
from shardpack_spark.timeutil import ts_seconds


@register(
    "q42_window_analytics",
    oracle="""
    SELECT event_id, user_id,
           LAG(value) OVER w AS lag_value,
           LEAD(event_id) OVER w AS next_event,
           CAST(NTILE(4) OVER w AS INT) AS quartile,
           FLOOR(PERCENT_RANK() OVER w * 10000.0 + 0.5) / 10000.0 AS pct_rank,
           FLOOR(CUME_DIST() OVER w * 10000.0 + 0.5) / 10000.0 AS cume,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS run_sum,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))) OVER
                 (PARTITION BY user_id ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
                  RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS hour_sum
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q42_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole analytic-window family in one pass over events:
    LAG + running ROWS-frame sum (Q17), LEAD/NTILE/PERCENT_RANK/CUME_DIST,
    and a RANGE frame keyed on epoch seconds (Q42)."""
    e = load_table(spark, sf_dir, "events")
    # The analytic family is CPU-heavy per row (two sorts + seven window
    # functions over every event); with a single-digit-MB shuffle AQE's
    # size-based coalescing collapses the post-exchange stage to ONE task
    # and serializes it (measured 0.82 s of a 1.1 s plan).  Pinning the
    # key exchange to the session's core count keeps the stage parallel;
    # scale-adaptive (defaultParallelism = total cores on a cluster), and
    # the window's required ClusteredDistribution(user_id) is satisfied by
    # this exchange, so the plan still has exactly one shuffle.  r10: the
    # pin fires only when the input is under-parallelized (single-split
    # fixtures); a many-split real input leaves the exchange to AQE.
    e = spread_if_narrow(e, "user_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wr = (
        Window.partitionBy("user_id")
        .orderBy(ts_seconds(F.col("ts")))
        .rangeBetween(-3600, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("lag_value"),
        F.lead("event_id").over(w).alias("next_event"),
        F.ntile(4).over(w).alias("quartile"),
        round4d(F.percent_rank().over(w)).alias("pct_rank"),
        round4d(F.cume_dist().over(w)).alias("cume"),
        money2(F.sum(dec("value")).over(wf)).alias("run_sum"),
        money2(F.sum(dec("value")).over(wr)).alias("hour_sum"),
    )


@register(
    "q44_ordered_aggs",
    oracle="""
    SELECT l_returnflag,
           CAST(ROUND(MIN(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS min_qty,
           CAST(ROUND(MAX(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS max_qty,
           ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(LIST(l_linestatus))), ',') AS statuses
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q44_ordered_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max + deterministic sorted collect_set-as-string (Q44)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        money2(F.min(dec("l_quantity"))).alias("min_qty"),
        money2(F.max(dec("l_quantity"))).alias("max_qty"),
        F.array_join(F.sort_array(F.collect_set("l_linestatus")), ",").alias("statuses"),
    )


@register(
    "q45_outer_cross_subq",
    oracle="""
    SELECT 'above_avg' AS variant, CAST(NULL AS BIGINT) AS k1, o_orderkey AS k2
    FROM orders
    WHERE o_totalprice > (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) FROM orders
    )
    UNION ALL
    SELECT 'full_outer' AS variant, c.c_custkey AS k1, o.o_orderkey AS k2
    FROM (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') c
    FULL OUTER JOIN
         (SELECT o_orderkey, o_custkey FROM orders WHERE o_orderpriority = '1-URGENT') o
      ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'cross' AS variant, r.r_regionkey AS k1, COUNT(*) AS k2
    FROM region r CROSS JOIN nation n
    GROUP BY r.r_regionkey
    """,
    doc="Scalar-aggregate subquery, full-outer join, and Cartesian "
    "product in one variant-tagged result (Q45+Q46+Q47).",
)
def q45_outer_cross_subq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three join surfaces, variant-tagged (Q45+Q46+Q47): 'above_avg' is
    a scalar aggregate subquery executed as a broadcast cross join (no
    driver collect); 'full_outer' keeps unmatched rows on both sides;
    'cross' is the Cartesian-product surface over tiny dims."""
    o = load_table(spark, sf_dir, "orders")
    avg = o.agg(
        (F.sum(dec("o_totalprice")).cast("double") / F.count(F.lit(1))).alias("__avg")
    )
    above = (
        o.crossJoin(F.broadcast(avg))
        .filter(F.col("o_totalprice") > F.col("__avg"))
        .select(
            F.lit("above_avg").alias("variant"),
            F.lit(None).cast("long").alias("k1"),
            F.col("o_orderkey").alias("k2"),
        )
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    ou = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_custkey")
    )
    fo = (
        c.join(ou, c.c_custkey == ou.o_custkey, "full")
        .select(
            F.lit("full_outer").alias("variant"),
            F.col("c_custkey").alias("k1"),
            F.col("o_orderkey").alias("k2"),
        )
    )
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    cross = (
        r.crossJoin(n)
        .groupBy("r_regionkey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.lit("cross").alias("variant"),
            F.col("r_regionkey").cast("long").alias("k1"),
            F.col("cnt").alias("k2"),
        )
    )
    return above.unionAll(fo).unionAll(cross)


# (Q48's conditional family merged into q21_date_funcs; Q49's DISTINCT
# surface merged into q19_set_ops — see README coverage map.)
