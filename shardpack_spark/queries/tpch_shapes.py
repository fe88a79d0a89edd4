"""Full TPC-H-shaped analytical queries (multi-join + agg + top-k) —
the optimizer-stress surface: join ordering, broadcast selection, partial
aggregation all come from Catalyst (Q50-Q52)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shardpack_spark.queries import register
from shardpack_spark.queries.canon import as_date, dec, money2
from shardpack_spark.tables import load_table


@register(
    "q50_tpch_q3_shape",
    oracle="""
    WITH j AS (
      SELECT l.l_orderkey,
             CAST(l.l_extendedprice AS DECIMAL(18,4))
               * (1 - CAST(l.l_discount AS DECIMAL(18,4))) AS rev,
             o.o_orderdate
      FROM customer c
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND CAST(o.o_orderdate AS DATE) < DATE '1995-03-15'
        AND CAST(l.l_shipdate AS DATE) > DATE '1995-03-15'
    ), agg AS (
      SELECT l_orderkey, CAST(ROUND(SUM(rev), 2) AS DOUBLE) AS revenue,
             CAST(MIN(o_orderdate) AS DATE) AS odate
      FROM j GROUP BY l_orderkey
    )
    SELECT l_orderkey, revenue, odate
    FROM agg ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
)
def q50_tpch_q3_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: shipping-priority 3-way join + agg + top-10 (Q50)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        as_date("o_orderdate") < F.lit("1995-03-15").cast("date")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        as_date("l_shipdate") > F.lit("1995-03-15").cast("date")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey")
        .agg(
            money2(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))).alias("revenue"),
            F.min("o_orderdate").cast("date").alias("odate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q51_tpch_q5_shape",
    oracle="""
    SELECT n.n_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q51_tpch_q5_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join with a local-supplier predicate;
    Catalyst broadcasts every dim and reorders (Q51)."""
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    return (
        r.join(n, n.n_regionkey == r.r_regionkey)
        .join(c, c.c_nationkey == n.n_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .join(s, (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey))
        .groupBy("n_name")
        .agg(
            money2(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))).alias("revenue")
        )
    )


@register(
    "q52_tpch_q10_shape",
    oracle="""
    WITH agg AS (
      SELECT c.c_custkey, c.c_name, n.n_name,
             CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                   * (1 - CAST(l.l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS revenue
      FROM customer c
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      JOIN orders o ON o.o_custkey = c.c_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE l.l_returnflag = 'R'
      GROUP BY c.c_custkey, c.c_name, n.n_name
    )
    SELECT c_custkey, c_name, n_name, revenue
    FROM agg ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def q52_tpch_q10_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top-20 (Q52)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        c.join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
        .join(o, o.o_custkey == c.c_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            money2(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))).alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )
