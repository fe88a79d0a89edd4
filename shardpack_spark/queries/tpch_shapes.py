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


_Q10_ORACLE = """
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
    SELECT c_custkey AS k1, c_name || '/' || n_name AS s1, revenue AS val,
           CAST(NULL AS BIGINT) AS cnt
    FROM agg ORDER BY revenue DESC, c_custkey LIMIT 20
"""

# TPC-H Q17 shape with a genuinely CORRELATED pair of scalar subqueries in
# the oracle; the Spark builder decorrelates them by hand (groupBy + join),
# which is exactly what Catalyst's RewriteCorrelatedScalarSubquery does to
# the SQL form.  The threshold "l_quantity < 0.2 * AVG(l_quantity per
# part)" is evaluated as  qty * 5 * n < sum_qty  in DECIMAL so neither
# engine performs an inexact division/average before the comparison.
_Q17_ORACLE = """
    SELECT CAST(NULL AS BIGINT) AS k1, 'brand_total' AS s1,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS val,
           COUNT(*) AS cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#1'
    WHERE CAST(l.l_quantity AS DECIMAL(18,4)) * 5
            * (SELECT COUNT(*) FROM lineitem x WHERE x.l_partkey = l.l_partkey)
          < (SELECT SUM(CAST(x.l_quantity AS DECIMAL(18,4)))
             FROM lineitem x WHERE x.l_partkey = l.l_partkey)
"""

# TPC-H Q21 shape (EXISTS + NOT EXISTS, both correlated): suppliers whose
# line is the strictly-last-shipped in a multi-supplier order.  Spark
# expresses the two subqueries as a left-semi and a left-anti join on the
# order key (the decorrelated plan Catalyst produces for EXISTS).
_Q21_ORACLE = """
    SELECT CAST(NULL AS BIGINT) AS k1, s.s_name AS s1,
           CAST(NULL AS DOUBLE) AS val, COUNT(*) AS cnt
    FROM lineitem l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s.s_name
    ORDER BY cnt DESC, s1 LIMIT 20
"""

# TPC-H Q22 shape (uncorrelated scalar subquery + anti join): customers
# with an above-global-average positive balance and no orders, rolled up
# per nation.  The average is compared as  bal * n > sum  in DECIMAL —
# exact in both engines.
_Q22_ORACLE = """
    SELECT CAST(c.c_nationkey AS BIGINT) AS k1, CAST(NULL AS VARCHAR) AS s1,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS val,
           COUNT(*) AS cnt
    FROM customer c
    WHERE CAST(c.c_acctbal AS DECIMAL(18,4))
            * (SELECT COUNT(*) FROM customer x WHERE x.c_acctbal > 0)
          > (SELECT SUM(CAST(x.c_acctbal AS DECIMAL(18,4)))
             FROM customer x WHERE x.c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_nationkey
"""


# TPC-H Q2 shape (correlated MIN scalar subquery): rows matching their
# group's minimum.  Classic Q2 keys on partsupp.ps_supplycost; this corpus
# has no partsupp table, so the same shape runs on lineitem — lines selling
# a small part at that part's MINIMUM price.  The oracle keeps the
# correlated `= (SELECT MIN(...) ...)` form; Spark decorrelates it to a
# per-key MIN aggregate joined back (RewriteCorrelatedScalarSubquery's
# output, hand-declared).
_Q2_ORACLE = """
    SELECT CAST(l.l_partkey AS BIGINT) AS k1, CAST(NULL AS VARCHAR) AS s1,
           CAST(ROUND(MIN(CAST(l.l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS val,
           COUNT(*) AS cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey AND p.p_size < 10
    WHERE CAST(l.l_extendedprice AS DECIMAL(18,4))
          = (SELECT MIN(CAST(x.l_extendedprice AS DECIMAL(18,4)))
             FROM lineitem x WHERE x.l_partkey = l.l_partkey)
    GROUP BY l.l_partkey
    ORDER BY val DESC, k1 LIMIT 20
"""

# TPC-H Q20 shape (nested IN with a correlated aggregate threshold):
# suppliers who, for some red part, shipped MORE THAN A FIFTH of that part's
# total quantity.  The oracle nests `s_suppkey IN (... GROUP BY ... HAVING
# SUM(...) * 2 > (correlated SUM))`; Spark turns the IN into a left-semi
# join and the correlated HAVING into a per-part total joined back —
# thresholds held in DECIMAL so no cross-engine FP boundary.
_Q20_ORACLE = """
    SELECT CAST(s.s_suppkey AS BIGINT) AS k1, s.s_name AS s1,
           CAST(NULL AS DOUBLE) AS val, CAST(NULL AS BIGINT) AS cnt
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,4))) * 5
             > (SELECT SUM(CAST(x.l_quantity AS DECIMAL(18,4)))
                FROM lineitem x WHERE x.l_partkey = l.l_partkey)
    )
"""


# TPC-H Q4 shape (correlated EXISTS with a residual date comparison):
# order-priority counts over a one-year window, keeping only orders with a
# late-shipped line.  The oracle keeps the EXISTS; Spark expresses it as a
# left-semi join whose condition carries BOTH the equi key (l_orderkey) and
# the correlated residual (l_shipdate > o_orderdate) — still a hash semi
# join, never a nested loop.  (Classic Q4 tests l_commitdate <
# l_receiptdate; this corpus carries neither, so the same shape runs on
# the ship-after-order predicate.)
_Q4_ORACLE = """
    SELECT CAST(NULL AS BIGINT) AS k1, o.o_orderpriority AS s1,
           CAST(NULL AS DOUBLE) AS val, COUNT(*) AS cnt
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
"""

# TPC-H Q15 shape (aggregate view + uncorrelated scalar MAX over it): the
# supplier(s) whose half-year revenue equals the view's global maximum.
# The oracle keeps `total = (SELECT MAX(total) FROM rev)`; Spark reuses
# ONE revenue aggregate for both sides — a 1-row MAX broadcast crossed
# back onto the view (allowlisted O(1)-row NLJ, same rule as Q22's) —
# and the equality compares EXACT decimals, so no cross-engine FP
# boundary decides membership.
_Q15_ORACLE = """
    WITH rev AS (
      SELECT l.l_suppkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))
                 * (1 - CAST(l.l_discount AS DECIMAL(18,4)))) AS total
      FROM lineitem l
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate <  TIMESTAMP '1996-07-01'
      GROUP BY l.l_suppkey
    )
    SELECT CAST(s.s_suppkey AS BIGINT) AS k1, s.s_name AS s1,
           CAST(ROUND(r.total, 2) AS DOUBLE) AS val,
           CAST(NULL AS BIGINT) AS cnt
    FROM supplier s JOIN rev r ON r.l_suppkey = s.s_suppkey
    WHERE r.total = (SELECT MAX(total) FROM rev)
"""


def tpch_q10_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: returned-item revenue per customer, top-20 (harmonized)."""
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
        .select(
            F.col("c_custkey").alias("k1"),
            F.concat_ws("/", "c_name", "n_name").alias("s1"),
            F.col("revenue").alias("val"),
            F.lit(None).cast("bigint").alias("cnt"),
        )
    )


def _tpch_q17_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape, decorrelated: the per-part correlated scalar subqueries
    become ONE partial-aggregated groupBy over lineitem joined back on
    l_partkey — a single extra shuffle instead of a per-row subquery, the
    plan that survives 100 TB (the subquery side prunes to the brand's
    partkeys first, so the agg covers only relevant parts)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    # lineitems of the brand's parts (broadcast the tiny dim first so the
    # per-part aggregate below only sees relevant rows)
    lik = li.join(F.broadcast(p.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
    stats = lik.groupBy("l_partkey").agg(
        F.sum(dec("l_quantity")).alias("sq"), F.count(F.lit(1)).alias("n")
    )
    kept = lik.join(stats, "l_partkey").filter(
        dec("l_quantity") * F.lit(5) * F.col("n") < F.col("sq")
    )
    return kept.agg(
        F.lit(None).cast("bigint").alias("k1"),
        F.lit("brand_total").alias("s1"),
        money2(F.sum(dec("l_extendedprice"))).alias("val"),
        F.count(F.lit(1)).alias("cnt"),
    )


def _tpch_q21_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: EXISTS -> left-semi, NOT EXISTS -> left-anti, both equi
    on l_orderkey with residual conditions — no nested-loop anywhere."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    l1, l2, l3 = li.alias("l1"), li.alias("l2"), li.alias("l3")
    multi = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    ).alias("l1")
    last = multi.join(
        l3,
        (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey"))
        & (F.col("l3.l_shipdate") > F.col("l1.l_shipdate")),
        "left_anti",
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        last.join(F.broadcast(s), F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("s_name"))
        .limit(20)
        .select(
            F.lit(None).cast("bigint").alias("k1"),
            F.col("s_name").alias("s1"),
            F.lit(None).cast("double").alias("val"),
            "cnt",
        )
    )


def _tpch_q22_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: the uncorrelated scalar subquery is a 1-row aggregate
    broadcast (allowlisted O(1)-row NLJ); NOT EXISTS is a left-anti join
    (against URGENT orders — the all-orders form was vacuously empty on
    this corpus at every sf, which verified nothing)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    thr = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(dec("c_acctbal")).alias("pos_sum"), F.count(F.lit(1)).alias("pos_n")
    )
    return (
        c.crossJoin(F.broadcast(thr))
        .filter(dec("c_acctbal") * F.col("pos_n") > F.col("pos_sum"))
        .join(
            o.filter(F.col("o_orderpriority") == "1-URGENT"),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            money2(F.sum(dec("c_acctbal"))).alias("val"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            F.col("c_nationkey").cast("bigint").alias("k1"),
            F.lit(None).cast("string").alias("s1"),
            "val",
            "cnt",
        )
    )


def _tpch_q2_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape, decorrelated: the correlated MIN scalar subquery becomes
    one per-part MIN aggregate joined back on l_partkey.  The small-part
    dim broadcasts FIRST so the aggregate covers only relevant parts —
    the subquery's per-part value is unchanged by that pruning (it only
    ever evaluates for kept parts), and at 100 TB it is the difference
    between aggregating the brand's slice and the whole table."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice")
    p10 = load_table(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    lik = li.join(
        F.broadcast(p10.select("p_partkey")), li.l_partkey == F.col("p_partkey")
    )
    mins = lik.groupBy("l_partkey").agg(F.min(dec("l_extendedprice")).alias("minp"))
    kept = lik.join(mins, "l_partkey").filter(
        dec("l_extendedprice") == F.col("minp")
    )
    return (
        kept.groupBy("l_partkey")
        .agg(
            money2(F.min(dec("l_extendedprice"))).alias("val"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy(F.desc("val"), F.asc("l_partkey"))
        .limit(20)
        .select(
            F.col("l_partkey").cast("bigint").alias("k1"),
            F.lit(None).cast("string").alias("s1"),
            "val",
            "cnt",
        )
    )


def _tpch_q20_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: the nested IN becomes a left-semi join; the correlated
    HAVING aggregate becomes per-part totals joined back.  Both lineitem
    passes prune through the broadcast red-part dim first."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    red = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("red%")
    ).select("p_partkey")
    lik = li.join(F.broadcast(red), li.l_partkey == F.col("p_partkey"))
    totals = lik.groupBy("l_partkey").agg(F.sum(dec("l_quantity")).alias("tq"))
    pairs = lik.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(dec("l_quantity")).alias("sq")
    )
    qualifying = (
        pairs.join(totals, "l_partkey")
        .filter(F.col("sq") * 5 > F.col("tq"))
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    return s.join(
        qualifying, s.s_suppkey == F.col("l_suppkey"), "left_semi"
    ).select(
        F.col("s_suppkey").cast("bigint").alias("k1"),
        F.col("s_name").alias("s1"),
        F.lit(None).cast("double").alias("val"),
        F.lit(None).cast("bigint").alias("cnt"),
    )


def _tpch_q4_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: correlated EXISTS -> left-semi join keyed on l_orderkey
    with the correlated date comparison as a residual condition — the
    orders side stays the probe side, lineitem never expands it."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    ).select(
        F.lit(None).cast("bigint").alias("k1"),
        F.col("o_orderpriority").alias("s1"),
        F.lit(None).cast("double").alias("val"),
        "cnt",
    )


def _tpch_q15_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: ONE revenue aggregate serves as both the view and the
    scalar-MAX side (1-row broadcast crossed back); equality runs on the
    exact decimal totals, rounding only at output."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-07-01")
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).alias("total")
    )
    mx = rev.agg(F.max("total").alias("mx"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total") == F.col("mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .select(
            F.col("s_suppkey").cast("bigint").alias("k1"),
            F.col("s_name").alias("s1"),
            money2(F.col("total")).alias("val"),
            F.lit(None).cast("bigint").alias("cnt"),
        )
    )


@register(
    "q52_tpch_shapes",
    oracle=f"""
    SELECT 'q10' AS variant, * FROM ({_Q10_ORACLE})
    UNION ALL
    SELECT 'q17' AS variant, * FROM ({_Q17_ORACLE})
    UNION ALL
    SELECT 'q21' AS variant, * FROM ({_Q21_ORACLE})
    UNION ALL
    SELECT 'q22' AS variant, * FROM ({_Q22_ORACLE})
    UNION ALL
    SELECT 'q2' AS variant, * FROM ({_Q2_ORACLE})
    UNION ALL
    SELECT 'q20' AS variant, * FROM ({_Q20_ORACLE})
    UNION ALL
    SELECT 'q4' AS variant, * FROM ({_Q4_ORACLE})
    UNION ALL
    SELECT 'q15' AS variant, * FROM ({_Q15_ORACLE})
    """,
    doc="Eight TPC-H shapes in one tagged result: Q10 (multi-join top-k), "
    "Q17 (correlated scalar subqueries, decorrelated to agg+join), Q21 "
    "(EXISTS/NOT EXISTS as semi/anti joins), Q22 (uncorrelated scalar "
    "subquery broadcast + anti join), Q2 (correlated MIN scalar "
    "subquery -> per-key MIN joined back), Q20 (nested IN with a "
    "correlated aggregate threshold -> semi join + totals join), Q4 "
    "(correlated EXISTS with a date residual -> semi join), Q15 "
    "(aggregate view + scalar MAX over it -> 1-row broadcast).  The "
    "oracle keeps the SUBQUERY forms so the hash check proves the "
    "decorrelated Spark plans compute the same relation.",
)
def q52_tpch_shapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10/Q17/Q21/Q22/Q2/Q20/Q4/Q15 shapes, variant-tagged (Q52).

    Harmonized columns: k1 (bigint key), s1 (string label), val (money),
    cnt (count).  Q17/Q21/Q22/Q2/Q20 exercise the subquery-decorrelation
    surface: correlated scalar subqueries (SUM/COUNT in Q17, MIN in Q2)
    become per-key aggregates joined back, EXISTS/NOT EXISTS become
    left-semi/left-anti joins, nested IN with a correlated HAVING (Q20)
    becomes a semi join over a thresholded agg-join, and uncorrelated
    scalars become 1-row broadcasts — the shapes Catalyst itself emits
    for the SQL forms, hand-declared so every join is keyed (no nested
    loop over lineitem at any scale).
    """

    def tag(variant: str, df: DataFrame) -> DataFrame:
        return df.select(F.lit(variant).alias("variant"), "*")

    return (
        tag("q10", tpch_q10_variant(spark, sf_dir))
        .unionAll(tag("q17", _tpch_q17_variant(spark, sf_dir)))
        .unionAll(tag("q21", _tpch_q21_variant(spark, sf_dir)))
        .unionAll(tag("q22", _tpch_q22_variant(spark, sf_dir)))
        .unionAll(tag("q2", _tpch_q2_variant(spark, sf_dir)))
        .unionAll(tag("q20", _tpch_q20_variant(spark, sf_dir)))
        .unionAll(tag("q4", _tpch_q4_variant(spark, sf_dir)))
        .unionAll(tag("q15", _tpch_q15_variant(spark, sf_dir)))
    )
