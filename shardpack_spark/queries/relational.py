"""Relational declared queries Q1, Q3-Q24 (SURVEY.md §2B.1-§2B.8).

Every query is expressed declaratively with the DataFrame API so Catalyst
handles predicate pushdown, column pruning, and join selection; `.explain`
verification lives in tests/test_plans.py.  The paired DuckDB oracle SQL is
kept adjacent so the two can be reviewed together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from shardpack_spark.operators.asof import asof_join
from shardpack_spark.queries import register
from shardpack_spark.queries.canon import as_date, dec, money2, round4d
from shardpack_spark.tables import load_table


# --- §2B.1 scans ------------------------------------------------------------

@register("q01_scan_count", oracle="SELECT COUNT(*) AS cnt FROM lineitem")
def q01_scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parquet scan + count (Q1)."""
    return load_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("cnt"))


# --- §2B.2 projection / filter ---------------------------------------------

@register(
    "q03_project_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01' AND l_returnflag = 'R'
    """,
)
def q03_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + pushed-down predicates over lineitem (Q3)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter((as_date("l_shipdate") >= F.lit("1995-01-01").cast("date")) & (F.col("l_returnflag") == "R"))
        .select(
            "l_orderkey",
            "l_linenumber",
            money2(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).alias("revenue"),
        )
    )


@register(
    "q04_filter_in_between",
    oracle="""
    SELECT c_custkey FROM customer
    WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE') AND c_acctbal BETWEEN 0 AND 5000
    """,
)
def q04_filter_in_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list + BETWEEN predicates (Q4)."""
    c = load_table(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE") & F.col("c_acctbal").between(0, 5000)
    ).select("c_custkey")


# --- §2B.3 joins ------------------------------------------------------------

_Q5_ORACLE = """
    SELECT c.c_mktsegment, COUNT(*) AS cnt,
           CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
"""


def _join_orders_customer(spark: SparkSession, sf_dir: str, hint: bool) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    c = F.broadcast(c) if hint else c
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            money2(F.sum(dec("o_totalprice"))).alias("sum_price"),
        )
    )


@register("q05_join_inner", oracle=_Q5_ORACLE)
def q05_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join, Catalyst picks the strategy (Q5)."""
    return _join_orders_customer(spark, sf_dir, hint=False)


@register("q06_join_broadcast", oracle=_Q5_ORACLE)
def q06_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same as Q5 with an explicit broadcast hint on the dim side (Q6)."""
    return _join_orders_customer(spark, sf_dir, hint=True)


@register(
    "q07_join_left",
    oracle="""
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS order_cnt
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
)
def q07_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join; customers without orders keep count 0 (Q7)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )


@register(
    "q08_join_semi",
    oracle="""
    SELECT c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
)
def q08_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join: customers with >=1 urgent order (Q8)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")


@register(
    "q09_join_anti",
    oracle="""
    SELECT p_partkey FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    """,
)
def q09_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: parts never ordered (Q9)."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    return p.join(li, p.p_partkey == li.l_partkey, "left_anti").select("p_partkey")


@register(
    "q10_join_theta",
    oracle="""
    SELECT p.p_brand, COUNT(*) AS cnt,
           CAST(ROUND(SUM(CAST(l.l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty
    FROM lineitem l JOIN part p
      ON l.l_partkey = p.p_partkey AND l.l_quantity > p.p_size
    GROUP BY p.p_brand
    """,
)
def q10_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-join with a theta residual predicate (Q10)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(p, (li.l_partkey == p.p_partkey) & (li.l_quantity > p.p_size), "inner")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("cnt"), money2(F.sum(dec("l_quantity"))).alias("sum_qty"))
    )


@register(
    "q11_asof_join",
    oracle="""
    WITH j AS (
      SELECT o.o_orderkey, e.event_id, e.value,
             ROW_NUMBER() OVER (PARTITION BY o.o_orderkey
                                ORDER BY e.ts DESC, e.event_id DESC) AS rn
      FROM orders o LEFT JOIN events e
        ON e.user_id = o.o_custkey AND e.ts <= o.o_orderdate
    )
    SELECT o_orderkey, event_id AS ev_event_id, value AS ev_value
    FROM j WHERE rn = 1
    """,
)
def q11_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest event at-or-before each order's date (Q11).

    Uses the scalable union + carry-forward formulation (one shuffle, no
    pair explosion) from shardpack_spark.operators.asof.
    """
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value")
    joined = asof_join(
        o, e,
        left_on="o_orderdate", right_on="ts",
        left_by="o_custkey", right_by="user_id",
        value_cols=["event_id", "value"],
        tiebreak="event_id",
    )
    return joined.select(
        "o_orderkey",
        F.col("event_id").alias("ev_event_id"),
        F.col("value").alias("ev_value"),
    )


# --- §2B.4 aggregations -----------------------------------------------------

@register(
    "q12_agg_tpch_q1",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_qty,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_base_price,
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (1 - CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE) AS sum_disc_price,
           FLOOR(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) * 10000.0 + 0.5) / 10000.0 AS avg_disc,
           COUNT(*) AS cnt
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q12_agg_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped hash aggregate with partial/final combine (Q12)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(as_date("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money2(F.sum(dec("l_quantity"))).alias("sum_qty"),
            money2(F.sum(dec("l_extendedprice"))).alias("sum_base_price"),
            money2(F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))).alias("sum_disc_price"),
            round4d(F.sum(dec("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


@register(
    "q13_count_distinct",
    oracle="""
    SELECT COUNT(DISTINCT l_suppkey) AS supp_cnt, COUNT(DISTINCT l_partkey) AS part_cnt
    FROM lineitem
    """,
)
def q13_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple exact distinct aggregates in one pass (Q13)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_suppkey").alias("supp_cnt"),
        F.countDistinct("l_partkey").alias("part_cnt"),
    )


@register("q14_approx_distinct", oracle=None,
          doc="HLL++ approx distinct; bound-checked in pytest, rows-only for the driver.")
def q14_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_part_cnt"))


@register(
    "q15_rollup",
    oracle="""
    SELECT n.n_name, c.c_mktsegment, COUNT(*) AS cnt,
           CAST(GROUPING(n.n_name, c.c_mktsegment) AS BIGINT) AS gid
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP(n.n_name, c.c_mktsegment)
    """,
)
def q15_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with GROUPING_ID over a dim join (Q15)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"), F.grouping_id().cast("long").alias("gid"))
        .select("n_name", "c_mktsegment", "cnt", "gid")
    )


# --- §2B.5 window functions -------------------------------------------------

@register(
    "q16_window_rank",
    oracle="""
    WITH r AS (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER w AS rn, RANK() OVER w AS rk, DENSE_RANK() OVER w AS drk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    )
    SELECT o_custkey, o_orderkey, CAST(rn AS INT) AS rn, CAST(rk AS INT) AS rk,
           CAST(drk AS INT) AS drk
    FROM r WHERE rn <= 3
    """,
)
def q16_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via ranking windows (Q16)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "q17_window_frame",
    oracle="""
    SELECT event_id, user_id,
           LAG(value) OVER w AS lag_value,
           CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS run_sum
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q17_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG + running sum with an explicit ROWS frame (Q17)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return e.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("lag_value"),
        money2(F.sum(dec("value")).over(wf)).alias("run_sum"),
    )


# --- §2B.6 top-k ------------------------------------------------------------

@register(
    "q18_topk",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(ROUND(CAST(o_totalprice AS DECIMAL(18,4)), 2) AS DOUBLE) AS price
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def q18_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-10 -> TakeOrderedAndProject, no full sort (Q18)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey", money2(dec("o_totalprice")).alias("price"))
    )


# --- §2B.7 set operations ---------------------------------------------------

_BUILDING = "SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
_URGENT = """SELECT c_custkey FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')"""


def _setop_sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    urgent = c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey")
    return building, urgent


@register("q19a_union_all", oracle=f"({_BUILDING}) UNION ALL ({_URGENT})")
def q19a_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL keeps duplicates (Q19)."""
    building, urgent = _setop_sides(spark, sf_dir)
    return building.unionAll(urgent)


@register("q19b_intersect", oracle=f"({_BUILDING}) INTERSECT ({_URGENT})")
def q19b_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) (Q19)."""
    building, urgent = _setop_sides(spark, sf_dir)
    return building.intersect(urgent)


@register("q19c_except", oracle=f"({_BUILDING}) EXCEPT ({_URGENT})")
def q19c_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) (Q19)."""
    building, urgent = _setop_sides(spark, sf_dir)
    return building.exceptAll(urgent).distinct()


# --- §2B.8 scalar function families ----------------------------------------

@register(
    "q20_string_funcs",
    oracle=r"""
    SELECT p_partkey,
           UPPER(p_name) AS up_name,
           LOWER(p_brand) AS low_brand,
           SUBSTRING(p_name, 1, 5) AS sub5,
           LENGTH(p_name) AS name_len,
           TRIM(p_name) AS trimmed,
           CONCAT(p_brand, '-', p_type) AS brand_type,
           REGEXP_EXTRACT(p_name, '^(\w+)', 1) AS first_word
    FROM part
    """,
)
def q20_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family over part (Q20)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.lower("p_brand").alias("low_brand"),
        F.substring("p_name", 1, 5).alias("sub5"),
        F.length("p_name").cast("long").alias("name_len"),
        F.trim("p_name").alias("trimmed"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
    )


@register(
    "q21_date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INT) AS y,
           CAST(MONTH(o_orderdate) AS INT) AS m,
           CAST(DAY(o_orderdate) AS INT) AS d,
           CAST(o_orderdate AS DATE) + 30 AS plus30,
           CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INT) AS dd,
           CAST(DATE_TRUNC('month', CAST(o_orderdate AS DATE)) AS DATE) AS mstart
    FROM orders
    """,
)
def q21_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family over orders (Q21)."""
    o = load_table(spark, sf_dir, "orders")
    d = as_date("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.date_add(d, 30).alias("plus30"),
        F.datediff(d, F.lit("1995-01-01").cast("date")).alias("dd"),
        F.date_trunc("month", d).cast("date").alias("mstart"),
    )


@register(
    "q22_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ABS(l_discount) AS abs_disc,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS fl,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS ce,
           FLOOR(SQRT(l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS sq,
           FLOOR(LN(l_extendedprice) * 10000.0 + 0.5) / 10000.0 AS ln_p,
           FLOOR(POWER(l_quantity, 2) * 10000.0 + 0.5) / 10000.0 AS pw
    FROM lineitem WHERE l_extendedprice > 0
    """,
)
def q22_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family over lineitem (Q22)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_extendedprice") > 0).select(
        "l_orderkey",
        "l_linenumber",
        F.abs("l_discount").alias("abs_disc"),
        F.floor("l_extendedprice").cast("long").alias("fl"),
        F.ceil("l_extendedprice").cast("long").alias("ce"),
        round4d(F.sqrt("l_extendedprice")).alias("sq"),
        round4d(F.log("l_extendedprice")).alias("ln_p"),
        round4d(F.pow("l_quantity", F.lit(2))).alias("pw"),
    )


@register(
    "q23_array_funcs",
    oracle="""
    SELECT vec_id,
           CAST(LEN(embedding) AS INT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS e1,
           FLOOR(LIST_REDUCE(LIST_TRANSFORM(embedding,
                   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b) * 10000.0 + 0.5) / 10000.0 AS sumsq,
           CAST(LIST_MAX(embedding) AS DOUBLE) AS maxv
    FROM embeddings
    """,
)
def q23_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions over embeddings (Q23).

    The sum-of-squares uses an explicit left fold so Spark and the oracle
    accumulate in the identical IEEE order.
    """
    e = load_table(spark, sf_dir, "embeddings")
    sq = F.transform("embedding", lambda x: x.cast("double") * x.cast("double"))
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("e1"),
        round4d(F.aggregate(sq, F.lit(0.0), lambda a, x: a + x)).alias("sumsq"),
        F.array_max("embedding").cast("double").alias("maxv"),
    )


@register(
    "q24_json_funcs",
    oracle="""
    SELECT event_id,
           CAST(JSON_EXTRACT_STRING(props, '$.k') AS BIGINT) AS k_val,
           CAST(LEN(JSON_KEYS(props)) AS INT) AS nkeys
    FROM events
    """,
)
def q24_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over events.props (Q24)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        F.size(F.json_object_keys("props")).alias("nkeys"),
    )
