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
from shardpack_spark.operators.ranges import interval_join
from shardpack_spark.queries import register
from shardpack_spark.queries.canon import as_date, dec, money2, round4d
from shardpack_spark.tables import load_table


# --- §2B.1 scans ------------------------------------------------------------

@register(
    "q01_scan_count",
    oracle="""
    SELECT COUNT(*) AS cnt,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supp_cnt,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS part_cnt,
           CAST(1 AS INT) AS approx_ok
    FROM lineitem
    """,
)
def q01_scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full scan + count, exact distincts, and the HLL++ approx-distinct
    bound check (Q1 + Q13 + Q14).

    approx_count_distinct has no cross-engine oracle, so the 5% accuracy
    bound is checked IN the query: approx_ok hash-matches the oracle's
    constant 1 exactly when the estimate is within bounds.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # Two countDistincts in ONE agg would plan an Expand (3x the input
    # rows through the first shuffle).  Two single-column scans instead,
    # each carrying more than its distinct: the l_suppkey scan derives
    # the TOTAL row count as sum of group counts (no third scan), and
    # the HLL estimate runs over the already-distinct l_partkey set —
    # identical estimate (HLL depends only on the distinct value set)
    # at 1/|rows-per-key| the hashing work.  Partial aggs make both
    # shuffles |distinct|-sized.  The standard multi-distinct rewrite
    # for 100 TB: never Expand, never rescan.
    supp = (
        li.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("__c"))
        .agg(F.sum("__c").alias("cnt"), F.count(F.lit(1)).alias("supp_cnt"))
    )
    # groupBy + final agg, not select().distinct().agg(): same two-level
    # partial-agg plan but the distinct set stays keyed through the first
    # exchange, so the final agg reads it directly instead of re-hashing
    # a distinct-projection (measured ~25% off this branch at sf0.1)
    part = (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("__c"))
        .agg(
            F.count(F.lit(1)).alias("part_cnt"),
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("__approx"),
        )
    )
    agged = supp.crossJoin(part)
    ok = (
        (F.col("__approx") >= F.col("part_cnt") * 0.95)
        & (F.col("__approx") <= F.col("part_cnt") * 1.05)
    )
    return agged.select(
        "cnt", "supp_cnt", "part_cnt", F.when(ok, 1).otherwise(0).cast("int").alias("approx_ok")
    )


# --- §2B.2 projection / filter ---------------------------------------------

@register(
    "q03_project_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (1 - CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1995-01-01' AND l_returnflag = 'R'
      AND l_linenumber IN (1, 2, 3) AND l_quantity BETWEEN 5 AND 45
    """,
)
def q03_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + pushed-down predicates incl. IN-list and BETWEEN over
    lineitem (Q3 + Q4)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (as_date("l_shipdate") >= F.lit("1995-01-01").cast("date"))
            & (F.col("l_returnflag") == "R")
            & F.col("l_linenumber").isin(1, 2, 3)
            & F.col("l_quantity").between(5, 45)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            money2(dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).alias("revenue"),
        )
    )


# --- §2B.3 joins ------------------------------------------------------------

_Q5_SIDE = """
    SELECT '{tag}' AS variant, c.c_mktsegment, COUNT(*) AS cnt,
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
        .select(
            F.lit("broadcast" if hint else "shuffle").alias("variant"),
            "c_mktsegment",
            "cnt",
            "sum_price",
        )
    )


@register(
    "q05_join_inner",
    oracle=_Q5_SIDE.format(tag="shuffle") + " UNION ALL " + _Q5_SIDE.format(tag="broadcast"),
)
def q05_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join twice — Catalyst-chosen strategy and an explicit
    broadcast hint on the dim side — tagged and unioned; both variants
    must produce identical aggregates (Q5 + Q6)."""
    return _join_orders_customer(spark, sf_dir, hint=False).unionAll(
        _join_orders_customer(spark, sf_dir, hint=True)
    )


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
    "q08_semi_anti",
    oracle="""
    SELECT 'semi' AS variant, c_custkey AS key FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    UNION ALL
    SELECT 'anti' AS variant, p_partkey AS key FROM part p
    WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
    """,
    doc="Left-semi and left-anti joins in one tagged result.",
)
def q08_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (customers with >=1 urgent order) and left-anti
    join (parts never ordered) as one variant-tagged result (Q8+Q9)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    semi = (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select(F.lit("semi").alias("variant"), F.col("c_custkey").alias("key"))
    )
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    anti = (
        p.join(li, p.p_partkey == li.l_partkey, "left_anti")
        .select(F.lit("anti").alias("variant"), F.col("p_partkey").alias("key"))
    )
    return semi.unionAll(anti)


@register(
    "q10_join_theta",
    oracle="""
    SELECT 'theta' AS variant, p.p_brand AS key, COUNT(*) AS cnt,
           CAST(ROUND(SUM(CAST(l.l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_val
    FROM lineitem l JOIN part p
      ON l.l_partkey = p.p_partkey AND l.l_quantity > p.p_size
    GROUP BY p.p_brand
    UNION ALL
    SELECT 'interval' AS variant, CAST(s.s_suppkey AS VARCHAR) AS key, COUNT(*) AS cnt,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_val
    FROM customer c JOIN supplier s
      ON c.c_acctbal >= s.s_acctbal AND c.c_acctbal < s.s_acctbal + 500
    GROUP BY s.s_suppkey
    """,
)
def q10_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inequality joins, both scale shapes (Q10).

    - 'theta': equi-join with a theta residual predicate — the selective
      equi key does the heavy lifting; the inequality is a cheap filter.
    - 'interval': PURE inequality join (point-in-interval, no equi key),
      rewritten as a binned equi-join by ``operators.ranges.interval_join``
      so the plan is a hash join on the bin key, never a
      BroadcastNestedLoopJoin/cartesian (the DuckDB oracle answers the same
      predicate with its IEJoin).
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    theta = (
        li.join(p, (li.l_partkey == p.p_partkey) & (li.l_quantity > p.p_size), "inner")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("cnt"), money2(F.sum(dec("l_quantity"))).alias("sum_val"))
        .select(F.lit("theta").alias("variant"), F.col("p_brand").alias("key"), "cnt", "sum_val")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.col("s_acctbal").alias("band_lo"),
        (F.col("s_acctbal") + F.lit(500.0)).alias("band_hi"),
    )
    interval = (
        interval_join(cust, supp, "c_acctbal", "band_lo", "band_hi", bin_width=500.0)
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("cnt"), money2(F.sum(dec("c_acctbal"))).alias("sum_val"))
        .select(
            F.lit("interval").alias("variant"),
            F.col("s_suppkey").cast("string").alias("key"),
            "cnt",
            "sum_val",
        )
    )
    return theta.unionAll(interval)


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
    # Spread the carry window ONLY when the inputs are under-parallelized
    # (single-split sf fixtures: AQE coalesces the ~6 MB union shuffle to
    # one task and serializes the sort+carry — measured 0.49 s of the
    # plan).  On a many-split real-scale input the pin is skipped so AQE
    # sizes the by-key exchange by data volume (guide §2.2/§5) instead
    # of a cores-count pin making partitions of arbitrary size.
    par = spark.sparkContext.defaultParallelism
    narrow = (o.rdd.getNumPartitions() + e.rdd.getNumPartitions()) < par
    joined = asof_join(
        o, e,
        left_on="o_orderdate", right_on="ts",
        left_by="o_custkey", right_by="user_id",
        value_cols=["event_id", "value"],
        tiebreak="event_id",
        num_partitions=par if narrow else None,
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
    "q15_grouping_sets",
    oracle="""
    SELECT 'rollup' AS variant, n.n_name, c.c_mktsegment, COUNT(*) AS cnt,
           CAST(GROUPING(n.n_name, c.c_mktsegment) AS BIGINT) AS gid
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP(n.n_name, c.c_mktsegment)
    UNION ALL
    SELECT 'cube' AS variant, n.n_name, c.c_mktsegment, COUNT(*) AS cnt,
           CAST(GROUPING(n.n_name, c.c_mktsegment) AS BIGINT) AS gid
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY CUBE(n.n_name, c.c_mktsegment)
    """,
    doc="ROLLUP and CUBE with GROUPING_ID in one tagged result.",
)
def q15_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP + CUBE with GROUPING_ID over a broadcast dim join, tagged
    by variant (Q15+Q43)."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)

    # ROLLUP(a, b) is CUBE(a, b) minus the b-only grouping set, and
    # grouping_id is the same bitmask in both (bit set = column
    # aggregated; (a,b)=0, (a)=1, (b)=2, ()=3).  So ONE cube
    # aggregation — a single scan + Expand + shuffle — serves both
    # variants: the rollup leg is cube.filter(gid != 2), with identical
    # counts because both group the same underlying rows.  Persist the
    # group-count table (tiny) so the two legs don't recompute it.
    base = (
        joined.cube("n_name", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"), F.grouping_id().cast("long").alias("gid"))
        .persist()
    )

    def tag(variant: str, df: DataFrame) -> DataFrame:
        return df.select(
            F.lit(variant).alias("variant"), "n_name", "c_mktsegment", "cnt", "gid"
        )

    return tag("rollup", base.filter(F.col("gid") != 2)).unionAll(tag("cube", base))


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
    # Planner shape, deliberately unpinned (r10, reverting r9's
    # repartition(par, o_custkey)): with the pin below the window the
    # optimizer can only place ONE WindowGroupLimit above the exchange,
    # so EVERY orders row crosses the shuffle; the planner's own
    # ENSURE_REQUIREMENTS exchange keeps the partial (map-side) top-3
    # WindowGroupLimit BELOW it — at scale only <=3 rows per customer
    # per map partition are shuffled, and AQE sizes the window stage.
    # Interleaved A/B at sf0.1 (quiet host, 7 rounds): planner shape
    # median 0.41 s vs pinned 0.33 s vs round-robin-spread-then-window
    # 0.75 s — the pin's local win does not survive the bench protocol
    # (r8 benched this exact shape at 0.498 s vs the r9 pin's 0.642 s
    # on comparable quiet windows), and it costs the map-side limit.
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


# (Q17's LAG + ROWS-frame running sum lives in q42_window_analytics —
# one window pass computes the whole analytic family over events.)


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


@register(
    "q19_set_ops",
    oracle=f"""
    SELECT 'union_all' AS op, c_custkey FROM (({_BUILDING}) UNION ALL ({_URGENT}))
    UNION ALL
    SELECT 'intersect' AS op, c_custkey FROM (({_BUILDING}) INTERSECT ({_URGENT}))
    UNION ALL
    SELECT 'except' AS op, c_custkey FROM (({_BUILDING}) EXCEPT ({_URGENT}))
    UNION ALL
    SELECT 'distinct' AS op, c_custkey
    FROM (SELECT DISTINCT c_custkey FROM (({_BUILDING}) UNION ALL ({_URGENT})))
    """,
)
def q19_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL / INTERSECT / EXCEPT / DISTINCT over the same two customer
    key sets, tagged and unioned into one result (Q19 + Q49)."""
    building, urgent = _setop_sides(spark, sf_dir)
    # each side feeds FOUR set-op legs; Catalyst does not share the
    # common subplan, so without a persist the urgent side's
    # customer-orders semi-join runs four times (and building's filtered
    # scan four times).  Both sides are keys-only (<< the base tables) —
    # cache them and the join/scans run once.
    building = building.persist()
    urgent = urgent.persist()

    def tag(op: str, df: DataFrame) -> DataFrame:
        return df.select(F.lit(op).alias("op"), "c_custkey")

    return (
        tag("union_all", building.unionAll(urgent))
        .unionAll(tag("intersect", building.intersect(urgent)))
        .unionAll(tag("except", building.exceptAll(urgent).distinct()))
        .unionAll(tag("distinct", building.unionAll(urgent).distinct()))
    )


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
           CAST(DATE_TRUNC('month', CAST(o_orderdate AS DATE)) AS DATE) AS mstart,
           CASE WHEN o_totalprice > 300000 THEN 'high'
                WHEN o_totalprice > 150000 THEN 'mid'
                ELSE 'low' END AS bucket,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_alias,
           CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent
    FROM orders
    """,
)
def q21_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family + CASE WHEN / NULLIF / COALESCE
    conditionals over orders (Q21 + Q48)."""
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
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 150000, "mid")
        .otherwise("low")
        .alias("bucket"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
            "status_alias"
        ),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("is_urgent"),
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
