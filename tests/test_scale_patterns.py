"""Scale-pattern tests: salted join equivalence, bucketed join without
shuffle exchanges, AQE behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from shardpack_spark.operators.skew import bucketed_join, salted_join, write_bucketed
from shardpack_spark.tables import load_table


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey", "l_quantity")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")

    plain = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    salted = (
        salted_join(li, p, "l_partkey", "p_partkey", n_salts=8)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    )
    a = {(r["p_brand"]): (r["n"], round(r["q"], 6)) for r in plain.collect()}
    b = {(r["p_brand"]): (r["n"], round(r["q"], 6)) for r in salted.collect()}
    assert a == b


def test_bucketed_join_no_shuffle(spark, sf_dir, tmp_path):
    """Identically-bucketed tables must sort-merge-join with zero
    hash-partitioning exchanges (the co-location contract)."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try:
        o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
        li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
        write_bucketed(o.withColumnRenamed("o_orderkey", "k"), "b_orders", "k", 8)
        write_bucketed(li.withColumnRenamed("l_orderkey", "k"), "b_lineitem", "k", 8)
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_aqe_coalesces_small_shuffles(spark, sf_dir):
    """With AQE on, a small-group aggregate must not keep 32 empty
    post-shuffle partitions."""
    o = load_table(spark, sf_dir, "orders")
    agg = o.groupBy("o_orderstatus").count()
    agg.collect()
    n = agg.rdd.getNumPartitions()
    assert n < 32, f"AQE should coalesce tiny shuffle, got {n} partitions"


def test_salted_join_rejects_dim_preserving_types(spark, sf_dir):
    """The dim side is replicated n_salts times, so right/full joins
    would emit unmatched dim rows once per replica — rejected loudly."""
    import pytest as _pt

    from shardpack_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    for how in ("right", "full", "outer", "full_outer"):
        with _pt.raises(ValueError, match="duplicate unmatched dim rows"):
            salted_join(li, p, "l_partkey", "p_partkey", how=how)
    # left join still works and preserves unmatched left rows once
    n = salted_join(li.limit(100), p, "l_partkey", "p_partkey", how="left").count()
    assert n == 100
