"""The scale-adaptive spread guard (operators.skew.spread_if_narrow) and
the query-body pins it replaced (r10): the repartition must fire ONLY for
under-parallelized inputs — on a many-split input the plan is left to AQE
(no REPARTITION_BY_NUM of arbitrary-size partitions at 100 TB) — and
q16's planner shape must keep BOTH WindowGroupLimits (the map-side
partial top-k was silently dropped by r9's pin)."""

from __future__ import annotations

from shardpack_spark.operators.skew import spread_if_narrow
from shardpack_spark.queries import load_all

REG = load_all()


def _plan(df, mode="formatted") -> str:
    spark = df.sparkSession
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_narrow_input_is_spread(spark):
    par = spark.sparkContext.defaultParallelism
    narrow = spark.range(1000).coalesce(1)
    out = spread_if_narrow(narrow)
    assert out.rdd.getNumPartitions() == par
    assert "REPARTITION_BY_NUM" in _plan(out)


def test_narrow_input_spread_by_key_single_exchange(spark):
    par = spark.sparkContext.defaultParallelism
    narrow = spark.range(1000).selectExpr("id", "id % 7 AS k").coalesce(1)
    out = spread_if_narrow(narrow, "k").groupBy("k").count()
    s = _plan(out)
    # the keyed spread doubles as the aggregation's exchange: exactly one
    # (the pinned exchange, no additional ENSURE_REQUIREMENTS one)
    assert s.count("hashpartitioning") == 1 and "REPARTITION_BY_NUM" in s
    assert "ENSURE_REQUIREMENTS" not in s


def test_multisplit_input_is_untouched(spark):
    par = spark.sparkContext.defaultParallelism
    wide = spark.range(1000).repartition(par)
    out = spread_if_narrow(wide, "id")
    assert out is wide  # identity, not merely equivalent: zero plan change


def test_q16_keeps_partial_and_final_window_group_limit(spark, sf_dir):
    s = _plan(REG["q16_window_rank"].builder(spark, sf_dir))
    # two-level top-k: a map-side (Partial) WindowGroupLimit BELOW the
    # exchange and a Final one above — at scale only <=3 rows per
    # customer per map partition cross the shuffle
    assert ", 3, Partial" in s and ", 3, Final" in s, s
    # and no user pin overriding AQE's sizing of that exchange
    assert "REPARTITION_BY_NUM" not in s and "ENSURE_REQUIREMENTS" in s


def test_q11_q27_q42_pins_are_guarded(spark, sf_dir):
    # at the sf fixtures (single-split scans) the spread fires -> the pin
    # is present; the guard itself is exercised against a multi-split
    # input in test_multisplit_input_is_untouched
    for name in ("q11_asof_join", "q27_session_window", "q42_window_analytics"):
        s = _plan(REG[name].builder(spark, sf_dir))
        assert "REPARTITION_BY_NUM" in s, name
