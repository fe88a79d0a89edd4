"""Binned interval (range) join: semantics + the plan promise.

The whole point of operators/ranges.py is that a pure inequality join
compiles to a HASH equi-join on the bin key instead of the
BroadcastNestedLoopJoin Spark would otherwise emit — both facts are
asserted here, semantics against a brute-force cross-join reference.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shardpack_spark.operators.ranges import interval_join


def _brute(spark, pts, ivs, closed="left", by=False):
    """Reference answer via explicit cross join + filter."""
    p = spark.createDataFrame(pts, "pid long, x double" + (", pk long" if by else ""))
    i = spark.createDataFrame(ivs, "iid long, lo double, hi double" + (", ik long" if by else ""))
    cond = (p.x >= i.lo) & ((p.x <= i.hi) if closed == "both" else (p.x < i.hi))
    if by:
        cond = cond & (p.pk == i.ik)
    return {(r.pid, r.iid) for r in p.crossJoin(i).filter(cond).collect()}


def _binned(spark, pts, ivs, bin_width, closed="left", by=False):
    p = spark.createDataFrame(pts, "pid long, x double" + (", pk long" if by else ""))
    i = spark.createDataFrame(ivs, "iid long, lo double, hi double" + (", ik long" if by else ""))
    out = interval_join(
        p, i, "x", "lo", "hi", bin_width, by=[("pk", "ik")] if by else None, closed=closed
    )
    return {(r.pid, r.iid) for r in out.collect()}


PTS = [(1, -3.0), (2, 0.0), (3, 2.5), (4, 5.0), (5, 9.99), (6, 10.0), (7, 47.3)]
IVS = [
    (10, -5.0, 0.0),   # negative span, ends at 0
    (11, 0.0, 10.0),   # long interval spanning many bins
    (12, 2.5, 2.5),    # degenerate (empty under closed='left')
    (13, 5.0, 5.0),    # degenerate point interval
    (14, 9.0, 50.0),   # covers the tail
    (15, 60.0, 40.0),  # inverted: must be dropped, not crash sequence()
]


@pytest.mark.parametrize("bin_width", [0.7, 1.0, 5.0, 1000.0])
@pytest.mark.parametrize("closed", ["left", "both"])
@pytest.mark.slow  # heavy (>=12 s); conclusive lane only
def test_matches_brute_force_any_bin_width(spark, bin_width, closed):
    # correctness must be independent of bin_width (it only moves cost)
    assert _binned(spark, PTS, IVS, bin_width, closed) == _brute(spark, PTS, IVS, closed)


def test_point_interval_semantics(spark):
    both = _binned(spark, PTS, IVS, 1.0, closed="both")
    left = _binned(spark, PTS, IVS, 1.0, closed="left")
    assert (3, 12) in both and (4, 13) in both  # [x, x] contains x
    assert (3, 12) not in left and (4, 13) not in left  # [x, x) is empty
    assert (6, 11) in both and (6, 11) not in left  # hi boundary


def test_by_keys_compose_with_bin(spark):
    pts = [(1, 3.0, 100), (2, 3.0, 200), (3, 7.0, 100)]
    ivs = [(10, 0.0, 5.0, 100), (11, 0.0, 10.0, 200)]
    got = _binned(spark, pts, ivs, 2.0, by=True)
    assert got == _brute(spark, pts, ivs, by=True) == {(1, 10), (2, 11)}


def test_no_duplicate_pairs(spark):
    # a point matches an interval in exactly one bin: no dedup, no dupes
    p = spark.createDataFrame(PTS, "pid long, x double")
    i = spark.createDataFrame(IVS, "iid long, lo double, hi double")
    out = interval_join(p, i, "x", "lo", "hi", 0.3)
    assert out.count() == out.select("pid", "iid").distinct().count()


def test_plan_is_hash_join_not_nested_loop(spark):
    p = spark.range(1000).select(F.col("id").alias("pid"), (F.col("id") * 0.1).alias("x"))
    i = spark.range(100).select(
        F.col("id").alias("iid"),
        (F.col("id") * 1.0).alias("lo"),
        (F.col("id") * 1.0 + 3.0).alias("hi"),
    )
    s = interval_join(p, i, "x", "lo", "hi", 3.0)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastNestedLoopJoin" not in s and "CartesianProduct" not in s
    assert "HashJoin" in s, f"expected a hash equi-join on the bin key:\n{s}"


def test_validation_errors(spark):
    p = spark.createDataFrame([(1, 1.0)], "pid long, x double")
    i = spark.createDataFrame([(1, 0.0, 2.0)], "iid long, lo double, hi double")
    with pytest.raises(ValueError, match="bin_width"):
        interval_join(p, i, "x", "lo", "hi", 0.0)
    with pytest.raises(ValueError, match="closed"):
        interval_join(p, i, "x", "lo", "hi", 1.0, closed="right")
    with pytest.raises(ValueError, match="collide"):
        interval_join(p, i.withColumnRenamed("iid", "pid"), "x", "lo", "hi", 1.0)


def test_max_bins_guard(spark):
    p = spark.createDataFrame([(1, 5.0)], "pid long, x double")
    i = spark.createDataFrame([(1, 0.0, 1000.0)], "iid long, lo double, hi double")
    # within cap: fine
    ok = interval_join(p, i, "x", "lo", "hi", 100.0, max_bins_per_interval=20)
    assert ok.count() == 1
    # over cap: loud runtime failure instead of a silent explode
    with pytest.raises(Exception, match="max_bins_per_interval"):
        interval_join(p, i, "x", "lo", "hi", 1.0, max_bins_per_interval=20).count()
    with pytest.raises(ValueError, match="max_bins_per_interval"):
        interval_join(p, i, "x", "lo", "hi", 1.0, max_bins_per_interval=0)
