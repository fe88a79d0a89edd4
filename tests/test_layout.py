"""Z-order layout: Morton code correctness + the locality property that
actually buys pruning (per-partition bounding boxes shrink on EVERY
interleaved dimension, vs a single-column sort which only localizes one)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shardpack_spark.operators.layout import morton_interleave, zorder_layout


def test_morton_interleave_known_bits(spark):
    df = spark.createDataFrame([(3, 1), (0, 0), (2, 3)], "x long, y long")
    got = [
        r["z"]
        for r in df.select(
            morton_interleave([F.col("x"), F.col("y")], 2).alias("z")
        ).collect()
    ]
    # x bits land at even positions, y bits at odd:
    # (3,1): x->0b101? no: x=0b11 -> out bits 0,2 = 5; y=0b01 -> out bit 1 = 2; z=7
    # (2,3): x=0b10 -> out bit 2 = 4; y=0b11 -> out bits 1,3 = 10; z=14
    assert got == [7, 0, 14]


def test_morton_width_guard():
    with pytest.raises(ValueError, match="signed long"):
        morton_interleave([F.lit(1)] * 4, 16)


def _spreads(df):
    rows = (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
        )
        .collect()
    )
    return [(r["dx"], r["dy"]) for r in rows if r["dx"] is not None]


def test_zorder_localizes_both_dimensions(spark):
    # 64x64 uniform grid; 16 partitions.  A single-column sort localizes
    # x but leaves the full y range (63) in EVERY partition — a filter on
    # y prunes nothing.  Z-order bounds the spread of BOTH dimensions
    # (contiguous z ranges are unions of a few 2^k tiles), so min/max
    # stats prune on either column.
    grid = (
        spark.range(64 * 64)
        .select((F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y"))
    )
    z = zorder_layout(grid, ["x", "y"], bits=6, num_partitions=16)
    z_spreads = _spreads(z)
    assert z_spreads, "no partitions?"
    avg_dy_z = sum(dy for _, dy in z_spreads) / len(z_spreads)
    xsorted = grid.repartitionByRange(16, "x").sortWithinPartitions("x")
    avg_dy_x = sum(dy for _, dy in _spreads(xsorted)) / len(_spreads(xsorted))
    assert avg_dy_x > 60  # x-sort: y unconstrained everywhere
    assert avg_dy_z < 0.55 * avg_dy_x, (avg_dy_z, avg_dy_x)
    # and x stays localized too (never the full 0..63 range)
    assert max(dx for dx, _ in z_spreads) <= 40


def test_zorder_single_exchange_no_udf(spark):
    grid = spark.range(1000).select(
        (F.col("id") % 10).alias("x"), (F.col("id") % 7).alias("y")
    )
    plan = zorder_layout(grid, ["x", "y"], bits=4)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange rangepartitioning") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_zorder_preserves_rows_and_handles_nulls(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 99.0), (4, -5.0)], "x long, y double"
    )
    out = zorder_layout(df, ["x", "y"], bits=4, num_partitions=2)
    assert sorted(r["x"] for r in out.collect()) == [1, 2, 3, 4]


def test_zorder_boundaries_for_skew(spark):
    # power-law column: explicit quantile-ish boundaries even out buckets
    df = spark.range(1000).select(
        F.col("id").alias("x"), (F.col("id") * F.col("id")).cast("double").alias("y")
    )
    out = zorder_layout(
        df, ["x", "y"], bits=4, num_partitions=4,
        boundaries={"y": [100.0, 10000.0, 250000.0]},
    )
    assert out.count() == 1000
    with pytest.raises(ValueError, match="sorted"):
        zorder_layout(df, ["y"], bits=4, boundaries={"y": [5.0, 1.0]})
    with pytest.raises(ValueError, match="more than"):
        zorder_layout(df, ["y"], bits=1, boundaries={"y": [1.0, 2.0, 3.0]})


def test_zorder_validation(spark):
    df = spark.createDataFrame([(1, 2)], "x long, y long")
    with pytest.raises(ValueError, match="at least one"):
        zorder_layout(df, [])
    with pytest.raises(ValueError, match="not in frame"):
        zorder_layout(df, ["nope"])
