"""Table profiler + mergeable HLL sketches.

Profiler exact mode is checked column-by-column against DuckDB on the
driver's parquet (same style as the oracle gate); the HLL tests pin the
mergeability property — union-of-sketches == sketch-of-union — which is
what makes the scan-once/rollup-anywhere pattern sound at 100 TB.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from shardpack_spark.operators.approx import (
    approx_distinct_rollup,
    distinct_sketches,
    rollup_sketches,
)
from shardpack_spark.operators.profile import profile_table
from shardpack_spark.tables import load_table


# ---------------------------------------------------------------- profiler


def test_profile_exact_matches_duckdb(spark, sf_dir):
    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    got = {
        r["column"]: r
        for r in profile_table(
            load_table(spark, sf_dir, "orders"), cols, exact_distinct=True
        ).collect()
    }
    con = duckdb.connect()
    pq = os.path.join(sf_dir, "orders.parquet")
    for c in cols:
        exp = con.execute(
            f"""SELECT COUNT(*), COUNT({c}), COUNT(DISTINCT {c}),
                       CAST(MIN({c}) AS VARCHAR), CAST(MAX({c}) AS VARCHAR)
                FROM '{pq}'"""
        ).fetchone()
        r = got[c]
        assert (r["n_rows"], r["n_nonnull"], r["n_distinct"]) == exp[:3]
        assert r["n_null"] == exp[0] - exp[1]
        assert (r["min_str"], r["max_str"]) == exp[3:]
    # numeric sum/mean: exact decimal accumulation, single IEEE division
    s, n = con.execute(
        f"SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE), COUNT(o_totalprice) FROM '{pq}'"
    ).fetchone()
    assert got["o_totalprice"]["sum_val"] == s
    assert got["o_totalprice"]["mean_val"] == s / n
    assert got["o_orderstatus"]["sum_val"] is None and got["o_orderstatus"]["mean_val"] is None


def test_profile_counts_nulls(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "b")], "k long, v string"
    )
    r = {x["column"]: x for x in profile_table(df, exact_distinct=True).collect()}
    assert r["v"]["n_null"] == 2 and r["v"]["n_nonnull"] == 2 and r["v"]["n_distinct"] == 2
    assert r["k"]["n_null"] == 0 and r["k"]["n_rows"] == 4


def test_profile_single_scan(spark, sf_dir):
    # ONE aggregation over ONE scan: no join/union of per-column jobs
    df = load_table(spark, sf_dir, "orders")
    s = profile_table(df, ["o_orderkey", "o_totalprice"])._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert s.count("Scan parquet") == 1, s
    assert "Join" not in s and "Union" not in s


def test_profile_validation(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError, match="not in frame"):
        profile_table(df, ["nope"])
    with pytest.raises(ValueError, match="no columns"):
        profile_table(df, [])


# ---------------------------------------------------------------- HLL


def test_hll_union_equals_direct_sketch(spark, sf_dir):
    # sketch per orderstatus, roll up to global == sketch built globally;
    # identical binary state => identical estimate (not just "close")
    df = load_table(spark, sf_dir, "orders")
    fine = distinct_sketches(df, "o_custkey", ["o_orderstatus"], lgk=12)
    rolled = rollup_sketches(fine, []).collect()[0]["approx_distinct"]
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("o_custkey", F.lit(12))).alias("e")
    ).collect()[0]["e"]
    assert rolled == direct


def test_hll_rollup_reasonable_and_monotone(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders")
    exact = df.select("o_custkey").distinct().count()
    got = approx_distinct_rollup(df, "o_custkey", ["o_orderstatus"], []).collect()[0][
        "approx_distinct"
    ]
    assert abs(got - exact) / exact < 0.05
    # per-group estimates each bounded by their group's exact count error
    per = {
        r["o_orderstatus"]: r["approx_distinct"]
        for r in approx_distinct_rollup(
            df, "o_custkey", ["o_orderstatus"], ["o_orderstatus"]
        ).collect()
    }
    ex = {
        r["o_orderstatus"]: r["n"]
        for r in df.groupBy("o_orderstatus")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    for k, v in per.items():
        assert abs(v - ex[k]) / max(ex[k], 1) < 0.08


def test_hll_validation(spark, sf_dir):
    df = load_table(spark, sf_dir, "orders")
    with pytest.raises(ValueError, match="lgk"):
        distinct_sketches(df, "o_custkey", ["o_orderstatus"], lgk=2)
    with pytest.raises(ValueError, match="subset"):
        approx_distinct_rollup(df, "o_custkey", ["o_orderstatus"], ["o_orderpriority"])


# ------------------------------------------------------- histogram / top-k


def test_histogram_matches_duckdb_bin_by_bin(spark, sf_dir):
    from shardpack_spark.operators.profile import histogram

    lo, hi, n = -1000.0, 10000.0, 13  # uneven width exercises IEEE floor
    got = {
        r["bin"]: r["cnt"]
        for r in histogram(
            load_table(spark, sf_dir, "orders"), "o_totalprice", lo, hi, n
        ).collect()
    }
    w = (hi - lo) / n
    con = duckdb.connect()
    exp = dict(
        con.execute(
            f"""SELECT LEAST(GREATEST(FLOOR((CAST(o_totalprice AS DOUBLE) - {lo}) / {w}), 0), {n - 1}) AS bin,
                       COUNT(*) AS cnt
                FROM '{os.path.join(sf_dir, "orders.parquet")}'
                WHERE o_totalprice IS NOT NULL GROUP BY 1"""
        ).fetchall()
    )
    assert sum(got.values()) == sum(exp.values())
    for b in range(n):
        assert got[b] == exp.get(b, 0), f"bin {b}"


def test_histogram_clamps_and_fills_empty_bins(spark):
    from shardpack_spark.operators.profile import histogram

    df = spark.createDataFrame([(-50.0,), (0.0,), (5.0,), (999.0,), (None,)], "x double")
    rows = histogram(df, "x", 0.0, 10.0, 5).collect()
    assert [r["bin"] for r in rows] == [0, 1, 2, 3, 4]
    by = {r["bin"]: r["cnt"] for r in rows}
    assert by[0] == 2  # -50 clamps into bin 0, plus 0.0
    assert by[4] == 1  # 999 clamps into the top bin
    assert by[2] == 1 and by[1] == 0 and by[3] == 0
    assert sum(by.values()) == 4  # NULL dropped


def test_frequent_values_matches_duckdb(spark, sf_dir):
    from shardpack_spark.operators.profile import frequent_values

    got = [
        (r["value"], r["cnt"])
        for r in frequent_values(load_table(spark, sf_dir, "orders"), "o_orderpriority", 3).collect()
    ]
    con = duckdb.connect()
    exp = con.execute(
        f"""SELECT o_orderpriority, COUNT(*) AS cnt
            FROM '{os.path.join(sf_dir, "orders.parquet")}'
            WHERE o_orderpriority IS NOT NULL
            GROUP BY 1 ORDER BY cnt DESC, o_orderpriority LIMIT 3"""
    ).fetchall()
    assert got == exp


def test_numeric_quantiles_exact_matches_duckdb(spark, sf_dir):
    from shardpack_spark.operators.profile import numeric_quantiles

    probs = [0.1, 0.5, 0.9]
    got = {
        (r["column"], r["prob"]): r["value"]
        for r in numeric_quantiles(
            load_table(spark, sf_dir, "orders"), ["o_totalprice", "o_custkey"], probs, exact=True
        ).collect()
    }
    con = duckdb.connect()
    pq = os.path.join(sf_dir, "orders.parquet")
    for c in ["o_totalprice", "o_custkey"]:
        for p in probs:
            (exp,) = con.execute(
                f"SELECT quantile_cont(CAST({c} AS DOUBLE), {p}) FROM '{pq}'"
            ).fetchone()
            assert got[(c, p)] == exp, (c, p, got[(c, p)], exp)


def test_numeric_quantiles_approx_bounded(spark, sf_dir):
    from shardpack_spark.operators.profile import numeric_quantiles

    df = load_table(spark, sf_dir, "orders")
    rows = numeric_quantiles(df, ["o_totalprice"], [0.25, 0.5, 0.75]).collect()
    vals = {r["prob"]: r["value"] for r in rows}
    assert vals[0.25] <= vals[0.5] <= vals[0.75]
    mn, mx = df.agg(F.min("o_totalprice"), F.max("o_totalprice")).collect()[0]
    assert mn <= vals[0.25] and vals[0.75] <= mx
    with pytest.raises(ValueError, match="probs"):
        numeric_quantiles(df, ["o_totalprice"], [1.5])


# ---------------------------------------------------------------- count-min


def _exact_counts(spark, sf_dir, col):
    return {
        r["value"]: r["n"]
        for r in load_table(spark, sf_dir, "orders")
        .groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def test_cms_overestimates_never_under(spark, sf_dir):
    from shardpack_spark.operators.approx import cms_build, cms_estimate

    orders = load_table(spark, sf_dir, "orders")
    sk = cms_build(orders, "o_orderpriority", width=64, depth=3, seed=7)
    est = {
        r["value"]: r["est"]
        for r in cms_estimate(
            sk, orders.select("o_orderpriority"), "o_orderpriority"
        ).collect()
    }
    exact = _exact_counts(spark, sf_dir, "o_orderpriority")
    assert set(est) == set(exact)
    n_total = sum(exact.values())
    for v, e in est.items():
        assert e >= exact[v]          # CMS never underestimates
        assert e <= exact[v] + n_total  # trivial sanity ceiling


def test_cms_exact_when_wide(spark, sf_dir):
    # 5 distinct priorities vs width 4096: collision probability ~0 across
    # 5 rows of hashes -> the min-over-rows recovers exact counts
    from shardpack_spark.operators.approx import cms_build, cms_estimate

    orders = load_table(spark, sf_dir, "orders")
    sk = cms_build(orders, "o_orderpriority", width=4096, depth=5, seed=1)
    est = {
        r["value"]: r["est"]
        for r in cms_estimate(
            sk, orders.select("o_orderpriority"), "o_orderpriority"
        ).collect()
    }
    assert est == _exact_counts(spark, sf_dir, "o_orderpriority")


def test_cms_merge_equals_sketch_of_union(spark, sf_dir):
    from shardpack_spark.operators.approx import cms_build, cms_merge

    orders = load_table(spark, sf_dir, "orders")
    lo = orders.filter(F.col("o_orderkey") % 2 == 0)
    hi = orders.filter(F.col("o_orderkey") % 2 == 1)
    kw = dict(width=128, depth=4, seed=3)
    merged = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_merge(
            cms_build(lo, "o_custkey", **kw), cms_build(hi, "o_custkey", **kw)
        ).collect()
    }
    whole = {
        (r["row"], r["bucket"]): r["cnt"]
        for r in cms_build(orders, "o_custkey", **kw).collect()
    }
    assert merged == whole


def test_cms_absent_item_zero_when_wide(spark, sf_dir):
    from shardpack_spark.operators.approx import cms_build, cms_estimate

    orders = load_table(spark, sf_dir, "orders")
    sk = cms_build(orders, "o_orderpriority", width=4096, depth=5, seed=1)
    probe = spark.createDataFrame([("NO-SUCH-PRIORITY",)], "value string")
    [row] = cms_estimate(sk, probe, "value").collect()
    assert row["est"] == 0


def test_cms_mismatched_params_rejected(spark, sf_dir):
    from shardpack_spark.operators.approx import cms_build, cms_merge

    orders = load_table(spark, sf_dir, "orders")
    a = cms_build(orders, "o_orderpriority", width=64, depth=3, seed=1)
    b = cms_build(orders, "o_orderpriority", width=128, depth=3, seed=1)
    with pytest.raises(ValueError, match="mismatched"):
        cms_merge(a, b).collect()
