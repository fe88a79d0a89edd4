"""KLL quantile sketches + theta set-algebra sketches.

Below their retention thresholds both sketch families are EXACT, which
gives deterministic oracle tests; above threshold the KLL rank-error
bound is asserted with generous slack (the theoretical normalized rank
error at k=200 is ~1.65%).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from shardpack_spark.operators.approx import (
    quantile_sketches,
    rollup_quantiles,
    theta_rollup,
    theta_set_estimate,
    theta_sketches,
)
from shardpack_spark.tables import load_table


def _inclusive_quantile(vals: list, q: float):
    """DataSketches inclusive rule: smallest value whose normalized rank
    >= q (q=0 -> min)."""
    s = sorted(vals)
    if q <= 0:
        return s[0]
    return s[math.ceil(q * len(s)) - 1]


def test_kll_exact_below_k_per_group(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sk = quantile_sketches(docs, "n_chars", ["lang"], k=200, dtype="bigint")
    got = {
        r["lang"]: (r["p0"], r["p50"], r["p90"], r["p100"])
        for r in rollup_quantiles(sk, ["lang"], quantiles=[0.0, 0.5, 0.9, 1.0]).collect()
    }
    by_lang: dict[str, list] = {}
    for r in docs.select("lang", "n_chars").collect():
        by_lang.setdefault(r["lang"], []).append(r["n_chars"])
    assert set(got) == set(by_lang)
    for lang, vals in by_lang.items():
        # every group is smaller than k -> the sketch stores all values
        assert len(vals) < 200
        want = tuple(_inclusive_quantile(vals, q) for q in (0.0, 0.5, 0.9, 1.0))
        assert got[lang] == want, lang


def test_kll_merge_equals_direct_sketch_below_k(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    fine = quantile_sketches(docs, "n_chars", ["lang", "source"], dtype="bigint")
    rolled = {
        r["lang"]: (r["p50"], r["p99"])
        for r in rollup_quantiles(fine, ["lang"], quantiles=[0.5, 0.99]).collect()
    }
    direct_sk = quantile_sketches(docs, "n_chars", ["lang"], dtype="bigint")
    direct = {
        r["lang"]: (r["p50"], r["p99"])
        for r in rollup_quantiles(direct_sk, ["lang"], quantiles=[0.5, 0.99]).collect()
    }
    # merge-of-fine-sketches answers exactly like sketching the group
    # directly while everything is below the k threshold
    assert rolled == direct


def test_kll_rank_error_bound_at_scale(spark):
    n = 50_000
    # deterministic skewed data: squares spread the mass unevenly
    df = spark.range(n).selectExpr("CAST(id * id % 9973 AS DOUBLE) AS v")
    sk = quantile_sketches(df, "v", [], k=200, dtype="double")
    row = rollup_quantiles(sk, [], quantiles=[0.25, 0.5, 0.95]).head()
    vals = sorted(r["v"] for r in df.collect())
    for q, est in ((0.25, row["p25"]), (0.5, row["p50"]), (0.95, row["p95"])):
        # true normalized rank of the estimate must be near q: allow 5%
        # (3x the theoretical ~1.65% bound at k=200, so no flakiness)
        import bisect

        rank = bisect.bisect_right(vals, est) / n
        assert abs(rank - q) < 0.05, (q, est, rank)


def test_kll_dtype_tag_guard(spark):
    df = spark.range(10).selectExpr("CAST(id AS DOUBLE) AS v", "id % 2 AS g")
    sk_d = quantile_sketches(df, "v", ["g"], dtype="double")
    sk_b = quantile_sketches(df, "v", ["g"], dtype="bigint")
    with pytest.raises(ValueError, match="mixed sketch dtypes"):
        rollup_quantiles(sk_d.unionByName(sk_b), ["g"])
    with pytest.raises(ValueError, match="dtype"):
        quantile_sketches(df, "v", [], dtype="decimal")
    with pytest.raises(ValueError, match="__kll_dtype"):
        rollup_quantiles(sk_d.drop("__kll_dtype"), ["g"])


def test_theta_set_algebra_exact_below_threshold(spark):
    a = theta_sketches(spark.range(0, 3000).selectExpr("id AS k", "id % 2 AS g"), "k", ["g"])
    b = theta_sketches(
        spark.range(2000, 5000).selectExpr("id AS k", "id % 2 AS g"), "k", ["g"]
    )
    rows = {r["g"]: r for r in theta_set_estimate(a, b, ["g"]).collect()}
    # per parity group: a = {0..2999 with parity}, b = {2000..4999}
    for g in (0, 1):
        assert rows[g]["union_est"] == pytest.approx(2500)
        assert rows[g]["intersect_est"] == pytest.approx(500)
        assert rows[g]["a_not_b_est"] == pytest.approx(1000)
        assert rows[g]["jaccard_est"] == pytest.approx(0.2)


def test_theta_rollup_union_exact(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    fine = theta_sketches(docs, "doc_id", ["lang", "source"])
    total = theta_rollup(fine, []).head()["approx_distinct"]
    assert total == docs.select("doc_id").distinct().count()


def test_kll_streaming_windowed_quantiles(spark, sf_dir, tmp_path):
    """The sketch family composes with Structured Streaming: per-hour KLL
    sketches built by a streaming aggregation answer the same quantiles
    as the batch computation (exact below k, so equality is literal)."""
    from tests.test_streaming import EVENT_SCHEMA

    events = load_table(spark, sf_dir, "events")
    src = tmp_path / "events_json"
    src.mkdir()
    events.coalesce(1).write.mode("overwrite").json(str(src))

    stream = spark.readStream.schema(EVENT_SCHEMA).json(str(src))
    q = (
        stream.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.kll_sketch_agg_double("value").alias("__kll_sketch"))
        .writeStream.format("memory")
        .queryName("t_kll_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"
    got = {
        (r["w"]["start"], r["p50"]): None
        for r in spark.sql(
            "SELECT w, kll_sketch_get_quantile_double(__kll_sketch, 0.5) AS p50"
            " FROM t_kll_stream"
        ).collect()
    }
    by_hour: dict = {}
    for r in events.select(F.date_trunc("hour", "ts").alias("h"), "value").collect():
        by_hour.setdefault(r["h"], []).append(r["value"])
    want = {
        (h, _inclusive_quantile(vals, 0.5)): None for h, vals in by_hour.items()
    }
    assert got == want


def test_theta_overlap_on_real_text(spark, sf_dir):
    """Distinct-text overlap between two languages, vs the exact join."""
    docs = load_table(spark, sf_dir, "documents")
    en = docs.where("lang = 'en'")
    de = docs.where("lang = 'de'")
    got = theta_set_estimate(
        theta_sketches(en.selectExpr("text", "1 AS g"), "text", ["g"]),
        theta_sketches(de.selectExpr("text", "1 AS g"), "text", ["g"]),
        ["g"],
    ).head()
    exact_inter = (
        en.select("text").distinct().join(de.select("text").distinct(), "text").count()
    )
    exact_union = (
        en.select("text").union(de.select("text")).distinct().count()
    )
    assert got["intersect_est"] == pytest.approx(exact_inter)
    assert got["union_est"] == pytest.approx(exact_union)
