"""Funnel + gap-fill analytics operators: hand-built truths and a DuckDB
cross-check over the events table."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from shardpack_spark.operators.analytics import funnel, gap_fill


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, datetime(2025, 1, 1, h, m), e, float(v)) for u, h, m, e, v in rows],
        ["user_id", "ts", "event_type", "value"],
    )


US = 1_000_000


def test_funnel_depths_and_ordering(spark):
    rows = [
        # u1: full funnel in order
        (1, 9, 0, "view", 0), (1, 9, 10, "cart", 0), (1, 9, 20, "buy", 0),
        # u2: buy BEFORE cart -> only view+cart counts, buy isn't after cart
        (2, 9, 0, "view", 0), (2, 9, 5, "buy", 0), (2, 9, 10, "cart", 0),
        # u3: never viewed -> depth 0 even though cart/buy exist
        (3, 9, 0, "cart", 0), (3, 9, 5, "buy", 0),
        # u4: view only
        (4, 10, 0, "view", 0),
        # u5: same-timestamp step2 is NOT strictly after step1
        (5, 9, 0, "view", 0), (5, 9, 0, "cart", 0),
    ]
    out = {
        r["user_id"]: r
        for r in funnel(_ev(spark, rows), ["view", "cart", "buy"]).collect()
    }
    assert out[1]["steps_completed"] == 3
    assert out[2]["steps_completed"] == 2
    assert out[3]["steps_completed"] == 0
    assert out[4]["steps_completed"] == 1
    assert out[5]["steps_completed"] == 1
    # anchors: u1 t_first=9:00, t_last=9:20
    assert out[1]["t_last"] - out[1]["t_first"] == 20 * 60 * US
    assert out[3]["t_first"] is None and out[3]["t_last"] is None
    assert out[4]["t_first"] == out[4]["t_last"]


def test_funnel_within_horizon(spark):
    rows = [
        (1, 9, 0, "view", 0), (1, 9, 10, "cart", 0), (1, 11, 0, "buy", 0),
    ]
    # 30-minute horizon: buy at +2h is out
    out = funnel(
        _ev(spark, rows), ["view", "cart", "buy"], within_seconds=1800
    ).collect()[0]
    assert out["steps_completed"] == 2
    # generous horizon: full depth
    out2 = funnel(
        _ev(spark, rows), ["view", "cart", "buy"], within_seconds=4 * 3600
    ).collect()[0]
    assert out2["steps_completed"] == 3


def test_gap_fill_methods(spark):
    # one key, observations at minutes 0, 3 (values 10, 40); grid = 1 min
    rows = [(1, 9, 0, "m", 10), (1, 9, 3, "m", 40)]
    df = _ev(spark, rows)

    def vals(method):
        out = gap_fill(df, 60, by="user_id", method=method).orderBy("bucket")
        return [r["value"] for r in out.collect()]

    assert vals("null") == [10.0, None, None, 40.0]
    assert vals("zero") == [10.0, 0.0, 0.0, 40.0]
    assert vals("locf") == [10.0, 10.0, 10.0, 40.0]
    assert vals("linear") == [10.0, 20.0, 30.0, 40.0]


def test_gap_fill_head_and_multiple_keys(spark):
    rows = [
        (1, 9, 0, "m", 5), (1, 9, 2, "m", 7),
        (2, 9, 30, "m", 1),  # single observation: spine of length 1
    ]
    out = gap_fill(_ev(spark, rows), 60, by="user_id", method="linear")
    got = {(r["user_id"], r["bucket"]): r["value"] for r in out.collect()}
    assert len([k for k in got if k[0] == 1]) == 3
    assert len([k for k in got if k[0] == 2]) == 1
    u1 = sorted(v for (u, _), v in got.items() if u == 1)
    assert u1 == [5.0, 6.0, 7.0]


def test_gap_fill_matches_duckdb_on_events(spark, sf_dir):
    """Hourly LOCF gap-fill of per-user mean value cross-checked against a
    DuckDB reimplementation (spine via generate_series)."""
    import duckdb

    from shardpack_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    got = {
        (r["user_id"], r["bucket"]): round(r["value"], 6)
        for r in gap_fill(ev, 3600, by="user_id", method="locf").collect()
        if r["value"] is not None
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    q = """
    WITH src AS (
      SELECT user_id,
             CAST((CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) // 3600) * 3600 AS BIGINT) * 1000000 AS bucket,
             AVG(CAST(value AS DOUBLE)) AS v
      FROM events WHERE user_id < 20 GROUP BY 1, 2
    ), span AS (
      SELECT user_id, MIN(bucket) b0, MAX(bucket) b1 FROM src GROUP BY 1
    ), spine AS (
      SELECT user_id, UNNEST(generate_series(b0, b1, 3600000000)) AS bucket
      FROM span
    ), grid AS (
      SELECT s.user_id, s.bucket, src.v
      FROM spine s LEFT JOIN src ON src.user_id = s.user_id AND src.bucket = s.bucket
    )
    SELECT user_id, bucket,
           LAST_VALUE(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
    FROM grid
    """
    want = {
        (int(u), int(b)): round(v, 6)
        for u, b, v in con.execute(q).fetchall()
        if v is not None
    }
    assert got == want
    assert len(got) > 50


def test_retention_matches_duckdb(spark, sf_dir):
    """Weekly cohort retention cross-checked against a DuckDB
    reimplementation over the events table."""
    import duckdb

    from shardpack_spark.operators.analytics import retention
    from shardpack_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    got = {
        (r["cohort"], r["period_offset"]): r["active_entities"]
        for r in retention(ev, period_seconds=7 * 86400, max_periods=8).collect()
    }

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    q = """
    WITH act AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 604800) AS BIGINT) AS p
      FROM events
    ), first AS (
      SELECT user_id, MIN(p) AS cohort FROM act GROUP BY 1
    )
    SELECT f.cohort, CAST(a.p - f.cohort AS INT) AS off, COUNT(*) AS n
    FROM act a JOIN first f USING (user_id)
    WHERE a.p - f.cohort <= 8
    GROUP BY 1, 2
    """
    want = {(int(c), int(o)): int(n) for c, o, n in con.execute(q).fetchall()}
    assert got == want
    # offset 0 rows are the cohort sizes; every cohort must have one
    cohorts = {c for c, _ in got}
    assert all((c, 0) in got for c in cohorts)
