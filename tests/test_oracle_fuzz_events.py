"""Adversarial-corpus fuzz for the EVENTS query family: windows,
sessionization, as-of, rollups, ordered aggregates, and the scalar
functions must hash-match DuckDB on synthetic event streams.

The generator stays in the driver envelope (5 event types, {"k": int}
props JSON, ~1 month of micro-timestamps) while adding what the driver
generator never emits: EXACT-DUPLICATE timestamps within a user (the
tie-break stress for every window/rank query), same-instant events
across users, bursts inside one session gap, and value extremes.
"""

from __future__ import annotations

import datetime as dt
import os
import random

import pytest

pytestmark = pytest.mark.slow  # heavy family: deselect with -m 'not slow'

from shardpack_spark.oracle import run_declared_query

QUERIES = [
    "q11_asof_join",
    "q16_window_rank",
    "q21_date_funcs",
    "q24_json_funcs",
    "q25_time_windows",
    "q27_session_window",
    "q42_window_analytics",
    "q44_ordered_aggs",
    "q54_hypertable_rollup",
    "q56_sessionize",
]

TYPES = ["click", "view", "purchase", "signup", "error"]


def _events(rng) -> list[tuple]:
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for _ in range(400):
        eid += 1
        ts = base + dt.timedelta(
            days=rng.randrange(30),
            seconds=rng.randrange(86400),
            microseconds=rng.randrange(1_000_000),
        )
        rows.append(
            (
                eid,
                ts,
                rng.randrange(1, 41),
                rng.choice(TYPES),
                round(rng.uniform(-10.0, 500.0), 3),
                f'{{"k": {rng.randrange(100)}}}',
            )
        )
    # duplicate-timestamp stress: same user, same instant, two events
    for i in range(10):
        eid += 1
        src = rows[rng.randrange(len(rows))]
        rows.append((eid, src[1], src[2], rng.choice(TYPES), 1.0, '{"k": 0}'))
    # cross-user same-instant events
    shared = base + dt.timedelta(days=15, seconds=3600)
    for u in (1, 2, 3):
        eid += 1
        rows.append((eid, shared, u, "click", 2.5, '{"k": 7}'))
    return rows


@pytest.mark.parametrize("seed", [5, 2026])
@pytest.mark.parametrize("name", QUERIES)
def test_events_oracle_on_adversarial_streams(spark, tmp_path, name, seed):
    import duckdb

    d = str(tmp_path / f"ev_{seed}")
    os.makedirs(d, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
        "event_type VARCHAR, value DOUBLE, props VARCHAR)"
    )
    con.executemany(
        "INSERT INTO events VALUES (?, ?, ?, ?, ?, ?)", _events(random.Random(seed))
    )
    con.execute(f"COPY events TO '{d}/events.parquet' (FORMAT parquet)")
    con.close()
    from shardpack_spark.tables import TABLE_NAMES

    base_sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    for t in TABLE_NAMES:
        p = os.path.join(d, f"{t}.parquet")
        if not os.path.exists(p):
            os.symlink(os.path.join(base_sf, f"{t}.parquet"), p)

    r = run_declared_query(spark, name, d)
    assert r is not None
    assert r.columns_match, f"{name}: {r.spark_cols} vs {r.oracle_cols}"
    assert r.spark_rows == r.oracle_rows, f"{name}: {r.spark_rows} vs {r.oracle_rows}"
    assert r.hash_match, f"{name} diverged on seed {seed}: {r.diff_sample}"


EMB_QUERIES = ["q30b_ann_suite", "q38_embedding_near_dup", "q61_kmeans_semdedup"]


@pytest.mark.parametrize("seed", [3, 2026])
@pytest.mark.parametrize("name", EMB_QUERIES)
def test_embeddings_oracle_on_adversarial_vectors(spark, tmp_path, name, seed):
    """Synthetic embedding tables: clustered groups (so near-dup pairs and
    k-means structure exist), exact-duplicate vectors, a zero-ish vector,
    and antipodal pairs — FLOAT32-quantized like the driver data."""
    import struct as _struct

    import duckdb

    rng = random.Random(seed)
    dim = 64

    def f32(x):
        return _struct.unpack("f", _struct.pack("f", x))[0]

    def vec(center=None, spread=0.05):
        v = [
            f32((center[i] if center else 0.0) + rng.uniform(-spread, spread))
            for i in range(dim)
        ]
        return v

    centers = [[rng.uniform(-0.2, 0.2) for _ in range(dim)] for _ in range(6)]
    rows = []
    vid = 0
    for c in centers:
        for _ in range(12):
            rows.append((vid, vec(c), rng.randrange(10))); vid += 1
    # exact duplicates (near-dup must flag), near-zero, antipodal pair
    rows.append((vid, list(rows[0][1]), 1)); vid += 1
    rows.append((vid, [f32(1e-6)] * dim, 2)); vid += 1
    base = vec(centers[0])
    rows.append((vid, base, 3)); vid += 1
    rows.append((vid, [f32(-x) for x in base], 4)); vid += 1

    d = str(tmp_path / f"emb_{seed}")
    os.makedirs(d, exist_ok=True)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings (vec_id BIGINT, embedding FLOAT[], label INTEGER)"
    )
    con.executemany("INSERT INTO embeddings VALUES (?, ?, ?)", rows)
    con.execute(f"COPY embeddings TO '{d}/embeddings.parquet' (FORMAT parquet)")
    con.close()
    from shardpack_spark.tables import TABLE_NAMES

    base_sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    for t in TABLE_NAMES:
        p = os.path.join(d, f"{t}.parquet")
        if not os.path.exists(p):
            os.symlink(os.path.join(base_sf, f"{t}.parquet"), p)

    r = run_declared_query(spark, name, d)
    assert r is not None
    assert r.columns_match, f"{name}: {r.spark_cols} vs {r.oracle_cols}"
    assert r.spark_rows == r.oracle_rows, f"{name}: {r.spark_rows} vs {r.oracle_rows}"
    assert r.hash_match, f"{name} diverged on seed {seed}: {r.diff_sample}"
