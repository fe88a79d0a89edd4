"""Adversarial-corpus fuzz for the RELATIONAL query family: every
TPC-H-shaped query must hash-match DuckDB on synthetic micro-tables,
not just the driver's generator distribution.

The generator keeps the driver schema's invariants (unique primary
keys, valid FKs, enum values the queries actually filter on — BUILDING,
ASIA, returnflag R) while pushing where the generator never goes:
negative balances, zero-discount and max-discount lines, .xx5 money
boundaries, customers with no orders, orders with no lineitems,
suppliers local and non-local to the customer nation.
"""

from __future__ import annotations

import datetime as dt
import os
import random

import pytest

pytestmark = pytest.mark.slow  # heavy family: deselect with -m 'not slow'

from shardpack_spark.oracle import run_declared_query

QUERIES = [
    "q01_scan_count",
    "q03_project_filter",
    "q05_join_inner",
    "q07_join_left",
    "q08_semi_anti",
    "q10_join_theta",
    "q12_agg_tpch_q1",
    "q15_grouping_sets",
    "q18_topk",
    "q19_set_ops",
    "q20_string_funcs",
    "q22_math_funcs",
    "q23_array_funcs",
    "q45_outer_cross_subq",
    "q57_pivot",
    "q58_explode_lateral",
    "q50_tpch_q3_shape",
    "q51_tpch_q5_shape",
    "q52_tpch_shapes",
]

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _money(rng):
    # land SOME values exactly on .xx5 double boundaries
    if rng.random() < 0.15:
        return round(rng.randrange(1, 99999) / 10 + 0.005, 4)
    return round(rng.uniform(1.0, 99999.0), 2)


def _date(rng):
    start = dt.date(1992, 1, 1).toordinal()
    end = dt.date(1998, 12, 31).toordinal()
    return dt.date.fromordinal(rng.randrange(start, end))


def _build(con, rng):
    con.execute("CREATE TABLE region (r_regionkey INTEGER, r_name VARCHAR)")
    con.executemany("INSERT INTO region VALUES (?, ?)", list(enumerate(REGIONS)))
    nations = [(i, f"NATION{i:02d}", i % 5) for i in range(12)]
    con.execute(
        "CREATE TABLE nation (n_nationkey INTEGER, n_name VARCHAR, n_regionkey INTEGER)"
    )
    con.executemany("INSERT INTO nation VALUES (?, ?, ?)", nations)

    customers = [
        (
            i,
            f"Customer#{i:09d}",
            rng.randrange(12),
            round(rng.uniform(-999.99, 9999.99), 2),
            rng.choice(SEGMENTS),
        )
        for i in range(1, 31)
    ]
    con.execute(
        "CREATE TABLE customer (c_custkey BIGINT, c_name VARCHAR, "
        "c_nationkey INTEGER, c_acctbal DOUBLE, c_mktsegment VARCHAR)"
    )
    con.executemany("INSERT INTO customer VALUES (?, ?, ?, ?, ?)", customers)

    suppliers = [
        (i, f"Supplier#{i:09d}", rng.randrange(12), round(rng.uniform(-99.0, 9999.0), 2))
        for i in range(1, 9)
    ]
    con.execute(
        "CREATE TABLE supplier (s_suppkey BIGINT, s_name VARCHAR, "
        "s_nationkey INTEGER, s_acctbal DOUBLE)"
    )
    con.executemany("INSERT INTO supplier VALUES (?, ?, ?, ?)", suppliers)

    parts = [
        (
            i,
            f"part {i}",
            f"Brand#{rng.randrange(1, 6)}",
            rng.choice(["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY"]),
            rng.randrange(1, 50),
            _money(rng),
        )
        for i in range(1, 21)
    ]
    con.execute(
        "CREATE TABLE part (p_partkey BIGINT, p_name VARCHAR, p_brand VARCHAR, "
        "p_type VARCHAR, p_size INTEGER, p_retailprice DOUBLE)"
    )
    con.executemany("INSERT INTO part VALUES (?, ?, ?, ?, ?, ?)", parts)

    # customers 28-30 get no orders (q52's Q22 anti-join path)
    orders = [
        (
            i,
            rng.randrange(1, 28),
            rng.choice(["O", "F", "P"]),
            _money(rng),
            dt.datetime.combine(_date(rng), dt.time()),
            rng.choice(PRIORITIES),
        )
        for i in range(1, 61)
    ]
    con.execute(
        "CREATE TABLE orders (o_orderkey BIGINT, o_custkey BIGINT, "
        "o_orderstatus VARCHAR, o_totalprice DOUBLE, o_orderdate TIMESTAMP, "
        "o_orderpriority VARCHAR)"
    )
    con.executemany("INSERT INTO orders VALUES (?, ?, ?, ?, ?, ?)", orders)

    lineitems = []
    ln = 0
    for okey in range(1, 59):  # orders 59-60 get no lineitems
        for j in range(rng.randrange(1, 5)):
            ln += 1
            lineitems.append(
                (
                    okey,
                    rng.randrange(1, 21),
                    rng.randrange(1, 9),
                    j + 1,
                    float(rng.randrange(1, 51)),
                    _money(rng),
                    rng.choice([0.0, 0.01, 0.05, 0.1]),
                    rng.choice([0.0, 0.02, 0.08]),
                    rng.choice(["R", "A", "N"]),
                    rng.choice(["O", "F"]),
                    dt.datetime.combine(_date(rng), dt.time()),
                )
            )
    con.execute(
        "CREATE TABLE lineitem (l_orderkey BIGINT, l_partkey BIGINT, "
        "l_suppkey BIGINT, l_linenumber INTEGER, l_quantity DOUBLE, "
        "l_extendedprice DOUBLE, l_discount DOUBLE, l_tax DOUBLE, "
        "l_returnflag VARCHAR, l_linestatus VARCHAR, l_shipdate TIMESTAMP)"
    )
    con.executemany(
        "INSERT INTO lineitem VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?, ?, ?)", lineitems
    )


@pytest.mark.parametrize("seed", [11, 2026])
@pytest.mark.parametrize("name", QUERIES)
def test_relational_oracle_on_adversarial_tables(spark, tmp_path, name, seed):
    import duckdb

    d = str(tmp_path / f"rel_{seed}")
    os.makedirs(d, exist_ok=True)
    con = duckdb.connect()
    _build(con, random.Random(seed))
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
        con.execute(f"COPY {t} TO '{d}/{t}.parquet' (FORMAT parquet)")
    con.close()
    # untouched tables: symlink the real sf0.001 files
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
