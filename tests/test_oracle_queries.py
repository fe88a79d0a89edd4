"""Every declared query with an oracle must hash-match DuckDB (driver t2 gate).

This is the same comparison the driver performs at sf0.01; tests default to
sf0.001 for speed (override with SPARK_GRAFT_TEST_SF_DIR).
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy family: deselect with -m 'not slow'

from shardpack_spark.oracle import run_declared_query
from shardpack_spark.queries import load_all

ALL = load_all()
WITH_ORACLE = sorted(name for name, q in ALL.items() if q.oracle is not None)
ROWS_ONLY = sorted(name for name, q in ALL.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, sf_dir, name):
    res = run_declared_query(spark, name, sf_dir)
    assert res is not None
    assert res.columns_match, f"{name}: columns {res.spark_cols} vs {res.oracle_cols}"
    assert res.spark_rows == res.oracle_rows, f"{name}: rows {res.spark_rows} vs {res.oracle_rows}"
    assert res.hash_match, f"{name}: value mismatch; sample: {res.diff_sample}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    df = ALL[name].builder(spark, sf_dir)
    assert df.count() >= 0
