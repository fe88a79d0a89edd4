"""DuckDB-oracle comparison harness.

Mimics the driver's t2 check: run the Spark builder and the oracle SQL over
the same parquet tables, then compare row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by their
canonical serialization, NULL as ``\\N``).
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import math
from dataclasses import dataclass

import duckdb
from pyspark.sql import DataFrame, SparkSession

from shardpack_spark.tables import TABLE_NAMES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')")
    return con


def _canon_value(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            v = 0.0  # collapse -0.0
        return repr(v)
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon_value(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("\x1f".join(_canon_value(r[i]) for i in order) for r in rows)


def value_hash(columns: list[str], rows: list[tuple]) -> str:
    h = hashlib.sha256()
    for line in canonical_rows(columns, rows):
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


@dataclass
class CompareResult:
    name: str
    spark_rows: int
    oracle_rows: int
    columns_match: bool
    hash_match: bool
    spark_cols: list[str]
    oracle_cols: list[str]
    diff_sample: list[str]

    @property
    def ok(self) -> bool:
        return self.columns_match and self.hash_match and self.spark_rows == self.oracle_rows


def compare(
    name: str,
    spark_df: DataFrame,
    oracle_sql: str,
    con: duckdb.DuckDBPyConnection,
) -> CompareResult:
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = list(spark_df.columns)
    cur = con.execute(oracle_sql)
    o_cols = [d[0] for d in cur.description]
    o_rows = [tuple(r) for r in cur.fetchall()]

    s_canon = canonical_rows(s_cols, s_rows)
    o_canon = canonical_rows(o_cols, o_rows)
    diff: list[str] = []
    if s_canon != o_canon:
        s_set, o_set = set(s_canon), set(o_canon)
        for line in list(s_set - o_set)[:3]:
            diff.append(f"spark-only: {line}")
        for line in list(o_set - s_set)[:3]:
            diff.append(f"oracle-only: {line}")
        if not diff:
            diff.append("duplicate-count mismatch (same value sets)")
    return CompareResult(
        name=name,
        spark_rows=len(s_rows),
        oracle_rows=len(o_rows),
        columns_match=sorted(s_cols) == sorted(o_cols),
        hash_match=s_canon == o_canon,
        spark_cols=s_cols,
        oracle_cols=o_cols,
        diff_sample=diff,
    )


def run_declared_query(spark: SparkSession, name: str, sf_dir: str) -> CompareResult | None:
    """Run one registry entry against its oracle; None if it has no oracle."""
    from shardpack_spark.queries import load_all

    q = load_all()[name]
    if q.oracle is None:
        return None
    con = duckdb_connection(sf_dir)
    try:
        return compare(name, q.builder(spark, sf_dir), q.oracle, con)
    finally:
        con.close()
