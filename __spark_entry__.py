"""Driver contract for the spark-graft builder (PySpark target).

Thin views over ``shardpack_spark.queries.REGISTRY`` — every declared query
carries its Spark builder and DuckDB oracle SQL side by side, so
``queries()`` and ``oracle_sql()`` can never drift apart.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from shardpack_spark.queries import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 shape) on /root/testdata/sf0.001."""
    registry = load_all()
    return registry["q12_agg_tpch_q1"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.builder for name, q in sorted(load_all().items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable declared query."""
    return {name: q.oracle for name, q in sorted(load_all().items()) if q.oracle is not None}
