"""Declared-query registry.

Every operator we claim as implemented (SURVEY.md §2B) registers here with
BOTH a Spark DataFrame builder and (when SQL-expressible) the equivalent
DuckDB oracle SQL.  ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin
views over this registry, which guarantees the two never drift apart.

Canonicalization (FIXTURES.md):
  1. deterministic output (unique key columns or explicit total order),
  2. money/qty aggregates computed on DECIMAL(18,4), output ROUND(.., 2)
     after CAST to DOUBLE,
  3. timestamps output as CAST(ts AS DATE) or epoch seconds,
  4. similarity scores ROUND(.., 4).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryBuilder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class DeclaredQuery:
    name: str
    builder: QueryBuilder
    oracle: str | None  # DuckDB SQL; None -> driver does a rows-only check
    doc: str = ""


REGISTRY: dict[str, DeclaredQuery] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` as a declared query."""

    def deco(fn: QueryBuilder) -> QueryBuilder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = DeclaredQuery(name=name, builder=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, DeclaredQuery]:
    """Import every query module so the registry is fully populated."""
    from shardpack_spark.queries import (  # noqa: F401
        format_queries,
        llm,
        llm_ext,
        pipeline,
        pivot_explode,
        relational,
        relational_ext,
        streaming_batch,
        tpch_shapes,
    )

    return REGISTRY
