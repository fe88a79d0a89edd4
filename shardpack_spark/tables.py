"""Loaders for the driver's parquet tables (see TESTDATA.md / FIXTURES.md).

``load_tables`` returns plain DataFrames; ``register_views`` additionally
registers them as temp views so ``spark.sql`` text queries can reference the
same names the DuckDB oracle uses.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Per-session DataFrame cache: the driver's test tables are immutable,
    # so re-resolving the file listing and parquet footer on every builder
    # call is pure overhead (~0.1 s per table per query on local[32]).
    # This is what a table catalog/metastore gives you on a real cluster —
    # resolve once, reuse the analyzed relation.  The cache lives on the
    # session object so it dies with the session.
    cache = getattr(spark, "_shardpack_table_cache", None)
    if cache is None:
        cache = {}
        spark._shardpack_table_cache = cache
    key = (sf_dir, name)
    cached = cache.get(key)
    if cached is not None:
        return cached
    df = _load_table_uncached(spark, sf_dir, name)
    cache[key] = df
    return df


def _load_table_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is TIMESTAMP(NANOS), which Spark rejects unless this
        # (runtime-settable) conf is on — set it defensively so builders
        # work on ANY session, not just ours (the driver brings its own).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # ts is TIMESTAMP(NANOS) in the parquet footer; with
        # spark.sql.legacy.parquet.nanosAsLong it surfaces as long
        # nanoseconds.  Truncate to micros (what DuckDB's TIMESTAMP cast
        # does) and restore a proper timestamp column.
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
