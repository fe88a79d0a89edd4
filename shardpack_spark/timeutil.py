"""Temporal-to-numeric conversions that tolerate TIMESTAMP_NTZ inputs.

Spark allows ``TIMESTAMP -> LONG/DOUBLE`` casts but rejects the same casts
from ``TIMESTAMP_NTZ`` (and ``DATE``).  Parquet written with naive
timestamps loads as TIMESTAMP_NTZ, so every epoch-math site routes through
an explicit ``cast("timestamp")`` first — a no-op for TIMESTAMP columns,
and a deterministic UTC interpretation for NTZ/DATE because the session
timezone is pinned to UTC in :mod:`shardpack_spark.session`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts_seconds(col: Column) -> Column:
    """Epoch seconds (long) of any timestamp-like column."""
    return col.cast("timestamp").cast("long")


def ts_micros(col: Column) -> Column:
    """Epoch microseconds (long) of any timestamp-like column."""
    return F.unix_micros(col.cast("timestamp"))
