"""Canonicalization helpers shared by all declared queries.

The DuckDB oracle comparison is an order-insensitive value-hash over the
result set, so the only way Spark and DuckDB agree is if every value is
bit-identical.  Rules (FIXTURES.md §Canonicalization):

- money/quantity aggregates: compute on DECIMAL(18,4) (exact), then
  ``ROUND(CAST(x AS DOUBLE), 2)`` — decimal arithmetic is exact in both
  engines, and the final double cast is IEEE-deterministic.
- averages: exact decimal SUM cast to DOUBLE, divided by COUNT — both
  engines then perform the identical IEEE division.
- timestamps: output CAST(ts AS DATE) or epoch seconds (UTC session tz).
- similarity scores: ROUND(.., 4) after an identical left-fold accumulation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def dec(col: str | Column) -> Column:
    """Exact-decimal view of a double money/qty column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC)


def money2(c: Column) -> Column:
    """Canonical 2-dp money output.

    Round in the EXACT decimal domain (HALF_UP in both engines), then cast
    the already-2dp value to double — rounding after a double cast is
    engine-dependent at .xx5 boundaries.
    """
    return F.round(c, 2).cast("double")


def round4d(c: Column) -> Column:
    """Deterministic 4-dp rounding of a DOUBLE.

    ``floor(x*10000 + 0.5)/10000`` is a fixed IEEE op sequence, so Spark and
    DuckDB produce bit-identical results — unlike ROUND(double, n), whose
    half-way behavior differs between engines.
    """
    return F.floor(c * F.lit(10000.0) + F.lit(0.5)) / F.lit(10000.0)


def score4(c: Column) -> Column:
    """Canonical 4-dp similarity/score output (double domain)."""
    return round4d(c.cast("double"))


def as_date(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("date")


def epoch_s(c: Column) -> Column:
    """Epoch seconds of a timestamp (UTC session timezone)."""
    return c.cast("long")
