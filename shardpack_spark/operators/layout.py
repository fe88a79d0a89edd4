"""Z-order (Morton) data layout for multi-column pruning.

A 100 TB table sorted by one column prunes scans on that column only;
queries filtering on OTHER columns read everything.  Interleaving the
bits of several columns' bucket ids into one Morton key and
range-partitioning on it clusters rows so that EVERY interleaved column
is locally correlated with file/partition boundaries — parquet min/max
row-group stats then prune multi-dimensional predicates (the same layout
trick Delta/Iceberg expose as ``OPTIMIZE ZORDER BY``).

Shape: one tiny min/max aggregate per column (driver receives 2 values
per column — same footprint as the IVF centroid collect), a codegen
bucket+interleave expression, then ONE range exchange + in-partition
sort.  No UDFs, no second scan of the data.

Bucketing is linear min-max scaling by default; for heavily skewed
columns pass explicit ``boundaries`` (e.g. from approxQuantile) and
buckets become rank-like.  Correctness of downstream queries never
depends on the layout — this operator only reorders rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_interleave(bucket_cols: list[Column], bits: int) -> Column:
    """Interleave ``bits`` low bits of each bucket id round-robin.

    Column c's bit i lands at output position ``i * n_cols + c`` — the
    textbook Morton code, built as a pure shift/or expression tree that
    whole-stage codegen collapses to straight-line long arithmetic.
    """
    n = len(bucket_cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed long")
    terms = [
        F.shiftleft(F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)), i * n + ci)
        for ci, c in enumerate(bucket_cols)
        for i in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def _bucket(col: Column, lo: float, hi: float, bits: int) -> Column:
    n_buckets = 1 << bits
    if hi <= lo:  # constant column: every row in bucket 0
        return F.lit(0)
    scaled = F.floor((col.cast("double") - F.lit(lo)) / F.lit(hi - lo) * n_buckets)
    return F.least(F.greatest(scaled, F.lit(0)), F.lit(n_buckets - 1))


def _bucket_by_boundaries(col: Column, bounds: list[float]) -> Column:
    # bucket = number of boundaries strictly below the value
    expr: Column = F.lit(0)
    for b in bounds:
        expr = expr + (col.cast("double") > F.lit(float(b))).cast("int")
    return expr


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    bits: int = 12,
    num_partitions: int | None = None,
    boundaries: dict[str, list[float]] | None = None,
) -> DataFrame:
    """Reorder rows by the Morton key of ``cols`` (write-ready layout).

    ``boundaries``: optional per-column sorted split points for skewed
    data (at most ``2^bits - 1`` of them); columns without an entry use
    min-max linear bucketing from a single stats aggregate.
    """
    if not cols:
        raise ValueError("need at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    boundaries = boundaries or {}
    for c, b in boundaries.items():
        if len(b) >= (1 << bits):
            raise ValueError(f"{c}: {len(b)} boundaries need more than {bits} bits")
        if sorted(b) != list(b):
            raise ValueError(f"{c}: boundaries must be sorted")

    need_stats = [c for c in cols if c not in boundaries]
    stats: dict[str, tuple[float, float]] = {}
    if need_stats:
        row = df.agg(
            *[F.min(F.col(c).cast("double")).alias(f"{c}__lo") for c in need_stats],
            *[F.max(F.col(c).cast("double")).alias(f"{c}__hi") for c in need_stats],
        ).collect()[0]
        stats = {c: (row[f"{c}__lo"], row[f"{c}__hi"]) for c in need_stats}

    buckets = []
    for c in cols:
        if c in boundaries:
            buckets.append(_bucket_by_boundaries(F.col(c), boundaries[c]))
        else:
            lo, hi = stats[c]
            if lo is None:  # all-NULL column
                buckets.append(F.lit(0))
            else:
                buckets.append(F.coalesce(_bucket(F.col(c), lo, hi, bits), F.lit(0)))
    z = morton_interleave(buckets, bits).alias("__z")

    with_z = df.withColumn("__z", z)
    parted = (
        with_z.repartitionByRange(num_partitions, "__z")
        if num_partitions
        else with_z.repartitionByRange("__z")
    )
    return parted.sortWithinPartitions("__z").drop("__z")
