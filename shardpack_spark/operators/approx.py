"""Mergeable approximate-distinct sketches (Apache DataSketches HLL).

``approx_count_distinct`` answers one fixed grouping; at 100 TB the useful
primitive is the MERGEABLE sketch: scan the base data once, keep a binary
HLL per fine-grained group, then answer ANY coarser rollup by unioning
sketches — no second scan, and the union is exact over sketches (the
estimate of a union equals the estimate you'd get sketching the union
directly, a property the tests pin down).

Spark 4 exposes the DataSketches HLL family as JVM-side aggregates
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``), so the
whole pipeline is codegen — no Python in the hot path.  Sketch size is
O(2^lgk) bytes per group regardless of cardinality, so a billion-key
distinct count ships kilobytes per group through the shuffle instead of
the keys themselves.

Beyond-reference surface (SURVEY.md §2B.10): the reference engine has no
approximate aggregates at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SKETCH = "__hll_sketch"


def distinct_sketches(df: DataFrame, key: str, group_cols: list[str], lgk: int = 12) -> DataFrame:
    """One binary HLL sketch of ``key`` per ``group_cols`` group.

    This is the scan-once artifact to persist (e.g. per day x country):
    every coarser distinct-count rollup derives from it via
    ``rollup_sketches`` without touching the base table again.
    """
    if not 4 <= lgk <= 21:
        raise ValueError(f"lgk must be in [4, 21], got {lgk}")
    return df.groupBy(*group_cols).agg(F.hll_sketch_agg(F.col(key), F.lit(lgk)).alias(SKETCH))


def rollup_sketches(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union fine-grained sketches up to ``group_cols`` and estimate.

    Input is ``distinct_sketches`` output (or a previous rollup — unions
    compose).  Shuffles only (group, sketch) rows: bytes per group are
    bounded by the sketch size, never by the data's cardinality.
    """
    unioned = (
        sketches.groupBy(*group_cols).agg(F.hll_union_agg(F.col(SKETCH)).alias(SKETCH))
        if group_cols
        else sketches.select(F.hll_union_agg(F.col(SKETCH)).alias(SKETCH))
    )
    return unioned.withColumn("approx_distinct", F.hll_sketch_estimate(F.col(SKETCH)))


def approx_distinct_rollup(
    df: DataFrame, key: str, fine_cols: list[str], coarse_cols: list[str], lgk: int = 12
) -> DataFrame:
    """Convenience: sketch at ``fine_cols``, answer at ``coarse_cols``."""
    extra = set(coarse_cols) - set(fine_cols)
    if extra:
        raise ValueError(f"coarse grouping must be a subset of fine grouping, extra: {sorted(extra)}")
    return rollup_sketches(distinct_sketches(df, key, fine_cols, lgk), coarse_cols).drop(SKETCH)
