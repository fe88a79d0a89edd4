"""Binned range (interval) join.

Open-source Spark executes a join whose only predicate is an inequality
(point BETWEEN start AND end) as BroadcastNestedLoopJoin — or, when neither
side fits in memory, a cartesian product.  Both are O(|points| x |intervals|)
and die long before 100 TB.  The classic fix (Databricks' "range join
optimization", DuckDB's IEJoin serve the same role) is to rewrite the
inequality join as an EQUI-join on a bin key:

    1. each point lands in exactly one bin:  floor(point / bin_width)
    2. each interval explodes to every bin it overlaps:
       sequence(floor(start / bin_width), floor(end / bin_width))
    3. equi-join on (by..., bin) — a plain shuffled/broadcast HASH join
    4. re-apply the exact predicate as a residual filter

Correctness never depends on bin_width: step 2 over-covers (the boundary
bins may contain non-matching candidates) and step 4 removes them; a point
matches an interval in exactly ONE bin (its own), so no dedup is needed.

Scale properties:
- cost is |points| + sum(interval_span / bin_width) shuffled rows plus
  candidates-per-bin join work — tunable via ``bin_width``: wider bins mean
  fewer exploded interval rows but more false candidates; the sweet spot is
  bin_width ~ median interval length.
- optional ``by`` equi-keys compose with the bin (session-scoped, per-user
  joins) and tighten both the shuffle and the candidate set.
- skew: one enormous interval explodes to span/bin_width rows — bounded and
  linear, never quadratic; a hot bin on the points side is ordinary equi-join
  skew that AQE's skew-join splitting already handles.

Reference parity: the reference engine (jsam/shardpack) has no range join —
this is part of the beyond-reference pipeline surface (SURVEY.md §2B.10);
the q10 'interval' variant hash-checks it against DuckDB's IEJoin answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "__rj_bin"


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_on: str,
    start_on: str,
    end_on: str,
    bin_width: float,
    by: list[tuple[str, str]] | None = None,
    closed: str = "left",
    max_bins_per_interval: int | None = None,
) -> DataFrame:
    """Inner-join each point row to every interval row containing it.

    ``points[point_on]`` and ``intervals[start_on] / [end_on]`` must be
    numeric (cast timestamps with unix_micros first).  ``closed`` is
    ``"left"`` for [start, end) or ``"both"`` for [start, end].  ``by`` adds
    equi-key pairs ``(point_col, interval_col)`` that must also match.
    Output carries all columns from both inputs (names must not collide).

    ``max_bins_per_interval``: optional runtime guard — a bin_width far
    below the interval span multiplies the exploded side by span/width,
    which at 100 TB is a silent job-killer.  With the cap set, any
    interval that would explode past it fails the job loudly (codegen
    ``raise_error``) instead; pick a wider bin_width or pre-split the
    outlier intervals.
    """
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    if closed not in ("left", "both"):
        raise ValueError(f"closed must be 'left' or 'both', got {closed!r}")
    if max_bins_per_interval is not None and max_bins_per_interval < 1:
        raise ValueError(f"max_bins_per_interval must be >= 1, got {max_bins_per_interval}")
    by = by or []
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column names collide across inputs: {sorted(overlap)}")

    w = F.lit(float(bin_width))
    p = points.withColumn(_BIN, F.floor(F.col(point_on) / w))
    # Degenerate intervals (end < start; end == start under closed='left')
    # match nothing — drop them before sequence(), which rejects a
    # descending range with a positive step.
    keep = F.col(end_on) >= F.col(start_on) if closed == "both" else F.col(end_on) > F.col(start_on)
    lo_bin, hi_bin = F.floor(F.col(start_on) / w), F.floor(F.col(end_on) / w)
    if max_bins_per_interval is not None:
        n_bins = hi_bin - lo_bin + 1
        hi_bin = F.when(
            n_bins <= F.lit(max_bins_per_interval), hi_bin
        ).otherwise(
            F.raise_error(
                F.format_string(
                    "interval_join: an interval spans %s bins "
                    f"(max_bins_per_interval={max_bins_per_interval}); "
                    "widen bin_width or pre-split outlier intervals",
                    n_bins.cast("string"),
                )
            ).cast("long")
        )
    iv = intervals.filter(keep).withColumn(
        _BIN,
        F.explode(F.sequence(lo_bin, hi_bin)),
    )

    cond = p[_BIN] == iv[_BIN]
    for pc, ic in by:
        cond = cond & (p[pc] == iv[ic])
    cond = cond & (p[point_on] >= iv[start_on])
    upper = p[point_on] <= iv[end_on] if closed == "both" else p[point_on] < iv[end_on]
    return p.join(iv, cond & upper, "inner").drop(_BIN)
