"""As-of (event-time) join.

Spark SQL has no native ASOF JOIN, so we implement the classic scalable
union-merge formulation rather than the naive range-join + dedup:

    1. tag left rows (probe) and right rows (reference),
    2. union them on (by_key, ts),
    3. one window pass per by_key ordered by (ts, side, tiebreak) carrying
       the most recent right-side values forward via last(ignorenulls=True),
    4. keep left rows.

Cost: ONE shuffle on the by-key and a sort within partitions — no row
explosion, no O(left x right-per-key) intermediate, which is what makes it
survive 100 TB (a range join + ROW_NUMBER dedup materializes every
(left, earlier-right) pair first).

Semantics: for each left row, the right row with the greatest ``right_ts``
such that ``right_ts <= left_ts`` within the same ``by`` key (ties on
right_ts broken by the largest ``tiebreak``).  Unmatched left rows keep
NULL right values (left as-of join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    value_cols: list[str] | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """Left as-of join: latest right row with right_on <= left_on per key.

    ``value_cols``: right columns to carry over (default: all non-key).
    ``tiebreak``: right column breaking right_on ties (largest wins).
    """
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (right_on, right_by)]

    lcols = left.columns
    # All right value columns travel as ONE struct so a single
    # last(ignorenulls=True) carries the whole matched row: if the matched
    # (latest) right row has NULL in some value column, that NULL is
    # preserved — per-column last() would leak an older row's non-null
    # value and stitch together columns from different right rows.
    r_struct = F.struct(*[F.col(c).alias(c) for c in value_cols])
    null_struct = F.lit(None).cast(
        "struct<"
        + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols)
        + ">"
    )
    # Common event-time / key names for the union.
    l_tagged = left.select(
        F.col(left_by).alias("__by"),
        F.col(left_on).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast("long").alias("__tb"),
        *[F.col(c) for c in lcols],
        null_struct.alias("__r"),
    )
    tb_col = F.col(tiebreak).cast("long") if tiebreak else F.lit(0).cast("long")
    r_tagged = right.select(
        F.col(right_by).alias("__by"),
        F.col(right_on).alias("__ts"),
        F.lit(1).alias("__side"),
        tb_col.alias("__tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        r_struct.alias("__r"),
    )

    # Right rows sort BEFORE left rows at equal ts (side desc) so an exactly
    # coincident right row is visible to the left row; among right ties the
    # largest tiebreak sorts last and wins the last() carry-forward.
    w = (
        Window.partitionBy("__by")
        .orderBy(F.col("__ts").asc(), F.col("__side").desc(), F.col("__tb").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    unioned = l_tagged.unionByName(r_tagged)
    carried = unioned.select(
        "*",
        F.last("__r", ignorenulls=True).over(w).alias("__m"),
    )
    out = carried.filter(F.col("__side") == 0).select(
        *[F.col(c) for c in lcols],
        *[F.col("__m")[c].alias(c) for c in value_cols],
    )
    return out
