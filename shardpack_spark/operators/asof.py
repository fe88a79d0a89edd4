"""As-of (event-time) join: backward, forward, and nearest.

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
(left, earlier-right) pair first).  ``direction="forward"`` is the same
window run in reverse order; ``"nearest"`` runs both passes over the same
shuffled partitioning (Catalyst adds a re-sort, not a second exchange)
and picks the closer match per row.

Semantics (pandas ``merge_asof`` parity):
- backward: right row with the greatest ``right_on <= left_on``,
- forward:  right row with the smallest ``right_on >= left_on``,
- nearest:  whichever of the two is closer in |left_on - right_on|,
  backward winning exact ties.
Within a direction, ties on ``right_on`` are broken by the largest
``tiebreak``.  Unmatched left rows keep NULL right values (left join).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType
from pyspark.sql.window import Window


def _as_number(col: Column, dtype) -> Column:
    """Event-time column as a double for distance math / the match struct.

    TIMESTAMP_NTZ and DATE have no direct cast to double; route them
    through TIMESTAMP -> unix_micros.  The session-timezone interpretation
    cancels out because only differences/ordering of the same column type
    are ever compared.
    """
    if isinstance(dtype, (TimestampType, TimestampNTZType, DateType)):
        return F.unix_micros(col.cast("timestamp")).cast("double")
    return col.cast("double")


def _carry(direction_desc: bool) -> Window:
    order = [
        F.col("__ts").desc() if direction_desc else F.col("__ts").asc(),
        # right rows sort BEFORE left rows at equal ts (side desc) so an
        # exactly coincident right row is visible to the left row
        F.col("__side").desc(),
        # among right ties the winner is whichever sorts LAST (closest to
        # the probe row in window order): tb ascending puts the largest
        # tiebreak there in both directions
        F.col("__tb").asc(),
    ]
    return (
        Window.partitionBy("__by").orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_by: str,
    right_by: str,
    value_cols: list[str] | None = None,
    tiebreak: str | None = None,
    direction: str = "backward",
    num_partitions: int | None = None,
) -> DataFrame:
    """Left as-of join; see module docstring for direction semantics.

    ``value_cols``: right columns to carry over (default: all non-key).
    ``tiebreak``: right column breaking right_on ties (largest wins).
    ``num_partitions``: pin the by-key exchange to this many partitions.
    The carry window is CPU-heavy per row (sort + struct carry), and on a
    small union AQE's size-based coalescing collapses the post-shuffle
    stage to one task; pinning (e.g. to the session's default
    parallelism) keeps it spread.  Still exactly ONE exchange — the
    window's ClusteredDistribution(by-key) is satisfied by the pinned
    hash partitioning.  Leave None at real scale to let AQE size it.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (right_on, right_by)]
    # NULL event times never MATCH and never SERVE as matches (pandas
    # merge_asof refuses them outright; we keep the left row, unmatched).
    # Without this, a null-ts right row sorts FIRST in the ascending pass
    # and its values get carried to every later probe row as a "match",
    # and a null-ts left row in the descending pass sorts last and picks
    # up the smallest-ts right row.
    right = right.filter(F.col(right_on).isNotNull())

    lcols = left.columns
    # All right value columns travel as ONE struct (with the matched ts as
    # its first field) so a single last(ignorenulls=True) carries the whole
    # matched row: if the matched right row has NULL in some value column,
    # that NULL is preserved — per-column last() would leak an older row's
    # non-null value and stitch together columns from different right rows.
    r_struct = F.struct(
        _as_number(F.col(right_on), right.schema[right_on].dataType).alias("__mts"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    null_struct = F.lit(None).cast(
        "struct<__mts:double,"
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
    unioned = l_tagged.unionByName(r_tagged)
    if num_partitions is not None:
        unioned = unioned.repartition(num_partitions, "__by")

    def pick(m: Column) -> list[Column]:
        # a null-ts PROBE row never matches (its window position is
        # order-dependent, not semantic)
        m = F.when(F.col("__ts").isNotNull(), m)
        return [
            *[F.col(c) for c in lcols],
            *[m[c].alias(c) for c in value_cols],
        ]

    if direction == "backward":
        carried = unioned.select("*", F.last("__r", ignorenulls=True).over(_carry(False)).alias("__m"))
        return carried.filter(F.col("__side") == 0).select(*pick(F.col("__m")))
    if direction == "forward":
        carried = unioned.select("*", F.last("__r", ignorenulls=True).over(_carry(True)).alias("__m"))
        return carried.filter(F.col("__side") == 0).select(*pick(F.col("__m")))

    # nearest: both passes share the hash partitioning on __by — the second
    # window adds only a sort, never a second shuffle (plan-asserted).
    both = unioned.select(
        "*",
        F.last("__r", ignorenulls=True).over(_carry(False)).alias("__mb"),
        F.last("__r", ignorenulls=True).over(_carry(True)).alias("__mf"),
    ).filter(F.col("__side") == 0)
    ts_d = _as_number(F.col("__ts"), left.schema[left_on].dataType)
    back_wins = F.col("__mf").isNull() | (
        F.col("__mb").isNotNull()
        & ((ts_d - F.col("__mb")["__mts"]) <= (F.col("__mf")["__mts"] - ts_d))
    )
    chosen = F.when(back_wins, F.col("__mb")).otherwise(F.col("__mf"))
    return both.select(*pick(chosen))
