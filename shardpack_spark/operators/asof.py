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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DateType, TimestampNTZType, TimestampType


def _as_number_sql(col_sql: str, dtype) -> str:
    """Event-time expression as a double for distance math / the match
    struct, as a SQL fragment.

    TIMESTAMP_NTZ and DATE have no direct cast to double; route them
    through TIMESTAMP -> unix_micros.  The session-timezone interpretation
    cancels out because only differences/ordering of the same column type
    are ever compared.
    """
    if isinstance(dtype, (TimestampType, TimestampNTZType, DateType)):
        return f"CAST(unix_micros(CAST({col_sql} AS TIMESTAMP)) AS DOUBLE)"
    return f"CAST({col_sql} AS DOUBLE)"


def _q(name: str) -> str:
    """Backtick-quote an identifier for a generated SQL fragment."""
    return "`" + name.replace("`", "``") + "`"


def _carry_sql(direction_desc: bool) -> str:
    """The carry window spec as one SQL OVER clause.

    Orderings match the former Window-builder exactly (Column.asc() =
    ASC NULLS FIRST, Column.desc() = DESC NULLS LAST — the SQL defaults):
    right rows sort BEFORE left rows at equal ts (side desc) so an
    exactly coincident right row is visible to the left row; among right
    ties the winner is whichever sorts LAST (closest to the probe row in
    window order): tb ascending puts the largest tiebreak there in both
    directions."""
    ts_dir = "DESC" if direction_desc else "ASC"
    return (
        f"OVER (PARTITION BY __by ORDER BY __ts {ts_dir}, __side DESC, __tb ASC "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
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
    # Every projection below is built as ONE selectExpr of parsed SQL
    # strings: the former per-Column construction (alias/cast/struct
    # field chatter) cost ~100 py4j round trips per asof_join — ~0.2 s
    # of driver latency on every plan build.  Each generated fragment is
    # the same expression the Column API produced (identifiers
    # backtick-quoted; SQL ASC/DESC null ordering = Column.asc()/.desc()
    # defaults), so results are identical.
    #
    # All right value columns travel as ONE struct (with the matched ts as
    # its first field) so a single last(ignorenulls=True) carries the whole
    # matched row: if the matched right row has NULL in some value column,
    # that NULL is preserved — per-column last() would leak an older row's
    # non-null value and stitch together columns from different right rows.
    r_struct = "struct(" + ", ".join(
        [_as_number_sql(_q(right_on), right.schema[right_on].dataType) + " AS __mts"]
        + [f"{_q(c)} AS {_q(c)}" for c in value_cols]
    ) + ")"
    null_struct = (
        "CAST(NULL AS struct<__mts:double,"
        + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols)
        + ">)"
    )
    # Common event-time / key names for the union.
    l_tagged = left.selectExpr(
        f"{_q(left_by)} AS __by",
        f"{_q(left_on)} AS __ts",
        "0 AS __side",
        "CAST(NULL AS BIGINT) AS __tb",
        *[_q(c) for c in lcols],
        f"{null_struct} AS __r",
    )
    tb_sql = f"CAST({_q(tiebreak)} AS BIGINT)" if tiebreak else "CAST(0 AS BIGINT)"
    r_tagged = right.selectExpr(
        f"{_q(right_by)} AS __by",
        f"{_q(right_on)} AS __ts",
        "1 AS __side",
        f"{tb_sql} AS __tb",
        *[
            f"CAST(NULL AS {left.schema[c].dataType.simpleString()}) AS {_q(c)}"
            for c in lcols
        ],
        f"{r_struct} AS __r",
    )
    unioned = l_tagged.unionByName(r_tagged)
    if num_partitions is not None:
        unioned = unioned.repartition(num_partitions, "__by")

    def pick(m_sql: str) -> list[str]:
        # a null-ts PROBE row never matches (its window position is
        # order-dependent, not semantic); the struct-level NULL gate and
        # per-field extraction commute (field-of-NULL-struct is NULL), so
        # gating inside each field projection is value-identical
        return [
            *[_q(c) for c in lcols],
            *[
                f"(CASE WHEN __ts IS NOT NULL THEN ({m_sql}).{_q(c)} END) AS {_q(c)}"
                for c in value_cols
            ],
        ]

    last_b = f"last(__r, true) {_carry_sql(False)}"
    last_f = f"last(__r, true) {_carry_sql(True)}"
    if direction == "backward":
        carried = unioned.selectExpr("*", f"{last_b} AS __m")
        return carried.filter(F.col("__side") == 0).selectExpr(*pick("__m"))
    if direction == "forward":
        carried = unioned.selectExpr("*", f"{last_f} AS __m")
        return carried.filter(F.col("__side") == 0).selectExpr(*pick("__m"))

    # nearest: both passes share the hash partitioning on __by — the second
    # window adds only a sort, never a second shuffle (plan-asserted).
    both = unioned.selectExpr(
        "*",
        f"{last_b} AS __mb",
        f"{last_f} AS __mf",
    ).filter(F.col("__side") == 0)
    ts_d = _as_number_sql("__ts", left.schema[left_on].dataType)
    back_wins = (
        f"(__mf IS NULL OR (__mb IS NOT NULL "
        f"AND (({ts_d}) - __mb.__mts) <= (__mf.__mts - ({ts_d}))))"
    )
    chosen = f"(CASE WHEN {back_wins} THEN __mb ELSE __mf END)"
    return both.selectExpr(*pick(chosen))
