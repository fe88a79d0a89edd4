"""One-pass table profiler (data-quality / "analyze table" stats).

Every large-scale ingest needs a cheap answer to "what is in this table":
row counts, null rates, cardinalities, ranges, numeric moments.  The
profiler computes ALL requested per-column stats in a SINGLE aggregation
over a single scan — one job, one reduce to a 1-row frame — then unpivots
to long format with ``stack`` (still JVM-side; the 1-row unpivot is free).

Scale notes:
- default cardinality is ``approx_count_distinct`` (HLL, fixed-size partial
  state).  ``exact_distinct=True`` switches to exact COUNT(DISTINCT): Spark
  plans multi-distinct via Expand (rows x distinct-columns intermediate) —
  fine for correctness checks at test scale, the approx path is the 100 TB
  default.
- numeric sums/means run in DECIMAL(28,6) so the profile is deterministic
  under partition reordering (IEEE double sums are not associative); the
  published value is a final double cast.
- min/max are emitted as strings so one long schema covers all types.

Beyond-reference surface (SURVEY.md §2B.10); pytest hash-checks the exact
mode against a DuckDB per-column oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

_DEC = "decimal(28,6)"


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """Long-format profile: one row per column.

    Output schema: ``column, n_rows, n_nonnull, n_null, n_distinct,
    min_str, max_str, sum_val, mean_val`` (sum/mean NULL for non-numerics).
    """
    cols = columns if columns is not None else df.columns
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    if not cols:
        raise ValueError("no columns to profile")

    numeric = {f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)}
    aggs: list[Column] = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        col = F.col(c)
        aggs.append(F.count(col).alias(f"{c}__nn"))
        aggs.append(
            (F.count_distinct(col) if exact_distinct else F.approx_count_distinct(col)).alias(
                f"{c}__nd"
            )
        )
        aggs.append(F.min(col).cast("string").alias(f"{c}__mn"))
        aggs.append(F.max(col).cast("string").alias(f"{c}__mx"))
        if c in numeric:
            aggs.append(F.sum(col.cast(_DEC)).alias(f"{c}__sum"))
        else:
            aggs.append(F.lit(None).cast(_DEC).alias(f"{c}__sum"))
    one = df.agg(*aggs)

    # stack(n, label_1, v1..v5, label_2, ...) -> one row per column
    parts: list[str] = []
    for c in cols:
        parts.append(
            f"'{c}', {c}__nn, {c}__nd, {c}__mn, {c}__mx, CAST({c}__sum AS DOUBLE)"
        )
    stacked = one.select(
        F.col("__rows").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {', '.join(parts)}) AS "
            "(column, n_nonnull, n_distinct, min_str, max_str, sum_val)"
        ),
    ).select(
        "column",
        "n_rows",
        "n_nonnull",
        (F.col("n_rows") - F.col("n_nonnull")).alias("n_null"),
        "n_distinct",
        "min_str",
        "max_str",
        "sum_val",
        # one IEEE division on the exact-decimal sum: deterministic
        F.when(
            F.col("n_nonnull") > 0, F.col("sum_val") / F.col("n_nonnull")
        ).alias("mean_val"),
    )
    return stacked
