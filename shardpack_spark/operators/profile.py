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


def histogram(df: DataFrame, col: str, lo: float, hi: float, n_bins: int) -> DataFrame:
    """Equi-width histogram: (bin, lo, hi, cnt), empty bins included.

    One scan + one tiny aggregation on the bin id; the bin expression is
    ``floor((x - lo) / width)`` clamped into [0, n_bins-1] — a fixed IEEE
    op sequence, so any engine computing the same expression lands every
    value in the same bin (pytest checks DuckDB agreement bin-by-bin).
    Values outside [lo, hi] clamp into the edge bins, NULLs are dropped.
    Empty bins come from a range() frame joined in — n_bins rows, never a
    second scan of the data.
    """
    if n_bins < 1:
        raise ValueError(f"n_bins must be >= 1, got {n_bins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    width = (hi - lo) / n_bins
    bin_id = F.least(
        F.greatest(F.floor((F.col(col).cast("double") - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(n_bins - 1),
    )
    counts = (
        df.filter(F.col(col).isNotNull())
        .groupBy(bin_id.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spark = df.sparkSession
    frame = spark.range(n_bins).select(F.col("id").alias("bin"))
    return (
        frame.join(counts, "bin", "left")
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width)).alias("bin_lo"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("bin_hi"),
            F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"),
        )
        .orderBy("bin")
    )


def numeric_quantiles(
    df: DataFrame,
    cols: list[str],
    probs: list[float] | None = None,
    exact: bool = False,
) -> DataFrame:
    """Per-column quantiles in one aggregation: (column, prob, value).

    ``exact=False`` (the 100 TB default) uses ``approx_percentile`` —
    fixed-size mergeable partial state per partition.  ``exact=True``
    uses ``percentile`` (linear interpolation, the same definition as
    DuckDB's ``quantile_cont`` — pytest matches them value-for-value);
    exact percentiles buffer each column's values per partition, so
    reserve it for verification scale.  NULLs are ignored per column.
    """
    probs = probs if probs is not None else [0.25, 0.5, 0.75]
    if not cols:
        raise ValueError("no columns")
    if not probs or not all(0.0 <= p <= 1.0 for p in probs):
        raise ValueError(f"probs must be in [0, 1], got {probs}")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in frame: {missing}")
    parr = F.array(*[F.lit(float(p)) for p in probs])
    fn = F.percentile if exact else F.percentile_approx
    one = df.agg(
        *[fn(F.col(c).cast("double"), parr).alias(f"{c}__q") for c in cols]
    )
    parts = ", ".join(f"'{c}', {c}__q" for c in cols)
    return (
        one.select(F.expr(f"stack({len(cols)}, {parts}) AS (column, qs)"))
        .select(
            "column",
            F.posexplode(
                F.arrays_zip(parr.alias("prob"), F.col("qs").alias("value"))
            ).alias("__i", "__pv"),
        )
        .select("column", F.col("__pv.prob").alias("prob"), F.col("__pv.value").alias("value"))
    )


def frequent_values(df: DataFrame, col: str, k: int = 10) -> DataFrame:
    """Top-k most frequent values of a column: (value, cnt).

    groupBy + count + TakeOrdered — partial aggregation map-side, then
    per-partition heaps of k; ties broken by value so the answer is
    deterministic and oracle-able.  The workhorse for spotting boilerplate
    strings, sentinel values, and crawler artifacts during corpus triage.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("value"))
        .limit(k)
    )


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
