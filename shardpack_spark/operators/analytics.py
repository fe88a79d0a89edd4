"""Event-sequence analytics: ordered funnels and time-series gap filling.

Standard analytics-engine operators over the `events` table family
((user_id, ts, event_type, value)); both are pure codegen compositions —
one shuffle on the entity key, no UDFs, no pair-space blowup — so they
hold at any event volume where a single entity's events fit a task
(the same envelope as every window function).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from shardpack_spark.timeutil import ts_micros


def funnel(
    df: DataFrame,
    steps: list[str],
    by: str = "user_id",
    ts: str = "ts",
    event_col: str = "event_type",
    within_seconds: int | None = None,
) -> DataFrame:
    """Ordered funnel: deepest step each entity reached, in order.

    Step i+1 counts only if it occurs STRICTLY AFTER the earliest valid
    occurrence of step i (the greedy/earliest-anchor semantics used by
    product-analytics funnels); ``within_seconds`` additionally requires
    every step to land within that horizon of the step-1 anchor.

    Plan: one groupBy(by) collecting a sorted per-step timestamp array
    (micros), then a codegen fold that walks the arrays — no self-joins,
    no window cascade, ONE shuffle.  Per-entity arrays are bounded by
    that entity's event count, the standard per-key envelope.

    Returns (by, steps_completed, t_first, t_last): micros of the step-1
    anchor and the last completed step's time (both NULL if step 1 never
    fired).
    """
    if not steps:
        raise ValueError("funnel requires at least one step")
    us = ts_micros(F.col(ts))
    aggs = [
        F.array_sort(
            F.collect_list(F.when(F.col(event_col) == s, us))
        ).alias(f"__s{i}")
        for i, s in enumerate(steps)
    ]
    g = df.groupBy(F.col(by)).agg(*aggs)

    # earliest anchor for step 0; for each later step, the first time
    # strictly after the previous step's chosen time (and inside the
    # horizon when given).  F.get is out-of-bounds-NULL under ANSI mode,
    # unlike element_at.  The one-arg lambda closures are built through a
    # factory so each captures its own threshold (a two-arg lambda would
    # be read as the (element, index) form).
    def _after(tp):
        return lambda x: x > tp

    t_prev = F.get(F.col("__s0"), 0)
    times = [t_prev]
    horizon = (
        (times[0] + F.lit(int(within_seconds * 1_000_000)))
        if within_seconds is not None
        else None
    )
    for i in range(1, len(steps)):
        nxt = F.get(F.filter(F.col(f"__s{i}"), _after(t_prev)), 0)
        if horizon is not None:
            nxt = F.when(nxt <= horizon, nxt)
        times.append(nxt)
        t_prev = nxt

    # a later step is non-null only if every earlier one is (by
    # construction: filtering above a NULL threshold yields nothing), so
    # completed = count of non-null entries and t_last = the last of them
    arr = F.array(*times)
    reached = F.filter(arr, lambda x: x.isNotNull())
    completed = F.size(reached)
    last_t = F.get(reached, completed - 1)
    return g.select(
        F.col(by),
        completed.cast("int").alias("steps_completed"),
        times[0].alias("t_first"),
        last_t.alias("t_last"),
    )


def retention(
    df: DataFrame,
    by: str = "user_id",
    ts: str = "ts",
    period_seconds: int = 7 * 86400,
    max_periods: int = 12,
) -> DataFrame:
    """Cohort retention matrix over an event stream.

    Each entity's cohort is the period (``period_seconds``-wide epoch
    bucket) of its FIRST event; the matrix counts entities from cohort C
    active again in period C+k.  Returns (cohort, period_offset,
    active_entities) with offset 0 = the cohort size.

    Two shuffles total, both on bounded keys: (1) per-entity min-period
    agg (map-side combined), (2) the distinct (entity, period) activity
    set joined to its cohort and re-aggregated on (cohort, offset) — the
    output is O(cohorts x max_periods) however large the input.
    """
    period = F.floor(ts_micros(F.col(ts)) / F.lit(int(period_seconds) * 1_000_000))
    ent = df.select(F.col(by).alias("__e"), period.alias("__p"))
    first = ent.groupBy("__e").agg(F.min("__p").alias("__cohort"))
    activity = ent.distinct()
    return (
        activity.join(first, "__e")
        .withColumn("period_offset", (F.col("__p") - F.col("__cohort")).cast("int"))
        .filter(F.col("period_offset") <= max_periods)
        .groupBy(F.col("__cohort").alias("cohort"), "period_offset")
        .agg(F.count(F.lit(1)).alias("active_entities"))
    )


def gap_fill(
    df: DataFrame,
    every_seconds: int,
    by: str | None = None,
    ts: str = "ts",
    value_col: str = "value",
    method: str = "locf",
) -> DataFrame:
    """Regularize a sparse series onto a fixed grid (hypertable gap-fill).

    Input rows are observations (key?, ts, value); output has EXACTLY one
    row per ``every_seconds`` bucket from each key's first to last
    observation, with empty buckets filled by ``method``:

      'null'   leave missing values NULL (spine only)
      'zero'   fill 0.0
      'locf'   last observation carried forward
      'linear' linear interpolation between the surrounding observations
               (leading gaps stay NULL, trailing gaps carry forward)

    Multiple observations in one bucket average.  The spine comes from a
    per-key ``sequence()`` + explode — generated distributed, sized by
    that key's time span, never a driver-side loop; filling is one window
    per direction.  micros grid on column ``bucket``; value column keeps
    its name.
    """
    if method not in ("null", "zero", "locf", "linear"):
        raise ValueError(f"unknown method {method!r}")
    step = int(every_seconds) * 1_000_000
    key = by or "__global"
    src = df.select(
        (F.lit("all") if by is None else F.col(by)).alias(key),
        (F.floor(ts_micros(F.col(ts)) / step) * step).alias("bucket"),
        F.col(value_col).cast("double").alias("__v"),
    )
    actual = src.groupBy(key, "bucket").agg(F.avg("__v").alias("__v"))
    spine = (
        actual.groupBy(key)
        .agg(F.min("bucket").alias("__b0"), F.max("bucket").alias("__b1"))
        .select(
            key,
            F.explode(
                F.sequence("__b0", "__b1", F.lit(step))
            ).alias("bucket"),
        )
    )
    grid = spine.join(actual, [key, "bucket"], "left")

    if method == "null":
        out = grid.withColumnRenamed("__v", value_col)
    elif method == "zero":
        out = grid.select(
            key, "bucket", F.coalesce("__v", F.lit(0.0)).alias(value_col)
        )
    else:
        w_back = (
            Window.partitionBy(key)
            .orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        prev_v = F.last("__v", ignorenulls=True).over(w_back)
        if method == "locf":
            out = grid.select(key, "bucket", prev_v.alias(value_col))
        else:  # linear
            w_fwd = (
                Window.partitionBy(key)
                .orderBy("bucket")
                .rowsBetween(0, Window.unboundedFollowing)
            )
            anchor = F.when(F.col("__v").isNotNull(), F.col("bucket"))
            prev_b = F.last(anchor, ignorenulls=True).over(w_back)
            next_v = F.first("__v", ignorenulls=True).over(w_fwd)
            next_b = F.first(anchor, ignorenulls=True).over(w_fwd)
            frac = (F.col("bucket") - prev_b) / (next_b - prev_b)
            interp = (
                F.when(F.col("__v").isNotNull(), F.col("__v"))
                .when(
                    prev_v.isNotNull() & next_v.isNotNull(),
                    prev_v + frac * (next_v - prev_v),
                )
                .when(prev_v.isNotNull(), prev_v)  # trailing gap: carry
            )
            out = grid.select(key, "bucket", interp.alias(value_col))
    return out if by is not None else out.drop(key)
