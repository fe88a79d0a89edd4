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


# --- count-min sketch (mergeable frequency estimates) -----------------------
#
# HLL answers "how many distinct"; the count-min sketch answers "how often
# does THIS value occur" with the same scan-once / merge-anywhere shape.
# At 100 TB the exact groupBy answer needs a shuffle keyed by the value
# (unbounded cardinality); the CMS shuffles at most depth x width counter
# rows per partition (map-side partial sum), and sketches from different
# days / corpora / engines merge by adding counters — the merged sketch is
# bit-identical to sketching the concatenation (tests pin this down).
# Estimates are biased UP only: est >= true count always, and
# est <= true + eps*N with probability 1-delta for width=e/eps,
# depth=ln(1/delta) (Cormode & Muthukrishnan 2005).


def _cms_bucket(col: str, row: int, width: int, seed: int):
    # per-row independent hash: fold the row index into the hashed tuple
    # (xxhash64 has no seed arg; hashing (value, seed, row) decorrelates
    # rows the same way minhash_signatures decorrelates permutations)
    return F.pmod(F.xxhash64(F.col(col), F.lit(seed), F.lit(row)), F.lit(width)).cast("int")


def cms_build(
    df: DataFrame, col: str, width: int = 2048, depth: int = 5, seed: int = 0
) -> DataFrame:
    """Count-min sketch of ``col``: sparse (row, bucket, cnt) counters.

    One scan, fully codegen: each record contributes ``depth`` (row,
    bucket) increments via posexplode, then a partial-agg sum collapses
    them map-side, so the shuffle carries at most depth*width counter rows
    per partition regardless of input size.  NULLs are skipped (a NULL has
    no frequency).  The sparse form IS the mergeable artifact — persist it
    per day/corpus and combine with ``cms_merge``.
    """
    if width < 8:
        raise ValueError(f"width must be >= 8, got {width}")
    if not 1 <= depth <= 16:
        raise ValueError(f"depth must be in [1, 16], got {depth}")
    buckets = F.array(*[_cms_bucket(col, i, width, seed) for i in range(depth)])
    return (
        df.filter(F.col(col).isNotNull())
        .select(F.posexplode(buckets).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # the parameters travel WITH the sketch so estimate/merge can
        # never silently probe with mismatched hashes (a mismatch would
        # break the never-underestimate guarantee without any error)
        .select(
            "row", "bucket", "cnt",
            F.lit(width).alias("width"), F.lit(depth).alias("depth"),
            F.lit(seed).alias("seed"),
        )
    )


def _cms_params(sketch: DataFrame, what: str) -> tuple[int, int, int]:
    rows = sketch.select("width", "depth", "seed").distinct().collect()
    if len(rows) != 1:
        raise ValueError(
            f"{what}: sketches carry mismatched (width, depth, seed): "
            f"{sorted(tuple(r) for r in rows)}"
        )
    return int(rows[0]["width"]), int(rows[0]["depth"]), int(rows[0]["seed"])


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge CMS sketches built with IDENTICAL (width, depth, seed) —
    enforced from the embedded parameters, not trusted from the caller.

    Counters add, so merge = union + sum; the result is exactly the
    sketch of the concatenated inputs.
    """
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    _cms_params(out, "cms_merge")
    return out.groupBy("row", "bucket", "width", "depth", "seed").agg(
        F.sum("cnt").alias("cnt")
    ).select("row", "bucket", "cnt", "width", "depth", "seed")


def cms_estimate(sketch: DataFrame, items: DataFrame, col: str) -> DataFrame:
    """Frequency estimate for each distinct value of ``items[col]``.

    Returns (value, est).  The hash parameters come from the sketch
    itself (embedded at build time), so probes always use the hashes the
    counters were built with.  The sketch is bounded at depth*width
    counter rows by construction, so IT broadcasts into the probe join
    (probes keep outer-join semantics: a bucket with no counter row
    contributes 0), and the estimate is the min over the ``depth`` rows —
    the standard CMS point query.
    """
    width, depth, seed = _cms_params(sketch, "cms_estimate")
    probes = (
        items.select(F.col(col).alias("value"))
        .filter(F.col("value").isNotNull())
        .distinct()
        .select(
            "value",
            F.posexplode(
                F.array(*[_cms_bucket("value", i, width, seed) for i in range(depth)])
            ).alias("row", "bucket"),
        )
    )
    return (
        probes.join(
            F.broadcast(sketch.select("row", "bucket", "cnt")), ["row", "bucket"], "left"
        )
        .groupBy("value")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


# --- KLL quantile sketches (mergeable distributions) ------------------------
#
# The third leg of the sketch family: HLL answers "how many distinct", CMS
# answers "how often does this value occur", KLL answers "what does the
# DISTRIBUTION look like" — quantiles/ranks with a proven normalized-rank
# error bound (~1.65% at the default k=200), in O(k log n) bytes per
# group.  Spark 4 ships the Apache DataSketches KLL family as JVM
# aggregates, so build/merge/query are all codegen: scan the base data
# once, keep one sketch per fine-grained group, answer ANY coarser
# rollup's percentiles by merging sketches — exactly the shape a 100 TB
# "p99 latency per region per day, rolled up to per-region" query needs,
# with only (group, sketch) rows ever shuffled.  While a group holds
# fewer than k values the sketch stores them all and quantiles are EXACT
# (tests pin that down against DuckDB).

_KLL = {
    "bigint": (
        F.kll_sketch_agg_bigint,
        F.kll_merge_agg_bigint,
        F.kll_sketch_get_quantile_bigint,
    ),
    "double": (
        F.kll_sketch_agg_double,
        F.kll_merge_agg_double,
        F.kll_sketch_get_quantile_double,
    ),
    "float": (
        F.kll_sketch_agg_float,
        F.kll_merge_agg_float,
        F.kll_sketch_get_quantile_float,
    ),
}

QSKETCH = "__kll_sketch"


def _kll_fns(dtype: str):
    if dtype not in _KLL:
        raise ValueError(f"dtype must be one of {sorted(_KLL)}, got {dtype!r}")
    return _KLL[dtype]


def quantile_sketches(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    k: int = 200,
    dtype: str = "double",
) -> DataFrame:
    """One binary KLL sketch of ``value_col`` per group — the scan-once
    artifact for distribution rollups.  ``dtype`` picks the sketch family
    (values are cast to it); integer columns should use 'bigint' so
    quantiles stay exact integers below the k threshold."""
    if not 8 <= k <= 65535:
        raise ValueError(f"k must be in [8, 65535], got {k}")
    agg, _, _ = _kll_fns(dtype)
    sk = agg(F.col(value_col).cast(dtype), F.lit(k)).alias(QSKETCH)
    out = df.groupBy(*group_cols).agg(sk) if group_cols else df.agg(sk)
    return out.withColumn("__kll_dtype", F.lit(dtype))


def rollup_quantiles(
    sketches: DataFrame,
    group_cols: list[str],
    quantiles: list[float] = (0.5, 0.9, 0.99),
    dtype: str | None = None,
) -> DataFrame:
    """Merge fine-grained KLL sketches up to ``group_cols`` and emit one
    ``p{percent}`` column per requested quantile.

    Input is ``quantile_sketches`` output (or a previous rollup — merges
    compose).  The sketch dtype is read from the frame's own
    ``__kll_dtype`` tag unless overridden, so build and query can never
    silently disagree on the sketch family."""
    if dtype is None:
        col_types = dict(sketches.dtypes)
        if "__kll_dtype" not in col_types:
            raise ValueError(
                "sketch frame has no __kll_dtype tag; pass dtype= explicitly"
            )
        tags = [r[0] for r in sketches.select("__kll_dtype").distinct().collect()]
        if len(tags) != 1:
            raise ValueError(f"mixed sketch dtypes cannot merge: {sorted(tags)}")
        dtype = tags[0]
    _, merge, get_q = _kll_fns(dtype)
    for q in quantiles:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantile out of [0,1]: {q}")
    merged = (
        sketches.groupBy(*group_cols).agg(merge(F.col(QSKETCH)).alias(QSKETCH))
        if group_cols
        else sketches.agg(merge(F.col(QSKETCH)).alias(QSKETCH))
    )
    cols = [
        get_q(F.col(QSKETCH), F.lit(float(q))).alias(f"p{round(q * 100, 4):g}")
        for q in quantiles
    ]
    return merged.select(*group_cols, *cols)


# --- theta sketches (mergeable distinct-set ALGEBRA) ------------------------
#
# HLL unions but cannot intersect.  Theta sketches support union,
# intersection, and A-NOT-B over distinct sets — "how many doc_ids appear
# in BOTH crawls", "how many users churned between snapshots" — without
# ever joining the base tables: scan each side once into bounded binary
# sketches, then the set algebra runs on kilobytes.  Below the sketch's
# retention threshold (~2^lgk values) results are exact.


TSKETCH = "__theta_sketch"


def theta_sketches(
    df: DataFrame, key: str, group_cols: list[str], lgk: int = 12
) -> DataFrame:
    """One binary theta sketch of distinct ``key`` values per group."""
    if not 4 <= lgk <= 26:
        raise ValueError(f"lgk must be in [4, 26], got {lgk}")
    sk = F.theta_sketch_agg(F.col(key), F.lit(lgk)).alias(TSKETCH)
    return df.groupBy(*group_cols).agg(sk) if group_cols else df.agg(sk)


def theta_rollup(sketches: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union theta sketches up to ``group_cols`` and estimate distincts."""
    unioned = (
        sketches.groupBy(*group_cols).agg(F.theta_union_agg(F.col(TSKETCH)).alias(TSKETCH))
        if group_cols
        else sketches.agg(F.theta_union_agg(F.col(TSKETCH)).alias(TSKETCH))
    )
    return unioned.withColumn("approx_distinct", F.theta_sketch_estimate(F.col(TSKETCH)))


def theta_set_estimate(a: DataFrame, b: DataFrame, on: list[str]) -> DataFrame:
    """Distinct-set overlap between two sketch frames, per ``on`` group.

    Inputs are ``theta_sketches`` outputs sharing the grouping.  Returns
    one row per group with ``union_est`` / ``intersect_est`` /
    ``a_not_b_est`` / ``jaccard_est`` — the full audit of how two
    corpora/snapshots relate, computed entirely on sketch bytes (inner
    join on the group key, kilobytes a side, broadcastable)."""
    left = a.select(*on, F.col(TSKETCH).alias("__ta"))
    right = b.select(*on, F.col(TSKETCH).alias("__tb"))
    j = left.join(right, on, "inner")
    uni = F.theta_sketch_estimate(F.theta_union(F.col("__ta"), F.col("__tb")))
    inter = F.theta_sketch_estimate(F.theta_intersection(F.col("__ta"), F.col("__tb")))
    anotb = F.theta_sketch_estimate(F.theta_difference(F.col("__ta"), F.col("__tb")))
    return j.select(
        *on,
        uni.alias("union_est"),
        inter.alias("intersect_est"),
        anotb.alias("a_not_b_est"),
    ).withColumn(
        "jaccard_est",
        F.when(F.col("union_est") > 0, F.col("intersect_est") / F.col("union_est")).otherwise(
            F.lit(0.0)
        ),
    )
