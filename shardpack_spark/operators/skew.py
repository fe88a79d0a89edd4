"""Skew-mitigation and co-location join patterns for cluster scale.

- ``salted_join``: explicit salting for a skewed build side — the fact
  side gets a random-ish (but deterministic) salt derived from a row
  hash; the dim side is replicated across all salt values.  Use when AQE
  skew splitting isn't enough (e.g. one key is >10% of the data).
- ``write_bucketed`` / co-located joins: bucketing both join sides on the
  key lets Spark sort-merge-join WITHOUT any shuffle exchange — at 100 TB
  this turns the dominant cost of a fact-fact join into a local merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def is_narrow(df: DataFrame) -> bool:
    """True when ``df``'s current plan has fewer partitions than the
    session's core count — the single predicate behind every
    scale-adaptive spread (``spread_if_narrow`` and the SQL-hint call
    sites), kept in one place so the heuristic cannot drift between
    them.  Cost: one plan->RDD conversion (~3 ms, no job)."""
    return df.rdd.getNumPartitions() < df.sparkSession.sparkContext.defaultParallelism


def spread_if_narrow(df: DataFrame, *cols: str) -> DataFrame:
    """Repartition ``df`` to the session's core count ONLY when its plan
    currently has fewer partitions (guide §2.5 input skew: a single-file
    / single-row-group scan is one split, serializing every downstream
    stage onto one core).

    With key columns, the repartition doubles as the exchange a
    downstream window/aggregate on those keys needs, so the plan still
    has exactly one data shuffle; without columns it is a round-robin
    spread of the rows.  On a many-split input (any real-scale table)
    the condition is false and NO repartition is added — AQE sizes the
    downstream exchanges by data volume instead of a cores-count pin
    making partitions of arbitrary size (§5 spill risk).  The guard is
    :func:`is_narrow`.
    """
    if not is_narrow(df):
        return df
    par = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(par, *[F.col(c) for c in cols]) if cols else df.repartition(par)


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    on_left: str,
    on_right: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``skewed``'s hot keys are spread over n_salts
    sub-keys and ``dim`` is replicated n_salts times.

    The salt is xxhash64-derived (deterministic, no rand() — reruns give
    identical partitioning).  Output columns = skewed ++ dim minus the
    right key.

    Only left-side-preserving joins are valid: the dim side is REPLICATED
    n_salts times, so a right/full/outer join would emit every unmatched
    dim row once per replica.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti", "semi", "anti"):
        raise ValueError(
            f"salted_join replicates the dim side {n_salts}x; join type "
            f"{how!r} would duplicate unmatched dim rows — use inner/left/"
            "semi/anti"
        )
    salted_l = skewed.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    salted_r = dim.select("*", salts)
    joined = salted_l.join(
        salted_r,
        (salted_l[on_left] == salted_r[on_right]) & (salted_l["__salt"] == salted_r["__salt"]),
        how,
    )
    return joined.drop("__salt").drop(salted_r[on_right])


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Two tables bucketed identically on the join key sort-merge-join with
    ZERO exchanges — the co-location contract the reference approximates
    with consistent record-key ordering across column shards
    (draft.md:201-211)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str) -> DataFrame:
    return spark.table(left_table).join(spark.table(right_table), on)


# --- shared skew-guard machinery for bucketed operators -------------------------
#
# Every blocking operator in this package shuffles on some bucket key —
# MinHash (band, hash) buckets, Hamming (band, slice) buckets, rp-sketch
# (band, key) buckets, IVF centroids — and they all share one failure
# mode: a degenerate value (boilerplate text, a flat image, a zeroed
# embedding, an under-fit centroid) concentrates m rows on one key and
# the downstream join pays m^2.  The two primitives below are the one
# implementation of the guard and its observability report, so a fix
# lands everywhere at once.

#: the hash pre-filter leaves ~this many times ``sample_ids`` rows per
#: mega-bucket for the exact window to rank — large enough that
#: under-selection is vanishingly unlikely, small enough that the
#: window partition is trivially cheap
_PREFILTER_FACTOR = 128


def drop_hot_buckets(
    rows: DataFrame, key_cols: list[str], max_bucket_size: int
) -> DataFrame:
    """``rows`` minus every ``key_cols`` bucket larger than
    ``max_bucket_size``.

    The hot set comes from a partial-agg groupBy (the shuffle carries
    (key..., partial count), never the data rows; output is at most
    total_rows / cap keys) and is removed via a broadcast left_anti
    join, so the bucketed rows themselves take no extra shuffle —
    strictly cheaper at scale than a count-over-window, which would
    re-shuffle every row on the bucket key."""
    hot = (
        rows.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("__bs"))
        .filter(F.col("__bs") > max_bucket_size)
        .select(*key_cols)
    )
    return rows.join(F.broadcast(hot), key_cols, "left_anti")


def bucket_skew_report(
    rows: DataFrame,
    key_cols: list[str],
    id_col: str,
    threshold: int,
    sample_ids: int,
    sample_col: str = "sample_ids",
) -> DataFrame:
    """(key_cols..., bucket_size, ``sample_col``) for every bucket
    holding more than ``threshold`` rows.

    Samples are the ``sample_ids`` smallest ids of a deterministic
    hash-thinned subset: buckets up to ``sample_ids * 128`` rows are
    ranked exactly (the common case, and what tests pin); larger buckets
    are first thinned by ``xxhash64(id) % (size // (sample_ids * 128))``
    so the ranking window never sorts a mega-bucket in one task — the
    report has to scale PAST the skew it exists to detect.
    """
    hot = (
        rows.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("bucket_size"))
        .filter(F.col("bucket_size") > threshold)
    )
    from pyspark.sql.window import Window

    joined = rows.join(F.broadcast(hot), key_cols)
    divisor = F.greatest(
        F.lit(1),
        (F.col("bucket_size") / F.lit(sample_ids * _PREFILTER_FACTOR)).cast("long"),
    )
    thinned = joined.filter(F.pmod(F.xxhash64(F.col(id_col)), divisor) == 0)
    w = Window.partitionBy(*key_cols).orderBy(id_col)
    return (
        thinned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= sample_ids)
        .groupBy(*key_cols, "bucket_size")
        .agg(F.sort_array(F.collect_list(id_col)).alias(sample_col))
        .select(*key_cols, "bucket_size", sample_col)
    )
