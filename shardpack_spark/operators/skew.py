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
