"""Deterministic sampling operators for training-data pipelines.

``df.sample()`` is partitioning-dependent: the same data re-sharded gives
a different sample, which breaks reproducible dataset builds and makes
cross-engine verification impossible.  These operators derive every
keep/drop decision from md5 of a stable row key, so the sample is a pure
function of the data — identical across runs, partitionings, and engines
(md5 is available everywhere, unlike engine-specific hash functions).

Scale notes: hash_sample is a pure codegen filter pushed to the scan (no
shuffle); stratified_sample is ONE window shuffle on the strata key;
hash_sample_n plans as TakeOrderedAndProject (per-partition heaps + a
driver merge of n rows, never a global sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _row_hash(key_col: str, seed: int) -> F.Column:
    """Lowercase-hex md5 of "<key>|<seed>" — uniform, engine-portable."""
    return F.md5(F.concat(F.col(key_col).cast("string"), F.lit(f"|{seed}")))


def _rate_threshold(rate: float) -> str:
    """8-hex-digit keep threshold for a rate in [0, 1].

    rate 1.0 needs care: format(2**32, "08x") is NINE chars
    ("100000000"), and hex STRINGS compare lexicographically, so
    "ffffffff" < "100000000" is False — an exact-1.0 rate would keep
    only hashes starting with '0' (~1/16 of rows).  "g" sorts above
    every hex digit, so it is the portable keep-everything sentinel.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return "g" if rate >= 1.0 else format(int(rate * 2**32), "08x")


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 42
) -> DataFrame:
    """Deterministic Bernoulli sample: keep a row iff the first 8 hex
    chars of its key hash fall below ``fraction`` of the 32-bit space.

    The comparison stays in STRING space (lowercase hex compares in the
    same order as the number it spells), so the identical predicate runs
    on any SQL engine without hex-to-int conversion.
    """
    return df.filter(
        F.substring(_row_hash(key_col, seed), 1, 8) < F.lit(_rate_threshold(fraction))
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: Sequence[str],
    n_per_stratum: int,
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Deterministic up-to-n-per-stratum sample: rank rows inside each
    stratum by their key hash (key as tiebreak) and keep the first n.

    Every stratum contributes min(n, |stratum|) rows — the standard way
    to keep rare strata (languages, sources) represented in a subsample.
    One window shuffle on the strata key; skewed strata are bounded by
    the window's per-partition streaming (rank only, no buffering).
    """
    w = Window.partitionBy(*strata_cols).orderBy(_row_hash(key_col, seed), F.col(key_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )


def hash_sample_n(df: DataFrame, key_col: str, n: int, seed: int = 42) -> DataFrame:
    """Deterministic global n-row sample: the n smallest key hashes.

    Equivalent to a seeded reservoir sample but reproducible and
    engine-portable; plans as TakeOrderedAndProject (no global sort).
    """
    return df.orderBy(_row_hash(key_col, seed), F.col(key_col)).limit(n)


def shuffle_rows(df: DataFrame, key_col: str, seed: int = 42) -> DataFrame:
    """Deterministic global pseudorandom shuffle of a dataset.

    Training runs need the corpus in a random ORDER (not a random subset),
    and that order must be reproducible across re-runs and engines.
    Sorting by the seeded key hash (key as tiebreak) gives exactly that:
    a pure function of the data, independent of input partitioning.

    At scale this plans as one range-partitioned sort — the canonical
    Spark global shuffle: sampled range boundaries, then a single
    exchange + per-partition sort, writable straight to sequentially
    numbered output shards.  Different seeds give independent epochs.
    """
    return df.orderBy(_row_hash(key_col, seed), F.col(key_col))


def weighted_sample_n(
    df: DataFrame, key_col: str, weight_col: str, n: int, seed: int = 42
) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement (n rows).

    Efraimidis–Spirakis A-Res: each row gets priority ln(u) / w for a
    hash-derived uniform u (u^(1/w) in log space — same order, no pow
    underflow at large weights); the n largest priorities are the sample.
    Inclusion probability is proportional to weight, the decision is a
    pure function of (key, seed), and the plan is TakeOrderedAndProject —
    per-partition heaps of n rows, no global sort, no shuffle of the data.

    Rows with NULL or non-positive weight are excluded (a zero-weight row
    must never be sampled; A-Res is undefined for w <= 0).
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    # 13 hex chars = 52 bits -> exact in a double; +0.5 keeps u > 0 so
    # ln(u) is finite and every positive-weight row has a finite priority.
    u = (
        F.conv(F.substring(_row_hash(key_col, seed), 1, 13), 16, 10).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 52))
    pri = F.log(u) / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .withColumn("__pri", pri)
        .orderBy(F.col("__pri").desc(), F.col(key_col))
        .limit(n)
        .drop("__pri")
    )


def hash_split(
    df: DataFrame, key_col: str, fractions: dict[str, float], seed: int = 42
) -> DataFrame:
    """Deterministic disjoint split (train/val/test) as a label column.

    ``fractions`` maps split name -> fraction; they must sum to 1.  Each
    row's split is decided by where its key hash lands among cumulative
    thresholds, so membership is a pure function of the data: re-running,
    re-partitioning, or appending MORE data never moves an existing row
    between splits (the property that keeps eval sets uncontaminated as
    the corpus grows).  Pure codegen — no shuffle.
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    bad = {k: v for k, v in fractions.items() if v < 0}
    if bad:
        raise ValueError(f"negative fractions: {bad}")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    h = F.substring(_row_hash(key_col, seed), 1, 8)
    cum = 0.0
    expr = None
    names = sorted(fractions)  # deterministic threshold order
    for name in names[:-1]:
        cum += fractions[name]
        cond = h < F.lit(_rate_threshold(min(cum, 1.0)))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    key_col: str,
    seed: int = 42,
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic data-mixing sample: keep each stratum at its own rate.

    Training-data pipelines hit a target corpus mixture (e.g. 80% web,
    15% code, 5% reference) by *down-sampling* each source to a
    per-source rate; this applies a stratum-specific hash threshold so
    the mix is a pure function of the data — reproducible and
    cross-engine verifiable, unlike rand()-based sampling.  Strata
    absent from ``rates`` keep ``default_rate``.

    Pure codegen filter (a CASE over the stratum column compared against
    the row hash) — no shuffle, pushed to the scan; the 100 TB cost is
    exactly one streaming pass.
    """
    thresh = F.lit(_rate_threshold(default_rate))
    for stratum, rate in sorted(rates.items()):
        thresh = (
            F.when(F.col(stratum_col) == stratum, F.lit(_rate_threshold(rate)))
            .otherwise(thresh)
        )
    return df.filter(F.substring(_row_hash(key_col, seed), 1, 8) < thresh)


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    key_col: str,
    seed: int = 42,
    priority_col: str | None = None,
) -> DataFrame:
    """Keep at most ``n`` rows per group — the per-domain quota cap.

    Crawl corpora are dominated by a few giant hosts; capping docs per
    domain (or per source, per license, ...) is the standard mixture
    guard.  Survivors are deterministic: the n best rows by
    ``priority_col`` (descending, e.g. a quality score) or, without one,
    the n smallest seeded key hashes — a uniform-but-reproducible pick
    that is a pure function of the data.  Key hash breaks all ties, so
    re-runs and re-partitionings keep identical rows.

    One shuffle on the group column (rank window).  A pathologically hot
    group concentrates its rows in one task, but only until rank n is
    assigned — the window never materializes the group beyond a sort;
    for skew beyond that, pre-filter with ``mixture_sample`` rates.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    order = [F.col("__h").asc()]
    if priority_col is not None:
        order = [F.col(priority_col).desc(), F.col("__h").asc()]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("__h", _row_hash(key_col, seed))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__h", "__rn")
    )
