"""Importance-resampling data selection (DSIR-style).

Selects raw-corpus documents whose n-gram distribution looks like a
TARGET corpus, by scoring each document with the log-likelihood ratio of
its n-grams under target vs raw unigram/bigram models — the published
DSIR recipe (Xie et al., "Data Selection for Language Models via
Importance Resampling", 2023; hashed n-gram features + importance
resampling).  Everything here is DataFrame-native:

- ``ngram_log_ratios``: two groupBy(ngram) counts (raw and target) with
  map-side partial aggregation, one outer join, Laplace-smoothed
  log(p_target/p_raw) per n-gram.  The model is a keyed TABLE, not a
  driver-side array — at 100 TB both corpora stream through two
  linear aggregations.
- ``dsir_scores``: explode docs to n-grams, join the ratio table (the
  model is usually small enough that Catalyst broadcasts it; the join
  stays a keyed shuffle join when it is not), sum per doc.  tf-weighted.
- ``hashed_ngram_log_ratios`` / scale variant: n-grams bucketed with
  xxhash64 into ``n_buckets`` (the paper's hashing trick) so the model
  is fixed-size regardless of vocabulary — the bucket table is
  guaranteed broadcastable.
- ``dsir_resample``: deterministic Gumbel-top-k importance resampling —
  per-doc noise derived from xxhash64(id, seed), so selection is
  reproducible and shuffle-free beyond one TakeOrderedAndProject.

Cross-engine determinism note (oracle-checked queries): each per-ngram
log ratio is rounded to 4 decimals BEFORE the per-doc sum — engines'
ln() may differ in the last ulp, and summing rounded grid values keeps
the 4-decimal per-doc score identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ROUND = 10000.0


def _round4(col: F.Column) -> F.Column:
    """FLOOR(x*1e4+0.5)/1e4 — half-up, engine-stable (see timeutil/canon)."""
    return F.floor(col * _ROUND + F.lit(0.5)) / _ROUND


def _gram_rows(
    df: DataFrame, n: int, text_col: str, id_col: str
) -> DataFrame:
    """(id, ngram) OCCURRENCE rows (duplicates repeat) — the shared
    explode both the per-doc tf aggregation and the corpus-level model
    fits build on; the fits count occurrences directly, one shuffle."""
    ws = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda w: w != "")
    if n == 1:
        grams = F.col("__ws")
    else:
        # 1-based slice: gram i joins words [i, i+n-1].  The size guard
        # matters: Spark's sequence(1, 0) DESCENDS to [1, 0] instead of
        # being empty, which would feed slice a zero start.
        grams = F.expr(
            f"if(size(__ws) >= {n}, "
            f"transform(sequence(1, size(__ws) - {n - 1}), "
            f"i -> concat_ws(' ', slice(__ws, i, {n}))), "
            f"array())"
        )
    return df.select(F.col(id_col).alias("id"), ws.alias("__ws")).select(
        "id", F.explode(grams).alias("ngram")
    )


def word_ngrams(
    df: DataFrame, n: int = 2, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, ngram, tf): whitespace-tokenized lowercase word n-grams with
    term frequency.  Pure codegen — no Python row path."""
    return (
        _gram_rows(df, n, text_col, id_col)
        .groupBy("id", "ngram")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def ngram_log_ratios(
    raw: DataFrame,
    target: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    raw_grams: DataFrame | None = None,
) -> DataFrame:
    """(ngram, logr): Laplace-smoothed log(p_target / p_raw) per n-gram.

    logr = ln( ((ct+1) / (Nt+V)) / ((cr+1) / (Nr+V)) ), with V the raw
    vocabulary size — n-grams unseen in the target get the smoothed
    floor instead of -inf.  Rounded to 4 decimals (determinism note in
    the module docstring).

    ``raw_grams``: optional pre-tokenized (id, ngram, tf) table for the
    raw corpus (``word_ngrams`` output, typically persisted by a caller
    that also consumes it) — raw counts then aggregate ``sum(tf)``
    instead of re-tokenizing, an exact integer identity.
    """
    # corpus-level counts aggregate OCCURRENCE rows directly — the
    # per-doc (id, ngram) pre-aggregation would be a second shuffle
    # feeding an identical integer total (exact under any order)
    if raw_grams is not None:
        raw_counts = raw_grams.groupBy("ngram").agg(F.sum("tf").alias("cr"))
    else:
        raw_counts = (
            _gram_rows(raw, n, text_col, id_col)
            .groupBy("ngram")
            .agg(F.count(F.lit(1)).alias("cr"))
        )
    tgt_counts = (
        _gram_rows(target, n, text_col, id_col)
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("ct"))
    )
    # each counts table feeds BOTH the totals aggregate and the join
    # below; Catalyst does not share the common subplan, so without a
    # persist the corpus is tokenized and shuffled twice per side.  The
    # tables are vocabulary-sized (<< corpus) — cache the counts, not
    # the token stream (MEMORY_AND_DISK default spills at scale).
    raw_counts = raw_counts.persist()
    tgt_counts = tgt_counts.persist()
    # totals / vocab as 1-row DF -> crossJoin (never .collect(): the
    # totals job would otherwise run eagerly and twice)
    totals = raw_counts.agg(
        F.sum("cr").alias("nr"), F.count(F.lit(1)).alias("v")
    ).crossJoin(tgt_counts.agg(F.sum("ct").alias("nt")))
    joined = (
        raw_counts.join(tgt_counts, "ngram", "left")
        .na.fill({"ct": 0})
        .crossJoin(F.broadcast(totals))
    )
    logr = F.log(
        ((F.col("ct") + 1) * (F.col("nr") + F.col("v")))
        / ((F.col("cr") + 1) * (F.col("nt") + F.col("v")))
    )
    return joined.select("ngram", _round4(logr).alias("logr"))


def dsir_scores(
    df: DataFrame,
    ratios: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, score): tf-weighted mean log-likelihood ratio per document.

    Mean (not sum) so the score is length-normalized — otherwise long
    documents dominate selection regardless of fit, the standard DSIR
    normalization.  N-grams absent from the ratio table (not in the raw
    corpus model) contribute 0."""
    grams = word_ngrams(df, n, text_col, id_col)
    scored = (
        grams.join(ratios, "ngram", "left")
        .na.fill({"logr": 0.0})
        .groupBy("id")
        .agg(
            (F.sum(F.col("tf") * F.col("logr")) / F.sum("tf")).alias("__raw_score")
        )
    )
    return scored.select("id", _round4(F.col("__raw_score")).alias("score"))


def hashed_ngram_log_ratios(
    raw: DataFrame,
    target: DataFrame,
    n: int = 2,
    n_buckets: int = 1 << 14,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(bucket, logr): the DSIR paper's hashed variant — n-grams bucket
    into a fixed-size table via xxhash64, so the model is O(n_buckets)
    no matter the vocabulary (guaranteed broadcastable at any corpus
    size; collisions blur the model slightly, exactly as published)."""
    b = lambda d: (  # noqa: E731
        _gram_rows(d, n, text_col, id_col)
        .select(F.pmod(F.xxhash64("ngram"), F.lit(n_buckets)).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # same double-reference as ngram_log_ratios (totals + join): persist
    # the bucket tables — O(n_buckets) rows, trivially cacheable
    raw_b = b(raw).withColumnRenamed("c", "cr").persist()
    tgt_b = b(target).withColumnRenamed("c", "ct").persist()
    totals = raw_b.agg(F.sum("cr").alias("nr")).crossJoin(
        tgt_b.agg(F.sum("ct").alias("nt"))
    )
    joined = (
        raw_b.join(tgt_b, "bucket", "outer")
        .na.fill({"cr": 0, "ct": 0})
        .crossJoin(F.broadcast(totals))
    )
    logr = F.log(
        ((F.col("ct") + 1) * (F.col("nr") + F.lit(n_buckets)))
        / ((F.col("cr") + 1) * (F.col("nt") + F.lit(n_buckets)))
    )
    return joined.select("bucket", _round4(logr).alias("logr"))


def dsir_scores_hashed(
    df: DataFrame,
    bucket_ratios: DataFrame,
    n: int = 2,
    n_buckets: int = 1 << 14,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Scale-path scoring against the hashed model (broadcast join)."""
    grams = word_ngrams(df, n, text_col, id_col).select(
        "id", F.pmod(F.xxhash64("ngram"), F.lit(n_buckets)).alias("bucket"), "tf"
    )
    return (
        grams.join(F.broadcast(bucket_ratios), "bucket", "left")
        .na.fill({"logr": 0.0})
        .groupBy("id")
        .agg(_round4(F.sum(F.col("tf") * F.col("logr")) / F.sum("tf")).alias("score"))
    )


def dsir_resample(
    scored: DataFrame,
    k: int,
    seed: int = 42,
    temperature: float = 1.0,
    id_col: str = "id",
    score_col: str = "score",
) -> DataFrame:
    """Deterministic Gumbel-top-k importance resampling.

    Sampling WITHOUT replacement proportional to exp(score/temperature)
    == taking the top k of score/temperature + Gumbel noise (the
    Gumbel-max trick).  Noise derives from xxhash64(id, seed), so the
    draw is reproducible, embarrassingly parallel, and the only global
    operation is one TakeOrderedAndProject — no shuffle of the corpus.
    temperature -> 0 degrades to plain top-k by score."""
    # u in (0,1): 53 mantissa bits of the hash; g = -ln(-ln(u))
    u = (
        F.pmod(F.xxhash64(F.col(id_col), F.lit(seed)), F.lit(1 << 53)).cast("double")
        + 0.5
    ) / float(1 << 53)
    g = -F.log(-F.log(u))
    key = F.col(score_col) / F.lit(max(temperature, 1e-12)) + g
    return (
        scored.withColumn("__g", key)
        .orderBy(F.desc("__g"), F.col(id_col))
        .limit(k)
        .drop("__g")
    )


def source_kl_divergence(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
) -> DataFrame:
    """Per-group KL divergence of the unigram distribution from the whole
    corpus — the data-mixture drift diagnostic (which source no longer
    looks like the mix it feeds).

    KL(group || corpus) = sum_w p_g(w) * ln(p_g(w) / p_c(w)) with
    Laplace smoothing over the corpus vocabulary V:
    p_g = (c_gw + 1) / (n_g + V), p_c = (c_w + 1) / (n_c + V).

    Cross-engine determinism: each word's contribution is scaled to an
    INTEGER (floor(x * 1e8 + 0.5) as BIGINT) before summation, so the
    per-group sum is exact integer arithmetic in both engines and
    summation order cannot move the result; only a ~1-ulp libm ln()
    difference landing a contribution exactly on a .5 grid boundary
    could diverge (~1e-8 per term, the DSIR precedent).  Returns
    (group, n_tokens, kl) with kl floor-rounded to 1e-6.
    """
    words = (
        df.select(
            F.col(group_col).alias("grp"),
            F.explode(
                F.filter(
                    F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda w: w != "",
                )
            ).alias("w"),
        )
    )
    # gw feeds cw, gtot AND the final join — four references Catalyst
    # will not share, i.e. four full tokenize+shuffle passes over the
    # corpus.  gw is (group x vocab)-sized (<< corpus): persist it so
    # the corpus is scanned once and everything downstream re-reads the
    # cached table.
    gw = words.groupBy("grp", "w").agg(F.count(F.lit(1)).alias("cgw")).persist()
    cw = gw.groupBy("w").agg(F.sum("cgw").alias("cw"))
    gtot = gw.groupBy("grp").agg(F.sum("cgw").alias("ng"))
    consts = cw.agg(
        F.count(F.lit(1)).alias("v"), F.sum("cw").alias("nc")
    )  # 1 row: vocabulary size + corpus token count
    pg = (F.col("cgw") + 1) / (F.col("ng") + F.col("v"))
    pc = (F.col("cw") + 1) / (F.col("nc") + F.col("v"))
    contrib = F.floor(pg * F.log(pg / pc) * F.lit(1e8) + F.lit(0.5)).cast("long")
    return (
        gw.join(cw, "w")
        .join(F.broadcast(gtot), "grp")
        .crossJoin(F.broadcast(consts))
        .groupBy("grp")
        .agg(
            F.max("ng").alias("n_tokens"),
            (
                F.floor(F.sum(contrib).cast("double") / F.lit(100.0) + F.lit(0.5))
                / F.lit(1e6)
            ).alias("kl"),
        )
    )
