"""Deduplication operators for large-scale training-data pipelines.

All operators are shard-parallel DataFrame compositions — no driver-side
collects.  Scale notes per operator:

- exact_dedup:       one hash-shuffle on the 256-bit content hash.
- shingles/minhash:  explode is linear in total text size; the signature
                     aggregation is a single groupBy(doc) with N min()
                     partial aggregates (map-side combined).
- minhash_lsh_pairs: candidate generation shuffles on (band, band_hash) —
                     bucket sizes stay small for realistic data, and the
                     exact-Jaccard verification only touches candidates,
                     never the O(n^2) pair space.
- simhash:           64 conditional-sum partial aggregates per doc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^61 - 1: modulus for the minhash permutation family.
_MERSENNE = (1 << 61) - 1
_MAX_HASH = (1 << 32) - 1


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on sha256(text): one surviving row (min id) per hash.

    Returns (hash, survivor_id, dup_cnt).  Single shuffle on the hash.
    """
    return (
        df.groupBy(F.sha2(F.col(text_col), 256).alias("text_hash"))
        .agg(F.min(id_col).alias("survivor_id"), F.count(F.lit(1)).alias("dup_cnt"))
    )


def char_shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5) -> DataFrame:
    """Distinct character k-gram shingles per document: (id, shingle).

    Built with sequence + explode + substring, all whole-stage-codegen
    expressions; rows scale with total characters, not documents squared.
    """
    return (
        df.filter(F.length(text_col) >= k)
        .select(
            F.col(id_col).alias("sid"),
            F.explode(F.sequence(F.lit(1), F.length(text_col) - (k - 1))).alias("pos"),
            F.col(text_col).alias("__t"),
        )
        .select("sid", F.expr(f"substring(__t, pos, {k})").alias("shingle"))
        .distinct()
    )


def _permuted(base, i: int, seed: int):
    """Deterministic universal-hash permutation of a 32-bit base hash."""
    a = (seed * 1_000_003 + i * 7_919 + 1) % _MERSENNE
    b = (seed * 998_244_353 + i * 104_729) % _MERSENNE
    return (F.lit(a) * base + F.lit(b)) % F.lit(_MERSENNE)


def minhash_signatures(
    shingled: DataFrame, n_hashes: int = 64, seed: int = 42
) -> DataFrame:
    """(sid, sig: array<bigint>) minhash signature per document.

    One groupBy(sid) with n_hashes min() aggregates — partial aggregation
    (map-side combine) keeps the shuffle at one row per (doc, n_hashes).
    """
    base = F.pmod(F.xxhash64("shingle"), F.lit(_MAX_HASH))
    mins = [F.min(_permuted(base, i, seed)).alias(f"h{i}") for i in range(n_hashes)]
    agged = shingled.groupBy("sid").agg(*mins)
    return agged.select("sid", F.array(*[f"h{i}" for i in range(n_hashes)]).alias("sig"))


def minhash_lsh_candidates(
    signatures: DataFrame, bands: int = 16, rows_per_band: int = 4
) -> DataFrame:
    """Candidate near-duplicate pairs (sid_a < sid_b) via LSH banding.

    Docs agreeing on ALL rows of any band land in the same bucket; the
    shuffle key is (band, hash(band slice)), so the pair space is never
    materialized globally.
    """
    banded = signatures.select(
        "sid",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(F.slice("sig", b * rows_per_band + 1, rows_per_band)).alias("bh"),
                )
                for b in range(bands)
            ])
        ).alias("bb"),
    ).select("sid", "bb.band", "bb.bh")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.sid") < F.col("r.sid")),
        )
        .select(F.col("l.sid").alias("sid_a"), F.col("r.sid").alias("sid_b"))
        .distinct()
    )


def jaccard_pairs_exact(
    shingled: DataFrame, threshold: float = 0.8, candidates: DataFrame | None = None
) -> DataFrame:
    """All pairs (or candidate-restricted pairs) with Jaccard >= threshold.

    Intersections come from a self-equi-join on the shingle value — the
    shuffle key is the shingle, so only docs actually sharing content meet.
    (sid_a, sid_b, jac) with a deterministic double division.
    """
    sizes = shingled.groupBy("sid").agg(F.count(F.lit(1)).alias("n"))
    a = shingled.select(F.col("sid").alias("sid_a"), "shingle")
    b = shingled.select(F.col("sid").alias("sid_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("sid_a") < F.col("sid_b"))
        .groupBy("sid_a", "sid_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, ["sid_a", "sid_b"], "left_semi")
    na = sizes.select(F.col("sid").alias("sid_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("sid").alias("sid_b"), F.col("n").alias("nb"))
    out = (
        inter.join(na, "sid_a")
        .join(nb, "sid_b")
        .withColumn(
            "jac",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jac") >= threshold)
        .select("sid_a", "sid_b", "jac")
    )
    return out


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over whitespace tokens: (id, simhash).

    Per-token xxhash64; each output bit is the sign of the sum of that
    bit's +/-1 votes across tokens — 64 conditional-sum partial aggregates,
    one shuffle on the doc id.
    """
    tokens = df.select(
        F.col(id_col).alias("sid"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    ).filter(F.length("tok") > 0)
    h = F.xxhash64("tok")
    votes = [
        F.sum(
            F.when(F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    agged = tokens.groupBy("sid").agg(*votes)
    sim = None
    for b in range(64):
        bit = F.when(F.col(f"b{b}") > 0, F.lit(1 << b if b < 63 else -(1 << 63))).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return agged.select("sid", sim.cast("long").alias("simhash"))


def simhash_near_pairs(sim: DataFrame, bands: int = 4) -> DataFrame:
    """Near-dup candidates: pairs agreeing on >=1 of `bands` 16-bit slices
    (Hamming-distance blocking), verified to Hamming distance <= 3."""
    width = 64 // bands
    slices = sim.select(
        "sid",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftrightunsigned("simhash", b * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("key"),
                )
                for b in range(bands)
            ])
        ).alias("s"),
    ).select("sid", "simhash", "s.band", "s.key")
    l, r = slices.alias("l"), slices.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.sid") < F.col("r.sid")),
        )
        .select(
            F.col("l.sid").alias("sid_a"),
            F.col("r.sid").alias("sid_b"),
            F.col("l.simhash").alias("ha"),
            F.col("r.simhash").alias("hb"),
        )
        .distinct()
    )
    return cand.withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))).filter(
        F.col("hamming") <= 3
    ).select("sid_a", "sid_b", "hamming")
