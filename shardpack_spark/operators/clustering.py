"""Embedding clustering (k-means) and semantic deduplication (SemDeDup).

SemDeDup (Abbas et al. 2023, public paper) removes *semantic* duplicates
from a training corpus: cluster the embedding space, then drop documents
whose embeddings are near-identical to another document in the same
cluster.  Clustering bounds the pair search — the all-pairs cosine only
ever runs within a cluster, never across the corpus.

Determinism contract (what makes this oracle-checkable):
- init: the k seed centroids are the vectors with the k smallest
  ``md5(vec_id || '|seed')`` values (tie-break vec_id) — a pure function
  of the data, identical on any engine, any partitioning.
- assignment: squared-L2 argmin with ties broken toward the smallest
  cluster id; distances are sequential left-folds over doubles, the same
  fold order DuckDB's ``list_reduce`` uses.
- update: per-dimension mean as an EXACT decimal(28,12) sum (order
  independent — safe under any shuffle) cast to double for ONE IEEE
  division.  Never a float sum, whose value would depend on partitioning.
- empty clusters are dropped (both engines simply lose the cid group).

Scale design: each Lloyd iteration is one shuffle of (cluster, dim)
decimal partial sums with map-side combine — k*d rows to the driver,
never data rows.  The driver holds only the k x d centroid matrix
(the same state any distributed k-means keeps) and re-inlines it as a
literal array, so assignment is pure whole-stage codegen.  The SemDeDup
pair join shuffles on the cluster id; its cost is sum of cluster sizes
squared, which k is chosen to bound (k ~ n/1000 in the paper).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(vec) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    """Sequential left-fold of (x-c)^2 — matches list_reduce order."""
    cent = F.array(*[F.lit(float(c)) for c in centroid])
    diffs = F.zip_with(vec, cent, lambda x, c: (x - c) * (x - c))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, d: acc + d)


def _assign(vecs: DataFrame, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """(id, v) + cluster: argmin over the inlined centroid literals,
    first-minimum (= smallest cid) on ties, all codegen, no shuffle."""
    dists = F.array(*[_sq_dist(F.col("v"), c) for _, c in centroids])
    cids = F.array(*[F.lit(int(cid)) for cid, _ in centroids])
    best = F.element_at(cids, F.array_position(dists, F.array_min(dists)).cast("int"))
    return vecs.withColumn("cluster", best)


def kmeans_assign(
    df: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    return_centroids: bool = False,
) -> DataFrame:
    """Lloyd's k-means over an embedding column; returns
    (id_col, cluster, v double-array), plus the final [(cid, centroid)]
    list when ``return_centroids`` is set (for codebook consumers).

    ``n_iter`` counts assignment steps: assign(c0), update, assign(c1),
    update, ..., returning the final assignment.  Each update collects
    only the k x d aggregated centroid matrix to the driver (the
    legitimate iterative-algorithm state, O(k*d), data-size independent).
    """
    vecs = df.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v")
    ).persist()
    seeds = (
        vecs.select(
            F.col(id_col),
            "v",
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(f"|{seed}"))).alias("__h"),
        )
        .orderBy("__h", id_col)
        .limit(k)
        .collect()
    )
    centroids = [(i, list(r["v"])) for i, r in enumerate(seeds)]

    assigned = _assign(vecs, centroids)
    for _ in range(n_iter - 1):
        rows = (
            assigned.select("cluster", F.posexplode("v").alias("pos", "val"))
            .groupBy("cluster", "pos")
            .agg(
                (
                    F.sum(F.col("val").cast("decimal(28,12)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("cd")
            )
            .collect()
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in rows:
            by_cid.setdefault(r["cluster"], {})[r["pos"]] = r["cd"]
        centroids = [
            (cid, [dims[p] for p in sorted(dims)]) for cid, dims in sorted(by_cid.items())
        ]
        assigned = _assign(vecs, centroids)
    out = assigned.select(id_col, "cluster", "v")
    # the cache only serves the centroid iterations above; the returned
    # plan recomputes — callers like pq_train would otherwise accumulate
    # one pinned projection per trained subspace
    vecs.unpersist(blocking=False)
    return (out, centroids) if return_centroids else out


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.9,
    k: int = 8,
    n_iter: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """SemDeDup: (id, cluster, kept) — ``kept`` is false iff some
    same-cluster row with a smaller id has cosine >= threshold.

    The drop rule is EXISTS-shaped (deterministic, order-free), not
    graph-component resolution — ``operators.dedup.resolve_clusters``
    provides that when transitive grouping is wanted.  The pair join is
    an equi-join on the cluster id; vectors travel once per side.
    """
    assigned = kmeans_assign(df, k, n_iter, vec_col, id_col, seed).persist()
    a = assigned.select(
        F.col("cluster"), F.col(id_col).alias("id_a"), F.col("v").alias("va")
    )
    b = assigned.select(
        F.col("cluster"), F.col(id_col).alias("id_b"), F.col("v").alias("vb")
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    dups = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(dot / (norm(F.col("va")) * norm(F.col("vb"))) >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
    )
    out = (
        assigned.join(dups.withColumn("__dup", F.lit(True)), id_col, "left")
        .select(
            id_col,
            "cluster",
            F.coalesce(~F.col("__dup"), F.lit(True)).alias("kept"),
        )
        # materialize, then drop the assignment cache: the returned
        # frame's blocks free when it is GC'd, instead of one persisted
        # vector table pinning executor storage per semantic_dedup call
        .localCheckpoint(eager=True)
    )
    assigned.unpersist()
    return out
