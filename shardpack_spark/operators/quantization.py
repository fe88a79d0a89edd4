"""Product quantization (PQ) for embedding compression + ANN search.

The canonical way to fit a 100 TB float32 embedding corpus in serving
memory (Jegou et al. 2011, public paper): split each d-dim vector into M
subvectors, k-means each subspace to K centroids, and store a vector as
M small codes — d*4 bytes become M bytes (d=64, M=8: 32x).  Search uses
asymmetric distance computation (ADC): the query stays exact, each
subspace contributes a K-entry lookup table, and a database vector's
distance is the sum of M table entries.

Determinism contract: subspace k-means reuses the clustering module's
deterministic Lloyd's (hash-seeded init, exact decimal means), so
codebooks are a pure function of (data, seed) under any partitioning.
Encoding and ADC are argmin/folds over doubles in fixed order.

Scale shape: training touches only a hash-picked sample (codebooks are
M*K*(d/M) floats — tiny); encoding is one codegen pass with the
codebooks inlined as literals (no shuffle, no Python); ADC search is a
scan + TakeOrderedAndProject with the M lookup tables inlined — the
same no-shuffle plan as exact cosine top-k, but reading M bytes per
vector instead of d*4.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from shardpack_spark.operators.clustering import kmeans_assign


def _subvec(vec: Column, m_idx: int, sub_d: int) -> Column:
    return F.slice(vec, m_idx * sub_d + 1, sub_d)


def pq_train(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_iter: int = 3,
    seed: int = 42,
    dim: int | None = None,
    train_fraction: float | None = None,
) -> list[list[list[float]]]:
    """Train M codebooks of K centroids each; returns codebooks[m][k][d/M].

    Each subspace trains independently with the deterministic k-means.
    Centroid ids may be sparse (empty clusters drop) — codebooks keep
    only surviving centroids, and codes index into that list.  Pass
    ``dim`` when known to skip the one-row probe job.

    ``train_fraction``: train on a deterministic hash sample instead of
    the full corpus (the FAISS convention — codebooks converge on a few
    hundred points per centroid, and M x n_iter full-corpus passes are
    the dominant build cost at 100 TB).  The sample is a pure function
    of (id, seed), so codebooks stay reproducible under any
    partitioning; encoding always covers every vector.
    """
    if dim is None:
        dim = len(df.select(vec_col).head()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    if train_fraction is not None:
        from shardpack_spark.operators.sampling import hash_sample

        df = hash_sample(df, id_col, train_fraction, seed=seed)
    sub_d = dim // m
    books: list[list[list[float]]] = []
    for mi in range(m):
        sub = df.select(
            F.col(id_col),
            _subvec(F.col(vec_col), mi, sub_d).alias(vec_col),
        )
        assigned, centroids = kmeans_assign(
            sub, k=k, n_iter=n_iter, vec_col=vec_col, id_col=id_col,
            seed=seed + mi, return_centroids=True,
        )
        books.append([c for _, c in sorted(centroids)])
    return books


def _encode_one(vec: Column, book: list[list[float]], mi: int, sub_d: int) -> Column:
    """Codegen argmin over the inlined sub-codebook (0-based code)."""
    sv = F.transform(_subvec(vec, mi, sub_d), lambda x: x.cast("double"))
    dists = []
    for cent in book:
        c = F.array(*[F.lit(float(x)) for x in cent])
        d = F.aggregate(
            F.zip_with(sv, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, z: acc + z,
        )
        dists.append(d)
    darr = F.array(*dists)
    return (F.array_position(darr, F.array_min(darr)) - 1).cast("int")


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Adds ``pq_code`` (array<int>, length M): one codegen pass, the
    codebooks inlined as literals — no shuffle, no Python in the plan."""
    sub_d = len(codebooks[0][0])
    codes = F.array(
        *[
            _encode_one(F.col(vec_col), book, mi, sub_d)
            for mi, book in enumerate(codebooks)
        ]
    )
    return df.withColumn("pq_code", codes)


def pq_decode_expr(codebooks: list[list[list[float]]]) -> Column:
    """Reconstruction (centroid concat) of ``pq_code`` — for distortion
    audits and the ADC-equivalence test."""
    parts = []
    for mi, book in enumerate(codebooks):
        lit = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in book])
        parts.append(F.element_at(lit, F.col("pq_code")[mi] + 1))
    return F.flatten(F.array(*parts))


def ivfpq_build(
    df: DataFrame,
    coarse_k: int = 16,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_iter: int = 3,
    seed: int = 42,
    train_fraction: float | None = None,
):
    """IVF-PQ index build (the standard billion-scale ANN layout):
    coarse k-means buckets the corpus, PQ encodes each vector's RESIDUAL
    from its coarse centroid (residuals are smaller and more isotropic
    than raw vectors, so the same code budget quantizes them tighter).

    Returns (encoded_df(id, cid, pq_code), coarse: list[(pos, centroid)],
    codebooks).  At 100 TB the encoded table is written bucketed by cid
    so a query's nprobe buckets are the only partitions read.
    """
    assigned, coarse = kmeans_assign(
        df, k=coarse_k, n_iter=n_iter, vec_col=vec_col, id_col=id_col,
        seed=seed, return_centroids=True,
    )
    # remap possibly-sparse cluster ids to dense positions for literal lookup
    cid_to_pos = {cid: i for i, (cid, _) in enumerate(sorted(coarse))}
    cents = [c for _, c in sorted(coarse)]
    pos_expr = F.element_at(
        F.map_from_arrays(
            F.array(*[F.lit(int(c)) for c in cid_to_pos]),
            F.array(*[F.lit(int(p)) for p in cid_to_pos.values()]),
        ),
        F.col("cluster"),
    )
    cent_lit = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in cents]
    )
    residual = F.zip_with(
        F.col("v"), F.element_at(cent_lit, F.col("__pos") + 1), lambda a, b: a - b
    )
    res_df = (
        assigned.withColumn("__pos", pos_expr)
        .select(F.col(id_col), F.col("__pos").alias("cid"), residual.alias(vec_col))
    )
    # cache the residual frame: codebook training makes m passes over it
    # and the encode pass a final one — without this the coarse argmin +
    # residual zip recomputes every time.  The seed offset matters: the
    # coarse k-means and PQ subspace seeds must differ, or (with
    # n_iter=1) subspace 0's seed rows are exactly the coarse seed rows,
    # whose residuals are all zero — a degenerate all-zero codebook.
    from pyspark import StorageLevel

    res_df = res_df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        books = pq_train(
            res_df, m=m, k=k, vec_col=vec_col, id_col=id_col,
            n_iter=n_iter, seed=seed + 7919 * (coarse_k + 1),
            dim=len(cents[0]), train_fraction=train_fraction,
        )
        encoded = pq_encode(res_df, books, vec_col).select(id_col, "cid", "pq_code")
        # materialize the (small: M bytes/vector) index before dropping
        # the residual cache; callers unpersist `encoded` when done
        encoded = encoded.persist(StorageLevel.MEMORY_AND_DISK)
        encoded.count()
    finally:
        res_df.unpersist(blocking=False)
    return encoded, [(i, c) for i, c in enumerate(cents)], books


def rank_buckets(
    coarse: list[tuple[int, list[float]]], query: list[float], nprobe: int
) -> list[tuple[int, list[float]]]:
    """The nprobe coarse buckets nearest the query (squared L2, smallest
    position breaks ties).  The ONE ranking both the in-session
    ``ivfpq_topk`` and the persisted-index reader use — a divergent copy
    would make the reader open buckets the scorer never probes."""
    return sorted(
        coarse,
        key=lambda pc: (sum((qx - cx) ** 2 for qx, cx in zip(query, pc[1])), pc[0]),
    )[:nprobe]


def ivfpq_topk(
    encoded: DataFrame,
    coarse: list[tuple[int, list[float]]],
    codebooks: list[list[list[float]]],
    query: list[float],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k over the nprobe coarse buckets nearest the query.

    Distance to a vector in bucket c is ||q - (centroid_c + decode(code))||²
    = ADC over the residual query (q - centroid_c) — one M-entry table
    set per probed bucket, inlined as literals; the scan touches only
    probed-bucket rows (partition-pruned when the table is bucketed by
    cid) and ends in TakeOrderedAndProject.
    """
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    if not coarse:
        raise ValueError("empty coarse centroid list")
    _check_query_dim(query, len(coarse[0][1]))
    ranked = rank_buckets(coarse, query, nprobe)

    dist = None
    for pos, cent in ranked:
        rq = [qx - cx for qx, cx in zip(query, cent)]
        d = _adc_dist_expr(codebooks, rq)
        dist = (
            F.when(F.col("cid") == pos, d)
            if dist is None
            else dist.when(F.col("cid") == pos, d)
        )
    probed = [pos for pos, _ in ranked]
    return (
        encoded.filter(F.col("cid").isin(probed))
        .select(F.col(id_col), dist.alias("adc_dist"))
        .orderBy("adc_dist", id_col)
        .limit(k)
    )


def pq_topk(
    df_codes: DataFrame,
    codebooks: list[list[list[float]]],
    query: list[float],
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """ADC top-k by squared L2: per-subspace lookup tables from the exact
    query, summed via the stored codes.  Scan + TakeOrderedAndProject —
    no shuffle, and only the M-byte codes are read per vector."""
    _check_query_dim(query, len(codebooks) * len(codebooks[0][0]))
    dist = _adc_dist_expr(codebooks, query)
    return (
        df_codes.select(F.col(id_col), dist.alias("adc_dist"))
        .orderBy("adc_dist", id_col)
        .limit(k)
    )


def _check_query_dim(query: list[float], expected: int) -> None:
    """zip() would silently truncate a wrong-dimensional query into a
    quietly-wrong ranking — refuse instead."""
    if len(query) != expected:
        raise ValueError(f"query has dim {len(query)}, index expects {expected}")


def _adc_dist_expr(codebooks: list[list[list[float]]], q: list[float]) -> Column:
    """Squared-L2 ADC distance: per-subspace K-entry lookup tables from
    ``q``, inlined as literals and summed via the stored codes."""
    sub_d = len(codebooks[0][0])
    dist = F.lit(0.0)
    for mi, book in enumerate(codebooks):
        qs = q[mi * sub_d : (mi + 1) * sub_d]
        table = [
            float(sum((qx - cx) ** 2 for qx, cx in zip(qs, cent))) for cent in book
        ]
        tlit = F.array(*[F.lit(t) for t in table])
        dist = dist + F.element_at(tlit, F.col("pq_code")[mi] + 1)
    return dist
