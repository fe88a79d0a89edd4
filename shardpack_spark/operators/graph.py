"""Link-graph operators for crawl curation.

Web-corpus pipelines rank hosts/domains by link structure (OPIC,
PageRank, harmonic centrality in Common Crawl's own ranking) and use the
rank as a crawl-frontier prior and a quality signal.  PageRank here is
the classic power iteration expressed as DataFrames: each iteration is
one equi-join (ranks x edges on src) plus one partial-aggregated groupBy
on dst — shuffle keys are vertex ids, the edge set is never collected,
and the only driver-side state is two scalars (dangling mass, vertex
count).  Deterministic given the graph and iteration count.

Cluster notes: both sides of the per-iteration join hash-shuffle on the
vertex id, so co-partitioning is stable across iterations (AQE reuses
it); ``persist`` bounds the lineage so iteration N does not replay
iterations 1..N-1.  At web scale the same plan runs with the edge table
bucketed by src, making the join exchange-free on the edge side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def out_degrees(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """(vertex, out_deg) over distinct edges; dangling vertices (no out
    links) appear with out_deg 0."""
    e = edges.select(src, dst).distinct()
    verts = e.select(F.col(src).alias("vertex")).unionByName(
        e.select(F.col(dst).alias("vertex"))
    ).distinct()
    degs = e.groupBy(F.col(src).alias("vertex")).agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    return verts.join(degs, "vertex", "left").select(
        "vertex", F.coalesce("out_deg", F.lit(0)).alias("out_deg")
    )


def pagerank(
    edges: DataFrame,
    iters: int = 10,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(vertex, rank) after ``iters`` power iterations; ranks sum to 1.

    Standard PageRank with uniform teleport and dangling-mass
    redistribution (dangling rank spreads uniformly, keeping the total an
    exact probability mass — the property the tests pin).  Parallel
    edges collapse first so the transition is row-stochastic.
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    # internal names: a caller's src/dst column named rank/out_deg/vertex
    # must not collide with the iteration columns
    e = edges.select(F.col(src).alias("__src"), F.col(dst).alias("__dst")).distinct()
    verts = out_degrees(e, "__src", "__dst").persist()
    n = verts.count()
    if n == 0:
        out = verts.select("vertex", F.lit(0.0).alias("rank"))
        out = out.localCheckpoint(eager=True)
        verts.unpersist()
        return out

    ranks = verts.select("vertex", "out_deg", F.lit(1.0 / n).alias("rank")).persist()
    ranks.count()
    for _ in range(iters):
        contribs = (
            ranks.filter(F.col("out_deg") > 0)
            .join(e, ranks["vertex"] == e["__src"])
            .groupBy(F.col("__dst").alias("vertex"))
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("__in"))
        )
        dangling = (
            ranks.filter(F.col("out_deg") == 0).agg(F.sum("rank")).collect()[0][0]
            or 0.0
        )
        base = (1.0 - damping) / n + damping * dangling / n
        new_ranks = (
            verts.join(contribs, "vertex", "left")
            .select(
                "vertex",
                "out_deg",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("__in"), F.lit(0.0))
                ).alias("rank"),
            )
            .persist()
        )
        new_ranks.count()
        ranks.unpersist()
        ranks = new_ranks
    # materialize the result and release every iteration cache: the
    # returned frame's blocks free when it is garbage-collected, instead
    # of one persisted vertex set pinning storage per pagerank() call
    out = ranks.select("vertex", "rank").localCheckpoint(eager=True)
    ranks.unpersist()
    verts.unpersist()
    return out
