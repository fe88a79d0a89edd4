"""PageRank vs a NumPy power-iteration reference with identical dangling
handling, plus invariants (probability mass, determinism, known ordering)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from shardpack_spark.operators.graph import out_degrees, pagerank

EDGES = [
    ("a", "b"),
    ("a", "c"),
    ("b", "c"),
    ("c", "a"),
    ("d", "c"),  # e is dangling (no out edges), reached from c? no — keep d->e too
    ("d", "e"),
]


def _ref(edges, iters, damping):
    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    out = {v: 0 for v in verts}
    for s, _ in set(edges):
        out[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.zeros(n)
        for s, d in set(edges):
            nxt[idx[d]] += r[idx[s]] / out[s]
        dangling = sum(r[idx[v]] for v in verts if out[v] == 0)
        r = (1 - damping) / n + damping * (nxt + dangling / n)
    return dict(zip(verts, r))


def _run(spark, edges, iters=5, damping=0.85):
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["vertex"]: r["rank"] for r in pagerank(df, iters=iters, damping=damping).collect()}
    ref = _ref(edges, iters, damping)
    assert set(got) == set(ref)
    for v in ref:
        assert math.isclose(got[v], ref[v], rel_tol=1e-9, abs_tol=1e-12), v
    return got


def test_matches_reference_and_mass_conserved(spark):
    got = _run(spark, EDGES, iters=7)
    assert math.isclose(sum(got.values()), 1.0, rel_tol=1e-9)
    # c receives links from a, b, d: highest rank
    assert max(got, key=got.get) == "c"


def test_dangling_and_duplicate_edges(spark):
    # duplicate edges collapse; graph with a pure sink keeps total mass 1
    edges = [("x", "y"), ("x", "y"), ("y", "z")]
    got = _run(spark, edges, iters=6)
    assert math.isclose(sum(got.values()), 1.0, rel_tol=1e-9)
    assert got["z"] > got["x"]  # z collects y's mass; x only teleports


def test_out_degrees_includes_dangling(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    degs = {r["vertex"]: r["out_deg"] for r in out_degrees(df).collect()}
    assert degs == {"a": 2, "b": 1, "c": 1, "d": 2, "e": 0}


def test_bad_damping_rejected(spark):
    df = spark.createDataFrame(EDGES, "src string, dst string")
    with pytest.raises(ValueError):
        pagerank(df, damping=1.0)
