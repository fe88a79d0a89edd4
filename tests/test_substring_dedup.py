"""substring_dedup: distributed token-window span removal vs a pure-Python
reference with identical semantics (canonical = min doc_id keeps the span,
every covered token elsewhere is removed)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from shardpack_spark.operators.dedup import substring_dedup


def _ref(docs: dict[int, str], window: int, max_doc_freq: int = 1):
    toks = {d: t.split() for d, t in docs.items()}
    owners: dict[str, set[int]] = {}
    for d, ts in toks.items():
        for i in range(len(ts) - window + 1):
            owners.setdefault(" ".join(ts[i : i + window]), set()).add(d)
    out = {}
    for d, ts in toks.items():
        covered: set[int] = set()
        for i in range(len(ts) - window + 1):
            own = owners[" ".join(ts[i : i + window])]
            if len(own) > max_doc_freq and d != min(own):
                covered.update(range(i, i + window))
        kept = [t for j, t in enumerate(ts) if j not in covered]
        out[d] = (" ".join(kept), len(ts), len(kept))
    return out


def _run(spark, docs: dict[int, str], window: int, max_doc_freq: int = 1):
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    rows = substring_dedup(
        df, window=window, max_doc_freq=max_doc_freq
    ).collect()
    got = {r["doc_id"]: (r["text"], r["n_tokens"], r["n_kept"]) for r in rows}
    assert got == _ref(docs, window, max_doc_freq)
    return got


def test_shared_passage_removed_from_non_canonical(spark):
    passage = " ".join(f"boiler{i}" for i in range(12))
    docs = {
        1: f"alpha beta {passage} gamma delta",
        2: f"totally different prefix {passage} and a different suffix here",
        3: "no shared content at all in this document " * 2,
    }
    got = _run(spark, docs, window=8)
    # canonical doc 1 keeps the passage; doc 2 loses every covered token
    assert "boiler0" in got[1][0]
    assert "boiler0" not in got[2][0]
    assert got[2][0].startswith("totally different prefix")
    assert got[3][1] == got[3][2]  # untouched


def test_short_empty_and_fully_covered_docs_survive(spark):
    shared = " ".join(f"w{i}" for i in range(10))
    docs = {
        1: shared,  # canonical owner, exactly one window
        2: shared,  # fully covered -> empty text, still present
        3: "tiny doc",  # shorter than the window
        4: "   ",  # whitespace-only
    }
    got = _run(spark, docs, window=10)
    assert got[1] == (shared, 10, 10)
    assert got[2] == ("", 10, 0)
    assert got[3] == ("tiny doc", 2, 2)
    assert got[4] == ("", 0, 0)


def test_overlapping_runs_merge_and_doc_freq_threshold(spark):
    long_passage = " ".join(f"p{i}" for i in range(30))
    docs = {
        1: f"{long_passage} unique tail one",
        2: f"head two {long_passage}",
        3: f"head three {long_passage} tail three",
    }
    # max_doc_freq=2 tolerates pairs: a window must appear in >2 docs to drop
    got = _run(spark, docs, window=10, max_doc_freq=2)
    assert "p0" in got[2][0] or got[2][2] < got[2][1]  # consistency via _ref
    got1 = _run(spark, docs, window=10, max_doc_freq=1)
    assert "p0" not in got1[2][0] and "p0" not in got1[3][0]
    assert "p0" in got1[1][0]


def test_randomized_corpora_match_reference(spark):
    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(40)]
    for trial in range(4):
        shared_spans = [
            " ".join(rng.choices(vocab, k=rng.randint(6, 14))) for _ in range(3)
        ]
        docs = {}
        for d in range(8):
            parts = []
            for _ in range(rng.randint(1, 4)):
                if rng.random() < 0.5:
                    parts.append(rng.choice(shared_spans))
                parts.append(" ".join(rng.choices(vocab, k=rng.randint(0, 9))))
            docs[d] = " ".join(parts)
        _run(spark, docs, window=6)


def test_partition_independence(spark):
    passage = " ".join(f"s{i}" for i in range(15))
    docs = {d: f"doc {d} header {passage} trailer {d}" for d in range(6)}
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    one = substring_dedup(df.coalesce(1), window=10).sort("doc_id").collect()
    many = substring_dedup(df.repartition(7), window=10).sort("doc_id").collect()
    assert one == many
    assert all(r["n_kept"] == r["n_tokens"] for r in one if r["doc_id"] == 0)
