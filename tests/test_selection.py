"""DSIR-style importance-resampling selection (operators/selection.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from shardpack_spark.operators import selection
from shardpack_spark.tables import load_table


def _mini(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox the quick brown fox", "en"),
        (3, "der schnelle braune fuchs springt", "de"),
        (4, "la vaca lola tiene cabeza y tiene cola", "es"),
        (5, "one two", "en"),
        (6, "single", "en"),  # <2 words: no bigrams, absent from scores
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_word_ngrams_bigrams(spark):
    df = _mini(spark)
    grams = selection.word_ngrams(df, n=2)
    got = {
        (r["id"], r["ngram"]): r["tf"]
        for r in grams.filter(F.col("id").isin(2, 5, 6)).collect()
    }
    assert got[(2, "the quick")] == 2
    assert got[(2, "fox the")] == 1
    assert got[(5, "one two")] == 1
    assert not any(i == 6 for i, _ in got)  # single word -> no bigram
    # unigrams
    uni = selection.word_ngrams(df, n=1)
    assert uni.filter((F.col("id") == 6) & (F.col("ngram") == "single")).count() == 1


def test_log_ratios_match_reference(spark):
    """Pin the Laplace log-ratio against a hand NumPy-free reference."""
    df = _mini(spark)
    target = df.filter(F.col("lang") == "en")
    ratios = {r["ngram"]: r["logr"] for r in selection.ngram_log_ratios(df, target).collect()}

    # reference recomputation in plain Python
    def grams_of(text):
        ws = [w for w in text.lower().strip().split() if w]
        return [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    raw, tgt = {}, {}
    for _, text, lang in [(r[0], r[1], r[2]) for r in _mini(spark).collect()]:
        for g in grams_of(text):
            raw[g] = raw.get(g, 0) + 1
            if lang == "en":
                tgt[g] = tgt.get(g, 0) + 1
    nr, v, nt = sum(raw.values()), len(raw), sum(tgt.values())
    for g, cr in raw.items():
        expect = math.log((tgt.get(g, 0) + 1) * (nr + v) / ((cr + 1) * (nt + v)))
        expect = math.floor(expect * 10000 + 0.5) / 10000
        assert ratios[g] == pytest.approx(expect, abs=1e-9), g
    # a target-frequent bigram scores above a target-absent one
    assert ratios["the quick"] > ratios["der schnelle"]


def test_scores_prefer_target_like_docs(spark):
    df = _mini(spark)
    target = df.filter(F.col("lang") == "en")
    ratios = selection.ngram_log_ratios(df, target)
    scores = {r["id"]: r["score"] for r in selection.dsir_scores(df, ratios).collect()}
    assert scores[2] > scores[3]  # en-heavy doc above the German doc
    assert scores[1] > scores[4]
    assert 6 not in scores


def test_hashed_variant_tracks_exact(spark):
    """With enough buckets (no collisions on a tiny corpus) the hashed
    model reproduces the exact scores."""
    df = _mini(spark)
    target = df.filter(F.col("lang") == "en")
    exact = {r["id"]: r["score"] for r in selection.dsir_scores(
        df, selection.ngram_log_ratios(df, target)).collect()}
    bucket_ratios = selection.hashed_ngram_log_ratios(df, target, n_buckets=1 << 20)
    hashed = {r["id"]: r["score"] for r in selection.dsir_scores_hashed(
        df, bucket_ratios, n_buckets=1 << 20).collect()}
    # smoothing denominators differ (V vs n_buckets) -> scores shift by a
    # constant; the RANKING must agree, which is what selection consumes.
    # Tie-insensitive compare: both models tie whole groups of docs here,
    # and order WITHIN a tie is just collect() row order (not a contract).
    def ranking(scores):
        groups: dict = {}
        for doc, s in scores.items():
            groups.setdefault(s, set()).add(doc)
        return [groups[s] for s in sorted(groups)]

    assert ranking(exact) == ranking(hashed)


def test_resample_deterministic_and_temperature(spark):
    df = _mini(spark)
    target = df.filter(F.col("lang") == "en")
    scored = selection.dsir_scores(df, selection.ngram_log_ratios(df, target))
    a = [r["id"] for r in selection.dsir_resample(scored, k=3, seed=7).collect()]
    b = [r["id"] for r in selection.dsir_resample(scored, k=3, seed=7).collect()]
    assert a == b and len(a) == 3
    c = [r["id"] for r in selection.dsir_resample(scored, k=3, seed=8).collect()]
    assert len(c) == 3  # different seed may differ; still valid draw
    # temperature -> 0: plain top-k by score (ties broken by noise, so
    # compare the selected SCORES, not ids)
    top = selection.dsir_resample(scored, k=2, seed=7, temperature=1e-9)
    all_scores = sorted((r["score"] for r in scored.collect()), reverse=True)
    got_scores = sorted((r["score"] for r in top.collect()), reverse=True)
    assert got_scores == all_scores[:2]


def test_sf_corpus_end_to_end(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")
    ratios = selection.ngram_log_ratios(docs, target)
    scored = selection.dsir_scores(docs, ratios)
    rows = scored.collect()
    assert len(rows) > 0
    en_ids = {r["doc_id"] for r in target.select("doc_id").collect()}
    en_scores = [r["score"] for r in rows if r["id"] in en_ids]
    other = [r["score"] for r in rows if r["id"] not in en_ids]
    # the model must, on average, score target-language docs higher
    assert sum(en_scores) / len(en_scores) > sum(other) / len(other)
    picked = selection.dsir_resample(scored, k=50, seed=1)
    assert picked.count() == 50


def test_source_kl_divergence_matches_reference(spark):
    """KL per group equals a pure-Python recomputation on a hand corpus."""
    import math

    from shardpack_spark.operators.selection import source_kl_divergence

    rows = [
        ("a", "x x y"),
        ("a", "x z"),
        ("b", "y y y z"),
        ("c", "w w w w"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {r["grp"]: (r["n_tokens"], r["kl"]) for r in source_kl_divergence(df).collect()}

    # reference
    from collections import Counter

    gw: dict[str, Counter] = {}
    for g, t in rows:
        gw.setdefault(g, Counter()).update(t.split())
    cw = Counter()
    for c in gw.values():
        cw.update(c)
    V, nc = len(cw), sum(cw.values())
    for g, c in gw.items():
        ng = sum(c.values())
        s = 0
        for w, cgw in c.items():
            pg = (cgw + 1) / (ng + V)
            pc = (cw[w] + 1) / (nc + V)
            s += math.floor(pg * math.log(pg / pc) * 1e8 + 0.5)
        want = math.floor(s / 100.0 + 0.5) / 1e6
        assert got[g] == (ng, want), (g, got[g], (ng, want))
    # a group identical to the corpus mix would have ~0 divergence; the
    # all-'w' group must diverge most
    assert got["c"][1] == max(v for _, v in got.values())
