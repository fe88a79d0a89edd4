"""Tests for sequence packing, incremental cross-corpus dedup, and the
deterministic global shuffle."""

from __future__ import annotations

from pyspark.sql import functions as F

from shardpack_spark.operators import dedup
from shardpack_spark.operators.packing import pack_sequences, packing_stats
from shardpack_spark.operators.sampling import shuffle_rows
from shardpack_spark.tables import load_table

BUDGET = 512


def _tokens(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")
    )


def test_pack_every_doc_exactly_once(spark, sf_dir):
    toks = _tokens(spark, sf_dir)
    packed = pack_sequences(toks, budget=BUDGET)
    n_docs = toks.count()
    assert packed.count() == n_docs
    assert packed.select("doc_id").distinct().count() == n_docs


def test_pack_respects_budget_except_oversize_singletons(spark, sf_dir):
    packed = pack_sequences(_tokens(spark, sf_dir), budget=BUDGET)
    stats = packing_stats(packed, budget=BUDGET)
    over = stats.filter(F.col("tokens") > BUDGET)
    # every over-budget sequence is a single oversize document
    bad = over.filter((F.col("n_docs") != 1) | (~F.col("oversize"))).count()
    assert bad == 0
    # oversize flags only appear on docs that genuinely exceed the budget
    assert packed.filter(F.col("oversize") & (F.col("n_tokens") <= BUDGET)).count() == 0


def test_pack_fill_ratio_beats_one_doc_per_sequence(spark, sf_dir):
    toks = _tokens(spark, sf_dir)
    packed = pack_sequences(toks, budget=BUDGET)
    n_seqs = packed.select("seq_id").distinct().count()
    n_docs = toks.count()
    # FFD must actually pack: far fewer sequences than documents, and
    # mean fill of the non-oversize bins comfortably above one-doc waste
    assert n_seqs < n_docs
    mean_fill = (
        packing_stats(packed, budget=BUDGET)
        .filter(~F.col("oversize"))
        .agg(F.avg("fill"))
        .first()[0]
    )
    assert mean_fill is not None and mean_fill > 0.5


def test_pack_deterministic_across_partitionings(spark, sf_dir):
    toks = _tokens(spark, sf_dir)
    a = pack_sequences(toks, budget=BUDGET).collect()
    b = pack_sequences(toks.repartition(7), budget=BUDGET).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_incremental_flags_exact_copies(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    sh = dedup.char_shingles(corpus)
    corpus_sigs = dedup.minhash_signatures(sh, n_hashes=64, seed=42).persist()

    # the new batch re-submits 20 corpus docs verbatim under shifted ids
    resubmitted = corpus.filter(F.col("doc_id") < 40).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    flagged = dedup.incremental_near_dup(
        resubmitted, corpus_sigs, threshold=0.8, n_hashes=64, seed=42
    )
    got = {r["sid_new"]: (r["dup_of"], r["est"]) for r in flagged.collect()}
    expected_ids = {r["doc_id"] for r in resubmitted.select("doc_id").collect()}
    assert set(got) == expected_ids
    for sid_new, (dup_of, est) in got.items():
        assert est == 1.0  # identical text -> identical signature
        # the smallest matching corpus id: the original itself, or an even
        # earlier corpus doc with the same text (the testdata plants
        # exact duplicates), never anything after the original
        assert dup_of % 2 == 0 and dup_of <= sid_new - 1_000_000
    corpus_sigs.unpersist()


def test_incremental_ignores_unrelated_docs(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    corpus_sigs = dedup.minhash_signatures(
        dedup.char_shingles(corpus), n_hashes=64, seed=42
    )
    # synthetic docs that share no shingles with the corpus
    new = spark.createDataFrame(
        [(10_000_000 + i, f"zzqx{i}vw " * 30) for i in range(5)], "doc_id long, text string"
    )
    assert (
        dedup.incremental_near_dup(new, corpus_sigs, threshold=0.5).count() == 0
    )


def test_incremental_candidates_match_self_join_cross_pairs(spark, sf_dir):
    """Cross-corpus banding must find exactly the self-join candidates
    that straddle the corpus/new boundary."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    sigs = dedup.minhash_signatures(
        dedup.char_shingles(docs), n_hashes=64, seed=42
    ).persist()
    corpus_sigs = sigs.join(corpus.select(F.col("doc_id").alias("sid")), "sid")
    batch_sigs = sigs.join(batch.select(F.col("doc_id").alias("sid")), "sid")

    cross = dedup.minhash_lsh_candidates_against(batch_sigs, corpus_sigs)
    got = {(r["sid_new"], r["sid_corpus"]) for r in cross.collect()}

    full = dedup.minhash_lsh_candidates(sigs)
    want = set()
    for r in full.collect():
        a, b = r["sid_a"], r["sid_b"]
        if a % 2 != b % 2:  # one side in each corpus
            new_sid, corp_sid = (a, b) if a % 2 == 1 else (b, a)
            want.add((new_sid, corp_sid))
    sigs.unpersist()
    assert got == want


def test_shuffle_rows_is_deterministic_permutation(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    a = [r["doc_id"] for r in shuffle_rows(docs, "doc_id", seed=1).collect()]
    b = [r["doc_id"] for r in shuffle_rows(docs.repartition(5), "doc_id", seed=1).collect()]
    c = [r["doc_id"] for r in shuffle_rows(docs, "doc_id", seed=2).collect()]
    assert a == b  # partitioning-independent
    assert sorted(a) == sorted(c) and a != c  # same rows, different epoch order
    assert a != sorted(a)  # actually shuffled


# --- FFD core property tests (Spark-free) -----------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from shardpack_spark.operators.packing import ffd_assign  # noqa: E402


@settings(max_examples=200, deadline=None)
@given(
    tokens=st.lists(st.integers(min_value=1, max_value=3000), max_size=300),
    budget=st.integers(min_value=1, max_value=2048),
)
def test_ffd_invariants(tokens, budget):
    ordered = sorted(tokens, reverse=True)
    bins = ffd_assign(ordered, budget)
    assert len(bins) == len(ordered)
    sums: dict[int, int] = {}
    counts: dict[int, int] = {}
    for b, t in zip(bins, ordered):
        sums[b] = sums.get(b, 0) + t
        counts[b] = counts.get(b, 0) + 1
    # bins are opened densely: indices are exactly 0..n_bins-1
    assert sorted(sums) == list(range(len(sums)))
    for b, s in sums.items():
        # over budget only as a solitary oversize item
        assert s <= budget or counts[b] == 1
    # FFD lower bound: every pair of non-oversize bins can't both be
    # under half-full (else the later one would have merged into the
    # earlier) — so at most one open bin is < half the budget at the end
    light = [b for b, s in sums.items() if s * 2 < budget and counts[b] >= 1 and max(
        t for bb, t in zip(bins, ordered) if bb == b) <= budget]
    assert len(light) <= 1


def test_bloom_probe_filters_inside_streaming(spark, sf_dir, tmp_path):
    """Ingest hygiene at stream time: a corpus Bloom filter (broadcast
    bitmap, no join) drops already-seen texts inside a Structured
    Streaming micro-batch, matching the batch-mode probe exactly."""
    import json
    import os

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from shardpack_spark.operators.membership import build_bloom, might_contain

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    bloom = build_bloom(corpus, "text", expected_items=1000, fpp=0.001)

    incoming = docs.filter(F.col("doc_id") < 30).collect()  # mixed seen/unseen
    src = tmp_path / "stream-in"
    src.mkdir()
    with open(os.path.join(src, "batch0.jsonl"), "w") as f:
        for r in incoming:
            f.write(json.dumps({"doc_id": r["doc_id"], "text": r["text"]}) + "\n")

    schema = StructType([StructField("doc_id", LongType()), StructField("text", StringType())])
    stream = spark.readStream.schema(schema).json(str(src))
    fresh = might_contain(stream, "text", bloom).filter(~F.col("might_contain"))
    q = (
        fresh.writeStream.format("memory")
        .queryName("bloom_fresh")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"
    got = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM bloom_fresh").collect()}

    batch_df = spark.createDataFrame(incoming, schema)
    want = {
        r["doc_id"]
        for r in might_contain(batch_df, "text", bloom)
        .filter(~F.col("might_contain"))
        .collect()
    }
    assert got == want  # stream == batch semantics
    # zero false negatives: nothing in the corpus ever passes
    seen_texts = {r["text"] for r in corpus.filter(F.col("doc_id") < 30).collect()}
    passed_texts = {r["text"] for r in incoming if r["doc_id"] in got}
    assert not (passed_texts & seen_texts)


import pytest


@pytest.mark.parametrize(
    "chunk_chars,overlap",
    [(400, 64), (128, 0), (4096, 512), (50, 49)],
)
def test_chunk_documents_reconstructs_originals(spark, sf_dir, chunk_chars, overlap):
    from shardpack_spark.operators.text import chunk_documents

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    stride = chunk_chars - overlap
    chunks = chunk_documents(docs, chunk_chars=chunk_chars, overlap=overlap)
    by_doc: dict[int, list] = {}
    for r in chunks.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    texts = {r["doc_id"]: r["text"] for r in docs.collect() if r["text"]}
    assert set(by_doc) == set(texts)
    for did, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_idx"])
        # dense ids, stride-spaced starts, bounded chunk length
        for i, r in enumerate(rows):
            assert r["chunk_idx"] == i and r["chunk_start"] == 1 + i * stride
            assert len(r["chunk"]) <= chunk_chars
        # overlap-aware concatenation reproduces the document exactly
        rebuilt = rows[0]["chunk"] + "".join(r["chunk"][overlap:] for r in rows[1:])
        assert rebuilt == texts[did]


def test_materialize_sequences_deterministic_concat(spark, sf_dir):
    from shardpack_spark.operators.packing import materialize_sequences

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = _tokens(spark, sf_dir)
    packed = pack_sequences(toks, budget=BUDGET).persist()
    seqs = materialize_sequences(packed, docs, sep="\n\n")
    stats = {r["seq_id"]: (r["n_docs"], r["tokens"]) for r in
             packing_stats(packed, BUDGET).collect()}
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    members: dict[int, list[int]] = {}
    for r in packed.collect():
        members.setdefault(r["seq_id"], []).append(r["doc_id"])
    rows = seqs.collect()
    assert {r["seq_id"] for r in rows} == set(stats)
    for r in rows:
        assert (r["n_docs"], r["n_tokens"]) == stats[r["seq_id"]]
        want_len = sum(len(texts[d]) for d in members[r["seq_id"]]) + 2 * (
            r["n_docs"] - 1
        )
        assert len(r["text"]) == want_len
        for d in members[r["seq_id"]]:
            assert texts[d] in r["text"]
    # byte-for-byte reproducible
    again = {r["seq_id"]: r["text"] for r in
             materialize_sequences(packed.repartition(9), docs).collect()}
    assert {r["seq_id"]: r["text"] for r in rows} == again
    packed.unpersist()


def test_char_lm_scores_hand_example(spark):
    """Counts and Laplace smoothing verified against a hand computation."""
    import math

    from shardpack_spark.operators.text import char_lm_scores, train_char_lm

    ref = spark.createDataFrame([(1, "ababab")], "doc_id long, text string")
    grams, prefixes = train_char_lm(ref, n=2)
    gc = {r["gram"]: r["cnt"] for r in grams.collect()}
    assert gc == {"ab": 3, "ba": 2}
    pc = {r["prefix"]: r["pcnt"] for r in prefixes.collect()}
    assert pc == {"a": 3, "b": 2}

    out = char_lm_scores(
        spark.createDataFrame([(7, "aba"), (8, "zz")], "doc_id long, text string"),
        grams, prefixes, n=2,
    ).collect()
    got = {r["doc_id"]: r for r in out}
    # "aba": grams ab, ba -> ln(4/259) + ln(3/258), averaged
    want_aba = (math.log(4 / 259) + math.log(3 / 258)) / 2
    assert abs(got[7]["avg_logp"] - want_aba) < 1e-9
    # "zz": unseen gram and prefix -> ln(1/256)
    assert abs(got[8]["avg_logp"] - math.log(1 / 256)) < 1e-9
    assert got[8]["ppl"] > got[7]["ppl"]  # garbage scores worse


def test_char_lm_corpus_text_beats_garbled(spark, sf_dir):
    from shardpack_spark.operators.text import char_lm_scores, train_char_lm

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    grams, prefixes = train_char_lm(docs, n=3)
    sample = docs.filter(F.col("doc_id") < 20)
    garbled = sample.select(
        (F.col("doc_id") + 1000).alias("doc_id"), F.reverse("text").alias("text")
    )
    scores = char_lm_scores(sample.unionAll(garbled), grams, prefixes, n=3)
    rows = {r["doc_id"]: r["ppl"] for r in scores.collect()}
    real = [p for d, p in rows.items() if d < 1000]
    fake = [p for d, p in rows.items() if d >= 1000]
    assert sum(real) / len(real) < sum(fake) / len(fake)


def test_exact_dedup_keep_by_policy(spark):
    rows = [
        (1, "same", 0.2), (2, "same", 0.9), (3, "same", 0.9),  # best q, tie -> id 2
        (4, "other", 0.5),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, quality double")
    out = {r["survivor_id"]: r["dup_cnt"] for r in
           dedup.exact_dedup(df, keep_by="quality").collect()}
    assert out == {2: 3, 4: 1}
    # default stays min-id
    out_min = {r["survivor_id"] for r in dedup.exact_dedup(df).collect()}
    assert out_min == {1, 4}


def test_hash_sample_rate_one_keeps_everything(spark, sf_dir):
    """Regression: rate 1.0 used to format as a 9-hex-char threshold that
    string-compares BELOW most hashes, silently keeping ~1/16 of rows."""
    from shardpack_spark.operators.sampling import hash_sample, mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    n = docs.count()
    assert hash_sample(docs, "doc_id", 1.0).count() == n
    assert hash_sample(docs, "doc_id", 0.0).count() == 0
    mixed = mixture_sample(docs, "lang", {"en": 1.0}, key_col="doc_id", default_rate=1.0)
    assert mixed.count() == n


def test_operator_input_validation(spark):
    import pytest as _pt

    from shardpack_spark.operators.membership import build_bloom
    from shardpack_spark.operators.sampling import hash_sample
    from shardpack_spark.operators.text import chunk_documents

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with _pt.raises(ValueError):
        build_bloom(df, "text", expected_items=0)
    with _pt.raises(ValueError):
        build_bloom(df, "text", expected_items=10, fpp=0.0)
    with _pt.raises(ValueError):
        chunk_documents(df, chunk_chars=0)
    with _pt.raises(ValueError):
        chunk_documents(df, chunk_chars=10, overlap=-1)
    with _pt.raises(ValueError):
        hash_sample(df, "doc_id", 1.5)
