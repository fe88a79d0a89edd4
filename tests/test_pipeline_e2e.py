"""End-to-end corpus curation: the full engine composed as one pipeline.

HTML extraction (WET-style) -> hygiene (PII redaction) -> quality gate
(Gopher verdict) -> exact dedup -> MinHash-LSH near-dup -> cluster
resolution -> deterministic mixture sample -> DSIR importance selection
-> sequence packing -> materialization -> shardpack write/read.

This is the workload the engine exists for; the test pins that the
stages compose (schemas line up, survivors flow through) and that the
WHOLE pipeline is deterministic end to end — same bytes out regardless
of partitioning, which is what makes a 100 TB curation run auditable.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from shardpack_spark.operators import dedup
from shardpack_spark.operators.packing import materialize_sequences, pack_sequences
from shardpack_spark.operators.pii import redact
from shardpack_spark.operators.sampling import mixture_sample
from shardpack_spark.operators import selection
from shardpack_spark.operators.text import gopher_quality_filter
from shardpack_spark.tables import load_table

import pytest

pytestmark = pytest.mark.slow  # heavy family: deselect with -m 'not slow'


def _curate(spark, sf_dir, repartition: int | None = None):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    if repartition:
        docs = docs.repartition(repartition)

    # 0. ingest from markup: wrap every doc in HTML (stand-in for a WET
    #    crawl payload) and extract the visible text back — the result
    #    must round-trip so the rest of the pipeline sees clean text
    from shardpack_spark.operators.text import html_to_text

    wrapped = F.concat(
        F.lit("<html><body><script>var n = 1;</script><p>"),
        F.replace(F.col("text"), F.lit("\n"), F.lit("</p><p>")),
        F.lit("</p></body></html>"),
    )
    docs = docs.withColumn("text", html_to_text(wrapped))

    # 1. hygiene: redact PII in place
    docs = docs.withColumn("text", redact(F.col("text")))

    # 2. quality: keep Gopher-passing docs
    keep = gopher_quality_filter(docs).filter(F.col("keep")).select("doc_id")
    docs = docs.join(keep, "doc_id")

    # 3. exact dedup: keep the min-id survivor of each content hash
    survivors = dedup.exact_dedup(docs).select(F.col("survivor_id").alias("doc_id"))
    docs = docs.join(survivors, "doc_id")

    # 4. near-dup: LSH candidates -> verified pairs -> clusters, keep the
    #    canonical (minimum) member of every duplicate cluster
    sh = dedup.char_shingles(docs, k=5)
    sigs = dedup.minhash_signatures(sh, n_hashes=64, seed=42)
    cand = dedup.minhash_lsh_candidates(sigs, bands=16, rows_per_band=4)
    cand = dedup.filter_candidates_by_signature(cand, sigs, min_estimate=0.6)
    pairs = dedup.jaccard_pairs_exact(sh, threshold=0.8, candidates=cand)
    clusters = dedup.connected_components(pairs)
    drop = clusters.filter(F.col("sid") != F.col("cluster")).select(
        F.col("sid").alias("doc_id")
    )
    docs = docs.join(drop, "doc_id", "left_anti")

    # 5. target corpus mix, reproducibly
    docs = mixture_sample(
        docs, "lang", {"en": 1.0, "zh": 0.5}, key_col="doc_id", default_rate=0.8
    )

    # 5b. DSIR importance selection: keep the 250 docs that look most
    # like the English target distribution, via deterministic
    # Gumbel-top-k resampling (same draw on any partitioning)
    ratios = selection.ngram_log_ratios(docs, docs.filter(F.col("lang") == "en"))
    scored = selection.dsir_scores(docs, ratios)
    pick = selection.dsir_resample(scored, k=250, seed=13).select(
        F.col("id").alias("doc_id")
    )
    docs = docs.join(pick, "doc_id")

    # 6-7. pack into 2048-token sequences and materialize training rows
    toks = docs.select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")
    )
    packed = pack_sequences(toks, budget=2048)
    return docs, materialize_sequences(packed, docs)


def test_full_curation_pipeline(spark, sf_dir, tmp_path):
    docs, seqs = _curate(spark, sf_dir)
    n_in = load_table(spark, sf_dir, "documents").count()
    n_kept = docs.count()
    rows = seqs.collect()
    assert 0 < n_kept < n_in  # every gate actually dropped something
    assert sum(r["n_docs"] for r in rows) == n_kept  # packing is exactly-once
    assert all(r["n_tokens"] <= 2048 or r["n_docs"] == 1 for r in rows)
    assert not any("@" in r["text"] for r in rows)  # emails were redacted

    # 8. the curated sequences land in the engine's own format and come back
    from shardpack_spark.format.datasource import register

    register(spark)
    out = str(tmp_path / "curated")
    (
        seqs.select(
            F.concat(F.lit("seq-"), F.col("seq_id")).alias("key"),
            F.create_map(
                F.lit("n_docs"), F.col("n_docs").cast("string"),
                F.lit("n_tokens"), F.col("n_tokens").cast("string"),
            ).alias("metadata"),
            F.array(
                F.struct(
                    F.lit("text.txt").alias("file_name"),
                    F.lit("text/plain").alias("content_type"),
                    F.encode("text", "UTF-8").alias("data"),
                )
            ).alias("entries"),
        )
        .write.format("shardpack")
        .mode("overwrite")
        .save(out)
    )
    back = spark.read.format("shardpack").load(out)
    assert back.count() == len(rows)
    got = {
        r["key"]: r["text"]
        for r in back.select(
            "key",
            F.decode(F.element_at("entries", 1)["data"], "UTF-8").alias("text"),
        ).collect()
    }
    assert got == {f"seq-{r['seq_id']}": r["text"] for r in rows}


def test_full_curation_pipeline_partition_independent(spark, sf_dir):
    _, a = _curate(spark, sf_dir)
    _, b = _curate(spark, sf_dir, repartition=7)
    sa = {(r["seq_id"], r["text"]) for r in a.collect()}
    sb = {(r["seq_id"], r["text"]) for r in b.collect()}
    assert sa == sb
