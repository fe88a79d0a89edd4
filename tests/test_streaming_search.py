"""Streaming index maintenance: a document stream drives incremental
inverted-index updates through foreachBatch.

The rolling-ingestion composition: docs arrive continuously, each
micro-batch tokenizes ONLY its own documents and commits one patch;
searches over the live index match a from-scratch rebuild at every
point.  The checkpoint gives at-least-once batches; update_inverted_
index's patch commit is serialized by the dataset commit lock.
"""

from __future__ import annotations

import os

import pytest

pytestmark = pytest.mark.slow  # heavy family: deselect with -m 'not slow'
from pyspark.sql import functions as F

from shardpack_spark.format.patches import list_patches
from shardpack_spark.operators.search import (
    build_inverted_index,
    corpus_stats,
    search_bm25,
    term_stats,
    update_inverted_index,
)
from shardpack_spark.tables import load_table


def test_streamed_docs_update_search_index(spark, sf_dir, tmp_path):
    idx = str(tmp_path / "idx")
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    wave1 = docs.filter(F.col("doc_id") < 100)
    wave2 = docs.filter((F.col("doc_id") >= 100) & (F.col("doc_id") < 200))

    def apply_batch(batch_df, batch_id):
        from shardpack_spark.format.datasource import _load_manifest

        if batch_df.isEmpty():
            return
        if _load_manifest(idx) is None:
            build_inverted_index(batch_df, idx)
        else:
            update_inverted_index(batch_df, idx, batch_id=batch_id)

    def run_stream():
        q = (
            spark.readStream.schema("doc_id long, text string")
            .parquet(src)
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180), "stream did not finish in time"

    wave1.coalesce(1).write.mode("append").parquet(src)
    run_stream()
    assert corpus_stats(spark, idx)["n_docs"] == wave1.count()

    wave2.coalesce(1).write.mode("append").parquet(src)
    run_stream()
    both = docs.filter(F.col("doc_id") < 200)
    assert corpus_stats(spark, idx)["n_docs"] == both.count()
    assert len(list_patches(idx)) == 1

    # live index == from-scratch rebuild over everything seen so far
    full = str(tmp_path / "full")
    build_inverted_index(both, full)
    live_stats = {r["term"]: r["df"] for r in term_stats(spark, idx).collect()}
    full_stats = {r["term"]: r["df"] for r in term_stats(spark, full).collect()}
    assert live_stats == full_stats
    probe = sorted(full_stats, key=full_stats.get)[:2]
    live = {r["doc_id"]: r["score"] for r in search_bm25(spark, idx, probe).collect()}
    ref = {r["doc_id"]: r["score"] for r in search_bm25(spark, full, probe).collect()}
    assert set(live) == set(ref)
    for d, s in ref.items():
        assert live[d] == pytest.approx(s, rel=1e-12)

    # restart with the same checkpoint and no new files: no extra patch
    run_stream()
    assert len(list_patches(idx)) == 1
