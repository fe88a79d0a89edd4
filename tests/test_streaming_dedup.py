"""Streaming near-dup ingest: in-batch + vs-store decisions, replay
idempotence via dynamic partition overwrite, end-to-end foreachBatch
wiring over a micro-batched file source."""

from __future__ import annotations

import json

import pytest

pytestmark = pytest.mark.slow  # heavy family: deselect with -m 'not slow'
import os
import time

from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from shardpack_spark.streaming.dedup_stream import (

    near_dup_ingest_batch,
    start_near_dup_ingest,
)

DOC_SCHEMA = StructType(
    [StructField("doc_id", StringType()), StructField("text", StringType())]
)

BASE = (
    "the quick brown fox jumps over the lazy dog and keeps running through "
    "the quiet forest while the rain falls softly on the green leaves"
)
OTHER = (
    "completely unrelated content about distributed query engines shuffling "
    "columnar batches across executors with adaptive partition coalescing"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, DOC_SCHEMA)


def _decisions(spark, path):
    return {
        r["doc_id"]: (r["dup_of"], r["is_dup"], r["batch_id"])
        for r in spark.read.parquet(path).collect()
    }


def test_batch_semantics_and_replay_idempotence(spark, tmp_path):
    store = str(tmp_path / "sigs")
    dec = str(tmp_path / "dec")

    # batch 0: d1 unique, d2 near-dups d1 (in-batch), d3 unrelated
    b0 = _docs(
        spark,
        [("d1", BASE), ("d2", BASE + " extra tail words"), ("d3", OTHER)],
    )
    near_dup_ingest_batch(b0, 0, store, dec)
    got = _decisions(spark, dec)
    assert got["d1"] == (None, False, 0)
    assert got["d2"][0] == "d1" and got["d2"][1] is True
    assert got["d3"] == (None, False, 0)

    # batch 1: d4 dups the STORED d1, d5 unique
    b1 = _docs(
        spark,
        [
            ("d4", BASE + " !"),
            (
                "d5",
                "a fresh document with entirely new vocabulary describing "
                "oceanic currents, tidal harmonics and sediment transport",
            ),
        ],
    )
    near_dup_ingest_batch(b1, 1, store, dec)
    got = _decisions(spark, dec)
    assert got["d4"][0] == "d1" and got["d4"][1] is True
    assert got["d5"][1] is False

    # store holds every signature exactly once per batch
    sig_rows = spark.read.parquet(store).groupBy("batch_id").count().collect()
    assert {r["batch_id"]: r["count"] for r in sig_rows} == {0: 3, 1: 2}

    # REPLAY batch 1 (foreachBatch rerun after crash): decisions must be
    # bit-identical — the replay must not see its own first attempt's
    # signatures (batch_id < current filter) and must not double-append
    near_dup_ingest_batch(b1, 1, store, dec)
    got2 = _decisions(spark, dec)
    assert got2 == got
    sig_rows = spark.read.parquet(store).groupBy("batch_id").count().collect()
    assert {r["batch_id"]: r["count"] for r in sig_rows} == {0: 3, 1: 2}


def test_streaming_wiring_file_source(spark, tmp_path):
    src = str(tmp_path / "in")
    os.makedirs(src)
    store = str(tmp_path / "sigs")
    dec = str(tmp_path / "dec")
    ckpt = str(tmp_path / "ckpt")

    def put(name, rows):
        p = os.path.join(src, name)
        with open(p, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        ts = time.time()
        os.utime(p, (ts, ts))
        time.sleep(0.05)

    put("a.jsonl", [("s1", BASE), ("s2", OTHER)])
    put("b.jsonl", [("s3", BASE + " near dup tail")])

    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    q = start_near_dup_ingest(stream, store, dec, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = _decisions(spark, dec)
    assert got["s1"][1] is False
    assert got["s2"][1] is False
    # s3 arrived in a later micro-batch and must match the STORED s1
    assert got["s3"][0] == "s1" and got["s3"][1] is True
    assert len({r[2] for r in got.values()}) == 2  # two distinct batch ids


def test_signature_store_compaction(spark, tmp_path):
    """Folding per-batch partitions into base (-1) must not change any
    later verdict; the crash window (base written, old partitions not
    yet deleted -> duplicate store rows) is harmless by construction."""
    from shardpack_spark.streaming.dedup_stream import compact_signature_store

    store = str(tmp_path / "sigs")
    dec = str(tmp_path / "dec")
    near_dup_ingest_batch(_docs(spark, [("d1", BASE), ("d2", OTHER)]), 0, store, dec)
    near_dup_ingest_batch(
        _docs(spark, [("d3", "standalone vocabulary about volcanic basalt columns")]),
        1, store, dec,
    )

    # crash-window simulation FIRST: write base for batches < 2 but keep
    # the per-batch partitions too (duplicates) -> verdicts unchanged
    import shutil

    backup = str(tmp_path / "sigs_bak")
    shutil.copytree(store, backup)
    compact_signature_store(spark, store, up_to_batch=2)
    for bdir in ["batch_id=0", "batch_id=1"]:
        shutil.copytree(
            os.path.join(backup, bdir), os.path.join(store, bdir)
        )  # resurrect folded partitions = duplicates everywhere
    b2 = _docs(spark, [("d4", BASE + " extra"), ("d5", OTHER)])
    near_dup_ingest_batch(b2, 2, store, dec)
    got_dup = _decisions(spark, dec)
    assert got_dup["d4"][0] == "d1" and got_dup["d5"][0] == "d2"

    # clean compaction (drops leftovers incl. resurrected dirs)
    res = compact_signature_store(spark, store, up_to_batch=3)
    assert res["dropped_partitions"] >= 2
    parts = {
        r["batch_id"] for r in spark.read.parquet(store).select("batch_id").distinct().collect()
    }
    assert parts == {-1}
    # post-compaction ingest still sees the whole corpus
    near_dup_ingest_batch(_docs(spark, [("d6", BASE + "!!")]), 3, store, dec)
    got = _decisions(spark, dec)
    assert got["d6"][0] == "d1" and got["d6"][1] is True


def test_ingest_never_shuffles_the_corpus(spark):
    """The steady-state ingest shape: candidates and sig-fetch joins
    broadcast the (small) batch side, so the corpus signature table is
    scanned but NEVER hash-exchanged — per-batch shuffle cost must be
    corpus-size-independent."""
    from shardpack_spark.operators import dedup

    docs = _docs(spark, [(f"d{i}", BASE + f" tail {i}") for i in range(5)])
    sh = dedup.char_shingles(docs, text_col="text", id_col="doc_id", k=5)
    sigs = dedup.minhash_signatures(sh, n_hashes=64, seed=42)
    corpus = sigs.select(F.col("sid"), F.col("sig"))  # stand-in corpus table

    cand = dedup.minhash_lsh_candidates_against(
        sigs, corpus, broadcast_new=True
    )
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    s = cand._jdf.queryExecution().explainString(jmode)
    assert "BroadcastHashJoin" in s, "batch side must broadcast"
    # the only allowed exchanges are the broadcast itself and the final
    # distinct's aggregation — never a hashpartitioning of both join inputs
    assert "SortMergeJoin" not in s and "ShuffledHashJoin" not in s
