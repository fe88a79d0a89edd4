"""Streaming near-duplicate ingest: continuous MinHash-LSH dedup of a
document stream against a persisted signature store.

The 100 TB ingest shape: a crawler/exporter keeps producing document
batches, and each batch must be deduplicated (a) within itself and
(b) against EVERYTHING already accepted — without ever re-reading the
accepted corpus's text.  The standing state is only the corpus's minhash
signature table (O(docs x n_hashes) longs, ~0.05% of corpus bytes at
64 hashes); each micro-batch is signed with the SAME hash family and
banded-joined against it (``minhash_lsh_candidates_against``), so batch
cost is O(|batch| x bands) plus one bucketed shuffle — never a self-join
over the re-unioned corpus.

Exactly-once WITHOUT a transactional store: every per-batch write is a
dynamic partition overwrite keyed by ``batch_id``.  A replayed
micro-batch (``foreachBatch`` re-runs after a failure between the write
and the checkpoint commit) therefore REPLACES its own partitions instead
of appending a second copy, and the dedup decision reads only partitions
with ``batch_id < current`` — a replay never sees its own first
attempt's signatures, so decisions are bit-identical across retries.
This is the standard idempotent-foreachBatch idiom and needs nothing
beyond parquet.

Signature store schema: (sid, sig array, batch_id).  Decisions schema:
(doc_id, dup_of nullable, est nullable, is_dup, batch_id) — one row per
ingested document, ``dup_of`` the smallest matching doc id (corpus or
earlier-in-batch), ``est`` the best signature-estimated Jaccard.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from shardpack_spark.operators import dedup


def _estimate_between(
    cand: DataFrame, new_sigs: DataFrame, corpus_sigs: DataFrame
) -> DataFrame:
    """(sid_new, sid_corpus, est): signature-agreement Jaccard estimate."""
    a = new_sigs.select(F.col("sid").alias("sid_new"), F.col("sig").alias("__sa"))
    b = corpus_sigs.select(F.col("sid").alias("sid_corpus"), F.col("sig").alias("__sb"))
    agree = F.aggregate(
        F.zip_with("__sa", "__sb", lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        cand.join(a, "sid_new")
        .join(b, "sid_corpus")
        .withColumn("est", agree / F.size("__sa"))
        .select("sid_new", "sid_corpus", "est")
    )


def near_dup_ingest_batch(
    batch_df: DataFrame,
    batch_id: int,
    store_path: str,
    decisions_path: str,
    threshold: float = 0.7,
    n_hashes: int = 64,
    seed: int = 42,
    k: int = 5,
    bands: int = 16,
    rows_per_band: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Process ONE micro-batch: sign, dedup (in-batch + vs-store), write
    decisions and append the batch's signatures — all idempotently.

    Public (not closed over the stream) so tests and backfills can drive
    batches synchronously; ``start_near_dup_ingest`` is the thin
    ``foreachBatch`` wrapper.  The decision is the signature-estimated
    Jaccard (see ``incremental_near_dup``): pick ``threshold`` below the
    true dup bar and re-verify survivors downstream if exactness matters.
    """
    spark = batch_df.sparkSession
    sh = dedup.char_shingles(batch_df, text_col=text_col, id_col=id_col, k=k)
    sigs = dedup.minhash_signatures(sh, n_hashes=n_hashes, seed=seed).persist()
    try:
        # standing corpus = every PRIOR batch's signatures (partition
        # pruning makes the < batch_id filter metadata-only; a replayed
        # batch is thereby blind to its own first attempt).  Existence is
        # probed through the Hadoop FS API so any supported scheme works
        # and the first batch does not take (and log) an analyzer error.
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(store_path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(hpath):
            corpus = spark.read.parquet(store_path).filter(
                F.col("batch_id") < F.lit(batch_id)
            )
        else:
            corpus = None  # first batch: no store yet

        matches = []
        # (a) within-batch: banded self-candidates, keep matches against a
        # SMALLER id only (keep-first semantics)
        in_batch = dedup.filter_candidates_by_signature(
            dedup.minhash_lsh_candidates(sigs, bands=bands, rows_per_band=rows_per_band),
            sigs,
            min_estimate=threshold,
        )
        matches.append(
            _estimate_between(
                in_batch.select(
                    F.col("sid_b").alias("sid_new"), F.col("sid_a").alias("sid_corpus")
                ),
                sigs,
                sigs.select("sid", "sig"),
            )
        )
        # (b) vs the standing corpus: new-vs-corpus banded join with the
        # BATCH side broadcast — the corpus signature table is scanned
        # (partition-pruned to batch_id < current) but never shuffled, so
        # per-batch shuffle cost is independent of corpus size
        if corpus is not None:
            cand = dedup.minhash_lsh_candidates_against(
                sigs, corpus, bands=bands, rows_per_band=rows_per_band,
                broadcast_new=True,
            )
            # fetch sig arrays for ONLY the matched corpus docs: broadcast
            # semi-filter, then a broadcast join of the (small) survivors —
            # the second corpus scan also shuffles nothing
            hits = corpus.join(
                F.broadcast(cand.select(F.col("sid_corpus").alias("sid")).distinct()),
                "sid",
                "left_semi",
            )
            matches.append(
                _estimate_between(F.broadcast(cand), sigs, hits).filter(
                    F.col("est") >= threshold
                )
            )
        all_matches = matches[0]
        for m in matches[1:]:
            all_matches = all_matches.unionAll(m)
        verdicts = all_matches.groupBy(F.col("sid_new").alias(id_col)).agg(
            F.min("sid_corpus").alias("dup_of"), F.max("est").alias("est")
        )
        decisions = (
            batch_df.select(id_col)
            .join(verdicts, id_col, "left")
            .select(
                id_col,
                "dup_of",
                "est",
                F.col("dup_of").isNotNull().alias("is_dup"),
                F.lit(batch_id).alias("batch_id"),
            )
        )
        decisions.write.partitionBy("batch_id").option(
            "partitionOverwriteMode", "dynamic"
        ).mode("overwrite").parquet(decisions_path)
        # ALL of the batch's signatures enter the store — including its
        # dups': a later replay of batch N+1 must reproduce its original
        # decisions, which were made against the full store
        sigs.withColumn("batch_id", F.lit(batch_id)).write.partitionBy(
            "batch_id"
        ).option("partitionOverwriteMode", "dynamic").mode("overwrite").parquet(
            store_path
        )
    finally:
        sigs.unpersist()


BASE_BATCH_ID = -1  # consolidated partition; -1 < every real batch id


def compact_signature_store(
    spark, store_path: str, up_to_batch: int
) -> dict:
    """Fold per-batch signature partitions below ``up_to_batch`` into the
    consolidated BASE partition (batch_id = -1).

    A long-running stream leaves one parquet partition per micro-batch;
    thousands of small partitions slow every banded join.  Compaction
    rewrites them into one partition that still satisfies the replay
    contract (base id -1 < every current batch id, so decisions keep
    seeing exactly the prior corpus).

    CALLER CONTRACT: ``up_to_batch`` must not exceed the stream's last
    CHECKPOINT-COMMITTED batch id — only the latest uncommitted batch can
    ever replay, and a batch folded into base must never be one that
    could re-run (it would see its own signatures).

    Crash-safe by duplicate tolerance: the consolidated partition is
    written (dynamic overwrite) BEFORE the folded partitions are
    deleted.  A crash between the two leaves some signatures present
    twice — harmless, because ingest verdicts aggregate with min/max
    over matches, so duplicate store rows cannot change any decision —
    and the next compaction removes the leftovers.
    """
    store = spark.read.parquet(store_path)
    # localCheckpoint breaks lineage: the consolidated write overwrites
    # the path the fold was READ from, which Spark otherwise rejects
    # (and lazily re-reading mid-overwrite would be wrong anyway)
    fold = (
        store.filter(F.col("batch_id") < F.lit(up_to_batch))
        .select("sid", "sig")
        .distinct()  # idempotent across repeated compactions
        .localCheckpoint(eager=True)
    )
    try:
        n = fold.count()
        if n == 0:
            return {"folded_rows": 0, "dropped_partitions": 0}
        (
            fold.withColumn("batch_id", F.lit(BASE_BATCH_ID))
            .write.partitionBy("batch_id")
            .option("partitionOverwriteMode", "dynamic")
            .mode("overwrite")
            .parquet(store_path)
        )
    finally:
        fold.unpersist()
    # base is durable; now drop the folded per-batch partitions
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    dropped = 0
    root = jvm.org.apache.hadoop.fs.Path(store_path)
    fs = root.getFileSystem(conf)
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if name.startswith("batch_id="):
            bid = int(name.split("=", 1)[1])
            if bid != BASE_BATCH_ID and bid < up_to_batch:
                fs.delete(status.getPath(), True)
                dropped += 1
    return {"folded_rows": n, "dropped_partitions": dropped}


def start_near_dup_ingest(
    docs_stream: DataFrame,
    store_path: str,
    decisions_path: str,
    checkpoint: str,
    **cfg: Any,
):
    """Wire ``near_dup_ingest_batch`` onto a streaming DataFrame.

    Returns the started StreamingQuery.  ``docs_stream`` needs
    (doc_id, text) columns (names overridable via cfg).
    """

    def _process(bdf: DataFrame, bid: int) -> None:
        near_dup_ingest_batch(bdf, bid, store_path, decisions_path, **cfg)

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .start()
    )
