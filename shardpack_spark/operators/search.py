"""Distributed inverted-index build, incremental update, and term search
over shardpack datasets.

The reference format's bucket index is a key -> shard map
(/root/reference/src/bucket.rs:147-169 access path); this module turns
that primitive into full-text TERM lookup: build a term -> postings
dataset once (a batch job), append new corpus batches incrementally via
merge-on-read patches, and answer keyword queries by reading only the
shards whose key ranges / blooms can hold the probed terms.

Index layout (plain shardpack rows, so every maintenance job — compact,
snapshot, verify, patches — applies unchanged):

    key      = term (lowercased word token, same tokenizer as text ops)
    metadata = {"df": <doc frequency>, "segments": <n entries>}
    entries  = postings-00000.json ... one JSON segment per
               ``segment_docs`` docs: [{"doc_id":..,"tf":..,"dl":..}]
               sorted by doc_id (dl = that doc's token count,
               denormalized so BM25 needs no doc-side join)
    + ONE stats record under STATS_KEY ("\\x00corpus-stats", sorts below
      every [a-z0-9_]+ token): n_docs, total_tokens, and the build
      parameters — the BM25 corpus constants and the update contract.

Scale shape:
- Build is two shuffles (term+doc tf, then term postings), both keyed
  fine enough to spread; the index is written range-partitioned and
  sorted by term so shard [min_key, max_key] ranges are disjoint and a
  probe prunes to O(1) shards per term.
- ``max_df`` drops stopword-grade terms (the classic IR guard): a term
  in half the corpus would otherwise collect a posting list the size of
  the corpus into one task.  Callers doing 100 TB builds set it; the
  df cut happens BEFORE collect_list so the heavy lists are never built.
- Search is: pruned scan of O(#terms) shards -> JVM-side JSON decode ->
  explode postings -> one small groupBy(doc_id).  No Python anywhere.
- Incremental update tokenizes ONLY the new batch and rewrites ONLY the
  affected terms' records (as a patch; ``compact_patches`` folds them
  into the base whenever convenient) — the old corpus text is never
  re-read.  Reading merged postings prunes the same way: filters push
  through the patch overlay's union/anti-join to both datasource scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from shardpack_spark.operators.text import _word_tokens

POSTING_SCHEMA = "array<struct<doc_id:bigint,tf:bigint,dl:bigint>>"
STATS_KEY = "\x00corpus-stats"


def _term_tf(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(term, doc_id, tf, dl) rows.  ``dl`` (the BM25 document length =
    the doc's non-empty token count) is computed IN-ROW before the
    explode and carried alongside — the previous shape derived it with a
    doc-keyed window over the exploded rows, a second full shuffle of
    every (term, doc) pair just to attach a per-document scalar."""
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.filter(_word_tokens(F.col(text_col)), lambda t: t != F.lit("")).alias("__t"),
    )
    toks = base.select(
        "doc_id",
        F.size("__t").cast("long").alias("dl"),
        F.explode("__t").alias("term"),
    )
    return toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl")
    )


def _plist_agg(
    tfd: DataFrame, min_df: int = 1, max_df: int | None = None
) -> DataFrame:
    """(term, df, plist) from (term, doc_id, tf, dl) rows.

    The ``max_df`` stopword cut is applied BEFORE collect_list for real:
    a HAVING-style filter on the aggregated df cannot push below its own
    aggregate, so filtering after the agg would still materialize a
    corpus-sized posting array in one task for every stopword-grade
    term.  Instead df is counted first (partial-agg, no lists), the
    over-cap terms — FEW by Zipf's law — broadcast into an anti-join
    that drops their rows pre-aggregation, and only then are lists
    built.  ``min_df`` cuts the long tail AFTER the agg, where each
    dropped list has fewer than min_df elements (harmless), because the
    tail vocabulary is millions of terms and could not broadcast."""
    if max_df is not None:
        heavy = (
            tfd.groupBy("term")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("term")
        )
        tfd = tfd.join(F.broadcast(heavy), "term", "left_anti")
    out = tfd.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.array_sort(F.collect_list(F.struct("doc_id", "tf", "dl"))).alias("plist"),
    )
    if min_df > 1:
        out = out.filter(F.col("df") >= min_df)
    return out


def _postings_to_rows(postings: DataFrame, segment_docs: int) -> DataFrame:
    """Shardpack rows from a (term, df, plist) frame — segmented JSON."""
    nseg = F.ceil(F.col("df") / F.lit(segment_docs)).cast("int")
    seg_json = F.transform(
        F.sequence(F.lit(0), nseg - 1),
        lambda i: F.to_json(F.slice(F.col("plist"), i * segment_docs + 1, segment_docs)),
    )
    entries = F.transform(
        seg_json,
        lambda j, i: F.struct(
            F.concat(F.lit("postings-"), F.lpad(i.cast("string"), 5, "0"), F.lit(".json")).alias(
                "file_name"
            ),
            F.lit("application/json").alias("content_type"),
            F.lit("none").alias("encoding"),
            F.octet_length(j).cast("long").alias("size"),
            F.encode(j, "utf-8").alias("data"),
        ),
    )
    return postings.select(
        F.col("term").alias("key"),
        F.create_map(
            F.lit("df"), F.col("df").cast("string"),
            F.lit("segments"), nseg.cast("string"),
        ).alias("metadata"),
        entries.alias("entries"),
    )


def _stats_row(
    spark: SparkSession,
    n_docs: int,
    total_tokens: int,
    segment_docs: int,
    min_df: int,
    max_df: int | None,
    last_batch_id: int | None = None,
) -> DataFrame:
    from shardpack_spark.format.datasource import SCHEMA

    meta = {
        "n_docs": str(int(n_docs)),
        "total_tokens": str(int(total_tokens)),
        "segment_docs": str(int(segment_docs)),
        "min_df": str(int(min_df)),
        "max_df": "" if max_df is None else str(int(max_df)),
        "last_batch_id": "" if last_batch_id is None else str(int(last_batch_id)),
    }
    return spark.createDataFrame([(STATS_KEY, meta, [])], SCHEMA)


def build_inverted_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
    max_df: int | None = None,
    segment_docs: int = 65536,
    compression: str = "none",
    index_partitions: int | None = None,
) -> None:
    """Build and commit the inverted index dataset at ``path``.

    tf is persisted so the corpus tokenize/explode runs once across the
    corpus-stats action and the index write."""
    if segment_docs < 1:
        raise ValueError(f"segment_docs must be >= 1, got {segment_docs}")
    spark = docs.sparkSession
    from shardpack_spark.format.datasource import register

    register(spark)

    tf = _term_tf(docs, id_col, text_col).persist()
    n_docs, total_tokens = (
        tf.agg(F.count_distinct("doc_id"), F.coalesce(F.sum("tf"), F.lit(0))).collect()[0]
    )
    postings = _plist_agg(tf, min_df, max_df)
    rows = _postings_to_rows(postings, segment_docs).unionByName(
        _stats_row(spark, n_docs, total_tokens, segment_docs, min_df, max_df)
    )
    n_parts = index_partitions or max(1, spark.sparkContext.defaultParallelism // 2)
    (
        rows.repartitionByRange(n_parts, "key")
        .sortWithinPartitions("key")
        .write.format("shardpack")
        .option("compression", compression)
        .mode("overwrite")
        .save(path)
    )
    tf.unpersist()


def _read_index(spark: SparkSession, path: str, **options) -> DataFrame:
    """Index rows with any pending patches overlaid (merge-on-read)."""
    from shardpack_spark.format.patches import list_patches, read_with_patches

    if list_patches(path):
        return read_with_patches(spark, path, **options)
    from shardpack_spark.format.datasource import read_shardpack

    return read_shardpack(spark, path, **options)


def corpus_stats(spark: SparkSession, path: str) -> dict:
    """The stats record as a dict (pruned, metadata-only single-key
    lookup — posting payloads are never decoded for this)."""
    row = (
        _read_index(spark, path, metadata_only="true")
        .filter(F.col("key") == STATS_KEY)
        .select("metadata")
        .head()
    )
    if row is None:
        raise ValueError(f"no corpus-stats record in index at {path}")
    m = dict(row["metadata"])
    return {
        "n_docs": int(m["n_docs"]),
        "total_tokens": int(m["total_tokens"]),
        "segment_docs": int(m["segment_docs"]),
        "min_df": int(m.get("min_df") or 1),
        "max_df": int(m["max_df"]) if m.get("max_df") else None,
        "last_batch_id": int(m["last_batch_id"]) if m.get("last_batch_id") else None,
    }


def update_inverted_index(
    docs_new: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_probe_terms: int = 100_000,
    batch_id: int | None = None,
) -> str:
    """Merge a NEW batch of documents into an existing index as a patch.

    Tokenizes only the new batch, reads only the affected terms' existing
    postings (key-IN pruned when the affected vocabulary fits
    ``max_probe_terms``; a full-index join otherwise), merges the posting
    arrays, and commits ONE patch containing the rewritten term records
    plus the updated stats record.  The old corpus text is never re-read
    — the 100 TB invariant for rolling ingestion.  Fold patches into the
    base with ``format.patches.compact_patches`` at leisure.

    The merge is read-merge-write, so there must be ONE writer at a time
    (a streaming query's foreachBatch satisfies this).  For at-least-once
    batch delivery, pass the engine's monotonic ``batch_id``: a replayed
    batch (id <= the stats record's last applied id) is a NO-OP instead
    of double-counting postings — state-level exactly-once, same model as
    the CDC patch sink.

    New doc_ids must be disjoint from already-indexed ones (the segment
    model's contract); duplicate ids would duplicate postings.  Indexes
    built with a df cut (min_df > 1 or max_df) refuse incremental
    updates: a cut term's dropped postings could never merge back
    correctly once frequencies cross the threshold — rebuild instead.
    Returns the patch directory name ("" for a no-op).
    """
    spark = docs_new.sparkSession
    from shardpack_spark.format.patches import write_patch

    stats = corpus_stats(spark, path)
    segment_docs = stats["segment_docs"]
    if stats["min_df"] > 1 or stats["max_df"] is not None:
        raise ValueError(
            "incremental update of a df-cut index (min_df"
            f"={stats['min_df']}, max_df={stats['max_df']}) would lose "
            "postings for terms crossing the threshold; rebuild instead"
        )
    if (
        batch_id is not None
        and stats["last_batch_id"] is not None
        and batch_id <= stats["last_batch_id"]
    ):
        return ""  # replayed micro-batch: already applied

    tf = _term_tf(docs_new, id_col, text_col).persist()
    n_new, tok_new = (
        tf.agg(F.count_distinct("doc_id"), F.coalesce(F.sum("tf"), F.lit(0))).collect()[0]
    )
    if n_new == 0:
        tf.unpersist()
        return ""
    new_postings = _plist_agg(tf)

    # existing postings for ONLY the affected terms
    terms = [r["term"] for r in new_postings.select("term").limit(max_probe_terms + 1).collect()]
    idx = _read_index(spark, path).filter(F.col("key") != STATS_KEY)
    if len(terms) <= max_probe_terms:
        existing = idx.filter(F.col("key").isin(terms))  # pruned shard read
    else:
        existing = idx.join(
            new_postings.select(F.col("term").alias("key")).distinct(), "key", "semi"
        )
    old = (
        existing.select(F.col("key").alias("term"), F.explode("entries").alias("e"))
        .select("term", F.from_json(F.col("e.data").cast("string"), POSTING_SCHEMA).alias("seg"))
        .groupBy("term")
        .agg(F.flatten(F.collect_list("seg")).alias("plist_old"))
    )
    merged = (
        new_postings.join(old, "term", "left")
        .select(
            "term",
            F.array_sort(
                F.concat(F.coalesce(F.col("plist_old"), F.array().cast(POSTING_SCHEMA)), F.col("plist"))
            ).alias("plist"),
        )
        .withColumn("df", F.size("plist").cast("long"))
    )
    rows = _postings_to_rows(merged, segment_docs).unionByName(
        _stats_row(
            spark,
            stats["n_docs"] + n_new,
            stats["total_tokens"] + tok_new,
            segment_docs,
            stats["min_df"],
            stats["max_df"],
            batch_id if batch_id is not None else stats["last_batch_id"],
        )
    )
    name = write_patch(rows, path)
    tf.unpersist()
    return name


def term_stats(spark: SparkSession, path: str) -> DataFrame:
    """(term, df) for every indexed term — metadata-only scan, payloads
    (the posting lists) never leave the disk."""
    ds = _read_index(spark, path, metadata_only="true")
    return ds.filter(F.col("key") != STATS_KEY).select(
        F.col("key").alias("term"),
        F.element_at("metadata", "df").cast("long").alias("df"),
    )


def search_terms(
    spark: SparkSession, path: str, terms: list[str], mode: str = "all"
) -> DataFrame:
    """Docs matching the query terms: (doc_id, n_terms, score).

    ``mode='all'`` requires every term (conjunctive, score = summed tf);
    ``'any'`` is disjunctive.  The ``key IN (...)`` filter pushes down to
    the manifest (range + bloom), so only the shards owning the probed
    terms are opened regardless of index size.
    """
    if mode not in ("all", "any"):
        raise ValueError(f"mode must be 'all' or 'any', got {mode!r}")
    probe = sorted({t.lower() for t in terms if t})
    if not probe:
        raise ValueError("need at least one non-empty term")
    posts = _probe_postings(spark, path, probe)
    hits = posts.groupBy("doc_id").agg(
        F.count_distinct("term").alias("n_terms"),
        F.sum("tf").alias("score"),
    )
    if mode == "all":
        hits = hits.filter(F.col("n_terms") == len(probe))
    return hits.orderBy(F.col("score").desc(), F.col("doc_id"))


def _probe_postings(spark: SparkSession, path: str, probe: list[str]) -> DataFrame:
    """Pruned read of the probed terms' postings:
    (term, df, doc_id, tf, dl) — dl rides in the posting, so no doc-side
    join at any scale."""
    ds = _read_index(spark, path)
    return (
        ds.filter(F.col("key").isin(probe))
        .select(
            F.col("key").alias("term"),
            F.element_at("metadata", "df").cast("long").alias("df"),
            F.explode("entries").alias("e"),
        )
        .select(
            "term", "df",
            F.from_json(F.col("e.data").cast("string"), POSTING_SCHEMA).alias("p"),
        )
        .select("term", "df", F.explode("p").alias("x"))
        .select(
            "term", "df",
            F.col("x.doc_id").alias("doc_id"),
            F.col("x.tf").alias("tf"),
            F.col("x.dl").alias("dl"),
        )
    )


def search_bm25(
    spark: SparkSession,
    path: str,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int | None = None,
) -> DataFrame:
    """BM25-ranked retrieval: (doc_id, n_terms, score), best first.

    Robertson/Sparck-Jones BM25 with the standard smoothed IDF
    ln(1 + (N - df + 0.5)/(df + 0.5)).  Disjunctive (any matching term
    scores; absent terms contribute 0, as in the standard formulation).
    N and avgdl come from the index's stats record (one pruned lookup).
    The plan is the pruned posting read -> codegen per-posting score ->
    one groupBy(doc_id); with ``top_n`` the sort collapses to
    TakeOrderedAndProject (per-partition heaps, no global sort).
    """
    probe = sorted({t.lower() for t in terms if t})
    if not probe:
        raise ValueError("need at least one non-empty term")
    stats = corpus_stats(spark, path)
    n_docs = stats["n_docs"]
    avgdl = stats["total_tokens"] / n_docs if n_docs else 1.0
    posts = _probe_postings(spark, path, probe)
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.lit(float(avgdl)))
    )
    scored = posts.withColumn("__s", idf * tf_part)
    hits = (
        scored.groupBy("doc_id")
        .agg(F.count_distinct("term").alias("n_terms"), F.sum("__s").alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id"))
    )
    if top_n is not None and top_n < 0:
        raise ValueError(f"top_n must be >= 0, got {top_n}")
    return hits.limit(top_n) if top_n is not None else hits
