"""Distributed inverted-index build + term search over shardpack datasets.

The reference format's bucket index is a key -> shard map
(/root/reference/src/bucket.rs:147-169 access path); this module turns
that primitive into full-text TERM lookup: build a term -> postings
dataset once (a batch job), then answer keyword queries by reading only
the shards whose key ranges / blooms can hold the probed terms.

Index layout (plain shardpack rows, so every maintenance job — compact,
snapshot, verify, patches — applies unchanged):

    key      = term (lowercased word token, same tokenizer as text ops)
    metadata = {"df": <doc frequency>, "segments": <n entries>}
    entries  = postings-00000.json ... one JSON segment per
               ``segment_docs`` docs: [{"doc_id": .., "tf": ..}, ...]
               sorted by doc_id

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
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from shardpack_spark.operators.text import _word_tokens

POSTING_SCHEMA = "array<struct<doc_id:bigint,tf:bigint,dl:bigint>>"


def _term_tf(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.explode(_word_tokens(F.col(text_col))).alias("term"),
    ).filter(F.col("term") != "")
    return toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))


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
    """Build and commit the inverted index dataset at ``path``."""
    if segment_docs < 1:
        raise ValueError(f"segment_docs must be >= 1, got {segment_docs}")
    spark = docs.sparkSession
    from shardpack_spark.format.datasource import register

    register(spark)

    # per-doc token length rides along in every posting (denormalized at
    # build time) so BM25 scoring needs NO doc-side join at query time;
    # the corpus constants (N, avgdl) are stamped into every record's
    # metadata.  tf is persisted so the corpus tokenize/explode runs once
    # across the stats action and the index write.
    from pyspark.sql.window import Window

    tf = _term_tf(docs, id_col, text_col).persist()
    n_docs, avgdl = (
        tf.groupBy("doc_id")
        .agg(F.sum("tf").alias("dl"))
        .agg(F.count(F.lit(1)), F.avg("dl"))
        .collect()[0]
    )
    tfd = tf.withColumn("dl", F.sum("tf").over(Window.partitionBy("doc_id")))
    postings = tfd.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.array_sort(F.collect_list(F.struct("doc_id", "tf", "dl"))).alias("plist"),
    )
    if min_df > 1:
        postings = postings.filter(F.col("df") >= min_df)
    if max_df is not None:
        postings = postings.filter(F.col("df") <= max_df)

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
    rows = postings.select(
        F.col("term").alias("key"),
        F.create_map(
            F.lit("df"), F.col("df").cast("string"),
            F.lit("segments"), nseg.cast("string"),
            F.lit("n_docs"), F.lit(str(int(n_docs))),
            F.lit("avgdl"), F.lit(repr(float(avgdl or 0.0))),
        ).alias("metadata"),
        entries.alias("entries"),
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


def term_stats(spark: SparkSession, path: str) -> DataFrame:
    """(term, df) for every indexed term — metadata-only scan, payloads
    (the posting lists) never leave the disk."""
    from shardpack_spark.format.datasource import read_shardpack

    ds = read_shardpack(spark, path, metadata_only="true")
    return ds.select(
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
    from shardpack_spark.format.datasource import read_shardpack

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
    (term, df, n_docs, avgdl, doc_id, tf, dl) — everything BM25 needs,
    no doc-side join (dl rides in the posting, corpus constants in the
    record metadata)."""
    from shardpack_spark.format.datasource import read_shardpack

    ds = read_shardpack(spark, path)
    return (
        ds.filter(F.col("key").isin(probe))
        .select(
            F.col("key").alias("term"),
            F.element_at("metadata", "df").cast("long").alias("df"),
            F.element_at("metadata", "n_docs").cast("long").alias("n_docs"),
            F.element_at("metadata", "avgdl").cast("double").alias("avgdl"),
            F.explode("entries").alias("e"),
        )
        .select(
            "term", "df", "n_docs", "avgdl",
            F.from_json(F.col("e.data").cast("string"), POSTING_SCHEMA).alias("p"),
        )
        .select("term", "df", "n_docs", "avgdl", F.explode("p").alias("x"))
        .select(
            "term", "df", "n_docs", "avgdl",
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
    The plan is the pruned posting read -> codegen per-posting score ->
    one groupBy(doc_id); with ``top_n`` the sort collapses to
    TakeOrderedAndProject (per-partition heaps, no global sort).
    """
    probe = sorted({t.lower() for t in terms if t})
    if not probe:
        raise ValueError("need at least one non-empty term")
    posts = _probe_postings(spark, path, probe)
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf")
        + F.lit(k1)
        * (F.lit(1.0) - F.lit(b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    scored = posts.withColumn("__s", idf * tf_part)
    hits = (
        scored.groupBy("doc_id")
        .agg(F.count_distinct("term").alias("n_terms"), F.sum("__s").alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id"))
    )
    return hits.limit(top_n) if top_n else hits
