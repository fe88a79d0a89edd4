"""Property/behavior tests for LLM-pipeline operators that are not (fully)
oracle-checkable: approx distinct bound, IVF recall, SimHash invariants,
MinHash-LSH recall vs exact Jaccard."""

from __future__ import annotations

from pyspark.sql import functions as F

from shardpack_spark.operators import dedup, similarity
from shardpack_spark.queries import load_all
from shardpack_spark.tables import load_table

REG = load_all()


def test_approx_count_distinct_within_bound(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    exact = li.select(F.countDistinct("l_partkey")).head()[0]
    approx = REG["q14_approx_distinct"].builder(spark, sf_dir).head()[0]
    assert abs(approx - exact) / exact < 0.05


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    """IVF with nprobe=3 of 10 buckets must keep >=3/5 of the exact top-5."""
    exact = {r["vec_id"] for r in REG["q30_cosine_topk"].builder(spark, sf_dir).collect()}
    approx = {r["vec_id"] for r in REG["q30b_ann_ivf"].builder(spark, sf_dir).collect()}
    assert len(exact & approx) >= 3, f"recall too low: {exact} vs {approx}"


def test_rp_lsh_recall_vs_brute_force(spark, sf_dir):
    """Hyperplane LSH keeps part of the exact top-5 even on this
    near-orthogonal synthetic data (max cosine ~0.47, so the method's
    selectivity is inherently weak here — see the operator docstring)."""
    exact = {r["vec_id"] for r in REG["q30_cosine_topk"].builder(spark, sf_dir).collect()}
    approx = {r["vec_id"] for r in REG["q30c_ann_rp_lsh"].builder(spark, sf_dir).collect()}
    assert len(exact & approx) >= 2, f"recall too low: {exact} vs {approx}"


def test_simhash_identical_docs_collide(spark, sf_dir):
    """Exact duplicate texts must produce identical simhashes."""
    docs = load_table(spark, sf_dir, "documents")
    sim = dedup.simhash(docs)
    joined = (
        docs.select(F.col("doc_id").alias("sid"), "text")
        .join(sim, "sid")
        .groupBy("text")
        .agg(F.countDistinct("simhash").alias("nh"), F.count(F.lit(1)).alias("n"))
        .filter((F.col("n") > 1) & (F.col("nh") > 1))
    )
    assert joined.count() == 0


def test_minhash_lsh_recall_matches_exact(spark, sf_dir):
    """LSH candidates + exact verification == exhaustive exact pairs."""
    exact = {(r["sid_a"], r["sid_b"]) for r in REG["q29_jaccard_exact"].builder(spark, sf_dir).collect()}
    lsh = {(r["sid_a"], r["sid_b"]) for r in REG["q29b_minhash_lsh"].builder(spark, sf_dir).collect()}
    assert lsh == exact, f"missed: {exact - lsh}; extra: {lsh - exact}"


def test_embedding_near_dup_symmetric_block(spark, sf_dir):
    """Blocked pair generation yields each unordered pair once."""
    pairs = REG["q38_embedding_near_dup"].builder(spark, sf_dir)
    dup = pairs.groupBy("id_a", "id_b").count().filter(F.col("count") > 1)
    assert dup.count() == 0
    assert pairs.filter(F.col("id_a") >= F.col("id_b")).count() == 0
