"""Physical-plan assertions: the optimizations we rely on at 100 TB must
actually appear in the plan — pushed filters, pruned scans, broadcast
joins, partial aggregation, top-k without a global sort, codegen."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow  # heavy family: deselect with -m 'not slow'

from shardpack_spark.queries import load_all

REG = load_all()


def plan(spark, sf_dir, name, mode="formatted") -> str:
    df = REG[name].builder(spark, sf_dir)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_q03_pushdown_and_pruning(spark, sf_dir):
    s = plan(spark, sf_dir, "q03_project_filter")
    assert "PushedFilters" in s and "EqualTo(l_returnflag,R)" in s
    # the CAST(..AS DATE) predicate must still reach the scan as a
    # timestamp bound, not execute as a post-scan filter only
    assert "GreaterThanOrEqual(l_shipdate" in s
    # column pruning: untouched wide columns never read
    assert "l_comment" not in s and "l_tax" not in s.split("ReadSchema")[1].split("\n")[0]


def test_q12_date_filter_pushed_and_partial_agg(spark, sf_dir):
    s = plan(spark, sf_dir, "q12_agg_tpch_q1")
    assert "LessThan(l_shipdate" in s, "date predicate must reach the parquet scan"
    assert "partial_sum" in s and "partial_count" in s, "map-side combine required"
    assert s.count("HashAggregate") >= 2


def test_q05_broadcast_variant(spark, sf_dir):
    # the hinted variant inside the merged q05 must broadcast
    s = plan(spark, sf_dir, "q05_join_inner")
    assert "BroadcastHashJoin" in s
    assert "SortMergeJoin" not in s


def test_q05_no_unnecessary_shuffle_of_dim(spark, sf_dir):
    # Catalyst should pick broadcast for the small dim side on its own
    s = plan(spark, sf_dir, "q05_join_inner")
    assert "BroadcastHashJoin" in s


def test_q18_take_ordered(spark, sf_dir):
    s = plan(spark, sf_dir, "q18_topk")
    assert "TakeOrderedAndProject" in s
    assert "Exchange rangepartitioning" not in s, "top-k must not global-sort"


def test_q01_scan_reads_only_needed_columns(spark, sf_dir):
    s = plan(spark, sf_dir, "q01_scan_count")
    # The multi-distinct splits into three column-pruned scans (no Expand);
    # every scan must read at most one key column and never a wide column.
    reads = [part.split("\n")[0] for part in s.split("ReadSchema")[1:]]
    assert reads, "expected at least one scan"
    joined = " ".join(reads)
    assert "l_suppkey" in joined and "l_partkey" in joined
    assert "l_comment" not in joined and "l_extendedprice" not in joined
    for read in reads:
        assert read.count(":") <= 2, f"scan reads too many columns: {read}"
    assert "Expand" not in s, "multi-distinct must not plan an Expand"


def test_q08_semi_and_anti_join_types(spark, sf_dir):
    s = plan(spark, sf_dir, "q08_semi_anti")
    assert "LeftSemi" in s and "LeftAnti" in s


def test_q30_broadcast_no_shuffle(spark, sf_dir):
    """Brute-force cosine top-k: broadcast query vector + TakeOrdered —
    zero shuffle exchanges in the whole plan."""
    from shardpack_spark.operators import similarity
    from shardpack_spark.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    df = similarity.cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=5, exclude_ids=[0])
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    s = df._jdf.queryExecution().explainString(jmode)
    assert "BroadcastNestedLoopJoin" in s or "BroadcastExchange" in s
    assert "TakeOrderedAndProject" in s
    assert "Exchange hashpartitioning" not in s


def test_codegen_active(spark, sf_dir):
    s = plan(spark, sf_dir, "q03_project_filter", mode="simple")
    assert "*" in s, "whole-stage codegen should cover the scan-filter-project"


@pytest.mark.parametrize("name", ["q11_asof_join", "q27_session_window"])
def test_single_shuffle_operators(spark, sf_dir, name):
    """The as-of join and session windows are single-shuffle designs:
    exactly one hashpartitioning exchange on the by-key."""
    s = plan(spark, sf_dir, name)
    assert s.count("Exchange hashpartitioning") <= 2  # key + final agg


def test_q59_hygiene_zero_shuffle_pruned_scan(spark, sf_dir):
    """PII + URL hygiene is a pure scan: no exchange, unused columns
    pruned (n_chars never read)."""
    s = plan(spark, sf_dir, "q59_pii_redaction")
    assert "Exchange" not in s
    assert "n_chars" not in s.split("ReadSchema")[1].splitlines()[0]


def test_q60_quality_single_scan(spark, sf_dir):
    """Every repetition/quality signal comes from ONE corpus read."""
    s = plan(spark, sf_dir, "q60_repetition")
    # formatted mode names each scan once in the tree and once in the
    # detail section — ReadSchema appears exactly once per physical scan
    assert s.count("ReadSchema") == 1, s.count("ReadSchema")
    assert s.count("Exchange hashpartitioning") <= 2


def test_q61_semdedup_pair_join_on_cluster_key(spark, sf_dir):
    """SemDeDup's pair search must be an equi-join keyed on the cluster
    id — never a Cartesian/nested-loop over the vectors."""
    s = plan(spark, sf_dir, "q61_kmeans_semdedup")
    assert "CartesianProduct" not in s
    assert "cluster" in s


def test_shuffle_rows_plans_range_sort(spark, sf_dir):
    """The deterministic epoch shuffle must be ONE range-partitioned
    global sort — never a coalesce-to-one or nested exchange."""
    from shardpack_spark.operators.sampling import shuffle_rows
    from shardpack_spark.tables import load_table

    df = shuffle_rows(load_table(spark, sf_dir, "documents"), "doc_id", seed=7)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    s = df._jdf.queryExecution().explainString(jmode)
    assert "rangepartitioning" in s
    assert s.count("+- Exchange") == 1


def test_pack_sequences_single_shuffle(spark, sf_dir):
    """Packing is one hash shuffle on the salted group key feeding one
    Arrow-batched grouped-map — no second exchange, no collect."""
    from pyspark.sql import functions as F

    from shardpack_spark.operators.packing import pack_sequences
    from shardpack_spark.tables import load_table

    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")
    )
    df = pack_sequences(toks, budget=1024)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    s = df._jdf.queryExecution().explainString(jmode)
    assert "FlatMapGroupsInPandas" in s
    assert s.count("+- Exchange") == 1 and "hashpartitioning" in s
    assert "rangepartitioning" not in s


def test_incremental_candidates_equi_join_only(spark, sf_dir):
    """Cross-corpus LSH banding joins on (band, bh) — the plan must be a
    hash/merge equi-join, never a nested-loop or Cartesian pair scan."""
    from pyspark.sql import functions as F

    from shardpack_spark.operators import dedup
    from shardpack_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = dedup.minhash_signatures(dedup.char_shingles(docs))
    cand = dedup.minhash_lsh_candidates_against(
        sigs.filter(F.col("sid") % 2 == 1), sigs.filter(F.col("sid") % 2 == 0)
    )
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    s = cand._jdf.queryExecution().explainString(jmode)
    assert "CartesianProduct" not in s and "BroadcastNestedLoopJoin" not in s


def _explain(spark, df, mode="formatted") -> str:
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def test_funnel_single_shuffle(spark, sf_dir):
    """The funnel is one groupBy on the entity key: exactly one
    hash-partitioning exchange, no joins, no window cascade."""
    from shardpack_spark.operators.analytics import funnel
    from shardpack_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    s = _explain(spark, funnel(ev, ["view", "click", "purchase"]), mode="simple")
    assert s.count("Exchange hashpartitioning") == 1
    assert "Join" not in s and "Window" not in s


def test_gap_fill_no_driver_spine(spark, sf_dir):
    """The gap-fill spine is generated distributed (sequence + explode),
    never a driver-side loop; LOCF needs the bucket agg exchange plus the
    window sort, nothing more."""
    from shardpack_spark.operators.analytics import gap_fill
    from shardpack_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    s = _explain(spark, gap_fill(ev, 3600, by="user_id", method="locf"), mode="simple")
    assert "Generate explode" in s
    assert s.count("Exchange hashpartitioning") <= 3


def test_q52_subquery_decorrelation_shapes(spark, sf_dir):
    """The hand-decorrelated subquery variants must carry the keyed-join
    shapes — semi/anti for EXISTS/NOT EXISTS, ONE single-row broadcast
    for the uncorrelated scalar — and no cartesian anywhere."""
    s = plan(spark, sf_dir, "q52_tpch_shapes", mode="simple")
    assert "LeftSemi" in s, "Q21 EXISTS must run as a left-semi join"
    assert "LeftAnti" in s, "Q21/Q22 NOT EXISTS must run as left-anti joins"
    assert s.count("BroadcastNestedLoopJoin") == 1, (
        "exactly the Q22 1-row scalar broadcast may nest-loop"
    )
    assert "CartesianProduct" not in s
    # Q17's correlated scalar subqueries became ONE aggregate joined back
    # (not a per-row subquery): a partial-agg pair over the brand-pruned
    # lineitems must appear
    assert "partial_sum" in s and "partial_count" in s
