#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"q12_agg_tpch_q1": median_sec, ...},
   "query_spread": {"q12_agg_tpch_q1": {"min": s, "max": s}, ...},
   "sf": ..., "yardsticks": {...}}

Per-query numbers are the MEDIAN of three timed passes (after one
untimed JIT warm-up); query_spread carries each query's min/max so a
loaded-host run is distinguishable from a regression inside the
artifact itself (wide max + tight median = neighbor spike).

Yardsticks (BASELINE.md):
  A parquet_scan_agg_s   - Q12 wall-clock (warm)
  B shardpack_scan_s     - full scan+agg of the same documents data via
                           format("shardpack"); target <= 2x parquet scan
  C shardpack_write_mb_s - container write throughput at 256 KiB shards
  D bulk_write/scan_mb_s - binary-payload throughput (32 KiB records)
  E point_lookup_s       - bloom-pruned single-key lookup (warm)
  F index_build_s /      - inverted-index build over sf documents and a
    search_probe_s         warm 2-term BM25 top-10 probe (stays flat as
                           the index grows: key-IN shard pruning)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from shardpack_spark.queries import load_all  # noqa: E402
from shardpack_spark.session import get_spark  # noqa: E402
from shardpack_spark.tables import load_table  # noqa: E402

HEADLINE = [
    "q01_scan_count",
    "q03_project_filter",
    "q05_join_inner",
    "q07_join_left",
    "q11_asof_join",
    "q12_agg_tpch_q1",
    "q16_window_rank",
    "q18_topk",
    "q25_time_windows",
    "q27_session_window",
    "q28_exact_dedup",
    "q29_fuzzy_dedup_lsh",
    "q30b_ann_suite",
    "q31_text_stats",
    "q34_lang_id",
    "q42_window_analytics",
    "q50_tpch_q3_shape",
    "q51_tpch_q5_shape",
    "q52_tpch_q10_shape",
    "q54_hypertable_rollup",
    "q57_pivot",
]


def time_query(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def _canary_mb_s(n_mib: int = 96) -> float:
    """Deterministic single-thread CPU yardstick: sha256 over n_mib MiB.

    Pure compute, no I/O, no JVM — its throughput depends only on how
    fast one core actually runs RIGHT NOW (CPU model, frequency,
    hypervisor steal, neighbor contention).  Recording it inside the
    artifact makes cross-run comparisons self-normalizing: a round where
    every query is +30% but the canary is also -30% is a slower host,
    not a regression (exactly the r4/r5 ambiguity the verdicts had to
    argue around)."""
    import hashlib

    buf = b"\xa5" * (1 << 20)
    h = hashlib.sha256()
    t0 = time.perf_counter()
    for _ in range(n_mib):
        h.update(buf)
    return round(n_mib / (time.perf_counter() - t0), 1)


def _read_proc_stat() -> tuple[int, int] | None:
    """(steal_ticks, total_ticks) from /proc/stat, or None off-Linux."""
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        return (vals[7] if len(vals) > 7 else 0, sum(vals))
    except (OSError, ValueError, IndexError):
        return None


def _host_snapshot() -> dict:
    snap: dict = {"canary_start_mb_s": _canary_mb_s()}
    try:
        snap["load1"] = round(os.getloadavg()[0], 2)
    except OSError:
        pass
    try:
        with open("/proc/uptime") as f:
            # a just-booted host has a COLD page cache: the first pass over
            # the parquet/testdata reads the disk, later passes read RAM
            snap["uptime_s"] = int(float(f.read().split()[0]))
    except (OSError, ValueError):
        pass
    return snap


def _host_finalize(snap: dict, stat0) -> dict:
    snap["canary_end_mb_s"] = _canary_mb_s()
    stat1 = _read_proc_stat()
    if stat0 and stat1 and stat1[1] > stat0[1]:
        snap["steal_pct"] = round(
            100.0 * (stat1[0] - stat0[0]) / (stat1[1] - stat0[1]), 2
        )
    return snap


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    host = _host_snapshot()
    stat0 = _read_proc_stat()
    spark = get_spark("shardpack_bench")
    registry = load_all()

    # q29's registry entry runs BOTH the exact (all shared-shingle pairs,
    # correctness anchor) and LSH variants; at bench scale only the LSH
    # scale path is the meaningful number.
    from shardpack_spark.queries.llm import fuzzy_dedup_lsh

    class _Q:
        builder = staticmethod(fuzzy_dedup_lsh)

    registry["q29_fuzzy_dedup_lsh"] = _Q()

    # q52's registry entry tags four TPC-H shapes; the historical headline
    # number is the Q10 multi-join top-k, so the bench times that variant
    # under its original label (same joins, same agg, harmonized columns).
    from shardpack_spark.queries.tpch_shapes import tpch_q10_variant

    class _Q52:
        builder = staticmethod(tpch_q10_variant)

    registry["q52_tpch_q10_shape"] = _Q52()

    # Steady-state measurement: run each query once untimed first so
    # whole-stage-codegen JIT compilation (5+ s for the widest
    # expressions) doesn't land in one arbitrary query's number; then
    # THREE timed passes per query, reporting the MEDIAN with the
    # min/max spread alongside — single-pass numbers on this shared
    # host swing 30-70% run to run from neighbor load, and carrying the
    # spread in the artifact makes a loaded run distinguishable from a
    # regression on its face (a wide max with a tight median = neighbor
    # spike; a shifted median = real change).
    #
    # Each timed pass REBUILDS the DataFrame: re-collecting one object
    # would let the DAG scheduler skip every stage whose shuffle output
    # survives (2.3 s LSH "measures" 0.06 s) — a fresh plan forces full
    # execution.  Base table relations are cached by load_table (the
    # metastore's job), so rebuild cost is expression construction +
    # analysis, not repeated parquet listings.
    queries: dict[str, float] = {}
    spread: dict[str, dict[str, float]] = {}
    for name in HEADLINE:
        registry[name].builder(spark, sf_dir).collect()
    for name in HEADLINE:
        q = registry[name]
        ts = []
        for _ in range(3):
            # several builders persist() within-query intermediates (LSH
            # profiles, TF tables...).  Clearing the cache BEFORE each
            # timed pass (r10) makes every pass self-contained: the
            # persisted stage is re-materialized INSIDE the timed region
            # instead of Spark's CacheManager silently serving the
            # warm-up pass's plan-identical cached blocks, so the number
            # measures the whole query.  It also keeps abandoned copies
            # from accumulating across 21x4 executions and squeezing the
            # unified execution pool.
            spark.catalog.clearCache()
            ts.append(time_query(lambda q=q: q.builder(spark, sf_dir).collect()))
        ts = sorted(ts)
        queries[name] = round(ts[1], 3)  # median of 3
        spread[name] = {"min": round(ts[0], 3), "max": round(ts[2], 3)}
    spark.catalog.clearCache()

    # --- yardsticks ---------------------------------------------------------
    yard: dict[str, float] = {}
    yard["parquet_scan_agg_s"] = queries["q12_agg_tpch_q1"]

    from shardpack_spark.format.datasource import read_shardpack, register
    from shardpack_spark.queries.format_queries import docs_as_shardpack_rows

    register(spark)
    out = tempfile.mkdtemp(prefix="bench_shardpack_")
    try:
        docs = docs_as_shardpack_rows(load_table(spark, sf_dir, "documents"))
        n_bytes = (
            load_table(spark, sf_dir, "documents")
            .select(F.sum(F.length("text"))).head()[0]
        )
        # Same steady-state protocol as the queries: one untimed warm-up
        # pass (Python-worker fork + Arrow path init dominate a cold
        # write), then best of two timed passes.
        def w_docs():
            docs.write.format("shardpack").option(
                "target_shard_bytes", 4 * 1024 * 1024
            ).mode("overwrite").save(out)

        w_docs()
        t_w = min(time_query(w_docs) for _ in range(2))
        yard["shardpack_write_s"] = round(t_w, 3)
        yard["shardpack_write_mb_s"] = round(n_bytes / t_w / 1e6, 1)

        def r_docs():
            read_shardpack(spark, out).agg(
                F.count(F.lit(1)),
                F.sum(F.element_at("metadata", "n_chars").cast("long")),
            ).collect()

        r_docs()  # warm with the SAME payload-decoding plan, not count()
        t_r = min(time_query(r_docs) for _ in range(2))
        yard["shardpack_scan_s"] = round(t_r, 3)

        # partition pruning: rewrite the same docs partitioned by lang at
        # a small shard size (so the dataset has enough shards for
        # pruning to matter), then time the SAME aggregate as a full scan
        # vs a where_meta scan of ONE language — the pruned plan opens
        # only that partition's shards
        docs.write.format("shardpack").option(
            "target_shard_bytes", 64 * 1024
        ).option("partition_by", "lang").mode("overwrite").save(out)
        lang = (
            load_table(spark, sf_dir, "documents")
            .agg(F.min("lang")).head()[0]
        )

        def r_part(meta):
            read_shardpack(spark, out, where_meta=meta).agg(
                F.count(F.lit(1)),
                F.sum(F.element_at("metadata", "n_chars").cast("long")),
            ).collect()

        r_part(None)
        yard["partitioned_full_s"] = round(
            min(time_query(lambda: r_part(None)) for _ in range(2)), 3
        )
        r_part({"lang": lang})
        yard["partitioned_prune_s"] = round(
            min(time_query(lambda: r_part({"lang": lang})) for _ in range(2)), 3
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)

    # bulk-binary throughput at realistic payload sizes: 3000 records
    # x 32 KiB binary entries (~94 MiB), parallel write + full scan
    bulk = tempfile.mkdtemp(prefix="bench_shardpack_bulk_")
    try:
        payload = 32 * 1024
        n_recs = 3000
        bulk_df = (
            spark.range(n_recs)
            .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
            .select(
                F.concat(F.lit("rec/"), F.col("id").cast("string")).alias("key"),
                F.create_map(F.lit("i"), F.col("id").cast("string")).alias("metadata"),
                F.array(
                    F.struct(
                        F.lit("blob.bin").alias("file_name"),
                        F.lit("application/octet-stream").alias("content_type"),
                        F.lit("none").alias("encoding"),
                        F.lit(payload).cast("long").alias("size"),
                        F.encode(F.repeat(F.lit("x"), payload), "utf-8").alias("data"),
                    )
                ).alias("entries"),
            )
        )
        total_mb = n_recs * payload / 1e6
        def w_bulk():
            bulk_df.write.format("shardpack").option(
                "target_shard_bytes", 16 * 1024 * 1024
            ).mode("overwrite").save(bulk)

        w_bulk()
        t_w = min(time_query(w_bulk) for _ in range(2))
        yard["bulk_write_mb_s"] = round(total_mb / t_w, 1)

        def r_bulk():
            read_shardpack(spark, bulk).select(
                F.sum(F.element_at("entries", 1)["size"])
            ).collect()

        r_bulk()  # warm with the payload-decoding plan
        t_r = min(time_query(r_bulk) for _ in range(2))
        yard["bulk_scan_mb_s"] = round(total_mb / t_r, 1)

        # point lookup through manifest pruning (range + per-shard bloom):
        # round-robin placement overlaps every shard's key range, so the
        # bloom is what keeps this from scanning all ~32 shards
        def point():
            read_shardpack(spark, bulk).filter(
                F.col("key") == f"rec/{n_recs // 2}"
            ).select("key").collect()

        point()
        yard["point_lookup_s"] = round(min(time_query(point) for _ in range(2)), 3)
    finally:
        shutil.rmtree(bulk, ignore_errors=True)

    # many-tiny-shards scan: 2000 one-record shards (a stream sink's or
    # tiny-commit pathology) read through the coalescing planner —
    # without grouping this is 2000 Python worker launches (~14 s);
    # grouped it must stay near one bulk-scan's cost
    tiny = tempfile.mkdtemp(prefix="bench_shardpack_tiny_")
    try:
        from shardpack_spark.format import codec as _codec

        tw = _codec.DatasetWriter(tiny, basename="t", target_shard_bytes=1)
        for i in range(2000):
            tw.write(
                _codec.Record(
                    key=f"t/{i:05d}",
                    entries=[
                        _codec.FileEntry(
                            "b.bin", "application/octet-stream", b"x" * 256
                        )
                    ],
                    metadata={},
                )
            )
        tw.close()

        def tiny_scan():
            read_shardpack(spark, tiny).select(F.count(F.lit(1))).collect()

        tiny_scan()
        yard["tiny_shard_scan_s"] = round(
            min(time_query(tiny_scan) for _ in range(2)), 3
        )
    finally:
        shutil.rmtree(tiny, ignore_errors=True)

    # steady-state bulk throughput: 20k x 32 KiB (~625 MiB) — enough data
    # that per-task fixed costs (Python worker round trip, task
    # scheduling) amortize and the number reflects the encode/decode
    # pipeline, not harness overhead.  The 94 MiB yardstick above is
    # kept for comparability with earlier rounds.
    bulk2 = tempfile.mkdtemp(prefix="bench_shardpack_bulk2_")
    try:
        n2 = 20000
        big_df = (
            spark.range(n2)
            .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
            .select(
                F.concat(F.lit("rec/"), F.col("id").cast("string")).alias("key"),
                F.create_map(F.lit("i"), F.col("id").cast("string")).alias("metadata"),
                F.array(
                    F.struct(
                        F.lit("blob.bin").alias("file_name"),
                        F.lit("application/octet-stream").alias("content_type"),
                        F.lit("none").alias("encoding"),
                        F.lit(payload).cast("long").alias("size"),
                        F.encode(F.repeat(F.lit("x"), payload), "utf-8").alias("data"),
                    )
                ).alias("entries"),
            )
        )
        mb2 = n2 * payload / 1e6

        def w_big():
            big_df.write.format("shardpack").option(
                "target_shard_bytes", 64 * 1024 * 1024
            ).mode("overwrite").save(bulk2)

        w_big()
        yard["bulk_write_steady_mb_s"] = round(mb2 / time_query(w_big), 1)

        def r_big():
            read_shardpack(spark, bulk2).select(
                F.sum(F.element_at("entries", 1)["size"])
            ).collect()

        r_big()
        yard["bulk_scan_steady_mb_s"] = round(mb2 / time_query(r_big), 1)
    finally:
        shutil.rmtree(bulk2, ignore_errors=True)

    # inverted-index probe: build once over the sf documents, then time a
    # warm 2-term BM25 top-10 — the latency that stays flat as the index
    # grows (key-IN shard pruning)
    idx = tempfile.mkdtemp(prefix="bench_invidx_")
    try:
        from shardpack_spark.operators.search import (
            build_inverted_index,
            search_bm25,
        )

        t0 = time.perf_counter()
        build_inverted_index(load_table(spark, sf_dir, "documents"), idx)
        yard["index_build_s"] = round(time.perf_counter() - t0, 3)

        def probe():
            search_bm25(spark, idx, ["batch", "small"], top_n=10).collect()

        probe()
        yard["search_probe_s"] = round(min(time_query(probe) for _ in range(2)), 3)
    finally:
        shutil.rmtree(idx, ignore_errors=True)

    # WARC family: export the sf documents as crawl archives once (with
    # .cdxj sidecars), then time (a) a full split scan through the
    # executor-snapped range partitions and (b) a dump-locator point
    # lookup — the two access paths a crawl-scale user lives on
    wdir = tempfile.mkdtemp(prefix="bench_warc_")
    try:
        from shardpack_spark.format.warc_index import lookup_via_dump_index
        from shardpack_spark.format.warc_source import read_warc
        from shardpack_spark.operators.webcorpus import (
            documents_to_warc,
            warc_dump_index,
        )

        arch = os.path.join(wdir, "arch")
        documents_to_warc(
            load_table(spark, sf_dir, "documents").coalesce(4), arch
        ).collect()

        # seconds, not MB/s: the sf0.1 fixture is small enough that the
        # scan is task-overhead-bound (true throughput is the README's
        # 990 MB probe); this tracks the split/snap machinery's fixed
        # cost round over round
        def warc_scan():
            read_warc(spark, arch, target_split_bytes="262144").count()

        warc_scan()
        yard["warc_split_scan_s"] = round(
            min(time_query(warc_scan) for _ in range(2)), 3
        )

        loc = os.path.join(wdir, "loc")
        warc_dump_index(spark, arch, loc)
        some_id = "<urn:doc:7>"  # documents_to_warc writes <urn:doc:{doc_id}>

        def locator_probe():
            assert lookup_via_dump_index(loc, some_id)  # a hit, not a miss

        locator_probe()
        yard["warc_locator_lookup_s"] = round(
            min(time_query(locator_probe) for _ in range(2)), 3
        )

        # public-CDX interop (round 9): emit the zipnum pair (block-gzip
        # cdx shard + cluster.idx) for the same archives, then time a
        # URL point lookup through it — the index a real crawl already
        # ships, served Spark-free
        from shardpack_spark.format.cdx_public import (
            build_public_cdx,
            lookup_public_cdx,
        )

        pidx = os.path.join(wdir, "cdx")
        t0 = time.perf_counter()
        build_public_cdx(arch, pidx)
        yard["cdx_emit_s"] = round(time.perf_counter() - t0, 3)

        def cdx_probe():
            # documents_to_warc's default target_uri is urn:doc:{id}
            assert lookup_public_cdx(pidx, url="urn:doc:7")

        cdx_probe()
        yard["cdx_public_lookup_s"] = round(
            min(time_query(cdx_probe) for _ in range(2)), 3
        )

        # revisit resolution (late round 9): 10% of the docs re-exported
        # as payload-less revisit records, resolved back against the
        # response archives — times the two resolution joins over the
        # python-source scans, the dedup-aware crawl consumer's hot path
        from shardpack_spark.operators.webcorpus import resolve_revisits

        rvdir = os.path.join(wdir, "rv")
        documents_to_warc(
            load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 10 == 0)
            .select(
                F.concat(F.lit("rv:"), F.col("doc_id").cast("string")).alias(
                    "doc_id"
                ),
                "text",
                F.col("doc_id").cast("string").alias("orig"),
            )
            .coalesce(2),
            rvdir,
            revisit_of_col="orig",
        ).collect()

        def rv_resolve():
            n = (
                resolve_revisits(
                    read_warc(spark, arch).unionByName(read_warc(spark, rvdir))
                )
                .filter(F.col("resolved_by").isNotNull())
                .count()
            )
            assert n > 0  # resolution actually happened, not a 0-row plan

        rv_resolve()
        yard["warc_revisit_resolve_s"] = round(
            min(time_query(rv_resolve) for _ in range(2)), 3
        )
    finally:
        shutil.rmtree(wdir, ignore_errors=True)

    total = round(sum(queries.values()), 3)
    total_min = round(sum(s["min"] for s in spread.values()), 3)
    # The driver records only the LAST 2,000 chars of stdout, so the ONE
    # stdout JSON line must stay under that budget AND carry the roll-ups
    # near the END of the object (r6's artifact truncated "value" out of
    # existence).  Per-query min/max spread is analysis detail, not gate
    # input — it goes to stderr as a second labeled JSON line.
    print(
        json.dumps({"query_spread": spread, "detail_for": "bench.py"}),
        file=sys.stderr,
    )
    # single-thread sha256 canary + steal/load/uptime: how fast THIS host
    # was during THIS run.  Compare canary values ACROSS artifacts —
    # queries slower in proportion to a slower canary = host, not
    # regression.
    host_block = _host_finalize(host, stat0)
    line = json.dumps(
        {
            "metric": "headline_queries_total_wall_clock",
            "unit": "sec",
            "sf": sf,
            "queries": queries,
            "yardsticks": yard,
            "host": host_block,
            # Per-query point estimate is the median of 3 runs (since
            # round 5; rounds 1-4 reported min-of-N, so cross-round
            # totals are not directly comparable across that boundary).
            # value_min (sum of per-query mins) is the min-estimator
            # total for comparison against those earlier rounds.
            "estimator": "median3",
            "value_min": total_min,
            "value": total,
        }
    )
    if len(line) > 1900:  # belt-and-braces: never outgrow the tail capture
        print(json.dumps({"yardsticks": yard, "detail_for": "bench.py"}),
              file=sys.stderr)
        line = json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "unit": "sec",
                "sf": sf,
                "queries": queries,
                "host": host_block,
                "estimator": "median3",
                "value_min": total_min,
                "value": total,
            }
        )
    if len(line) > 1900:
        # the per-query dict dominates line length, so dropping yardsticks
        # alone stops working as queries are added — move the queries dict
        # to stderr too and keep only totals/host/estimator on stdout
        # (everything the gate parses).
        print(json.dumps({"queries": queries, "detail_for": "bench.py"}),
              file=sys.stderr)
        line = json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "unit": "sec",
                "sf": sf,
                "host": host_block,
                "estimator": "median3",
                "value_min": total_min,
                "value": total,
            }
        )
    print(line)


if __name__ == "__main__":
    main()
