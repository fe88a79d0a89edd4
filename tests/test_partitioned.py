"""Partitioned layout: partition-pure shards, exact pruning, dynamic
partition overwrite (partitionOverwriteMode=dynamic semantics), vacuum
reclamation of replaced shards, compaction passthrough, object-store run.

The layout is FLAT-directory hive partitioning: partition values ride in
the manifest per shard (not in subdirectory names), so every existing
flat-layout code path — listing, watermarks, vacuum — is untouched, while
planning prunes and dynamic overwrite replaces by exact partition match.
"""

import json as _json

import pytest
from pyspark.sql import functions as F

from shardpack_spark.format.datasource import register
from shardpack_spark.tables import load_table


@pytest.fixture(scope="module")
def spark_ds(spark):
    register(spark)
    return spark


def _docs(spark, sf_dir, limit=None):
    docs = load_table(spark, sf_dir, "documents")
    if limit:
        docs = docs.limit(limit)
    return docs.select(
        F.concat(F.lit("doc/"), F.lpad(F.col("doc_id").cast("string"), 8, "0")).alias(
            "key"
        ),
        F.create_map(
            F.lit("lang"), F.col("lang"),
            F.lit("source"), F.col("source"),
            F.lit("n_chars"), F.col("n_chars").cast("string"),
        ).alias("metadata"),
        F.array(
            F.struct(
                F.lit("text.txt").alias("file_name"),
                F.lit("text/plain").alias("content_type"),
                F.lit("none").alias("encoding"),
                F.length("text").cast("long").alias("size"),
                F.encode("text", "utf-8").alias("data"),
            )
        ).alias("entries"),
    )


def _write_partitioned(df, out, mode="append", **opts):
    w = df.write.format("shardpack").option("partition_by", "lang")
    for k, v in opts.items():
        w = w.option(k, v)
    w.mode(mode).save(out)


def _lang_counts(spark, out, version=None):
    from shardpack_spark.format.datasource import read_shardpack

    df = read_shardpack(spark, out, version=version)
    return {
        r["lang"]: r["n"]
        for r in df.groupBy(F.element_at("metadata", F.lit("lang")).alias("lang"))
        .agg(F.count("*").alias("n"))
        .collect()
    }


def test_partitioned_write_pure_shards(spark_ds, sf_dir, tmp_path):
    """Every shard is partition-pure, the manifest records the partition
    value and layout, and dataset_partitions sums to the total."""
    from shardpack_spark.format.datasource import (
        _load_manifest,
        dataset_partitions,
        read_shardpack,
    )

    out = str(tmp_path / "pds")
    src = _docs(spark_ds, sf_dir)
    _write_partitioned(src, out, mode="overwrite")

    m = _load_manifest(out)
    assert m["partition_by"] == ["lang"]
    assert m["shards"], "no shards committed"
    for s in m["shards"]:
        assert set(s["partition"]) == {"lang"}
        # purity: the recorded value matches the shard's value SET exactly
        assert s["meta_values"]["lang"] == [s["partition"]["lang"]]

    want = src.count()
    assert read_shardpack(spark_ds, out).count() == want

    parts = dataset_partitions(out)
    assert sum(p["records"] for p in parts) == want == m["total_records"]
    assert all(p["partition"] is not None and p["shards"] >= 1 for p in parts)
    langs = {p["partition"]["lang"] for p in parts}
    assert langs == {r["lang"] for r in src.select(
        F.element_at("metadata", F.lit("lang")).alias("lang")
    ).distinct().collect()}


def test_partition_pruning_exact(spark_ds, sf_dir, tmp_path):
    """where_meta on a partition key plans EXACTLY the matching partition's
    shards (writer-enforced purity makes equality pruning exact)."""
    from shardpack_spark.format.datasource import (
        ShardPackReader,
        _load_manifest,
        read_shardpack,
    )

    out = str(tmp_path / "prune")
    src = _docs(spark_ds, sf_dir)
    _write_partitioned(src, out, mode="overwrite")

    m = _load_manifest(out)
    lang = m["shards"][0]["partition"]["lang"]
    want_shards = sum(1 for s in m["shards"] if s["partition"]["lang"] == lang)
    planned = ShardPackReader(
        {"path": out, "where_meta": _json.dumps({"lang": lang})}
    ).partitions()
    # plan entries may be grouped (small-shard coalescing) or split;
    # collect every planned shard name — all must match the partition
    names = set()
    for p in planned:
        if not p.path:
            continue
        for full in p.group or [p.path]:
            names.add(full.rsplit("/", 1)[-1])
    by_name = {s["path"]: s for s in m["shards"]}
    assert names and all(by_name[n]["partition"]["lang"] == lang for n in names)
    assert len(names) == want_shards

    want = src.filter(F.element_at("metadata", F.lit("lang")) == lang).count()
    got = read_shardpack(spark_ds, out, where_meta={"lang": lang}).count()
    assert got == want > 0


def test_dynamic_partition_overwrite(spark_ds, sf_dir, tmp_path):
    """Dynamic overwrite replaces ONLY the partitions present in the new
    data; other partitions, history, and totals stay exact."""
    from shardpack_spark.format.datasource import (
        _load_manifest,
        read_shardpack,
    )

    out = str(tmp_path / "dyn")
    src = _docs(spark_ds, sf_dir)
    _write_partitioned(src, out, mode="overwrite")          # v1
    before = _lang_counts(spark_ds, out)
    lang = sorted(before)[0]

    repl = src.filter(F.element_at("metadata", F.lit("lang")) == lang).limit(5)
    n_repl = repl.count()
    _write_partitioned(
        repl, out, mode="overwrite", partition_overwrite_mode="dynamic"
    )                                                        # v2

    after = _lang_counts(spark_ds, out)
    assert after[lang] == n_repl
    for other in before:
        if other != lang:
            assert after[other] == before[other]

    m = _load_manifest(out)
    assert m["total_records"] == sum(after.values())
    assert m.get("dropped"), "replaced shards must be recorded as dropped"

    # time travel: the pre-overwrite snapshot still reads the original rows
    v1 = m["version_id"] - 1
    assert _lang_counts(spark_ds, out, version=v1) == before

    # append after a dynamic overwrite keeps the dropped list in force
    extra = src.filter(F.element_at("metadata", F.lit("lang")) == lang).limit(60)
    n_extra = extra.count()
    _write_partitioned(extra, out, mode="append")
    assert read_shardpack(spark_ds, out).count() == sum(after.values()) + n_extra

    # a FULL overwrite resets history and deletes replaced-shard files
    _write_partitioned(src.limit(10), out, mode="overwrite")
    m2 = _load_manifest(out)
    assert not m2.get("dropped")
    assert read_shardpack(spark_ds, out).count() == 10


def test_dynamic_overwrite_requires_partitioned_layout(spark_ds, sf_dir, tmp_path):
    out = str(tmp_path / "mixed")
    src = _docs(spark_ds, sf_dir, limit=50)
    src.write.format("shardpack").mode("overwrite").save(out)  # unpartitioned
    with pytest.raises(Exception, match="predates the partitioned layout"):
        _write_partitioned(
            src.limit(5), out, mode="overwrite", partition_overwrite_mode="dynamic"
        )


def test_dynamic_overwrite_option_validation(spark_ds, sf_dir, tmp_path):
    out = str(tmp_path / "val")
    src = _docs(spark_ds, sf_dir, limit=5)
    with pytest.raises(Exception, match="requires partition_by"):
        (
            src.write.format("shardpack")
            .option("partition_overwrite_mode", "dynamic")
            .mode("overwrite")
            .save(out)
        )
    with pytest.raises(Exception, match="spec_naming"):
        (
            src.write.format("shardpack")
            .option("partition_by", "lang")
            .option("spec_naming", "bucket")
            .mode("overwrite")
            .save(out)
        )


def test_max_partition_writers_cap(spark_ds, sf_dir, tmp_path):
    """A task seeing more distinct partition values than the cap fails
    with actionable guidance instead of silently emitting shard spray."""
    out = str(tmp_path / "cap")
    src = _docs(spark_ds, sf_dir).coalesce(1)
    with pytest.raises(Exception, match="max_partition_writers"):
        (
            src.write.format("shardpack")
            .option("partition_by", "n_chars")  # ~unique per doc
            .option("max_partition_writers", "4")
            .mode("overwrite")
            .save(out)
        )


def test_vacuum_reclaims_dropped_shards(spark_ds, sf_dir, tmp_path):
    """Replaced shards survive for retained snapshots, then vacuum deletes
    them; the live view never changes."""
    from shardpack_spark.format.datasource import (
        _load_manifest,
        read_shardpack,
        vacuum,
    )
    from shardpack_spark.format import storage

    out = str(tmp_path / "vac")
    src = _docs(spark_ds, sf_dir)
    _write_partitioned(src, out, mode="overwrite")
    before = _lang_counts(spark_ds, out)
    lang = sorted(before)[0]
    repl = src.filter(F.element_at("metadata", F.lit("lang")) == lang).limit(3)
    _write_partitioned(repl, out, mode="overwrite", partition_overwrite_mode="dynamic")

    m = _load_manifest(out)
    dropped = m["dropped"]
    be = storage.for_path(out)
    assert all(be.exists(f"{out}/{n}") for n in dropped)

    live_before = read_shardpack(spark_ds, out).count()
    rep = vacuum(out, keep_versions=1, grace_seconds=0)
    assert sorted(rep["deleted_shards"]) == sorted(dropped)
    assert not any(be.exists(f"{out}/{n}") for n in dropped)
    assert read_shardpack(spark_ds, out).count() == live_before


def test_fsck_labels_dropped_not_orphans(spark_ds, sf_dir, tmp_path):
    from shardpack_spark.format.datasource import verify_dataset

    out = str(tmp_path / "fsck")
    src = _docs(spark_ds, sf_dir)
    _write_partitioned(src, out, mode="overwrite")
    lang = sorted(_lang_counts(spark_ds, out))[0]
    repl = src.filter(F.element_at("metadata", F.lit("lang")) == lang).limit(3)
    _write_partitioned(repl, out, mode="overwrite", partition_overwrite_mode="dynamic")

    rep = verify_dataset(spark_ds, out)
    assert rep["ok"], rep
    assert rep["orphans"] == []


def test_compaction_preserves_partitioning(spark_ds, sf_dir, tmp_path):
    """Compaction of a partitioned dataset re-emits partition-pure shards
    and keeps the layout (so dynamic overwrite still works after)."""
    from shardpack_spark.format.datasource import (
        _load_manifest,
        compact_dataset,
        read_shardpack,
    )

    out = str(tmp_path / "compact")
    src = _docs(spark_ds, sf_dir)
    # tiny shards -> compaction has real work
    _write_partitioned(src, out, mode="overwrite", target_shard_bytes="16384")
    n_before = len(_load_manifest(out)["shards"])
    want = read_shardpack(spark_ds, out).count()

    compact_dataset(spark_ds, out, target_shard_bytes=1 << 20)
    m = _load_manifest(out)
    assert m["partition_by"] == ["lang"]
    assert len(m["shards"]) < n_before
    for s in m["shards"]:
        assert s["meta_values"]["lang"] == [s["partition"]["lang"]]
    assert read_shardpack(spark_ds, out).count() == want

    before = _lang_counts(spark_ds, out)
    lang = sorted(before)[0]
    repl = src.filter(F.element_at("metadata", F.lit("lang")) == lang).limit(2)
    _write_partitioned(repl, out, mode="overwrite", partition_overwrite_mode="dynamic")
    after = _lang_counts(spark_ds, out)
    assert after[lang] == 2
    assert all(after[o] == before[o] for o in before if o != lang)


def test_partitioned_over_object_store(spark_ds, sf_dir, tmp_path):
    """The whole partitioned lifecycle — write, prune, dynamic overwrite —
    over sim:// (rename-less, conditional-put object-store semantics)."""
    from shardpack_spark.format.datasource import read_shardpack

    out = "sim://" + str(tmp_path / "objpart")
    src = _docs(spark_ds, sf_dir, limit=400)
    _write_partitioned(src, out, mode="overwrite")
    before = _lang_counts(spark_ds, out)
    assert sum(before.values()) == 400

    lang = sorted(before)[0]
    repl = src.filter(F.element_at("metadata", F.lit("lang")) == lang).limit(4)
    _write_partitioned(repl, out, mode="overwrite", partition_overwrite_mode="dynamic")
    after = _lang_counts(spark_ds, out)
    assert after[lang] == 4
    assert all(after[o] == before[o] for o in before if o != lang)

    got = read_shardpack(spark_ds, out, where_meta={"lang": lang}).count()
    assert got == 4


@pytest.mark.slow  # heavy (>=12 s); conclusive lane only
def test_stream_sink_partitioned(spark_ds, sf_dir, tmp_path):
    """The streaming sink writes partition-pure shards: partition values
    ride in the batch markers (pruning reads them BEFORE any fold), and
    fold_stream_markers moves values + layout into the manifest so the
    dataset is indistinguishable from a batch-partitioned one."""
    import glob as _glob
    import os as _os

    from shardpack_spark.format.datasource import (
        ShardPackReader,
        _load_manifest,
        dataset_partitions,
        fold_stream_markers,
        read_shardpack,
    )

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    all_docs = _docs(spark_ds, sf_dir)  # key = doc/<8-digit id>: range-sliceable
    docs = all_docs.filter(F.col("key") < "doc/00000200")
    docs.write.format("shardpack").mode("overwrite").save(src)
    want = _lang_counts(spark_ds, src)

    assert (
        spark_ds.readStream.format("shardpack")
        .load(src)
        .writeStream.format("shardpack")
        .option("path", sink)
        .option("partition_by", "lang")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    ), "stream did not finish in time"

    # markers carry partition values + the layout record
    markers = sorted(_glob.glob(_os.path.join(sink, "_batch_*.json")))
    assert markers
    marked = []
    for mp in markers:
        m = _json.load(open(mp))
        assert m.get("partition_by") == ["lang"]
        marked.extend(m["shards"])
    assert marked and all(set(s["partition"]) == {"lang"} for s in marked)
    # purity: recorded value == the shard's whole value set
    assert all(
        s["meta_values"]["lang"] == [s["partition"]["lang"]] for s in marked
    )

    # pruning works PRE-fold: where_meta on the partition key plans only
    # that partition's (marker-committed) shards
    lang = sorted(want)[0]
    planned = ShardPackReader(
        {"path": sink, "where_meta": _json.dumps({"lang": lang})}
    ).partitions()
    names = set()
    for p in planned:
        if p.path:
            for full in p.group or [p.path]:
                names.add(full.rsplit("/", 1)[-1])
    by_name = {s["path"]: s for s in marked}
    assert names and all(by_name[n]["partition"]["lang"] == lang for n in names)
    assert len(names) == sum(
        1 for s in marked if s["partition"]["lang"] == lang
    )
    assert _lang_counts(spark_ds, sink) == want

    # second micro-batch (same checkpoint -> batchId advances), so the
    # fold below has a foldable prefix while keep_last=1 retains the
    # newest marker as the replay guard
    extra = all_docs.filter(
        (F.col("key") >= "doc/00000200") & (F.col("key") < "doc/00000250")
    )
    n_extra = extra.count()
    assert n_extra > 0
    extra.write.format("shardpack").mode("append").save(src)
    assert (
        spark_ds.readStream.format("shardpack")
        .load(src)
        .writeStream.format("shardpack")
        .option("path", sink)
        .option("partition_by", "lang")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    total_langs = _lang_counts(spark_ds, sink)
    assert sum(total_langs.values()) == sum(want.values()) + n_extra

    # fold: manifest adopts the layout; values survive; reads unchanged
    assert fold_stream_markers(sink, keep_last=1)["folded"] >= 1
    m = _load_manifest(sink)
    assert m["partition_by"] == ["lang"]
    assert m["shards"] and all("partition" in s for s in m["shards"])
    assert _lang_counts(spark_ds, sink) == total_langs
    parts = dataset_partitions(sink)
    assert {p["partition"]["lang"]: p["records"] for p in parts} == total_langs

    # the folded stream dataset supports batch dynamic overwrite
    repl = _docs(spark_ds, sf_dir).filter(
        F.element_at("metadata", F.lit("lang")) == lang
    ).limit(3)
    _write_partitioned(repl, sink, mode="overwrite",
                       partition_overwrite_mode="dynamic")
    after = _lang_counts(spark_ds, sink)
    assert after[lang] == 3
    for other in total_langs:
        if other != lang:
            assert after[other] == total_langs[other]
    n_after = read_shardpack(spark_ds, sink).count()

    # fold after a dynamic overwrite must keep the dropped list in force
    # (a fold that forgot it would resurrect the replaced shards)
    more = all_docs.filter(
        (F.col("key") >= "doc/00000250") & (F.col("key") < "doc/00000257")
    )
    n_more = more.count()
    assert n_more > 0
    more.write.format("shardpack").mode("append").save(src)
    assert (
        spark_ds.readStream.format("shardpack")
        .load(src)
        .writeStream.format("shardpack")
        .option("path", sink)
        .option("partition_by", "lang")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    assert fold_stream_markers(sink, keep_last=1)["folded"] >= 1
    m2 = _load_manifest(sink)
    assert m2.get("dropped"), "fold dropped the dynamic-overwrite exclusions"
    assert read_shardpack(spark_ds, sink).count() == n_after + n_more


def test_sorted_compaction_of_partitioned_dataset(spark_ds, sf_dir, tmp_path):
    """compact_dataset(sort_by_key=True) on a partitioned dataset keeps
    the layout AND yields disjoint key ranges inside each partition, so
    partition pruning and point-lookup pruning compose."""
    from shardpack_spark.format.datasource import (
        _load_manifest,
        compact_dataset,
        read_shardpack,
    )

    out = str(tmp_path / "sorted")
    src = _docs(spark_ds, sf_dir)
    want = src.count()
    _write_partitioned(src, out, mode="overwrite")

    compact_dataset(spark_ds, out, target_shard_bytes=64 * 1024, sort_by_key=True)
    m = _load_manifest(out)
    assert m["partition_by"] == ["lang"]
    by_lang: dict[str, list] = {}
    for s in m["shards"]:
        assert set(s["partition"]) == {"lang"}
        assert s["meta_values"]["lang"] == [s["partition"]["lang"]]
        by_lang.setdefault(s["partition"]["lang"], []).append(
            (s["min_key"], s["max_key"])
        )
    # disjoint, ordered key ranges within every partition
    for ranges in by_lang.values():
        ranges.sort()
        for (lo1, hi1), (lo2, _) in zip(ranges, ranges[1:]):
            assert hi1 < lo2, f"overlapping ranges {hi1} >= {lo2}"
    assert read_shardpack(spark_ds, out).count() == want
    # dynamic overwrite still works on the compacted layout
    lang = sorted(by_lang)[0]
    repl = src.filter(F.element_at("metadata", F.lit("lang")) == lang).limit(2)
    _write_partitioned(repl, out, mode="overwrite",
                       partition_overwrite_mode="dynamic")
    assert _lang_counts(spark_ds, out)[lang] == 2


def test_stream_reader_partition_pruned(spark_ds, sf_dir, tmp_path):
    """A streaming consumer with where_meta tails ONE partition: only
    matching shards are admitted (pruning, not row filtering — purity
    makes it exact for partition keys)."""
    src = str(tmp_path / "psrc")
    docs = _docs(spark_ds, sf_dir, limit=300)
    _write_partitioned(docs, src, mode="overwrite")
    langs = sorted(_lang_counts(spark_ds, src))
    lang = langs[0]
    want = _lang_counts(spark_ds, src)[lang]

    q = (
        spark_ds.readStream.format("shardpack")
        .option("where_meta", _json.dumps({"lang": lang}))
        .load(src)
        .groupBy(F.element_at("metadata", F.lit("lang")).alias("lang"))
        .agg(F.count("*").alias("n"))
        .writeStream.format("memory")
        .queryName("pruned_tail")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    rows = {r["lang"]: r["n"] for r in spark_ds.sql("SELECT * FROM pruned_tail").collect()}
    # partition purity -> ONLY the probed lang ever reaches the stream
    assert rows == {lang: want}


def test_write_partitioned_helper(spark_ds, sf_dir, tmp_path):
    """The helper repartitions by the partition keys (few writers per
    task, few shards per partition) and supports dynamic replace."""
    from shardpack_spark.format.datasource import (
        _load_manifest,
        dataset_partitions,
        write_partitioned,
    )

    out = str(tmp_path / "helper")
    src = _docs(spark_ds, sf_dir)
    write_partitioned(src, out, "lang", mode="overwrite", tasks=8)
    m = _load_manifest(out)
    assert m["partition_by"] == ["lang"]
    n_langs = len({s["partition"]["lang"] for s in m["shards"]})
    # with the exchange, each partition lands in ~1 task -> ~1 shard
    assert len(m["shards"]) <= 2 * n_langs
    before = _lang_counts(spark_ds, out)

    lang = sorted(before)[0]
    repl = src.filter(F.element_at("metadata", F.lit("lang")) == lang).limit(4)
    write_partitioned(repl, out, ["lang"], dynamic=True, tasks=2)
    after = _lang_counts(spark_ds, out)
    assert after[lang] == 4
    assert all(after[o] == before[o] for o in before if o != lang)
    assert sum(p["records"] for p in dataset_partitions(out)) == sum(after.values())

    with pytest.raises(Exception, match="requires partition keys"):
        write_partitioned(src, out, [], mode="overwrite")
