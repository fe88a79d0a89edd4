"""Columnar multi-dataset layout for ShardPack (reference docs/draft.md:201-211).

The spec's columnar convention: row-major record blocks are the physical
layout, and "columnar" access is achieved by writing **one ShardPack
dataset per logical column** (entry file_name / modality) with records
aligned across datasets by record key, "joined at read time by key".
This module implements that convention on the Spark DataSource:

    write_columnar(df, path)             # df in shardpack row schema
    df = read_columnar(spark, path, columns=["caption.txt"])

Scale rationale (the whole point of the layout): at 100 TB with N
modalities, a pipeline that touches one modality reads ~1/N of the corpus
bytes, because column pruning happens at DATASET granularity — entire
shard files of unrequested modalities are never opened.  Within each
column dataset the usual shard-parallel reads, manifest pruning and
payload skipping still apply.

Layout on disk:

    {path}/_columnar.json                 # column -> subdirectory map
    {path}/column=text.txt/               # one shardpack dataset per column
    {path}/column=image.jpg/

Alignment contract: each column dataset stores records keyed by the SAME
record key, holding exactly the entries of that column (records without
the column are absent — the read-side join direction controls whether
such records surface).  Record-level metadata is replicated into every
column dataset so any single column remains a self-contained dataset
(metadata is small by contract; the spec's record-level metadata tier,
draft.md:393-397).

Write cost: one pass over the input per column (the Python DataSource API
cannot demultiplex one scan into several datasets).  The input is
persisted across passes, so the source is scanned once; this is the
standard one-time write amplification of any columnar re-layout.

Read plan: per-column scans -> sort-merge/broadcast join on `key` (left
column = driving dataset).  Each dataset is written range-partitioned and
sorted by key, so per-shard [min,max] manifest stats prune key-range
scans and the join keys arrive clustered.
"""

from __future__ import annotations

import json
import os
import urllib.parse

from pyspark.sql import functions as F

from shardpack_spark.format import codec
from shardpack_spark.format.datasource import (
    _load_manifest,
    _write_manifest,  # noqa: F401  (re-exported for maintenance jobs)
    read_shardpack,
    register,
)

COLUMNS_FILE = "_columnar.json"


def _col_dir(name: str) -> str:
    return "column=" + urllib.parse.quote(name, safe="")


def list_columns(path: str) -> list[str]:
    """Columns present in a columnar dataset (from the commit map)."""
    cp = os.path.join(path, COLUMNS_FILE)
    if not os.path.exists(cp):
        raise codec.ShardPackIOError(f"no {COLUMNS_FILE} under {path}")
    with open(cp) as f:
        return sorted(json.load(f)["columns"])


def write_columnar(
    df,
    path: str,
    columns: list[str] | None = None,
    compression: str = "none",
    target_shard_bytes: int = codec.DEFAULT_TARGET_SHARD_BYTES,
    shards_per_column: int | None = None,
) -> dict:
    """Split shardpack-schema rows into one dataset per entry column.

    ``columns`` defaults to every distinct ``entries.file_name`` in the
    input (one extra distinct-scan to discover them).  Returns
    {column: record_count}.
    """
    from pyspark import StorageLevel

    spark = df.sparkSession
    register(spark)
    if columns is None:
        columns = [
            r["c"]
            for r in df.select(
                F.explode(F.transform("entries", lambda e: e["file_name"])).alias("c")
            )
            .distinct()
            .collect()
        ]
    if not columns:
        raise codec.ShardPackIOError("write_columnar: no entry columns found")

    # one source scan feeds all per-column writes
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        os.makedirs(path, exist_ok=True)
        counts: dict[str, int] = {}
        for name in sorted(columns):
            one = (
                df.select(
                    "key",
                    "metadata",
                    # one-arg lambda: a second arg would be read as the
                    # (element, index) form; F.filter builds the expression
                    # eagerly, so closing over the loop var is safe
                    F.filter("entries", lambda e: e["file_name"] == F.lit(name)).alias(
                        "entries"
                    ),
                )
                .where(F.size("entries") > 0)
            )
            # key-sorted layout: disjoint per-shard key ranges -> manifest
            # range pruning is decisive, and read-side joins see clustered
            # keys.  Parallelism set explicitly because the DataSource
            # writer rolls per task.
            n_parts = shards_per_column or max(
                1, spark.sparkContext.defaultParallelism // 2
            )
            one = one.repartitionByRange(n_parts, "key").sortWithinPartitions("key")
            sub = os.path.join(path, _col_dir(name))
            (
                one.write.format("shardpack")
                .option("compression", compression)
                .option("target_shard_bytes", target_shard_bytes)
                .mode("overwrite")
                .save(sub)
            )
            counts[name] = (_load_manifest(sub) or {}).get("total_records", 0)
        # commit point for the column map (written last: readers that find
        # the map can trust every listed dataset is fully committed)
        tmp = os.path.join(path, COLUMNS_FILE + ".tmp")
        with open(tmp, "w") as f:
            json.dump({"version": 1, "columns": sorted(columns)}, f, indent=1)
        os.replace(tmp, os.path.join(path, COLUMNS_FILE))
        return counts
    finally:
        df.unpersist()


def read_columnar(
    spark,
    path: str,
    columns: list[str] | None = None,
    how: str = "inner",
    **reader_options,
):
    """Read selected columns of a columnar dataset, aligned by key.

    Returns shardpack row schema (key, metadata, entries) where
    ``entries`` holds the requested columns' entries in ``columns``
    order.  ``how`` controls alignment of records missing some column:
    ``inner`` keeps records having every requested column, ``full``
    keeps records having any (absent columns contribute no entry).

    Only the requested columns' datasets are opened — dataset-granular
    column pruning, the layout's reason to exist.
    """
    available = list_columns(path)
    if columns is None:
        columns = available
    missing = [c for c in columns if c not in available]
    if missing:
        raise codec.ShardPackIOError(
            f"columns {missing} not in columnar dataset (have {available})"
        )
    if how not in ("inner", "full"):
        raise ValueError(f"how must be inner|full, got {how!r}")

    out = None
    for i, name in enumerate(columns):
        part = read_shardpack(
            spark, os.path.join(path, _col_dir(name)), **reader_options
        ).select(
            "key",
            F.col("metadata").alias(f"__m{i}"),
            F.col("entries").alias(f"__e{i}"),
        )
        out = part if out is None else out.join(part, on="key", how=how)

    meta = F.coalesce(*[F.col(f"__m{i}") for i in range(len(columns))])
    ents = F.concat(
        *[
            F.coalesce(F.col(f"__e{i}"), F.array().cast(_ENTRIES_TYPE))
            for i in range(len(columns))
        ]
    )
    return out.select("key", meta.alias("metadata"), ents.alias("entries"))


_ENTRIES_TYPE = (
    "array<struct<file_name:string,content_type:string,encoding:string,"
    "size:bigint,data:binary>>"
)
