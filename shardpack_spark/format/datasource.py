"""Python DataSource V2 for the ShardPack format (Spark >= 4.0).

    spark.dataSource.register(ShardPackDataSource)
    df = spark.read.format("shardpack").load("/path/to/dataset")
    df.write.format("shardpack").mode("append").save("/path/to/dataset")
    stream = spark.readStream.format("shardpack").load("/path/to/dataset")

Row schema (SURVEY.md §1.3):
    key       STRING
    metadata  MAP<STRING,STRING>
    entries   ARRAY<STRUCT<file_name STRING, content_type STRING,
                           encoding STRING, size BIGINT, data BINARY>>

Scale mapping (reference semantics -> Spark execution):
- one InputPartition per shard; shards over `split_target_bytes` are split
  into record-ranges using the EOF offset table (draft.md:124-127), so a
  1000-executor cluster gets even work regardless of shard sizing
- key-equality filters prune partitions via the per-shard [min,max] key
  range in the commit manifest BEFORE any shard is opened (the bucket
  index access path, src/bucket.rs:147-169, as partition pruning); filters
  are also re-applied by Spark, so pruning is purely an optimization
- write side: one DataWriter per task, rolling shards at
  `target_shard_bytes` (src/shard/config.rs:1); the driver-side commit()
  writes a dataset manifest with per-shard stats — task failures leave
  only uncommitted files that overwrite cleanly on retry

Options:
    compression         none|gzip|lz4|zstd|snappy     (write; default none)
    target_shard_bytes  int                           (write; default 256 MiB)
    verify_checksums    true|false                    (read; default true)
    split_target_bytes  int                           (read; default 128 MiB)
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import TYPE_CHECKING

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from shardpack_spark.format import codec

if TYPE_CHECKING:
    from collections.abc import Iterator, Sequence

MANIFEST_NAME = "_shardpack_manifest.json"

SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("metadata", MapType(StringType(), StringType())),
        StructField(
            "entries",
            ArrayType(
                StructType(
                    [
                        StructField("file_name", StringType()),
                        StructField("content_type", StringType()),
                        StructField("encoding", StringType()),
                        StructField("size", LongType()),
                        StructField("data", BinaryType()),
                    ]
                )
            ),
        ),
    ]
)


def _record_to_tuple(rec: codec.Record) -> tuple:
    return (
        rec.key,
        rec.metadata or {},
        [
            (e.file_name, e.content_type, e.encoding, len(e.data), e.data)
            for e in rec.entries
        ],
    )


@dataclass
class ShardPartition(InputPartition):
    path: str
    offsets: list[int] | None  # None -> whole shard


def _load_manifest(path: str) -> dict | None:
    mp = os.path.join(path, MANIFEST_NAME)
    if os.path.exists(mp):
        with open(mp) as f:
            return json.load(f)
    return None


class ShardPackReader(DataSourceReader):
    """Base reader WITHOUT pushFilters — Spark raises if a reader defines
    pushFilters while spark.sql.python.filterPushdown.enabled is false, so
    the pruning variant below is chosen only when the conf is on."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise codec.ShardPackIOError("shardpack reader requires a path")
        self.verify = str(options.get("verify_checksums", "true")).lower() == "true"
        self.split_target = int(options.get("split_target_bytes", 128 * 1024 * 1024))
        self._key_filters: list[str] = []

    def partitions(self) -> Sequence[ShardPartition]:
        shards = codec.list_shards(self.path)
        if not shards:
            raise codec.ShardPackIOError(f"no .shardpack files under {self.path}")
        manifest = _load_manifest(self.path)
        stats = {s["path"]: s for s in (manifest or {}).get("shards", [])}

        out: list[ShardPartition] = []
        for sp in shards:
            name = os.path.basename(sp)
            st = stats.get(name)
            if self._key_filters and st and "min_key" in st:
                if all(not (st["min_key"] <= k <= st["max_key"]) for k in self._key_filters):
                    continue  # pruned: no requested key can live here
            size = os.path.getsize(sp)
            if size <= self.split_target:
                out.append(ShardPartition(sp, None))
            else:
                # record-range splits from the EOF offset table
                idx = codec.read_index(sp)
                if not idx.offsets:
                    continue
                n_splits = max(1, size // self.split_target)
                per = max(1, len(idx.offsets) // n_splits)
                for i in range(0, len(idx.offsets), per):
                    out.append(ShardPartition(sp, idx.offsets[i : i + per]))
        return out

    def read(self, partition: ShardPartition):
        """Yield Arrow RecordBatches (not rows): bulk columnar transfer to
        the JVM instead of per-row pickling — the difference between a
        Python-speed scan and an Arrow-speed scan on binary-heavy data."""
        import pyarrow as pa

        entry_type = pa.list_(
            pa.struct(
                [
                    pa.field("file_name", pa.string()),
                    pa.field("content_type", pa.string()),
                    pa.field("encoding", pa.string()),
                    pa.field("size", pa.int64()),
                    pa.field("data", pa.binary()),
                ]
            )
        )
        meta_type = pa.map_(pa.string(), pa.string())
        batch_keys: list[str] = []
        batch_meta: list[list[tuple[str, str]]] = []
        batch_entries: list[list[dict]] = []

        def flush():
            return pa.RecordBatch.from_arrays(
                [
                    pa.array(batch_keys, pa.string()),
                    pa.array(batch_meta, meta_type),
                    pa.array(batch_entries, entry_type),
                ],
                names=["key", "metadata", "entries"],
            )

        for rec in codec.iter_records(
            partition.path, verify_checksums=self.verify, offsets=partition.offsets
        ):
            batch_keys.append(rec.key)
            batch_meta.append(sorted((rec.metadata or {}).items()))
            batch_entries.append(
                [
                    {
                        "file_name": e.file_name,
                        "content_type": e.content_type,
                        "encoding": e.encoding,
                        "size": len(e.data),
                        "data": e.data,
                    }
                    for e in rec.entries
                ]
            )
            if len(batch_keys) >= 1024:
                yield flush()
                batch_keys, batch_meta, batch_entries = [], [], []
        if batch_keys:
            yield flush()


class ShardPackPruningReader(ShardPackReader):
    """Reader with key-equality filter pushdown for manifest-based shard
    pruning (the bucket-index access path, src/bucket.rs:147-169)."""

    def pushFilters(self, filters):  # noqa: N802 (Spark API name)
        """Record key-equality filters; all filters are returned so Spark
        re-applies them — pruning is a strict optimization, mirroring
        parquet partition pruning."""
        for f in filters:
            if isinstance(f, EqualTo) and tuple(f.attribute) == ("key",):
                self._key_filters.append(f.value)
        return filters


@dataclass
class ShardCommitMessage(WriterCommitMessage):
    shards: list[dict]


class ShardPackWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise codec.ShardPackIOError("shardpack writer requires a path")
        self.overwrite = overwrite
        self.compression = options.get("compression", "none")
        if self.compression not in codec._CODECS:
            raise codec.ShardPackCodecError(
                f"compression '{self.compression}' not available (have {sorted(codec._CODECS)})"
            )
        self.target = int(options.get("target_shard_bytes", codec.DEFAULT_TARGET_SHARD_BYTES))

    def write(self, iterator) -> ShardCommitMessage:
        """One task -> one sequence of shards named with a task-unique
        basename (no cross-task coordination needed at any scale)."""
        from pyspark import TaskContext

        tc = TaskContext.get()
        basename = f"part-{tc.partitionId():05d}-{uuid.uuid4().hex[:8]}"
        writer = codec.DatasetWriter(
            self.path, basename=basename, compression=self.compression, target_shard_bytes=self.target
        )
        stats: dict[str, dict] = {}
        for row in iterator:
            entries = [
                codec.FileEntry(
                    file_name=e["file_name"] or "",
                    content_type=e["content_type"] or "application/octet-stream",
                    data=bytes(e["data"]) if e["data"] is not None else b"",
                    encoding="none",
                )
                for e in (row["entries"] or [])
            ]
            rec = codec.Record(
                key=row["key"] or "", entries=entries, metadata=dict(row["metadata"] or {})
            )
            writer.write(rec)
            cur = writer._writer.path  # current shard for key-range stats
            s = stats.setdefault(os.path.basename(cur), {"min_key": rec.key, "max_key": rec.key})
            s["min_key"] = min(s["min_key"], rec.key)
            s["max_key"] = max(s["max_key"], rec.key)
        results = writer.close()
        shards = []
        for r in results:
            name = os.path.basename(r["path"])
            shards.append({"path": name, "records": r["records"], "bytes": r["bytes"], **stats.get(name, {})})
        return ShardCommitMessage(shards=shards)

    def commit(self, messages) -> None:
        all_shards = [s for m in messages if m is not None for s in m.shards]
        manifest = {
            "version": 1,
            "compression": self.compression,
            "target_shard_bytes": self.target,
            "shards": sorted(all_shards, key=lambda s: s["path"]),
            "total_records": sum(s["records"] for s in all_shards),
        }
        with open(os.path.join(self.path, MANIFEST_NAME), "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)

    def abort(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            for s in m.shards:
                p = os.path.join(self.path, s["path"])
                if os.path.exists(p):
                    os.remove(p)


class ShardPackStreamReader(SimpleDataSourceStreamReader):
    """Treat a shard directory as an append-only stream: each new shard
    file (sorted by name) is a batch of records.  The offset is the count
    of consumed shard files — shard naming is monotonic by construction
    (draft.md:24-30)."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise codec.ShardPackIOError("shardpack stream reader requires a path")
        self.verify = str(options.get("verify_checksums", "true")).lower() == "true"

    def initialOffset(self) -> dict:  # noqa: N802
        return {"n_files": 0}

    def read(self, start: dict):
        shards = codec.list_shards(self.path)
        n0 = start.get("n_files", 0)
        new = shards[n0:]
        end = {"n_files": len(shards)}

        # SimpleDataSourceStreamReader pickles the returned rows for
        # replay, so materialize (this API is the low-volume path; bulk
        # backfills should use the batch reader).
        rows = [
            _record_to_tuple(rec)
            for sp in new
            for rec in codec.iter_records(sp, verify_checksums=self.verify)
        ]
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        shards = codec.list_shards(self.path)
        segment = shards[start.get("n_files", 0) : end.get("n_files", 0)]
        for sp in segment:
            for rec in codec.iter_records(sp, verify_checksums=self.verify):
                yield _record_to_tuple(rec)


class ShardPackStreamWriter(DataSourceStreamWriter):
    """Streaming sink: each micro-batch's partitions append shards named
    batch-{batchId:08d}-part-{pid}-...; commit writes a per-batch marker so
    restarts can skip fully-committed batches (exactly-once at the batch
    level, matching the file-sink contract)."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        if not self.path:
            raise codec.ShardPackIOError("shardpack stream writer requires a path")
        self.compression = options.get("compression", "none")
        self.target = int(options.get("target_shard_bytes", codec.DEFAULT_TARGET_SHARD_BYTES))

    def write(self, iterator) -> ShardCommitMessage:
        from pyspark import TaskContext

        tc = TaskContext.get()
        basename = f"batch-part-{tc.partitionId():05d}-{uuid.uuid4().hex[:8]}"
        writer = codec.DatasetWriter(
            self.path, basename=basename, compression=self.compression, target_shard_bytes=self.target
        )
        for row in iterator:
            entries = [
                codec.FileEntry(
                    file_name=e["file_name"] or "",
                    content_type=e["content_type"] or "application/octet-stream",
                    data=bytes(e["data"]) if e["data"] is not None else b"",
                )
                for e in (row["entries"] or [])
            ]
            writer.write(
                codec.Record(key=row["key"] or "", entries=entries, metadata=dict(row["metadata"] or {}))
            )
        results = writer.close()
        return ShardCommitMessage(
            shards=[{"path": os.path.basename(r["path"]), "records": r["records"], "bytes": r["bytes"]} for r in results]
        )

    def commit(self, messages, batchId: int) -> None:  # noqa: N803 (Spark API)
        marker = os.path.join(self.path, f"_batch_{batchId:08d}.json")
        shards = [s for m in messages if m is not None for s in m.shards]
        with open(marker, "w") as f:
            json.dump({"batch": batchId, "shards": shards}, f)

    def abort(self, messages, batchId: int) -> None:  # noqa: N803
        for m in messages or []:
            if m is None:
                continue
            for s in m.shards:
                p = os.path.join(self.path, s["path"])
                if os.path.exists(p):
                    os.remove(p)


class ShardPackDataSource(DataSource):
    """format("shardpack") — register with spark.dataSource.register."""

    @classmethod
    def name(cls) -> str:
        return "shardpack"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> ShardPackReader:
        # reader() runs in a planning worker with no SparkSession, so the
        # pruning variant (which requires the filterPushdown conf) is
        # selected via an explicit option; read_shardpack() sets it
        # automatically driver-side.
        prune = str(self.options.get("prune_by_key", "false")).lower() == "true"
        cls = ShardPackPruningReader if prune else ShardPackReader
        return cls(self.options)

    def writer(self, schema: StructType, overwrite: bool) -> ShardPackWriter:
        if overwrite:
            path = self.options.get("path")
            if path and os.path.isdir(path):
                for p in codec.list_shards(path):
                    os.remove(p)
                mp = os.path.join(path, MANIFEST_NAME)
                if os.path.exists(mp):
                    os.remove(mp)
        return ShardPackWriter(self.options, overwrite)

    def simpleStreamReader(self, schema: StructType) -> ShardPackStreamReader:  # noqa: N802
        return ShardPackStreamReader(self.options)

    def streamWriter(self, schema: StructType, overwrite: bool) -> ShardPackStreamWriter:  # noqa: N802
        return ShardPackStreamWriter(self.options)


def _pickle_by_value() -> None:
    """Ship the format code inside the pickled plan.

    Spark serializes the DataSource class with cloudpickle; by default
    that is a by-reference pickle, which breaks when executor Python
    workers cannot import shardpack_spark (e.g. the driver added the repo
    to sys.path manually).  Registering the modules for by-value pickling
    makes every plan self-contained.
    """
    import sys

    from pyspark import cloudpickle

    from shardpack_spark.format import codec as codec_mod

    for mod in (codec_mod, sys.modules[__name__]):
        try:
            cloudpickle.register_pickle_by_value(mod)
        except Exception:
            pass


def register(spark) -> None:
    _pickle_by_value()
    spark.dataSource.register(ShardPackDataSource)


def compact_dataset(
    spark,
    path: str,
    target_shard_bytes: int = codec.DEFAULT_TARGET_SHARD_BYTES,
    compression: str | None = None,
) -> dict:
    """Maintenance job: rewrite a dataset's shards at the target size.

    This replaces the reference's destructive delete (Bucket::delete
    removed whole shards, destroying co-located keys — SURVEY.md D5):
    deletions/updates are expressed as filters on read, and compaction
    rewrites the surviving records into right-sized shards.  Runs as a
    normal distributed write; the swap is two renames at the end.
    """
    import shutil

    register(spark)
    manifest = _load_manifest(path) or {}
    comp = compression or manifest.get("compression", "none")
    tmp_out = path.rstrip("/") + ".compacting"
    if os.path.exists(tmp_out):
        shutil.rmtree(tmp_out)
    df = spark.read.format("shardpack").load(path)
    # size the write parallelism to the target: one task per output shard
    # (each task-local writer rolls independently, so without this the
    # output inherits one shard per input partition)
    total_bytes = sum(
        os.path.getsize(p) for p in codec.list_shards(path)
    )
    n_parts = max(1, -(-total_bytes // target_shard_bytes))
    (
        df.repartition(n_parts)
        .write.format("shardpack")
        .option("target_shard_bytes", target_shard_bytes)
        .option("compression", comp)
        .mode("append")
        .save(tmp_out)
    )
    backup = path.rstrip("/") + ".pre-compact"
    if os.path.exists(backup):
        shutil.rmtree(backup)
    os.rename(path, backup)
    os.rename(tmp_out, path)
    shutil.rmtree(backup)
    new_manifest = _load_manifest(path) or {}
    return {
        "shards": len(new_manifest.get("shards", [])),
        "records": new_manifest.get("total_records", 0),
    }


def read_shardpack(spark, path: str, **options):
    """Driver-side read helper: enables key-filter pruning automatically
    when spark.sql.python.filterPushdown.enabled is on."""
    register(spark)
    reader = spark.read.format("shardpack")
    if (
        "prune_by_key" not in options
        and spark.conf.get("spark.sql.python.filterPushdown.enabled", "false") == "true"
    ):
        options["prune_by_key"] = "true"
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)
