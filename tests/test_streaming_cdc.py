"""Streaming CDC upserts: a shardpack stream of change records applied to a
base dataset through foreachBatch -> write_patch, read back merge-on-read.

This is the composition a 100 TB ingest pipeline runs continuously: the
base corpus is immutable, change capture arrives as shards, and every
micro-batch commits one side-car patch — upserts and deletes become
visible to readers without ever rewriting (or shuffling) the base.
The stream checkpoint gives at-least-once batch delivery; a replayed
batch writes a byte-identical patch, and last-patch-wins merge makes
that a no-op on the merged STATE — effective exactly-once at the state
level, with write_patch's commit lock serializing concurrent sequence
assignment.
"""

from __future__ import annotations

import os

import pytest

pytestmark = pytest.mark.slow  # heavy family: deselect with -m 'not slow'

from pyspark.sql import functions as F

from shardpack_spark.format import codec
from shardpack_spark.format.datasource import register
from shardpack_spark.format.patches import (

    TOMBSTONE_KEY,
    list_patches,
    read_with_patches,
)


def _records(spark, kv: dict[str, str], tombstone: set[str] = frozenset()):
    register(spark)
    rows = [(k, v, k in tombstone) for k, v in kv.items()]
    return spark.createDataFrame(rows, "key string, v string, dead boolean").select(
        "key",
        F.when(
            F.col("dead"), F.create_map(F.lit(TOMBSTONE_KEY), F.lit("true"))
        )
        .otherwise(F.create_map(F.lit("ver"), F.col("v")))
        .alias("metadata"),
        F.array(
            F.struct(
                F.lit("body.txt").alias("file_name"),
                F.lit("text/plain").alias("content_type"),
                F.lit("none").alias("encoding"),
                F.length("v").cast("long").alias("size"),
                F.encode("v", "utf-8").alias("data"),
            )
        ).alias("entries"),
    )


def _cdc_shard(path: str, shard_id: int, kv: dict[str, str], dead: set[str] = frozenset()):
    w = codec.ShardWriter(os.path.join(path, codec.shard_name("cdc", shard_id)))
    for k, v in kv.items():
        meta = {TOMBSTONE_KEY: "true"} if k in dead else {"ver": v}
        w.write_record(
            codec.Record(
                key=k,
                metadata=meta,
                entries=[codec.FileEntry("body.txt", "text/plain", v.encode())],
            )
        )
    w.close()


def _state(df):
    return {
        r["key"]: bytes(r["entries"][0]["data"]).decode() for r in df.collect()
    }


def test_streamed_upserts_and_deletes_become_patches(spark, tmp_path):
    base = str(tmp_path / "base")
    src = str(tmp_path / "cdc")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    initial = {f"k{i:02d}": f"v0-{i}" for i in range(10)}
    _records(spark, initial).write.format("shardpack").mode("overwrite").save(base)

    def apply_batch(batch_df, batch_id):
        from shardpack_spark.format.patches import write_patch

        if batch_df.isEmpty():
            return
        write_patch(batch_df.select("key", "metadata", "entries"), base)

    def run_stream():
        q = (
            spark.readStream.format("shardpack")
            .load(src)
            .writeStream.foreachBatch(apply_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120), "stream did not finish in time"

    # wave 1: update k00-k02, delete k03
    _cdc_shard(src, 0, {"k00": "v1-0", "k01": "v1-1", "k02": "v1-2", "k03": ""}, dead={"k03"})
    run_stream()
    assert len(list_patches(base)) == 1

    got = _state(read_with_patches(spark, base))
    expect = dict(initial, k00="v1-0", k01="v1-1", k02="v1-2")
    del expect["k03"]
    assert got == expect

    # wave 2 (same checkpoint -> only NEW shards consumed): re-update k00,
    # resurrect k03, insert a brand-new key
    _cdc_shard(src, 1, {"k00": "v2-0", "k03": "v2-3", "k99": "v2-99"})
    run_stream()
    assert len(list_patches(base)) == 2

    got = _state(read_with_patches(spark, base))
    expect.update(k00="v2-0", k03="v2-3", k99="v2-99")
    assert got == expect

    # restart with the same checkpoint and no new data: no duplicate patch
    run_stream()
    assert len(list_patches(base)) == 2
