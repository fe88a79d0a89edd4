"""Integration: shardpack directory as a streaming source feeding a
windowed aggregation — the full streaming-ingest path."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from shardpack_spark.format import codec
from shardpack_spark.format.datasource import register


def _event_shard(path: str, shard_id: int, events: list[tuple[str, str, float]]) -> None:
    w = codec.ShardWriter(os.path.join(path, codec.shard_name("ev", shard_id)))
    for key, ts, value in events:
        w.write_record(
            codec.Record(
                key=key,
                entries=[
                    codec.FileEntry(
                        "event.json",
                        "application/json",
                        json.dumps({"ts": ts, "value": value}).encode(),
                    )
                ],
            )
        )
    w.close()


def test_shardpack_stream_windowed_agg(spark, tmp_path):
    register(spark)
    src = str(tmp_path / "src")
    os.makedirs(src)
    _event_shard(src, 0, [("e1", "2024-01-01 01:05:00", 1.0), ("e2", "2024-01-01 01:20:00", 2.0)])
    _event_shard(src, 1, [("e3", "2024-01-01 02:10:00", 5.0)])

    stream = spark.readStream.format("shardpack").load(src)
    parsed = (
        stream.select(
            F.from_json(
                F.decode(F.element_at("entries", 1)["data"], "utf-8"),
                "ts timestamp, value double",
            ).alias("j")
        )
        .select("j.ts", "j.value")
        .withWatermark("ts", "1 day")
    )
    agg = parsed.groupBy(F.window("ts", "1 hour").alias("w")).agg(
        F.sum("value").alias("s"), F.count(F.lit(1)).alias("n")
    )
    q = (
        agg.select(F.col("w.start").cast("long").alias("b"), "s", "n")
        .writeStream.format("memory")
        .queryName("sp_win")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"
    rows = {r["b"]: (r["s"], r["n"]) for r in spark.sql("SELECT * FROM sp_win").collect()}
    assert rows == {1704070800: (3.0, 2), 1704074400: (5.0, 1)}


def test_fold_stream_markers(spark, tmp_path):
    """Marker folding keeps every record visible, trims the marker count,
    and leaves the replay-detection tail in place."""
    import glob as _glob
    import json as _json

    from shardpack_spark.format import codec as _codec
    from shardpack_spark.format.datasource import (
        _load_manifest,
        fold_stream_markers,
        read_shardpack,
    )

    out = str(tmp_path / "sink")
    os.makedirs(out)
    # simulate 8 committed micro-batches (marker + shard each)
    for b in range(8):
        name = f"c{b:08d}-s.shardpack"
        w = _codec.ShardWriter(os.path.join(out, name))
        w.write_record(_codec.Record(key=f"k{b}", entries=[
            _codec.FileEntry("a.txt", "text/plain", f"v{b}".encode())
        ]))
        w.close()
        with open(os.path.join(out, f"_batch_{b:08d}.json"), "w") as f:
            _json.dump({"batch": b, "shards": [
                {"path": name, "records": 1, "bytes": 100}
            ]}, f)

    assert read_shardpack(spark, out).count() == 8
    stats = fold_stream_markers(out, keep_last=3)
    assert stats == {"folded": 5, "shards": 5, "version": 1}
    # 3 newest markers remain for replay detection
    assert len(_glob.glob(os.path.join(out, "_batch_*.json"))) == 3
    m = _load_manifest(out)
    assert m["total_records"] == 5  # folded shards in the manifest log
    # every record still visible: manifest entries + remaining markers
    assert read_shardpack(spark, out).count() == 8
    # idempotent when nothing left to fold
    assert fold_stream_markers(out, keep_last=3) == {"folded": 0}


def test_stream_committed_shards_carry_pruning_stats(spark, tmp_path):
    """Shards written through the streaming sink carry the same manifest
    stats as batch writes, and survive marker folding."""
    import glob as _glob
    import json as _json

    from shardpack_spark.format.datasource import (
        _load_manifest,
        fold_stream_markers,
        register,
    )

    register(spark)
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    _event_shard(src, 0, [(f"k{i}", "2025-01-01T00:00:00", 1.0) for i in range(5)])

    assert (
        spark.readStream.format("shardpack")
        .load(src)
        .writeStream.format("shardpack")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(60)
    ), "stream did not finish in time"

    markers = _glob.glob(os.path.join(sink, "_batch_*.json"))
    assert markers
    marked = [s for m in markers for s in _json.load(open(m))["shards"]]
    assert all("min_key" in s and "bloom" in s for s in marked)

    # keep_last=0 would delete the newest batch's replay-detection marker
    # (a replayed batch would then double-commit) — rejected outright
    with pytest.raises(ValueError, match="keep_last"):
        fold_stream_markers(sink, keep_last=0)

    # write a second batch so folding with keep_last=1 folds batch 0's
    # marker while batch 1's stays as the replay guard
    _event_shard(src, 1, [(f"j{i}", "2025-01-02T00:00:00", 2.0) for i in range(3)])
    assert (
        spark.readStream.format("shardpack")
        .load(src)
        .writeStream.format("shardpack")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
        .awaitTermination(60)
    ), "stream did not finish in time"
    fold_stream_markers(sink, keep_last=1)
    m = _load_manifest(sink)
    assert all("min_key" in s and "bloom" in s for s in m["shards"])
    assert len(_glob.glob(os.path.join(sink, "_batch_*.json"))) == 1
