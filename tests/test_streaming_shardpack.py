"""Integration: shardpack directory as a streaming source feeding a
windowed aggregation — the full streaming-ingest path."""

from __future__ import annotations

import json
import os

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
    q.awaitTermination(120)
    rows = {r["b"]: (r["s"], r["n"]) for r in spark.sql("SELECT * FROM sp_win").collect()}
    assert rows == {1704070800: (3.0, 2), 1704074400: (5.0, 1)}
