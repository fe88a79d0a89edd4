"""rollback(): metadata-only undo of commits, and the write-audit-publish
workflow it enables (append -> audit the delta -> rollback on failure)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row

from shardpack_spark.format import codec
from shardpack_spark.format.datasource import (
    list_versions,
    read_version_delta,
    register,
    rollback,
    vacuum,
)
from tests.test_vacuum import _append


def _keys(spark, out):
    return sorted(r["key"] for r in spark.read.format("shardpack").load(out).collect())


@pytest.mark.slow  # heavy (>=12 s); conclusive lane only
def test_rollback_restores_snapshot_and_chain_continues(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "ds")
    for lo in (0, 10, 20):
        _append(spark, out, lo, lo + 10)
    v2_keys = sorted(f"k{i:06d}" for i in range(20))

    rep = rollback(out, 2)
    assert rep["restored_version"] == 2
    assert rep["dropped_versions"] == [3]
    assert rep["total_records"] == 20
    assert _keys(spark, out) == v2_keys
    assert [v["version"] for v in list_versions(out)] == [1, 2]

    # the next commit continues the chain at version 3 (ids are reused)
    _append(spark, out, 100, 105)
    assert [v["version"] for v in list_versions(out)] == [1, 2, 3]
    assert len(_keys(spark, out)) == 25
    # rollback to the current tip is a no-op
    assert rollback(out, 3)["dropped_versions"] == []


def test_write_audit_publish_workflow(spark, tmp_path):
    """Append a bad batch, audit the DELTA with expectations, undo it."""
    from shardpack_spark.operators.expectations import check, satisfies

    register(spark)
    out = str(tmp_path / "ds")
    _append(spark, out, 0, 20)
    good = _keys(spark, out)
    pre_version = list_versions(out)[-1]["version"]

    # bad ingest: keys violate the contract (empty metadata marker)
    bad = spark.createDataFrame(
        [Row(key="BAD-UPPER", metadata={}, entries=[
            Row(file_name="t", content_type="text/plain", encoding="none",
                size=1, data=b"x")
        ])],
        spark.read.format("shardpack").load(out).drop("_shard").schema,
    )
    bad.write.format("shardpack").mode("append").save(out)

    delta = read_version_delta(spark, out, since_version=pre_version)
    audit = check(delta, [satisfies("key RLIKE '^k[0-9]{6}$'", name="key_shape")])
    assert audit["passed"] is False

    rollback(out, pre_version)
    assert _keys(spark, out) == good
    # the undone batch's shards are unreferenced now -> vacuum reclaims
    rep = vacuum(out, grace_seconds=0)
    assert rep["deleted_shards"], "rolled-back shards should be reclaimed"
    assert _keys(spark, out) == good


def test_fold_is_a_snapshot_rollback_keeps_folded_stream_data(spark, tmp_path):
    """fold_stream_markers archives a root like any commit, so a later
    rollback never drops folded streamed records."""
    import json

    from shardpack_spark.format.datasource import fold_stream_markers

    register(spark)
    out = str(tmp_path / "ds")
    _append(spark, out, 0, 5)  # v1
    # two committed micro-batches (marker-only visibility)
    for batch in (7, 8):
        w = codec.DatasetWriter(out, basename=f"c{batch:08d}-part-00000-abcd{batch:04d}")
        w.write(codec.Record(key=f"stream{batch}", entries=[
            codec.FileEntry("t", "text/plain", b"s")
        ]))
        name = os.path.basename(w.close()[0]["path"])
        with open(os.path.join(out, f"_batch_{batch:08d}.json"), "w") as f:
            json.dump({"batch": batch, "shards": [{"path": name, "records": 1}]}, f)

    rep = fold_stream_markers(out, keep_last=1)  # folds batch 7 -> v2
    assert rep["folded"] == 1 and rep["version"] == 2
    assert [v["version"] for v in list_versions(out)] == [1, 2]

    _append(spark, out, 100, 103)  # v3
    rollback(out, 2)
    keys = _keys(spark, out)
    assert "stream7" in keys  # folded entry survives the rollback
    assert "stream8" in keys  # unfolded marker batch still visible too
    assert not any(k.startswith("k0001") for k in keys)  # v3 undone


def test_rollback_unknown_version_raises(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "ds")
    _append(spark, out, 0, 5)
    with pytest.raises(codec.ShardPackIOError):
        rollback(out, 99)
