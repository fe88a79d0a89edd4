"""vacuum(): storage reclamation for the shardpack lakehouse layer.

Covers the retention contract: expired snapshot roots die, retained
time travel keeps working, unreferenced shard files (crashed tasks,
crashed overwrite deletions) are reclaimed only past the grace window,
and ad-hoc directories without a commit log are never touched.
"""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import Row

from shardpack_spark.format import codec
from shardpack_spark.format.datasource import (
    _load_manifest,
    list_versions,
    register,
    vacuum,
    verify_dataset,
)


def _records_df(spark, lo: int, hi: int):
    rows = [
        Row(
            key=f"k{i:06d}",
            metadata={"i": str(i)},
            entries=[
                Row(
                    file_name="t.txt",
                    content_type="text/plain",
                    encoding="none",
                    size=8,
                    data=f"payload{i % 10}".encode(),
                )
            ],
        )
        for i in range(lo, hi)
    ]
    return spark.createDataFrame(
        rows,
        "key string, metadata map<string,string>, "
        "entries array<struct<file_name:string,content_type:string,"
        "encoding:string,size:bigint,data:binary>>",
    )


def _append(spark, out: str, lo: int, hi: int) -> None:
    _records_df(spark, lo, hi).coalesce(1).write.format("shardpack").mode(
        "append"
    ).save(out)


def _age(path: str, seconds: float = 7200.0) -> None:
    t = time.time() - seconds
    os.utime(path, (t, t))


@pytest.mark.slow  # heavy (>=12 s); conclusive lane only
def test_vacuum_expires_versions_keeps_all_data(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "ds")
    for lo in (0, 10, 20):
        _append(spark, out, lo, lo + 10)
    assert [v["version"] for v in list_versions(out)] == [1, 2, 3]
    before = sorted(
        r["key"] for r in spark.read.format("shardpack").load(out).collect()
    )

    rep = vacuum(out, keep_versions=2, grace_seconds=0)
    assert rep["expired_versions"] == [1]
    assert rep["retained_versions"] == [2, 3]
    # append-only chain: every shard is still referenced by the live root
    assert rep["deleted_shards"] == []
    assert [v["version"] for v in list_versions(out)] == [2, 3]
    with pytest.raises(codec.ShardPackIOError):
        _load_manifest(out, 1)
    assert _load_manifest(out, 2) is not None  # retained snapshot replays
    after = sorted(
        r["key"] for r in spark.read.format("shardpack").load(out).collect()
    )
    assert after == before


def test_vacuum_reclaims_aged_orphan_shard_not_fresh_one(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "ds")
    _append(spark, out, 0, 20)

    # a crashed task's shard: commit-style name, never named by any commit
    def orphan(basename: str) -> str:
        w = codec.DatasetWriter(out, basename=basename)
        w.write(codec.Record(key="orphan", entries=[
            codec.FileEntry("t.txt", "text/plain", b"dead")
        ]))
        return w.close()[0]["path"]

    old = orphan("c00000099-part-00000-deadbeef")
    fresh = orphan("c00000099-part-00001-cafebabe")
    _age(old)
    assert sorted(verify_dataset(spark, out)["orphans"]) == sorted(
        [os.path.basename(old), os.path.basename(fresh)]
    )

    rep = vacuum(out, grace_seconds=3600)
    assert rep["deleted_shards"] == [os.path.basename(old)]
    assert not os.path.exists(old)
    assert os.path.exists(fresh)  # inside the grace window -> protected
    assert rep["bytes_reclaimed"] > 0
    # committed data untouched
    assert spark.read.format("shardpack").load(out).count() == 20


def test_vacuum_dry_run_deletes_nothing(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "ds")
    for lo in (0, 10):
        _append(spark, out, lo, lo + 10)
    w = codec.DatasetWriter(out, basename="c00000099-part-00000-feedf00d")
    w.write(codec.Record(key="o", entries=[codec.FileEntry("t", "text/plain", b"x")]))
    orphan_path = w.close()[0]["path"]
    _age(orphan_path)

    rep = vacuum(out, keep_versions=1, grace_seconds=0, dry_run=True)
    assert rep["dry_run"] is True
    assert rep["expired_versions"] == [1]
    assert rep["deleted_shards"] == [os.path.basename(orphan_path)]
    # ... but everything is still on disk
    assert os.path.exists(orphan_path)
    assert [v["version"] for v in list_versions(out)] == [1, 2]


def test_vacuum_reclaims_crash_debris(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "ds")
    _append(spark, out, 0, 5)
    debris = [
        os.path.join(out, "data-000000.shardpack.trash-ab12cd34"),
        os.path.join(out, "half-written.shardpack.inprogress"),
        os.path.join(out, "_shardpack_manifest.json.tmp-dead0000"),
    ]
    for p in debris:
        with open(p, "wb") as f:
            f.write(b"junk")
        _age(p)
    stale_task = os.path.join(out, "_staging", "task-00003-deadbeef")
    os.makedirs(stale_task)
    with open(os.path.join(stale_task, "part-000000.shardpack"), "wb") as f:
        f.write(b"junk")
    _age(os.path.join(stale_task, "part-000000.shardpack"))
    _age(stale_task)

    rep = vacuum(out, grace_seconds=3600)
    for p in debris:
        assert not os.path.exists(p), p
    assert not os.path.exists(stale_task)
    assert len(rep["deleted_debris"]) == 4
    assert spark.read.format("shardpack").load(out).count() == 5


def test_vacuum_keep_more_versions_than_exist(spark, tmp_path):
    register(spark)
    out = str(tmp_path / "ds")
    _append(spark, out, 0, 5)
    rep = vacuum(out, keep_versions=10, grace_seconds=0)
    assert rep["expired_versions"] == []
    assert rep["retained_versions"] == [1]
    assert spark.read.format("shardpack").load(out).count() == 5
    with pytest.raises(ValueError, match="keep_versions"):
        vacuum(out, keep_versions=0)


def test_vacuum_untouched_without_manifest(tmp_path):
    out = str(tmp_path / "adhoc")
    w = codec.DatasetWriter(out, basename="adhoc")
    for i in range(3):
        w.write(codec.Record(key=f"k{i}", entries=[
            codec.FileEntry("t.txt", "text/plain", b"data")
        ]))
    w.close()
    before = sorted(os.listdir(out))

    rep = vacuum(out, keep_versions=1, grace_seconds=0)
    assert rep["deleted_shards"] == []
    assert sorted(os.listdir(out)) == before


def test_vacuum_protects_stream_marker_shards(spark, tmp_path):
    """Shards named only by a _batch_*.json marker (not yet folded into
    the manifest) are committed data — vacuum must keep them."""
    register(spark)
    out = str(tmp_path / "ds")
    _append(spark, out, 0, 5)
    # simulate a committed micro-batch: shard + marker, no manifest entry
    w = codec.DatasetWriter(out, basename="c00000042-part-00000-12345678")
    w.write(codec.Record(key="stream0", entries=[
        codec.FileEntry("t.txt", "text/plain", b"streamed")
    ]))
    name = os.path.basename(w.close()[0]["path"])
    _age(os.path.join(out, name))
    with open(os.path.join(out, "_batch_00000042.json"), "w") as f:
        json.dump({"batch": 42, "shards": [{"path": name, "records": 1}]}, f)

    rep = vacuum(out, grace_seconds=0)
    assert rep["deleted_shards"] == []
    assert os.path.exists(os.path.join(out, name))
    assert spark.read.format("shardpack").load(out).count() == 6
