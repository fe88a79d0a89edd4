"""Capstone: the format's whole lifecycle composes — write, append,
snapshot, delta, patch, merge-on-read, fsck, compact, point lookup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shardpack_spark.format.datasource import (
    compact_dataset,
    list_versions,
    read_shardpack,
    read_version_delta,
    register,
    verify_dataset,
)
from shardpack_spark.format.patches import (
    compact_patches,
    read_with_patches,
    tombstones,
    write_patch,
)
from tests.test_datasource import _docs_as_records


@pytest.mark.slow  # heavy (>=12 s); conclusive lane only
def test_full_lifecycle(spark, sf_dir, tmp_path):
    register(spark)
    base = str(tmp_path / "lake")
    src = _docs_as_records(spark, sf_dir)

    # 1. initial load + two appends (disjoint key ranges) -> three snapshots
    src.filter(F.col("key") < "doc/00000100").write.format("shardpack").mode(
        "append"
    ).save(base)
    src.filter(
        (F.col("key") >= "doc/00000100") & (F.col("key") < "doc/00000250")
    ).write.format("shardpack").mode("append").save(base)
    src.filter(
        (F.col("key") >= "doc/00000250") & (F.col("key") < "doc/00000280")
    ).write.format("shardpack").mode("append").save(base)
    assert [v["total_records"] for v in list_versions(base)] == [100, 250, 280]

    # 2. incremental consumer: per-version deltas partition the live view
    d1 = read_version_delta(spark, base, 0, 1).count()
    d2 = read_version_delta(spark, base, 1, 2).count()
    d3 = read_version_delta(spark, base, 2, 3).count()
    assert (d1, d2, d3) == (100, 150, 30)
    assert d1 + d2 + d3 == read_shardpack(spark, base).count()

    # 3. merge-on-read mutation: delete two keys, update one
    write_patch(
        tombstones(spark, ["doc/00000001", "doc/00000002"]).unionByName(
            src.filter(F.col("key") == "doc/00000000").withColumn(
                "metadata", F.map_concat("metadata", F.create_map(F.lit("v"), F.lit("2")))
            )
        ),
        base,
    )
    merged = read_with_patches(spark, base)
    assert merged.count() == 278
    assert (
        merged.filter(F.col("key") == "doc/00000000").head()["metadata"]["v"] == "2"
    )

    # 4. fsck: log and files agree before and after folding
    assert verify_dataset(spark, base)["ok"]
    compact_patches(spark, base)
    assert read_shardpack(spark, base).count() == 278
    assert verify_dataset(spark, base)["ok"]

    # 5. key-sorted compaction -> point lookup prunes to one partition
    compact_dataset(spark, base, target_shard_bytes=64 * 1024, sort_by_key=True)
    assert verify_dataset(spark, base)["ok"]
    one = read_shardpack(spark, base).filter(F.col("key") == "doc/00000050")
    assert one.count() == 1
    assert one.rdd.getNumPartitions() == 1

    # 6. history resets at the compaction (an overwrite commit)
    vs = list_versions(base)
    assert len(vs) == 1 and vs[0]["total_records"] == 278


@pytest.mark.slow  # heavy (>=12 s); conclusive lane only
def test_publish_checked_write_audit_publish(spark, tmp_path, sp_rows):
    """publish_checked: good batches land, bad batches vanish atomically
    (metadata-only rollback), on local AND object-store backends."""
    from shardpack_spark.format.datasource import (
        list_versions,
        publish_checked,
        read_shardpack,
    )
    from shardpack_spark.operators.expectations import not_null, unique

    rules = [not_null("key"), unique("key")]
    for scheme in ["", "sim://"]:
        path = scheme + str(tmp_path / f"wap{bool(scheme)}")

        # batch 1: clean -> published
        out = publish_checked(
            sp_rows(spark, [("a", {}, b"1"), ("b", {}, b"2")]), path, rules
        )
        assert out["published"] and out["version"] == 1
        assert read_shardpack(spark, path).count() == 2

        # batch 2: duplicate keys -> rolled back, table unchanged
        out = publish_checked(
            sp_rows(spark, [("c", {}, b"3"), ("c", {}, b"4")]), path, rules
        )
        assert not out["published"]
        assert out["version"] == 1
        assert not out["check"]["passed"]
        assert read_shardpack(spark, path).count() == 2
        assert [v["version"] for v in list_versions(path)] == [1]

        # batch 3: custom audit callable fails -> rolled back
        out = publish_checked(
            sp_rows(spark, [("d", {}, b"5")]), path, rules,
            audit=lambda delta: delta.count() >= 100,
        )
        assert not out["published"]
        assert read_shardpack(spark, path).count() == 2

        # batch 4: clean again -> version advances over the undone ones
        out = publish_checked(sp_rows(spark, [("e", {}, b"6")]), path, rules)
        assert out["published"]
        assert sorted(
            r["key"] for r in read_shardpack(spark, path).select("key").collect()
        ) == ["a", "b", "e"]


def test_publish_checked_first_commit_failure_resets_to_empty(spark, tmp_path, sp_rows):
    from shardpack_spark.format.datasource import (
        _load_manifest,
        publish_checked,
        read_shardpack,
    )
    from shardpack_spark.operators.expectations import unique

    path = str(tmp_path / "wap0")
    out = publish_checked(
        sp_rows(spark, [("x", {}, b"1"), ("x", {}, b"2")]),
        path,
        [unique("key")],
    )
    assert not out["published"] and out["version"] == 0
    assert _load_manifest(path) is None  # back to the empty state
    # and a subsequent clean publish starts fresh at version 1
    out = publish_checked(sp_rows(spark, [("y", {}, b"3")]), path, [])
    assert out["published"] and out["version"] == 1
    assert read_shardpack(spark, path).count() == 1


def test_time_travel_by_timestamp(spark, tmp_path, sp_rows):
    """VERDICT r3 item 7: version_at(ts) + the timestamp_as_of reader
    option resolve an instant to the snapshot that was current then."""
    import time

    from shardpack_spark.format.datasource import (
        list_versions,
        read_shardpack,
        register,
        version_at,
    )
    from shardpack_spark.format.reader import open_dataset

    register(spark)
    base = str(tmp_path / "ttts")
    sp_rows(spark, [(f"a/{i}", {}, b"x") for i in range(5)]).write.format(
        "shardpack"
    ).mode("overwrite").save(base)
    time.sleep(0.05)
    between = time.time()
    time.sleep(0.05)
    sp_rows(spark, [(f"b/{i}", {}, b"y") for i in range(3)]).write.format(
        "shardpack"
    ).mode("append").save(base)

    assert version_at(base, between) == 1
    assert version_at(base, time.time()) == 2
    vs = list_versions(base)
    assert [v["version"] for v in vs] == [1, 2]
    assert all(isinstance(v["committed_at"], float) for v in vs)
    assert vs[0]["committed_at"] <= between <= vs[1]["committed_at"]

    # ISO-8601 resolution (UTC) and the too-early error
    import datetime as dt

    iso = dt.datetime.fromtimestamp(between, dt.timezone.utc).isoformat()
    assert version_at(base, iso) == 1
    with pytest.raises(Exception, match="at or before"):
        version_at(base, between - 3600)

    # Spark reader option
    got = read_shardpack(spark, base, timestamp_as_of=str(between)).count()
    assert got == 5
    assert read_shardpack(spark, base).count() == 8
    # explicit version wins over timestamp
    assert (
        read_shardpack(spark, base, version="2", timestamp_as_of=str(between)).count()
        == 8
    )

    # Spark-free facade
    assert len(open_dataset(base, timestamp=between)) == 5
    assert len(open_dataset(base, timestamp=iso)) == 5
    assert len(open_dataset(base)) == 8
