"""Merge-on-read side-car patches (draft.md:209-211): upsert, tombstone,
last-patch-wins, idempotent compaction."""

import pytest

import os

from pyspark.sql import functions as F

from shardpack_spark.format.patches import (
    compact_patches,
    list_patches,
    read_with_patches,
    tombstones,
    write_patch,
)


def _records(spark, ids, payload_prefix="v1"):
    from shardpack_spark.format.datasource import register

    register(spark)
    return spark.createDataFrame([(i,) for i in ids], "id int").select(
        F.concat(F.lit("k/"), F.lpad(F.col("id").cast("string"), 4, "0")).alias(
            "key"
        ),
        F.create_map(F.lit("ver"), F.lit(payload_prefix)).alias("metadata"),
        F.array(
            F.struct(
                F.lit("body.txt").alias("file_name"),
                F.lit("text/plain").alias("content_type"),
                F.lit("none").alias("encoding"),
                F.lit(2).cast("long").alias("size"),
                F.encode(
                    F.concat(F.lit(payload_prefix), F.col("id").cast("string")),
                    "utf-8",
                ).alias("data"),
            )
        ).alias("entries"),
    )


def _state(df):
    return {
        r["key"]: (dict(r["metadata"]), bytes(r["entries"][0]["data"]))
        for r in df.collect()
    }


def test_upsert_tombstone_last_patch_wins(spark, tmp_path):
    base = str(tmp_path / "ds")
    _records(spark, range(20), "v1").write.format("shardpack").mode(
        "overwrite"
    ).save(base)

    # patch 1: update keys 0-4 to v2; patch 2: delete 3, update 4 to v3
    write_patch(_records(spark, range(5), "v2"), base)
    write_patch(
        tombstones(spark, ["k/0003"]).unionByName(_records(spark, [4], "v3")),
        base,
    )
    assert list_patches(base) == ["p00000001", "p00000002"]

    got = _state(read_with_patches(spark, base))
    assert len(got) == 19  # one tombstoned
    assert "k/0003" not in got
    assert got["k/0004"][0]["ver"] == "v3"  # latest patch wins
    for i in (0, 1, 2):
        assert got[f"k/{i:04d}"][0]["ver"] == "v2"
    assert got["k/0010"][0]["ver"] == "v1"  # untouched keys from base

    expected = got
    stats = compact_patches(spark, base)
    assert stats == {"patches_folded": 2, "records": 19}
    assert list_patches(base) == []
    assert _state(read_with_patches(spark, base)) == expected


@pytest.mark.slow  # heavy (>=12 s); conclusive lane only
def test_patch_reapplication_is_idempotent(spark, tmp_path):
    """A crash between compaction commit and patch cleanup leaves patches
    behind; re-reading (and re-compacting) must not change the data."""
    base = str(tmp_path / "ds2")
    _records(spark, range(10), "v1").write.format("shardpack").mode(
        "overwrite"
    ).save(base)
    write_patch(_records(spark, [1, 2], "v2"), base)
    write_patch(tombstones(spark, ["k/0005"]), base)

    merged_before = _state(read_with_patches(spark, base))

    # simulate the crash: fold into base but keep the patch dirs
    import shutil

    pr = str(tmp_path / "saved_patches")
    shutil.copytree(os.path.join(base, "_patches"), pr)
    compact_patches(spark, base)
    shutil.copytree(pr, os.path.join(base, "_patches"))

    # leftover patches re-apply as a no-op
    assert _state(read_with_patches(spark, base)) == merged_before
    stats = compact_patches(spark, base)
    assert stats["records"] == 9
    assert _state(read_with_patches(spark, base)) == merged_before


def test_duplicate_keys_within_patch_collapse_deterministically(spark, tmp_path):
    base = str(tmp_path / "ds3")
    _records(spark, range(3), "v1").write.format("shardpack").mode(
        "overwrite"
    ).save(base)
    dup = _records(spark, [1], "a").unionByName(_records(spark, [1], "b"))
    write_patch(dup, base)
    one = read_with_patches(spark, base).filter(F.col("key") == "k/0001")
    rows = one.collect()
    assert len(rows) == 1
    first = bytes(rows[0]["entries"][0]["data"])
    # same input again -> same survivor (deterministic collapse)
    base2 = str(tmp_path / "ds3b")
    _records(spark, range(3), "v1").write.format("shardpack").mode(
        "overwrite"
    ).save(base2)
    write_patch(dup, base2)
    rows2 = read_with_patches(spark, base2).filter(
        F.col("key") == "k/0001"
    ).collect()
    assert bytes(rows2[0]["entries"][0]["data"]) == first


def test_empty_dataset_after_full_tombstone_compaction(spark, tmp_path):
    """Tombstoning every key and compacting leaves a valid EMPTY dataset,
    not one whose reads raise."""
    from shardpack_spark.format.datasource import read_shardpack

    base = str(tmp_path / "empty")
    _records(spark, range(4), "v1").write.format("shardpack").mode(
        "overwrite"
    ).save(base)
    write_patch(tombstones(spark, [f"k/{i:04d}" for i in range(4)]), base)
    assert read_with_patches(spark, base).count() == 0
    compact_patches(spark, base)
    assert read_shardpack(spark, base).count() == 0
    assert read_with_patches(spark, base).count() == 0


def test_read_with_patches_rejects_columns_projection(spark, tmp_path):
    import pytest

    base = str(tmp_path / "proj")
    _records(spark, range(3), "v1").write.format("shardpack").mode(
        "overwrite"
    ).save(base)
    write_patch(_records(spark, [0], "v2"), base)
    with pytest.raises(ValueError, match="columns"):
        read_with_patches(spark, base, columns=["key", "metadata"])


@pytest.mark.slow  # heavy (>=12 s); conclusive lane only
def test_delete_where_predicate_tombstones(spark, tmp_path):
    """Predicate deletes judge rows in their patch-merged CURRENT state
    and compose with later compaction."""
    from shardpack_spark.format.patches import delete_where

    base = str(tmp_path / "dw")
    _records(spark, range(10), "v1").write.format("shardpack").mode(
        "overwrite"
    ).save(base)
    # rewrite key 2 to v2 first; then delete all v1 rows with index < 4
    write_patch(_records(spark, [2], "v2"), base)
    delete_where(
        spark,
        base,
        "metadata['ver'] = 'v1' AND key < 'k/0004'",
    )
    got = _state(read_with_patches(spark, base))
    # 0,1,3 deleted (v1, index<4); 2 survived because it is CURRENTLY v2
    assert {k for k in got} == {"k/0002"} | {f"k/{i:04d}" for i in range(4, 10)}
    assert got["k/0002"][0]["ver"] == "v2"
    # idempotent: re-running matches nothing new
    delete_where(spark, base, "metadata['ver'] = 'v1' AND key < 'k/0004'")
    assert _state(read_with_patches(spark, base)) == got


@pytest.mark.slow  # heavy (>=12 s); conclusive lane only
def test_update_where_metadata_overlay(spark, tmp_path):
    """Predicate updates overlay metadata (right-wins), keep entries, and
    compose across chained updates."""
    from shardpack_spark.format.patches import delete_where, update_where

    base = str(tmp_path / "uw")
    _records(spark, range(6), "v1").write.format("shardpack").mode(
        "overwrite"
    ).save(base)
    update_where(spark, base, "key < 'k/0003'", {"ver": "v2", "flag": "hot"})
    got = _state(read_with_patches(spark, base))
    assert got["k/0000"][0]["ver"] == "v2" and got["k/0000"][0]["flag"] == "hot"
    assert got["k/0004"][0]["ver"] == "v1" and "flag" not in got["k/0004"][0]
    # entries survive the metadata rewrite
    rows = {
        r["key"]: r
        for r in read_with_patches(spark, base).collect()
    }
    assert len(rows["k/0001"]["entries"]) == len(rows["k/0004"]["entries"])
    # chained: second update sees v2 state; delete composes after
    update_where(spark, base, "metadata['flag'] = 'hot'", {"tier": "a"})
    delete_where(spark, base, "metadata['tier'] = 'a' AND key = 'k/0002'")
    got2 = _state(read_with_patches(spark, base))
    assert "k/0002" not in got2
    assert got2["k/0001"][0]["tier"] == "a"


@pytest.mark.slow  # heavy (>=12 s); conclusive lane only
def test_update_where_overlay_matches_dict_model(spark, tmp_path):
    """Hypothesis: the metadata overlay must equal Python's
    {**old, **set_meta} for random metadata maps and overlay dicts."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from shardpack_spark.format.patches import update_where

    keys_st = st.text(alphabet="abcdexyz_", min_size=1, max_size=6)
    meta_st = st.dictionaries(keys_st, st.text(max_size=8), max_size=4)
    # overlay keys from a TINY alphabet: each distinct overlay dict costs
    # one Spark patch-commit job, so bound the distinct-group count while
    # old-metadata maps stay fully random
    overlay_st = st.dictionaries(
        st.sampled_from(["a", "b", "x_"]), st.sampled_from(["", "v1", "v2"]),
        min_size=1, max_size=2,
    )
    samples: list[tuple[dict, dict]] = []

    @settings(
        max_examples=40,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(meta_st, overlay_st)
    def collect(old, overlay):
        samples.append((old, overlay))

    collect()
    # one dataset, one update per distinct overlay group: batch overlays
    # with identical SET dicts to keep the Spark-job count bounded
    from collections import defaultdict

    by_overlay = defaultdict(list)
    for i, (old, overlay) in enumerate(samples):
        by_overlay[tuple(sorted(overlay.items()))].append((i, old))
    base = str(tmp_path / "fuzz")
    rows = [
        (f"k{i:04d}", old, [])
        for group in by_overlay.values()
        for i, old in group
    ]
    from shardpack_spark.format.datasource import register as _register

    _register(spark)
    spark.createDataFrame(
        rows,
        "key string, metadata map<string,string>, "
        "entries array<struct<file_name:string,content_type:string,encoding:string,size:bigint,data:binary>>",
    ).write.format("shardpack").mode("overwrite").save(base)
    for overlay_items, group in by_overlay.items():
        overlay = dict(overlay_items)
        ids = [f"k{i:04d}" for i, _ in group]
        update_where(
            spark, base, F.col("key").isin(ids), {k: v for k, v in overlay.items()}
        )
    got = {
        r["key"]: dict(r["metadata"])
        for r in read_with_patches(spark, base).collect()
    }
    for overlay_items, group in by_overlay.items():
        overlay = dict(overlay_items)
        for i, old in group:
            want = {**{k: str(v) for k, v in old.items()}, **{k: str(v) for k, v in overlay.items()}}
            assert got[f"k{i:04d}"] == want, (i, old, overlay, got[f"k{i:04d}"])



def test_compact_cleanup_unlists_before_deleting(spark, tmp_path):
    """compact_patches must atomically UNLIST a patch before deleting its
    data: a crash mid-remove_tree must never leave a listed patch with
    half-deleted data (merged reads would error instead of no-op).
    Observable invariants: after compaction nothing is listed, no .ptr
    dangles, and a leftover .gone-* unlist marker is swept by the next
    write_patch's GC."""
    import time as _t

    from shardpack_spark.format import storage
    from shardpack_spark.format.patches import PATCH_DIR, patch_path

    base = str(tmp_path / "ds")
    _records(spark, range(12), "v1").write.format("shardpack").mode(
        "overwrite"
    ).save(base)
    write_patch(_records(spark, range(3), "v2"), base)
    write_patch(tombstones(spark, ["k/0005"]), base)
    assert len(list_patches(base)) == 2
    res = compact_patches(spark, base)
    assert res["patches_folded"] == 2
    assert list_patches(base) == []
    root = os.path.join(base, PATCH_DIR)
    be = storage.for_path(base)
    assert [d for d in be.listdir(root) if d.endswith(".ptr")] == []

    # a crashed cleanup's .gone-* marker dir is stale by definition and
    # must be GC'd by the next patch commit (backdated past the grace)
    os.makedirs(os.path.join(root, ".gone-deadbeef"), exist_ok=True)
    old = _t.time() - 7200
    os.utime(os.path.join(root, ".gone-deadbeef"), (old, old))
    write_patch(_records(spark, range(2), "v3"), base)
    assert not os.path.isdir(os.path.join(root, ".gone-deadbeef"))
    # the fresh patch itself is intact and listed
    assert len(list_patches(base)) == 1
    assert os.path.isdir(patch_path(base, list_patches(base)[0]))


def test_patch_broadcast_gated_by_manifest_counts(spark, tmp_path):
    """The anti-join broadcast hint is driven by the patch manifests'
    recorded row counts (metadata-only): under the cap the plan carries
    a broadcast exchange on the patch-key side; with the cap forced to 0
    it does not (huge predicate-deletes must not OOM the driver)."""
    base = str(tmp_path / "ds")
    _records(spark, range(30), "v1").write.format("shardpack").mode(
        "overwrite"
    ).save(base)
    write_patch(_records(spark, range(4), "v2"), base)

    plan_default = (
        read_with_patches(spark, base)._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "strategy=broadcast" in plan_default

    spark.conf.set("shardpack.patches.broadcastMaxRows", "0")
    try:
        df = read_with_patches(spark, base)
        plan_capped = df._jdf.queryExecution().optimizedPlan().toString()
        # no forced-broadcast hint past the cap (AQE stays free to pick
        # broadcast on actual runtime sizes — that's the point)
        assert "strategy=broadcast" not in plan_capped
        # semantics identical either way
        st = _state(df)
        assert st["k/0003"][0]["ver"] == "v2" and st["k/0010"][0]["ver"] == "v1"
        assert len(st) == 30
    finally:
        spark.conf.unset("shardpack.patches.broadcastMaxRows")
