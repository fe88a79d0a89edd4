"""Columnar multi-dataset layout (draft.md:201-211): split by entry
column, align by key at read, prune at dataset granularity."""

import pytest

import os

from pyspark.sql import functions as F

from shardpack_spark.format.columnar import (
    list_columns,
    read_columnar,
    write_columnar,
)


def _two_column_records(spark, n=200):
    """Records with a text + a (sometimes missing) thumb entry."""
    base = spark.range(n).select(
        F.concat(F.lit("rec/"), F.lpad(F.col("id").cast("string"), 6, "0")).alias(
            "key"
        ),
        F.create_map(F.lit("i"), F.col("id").cast("string")).alias("metadata"),
        F.col("id"),
    )
    text = F.struct(
        F.lit("text.txt").alias("file_name"),
        F.lit("text/plain").alias("content_type"),
        F.lit("none").alias("encoding"),
        F.lit(5).cast("long").alias("size"),
        F.encode(F.concat(F.lit("t"), F.col("id").cast("string")), "utf-8").alias(
            "data"
        ),
    )
    thumb = F.struct(
        F.lit("thumb.bin").alias("file_name"),
        F.lit("application/octet-stream").alias("content_type"),
        F.lit("none").alias("encoding"),
        F.lit(3).cast("long").alias("size"),
        F.encode(F.concat(F.lit("b"), F.col("id").cast("string")), "utf-8").alias(
            "data"
        ),
    )
    # every 3rd record has no thumb -> exercises inner-vs-full alignment
    entries = F.when(F.col("id") % 3 == 0, F.array(text)).otherwise(
        F.array(text, thumb)
    )
    return base.select("key", "metadata", entries.alias("entries"))


@pytest.mark.slow  # heavy (>=12 s); conclusive lane only
def test_columnar_round_trip_and_alignment(spark, tmp_path):
    out = str(tmp_path / "columnar")
    src = _two_column_records(spark, 200)
    counts = write_columnar(src, out, target_shard_bytes=8 * 1024)
    assert counts == {"text.txt": 200, "thumb.bin": 133}
    assert list_columns(out) == ["text.txt", "thumb.bin"]  # sorted

    # single-column read touches only that dataset's files
    only_text = read_columnar(spark, out, columns=["text.txt"])
    assert only_text.count() == 200
    names = (
        only_text.select(
            F.explode(F.transform("entries", lambda e: e["file_name"])).alias("n")
        )
        .distinct()
        .collect()
    )
    assert [r["n"] for r in names] == ["text.txt"]

    # inner alignment: records with every requested column
    both = read_columnar(spark, out, columns=["text.txt", "thumb.bin"])
    assert both.count() == 133
    assert both.select(F.min(F.size("entries")), F.max(F.size("entries"))).head() == (
        2,
        2,
    )

    # full alignment reconstructs the original record set and payloads
    full = read_columnar(spark, out, columns=["text.txt", "thumb.bin"], how="full")
    assert full.count() == 200
    orig = {
        r["key"]: sorted((e["file_name"], bytes(e["data"])) for e in r["entries"])
        for r in src.collect()
    }
    back = {
        r["key"]: sorted((e["file_name"], bytes(e["data"])) for e in r["entries"])
        for r in full.collect()
    }
    assert back == orig


def test_columnar_dataset_granular_pruning(spark, tmp_path):
    """Bytes on disk per column dataset ~ that column's payload share;
    unrequested columns' files are never part of the scanned plan."""
    out = str(tmp_path / "c2")
    write_columnar(_two_column_records(spark, 120), out, target_shard_bytes=8 * 1024)
    text_dir = os.path.join(out, "column=text.txt")
    thumb_dir = os.path.join(out, "column=thumb.bin")
    assert os.path.isdir(text_dir) and os.path.isdir(thumb_dir)

    # decisive check that the unrequested column's dataset is never opened:
    # delete it entirely — a thumb-only read must still succeed
    import shutil

    shutil.rmtree(text_dir)
    df = read_columnar(spark, out, columns=["thumb.bin"])
    assert df.count() == 80


def test_columnar_missing_column_errors(spark, tmp_path):
    out = str(tmp_path / "c3")
    write_columnar(_two_column_records(spark, 30), out, target_shard_bytes=8 * 1024)
    import pytest

    from shardpack_spark.format import codec

    with pytest.raises(codec.ShardPackIOError):
        read_columnar(spark, out, columns=["nope.bin"])


@pytest.mark.slow  # heavy (>=12 s); conclusive lane only
def test_zipped_read_matches_join_read(spark, tmp_path):
    """The zero-shuffle merge read returns exactly what the join-based
    read returns, for both alignment modes, and plans no exchange."""
    from shardpack_spark.format.columnar import read_columnar_zipped

    out = str(tmp_path / "zip")
    write_columnar(_two_column_records(spark, 150), out, target_shard_bytes=8 * 1024)

    def snap(df):
        return {
            r["key"]: (
                dict(r["metadata"]),
                sorted((e["file_name"], bytes(e["data"])) for e in r["entries"]),
            )
            for r in df.collect()
        }

    for how in ("inner", "full"):
        joined = snap(read_columnar(spark, out, ["text.txt", "thumb.bin"], how=how))
        zipped = snap(
            read_columnar_zipped(spark, out, ["text.txt", "thumb.bin"], how=how)
        )
        assert zipped == joined, how

    plan = (
        read_columnar_zipped(spark, out, ["text.txt", "thumb.bin"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan


@pytest.mark.slow  # heavy (>=12 s); conclusive lane only
def test_zipped_read_single_column(spark, tmp_path):
    from shardpack_spark.format.columnar import read_columnar_zipped

    out = str(tmp_path / "zip1")
    write_columnar(_two_column_records(spark, 60), out, target_shard_bytes=8 * 1024)
    assert read_columnar_zipped(spark, out, ["thumb.bin"]).count() == 40


@pytest.mark.slow  # heavy (>=12 s); conclusive lane only
def test_zipped_read_empty_driving_column_full_mode(spark, tmp_path):
    """Driving column empty: full-mode zipped read still surfaces the
    other column's records (single unbounded range)."""
    from shardpack_spark.format.columnar import read_columnar_zipped

    out = str(tmp_path / "zipempty")
    # records where doc_id % 3 != 0 have thumbs; build a dataset with ONLY
    # thumbs by filtering text out via columns=
    src = _two_column_records(spark, 30)
    write_columnar(src, out, columns=["text.txt", "thumb.bin"], target_shard_bytes=8 * 1024)
    import shutil

    # simulate an empty text column: overwrite it with zero records
    empty = src.limit(0)
    write_columnar(empty, out, columns=["text.txt"], target_shard_bytes=8 * 1024)

    full = read_columnar_zipped(spark, out, ["text.txt", "thumb.bin"], how="full")
    assert full.count() == 20  # thumbs exist for 2/3 of 30 records
    inner = read_columnar_zipped(spark, out, ["text.txt", "thumb.bin"], how="inner")
    assert inner.count() == 0


@pytest.mark.slow  # heavy (>=12 s); conclusive lane only
def test_zipped_read_chunked_flush_same_result(spark, tmp_path):
    """A tiny chunk_bytes forces many intra-slice flushes of the merge
    buffer (the bounded-memory path a 256 MiB-shard dataset exercises);
    the result is identical to the single-flush read."""
    from shardpack_spark.format.columnar import read_columnar_zipped

    out = str(tmp_path / "zipchunk")
    write_columnar(_two_column_records(spark, 150), out, target_shard_bytes=8 * 1024)

    def snap(df):
        return {
            r["key"]: sorted(
                (e["file_name"], bytes(e["data"])) for e in r["entries"]
            )
            for r in df.collect()
        }

    cols = ["text.txt", "thumb.bin"]
    big = snap(read_columnar_zipped(spark, out, cols))
    tiny = snap(read_columnar_zipped(spark, out, cols, chunk_bytes=1))
    assert tiny == big and len(big) > 0
