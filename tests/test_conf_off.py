"""The driver-environment divergence test: a session WITHOUT
``spark.sql.python.filterPushdown.enabled`` (the Spark default) must read
both ``format("shardpack")`` and ``format("warc")`` end-to-end.

Round-7 regression postmortem: PySpark's planning worker raises
DATA_SOURCE_PUSHDOWN_DISABLED the moment a reader *class* defines
pushFilters while the conf is false — before any filter exists, on every
read.  The builder session bakes the conf in true
(shardpack_spark/session.py), so no ordinary test can catch a reader that
defines pushFilters unconditionally; the driver's own session runs with
the Spark default (false) and went dark on the whole WARC family.  This
file pins the conf-off path for BOTH python data sources so the gap can
never hide a regression again.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from shardpack_spark.format import warc as W
from shardpack_spark.format import warc_index as WI


@pytest.fixture()
def spark_conf_off(spark):
    """The session with filter pushdown toggled OFF for the test's
    duration — the driver environment in miniature.  Toggled on the
    OWNING session rather than a newSession(): Spark checks Python
    data-source name existence globally but resolves them per-session,
    so a sibling session can neither re-register nor use 'warc'/
    'shardpack' (probed empirically; see register_warc NOTE)."""
    prev = spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")
    try:
        yield spark
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", prev)


def _warc_fixture(tmp_path, n=6):
    recs = []
    for i in range(n):
        blk = W.http_response_block(f"payload {i} ".encode() * 20)
        recs.append(
            W.warc_record_bytes(
                "response",
                blk,
                target_uri=f"http://ex.com/{i}",
                record_id=f"<urn:x:{i}>",
                content_type="application/http; msgtype=response",
            )
        )
    p = str(tmp_path / "a.warc.gz")
    W.write_warc(p, recs)
    return p


def test_warc_reads_with_pushdown_conf_off(spark_conf_off, tmp_path):
    """format('warc') in a conf-off session: plain scan works, and an
    id-equality filter still returns the right rows — unpruned (full scan
    + Spark-side filter), never a planning-worker abort."""
    from shardpack_spark.format.warc_source import read_warc

    p = _warc_fixture(tmp_path)
    WI.build_warc_index(p)  # sidecar present: must NOT trigger pushdown

    df = read_warc(spark_conf_off, p)
    assert df.count() == 6

    got = df.filter(F.col("record_id") == "<urn:x:3>").collect()
    assert len(got) == 1 and got[0].payload.startswith(b"payload 3 ")

    # splitting (a reader OPTION, not a pushed filter) still works conf-off
    split = read_warc(spark_conf_off, p, target_split_bytes="400")
    assert split.count() == 6


def test_warc_explicit_prune_option_requires_conf(spark_conf_off, tmp_path):
    """A user forcing prune_by_key=true into a conf-off session gets the
    engine's own DATA_SOURCE_PUSHDOWN_DISABLED error (explicit beats
    implicit) — pinned so the option stays an honest override."""
    from shardpack_spark.format.warc_source import read_warc

    p = _warc_fixture(tmp_path)
    with pytest.raises(Exception, match="PUSHDOWN_DISABLED|pushdown"):
        read_warc(spark_conf_off, p, prune_by_key="true").count()


def test_shardpack_reads_with_pushdown_conf_off(spark_conf_off, tmp_path, sp_rows):
    """format('shardpack') conf-off: write + read back + key filter all
    work (the pruning reader is gated by read_shardpack; raw reads get the
    base reader).  This already passed by design — pinned so it stays
    true."""
    from shardpack_spark.format.datasource import read_shardpack, register

    register(spark_conf_off)
    out = str(tmp_path / "ds")
    rows = [(f"k{i:03d}", {"i": str(i)}, f"payload-{i}".encode()) for i in range(8)]
    sp_rows(spark_conf_off, rows).write.format("shardpack").mode("append").save(out)

    back = spark_conf_off.read.format("shardpack").load(out)
    assert back.count() == 8

    via_facade = read_shardpack(spark_conf_off, out).filter(F.col("key") == "k005")
    got = via_facade.collect()
    assert len(got) == 1 and got[0].entries[0].data == b"payload-5"
