"""WARC sidecar record index (format/warc_index.py): build -> seek-read
parity with sequential parse, O(1)-member point lookup, member-aligned
split ranges whose union equals a sequential scan, staleness rejection,
export-time index writing, and the format("warc") split partitions.

Same pin-against-own-wire strategy as test_warc.py: fixtures come from
the in-repo writer, damage is injected at known byte positions.
"""

from __future__ import annotations

import gzip
import json
import os

import pytest

from shardpack_spark.format import warc as W
from shardpack_spark.format import warc_index as WI


def _mk_records(n=6):
    recs = []
    for i in range(n):
        blk = W.http_response_block(f"payload {i} ".encode() * 40)
        recs.append(
            W.warc_record_bytes(
                "response",
                blk,
                target_uri=f"http://ex.com/{i}",
                record_id=f"<urn:x:{i}>",
                content_type="application/http; msgtype=response",
            )
        )
    return recs


def _write(tmp_path, name="a.warc.gz", n=6, gz=True):
    p = str(tmp_path / name)
    W.write_warc(p, _mk_records(n), gzip_members=gz)
    return p


# --- build / read / parity ---------------------------------------------------


@pytest.mark.parametrize("gz", [True, False])
def test_build_and_seek_parity(tmp_path, gz):
    """Every indexed record, seek-read at its offset, equals the record
    from a sequential parse — id, uri, payload."""
    p = _write(tmp_path, "a.warc.gz" if gz else "a.warc", n=6, gz=gz)
    rep = WI.build_warc_index(p)
    assert rep["records"] == 6 and rep["errors"] == 0
    assert os.path.exists(p + WI.INDEX_SUFFIX)

    seq = {r.record_id: r for r in W.iter_warc_records(open(p, "rb"))}
    idx = WI.read_warc_index(p)
    assert idx is not None and len(idx.rows) == 6
    for row in idx.rows:
        with open(p, "rb") as f:
            got = next(iter(W.iter_warc_records(f, start_offset=row.offset)))
        want = seq[row.record_id]
        assert got.record_id == want.record_id
        assert got.target_uri == want.target_uri
        assert got.payload == want.payload
        assert got.offset == row.offset  # offsets stay ABSOLUTE


def test_lookup_is_one_member(tmp_path):
    """Point lookup decompresses one member: raw bytes consumed from the
    archive are a small constant, not the file."""
    p = _write(tmp_path, n=40)
    WI.build_warc_index(p)
    size = os.path.getsize(p)

    class CountingBackend:
        """Delegates to the local backend but counts archive bytes read."""

        def __init__(self):
            from shardpack_spark.format import storage

            self._be = storage.for_path(p)
            self.archive_bytes = 0

        def open_read(self, path):
            f = self._be.open_read(path)
            if not path.endswith(WI.INDEX_SUFFIX):
                outer = self

                class Wrap:
                    def read(self, n=-1):
                        b = f.read(n)
                        outer.archive_bytes += len(b)
                        return b

                    def seek(self, *a):
                        return f.seek(*a)

                    def tell(self):
                        return f.tell()

                    def __enter__(self):
                        return self

                    def __exit__(self, *a):
                        f.close()

                return Wrap()
            return f

        def __getattr__(self, name):
            return getattr(self._be, name)

    be = CountingBackend()
    rec = WI.lookup_record(p, record_id="<urn:x:37>", be=be)
    assert rec is not None and rec.payload.startswith(b"payload 37 ")
    # one member is ~a few hundred bytes compressed; the file is ~40x that
    assert be.archive_bytes < size / 4, (be.archive_bytes, size)

    # uri lookup works too; missing id returns None
    assert WI.lookup_record(p, uri="http://ex.com/3", be=be).record_id == "<urn:x:3>"
    assert WI.lookup_record(p, record_id="<urn:missing>", be=be) is None


def test_multi_record_member_lookup(tmp_path):
    """Several records in ONE gzip member: the index points all of them
    at offset 0 and lookup scans within the member to the right one."""
    p = str(tmp_path / "multi.warc.gz")
    with open(p, "wb") as f:
        f.write(gzip.compress(b"".join(_mk_records(3))))
    WI.build_warc_index(p)
    idx = WI.read_warc_index(p)
    assert idx.member_offsets() == [0]
    rec = WI.lookup_record(p, record_id="<urn:x:2>")
    assert rec is not None and rec.payload.startswith(b"payload 2 ")


def test_stale_index_rejected(tmp_path):
    """An archive rewritten after indexing must NOT be trusted into
    mis-seeks: read_warc_index returns None, lookup falls back to None."""
    p = _write(tmp_path, n=3)
    WI.build_warc_index(p)
    W.write_warc(p, _mk_records(5))  # rewrite: size changes
    assert WI.read_warc_index(p) is None
    assert WI.lookup_record(p, record_id="<urn:x:1>") is None
    # torn/foreign sidecar is also a clean None
    with open(p + WI.INDEX_SUFFIX, "w") as f:
        f.write("not json\n{broken")
    assert WI.read_warc_index(p) is None


def test_index_records_parse_errors(tmp_path):
    """Error records appear in the index as {'o','e'} rows — offsets keep
    split ranges exhaustive, errors keep the sidecar honest."""
    p = _write(tmp_path, n=4)
    data = bytearray(open(p, "rb").read())
    starts = []
    i = -1
    while True:
        i = data.find(b"\x1f\x8b\x08", i + 1)
        if i < 0:
            break
        starts.append(i)
    data[starts[2] + 20] ^= 0xFF
    open(p, "wb").write(bytes(data))
    rep = WI.build_warc_index(p)
    assert rep["errors"] == 1
    idx = WI.read_warc_index(p)
    assert sum(1 for r in idx.rows if r.error) == 1
    # sidecar is plain line-JSON (greppable, jq-able)
    lines = open(p + WI.INDEX_SUFFIX).read().splitlines()
    head = json.loads(lines[0])
    assert head["magic"] == "shardpack-warc-cdxj"
    assert all(json.loads(ln) for ln in lines[1:])


def test_error_rows_keep_identity_for_lookup(spark, tmp_path):
    """Error is orthogonal to identity: a short-block record (lying
    Content-Length) keeps its parsed id/uri, the Spark reader EMITS it
    with that id — so the sidecar must index the id too, or an indexed
    pushdown lookup silently returns 0 rows where an unindexed scan
    returns 1 (the 'pruning never changes results, only I/O' contract)."""
    import re

    from pyspark.sql import functions as F

    from shardpack_spark.format.warc_source import WarcPushdownReader, read_warc

    p = _write(tmp_path, n=3)
    rec = W.warc_record_bytes(
        "response",
        W.http_response_block(b"hello body"),
        target_uri="http://ex.com/liar",
        record_id="<urn:x:liar>",
        content_type="application/http; msgtype=response",
    )
    head, _, rest = rec.partition(b"\r\n\r\n")
    head = re.sub(
        rb"Content-Length: (\d+)",
        lambda m: b"Content-Length: %d" % (int(m.group(1)) + 50),
        head,
    )
    with open(p, "ab") as f:
        f.write(gzip.compress(head + b"\r\n\r\n" + rest))

    WI.build_warc_index(p)
    idx = WI.read_warc_index(p)
    liar = [r for r in idx.rows if r.error]
    assert len(liar) == 1
    assert liar[0].record_id == "<urn:x:liar>"
    assert liar[0].target_uri == "http://ex.com/liar"

    # plan-level: the pushdown prunes TO the liar's member, not to nothing
    r = WarcPushdownReader({"path": p})
    from pyspark.sql.datasource import EqualTo

    r.pushFilters([EqualTo(("record_id",), "<urn:x:liar>")])
    parts = r.partitions()
    assert len(parts) == 1 and parts[0].end > parts[0].start

    # engine-level: indexed lookup == unindexed scan (1 row, error set)
    got = (
        read_warc(spark, p)
        .filter(F.col("record_id") == "<urn:x:liar>")
        .collect()
    )
    assert len(got) == 1 and got[0].parse_error is not None


def test_iter_index_rows_scalar_line_stops_clean(tmp_path):
    """A sidecar row line that parses as a JSON SCALAR (corrupt/foreign
    file passing header validation) ends the stream at the damage —
    documented stop-at-damage, not a TypeError out of planning."""
    p = _write(tmp_path, n=4)
    WI.build_warc_index(p)
    ip = p + WI.INDEX_SUFFIX
    lines = open(ip).read().splitlines()
    lines[3] = "42"  # valid JSON, not an object
    open(ip, "w").write("\n".join(lines) + "\n")
    rows = list(WI.iter_index_rows(p))
    assert len(rows) == 2  # header + 2 good rows, then stop at damage


# --- split ranges -------------------------------------------------------------


def test_split_ranges_cover_exactly(tmp_path):
    p = _write(tmp_path, n=20)
    WI.build_warc_index(p)
    idx = WI.read_warc_index(p)
    size = os.path.getsize(p)
    for target in (1, 300, 10_000_000):
        ranges = idx.split_ranges(target)
        assert ranges[0][0] == 0 and ranges[-1][1] == size
        for (s1, e1), (s2, e2) in zip(ranges, ranges[1:]):
            assert e1 == s2 and s1 < e1  # contiguous, non-empty
        # every split point is a member boundary
        offs = set(idx.member_offsets())
        assert all(s in offs or s == 0 for s, _ in ranges)
    assert len(idx.split_ranges(1)) == 20  # one member per range
    assert idx.split_ranges(10_000_000) == [(0, size)]


def test_range_scan_union_equals_sequential(tmp_path):
    """Union of range scans == one sequential scan (ids, payloads,
    offsets), including a parse-error record inside a range."""
    p = _write(tmp_path, n=12)
    data = bytearray(open(p, "rb").read())
    starts = []
    i = -1
    while True:
        i = data.find(b"\x1f\x8b\x08", i + 1)
        if i < 0:
            break
        starts.append(i)
    data[starts[5] + 20] ^= 0xFF
    open(p, "wb").write(bytes(data))
    WI.build_warc_index(p)
    idx = WI.read_warc_index(p)

    seq = [
        (r.offset, r.record_id, r.parse_error is not None)
        for r in W.iter_warc_records(open(p, "rb"))
    ]
    ranges = idx.split_ranges(400)
    assert len(ranges) > 2
    par = []
    for s, e in ranges:
        with open(p, "rb") as f:
            par.extend(
                (r.offset, r.record_id, r.parse_error is not None)
                for r in W.iter_warc_records(f, start_offset=s, end_offset=e)
            )
    assert sorted(par) == sorted(seq)


def _grid_scan(p, target):
    """Simulate the planner grid + per-task snap_bounds + range parse —
    exactly what N independent executors do for one archive."""
    size = os.path.getsize(p)
    out = []
    for s in range(0, size, target):
        b = WI.snap_bounds(p, s, min(s + target, size))
        assert b is not None
        seek, stop = b
        if seek is None:
            continue
        with open(p, "rb") as f:
            out.extend(
                (r.offset, r.record_id, r.parse_error is not None)
                for r in W.iter_warc_records(f, start_offset=seek, end_offset=stop)
            )
    return out


def test_snap_bounds_grid_union_equals_sequential(tmp_path):
    """Coarse grid + task-side snap: union over the grid == one
    sequential scan, for several grid sizes, including one corrupted
    member."""
    p = _write(tmp_path, n=12)
    data = bytearray(open(p, "rb").read())
    starts = []
    i = -1
    while True:
        i = data.find(b"\x1f\x8b\x08", i + 1)
        if i < 0:
            break
        starts.append(i)
    data[starts[5] + 20] ^= 0xFF
    open(p, "wb").write(bytes(data))
    WI.build_warc_index(p)

    seq = [
        (r.offset, r.record_id, r.parse_error is not None)
        for r in W.iter_warc_records(open(p, "rb"))
    ]
    for target in (1, 150, 400, 1000, os.path.getsize(p)):
        assert sorted(_grid_scan(p, target)) == sorted(seq), target


def test_snap_bounds_torn_sidecar_tail_takeover(tmp_path):
    """Sidecar torn mid-file: exactly one task extends to EOF (stop=None),
    later grid ranges yield nothing, and the union still equals a
    sequential scan — a torn sidecar degrades parallelism, never rows."""
    p = _write(tmp_path, n=10)
    WI.build_warc_index(p)
    ip = p + WI.INDEX_SUFFIX
    lines = open(ip).read().splitlines()
    # keep header + first 4 rows; tear the 5th row line in half
    torn = lines[:5] + [lines[5][: len(lines[5]) // 2]]
    open(ip, "w").write("\n".join(torn) + "\n")

    seq = [
        (r.offset, r.record_id, r.parse_error is not None)
        for r in W.iter_warc_records(open(p, "rb"))
    ]
    target = 300
    size = os.path.getsize(p)
    assert sorted(_grid_scan(p, target)) == sorted(seq)
    # structural: exactly one takeover task, ranges after it are empty
    takeovers = 0
    for s in range(0, size, target):
        seek, stop = WI.snap_bounds(p, s, min(s + target, size))
        if seek is not None and stop is None:
            takeovers += 1
    assert takeovers == 1


def test_snap_bounds_empty_sidecar_zero_task_scans(tmp_path):
    """Zero usable rows (torn right after the header): the start==0 task
    gets a whole-file scan, every other range nothing — lossless."""
    p = _write(tmp_path, n=5)
    WI.build_warc_index(p)
    ip = p + WI.INDEX_SUFFIX
    head = open(ip).read().splitlines()[0]
    open(ip, "w").write(head + "\n{torn")
    assert WI.snap_bounds(p, 0, 200) == (0, None)
    assert WI.snap_bounds(p, 200, 400) == (None, None)


def test_snap_bounds_bisect_path_parity_and_io(tmp_path, monkeypatch):
    """With the bisect window shrunk, snap_bounds takes the byte-bisect
    path: grid union still equals a sequential scan, and a LATE task
    reads only O(log + slice) sidecar bytes — not the prefix (the
    100 GiB-archive property: each sidecar byte is read ~once across all
    tasks, not ~tasks/2 times)."""
    from shardpack_spark.format import storage

    p = _write(tmp_path, n=40)
    WI.build_warc_index(p)
    monkeypatch.setattr(WI, "_BISECT_WINDOW", 256)
    monkeypatch.setattr(WI, "_PROBE_BYTES", 128)

    seq = [
        (r.offset, r.record_id, r.parse_error is not None)
        for r in W.iter_warc_records(open(p, "rb"))
    ]
    for target in (200, 700, 2000):
        assert sorted(_grid_scan(p, target)) == sorted(seq), target

    # I/O: the LAST grid cell's snap must read far less than the sidecar
    sidecar = os.path.getsize(p + WI.INDEX_SUFFIX)
    size = os.path.getsize(p)
    target = 700
    last_start = (size // target) * target
    if last_start == size:
        last_start -= target
    counted = {"n": 0}
    real_for_path = storage.for_path

    class CountingBE:
        def __init__(self, be):
            self._be = be

        def read_bytes(self, path, *a, **kw):
            out = self._be.read_bytes(path, *a, **kw)
            if path.endswith(WI.INDEX_SUFFIX):
                counted["n"] += len(out)
            return out

        def __getattr__(self, name):
            return getattr(self._be, name)

    b = WI.snap_bounds(p, last_start, size, be=CountingBE(real_for_path(p)))
    assert b is not None
    # probes are 128 B (doubling) + one <=1 MiB stream capped by EOF; the
    # real bound asserted: we did NOT stream the whole sidecar prefix
    # repeatedly — allow the final linear window but not 2x the sidecar
    assert counted["n"] < sidecar + 4096, (counted["n"], sidecar)


def test_snap_bounds_interior_sidecar_damage_lossless(tmp_path):
    """A damaged row line in the MIDDLE of the sidecar (valid lines after
    it): boundaries come from visible rows on both sides, so the grid
    union still equals a sequential scan with no duplicates — the member
    whose row was damaged is parsed by the task owning the preceding
    visible boundary."""
    p = _write(tmp_path, n=12)
    WI.build_warc_index(p)
    ip = p + WI.INDEX_SUFFIX
    lines = open(ip).read().splitlines()
    lines[6] = '{"o": not-json'  # interior damage; later lines intact
    open(ip, "w").write("\n".join(lines) + "\n")

    seq = [
        (r.offset, r.record_id, r.parse_error is not None)
        for r in W.iter_warc_records(open(p, "rb"))
    ]
    for target in (150, 400, 900):
        got = _grid_scan(p, target)
        assert sorted(got) == sorted(seq), target
        assert len(got) == len(seq)  # no duplicates either


def test_snap_bounds_stale_sidecar_returns_none(tmp_path):
    p = _write(tmp_path, n=3)
    WI.build_warc_index(p)
    W.write_warc(p, _mk_records(5))  # rewrite: size changes
    assert WI.snap_bounds(p, 0, 100) is None


def test_split_planning_reads_headers_not_sidecars(tmp_path, monkeypatch):
    """Split PLANNING is O(archives) small reads: one listing + one ~4 KiB
    header read per indexed archive — sidecar ROWS are only streamed
    task-side (snap_bounds).  Guards the 100 TB shape: ~90k archives ×
    ~8 MB sidecars must not stream through the driver at plan time."""
    from shardpack_spark.format import storage
    from shardpack_spark.format.warc_source import _plan_file_partitions

    d = tmp_path / "dump"
    d.mkdir()
    files = []
    for i in range(3):
        p = _write(d, f"crawl-{i:05d}.warc.gz", n=90)  # sidecar > 4 KiB
        WI.build_warc_index(p)
        files.append(p)
    assert all(os.path.getsize(f + WI.INDEX_SUFFIX) > 4096 for f in files)

    sidecar_bytes = {"n": 0}
    real_for_path = storage.for_path

    class CountingSidecarBackend:
        def __init__(self, be):
            self._be = be

        def read_bytes(self, path, *a, **kw):
            out = self._be.read_bytes(path, *a, **kw)
            if path.endswith(WI.INDEX_SUFFIX):
                sidecar_bytes["n"] += len(out)
            return out

        def open_read(self, path):
            f = self._be.open_read(path)
            if not path.endswith(WI.INDEX_SUFFIX):
                return f
            counter = sidecar_bytes

            class Wrap:
                def read(self, n=-1):
                    b = f.read(n)
                    counter["n"] += len(b)
                    return b

                def seek(self, *a):
                    return f.seek(*a)

                def tell(self):
                    return f.tell()

                def close(self):
                    return f.close()

                def __enter__(self):
                    return self

                def __exit__(self, *a):
                    f.close()

            return Wrap()

        def __getattr__(self, name):
            return getattr(self._be, name)

    monkeypatch.setattr(
        storage, "for_path", lambda p: CountingSidecarBackend(real_for_path(p))
    )

    parts = _plan_file_partitions(files, str(d), True, 400)
    per_file = {}
    for pt in parts:
        per_file.setdefault(pt.path, []).append(pt)
    assert all(len(v) > 2 for v in per_file.values())  # splits planned
    assert all(pt.snap for v in per_file.values() for pt in v)
    # planning read only the 4 KiB header probe per archive, never rows
    assert sidecar_bytes["n"] <= 3 * 4096, sidecar_bytes["n"]


# --- spark source integration ------------------------------------------------


def test_spark_split_partitions_parity(spark, tmp_path):
    """format('warc') with a sidecar + tiny target_split_bytes plans >1
    partition per archive and returns exactly the sequential rows."""
    from shardpack_spark.format.warc_source import (
        WarcReader,
        read_warc,
    )

    p = _write(tmp_path, n=15)
    baseline = read_warc(spark, p).orderBy("record_offset")
    base_rows = [
        (r.record_id, bytes(r.payload)) for r in baseline.collect()
    ]

    WI.build_warc_index(p)
    r = WarcReader({"path": p, "target_split_bytes": "400"})
    parts = r.partitions()
    assert len(parts) > 2
    assert parts[0].start == 0 and parts[-1].end == os.path.getsize(p)

    split_df = (
        spark.read.format("warc")
        .option("target_split_bytes", 400)
        .load(p)
        .orderBy("record_offset")
    )
    split_rows = [
        (r.record_id, bytes(r.payload)) for r in split_df.collect()
    ]
    assert split_rows == base_rows

    # split_archives=false forces the old one-task-per-file plan
    r2 = WarcReader({"path": p, "split_archives": "false"})
    assert len(r2.partitions()) == 1


def test_export_writes_index(spark, tmp_path):
    """documents_to_warc publishes a .cdxj per part file; lookups work on
    the export without any extra indexing pass."""
    from shardpack_spark.operators.webcorpus import documents_to_warc

    docs = spark.createDataFrame(
        [(f"d{i}", f"text body {i}") for i in range(10)], "doc_id string, text string"
    ).coalesce(2)
    out = str(tmp_path / "export")
    manifest = documents_to_warc(docs, out).collect()
    assert len(manifest) == 2
    for row in manifest:
        assert os.path.exists(row.file + WI.INDEX_SUFFIX)
        idx = WI.read_warc_index(row.file)
        assert idx is not None and len(idx.rows) == row.n_records
    hit = None
    for row in manifest:
        hit = hit or WI.lookup_record(row.file, record_id="<urn:doc:d7>")
    assert hit is not None and b"text body 7" in hit.payload

    # opt-out writes no sidecar
    out2 = str(tmp_path / "export2")
    m2 = documents_to_warc(docs, out2, write_index=False).collect()
    assert all(not os.path.exists(r.file + WI.INDEX_SUFFIX) for r in m2)


def test_cli_warc_index_and_indexed_cat(tmp_path, capsys):
    from shardpack_spark.__main__ import main

    d = tmp_path / "arch"
    d.mkdir()
    _write(d, "a.warc.gz", n=5)
    _write(d, "b.warc.gz", n=3)
    assert main(["warc-index", str(d)]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["files"] == 2 and rep["records"] == 8
    assert main(["warc-cat", str(d / "a.warc.gz"), "<urn:x:4>"]) == 0
    assert capsys.readouterr().out.startswith("payload 4 ")


def test_filter_pushdown_point_lookup(spark, tmp_path):
    """EqualTo/In on record_id / target_uri prune partitions to the
    matching members via the sidecar (O(matches) member reads across the
    directory; indexed files without a match contribute NO partitions;
    unindexed files fall back to whole-file scans with filters
    re-applied)."""
    from pyspark.sql import functions as F

    from shardpack_spark.format.warc_source import WarcPushdownReader, read_warc

    d = tmp_path / "arch"
    d.mkdir()
    pa_ = _write(d, "a.warc.gz", n=10)
    pb = _write(d, "b.warc.gz", n=10)
    WI.build_warc_index(pa_)
    WI.build_warc_index(pb)

    # plan-level: one member-range partition for one id (both files
    # indexed; the id exists in BOTH fixtures since ids repeat).  The
    # pushdown variant is explicit — the base WarcReader must NOT define
    # pushFilters (sessions without the filterPushdown conf reject any
    # reader class that does).
    r = WarcPushdownReader({"path": str(d)})
    from pyspark.sql.datasource import EqualTo

    r.pushFilters([EqualTo(("record_id",), "<urn:x:7>")])
    parts = r.partitions()
    assert len(parts) == 2  # one member per file (ids repeat across files)
    assert all(pt.end - pt.start < os.path.getsize(pa_) / 4 for pt in parts)

    # engine-level: values correct through the session (conf enables
    # python filter pushdown in shardpack_spark.session)
    df = read_warc(spark, str(d)).filter(F.col("record_id") == "<urn:x:7>")
    rows = df.collect()
    assert len(rows) == 2 and all(r.payload.startswith(b"payload 7 ") for r in rows)

    got = (
        read_warc(spark, str(d))
        .filter(F.col("target_uri").isin("http://ex.com/3", "http://ex.com/5"))
        .count()
    )
    assert got == 4  # 2 uris x 2 files

    # no-match over indexed files -> one empty-range sentinel partition
    # (the engine calls read(None) on an empty partition list)
    r2 = WarcPushdownReader({"path": str(d)})
    r2.pushFilters([EqualTo(("record_id",), "<urn:absent>")])
    sent = r2.partitions()
    assert len(sent) == 1 and sent[0].start == sent[0].end == 0
    assert (
        read_warc(spark, str(d)).filter(F.col("record_id") == "<urn:absent>").count()
        == 0
    )

    # unindexed file: whole-file fallback keeps results identical
    pc = _write(d, "c.warc.gz", n=4)
    df2 = read_warc(spark, str(d)).filter(F.col("record_id") == "<urn:x:2>")
    assert df2.count() == 3  # a, b (pruned) + c (sequential)


def test_distributed_index_build(spark, tmp_path):
    """index_warc_archives: one executor task per archive builds its
    sidecar; reports are correct; indexed lookups work after."""
    from shardpack_spark.operators.webcorpus import index_warc_archives

    d = tmp_path / "dump"
    d.mkdir()
    for i in range(4):
        _write(d, f"crawl-{i:05d}.warc.gz", n=3 + i)
    reps = {r.archive.rsplit("/", 1)[-1]: r for r in
            index_warc_archives(spark, str(d)).collect()}
    assert len(reps) == 4
    assert reps["crawl-00002.warc.gz"].records == 5
    assert all(r.errors == 0 for r in reps.values())
    for i in range(4):
        p = str(d / f"crawl-{i:05d}.warc.gz")
        assert os.path.exists(p + WI.INDEX_SUFFIX)
        assert WI.lookup_record(p, record_id="<urn:x:1>") is not None
    # idempotent re-run
    assert index_warc_archives(spark, str(d)).count() == 4


def test_streamed_build_multi_chunk(tmp_path, monkeypatch):
    """build_warc_index streams row lines in bounded chunks (O(1) memory
    in record count); a forced tiny flush threshold produces the same
    sidecar a list build would."""
    p = _write(tmp_path, n=12)
    monkeypatch.setattr(WI, "_INDEX_FLUSH_BYTES", 64)  # ~1 row per flush
    rep = WI.build_warc_index(p)
    assert rep["records"] == 12 and rep["members"] == 12
    idx = WI.read_warc_index(p)
    assert idx is not None and len(idx.rows) == 12
    assert [r.record_id for r in idx.rows] == [f"<urn:x:{i}>" for i in range(12)]
    # streamed header declares records=-1 (count unknown until EOF);
    # readers never trust it — the exporters' list path records the real
    # count
    import json as _json

    head = _json.loads(open(p + WI.INDEX_SUFFIX).readline())
    assert head["records"] == -1 and head["archive_size"] == os.path.getsize(p)


def test_file_filter_prunes_listing(spark, tmp_path):
    """EqualTo/In on the `file` column prunes the LISTING — re-reading
    one archive out of a directory plans only that file (no index
    needed); an unknown name plans one empty range, not a scan.  Combines
    with record_id pushdown (file pruned first, then member pruned)."""
    from pyspark.sql import functions as F
    from pyspark.sql.datasource import EqualTo

    from shardpack_spark.format.warc_source import WarcPushdownReader, read_warc

    d = tmp_path / "arch"
    d.mkdir()
    pa_ = _write(d, "a.warc.gz", n=4)
    pb = _write(d, "b.warc.gz", n=6)

    r = WarcPushdownReader({"path": str(d)})
    r.pushFilters([EqualTo(("file",), pb)])
    parts = r.partitions()
    assert [pt.path for pt in parts] == [pb]

    assert read_warc(spark, str(d)).filter(F.col("file") == pb).count() == 6
    assert (
        read_warc(spark, str(d)).filter(F.col("file") == str(d / "nope.warc.gz")).count()
        == 0
    )

    # file + record_id compose: one file, one member
    WI.build_warc_index(pa_)
    r2 = WarcPushdownReader({"path": str(d)})
    r2.pushFilters([
        EqualTo(("file",), pa_),
        EqualTo(("record_id",), "<urn:x:2>"),
    ])
    parts2 = r2.partitions()
    assert len(parts2) == 1 and parts2[0].path == pa_ and parts2[0].end is not None
    got = (
        read_warc(spark, str(d))
        .filter((F.col("file") == pa_) & (F.col("record_id") == "<urn:x:2>"))
        .collect()
    )
    assert len(got) == 1 and got[0].payload.startswith(b"payload 2 ")


def test_lookup_planning_bounded_concurrency(tmp_path, monkeypatch):
    """Point-lookup planning over a many-archive dump overlaps sidecar
    scans on the bounded pool (>8 files engages it) and still prunes to
    exactly the matching members, in deterministic file order."""
    import threading

    from shardpack_spark.format import warc_index as wi_mod
    from shardpack_spark.format.warc_source import _lookup_partitions

    d = tmp_path / "dump"
    d.mkdir()
    files = []
    for i in range(12):
        p = _write(d, f"crawl-{i:05d}.warc.gz", n=5)
        WI.build_warc_index(p)
        files.append(p)

    threads: set[int] = set()
    real_header = wi_mod.index_header

    def slow_header(p, be=None):
        import time

        threads.add(threading.get_ident())
        time.sleep(0.02)  # force overlap so the pool is observable
        return real_header(p, be=be)

    monkeypatch.setattr(wi_mod, "index_header", slow_header)
    parts = _lookup_partitions(files, ["<urn:x:3>"], [])
    # every archive holds ids 0..4, so each contributes exactly one member
    assert [pt.path for pt in parts] == files  # deterministic order
    assert all(pt.end is not None and pt.end > pt.start for pt in parts)
    assert len(threads) > 1  # pool engaged, not a sequential driver loop


def test_warc_dump_index_global_lookup(spark, tmp_path, monkeypatch):
    """warc_dump_index builds the dump-wide locator (sidecar-fed AND
    headers-only archives); lookup_via_dump_index resolves a record id
    across the dump in O(1) reads: manifest-pruned shard + ONE member —
    never a scan over every archive or sidecar."""
    from shardpack_spark.format import storage
    from shardpack_spark.operators.webcorpus import warc_dump_index

    d = tmp_path / "dump"
    d.mkdir()
    paths = []
    for i in range(5):
        p = _write(d, f"crawl-{i:05d}.warc.gz", n=4 + i)
        if i % 2 == 0:
            WI.build_warc_index(p)  # mixed: 3 indexed, 2 headers-only parsed
        paths.append(p)

    out = str(tmp_path / "locator")
    warc_dump_index(spark, str(d), out, target_shard_bytes=8 * 1024)

    hits = WI.lookup_via_dump_index(out, "<urn:x:3>")
    assert len(hits) == 5  # ids repeat across all five archives
    assert all(h.payload.startswith(b"payload 3 ") for h in hits)
    assert {h.record_id for h in hits} == {"<urn:x:3>"}
    # id present only in the larger archives
    assert len(WI.lookup_via_dump_index(out, "<urn:x:7>")) == 1
    assert WI.lookup_via_dump_index(out, "<urn:missing>") == []

    # I/O bound: one lookup must not stream archives or sidecars — count
    # bytes read from .warc.gz/.cdxj during a single-id lookup
    counted = {"archive": 0}
    real_for_path = storage.for_path

    class CountingBackend:
        def __init__(self, be):
            self._be = be

        def open_read(self, path):
            f = self._be.open_read(path)
            if not path.endswith(".warc.gz"):
                return f
            c = counted

            class Wrap:
                def read(self, n=-1):
                    b = f.read(n)
                    c["archive"] += len(b)
                    return b

                def seek(self, *a):
                    return f.seek(*a)

                def tell(self):
                    return f.tell()

                def close(self):
                    return f.close()

                def __enter__(self):
                    return self

                def __exit__(self, *a):
                    f.close()

            return Wrap()

        def __getattr__(self, name):
            return getattr(self._be, name)

    monkeypatch.setattr(storage, "for_path", lambda p: CountingBackend(real_for_path(p)))
    got = WI.lookup_via_dump_index(out, "<urn:x:7>")
    assert len(got) == 1
    total = sum(os.path.getsize(p) for p in paths)
    assert counted["archive"] < total / 4, (counted["archive"], total)


def test_warc_dump_index_uri_keyed(spark, tmp_path):
    """key='target_uri' builds the URL-keyed twin; re-crawled URIs (the
    same uri in several archives) all surface."""
    from shardpack_spark.operators.webcorpus import warc_dump_index

    d = tmp_path / "dump"
    d.mkdir()
    for i in range(3):
        p = _write(d, f"crawl-{i:05d}.warc.gz", n=4)
        WI.build_warc_index(p)
    out = str(tmp_path / "by_uri")
    warc_dump_index(spark, str(d), out, key="target_uri")
    hits = WI.lookup_via_dump_index(out, "http://ex.com/2")
    assert len(hits) == 3 and all(h.target_uri == "http://ex.com/2" for h in hits)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="record_id|target_uri"):
        warc_dump_index(spark, str(d), out, key="nope")


def test_warc_dump_index_append_and_sync(spark, tmp_path):
    """A growing dump never rebuilds its locator: append indexes only the
    named arrivals; sync diffs the listing against the locator's own
    archive set and is a no-op when nothing landed."""
    from shardpack_spark.format.datasource import read_shardpack
    from shardpack_spark.operators.webcorpus import warc_dump_index

    d = tmp_path / "dump"
    d.mkdir()
    for i in range(2):
        WI.build_warc_index(_write(d, f"crawl-{i:05d}.warc.gz", n=3))
    out = str(tmp_path / "locator")
    warc_dump_index(spark, str(d), out)
    assert len(WI.lookup_via_dump_index(out, "<urn:x:1>")) == 2

    # a new archive lands; caller-named append indexes ONLY it
    p2 = _write(d, "crawl-00002.warc.gz", n=3)
    WI.build_warc_index(p2)
    warc_dump_index(spark, str(d), out, mode="append", files=[p2])
    assert len(WI.lookup_via_dump_index(out, "<urn:x:1>")) == 3

    # sync: two more land (one without a sidecar), only they are added
    _write(d, "crawl-00003.warc.gz", n=4)
    WI.build_warc_index(_write(d, "crawl-00004.warc.gz", n=4))
    warc_dump_index(spark, str(d), out, mode="sync")
    assert len(WI.lookup_via_dump_index(out, "<urn:x:1>")) == 5
    assert len(WI.lookup_via_dump_index(out, "<urn:x:3>")) == 2  # only n=4 archives

    # idempotent: a second sync adds nothing (locator row count stable)
    n_before = read_shardpack(spark, out, columns=["key"]).count()
    warc_dump_index(spark, str(d), out, mode="sync")
    assert read_shardpack(spark, out, columns=["key"]).count() == n_before

    import pytest as _pytest

    with _pytest.raises(ValueError, match="overwrite|append|sync"):
        warc_dump_index(spark, str(d), out, mode="replace")


def test_dump_index_serves_warc_pushdown(spark, tmp_path):
    """format('warc') with dump_index= plans record_id pushdown from the
    locator: one (offset, offset+1) member partition per hit — O(values)
    planning reads instead of O(archives) sidecar scans; files outside
    the locator's coverage fall back to whole-file scans so arrivals are
    never lost; filters the locator is not keyed for fall back to
    sidecar planning."""
    from pyspark.sql import functions as F
    from pyspark.sql.datasource import EqualTo

    from shardpack_spark.format.warc_source import WarcPushdownReader, read_warc
    from shardpack_spark.operators.webcorpus import warc_dump_index

    d = tmp_path / "dump"
    d.mkdir()
    for i in range(3):
        WI.build_warc_index(_write(d, f"crawl-{i:05d}.warc.gz", n=4))
    loc = str(tmp_path / "locator")
    warc_dump_index(spark, str(d), loc)

    # plan-level: one single-member partition per hit, nothing else
    r = WarcPushdownReader({"path": str(d), "dump_index": loc})
    r.pushFilters([EqualTo(("record_id",), "<urn:x:2>")])
    parts = r.partitions()
    assert len(parts) == 3  # the id exists once per archive
    assert all(pt.end == pt.start + 1 for pt in parts)

    # engine-level: values correct through the session
    got = (
        read_warc(spark, str(d), dump_index=loc)
        .filter(F.col("record_id") == "<urn:x:2>")
        .collect()
    )
    assert len(got) == 3 and all(x.payload.startswith(b"payload 2 ") for x in got)

    # a covered MISS prunes to zero (empty-range sentinel partition)
    r2 = WarcPushdownReader({"path": str(d), "dump_index": loc})
    r2.pushFilters([EqualTo(("record_id",), "<urn:absent>")])
    sent = r2.partitions()
    assert len(sent) == 1 and sent[0].start == sent[0].end == 0

    # an archive lands AFTER the locator build: uncovered -> whole-file
    # fallback, its record still surfaces
    _write(d, "crawl-00003.warc.gz", n=4)
    r3 = WarcPushdownReader({"path": str(d), "dump_index": loc})
    r3.pushFilters([EqualTo(("record_id",), "<urn:x:2>")])
    parts3 = r3.partitions()
    whole = [pt for pt in parts3 if pt.end is None]
    assert len(whole) == 1 and whole[0].path.endswith("crawl-00003.warc.gz")
    assert (
        read_warc(spark, str(d), dump_index=loc)
        .filter(F.col("record_id") == "<urn:x:2>")
        .count()
        == 4
    )

    # sync folds the arrival into coverage: the whole-file part vanishes
    warc_dump_index(spark, str(d), loc, mode="sync")
    r4 = WarcPushdownReader({"path": str(d), "dump_index": loc})
    r4.pushFilters([EqualTo(("record_id",), "<urn:x:2>")])
    assert all(pt.end == pt.start + 1 for pt in r4.partitions())

    # a target_uri filter on a record_id-keyed locator: sidecar planning
    # decides (correct rows, not half-pruned)
    got_uri = (
        read_warc(spark, str(d), dump_index=loc)
        .filter(F.col("target_uri") == "http://ex.com/1")
        .count()
    )
    assert got_uri == 4


def test_dump_index_unusable_locator_degrades_to_sidecar(spark, tmp_path):
    """A missing or foreign dump_index never breaks a read: planning
    falls back to per-archive sidecar pruning with identical results."""
    from pyspark.sql import functions as F

    from shardpack_spark.format.warc_source import read_warc

    d = tmp_path / "dump"
    d.mkdir()
    for i in range(2):
        WI.build_warc_index(_write(d, f"crawl-{i:05d}.warc.gz", n=3))

    # nonexistent locator path
    got = (
        read_warc(spark, str(d), dump_index=str(tmp_path / "nope"))
        .filter(F.col("record_id") == "<urn:x:1>")
        .collect()
    )
    assert len(got) == 2

    # foreign dataset (a real shardpack dataset without locator metadata)
    other = str(tmp_path / "foreign")
    spark.createDataFrame(
        [("k", {}, [])],
        "key string, metadata map<string,string>, "
        "entries array<struct<file_name:string,content_type:string,"
        "encoding:string,size:bigint,data:binary>>",
    ).write.format("shardpack").mode("append").save(other)
    got2 = (
        read_warc(spark, str(d), dump_index=other)
        .filter(F.col("record_id") == "<urn:x:1>")
        .collect()
    )
    assert len(got2) == 2


def test_cli_warc_cat_dump_index(spark, tmp_path, capsys):
    from shardpack_spark.__main__ import main
    from shardpack_spark.operators.webcorpus import warc_dump_index

    d = tmp_path / "dump"
    d.mkdir()
    _write(d, "a.warc.gz", n=3)
    out = str(tmp_path / "locator")
    warc_dump_index(spark, str(d), out)
    assert main(["warc-cat", "ignored.warc.gz", "<urn:x:1>", "--dump-index", out]) == 0
    assert capsys.readouterr().out.startswith("payload 1 ")
    assert main(["warc-cat", "x", "<urn:absent>", "--dump-index", out]) == 1


def test_cli_warc_dump_index_sequential_twin(tmp_path, capsys):
    """The Spark-free CLI builder produces a locator the same lookup
    path serves — whole loop without pyspark (mixed sidecar/headers-only
    archives, uri-keyed variant too)."""
    from shardpack_spark.__main__ import main

    d = tmp_path / "dump"
    d.mkdir()
    WI.build_warc_index(_write(d, "a.warc.gz", n=3))
    _write(d, "b.warc.gz", n=4)  # no sidecar: headers-only parse path
    out = str(tmp_path / "locator")
    assert main(["warc-dump-index", str(d), out]) == 0
    rep = json.loads(capsys.readouterr().out)
    assert rep["files"] == 2 and rep["records"] == 7  # 3 + 4 responses
    hits = WI.lookup_via_dump_index(out, "<urn:x:2>")
    assert len(hits) == 2 and all(h.payload.startswith(b"payload 2 ") for h in hits)

    out2 = str(tmp_path / "by_uri")
    assert main(["warc-dump-index", str(d), out2, "--key", "target_uri"]) == 0
    capsys.readouterr()
    assert len(WI.lookup_via_dump_index(out2, "http://ex.com/3")) == 1


# --- torn-sidecar honesty + bounded coverage (round 9) -----------------------


def test_iter_index_rows_status(tmp_path):
    """status['complete'] is True only for a cleanly finished stream:
    torn tails and header-count mismatches both report incomplete."""
    p = _write(tmp_path, "a.warc.gz", n=4)
    WI.build_warc_index(p)
    st: dict = {}
    rows = list(WI.iter_index_rows(p, status=st))
    assert len(rows) == 4 and st["complete"] and st["rows"] == 4

    # torn mid-row: stream stops at the damage, complete goes False
    ip = p + WI.INDEX_SUFFIX
    data = open(ip, "rb").read()
    lines_s = data.splitlines(keepends=True)
    open(ip, "wb").write(b"".join(lines_s[:-2]) + lines_s[-2][:-10])
    st2: dict = {}
    rows2 = list(WI.iter_index_rows(p, status=st2))
    assert len(rows2) < 4 and not st2["complete"]

    # torn exactly at a NEWLINE boundary (whole trailer line dropped):
    # every remaining line parses cleanly, so only the {"end": N}
    # trailer can reveal the cut — the records=-1 header knows no count
    open(ip, "wb").write(b"".join(lines_s[:-1]))
    st2b: dict = {}
    rows2b = list(WI.iter_index_rows(p, status=st2b))
    assert len(rows2b) == 4 and not st2b["complete"]
    # ...and dropping a full ROW plus the trailer is equally invisible
    # line-wise, equally caught
    open(ip, "wb").write(b"".join(lines_s[:-2]))
    st2c: dict = {}
    assert len(list(WI.iter_index_rows(p, status=st2c))) == 3
    assert not st2c["complete"]

    # count mismatch with CLEAN lines: a full row dropped from a sidecar
    # whose header recorded the true count (write_warc_index path)
    p2 = _write(tmp_path, "b.warc.gz", n=4)
    WI.build_warc_index(p2)
    idx = WI.read_warc_index(p2)
    WI.write_warc_index(p2, idx.rows, idx.archive_size)  # header records=4
    ip2 = p2 + WI.INDEX_SUFFIX
    lines = open(ip2, "rb").read().splitlines(keepends=True)
    open(ip2, "wb").write(b"".join(lines[:-1]))
    st3: dict = {}
    rows3 = list(WI.iter_index_rows(p2, status=st3))
    assert len(rows3) == 3 and not st3["complete"]

    # abandoning the generator early never reports complete
    st4: dict = {}
    next(WI.iter_index_rows(p2, status=st4))
    assert not st4["complete"]


def test_row_offset_at_respects_size_bound(tmp_path):
    """The probe's size parameter is a hard read bound: no row completing
    inside [pos, size) means None, and bytes past size are never read."""
    from shardpack_spark.format import storage

    p = _write(tmp_path, "a.warc.gz", n=4)
    WI.build_warc_index(p)
    ip = p + WI.INDEX_SUFFIX
    be = storage.for_path(ip)
    full = os.path.getsize(ip)
    assert WI._row_offset_at(be, ip, 0, 10) is None  # bound inside the header
    assert WI._row_offset_at(be, ip, full, full) is None  # pos at the bound
    off, line_start = WI._row_offset_at(be, ip, 0, full)
    assert off == 0 and line_start > 0  # first row, after the header line


def test_locator_rows_for_archive_torn_sidecar(tmp_path):
    """A torn sidecar is discarded whole and the archive re-parsed
    headers-only — the per-archive locator unit is always complete."""
    p = _write(tmp_path, "a.warc.gz", n=5)
    WI.build_warc_index(p)
    rows = WI.locator_rows_for_archive(p)
    assert [r[0] for r in rows] == [f"<urn:x:{i}>" for i in range(5)]

    ip = p + WI.INDEX_SUFFIX
    data = open(ip, "rb").read()
    open(ip, "wb").write(data[:-15])
    rows2 = WI.locator_rows_for_archive(p)
    assert [r[0] for r in rows2] == [r[0] for r in rows]

    # uri-keyed twin takes the same fallback
    rows3 = WI.locator_rows_for_archive(p, key="target_uri")
    assert [r[0] for r in rows3] == [f"http://ex.com/{i}" for i in range(5)]


def test_dump_index_torn_sidecar_stays_honest(spark, tmp_path):
    """ADVICE r8 (medium): an archive whose sidecar is torn must not be
    declared covered off the partial row stream — records after the tear
    would MISS in the locator and covered-MISS pruning would drop rows a
    full scan returns.  The build's full-parse fallback keeps coverage
    honest, so the late record resolves through the locator AND through
    coverage-trusting pushdown."""
    from pyspark.sql import functions as F

    from shardpack_spark.format.warc_source import read_warc
    from shardpack_spark.operators.webcorpus import warc_dump_index

    d = tmp_path / "dump"
    d.mkdir()
    WI.build_warc_index(_write(d, "crawl-00000.warc.gz", n=3))
    p1 = _write(d, "crawl-00001.warc.gz", n=6)
    WI.build_warc_index(p1)
    ip = p1 + WI.INDEX_SUFFIX
    data = open(ip, "rb").read()
    open(ip, "wb").write(data[: len(data) // 2])
    st: dict = {}
    seen = list(WI.iter_index_rows(p1, status=st))
    assert 0 < len(seen) < 6 and not st.get("complete")  # the tear hides the tail

    loc = str(tmp_path / "locator")
    warc_dump_index(spark, str(d), loc)
    assert len(WI.lookup_via_dump_index(loc, "<urn:x:5>")) == 1
    got = (
        read_warc(spark, str(d), dump_index=loc)
        .filter(F.col("record_id") == "<urn:x:5>")
        .collect()
    )
    assert len(got) == 1 and got[0].payload.startswith(b"payload 5 ")


def test_lookup_partitions_torn_sidecar_whole_file(spark, tmp_path):
    """_lookup_partitions' analog of the same hazard: a torn sidecar
    falls back to ONE whole-file scan (never pruned ranges that would
    miss post-tear records, never overlapping ranges that would
    duplicate rows)."""
    from pyspark.sql import functions as F

    from shardpack_spark.format.warc_source import _lookup_partitions, read_warc

    d = tmp_path / "dump"
    d.mkdir()
    p = _write(d, "a.warc.gz", n=6)
    WI.build_warc_index(p)
    ip = p + WI.INDEX_SUFFIX
    data = open(ip, "rb").read()
    open(ip, "wb").write(data[: len(data) // 2])

    parts = _lookup_partitions([p], ["<urn:x:5>"], [])
    assert len(parts) == 1 and parts[0].start == 0 and parts[0].end is None

    # engine-level: a visible-row hit plus a post-tear hit — each exactly once
    got = (
        read_warc(spark, str(d))
        .filter(F.col("record_id").isin(["<urn:x:0>", "<urn:x:5>"]))
        .collect()
    )
    assert sorted(r.record_id for r in got) == ["<urn:x:0>", "<urn:x:5>"]


def test_coverage_side_object_bounded(tmp_path):
    """VERDICT r8 #3: 10k covered archives round-trip through a
    content-addressed side object while the user_metadata fields stay
    fixed-size; legacy inline coverage still reads; unreadable refs mean
    coverage-unknown (None), never a guess."""
    ds = str(tmp_path / "loc")
    os.makedirs(ds)
    names = {f"s3://crawl/segments/{i:06d}.warc.gz" for i in range(10_000)}
    meta = WI.write_warc_coverage(ds, names)
    assert len(json.dumps(meta)) < 200
    assert WI.read_warc_coverage(ds, meta) == names
    assert WI.write_warc_coverage(ds, names) == meta  # content-addressed dedupe
    assert len(os.listdir(os.path.join(ds, WI.COVERAGE_DIR))) == 1

    # an append writes a NEW object; the old ref still resolves (each
    # manifest version keeps referencing the object it committed with)
    meta2 = WI.write_warc_coverage(ds, names | {"x.warc.gz"})
    assert meta2["warc_covered_ref"] != meta["warc_covered_ref"]
    assert WI.read_warc_coverage(ds, meta) == names
    assert len(WI.read_warc_coverage(ds, meta2)) == 10_001

    assert WI.read_warc_coverage(ds, {"warc_covered": json.dumps(["a", "b"])}) == {"a", "b"}
    assert WI.read_warc_coverage(ds, {"warc_covered_ref": f"{WI.COVERAGE_DIR}/nope.json.gz"}) is None
    assert WI.read_warc_coverage(ds, {"warc_covered_ref": "/etc/hostname"}) is None
    assert WI.read_warc_coverage(ds, {"warc_covered_ref": "../../escape.json.gz"}) is None
    assert WI.read_warc_coverage(ds, {}) is None


def test_locator_manifest_metadata_bounded(spark, tmp_path):
    """End-to-end: locator builds record a fixed-size coverage ref in the
    manifest (never the O(archives) inline list), appends keep it
    bounded, and coverage decisions are unchanged."""
    from shardpack_spark.format import manifest as MF
    from shardpack_spark.operators.webcorpus import warc_dump_index

    d = tmp_path / "dump"
    d.mkdir()
    for i in range(3):
        WI.build_warc_index(_write(d, f"crawl-{i:05d}.warc.gz", n=3))
    loc = str(tmp_path / "locator")
    warc_dump_index(spark, str(d), loc)
    um = (MF._load_manifest(loc) or {}).get("user_metadata") or {}
    assert "warc_covered" not in um and um.get("warc_key") == "record_id"
    assert int(um["warc_covered_count"]) == 3 and len(json.dumps(um)) < 300
    assert WI.read_warc_coverage(loc, um) == {
        str(d / f"crawl-{i:05d}.warc.gz") for i in range(3)
    }

    p3 = _write(d, "crawl-00003.warc.gz", n=3)
    WI.build_warc_index(p3)
    warc_dump_index(spark, str(d), loc, mode="append", files=[p3])
    um2 = (MF._load_manifest(loc) or {}).get("user_metadata") or {}
    assert int(um2["warc_covered_count"]) == 4 and len(json.dumps(um2)) < 300
    assert str(p3) in WI.read_warc_coverage(loc, um2)


def test_cli_dump_index_serves_pushdown(spark, tmp_path, capsys):
    """ADVICE r8: the CLI sequential twin records warc_key + coverage, so
    a CLI-built locator serves format('warc') dump_index pushdown exactly
    like the Spark builder's — including covered-MISS prune-to-zero and
    append-mode coverage merge."""
    from pyspark.sql import functions as F
    from pyspark.sql.datasource import EqualTo

    from shardpack_spark.__main__ import main
    from shardpack_spark.format.warc_source import WarcPushdownReader, read_warc

    d = tmp_path / "dump"
    d.mkdir()
    for i in range(2):
        WI.build_warc_index(_write(d, f"crawl-{i:05d}.warc.gz", n=3))
    loc = str(tmp_path / "locator")
    assert main(["warc-dump-index", str(d), loc]) == 0
    capsys.readouterr()

    r = WarcPushdownReader({"path": str(d), "dump_index": loc})
    r.pushFilters([EqualTo(("record_id",), "<urn:x:1>")])
    parts = r.partitions()
    assert len(parts) == 2 and all(pt.end == pt.start + 1 for pt in parts)

    r2 = WarcPushdownReader({"path": str(d), "dump_index": loc})
    r2.pushFilters([EqualTo(("record_id",), "<urn:absent>")])
    sent = r2.partitions()
    assert len(sent) == 1 and sent[0].start == sent[0].end == 0

    got = (
        read_warc(spark, str(d), dump_index=loc)
        .filter(F.col("record_id") == "<urn:x:1>")
        .collect()
    )
    assert len(got) == 2

    # CLI append merges coverage like the Spark builder
    p2 = _write(d, "crawl-00002.warc.gz", n=3)
    assert main(["warc-dump-index", str(d), loc, "--mode", "append"]) == 0
    capsys.readouterr()
    from shardpack_spark.format import manifest as MF

    um = (MF._load_manifest(loc) or {}).get("user_metadata") or {}
    assert int(um["warc_covered_count"]) == 3
    r3 = WarcPushdownReader({"path": str(d), "dump_index": loc})
    r3.pushFilters([EqualTo(("record_id",), "<urn:x:1>")])
    assert all(pt.end == pt.start + 1 for pt in r3.partitions())


def test_vacuum_reclaims_stranded_coverage_objects(spark, tmp_path):
    """Each locator rebuild points at a new content-addressed coverage
    object; vacuum reclaims the ones no retained snapshot references and
    keeps the live one readable."""
    from shardpack_spark.format import manifest as MF
    from shardpack_spark.format.datasource import vacuum
    from shardpack_spark.operators.webcorpus import warc_dump_index

    d = tmp_path / "dump"
    d.mkdir()
    p0 = _write(d, "crawl-00000.warc.gz", n=3)
    WI.build_warc_index(p0)
    loc = str(tmp_path / "locator")
    warc_dump_index(spark, str(d), loc)
    p1 = _write(d, "crawl-00001.warc.gz", n=3)
    WI.build_warc_index(p1)
    warc_dump_index(spark, str(d), loc)  # overwrite: new coverage object
    covdir = os.path.join(loc, WI.COVERAGE_DIR)
    assert len(os.listdir(covdir)) == 2

    rep = vacuum(loc, keep_versions=1, grace_seconds=0)
    assert any("_warc_coverage" in f for f in rep["deleted_debris"])
    assert len(os.listdir(covdir)) == 1
    um = (MF._load_manifest(loc) or {}).get("user_metadata") or {}
    cov = WI.read_warc_coverage(loc, um)
    assert cov == {p0, p1}
    assert len(WI.lookup_via_dump_index(loc, "<urn:x:1>")) == 2


# --- property fuzz -------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    n=st.integers(min_value=1, max_value=12),
    damage=st.one_of(st.none(), st.integers(min_value=0, max_value=11)),
    data=st.data(),
)
def test_fuzz_stream_materialize_parity(tmp_path_factory, n, damage, data):
    """For any archive (optionally with one corrupted member), the
    STREAMED sidecar view equals the materialized one, split ranges cover
    the file exactly, and every seek point re-parses."""
    tmp_path = tmp_path_factory.mktemp("fz")
    p = str(tmp_path / "a.warc.gz")
    W.write_warc(p, _mk_records(n))
    if damage is not None and damage < n:
        raw = bytearray(open(p, "rb").read())
        starts = []
        i = -1
        while True:
            i = raw.find(b"\x1f\x8b\x08", i + 1)
            if i < 0:
                break
            starts.append(i)
        victim = data.draw(st.sampled_from(range(len(starts))), label="victim")
        raw[starts[victim] + 20] ^= 0xFF
        open(p, "wb").write(bytes(raw))
    WI.build_warc_index(p)

    streamed = list(WI.iter_index_rows(p))
    idx = WI.read_warc_index(p)
    assert idx is not None and streamed == idx.rows
    assert [r.offset for r in streamed] == sorted(r.offset for r in streamed)

    size = os.path.getsize(p)
    target = data.draw(st.integers(min_value=1, max_value=size + 10), label="target")
    ranges = WI.split_ranges_for(p, target)
    if ranges is None:  # size <= target: whole-file fallback by contract
        assert size <= target
    else:
        assert ranges[0][0] == 0 and ranges[-1][1] == size
        assert all(e1 == s2 for (_, e1), (s2, _) in zip(ranges, ranges[1:]))
        # union of range scans == sequential scan
        seq = [(r.offset, r.record_id) for r in W.iter_warc_records(open(p, "rb"))]
        par = []
        for s_, e_ in ranges:
            with open(p, "rb") as f:
                par.extend(
                    (r.offset, r.record_id)
                    for r in W.iter_warc_records(f, start_offset=s_, end_offset=e_)
                )
        assert sorted(par) == sorted(seq)

    # coarse grid + task-side snap (the executor split path,
    # _plan_file_partitions -> snap_bounds) also unions to the
    # sequential scan, for the same fuzzed target — including a torn
    # sidecar row set when the damaged member parses as an error row
    seq_all = [
        (r.offset, r.record_id, r.parse_error is not None)
        for r in W.iter_warc_records(open(p, "rb"))
    ]
    par2 = []
    for s_ in range(0, size, target):
        b = WI.snap_bounds(p, s_, min(s_ + target, size))
        assert b is not None
        seek, stop = b
        if seek is None:
            continue
        with open(p, "rb") as f:
            par2.extend(
                (r.offset, r.record_id, r.parse_error is not None)
                for r in W.iter_warc_records(f, start_offset=seek, end_offset=stop)
            )
    assert sorted(par2) == sorted(seq_all)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=6), min_size=1, max_size=4),
    data=st.data(),
)
def test_fuzz_dump_locator_lookup_parity(tmp_path_factory, sizes, data):
    """For any dump shape (archive count/sizes, random sidecar presence),
    the Spark-free locator build + lookup_via_dump_index returns exactly
    the records a sequential scan of every archive would — per id, the
    match count equals the number of archives containing it."""
    from shardpack_spark.__main__ import main

    tmp_path = tmp_path_factory.mktemp("dl")
    d = tmp_path / "dump"
    d.mkdir()
    for i, n in enumerate(sizes):
        p = _write(d, f"crawl-{i:05d}.warc.gz", n=n)
        if data.draw(st.booleans(), label=f"sidecar-{i}"):
            WI.build_warc_index(p)
    out = str(tmp_path / "locator")
    assert main(["warc-dump-index", str(d), out]) == 0

    for j in range(max(sizes)):
        hits = WI.lookup_via_dump_index(out, f"<urn:x:{j}>")
        assert len(hits) == sum(1 for n in sizes if n > j), (j, sizes)
        assert all(h.payload.startswith(f"payload {j} ".encode()) for h in hits)
    assert WI.lookup_via_dump_index(out, "<urn:x:absent>") == []
