"""ShardPack codec tests: byte-level round-trip, property-based round-trip
under every available codec, corruption -> checksum error, offset
bookkeeping, rollover, golden layout bytes.

Mirrors the reference's writer test scenarios (src/shard/writer.rs:153-381)
plus the integration round-trip it left commented out (src/lib.rs:33-58).
"""

from __future__ import annotations

import hashlib
import struct

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from shardpack_spark.format import codec as C


def mk_record(key="k", data=b"hello", name="f.bin", ctype="application/octet-stream", meta=None):
    return C.Record(
        key=key,
        entries=[C.FileEntry(file_name=name, content_type=ctype, data=data)],
        metadata=meta or {},
    )


def test_round_trip_single_shard(tmp_path):
    path = str(tmp_path / "s.shardpack")
    w = C.ShardWriter(path)
    recs = [
        mk_record("a", b"payload-a", meta={"x": "1"}),
        C.Record(key="b", entries=[]),  # 0-entry record
        C.Record(
            key="c",
            entries=[
                C.FileEntry("left.jpg", "image/jpeg", b"\xff\xd8\xff" + b"j" * 100),
                C.FileEntry("meta.json", "application/json", b'{"stereo":true}'),
            ],
        ),
    ]
    for r in recs:
        w.write_record(r)
    res = w.close()
    assert res["records"] == 3

    got = list(C.iter_records(path))
    assert [r.key for r in got] == ["a", "b", "c"]
    assert got[0].metadata == {"x": "1"}
    assert got[2].entries[0].content_type == "image/jpeg"
    assert got[2].entries[1].data == b'{"stereo":true}'


def test_random_access_by_offset(tmp_path):
    path = str(tmp_path / "s.shardpack")
    w = C.ShardWriter(path)
    for i in range(10):
        w.write_record(mk_record(f"k{i}", bytes([i]) * (i + 1)))
    w.close()
    idx = C.read_index(path)
    assert len(idx.offsets) == 10
    r7 = C.read_record_at(path, idx.offsets[7])
    assert r7.key == "k7" and r7.entries[0].data == bytes([7]) * 8


def test_offset_bookkeeping(tmp_path):
    """Offsets strictly increase by the encoded block size (the reference's
    multi-entry offset accounting test, src/shard/writer.rs:282-314)."""
    path = str(tmp_path / "s.shardpack")
    w = C.ShardWriter(path)
    sizes = []
    for i in range(5):
        sizes.append(w.write_record(mk_record(f"k{i}", b"z" * (10 * i))))
    w.close()
    idx = C.read_index(path)
    expect = [0]
    for s in sizes[:-1]:
        expect.append(expect[-1] + s)
    assert idx.offsets == expect


def test_corruption_raises_checksum_error(tmp_path):
    path = str(tmp_path / "s.shardpack")
    w = C.ShardWriter(path)
    w.write_record(mk_record("k", b"A" * 64))
    w.close()
    raw = bytearray(open(path, "rb").read())
    # flip a payload byte (well inside the data region of the only entry)
    pos = raw.find(b"A" * 64)
    raw[pos + 5] ^= 0xFF
    open(path, "wb").write(bytes(raw))
    with pytest.raises(C.ShardPackChecksumError):
        list(C.iter_records(path))
    # verification can be disabled
    got = list(C.iter_records(path, verify_checksums=False))
    assert got[0].entries[0].data != b"A" * 64


def test_bad_magic(tmp_path):
    path = str(tmp_path / "s.shardpack")
    open(path, "wb").write(b"not a shardpack file at all....")
    with pytest.raises(C.ShardPackIndexError):
        C.read_index(path)


def test_rollover_writes_to_new_shard(tmp_path):
    """Byte-based rollover: each record goes to the shard chosen AFTER the
    rollover decision (the reference wrote to the old shard, D3)."""
    d = str(tmp_path / "ds")
    res = C.write_dataset(
        d,
        (mk_record(f"k{i}", b"x" * 1000) for i in range(10)),
        target_shard_bytes=2500,
    )
    paths = C.list_shards(d)
    assert len(paths) > 1
    assert [p.split("/")[-1] for p in paths][:2] == ["part-000000.shardpack", "part-000001.shardpack"]
    total = sum(r["records"] for r in res)
    assert total == 10
    keys = [r.key for p in paths for r in C.iter_records(p)]
    assert keys == [f"k{i}" for i in range(10)]


def test_entry_larger_than_target_still_written(tmp_path):
    d = str(tmp_path / "ds")
    C.write_dataset(d, [mk_record("big", b"B" * 10_000)], target_shard_bytes=100)
    got = [r for p in C.list_shards(d) for r in C.iter_records(p)]
    assert got[0].entries[0].data == b"B" * 10_000


@pytest.mark.parametrize("enc", sorted(C._CODECS))
def test_compression_codecs(tmp_path, enc):
    path = str(tmp_path / f"{enc}.shardpack")
    w = C.ShardWriter(path, compression=enc)
    data = b"compressible " * 500
    w.write_record(mk_record("k", data))
    w.close()
    got = list(C.iter_records(path))
    assert got[0].entries[0].data == data
    assert got[0].entries[0].encoding == enc


def test_unavailable_codec_raises():
    missing = {"lz4", "zstd", "snappy"} - set(C._CODECS)
    if not missing:
        pytest.skip("all codecs installed")
    with pytest.raises(C.ShardPackCodecError):
        C.compress(b"x", sorted(missing)[0])


def test_golden_layout_bytes():
    """Pin the exact byte layout so the format stays stable."""
    block = C.encode_record(C.Record(key="ab", entries=[C.FileEntry("f", "t", b"xyz")]))
    # record_size u64 | key u32+2 | meta u32(0) | n u32(1)
    #   | name u32+1 | ctype u32+1 | enc u32+4('none') | size u64(3)
    #   | sha256(32) | data_len u64(3) | 'xyz'
    expect_size = 8 + (4 + 2) + 4 + 4 + (4 + 1) + (4 + 1) + (4 + 4) + 8 + 32 + 8 + 3
    assert len(block) == expect_size
    assert struct.unpack_from("<Q", block, 0)[0] == expect_size
    assert block[12:14] == b"ab"
    assert block[-3:] == b"xyz"
    assert hashlib.sha256(b"xyz").digest() in block


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    recs=st.lists(
        st.tuples(
            st.text(min_size=0, max_size=20),  # key
            st.lists(
                st.tuples(
                    st.text(min_size=1, max_size=10),
                    st.binary(min_size=0, max_size=200),
                ),
                max_size=3,
            ),
            st.dictionaries(st.text(max_size=5), st.text(max_size=5), max_size=3),
        ),
        min_size=1,
        max_size=8,
    ),
    enc=st.sampled_from(sorted(C._CODECS)),
)
def test_property_round_trip(tmp_path_factory, recs, enc):
    d = tmp_path_factory.mktemp("prop")
    path = str(d / "s.shardpack")
    w = C.ShardWriter(path, compression=enc)
    records = [
        C.Record(
            key=k,
            entries=[C.FileEntry(n, "application/octet-stream", b) for n, b in ents],
            metadata=meta,
        )
        for k, ents, meta in recs
    ]
    for r in records:
        w.write_record(r)
    w.close()
    got = list(C.iter_records(path))
    assert len(got) == len(records)
    for orig, back in zip(records, got):
        assert back.key == orig.key
        assert back.metadata == orig.metadata
        assert [(e.file_name, e.data) for e in back.entries] == [
            (e.file_name, e.data) for e in orig.entries
        ]
