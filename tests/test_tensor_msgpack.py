"""Tensor (npy/npz) and msgpack entry decoding: the spec's recommended
content types (draft.md:185-195) round-trip through the Arrow-batched
decoders, and the pure-Python msgpack codec is fuzzed against itself."""

from __future__ import annotations

import io
import json
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from shardpack_spark.format.msgpack import MsgPackError, packb, unpackb
from shardpack_spark.operators import multimodal as mm

REC_SCHEMA = (
    "key string, metadata map<string,string>, entries array<struct<"
    "file_name:string,content_type:string,encoding:string,size:long,data:binary>>"
)


def _entry(fname: str, ctype: str, payload: bytes):
    return (fname, ctype, "none", len(payload), bytearray(payload))


def _npy_bytes(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def _npz_bytes(**arrays) -> bytes:
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


# ---------------------------------------------------------------- msgpack


CASES = [
    None,
    True,
    False,
    0,
    1,
    127,
    128,
    255,
    256,
    65535,
    65536,
    2**32,
    2**64 - 1,
    -1,
    -32,
    -33,
    -128,
    -129,
    -32768,
    -32769,
    -(2**31),
    -(2**63),
    1.5,
    -0.25,
    "",
    "hello",
    "x" * 31,
    "x" * 32,
    "x" * 256,
    "héllo wörld ✓",
    b"",
    b"\x00\xff" * 100,
    [],
    [1, "two", None, [3.0, b"four"]],
    {},
    {"a": 1, "b": [True, {"c": None}], "d": "e"},
    list(range(20)),  # array16
    {f"k{i}": i for i in range(20)},  # map16
]


@pytest.mark.parametrize("obj", CASES, ids=range(len(CASES)))
def test_msgpack_roundtrip(obj):
    assert unpackb(packb(obj)) == obj


def test_msgpack_float32_and_errors():
    # float32 decodes (we always encode float64, but must read both)
    import struct

    assert unpackb(b"\xca" + struct.pack(">f", 2.5)) == 2.5
    with pytest.raises(MsgPackError):
        unpackb(packb([1, 2]) + b"\x00")  # trailing bytes
    with pytest.raises(MsgPackError):
        unpackb(b"\xd9")  # truncated
    with pytest.raises(MsgPackError):
        unpackb(b"\xc7\x01\x00\x00")  # ext type
    with pytest.raises(MsgPackError):
        packb(object())


def test_msgpack_hypothesis_fuzz():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    scalars = st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-(2**63), max_value=2**64 - 1),
        st.floats(allow_nan=False),
        st.text(max_size=40),
        st.binary(max_size=40),
    )
    nested = st.recursive(
        scalars,
        lambda inner: st.one_of(
            st.lists(inner, max_size=8),
            st.dictionaries(st.text(max_size=10), inner, max_size=8),
        ),
        max_leaves=30,
    )

    @settings(max_examples=150, deadline=None)
    @given(nested)
    def roundtrip(obj):
        assert unpackb(packb(obj)) == obj

    roundtrip()


# ---------------------------------------------------------------- tensors


def test_decode_npy_and_npz_entries(spark):
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    b = np.array([[1, -2], [3, -4]], dtype=np.int16)
    s = np.array(["x", "y"])  # non-numeric: metadata only
    df = spark.createDataFrame(
        [
            ("t/1", {}, [_entry("emb.npy", "application/x-npy", _npy_bytes(a))]),
            (
                "t/2",
                {},
                [_entry("pair.npz", "application/x-npz", _npz_bytes(ints=b, strs=s))],
            ),
            ("t/3", {}, [_entry("doc.txt", "text/plain", b"not a tensor")]),
        ],
        REC_SCHEMA,
    )
    rows = {
        (r["key"], r["member"]): r
        for r in mm.decode_npy_entries(df).collect()
    }
    assert set(rows) == {("t/1", None), ("t/2", "ints"), ("t/2", "strs")}

    r = rows[("t/1", None)]
    assert (r["dtype"], r["shape"]) == ("float32", [3, 4])
    assert r["values"] == a.astype("float64").ravel().tolist()

    r = rows[("t/2", "ints")]
    assert (r["dtype"], r["shape"]) == ("int16", [2, 2])
    assert r["values"] == [1.0, -2.0, 3.0, -4.0]

    r = rows[("t/2", "strs")]
    assert r["values"] is None and r["shape"] == [2]


def test_npy_values_feed_similarity_ops(spark):
    """Decoded tensors are plain array<double> — they compose with the
    vector operators (norm via aggregate HOF here)."""
    vecs = [np.array([3.0, 4.0]), np.array([6.0, 8.0])]
    df = spark.createDataFrame(
        [
            (f"v/{i}", {}, [_entry("v.npy", "application/x-npy", _npy_bytes(v))])
            for i, v in enumerate(vecs)
        ],
        REC_SCHEMA,
    )
    out = (
        mm.decode_npy_entries(df)
        .select(
            "key",
            F.sqrt(
                F.aggregate(
                    "values", F.lit(0.0), lambda acc, x: acc + x * x
                )
            ).alias("norm"),
        )
        .collect()
    )
    norms = {r["key"]: r["norm"] for r in out}
    assert math.isclose(norms["v/0"], 5.0) and math.isclose(norms["v/1"], 10.0)


def test_decode_msgpack_entries(spark):
    meta = {"lang": "en", "score": 0.75, "tags": ["a", "b"], "n": 7, "raw": b"\x01\x02"}
    df = spark.createDataFrame(
        [
            ("m/1", {}, [_entry("meta.msgpack", "application/msgpack", packb(meta))]),
            ("m/2", {}, [_entry("meta.json", "application/json", b'{"lang":"de"}')]),
        ],
        REC_SCHEMA,
    )
    rows = mm.decode_msgpack_entries(df).collect()
    assert len(rows) == 1 and rows[0]["key"] == "m/1"
    obj = json.loads(rows[0]["json"])
    assert obj == {"lang": "en", "score": 0.75, "tags": ["a", "b"], "n": 7, "raw": "AQI="}

    # the canonical-JSON output runs through the same from_json path as
    # application/json entries
    extracted = (
        mm.decode_msgpack_entries(df)
        .select(F.get_json_object("json", "$.lang").alias("lang"))
        .collect()
    )
    assert extracted[0]["lang"] == "en"


def test_decode_msgpack_bytes_and_mixed_keys(spark):
    """Spec-valid maps with bytes / int / mixed keys decode instead of
    crashing json.dumps (keys stringify deterministically)."""
    meta = {b"raw": 1, 2: "two", True: "t", None: "n", "s": 3}
    df = spark.createDataFrame(
        [("m/k", {}, [_entry("meta.msgpack", "application/msgpack", packb(meta))])],
        REC_SCHEMA,
    )
    [row] = mm.decode_msgpack_entries(df).collect()
    obj = json.loads(row["json"])
    assert obj == {"cmF3": 1, "2": "two", "true": "t", "null": "n", "s": 3}


def test_msgpack_malformed_raises_msgpack_error():
    from shardpack_spark.format.msgpack import MsgPackError, unpackb

    for bad in [
        b"\xa2\xff\xfe",          # fixstr with invalid utf-8
        b"\x81\x91\x01\x02",      # map with an array key
        b"\x91" * 1000 + b"\x01",  # 1000-deep nesting
    ]:
        with pytest.raises(MsgPackError):
            unpackb(bad)
