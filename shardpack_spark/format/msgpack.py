"""Minimal pure-Python MessagePack codec.

The shardpack spec recommends ``application/msgpack`` alongside
``application/json`` for record metadata entries
(/root/reference/docs/draft.md:185-195, :92-94); this container has no
msgpack library installed, so the subset needed for metadata payloads is
implemented here from the public format specification
(https://github.com/msgpack/msgpack/blob/master/spec.md): nil, bool,
all int widths, float32/64, str, bin, array, map.  Ext types are not
metadata shapes and raise.

Arrow-batched decode of msgpack *entries* lives in
``operators.multimodal.decode_msgpack_entries``; this module is plain
bytes<->object and is also used driver-side in tests.
"""

from __future__ import annotations

import struct


class MsgPackError(ValueError):
    pass


def packb(obj) -> bytes:
    """Serialize nil/bool/int/float/str/bytes/list/dict to msgpack bytes."""
    out = bytearray()
    _pack(obj, out)
    return bytes(out)


def _pack(obj, out: bytearray) -> None:
    if obj is None:
        out.append(0xC0)
    elif obj is True:
        out.append(0xC3)
    elif obj is False:
        out.append(0xC2)
    elif isinstance(obj, int):
        if 0 <= obj <= 0x7F:
            out.append(obj)
        elif -32 <= obj < 0:
            out.append(obj & 0xFF)
        elif 0 <= obj <= 0xFF:
            out += b"\xcc" + obj.to_bytes(1, "big")
        elif 0 <= obj <= 0xFFFF:
            out += b"\xcd" + obj.to_bytes(2, "big")
        elif 0 <= obj <= 0xFFFFFFFF:
            out += b"\xce" + obj.to_bytes(4, "big")
        elif 0 <= obj <= 0xFFFFFFFFFFFFFFFF:
            out += b"\xcf" + obj.to_bytes(8, "big")
        elif -0x80 <= obj < 0:
            out += b"\xd0" + obj.to_bytes(1, "big", signed=True)
        elif -0x8000 <= obj < 0:
            out += b"\xd1" + obj.to_bytes(2, "big", signed=True)
        elif -0x80000000 <= obj < 0:
            out += b"\xd2" + obj.to_bytes(4, "big", signed=True)
        elif -0x8000000000000000 <= obj < 0:
            out += b"\xd3" + obj.to_bytes(8, "big", signed=True)
        else:
            raise MsgPackError(f"int out of 64-bit range: {obj}")
    elif isinstance(obj, float):
        out += b"\xcb" + struct.pack(">d", obj)
    elif isinstance(obj, str):
        b = obj.encode("utf-8")
        n = len(b)
        if n <= 31:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += b"\xd9" + n.to_bytes(1, "big")
        elif n <= 0xFFFF:
            out += b"\xda" + n.to_bytes(2, "big")
        else:
            out += b"\xdb" + n.to_bytes(4, "big")
        out += b
    elif isinstance(obj, (bytes, bytearray)):
        n = len(obj)
        if n <= 0xFF:
            out += b"\xc4" + n.to_bytes(1, "big")
        elif n <= 0xFFFF:
            out += b"\xc5" + n.to_bytes(2, "big")
        else:
            out += b"\xc6" + n.to_bytes(4, "big")
        out += bytes(obj)
    elif isinstance(obj, (list, tuple)):
        n = len(obj)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out += b"\xdc" + n.to_bytes(2, "big")
        else:
            out += b"\xdd" + n.to_bytes(4, "big")
        for v in obj:
            _pack(v, out)
    elif isinstance(obj, dict):
        n = len(obj)
        if n <= 15:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out += b"\xde" + n.to_bytes(2, "big")
        else:
            out += b"\xdf" + n.to_bytes(4, "big")
        for k, v in obj.items():
            _pack(k, out)
            _pack(v, out)
    else:
        raise MsgPackError(f"unpackable type: {type(obj).__name__}")


MAX_DEPTH = 256


def unpackb(data: bytes):
    """Deserialize one msgpack object; trailing bytes are an error.

    Every malformed-input failure surfaces as MsgPackError — invalid
    UTF-8 in a str, an unhashable (array/map) map key, and
    deeper-than-MAX_DEPTH nesting included — so callers can catch the
    module's declared error type instead of leaking UnicodeDecodeError /
    TypeError / RecursionError out of a decode.
    """
    obj, pos = _unpack(memoryview(data), 0)
    if pos != len(data):
        raise MsgPackError(f"{len(data) - pos} trailing bytes")
    return obj


def _utf8(raw: memoryview) -> str:
    try:
        return str(raw, "utf-8")
    except UnicodeDecodeError as ex:
        raise MsgPackError(f"invalid utf-8 in str: {ex}") from None


def _take(buf: memoryview, pos: int, n: int) -> tuple[memoryview, int]:
    if pos + n > len(buf):
        raise MsgPackError("truncated msgpack data")
    return buf[pos : pos + n], pos + n


def _unpack(buf: memoryview, pos: int, depth: int = 0):
    if depth > MAX_DEPTH:
        raise MsgPackError(f"nesting deeper than {MAX_DEPTH}")
    head, pos = _take(buf, pos, 1)
    c = head[0]
    if c <= 0x7F:
        return c, pos
    if c >= 0xE0:
        return c - 0x100, pos
    if 0xA0 <= c <= 0xBF:
        raw, pos = _take(buf, pos, c & 0x1F)
        return _utf8(raw), pos
    if 0x90 <= c <= 0x9F:
        return _unpack_array(buf, pos, c & 0x0F, depth)
    if 0x80 <= c <= 0x8F:
        return _unpack_map(buf, pos, c & 0x0F, depth)
    if c == 0xC0:
        return None, pos
    if c == 0xC2:
        return False, pos
    if c == 0xC3:
        return True, pos
    if c in (0xCC, 0xCD, 0xCE, 0xCF):  # uint 8/16/32/64
        n = 1 << (c - 0xCC)
        raw, pos = _take(buf, pos, n)
        return int.from_bytes(raw, "big"), pos
    if c in (0xD0, 0xD1, 0xD2, 0xD3):  # int 8/16/32/64
        n = 1 << (c - 0xD0)
        raw, pos = _take(buf, pos, n)
        return int.from_bytes(raw, "big", signed=True), pos
    if c == 0xCA:
        raw, pos = _take(buf, pos, 4)
        return struct.unpack(">f", raw)[0], pos
    if c == 0xCB:
        raw, pos = _take(buf, pos, 8)
        return struct.unpack(">d", raw)[0], pos
    if c in (0xD9, 0xDA, 0xDB):  # str 8/16/32
        n = 1 << (c - 0xD9)
        raw, pos = _take(buf, pos, n)
        ln = int.from_bytes(raw, "big")
        raw, pos = _take(buf, pos, ln)
        return _utf8(raw), pos
    if c in (0xC4, 0xC5, 0xC6):  # bin 8/16/32
        n = 1 << (c - 0xC4)
        raw, pos = _take(buf, pos, n)
        ln = int.from_bytes(raw, "big")
        raw, pos = _take(buf, pos, ln)
        return bytes(raw), pos
    if c in (0xDC, 0xDD):  # array 16/32
        n = 2 << (c - 0xDC)
        raw, pos = _take(buf, pos, n)
        return _unpack_array(buf, pos, int.from_bytes(raw, "big"), depth)
    if c in (0xDE, 0xDF):  # map 16/32
        n = 2 << (c - 0xDE)
        raw, pos = _take(buf, pos, n)
        return _unpack_map(buf, pos, int.from_bytes(raw, "big"), depth)
    raise MsgPackError(f"unsupported msgpack type byte 0x{c:02x} (ext?)")


def _unpack_array(buf: memoryview, pos: int, n: int, depth: int = 0):
    out = []
    for _ in range(n):
        v, pos = _unpack(buf, pos, depth + 1)
        out.append(v)
    return out, pos


def _unpack_map(buf: memoryview, pos: int, n: int, depth: int = 0):
    out = {}
    for _ in range(n):
        k, pos = _unpack(buf, pos, depth + 1)
        v, pos = _unpack(buf, pos, depth + 1)
        if isinstance(k, (list, dict)):
            raise MsgPackError(f"unhashable map key type: {type(k).__name__}")
        out[k] = v
    return out, pos
