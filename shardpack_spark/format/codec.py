"""Pure-Python ShardPack codec.

Spec conformance (citations into /root/reference/docs/draft.md):
- shard = record blocks then EOF index           (draft.md:33-51)
- record block = header + key + metadata + M file entries (draft.md:55-94)
- file entry = name, content type, size, optional encoding, data
                                                 (draft.md:84-94)
- EOF index = record count, offset table, shard metadata, magic footer
                                                 (draft.md:100-123)
- random access via the offset table             (draft.md:124-127)
- sequential shard naming                        (draft.md:24-30)

Integrity: SHA-256 over the UNCOMPRESSED payload, stored per entry and
verified after decompression on read — the semantics of the reference's
compute/verify pair (src/checksum.rs:15-29) without its whole-shard read
bug (SURVEY.md D4).  Compression: none|gzip always; lz4|zstd|snappy when
the optional libraries are importable (the reference declares all five but
implements two — SURVEY.md D9; we gate instead of erroring at write time
with data loss).

All integers are little-endian.  Layout (exact bytes, this implementation):

  record block:
    u64  record_size        (total bytes of this block, incl. this field)
    u32  key_len,   key bytes (utf-8)
    u32  meta_len,  record metadata bytes (utf-8 JSON, '' -> 0)
    u32  n_entries
    per entry:
      u32 name_len,  file_name bytes
      u32 ctype_len, content_type bytes
      u32 enc_len,   encoding bytes ('none'|'gzip'|'lz4'|'zstd'|'snappy')
      u64 file_size            (uncompressed payload size)
      32B sha256(uncompressed payload)
      u64 data_len,  stored (possibly compressed) payload bytes
  EOF index:
    u64  n_records
    u64  offsets[n_records]   (file offset of each record block start)
    u32  shard_meta_len, shard metadata bytes (utf-8 JSON)
    u64  index_start          (file offset where the EOF index begins)
    8B   magic b"SHARDPK1"
"""

from __future__ import annotations

import functools
import gzip as _gzip
import hashlib
import io
import json
import os
import struct
from collections.abc import Iterable, Iterator
from dataclasses import dataclass, field

from shardpack_spark.format import storage, zstd_entropy

MAGIC = b"SHARDPK1"
DEFAULT_TARGET_SHARD_BYTES = 256 * 1024 * 1024  # reference src/shard/config.rs:1
# NOTE: no precompiled struct.Struct objects at module level — the
# whole module is cloudpickled by value into Spark plans and Struct
# instances are not picklable.


class ShardPackError(Exception):
    """Base error (reference taxonomy src/error.rs:4-14)."""


class ShardPackIOError(ShardPackError):
    pass


class ShardPackIndexError(ShardPackError):
    pass


class ShardPackChecksumError(ShardPackError):
    pass


class ShardPackCodecError(ShardPackError):
    pass


# --- compression codecs -----------------------------------------------------

def _gzip_c(b: bytes) -> bytes:
    # mtime=0 -> deterministic output for identical payloads
    buf = io.BytesIO()
    with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as f:
        f.write(b)
    return buf.getvalue()


def _lz4_compress(src: bytes) -> bytes:
    """LZ4 *block* format (greedy hash-chain-less matcher).

    Pure-Python implementation of the public LZ4 block spec so the codec
    declared by the reference (src/bucket.rs:16-25) is never dead code in
    environments without the `lz4` wheel.  Fixes the reference's bounded
    3x decompression-buffer bug (SURVEY.md D10) by construction: our
    container tracks the exact uncompressed size per entry.
    """
    src = bytes(src)
    n = len(src)
    out = bytearray()

    def emit(lit: bytes, mlen: int, offset: int) -> None:
        ll, ml = len(lit), mlen - 4 if mlen else 0
        token = (min(ll, 15) << 4) | (min(ml, 15) if mlen else 0)
        out.append(token)
        if ll >= 15:
            rest = ll - 15
            while rest >= 255:
                out.append(255)
                rest -= 255
            out.append(rest)
        out.extend(lit)
        if mlen:
            out.append(offset & 0xFF)
            out.append(offset >> 8)
            if ml >= 15:
                rest = ml - 15
                while rest >= 255:
                    out.append(255)
                    rest -= 255
                out.append(rest)

    table: dict[bytes, int] = {}
    i = anchor = 0
    # spec margins: last match must start >= 12 bytes from end; the final
    # 5 bytes are always literals
    limit = n - 12
    while i < limit:
        seq = src[i : i + 4]
        j = table.get(seq)
        table[seq] = i
        if j is not None and i - j <= 0xFFFF:
            m, k = i + 4, j + 4
            stop = n - 5
            while m < stop and src[m] == src[k]:
                m += 1
                k += 1
            emit(src[anchor:i], m - i, i - j)
            anchor = i = m
        else:
            i += 1
    emit(src[anchor:], 0, 0)
    return bytes(out)


def _lz4_decompress(src: bytes) -> bytes:
    src = bytes(src)
    n = len(src)
    out = bytearray()
    i = 0
    while i < n:
        token = src[i]
        i += 1
        ll = token >> 4
        if ll == 15:
            while True:
                b = src[i]
                i += 1
                ll += b
                if b != 255:
                    break
        out += src[i : i + ll]
        i += ll
        if i >= n:
            break  # final literals-only sequence
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        if offset == 0:
            raise ShardPackCodecError("lz4: zero match offset")
        ml = (token & 15) + 4
        if token & 15 == 15:
            while True:
                b = src[i]
                i += 1
                ml += b
                if b != 255:
                    break
        start = len(out) - offset
        if start < 0:
            raise ShardPackCodecError("lz4: match offset before block start")
        if offset >= ml:
            out += out[start : start + ml]
        else:  # overlapping match: replicate in offset-sized chunks
            while ml > 0:
                chunk = out[start : start + min(offset, ml)]
                out += chunk
                ml -= len(chunk)
    return bytes(out)


def _snappy_compress(src: bytes) -> bytes:
    """Snappy raw format: varint length preamble + literal / copy elements.

    Emits literals and 2-byte-offset copies (type-10) only — every
    decoder accepts that subset; our decoder handles all four element
    types."""
    src = bytes(src)
    n = len(src)
    out = bytearray()
    v = n
    while True:  # little-endian varint of the uncompressed length
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            break

    def emit_literal(lit: bytes) -> None:
        ln = len(lit)
        if ln == 0:
            return
        ln -= 1
        if ln < 60:
            out.append(ln << 2)
        elif ln < 1 << 8:
            out.append(60 << 2)
            out.append(ln)
        elif ln < 1 << 16:
            out.append(61 << 2)
            out.extend(ln.to_bytes(2, "little"))
        elif ln < 1 << 24:
            out.append(62 << 2)
            out.extend(ln.to_bytes(3, "little"))
        else:
            out.append(63 << 2)
            out.extend(ln.to_bytes(4, "little"))
        out.extend(lit)

    def emit_copy(offset: int, mlen: int) -> None:
        while mlen > 0:  # type-10 copies carry 1..64 bytes each
            step = min(mlen, 64)
            out.append(((step - 1) << 2) | 2)
            out.extend(offset.to_bytes(2, "little"))
            mlen -= step

    table: dict[bytes, int] = {}
    i = anchor = 0
    limit = n - 4
    while i < limit:
        seq = src[i : i + 4]
        j = table.get(seq)
        table[seq] = i
        if j is not None and i - j <= 0xFFFF:
            m, k = i + 4, j + 4
            while m < n and src[m] == src[k]:
                m += 1
                k += 1
            emit_literal(src[anchor:i])
            emit_copy(i - j, m - i)
            anchor = i = m
        else:
            i += 1
    emit_literal(src[anchor:])
    return bytes(out)


def _snappy_decompress(src: bytes) -> bytes:
    src = bytes(src)
    n = len(src)
    # varint preamble
    length = 0
    shift = 0
    i = 0
    while True:
        b = src[i]
        i += 1
        length |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    out = bytearray()
    while i < n:
        tag = src[i]
        i += 1
        typ = tag & 3
        if typ == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                nb = ln - 59
                ln = int.from_bytes(src[i : i + nb], "little")
                i += nb
            ln += 1
            out += src[i : i + ln]
            i += ln
            continue
        if typ == 1:  # copy, 1-byte offset
            ml = ((tag >> 2) & 0x7) + 4
            offset = ((tag >> 5) << 8) | src[i]
            i += 1
        elif typ == 2:  # copy, 2-byte offset
            ml = (tag >> 2) + 1
            offset = int.from_bytes(src[i : i + 2], "little")
            i += 2
        else:  # copy, 4-byte offset
            ml = (tag >> 2) + 1
            offset = int.from_bytes(src[i : i + 4], "little")
            i += 4
        if offset == 0:
            raise ShardPackCodecError("snappy: zero copy offset")
        start = len(out) - offset
        if start < 0:
            raise ShardPackCodecError("snappy: copy offset before stream start")
        if offset >= ml:
            out += out[start : start + ml]
        else:
            while ml > 0:
                chunk = out[start : start + min(offset, ml)]
                out += chunk
                ml -= len(chunk)
    if len(out) != length:
        raise ShardPackCodecError(f"snappy: decoded {len(out)} bytes, preamble said {length}")
    return bytes(out)


# --- zstd (pure-Python, RFC 8878) -------------------------------------------
#
# The fallback ENCODER emits real entropy-coded frames: per 128 KiB
# block it runs zstd_entropy's LZ77 greedy parse + predefined-FSE
# sequences + canonical-Huffman literals and keeps the Compressed block
# when it is smaller (RLE for constant runs, Raw otherwise) — so a
# wheel-free writer gets genuine compression, just at pure-Python speed
# (hence the one-time "slower" warning below).  The fallback DECODER
# reads ANY spec-compliant frame: Raw/RLE blocks here, entropy-coded
# (Compressed) blocks via zstd_entropy (full FSE + Huffman + sequence
# execution, RFC 8878 §3-4), so data zstd-compressed by pyarrow/libzstd
# elsewhere stays readable without any wheel.  Only dictionary frames
# raise (undecodable without the dictionary).

_ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"
_ZSTD_BLOCK_MAX = 128 * 1024  # Block_Maximum_Size (RFC 8878 §3.1.1.2.3)

_XX_P1 = 0x9E3779B185EBCA87
_XX_P2 = 0xC2B2AE3D27D4EB4F
_XX_P3 = 0x165667B19E3779F9
_XX_P4 = 0x85EBCA77C2B2AE63
_XX_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 (the zstd content checksum is its low 32 bits).

    Cross-checked against Spark's XxHash64 expression in
    tests/test_codec.py, so the two implementations vouch for each other.
    """
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _XX_P1 + _XX_P2) & _M64
        v2 = (seed + _XX_P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _XX_P1) & _M64
        while i <= n - 32:
            v1 = (_rotl64((v1 + int.from_bytes(data[i : i + 8], "little") * _XX_P2) & _M64, 31) * _XX_P1) & _M64
            v2 = (_rotl64((v2 + int.from_bytes(data[i + 8 : i + 16], "little") * _XX_P2) & _M64, 31) * _XX_P1) & _M64
            v3 = (_rotl64((v3 + int.from_bytes(data[i + 16 : i + 24], "little") * _XX_P2) & _M64, 31) * _XX_P1) & _M64
            v4 = (_rotl64((v4 + int.from_bytes(data[i + 24 : i + 32], "little") * _XX_P2) & _M64, 31) * _XX_P1) & _M64
            i += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h = (((h ^ ((_rotl64((v * _XX_P2) & _M64, 31) * _XX_P1) & _M64)) * _XX_P1) + _XX_P4) & _M64
    else:
        h = (seed + _XX_P5) & _M64
    h = (h + n) & _M64
    while i + 8 <= n:
        k = (_rotl64((int.from_bytes(data[i : i + 8], "little") * _XX_P2) & _M64, 31) * _XX_P1) & _M64
        h = ((_rotl64(h ^ k, 27) * _XX_P1) + _XX_P4) & _M64
        i += 8
    if i + 4 <= n:
        h = ((_rotl64(h ^ ((int.from_bytes(data[i : i + 4], "little") * _XX_P1) & _M64), 23) * _XX_P2) + _XX_P3) & _M64
        i += 4
    while i < n:
        h = (_rotl64(h ^ ((data[i] * _XX_P5) & _M64), 11) * _XX_P1) & _M64
        i += 1
    h ^= h >> 33
    h = (h * _XX_P2) & _M64
    h ^= h >> 29
    h = (h * _XX_P3) & _M64
    h ^= h >> 32
    return h


_zstd_fallback_warned = False


def _zstd_compress(src: bytes) -> bytes:
    # Honesty over silence: this pure-Python encoder emits real
    # entropy-coded frames (LZ77 + predefined-FSE sequences + Huffman
    # literals via zstd_entropy) but runs 10-100x slower than libzstd
    # and compresses somewhat less (single-probe greedy parse, no repeat
    # offsets).  It only engages when neither pyarrow nor zstandard is
    # importable; say so ONCE per process so a bulk-write deployment
    # knows why throughput dropped.
    global _zstd_fallback_warned
    if not _zstd_fallback_warned:
        _zstd_fallback_warned = True
        import warnings

        warnings.warn(
            "compression='zstd' is using the pure-Python fallback encoder "
            "(no pyarrow/zstandard in this environment): frames are real "
            "entropy-coded zstd, but encoding is 10-100x slower than "
            "libzstd. Install pyarrow or zstandard for fast compression.",
            RuntimeWarning,
            stacklevel=3,
        )
    out = bytearray(_ZSTD_MAGIC)
    n = len(src)
    # Frame_Header_Descriptor: FCS-size flag in bits 7-6, Single_Segment
    # bit 5 (no Window_Descriptor; window = content size), checksum bit 2.
    if n <= 0xFF:
        fcs_flag, fcs = 0, n.to_bytes(1, "little")
    elif n - 256 <= 0xFFFF:
        fcs_flag, fcs = 1, (n - 256).to_bytes(2, "little")
    elif n <= 0xFFFFFFFF:
        fcs_flag, fcs = 2, n.to_bytes(4, "little")
    else:
        fcs_flag, fcs = 3, n.to_bytes(8, "little")
    out.append((fcs_flag << 6) | (1 << 5) | (1 << 2))
    out += fcs
    if n == 0:
        out += (1).to_bytes(3, "little")  # last=1, Raw, size 0
    i = 0
    lz_table: dict = {}  # 4-byte-hash -> recent positions, frame-wide
    rep = [1, 4, 8]  # §3.1.1.5 repeat-offset history, frame-wide
    while i < n:
        chunk = src[i : i + _ZSTD_BLOCK_MAX]
        start, i = i, i + len(chunk)
        last = 1 if i >= n else 0
        if len(chunk) >= 2 and chunk.count(chunk[0]) == len(chunk):
            # RLE block: size field = regenerated size, content = 1 byte
            out += (last | (1 << 1) | (len(chunk) << 3)).to_bytes(3, "little")
            out.append(chunk[0])
            continue
        body, rep_out = zstd_entropy.encode_compressed_block(
            src, start, i, lz_table, rep
        )
        if len(body) < len(chunk):
            out += (last | (2 << 1) | (len(body) << 3)).to_bytes(3, "little")
            out += body
            rep = rep_out  # decoder history advances only on decoded blocks
        else:
            out += (last | (0 << 1) | (len(chunk) << 3)).to_bytes(3, "little")
            out += chunk
    out += (_xxh64(src) & 0xFFFFFFFF).to_bytes(4, "little")
    return bytes(out)


_ZSTD_SKIP_LO = 0x184D2A50  # skippable frame magic range (RFC 8878 §3.1.2)
_ZSTD_SKIP_HI = 0x184D2A5F


def _zstd_decompress(src: bytes) -> bytes:
    # a truncated frame header must fail TYPED like every other corrupt
    # input (the body's src[i] byte reads raise IndexError on short input)
    try:
        return _zstd_decompress_inner(src)
    except IndexError as e:
        raise ShardPackCodecError(f"zstd: truncated frame: {e}") from e


def _zstd_decompress_inner(src: bytes) -> bytes:
    """Decode a zstd FILE: one or more concatenated frames, skippable
    frames ignored — `cat a.zst b.zst` and zstd-CLI outputs with
    metadata frames decode like the reference implementation, instead of
    silently truncating after the first frame."""
    if not src:
        raise ShardPackCodecError("zstd: empty input")
    out = bytearray()
    i = 0
    while i < len(src):
        magic = int.from_bytes(src[i : i + 4], "little")
        if _ZSTD_SKIP_LO <= magic <= _ZSTD_SKIP_HI:
            if i + 8 > len(src):
                raise ShardPackCodecError("zstd: truncated skippable frame")
            size = int.from_bytes(src[i + 4 : i + 8], "little")
            if i + 8 + size > len(src):
                raise ShardPackCodecError("zstd: truncated skippable frame")
            i += 8 + size
            continue
        if src[i : i + 4] != _ZSTD_MAGIC:
            raise ShardPackCodecError("zstd: bad magic")
        frame, i = _zstd_decode_frame(src, i + 4)
        out += frame
    return bytes(out)


def _zstd_decode_frame(src: bytes, i: int) -> tuple[bytes, int]:
    """Decode ONE frame whose header starts at ``i`` (past the magic);
    returns (content, offset past the frame)."""
    desc = src[i]
    i += 1
    fcs_flag = desc >> 6
    single_segment = bool(desc & 0x20)
    has_checksum = bool(desc & 0x04)
    dict_flag = desc & 0x03
    if not single_segment:
        i += 1  # Window_Descriptor
    if dict_flag:
        # a dictionary frame is undecodable without its dictionary by
        # definition — not a fallback limitation
        did = int.from_bytes(src[i : i + (0, 1, 2, 4)[dict_flag]], "little")
        if did != 0:
            raise ShardPackCodecError(f"zstd: dictionary frames unsupported (id {did})")
    i += (0, 1, 2, 4)[dict_flag]
    entropy_ctx: dict = {}
    fcs = None
    fcs_size = {0: 1 if single_segment else 0, 1: 2, 2: 4, 3: 8}[fcs_flag]
    if fcs_size:
        fcs = int.from_bytes(src[i : i + fcs_size], "little")
        if fcs_flag == 1:
            fcs += 256
        i += fcs_size
    out = bytearray()
    while True:
        if i + 3 > len(src):
            # a zero-filled "header" would read as a non-last Raw block of
            # size 0 and spin forever — truncation must raise, like every
            # other codec path
            raise ShardPackCodecError("zstd: truncated frame (missing block header)")
        hdr = int.from_bytes(src[i : i + 3], "little")
        i += 3
        last, btype, bsize = hdr & 1, (hdr >> 1) & 3, hdr >> 3
        if btype == 0:  # Raw
            out += src[i : i + bsize]
            i += bsize
        elif btype == 1:  # RLE
            out += src[i : i + 1] * bsize
            i += 1
        elif btype == 2:  # Compressed: FSE/Huffman entropy block
            try:
                zstd_entropy.decode_compressed_block(src, i, bsize, out, entropy_ctx)
            except (ValueError, IndexError) as e:
                raise ShardPackCodecError(f"zstd: corrupt compressed block: {e}") from e
            i += bsize
        else:
            raise ShardPackCodecError("zstd: reserved block type")
        if last:
            break
    if has_checksum:
        if i + 4 > len(src):
            raise ShardPackCodecError("zstd: truncated content checksum")
        want = int.from_bytes(src[i : i + 4], "little")
        got = _xxh64(bytes(out)) & 0xFFFFFFFF
        if want != got:
            raise ShardPackCodecError(f"zstd: content checksum mismatch ({got:#x} != {want:#x})")
        i += 4
    if fcs is not None and fcs != len(out):
        raise ShardPackCodecError(f"zstd: content size {len(out)} != header {fcs}")
    return bytes(out), i


# Decompressors take (stored_bytes, expected_size|None): the container
# records the uncompressed size per entry, which native codecs (pyarrow)
# need for raw block formats.
_CODECS: dict[str, tuple] = {
    "none": (lambda b: b, lambda b, n=None: b),
    "gzip": (_gzip_c, lambda b, n=None: _gzip.decompress(b)),
    # pure-Python, deterministic, env-independent (see functions above)
    "lz4": (_lz4_compress, lambda b, n=None: _lz4_decompress(b)),
    "snappy": (_snappy_compress, lambda b, n=None: _snappy_decompress(b)),
    "zstd": (_zstd_compress, lambda b, n=None: _zstd_decompress(b)),
}

try:
    # Native codecs (pyarrow ships lz4/zstd/snappy): take over the hot
    # path when importable — ~100x the pure-Python throughput.  Formats
    # interoperate: pyarrow 'lz4_raw' IS the LZ4 block format the pure
    # encoder emits, 'snappy' is the standard raw-snappy framing, and
    # zstd interoperates BOTH ways: pyarrow reads the pure encoder's
    # Raw/RLE frames, and the pure decoder (zstd_entropy) reads
    # pyarrow's entropy-coded frames — verified by the cross-codec
    # matrix in tests/test_codec.py.
    import pyarrow  # noqa: F401  (probe only — codecs are built lazily)

    # pa.Codec objects are NOT picklable, and this module travels to
    # Python workers via cloudpickle — no module-level codec instances or
    # caches allowed.  Construction is ~0.2 us (80x cheaper than one
    # 32 KiB decompress), so just build per call.
    def _arrow_codec(arrow_name: str):
        import pyarrow as pa

        return pa.Codec(arrow_name)

    def _lz4_c_native(b: bytes) -> bytes:
        return _arrow_codec("lz4_raw").compress(b, asbytes=True)

    def _lz4_d_native(b: bytes, n: int | None = None) -> bytes:
        if n is None:  # raw block format needs the size; pure decoder doesn't
            return _lz4_decompress(b)
        return _arrow_codec("lz4_raw").decompress(b, n, asbytes=True)

    def _snappy_c_native(b: bytes) -> bytes:
        return _arrow_codec("snappy").compress(b, asbytes=True)

    def _snappy_d_native(b: bytes, n: int | None = None) -> bytes:
        if n is None:
            return _snappy_decompress(b)
        return _arrow_codec("snappy").decompress(b, n, asbytes=True)

    def _zstd_c_native(b: bytes) -> bytes:
        return _arrow_codec("zstd").compress(b, asbytes=True)

    def _zstd_d_native(b: bytes, n: int | None = None) -> bytes:
        if n is None:
            return _zstd_decompress(b)
        return _arrow_codec("zstd").decompress(b, n, asbytes=True)

    _CODECS["lz4"] = (_lz4_c_native, _lz4_d_native)
    _CODECS["snappy"] = (_snappy_c_native, _snappy_d_native)
    _CODECS["zstd"] = (_zstd_c_native, _zstd_d_native)
except ImportError:
    pass

try:
    # zstandard lib (if ever installed) wins over pyarrow: full-featured
    # streaming API and dictionary support.
    import zstandard as _zstd

    _CODECS["zstd"] = (
        lambda b: _zstd.ZstdCompressor().compress(b),
        lambda b, n=None: _zstd.ZstdDecompressor().decompress(b),
    )
except ImportError:
    pass


def compress(data: bytes, encoding: str) -> bytes:
    if ";chunk=" in encoding:
        base, _, cb = encoding.partition(";chunk=")
        return _encode_chunked(data, base, int(cb))
    if encoding not in _CODECS:
        raise ShardPackCodecError(
            f"compression '{encoding}' not available (have: {sorted(_CODECS)})"
        )
    return _CODECS[encoding][0](data)


def decompress(data: bytes, encoding: str, expected_size: int | None = None) -> bytes:
    if ";chunk=" in encoding:
        return _decode_chunked(data, encoding.partition(";chunk=")[0])
    if encoding not in _CODECS:
        raise ShardPackCodecError(
            f"compression '{encoding}' not available (have: {sorted(_CODECS)})"
        )
    return _CODECS[encoding][1](data, expected_size)


# --- chunk-level entry compression (draft.md:144-148) -------------------------
#
# The spec allows compression "on a per-file-entry basis or at a chunk
# level".  Whole-entry compression makes random access into one multi-GB
# entry (a long video, a giant tensor) an all-or-nothing decompress;
# chunked entries restore O(chunk) ranged reads.  The stored payload
# becomes a self-describing container (all little-endian):
#
#   4B  magic b"SPCH"
#   u32 n_chunks
#   u64 raw_chunk_bytes      (uncompressed size of every chunk but the last)
#   u64 raw_total            (uncompressed entry size)
#   per chunk: u64 comp_len, u32 crc32(compressed bytes)
#   then the compressed chunk payloads, concatenated
#
# The entry's encoding tag carries the base codec and chunk size
# ('zstd;chunk=4194304') — format-version-gated by construction: a
# reader without this code fails loudly on the unknown tag instead of
# returning wrong bytes.  The entry-level sha256 (full uncompressed
# payload) is unchanged and still verified on full reads; per-chunk
# crc32 lets a RANGED read verify exactly the chunks it touched.

_CHUNK_MAGIC = b"SPCH"


def _encode_chunked(data: bytes, base_codec: str, chunk_bytes: int) -> bytes:
    import zlib

    if chunk_bytes <= 0:
        raise ShardPackCodecError(f"chunk_bytes must be positive, got {chunk_bytes}")
    if base_codec not in _CODECS or base_codec == "none":
        raise ShardPackCodecError(
            f"chunked compression needs a real base codec, got '{base_codec}'"
        )
    n = max(1, -(-len(data) // chunk_bytes))
    comps = [
        _CODECS[base_codec][0](data[i * chunk_bytes : (i + 1) * chunk_bytes])
        for i in range(n)
    ]
    head = _CHUNK_MAGIC + struct.pack("<IQQ", n, chunk_bytes, len(data))
    table = b"".join(
        struct.pack("<QI", len(c), zlib.crc32(c) & 0xFFFFFFFF) for c in comps
    )
    return head + table + b"".join(comps)


def _parse_chunk_container(stored: bytes):
    """-> (n_chunks, raw_chunk_bytes, raw_total, [(comp_len, crc)],
    payload_base_offset)."""
    if stored[:4] != _CHUNK_MAGIC:
        raise ShardPackCodecError("chunked entry payload missing SPCH magic")
    n, cb, total = struct.unpack_from("<IQQ", stored, 4)
    table = [
        struct.unpack_from("<QI", stored, 24 + 12 * i) for i in range(n)
    ]
    return n, cb, total, table, 24 + 12 * n


def _decode_chunked(stored: bytes, base_codec: str) -> bytes:
    import zlib

    n, cb, total, table, base = _parse_chunk_container(stored)
    out = []
    pos = base
    for i, (clen, crc) in enumerate(table):
        blob = stored[pos : pos + clen]
        if zlib.crc32(blob) & 0xFFFFFFFF != crc:
            raise ShardPackChecksumError(f"chunk {i} crc32 mismatch")
        raw_len = min(cb, total - i * cb)
        out.append(_CODECS[base_codec][1](blob, raw_len))
        pos += clen
    data = b"".join(out)
    if len(data) != total:
        raise ShardPackCodecError(
            f"chunked entry decoded {len(data)} bytes, container says {total}"
        )
    return data


# --- data model -------------------------------------------------------------

@dataclass
class FileEntry:
    file_name: str
    content_type: str  # MIME, e.g. image/jpeg, application/json (draft.md:185-195)
    data: bytes
    encoding: str = "none"
    # Uncompressed payload size.  Populated by the decoder so metadata-only
    # reads (skip_payload) still report the true size without decoding the
    # bytes; None means "len(data)".
    declared_size: int | None = None

    @property
    def size(self) -> int:
        return self.declared_size if self.declared_size is not None else len(self.data)


@dataclass
class Record:
    key: str
    entries: list[FileEntry] = field(default_factory=list)
    metadata: dict[str, str] = field(default_factory=dict)


# --- encode -----------------------------------------------------------------

def _lp_bytes(b: bytes) -> bytes:
    return struct.pack("<I", len(b)) + b


def encode_record(
    record: Record, compression: str = "none", chunk_bytes: int | None = None
) -> bytes:
    """Serialize one record block; payloads compressed per `compression`
    unless an entry carries its own non-default encoding.

    ``chunk_bytes``: entries larger than this compress at CHUNK level
    (encoding tag '{codec};chunk={n}') so ranged reads into one huge
    entry decompress O(chunk) bytes — draft.md:144-148's chunk-level
    compression.  Smaller entries and uncompressed entries are stored as
    before (raw bytes are already range-addressable)."""
    body = io.BytesIO()
    key_b = record.key.encode("utf-8")
    meta_b = json.dumps(record.metadata, sort_keys=True).encode("utf-8") if record.metadata else b""
    body.write(_lp_bytes(key_b))
    body.write(_lp_bytes(meta_b))
    body.write(struct.pack("<I", len(record.entries)))
    for e in record.entries:
        enc = e.encoding if e.encoding != "none" else compression
        if (
            chunk_bytes
            and enc != "none"
            and ";chunk=" not in enc
            and len(e.data) > chunk_bytes
        ):
            enc = f"{enc};chunk={chunk_bytes}"
        stored = compress(e.data, enc)
        body.write(_lp_bytes(e.file_name.encode("utf-8")))
        body.write(_lp_bytes(e.content_type.encode("utf-8")))
        body.write(_lp_bytes(enc.encode("utf-8")))
        body.write(struct.pack("<Q", len(e.data)))
        body.write(hashlib.sha256(e.data).digest())
        body.write(struct.pack("<Q", len(stored)))
        body.write(stored)
    payload = body.getvalue()
    return struct.pack("<Q", 8 + len(payload)) + payload


def decode_record(
    buf: bytes,
    pos: int = 0,
    verify_checksums: bool = True,
    skip_payload: bool = False,
    skip_entries: bool = False,
    entry_names: "set[str] | frozenset[str] | None" = None,
) -> tuple[Record, int]:
    """Parse one record block at `pos`; returns (record, next_pos).

    ``skip_payload``: parse entry headers but never decompress/copy the
    payload bytes — the metadata-only access path (Bucket::get_metadata,
    src/bucket.rs:185-188, served without touching payloads).
    ``skip_entries``: stop after key+metadata; entries come back empty.
    ``entry_names``: decode payloads ONLY for entries with these file
    names; others come back header-only (data=b"", true declared_size) —
    the modality-selective read: a text loader over image+caption
    records pays zero image decompression.
    """
    (record_size,) = struct.unpack_from("<Q", buf, pos)
    end = pos + record_size
    p = pos + 8

    def lp() -> bytes:
        nonlocal p
        (n,) = struct.unpack_from("<I", buf, p)
        p += 4
        out = buf[p : p + n]
        p += n
        return out

    key = lp().decode("utf-8")
    meta_b = lp()
    metadata = json.loads(meta_b) if meta_b else {}
    if skip_entries:
        return Record(key=key, entries=[], metadata=metadata), end
    (n_entries,) = struct.unpack_from("<I", buf, p)
    p += 4
    entries: list[FileEntry] = []
    for _ in range(n_entries):
        name = lp().decode("utf-8")
        ctype = lp().decode("utf-8")
        enc = lp().decode("utf-8")
        (file_size,) = struct.unpack_from("<Q", buf, p)
        p += 8
        digest = buf[p : p + 32]
        p += 32
        (data_len,) = struct.unpack_from("<Q", buf, p)
        p += 8
        if skip_payload or (entry_names is not None and name not in entry_names):
            p += data_len  # seek past the stored bytes: no copy, no decode
            entries.append(
                FileEntry(
                    file_name=name,
                    content_type=ctype,
                    data=b"",
                    encoding=enc,
                    declared_size=file_size,
                )
            )
            continue
        stored = buf[p : p + data_len]
        p += data_len
        data = decompress(bytes(stored), enc, expected_size=file_size)
        if len(data) != file_size:
            raise ShardPackCodecError(
                f"entry '{name}': decompressed size {len(data)} != declared {file_size}"
            )
        if verify_checksums and hashlib.sha256(data).digest() != digest:
            raise ShardPackChecksumError(f"checksum mismatch for entry '{name}' of key '{key}'")
        entries.append(
            FileEntry(
                file_name=name, content_type=ctype, data=data, encoding=enc, declared_size=file_size
            )
        )
    if p != end:
        raise ShardPackCodecError(f"record at {pos}: consumed {p - pos} of {record_size} bytes")
    return Record(key=key, entries=entries, metadata=metadata), end


# --- shard write ------------------------------------------------------------

class ShardWriter:
    """Single-pass shard writer: stream record blocks, append EOF index on
    close (draft.md:399-401).  Tracks size in memory — no read-back probe
    (avoids the reference's O(shard) size probe, SURVEY.md §3.1 step 3).

    Crash safety via the storage WriteHandle contract: the shard becomes
    visible at its final name only when close() returns with the footer
    written (local FS: hidden tmp + atomic rename; object stores:
    whole-object put / multipart complete).  A failed/killed task can
    never leave a footer-less .shardpack that poisons later reads.

    ``max_record_bytes`` / ``max_entry_bytes`` are the reference
    roadmap's record-size limits (/root/reference/src/lib.rs:16-26)
    turned into writer validation: an oversized record/entry raises
    ShardPackCodecError *before* any bytes land, instead of silently
    producing a monster shard that breaks executor memory sizing."""

    def __init__(
        self,
        path: str,
        compression: str = "none",
        shard_metadata: dict | None = None,
        max_record_bytes: int | None = None,
        max_entry_bytes: int | None = None,
        chunk_bytes: int | None = None,
    ):
        if compression not in _CODECS:
            raise ShardPackCodecError(f"compression '{compression}' not available")
        if chunk_bytes is not None and chunk_bytes <= 0:
            raise ShardPackCodecError(f"chunk_bytes must be positive, got {chunk_bytes}")
        self.path = path
        self.compression = compression
        self.shard_metadata = shard_metadata or {}
        self.max_record_bytes = max_record_bytes
        self.max_entry_bytes = max_entry_bytes
        self.chunk_bytes = chunk_bytes
        self._f = storage.for_path(path).create(path)
        self._offsets: list[int] = []
        self._pos = 0

    @property
    def current_size(self) -> int:
        return self._pos

    @property
    def record_count(self) -> int:
        return len(self._offsets)

    def write_record(self, record: Record) -> int:
        if self.max_entry_bytes is not None:
            for e in record.entries:
                if len(e.data) > self.max_entry_bytes:
                    raise ShardPackCodecError(
                        f"entry '{e.file_name}' of key '{record.key}': "
                        f"{len(e.data)} bytes exceeds max_entry_bytes="
                        f"{self.max_entry_bytes}"
                    )
        block = encode_record(record, self.compression, chunk_bytes=self.chunk_bytes)
        if self.max_record_bytes is not None and len(block) > self.max_record_bytes:
            raise ShardPackCodecError(
                f"record '{record.key}': encoded block {len(block)} bytes "
                f"exceeds max_record_bytes={self.max_record_bytes}"
            )
        self._offsets.append(self._pos)
        self._f.write(block)
        self._pos += len(block)
        return len(block)

    def abort(self) -> None:
        """Discard the in-flight shard (task failure cleanup)."""
        self._f.abort()

    def close(self) -> dict:
        index_start = self._pos
        self._f.write(struct.pack("<Q", len(self._offsets)))
        for off in self._offsets:
            self._f.write(struct.pack("<Q", off))
        meta_b = json.dumps(self.shard_metadata, sort_keys=True).encode("utf-8")
        self._f.write(_lp_bytes(meta_b))
        self._f.write(struct.pack("<Q", index_start))
        self._f.write(MAGIC)
        self._f.close()  # publish: the shard appears atomically, footer and all
        # size is tracked in memory — no post-close stat round-trip
        index_bytes = 8 + 8 * len(self._offsets) + 4 + len(meta_b) + 8 + len(MAGIC)
        return {
            "path": self.path,
            "records": len(self._offsets),
            "bytes": index_start + index_bytes,
        }


# --- shard read -------------------------------------------------------------

@dataclass
class ShardIndex:
    offsets: list[int]
    shard_metadata: dict
    index_start: int


def read_index(path: str) -> ShardIndex:
    """Load only the EOF index: one tail read, no record payloads.

    Size comes from seek-to-end on the already-open handle, not a
    separate stat — one round trip fewer per shard on object stores."""
    with storage.for_path(path).open_read(path) as f:
        f.seek(0, 2)
        size = f.tell()
        if size < 16 + len(MAGIC):
            raise ShardPackIndexError(f"{path}: too small to be a shardpack file")
        f.seek(size - 8 - len(MAGIC))
        tail = f.read(8 + len(MAGIC))
        if tail[8:] != MAGIC:
            raise ShardPackIndexError(f"{path}: bad magic footer")
        (index_start,) = struct.unpack("<Q", tail[:8])
        if index_start >= size:
            raise ShardPackIndexError(f"{path}: index offset {index_start} out of range")
        f.seek(index_start)
        idx = f.read(size - index_start)
    (n_records,) = struct.unpack_from("<Q", idx, 0)
    offsets = list(struct.unpack_from(f"<{n_records}Q", idx, 8))
    p = 8 + 8 * n_records
    (meta_len,) = struct.unpack_from("<I", idx, p)
    p += 4
    meta_b = idx[p : p + meta_len]
    shard_metadata = json.loads(meta_b) if meta_b else {}
    return ShardIndex(offsets=offsets, shard_metadata=shard_metadata, index_start=index_start)


def read_record_at(
    path: str,
    offset: int,
    verify_checksums: bool = True,
    skip_payload: bool = False,
    skip_entries: bool = False,
    entry_names: "set[str] | None" = None,
) -> Record:
    """O(1) random access: seek to the offset-table position (draft.md:167-175).

    Reads the block header first, then exactly the block — a partial read,
    fixing the reference's whole-shard fetch (SURVEY.md D4).
    """
    with storage.for_path(path).open_read(path) as f:
        f.seek(offset)
        head = f.read(8)
        (record_size,) = struct.unpack("<Q", head)
        rest = f.read(record_size - 8)
    rec, _ = decode_record(
        head + rest, 0, verify_checksums, skip_payload, skip_entries, entry_names
    )
    return rec


def read_entry_slice(
    path: str,
    record_offset: int,
    file_name: str,
    start: int,
    length: int,
) -> bytes:
    """Ranged read INSIDE one entry's uncompressed payload: ``length``
    bytes at ``start``, touching O(covered bytes) of storage instead of
    the whole entry (draft.md:144-148's chunk-level promise).

    I/O shape by encoding:
    - 'none': one ranged read of exactly the requested span — raw bytes
      are already range-addressable;
    - '{codec};chunk=N': reads the chunk table plus ONLY the compressed
      chunks covering the span; each touched chunk verifies its crc32
      (the entry-level sha256 covers full reads, which a partial read by
      definition cannot check);
    - whole-entry codecs: falls back to reading + decompressing the
      entire entry (write with ``chunk_bytes`` to make slices cheap).

    Entry headers are parsed progressively with seeks, so a record whose
    sibling entries hold gigabytes costs only their header bytes.
    Raises ShardPackIndexError when the entry name is absent, and
    returns fewer than ``length`` bytes only at payload end (file slice
    semantics)."""
    if start < 0 or length < 0:
        raise ShardPackCodecError("start/length must be nonnegative")
    with storage.for_path(path).open_read(path) as f:
        f.seek(record_offset)
        (record_size,) = struct.unpack("<Q", f.read(8))
        end = record_offset + record_size

        def lp_skip() -> None:
            (n,) = struct.unpack("<I", f.read(4))
            f.seek(n, 1)

        def lp_read() -> bytes:
            (n,) = struct.unpack("<I", f.read(4))
            return f.read(n)

        lp_skip()  # key
        lp_skip()  # metadata
        (n_entries,) = struct.unpack("<I", f.read(4))
        for _ in range(n_entries):
            name = lp_read().decode("utf-8")
            lp_skip()  # content_type
            enc = lp_read().decode("utf-8")
            (file_size,) = struct.unpack("<Q", f.read(8))
            f.seek(32, 1)  # sha256
            (data_len,) = struct.unpack("<Q", f.read(8))
            data_pos = f.tell()
            if name != file_name:
                f.seek(data_len, 1)
                continue
            want = max(0, min(length, file_size - start))
            if want == 0:
                return b""
            if enc == "none":
                f.seek(data_pos + start)
                return f.read(want)
            if ";chunk=" in enc:
                import zlib

                base_codec = enc.partition(";chunk=")[0]
                head = f.read(24)
                if head[:4] != _CHUNK_MAGIC:
                    raise ShardPackCodecError(
                        f"entry '{name}': chunked tag without SPCH container"
                    )
                n, cb, total = struct.unpack("<IQQ", head[4:24])
                table = [
                    struct.unpack("<QI", f.read(12)) for _ in range(n)
                ]
                payload_base = data_pos + 24 + 12 * n
                c0 = start // cb
                c1 = (start + want - 1) // cb
                skip = sum(cl for cl, _ in table[:c0])
                f.seek(payload_base + skip)
                out = []
                for i in range(c0, c1 + 1):
                    clen, crc = table[i]
                    blob = f.read(clen)
                    if zlib.crc32(blob) & 0xFFFFFFFF != crc:
                        raise ShardPackChecksumError(
                            f"entry '{name}': chunk {i} crc32 mismatch"
                        )
                    raw_len = min(cb, total - i * cb)
                    out.append(_CODECS[base_codec][1](blob, raw_len))
                raw = b"".join(out)
                off = start - c0 * cb
                return raw[off : off + want]
            # whole-entry compression: no sub-entry addressing possible
            stored = f.read(data_len)
            data = decompress(stored, enc, expected_size=file_size)
            return data[start : start + want]
        if f.tell() > end:
            raise ShardPackCodecError(f"record at {record_offset}: header overrun")
    raise ShardPackIndexError(
        f"record at {record_offset} has no entry named '{file_name}'"
    )


def iter_records_span(
    path: str,
    start: int,
    end: int,
    n_records: int,
    verify_checksums: bool = True,
    skip_payload: bool = False,
    skip_entries: bool = False,
    entry_names: "set[str] | None" = None,
) -> Iterator[Record]:
    """Stream ``n_records`` record blocks from the byte span [start, end)
    in ONE ranged read — the record-range-split read path (a split is a
    contiguous slice of the offset table, so its bytes are contiguous
    too; per-record seeks here would cost one I/O round trip per record
    on an object store)."""
    buf = storage.for_path(path).read_bytes(path, start, end - start)
    pos = 0
    for _ in range(n_records):
        rec, pos = decode_record(
            buf, pos, verify_checksums, skip_payload, skip_entries, entry_names
        )
        yield rec


def iter_records(
    path: str,
    verify_checksums: bool = True,
    offsets: list[int] | None = None,
    skip_payload: bool = False,
    skip_entries: bool = False,
    entry_names: "set[str] | None" = None,
) -> Iterator[Record]:
    """Sequential streaming (draft.md:213-218); with `offsets`, reads only
    the selected record blocks (partition range / pruned access path)."""
    if offsets is None:
        idx = read_index(path)
        offsets = idx.offsets
        # Metadata-only scans of payload-heavy shards: seek from block head
        # to block head and never pull the payload bytes off disk at all
        # (the index-serves-metadata access path, src/bucket.rs:185-188).
        avg = idx.index_start / max(1, len(offsets))
        if skip_entries and avg > 64 * 1024:
            with storage.for_path(path).open_read(path) as f:
                for off in offsets:
                    f.seek(off)
                    head = f.read(8)
                    (record_size,) = struct.unpack("<Q", head)
                    # key+metadata sit at the block head; 4 KiB covers the
                    # overwhelming case, extend only when lengths demand it
                    chunk = f.read(min(record_size - 8, 4096))

                    def ensure(n: int) -> None:
                        nonlocal chunk
                        if len(chunk) < n:  # f is positioned right after chunk
                            chunk += f.read(n - len(chunk))

                    ensure(4)
                    (key_len,) = struct.unpack_from("<I", chunk, 0)
                    ensure(8 + key_len)
                    (meta_len,) = struct.unpack_from("<I", chunk, 4 + key_len)
                    ensure(8 + key_len + meta_len)
                    key = chunk[4 : 4 + key_len].decode("utf-8")
                    meta_b = chunk[8 + key_len : 8 + key_len + meta_len]
                    yield Record(
                        key=key,
                        entries=[],
                        metadata=json.loads(meta_b) if meta_b else {},
                    )
            return
        buf = storage.for_path(path).read_bytes(path, 0, idx.index_start)
        pos = 0
        for _ in range(len(offsets)):
            rec, pos = decode_record(
                buf, pos, verify_checksums, skip_payload, skip_entries, entry_names
            )
            yield rec
    else:
        for off in offsets:
            yield read_record_at(
                path, off, verify_checksums, skip_payload, skip_entries, entry_names
            )


# --- dataset (bucket of sequentially numbered shards) -----------------------

def shard_name(basename: str, shard_id: int) -> str:
    """Spec naming dataset-train-000000.shardpack (draft.md:24-30), NOT the
    reference code's shard_{:016x} (divergence D14)."""
    return f"{basename}-{shard_id:06d}.shardpack"


class DatasetWriter:
    """Writes a directory of shards with byte-based rollover.

    Rollover at target_shard_bytes mirrors Bucket::write's intent
    (src/bucket.rs:111-121) but tracks size in-memory and actually writes
    to the new shard after rollover (fixing divergences D2, D3)."""

    def __init__(
        self,
        directory: str,
        basename: str = "part",
        compression: str = "none",
        target_shard_bytes: int = DEFAULT_TARGET_SHARD_BYTES,
        start_shard_id: int = 0,
        max_record_bytes: int | None = None,
        max_entry_bytes: int | None = None,
        chunk_bytes: int | None = None,
    ):
        storage.for_path(directory).makedirs(directory)
        self.directory = directory
        self.basename = basename
        self.compression = compression
        self.target = target_shard_bytes
        self.max_record_bytes = max_record_bytes
        self.max_entry_bytes = max_entry_bytes
        self.chunk_bytes = chunk_bytes
        self._shard_id = start_shard_id
        self._writer: ShardWriter | None = None
        self.results: list[dict] = []

    def _open_next(self) -> ShardWriter:
        path = os.path.join(self.directory, shard_name(self.basename, self._shard_id))
        self._shard_id += 1
        return ShardWriter(
            path,
            self.compression,
            max_record_bytes=self.max_record_bytes,
            max_entry_bytes=self.max_entry_bytes,
            chunk_bytes=self.chunk_bytes,
        )

    def write(self, record: Record) -> None:
        if self._writer is None:
            self._writer = self._open_next()
        elif self._writer.current_size >= self.target and self._writer.record_count > 0:
            self.results.append(self._writer.close())
            self._writer = self._open_next()
        self._writer.write_record(record)

    def close(self) -> list[dict]:
        if self._writer is not None:
            self.results.append(self._writer.close())
            self._writer = None
        return self.results


def write_dataset(
    directory: str,
    records: Iterable[Record],
    basename: str = "part",
    compression: str = "none",
    target_shard_bytes: int = DEFAULT_TARGET_SHARD_BYTES,
) -> list[dict]:
    w = DatasetWriter(directory, basename, compression, target_shard_bytes)
    for r in records:
        w.write(r)
    return w.close()


def list_shards(directory: str) -> list[str]:
    return sorted(
        os.path.join(directory, f)
        for f in storage.for_path(directory).listdir(directory)
        if f.endswith(".shardpack")
    )
