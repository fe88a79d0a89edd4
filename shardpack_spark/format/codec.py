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

import gzip as _gzip
import hashlib
import io
import json
import os
import struct
from collections.abc import Iterable, Iterator
from dataclasses import dataclass, field

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


_CODECS: dict[str, tuple] = {"none": (lambda b: b, lambda b: b), "gzip": (_gzip_c, _gzip.decompress)}

try:  # optional codecs; the container only guarantees none|gzip
    import lz4.frame as _lz4

    _CODECS["lz4"] = (_lz4.compress, _lz4.decompress)
except ImportError:
    pass
try:
    import zstandard as _zstd

    _CODECS["zstd"] = (
        lambda b: _zstd.ZstdCompressor().compress(b),
        lambda b: _zstd.ZstdDecompressor().decompress(b),
    )
except ImportError:
    pass
try:
    import snappy as _snappy

    _CODECS["snappy"] = (_snappy.compress, _snappy.decompress)
except ImportError:
    pass


def compress(data: bytes, encoding: str) -> bytes:
    if encoding not in _CODECS:
        raise ShardPackCodecError(
            f"compression '{encoding}' not available (have: {sorted(_CODECS)})"
        )
    return _CODECS[encoding][0](data)


def decompress(data: bytes, encoding: str) -> bytes:
    if encoding not in _CODECS:
        raise ShardPackCodecError(
            f"compression '{encoding}' not available (have: {sorted(_CODECS)})"
        )
    return _CODECS[encoding][1](data)


# --- data model -------------------------------------------------------------

@dataclass
class FileEntry:
    file_name: str
    content_type: str  # MIME, e.g. image/jpeg, application/json (draft.md:185-195)
    data: bytes
    encoding: str = "none"


@dataclass
class Record:
    key: str
    entries: list[FileEntry] = field(default_factory=list)
    metadata: dict[str, str] = field(default_factory=dict)


# --- encode -----------------------------------------------------------------

def _lp_bytes(b: bytes) -> bytes:
    return struct.pack("<I", len(b)) + b


def encode_record(record: Record, compression: str = "none") -> bytes:
    """Serialize one record block; payloads compressed per `compression`
    unless an entry carries its own non-default encoding."""
    body = io.BytesIO()
    key_b = record.key.encode("utf-8")
    meta_b = json.dumps(record.metadata, sort_keys=True).encode("utf-8") if record.metadata else b""
    body.write(_lp_bytes(key_b))
    body.write(_lp_bytes(meta_b))
    body.write(struct.pack("<I", len(record.entries)))
    for e in record.entries:
        enc = e.encoding if e.encoding != "none" else compression
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


def decode_record(buf: bytes, pos: int = 0, verify_checksums: bool = True) -> tuple[Record, int]:
    """Parse one record block at `pos`; returns (record, next_pos)."""
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
        stored = buf[p : p + data_len]
        p += data_len
        data = decompress(bytes(stored), enc)
        if len(data) != file_size:
            raise ShardPackCodecError(
                f"entry '{name}': decompressed size {len(data)} != declared {file_size}"
            )
        if verify_checksums and hashlib.sha256(data).digest() != digest:
            raise ShardPackChecksumError(f"checksum mismatch for entry '{name}' of key '{key}'")
        entries.append(FileEntry(file_name=name, content_type=ctype, data=data, encoding=enc))
    if p != end:
        raise ShardPackCodecError(f"record at {pos}: consumed {p - pos} of {record_size} bytes")
    return Record(key=key, entries=entries, metadata=metadata), end


# --- shard write ------------------------------------------------------------

class ShardWriter:
    """Single-pass shard writer: stream record blocks, append EOF index on
    close (draft.md:399-401).  Tracks size in memory — no read-back probe
    (avoids the reference's O(shard) size probe, SURVEY.md §3.1 step 3)."""

    def __init__(self, path: str, compression: str = "none", shard_metadata: dict | None = None):
        if compression not in _CODECS:
            raise ShardPackCodecError(f"compression '{compression}' not available")
        self.path = path
        self.compression = compression
        self.shard_metadata = shard_metadata or {}
        self._f = open(path, "wb")
        self._offsets: list[int] = []
        self._pos = 0

    @property
    def current_size(self) -> int:
        return self._pos

    @property
    def record_count(self) -> int:
        return len(self._offsets)

    def write_record(self, record: Record) -> int:
        block = encode_record(record, self.compression)
        self._offsets.append(self._pos)
        self._f.write(block)
        self._pos += len(block)
        return len(block)

    def close(self) -> dict:
        index_start = self._pos
        self._f.write(struct.pack("<Q", len(self._offsets)))
        for off in self._offsets:
            self._f.write(struct.pack("<Q", off))
        meta_b = json.dumps(self.shard_metadata, sort_keys=True).encode("utf-8")
        self._f.write(_lp_bytes(meta_b))
        self._f.write(struct.pack("<Q", index_start))
        self._f.write(MAGIC)
        self._f.close()
        return {
            "path": self.path,
            "records": len(self._offsets),
            "bytes": os.path.getsize(self.path),
        }


# --- shard read -------------------------------------------------------------

@dataclass
class ShardIndex:
    offsets: list[int]
    shard_metadata: dict
    index_start: int


def read_index(path: str) -> ShardIndex:
    """Load only the EOF index: one tail read, no record payloads."""
    size = os.path.getsize(path)
    if size < 16 + len(MAGIC):
        raise ShardPackIndexError(f"{path}: too small to be a shardpack file")
    with open(path, "rb") as f:
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


def read_record_at(path: str, offset: int, verify_checksums: bool = True) -> Record:
    """O(1) random access: seek to the offset-table position (draft.md:167-175).

    Reads the block header first, then exactly the block — a partial read,
    fixing the reference's whole-shard fetch (SURVEY.md D4).
    """
    with open(path, "rb") as f:
        f.seek(offset)
        head = f.read(8)
        (record_size,) = struct.unpack("<Q", head)
        rest = f.read(record_size - 8)
    rec, _ = decode_record(head + rest, 0, verify_checksums)
    return rec


def iter_records(
    path: str,
    verify_checksums: bool = True,
    offsets: list[int] | None = None,
) -> Iterator[Record]:
    """Sequential streaming (draft.md:213-218); with `offsets`, reads only
    the selected record blocks (partition range / pruned access path)."""
    if offsets is None:
        idx = read_index(path)
        offsets = idx.offsets
        with open(path, "rb") as f:
            buf = f.read(idx.index_start)
        pos = 0
        for _ in range(len(offsets)):
            rec, pos = decode_record(buf, pos, verify_checksums)
            yield rec
    else:
        for off in offsets:
            yield read_record_at(path, off, verify_checksums)


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
    ):
        os.makedirs(directory, exist_ok=True)
        self.directory = directory
        self.basename = basename
        self.compression = compression
        self.target = target_shard_bytes
        self._shard_id = start_shard_id
        self._writer: ShardWriter | None = None
        self.results: list[dict] = []

    def _open_next(self) -> ShardWriter:
        path = os.path.join(self.directory, shard_name(self.basename, self._shard_id))
        self._shard_id += 1
        return ShardWriter(path, self.compression)

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
        os.path.join(directory, f) for f in os.listdir(directory) if f.endswith(".shardpack")
    )
