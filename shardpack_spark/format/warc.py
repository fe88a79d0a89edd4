"""WARC (ISO 28500) container parsing and writing — pyspark-free core.

The ingest format of web-scale training corpora: Common Crawl publishes
~100 TB crawls as ``*.warc.gz`` files, each a concatenation of gzip
members holding one WARC record apiece (the member boundary is the
random-access / resync point).  This module is the wheel-free parser and
writer the Spark source (``format/warc_source.py``) builds on, designed
like the rest of the format layer: pure Python + stdlib zlib, streaming
(bounded memory regardless of file size), per-record degradation instead
of job aborts, and a writer so tests pin the parser against hand-built
wire bytes rather than borrowed fixtures.

Wire format (WARC/1.0, ISO 28500; WARC/1.1 is accepted identically):

    WARC/1.0<CRLF>
    <header-name>: <value><CRLF>      (incl. mandatory WARC-Type,
    ...                                WARC-Record-ID, WARC-Date,
    <CRLF>                             Content-Length)
    <Content-Length bytes of block>
    <CRLF><CRLF>

For ``response``/``request`` records the block is an HTTP/1.x message;
``parse_http=True`` splits status/headers from the body and decodes
chunked transfer-encoding, since crawlers commonly store the raw wire
bytes.

Scale posture: parsing is sequential within one file (gzip members
cannot be split without an external index), so parallelism is per-file —
exactly how production crawl jobs shard work (a crawl is tens of
thousands of ~1 GiB files).  Memory is O(one record), with
``max_payload_bytes`` capping hostile Content-Length values the same way
the image decoders cap pixel budgets.
"""

from __future__ import annotations

import io
import zlib
from dataclasses import dataclass, field

from shardpack_spark.format import storage
from shardpack_spark.format.codec import ShardPackError, ShardPackIOError

_CRLF = b"\r\n"
_MAX_HEADER_BYTES = 1 << 20  # a header block past 1 MiB is hostile, not real
_READ_CHUNK = 1 << 18


class WarcFormatError(ShardPackError):
    """Malformed WARC structure (bad magic, header overrun, short block)."""


@dataclass
class WarcRecord:
    """One parsed record.  ``headers`` keys are lower-cased; values
    decode as UTF-8 (the ISO 28500 header charset) with a latin-1
    fallback so legacy bytes stay lossless.  ``offset`` is a seekable
    resync point AT OR BEFORE the record start: for the conformant
    one-record-per-member ``.warc.gz`` layout it is exactly the record's
    member's compressed offset; for records split across members or
    packed several to a member it is the start of the earliest member
    whose bytes were still buffered (always <= the record's true
    position, so seeking there and scanning forward finds the record)."""

    offset: int
    warc_type: str
    headers: dict[str, str]
    block: bytes | None = None
    http_status: int | None = None
    http_headers: dict[str, str] = field(default_factory=dict)
    payload: bytes | None = None
    truncated: bool = False
    parse_error: str | None = None

    @property
    def record_id(self) -> str | None:
        return self.headers.get("warc-record-id")

    @property
    def target_uri(self) -> str | None:
        return self.headers.get("warc-target-uri")

    @property
    def date(self) -> str | None:
        return self.headers.get("warc-date")

    @property
    def content_type(self) -> str | None:
        return self.headers.get("content-type")


class _MemberStream:
    """Present a multi-member gzip file as one continuous decompressed
    stream, tracking the compressed offset of the member each read
    position falls in (the WARC resync/offset contract).

    ``member_start()`` returns the compressed offset of the member that
    produced the NEXT unread decompressed byte.  On corrupt compressed
    data, ``skip_to_next_member()`` scans for the following gzip magic so
    one bad member costs one record, not the rest of the file."""

    def __init__(self, raw: io.BufferedIOBase):
        self._raw = raw
        self._comp_pos = 0  # bytes of compressed input consumed
        self._carry = b""  # compressed bytes read but not yet consumed
        self._out = bytearray()  # decompressed, not yet handed out
        self._out_member = 0  # member offset of _out[0]
        self._next_member = 0  # member offset for bytes decoded next
        self._z = None
        self._z_fed = False  # any bytes of the CURRENT member consumed yet?
        self._resync_from = 0  # scan start inside _carry after an error
        self._eof = False

    def member_start(self) -> int:
        return self._out_member if self._out else self._next_member

    def _fill_raw(self) -> bytes:
        if self._carry:
            b, self._carry = self._carry, b""
            return b
        return self._raw.read(_READ_CHUNK)

    def _fill(self) -> bool:
        """Append more decompressed bytes to ``_out`` — guaranteed
        PROGRESS per call (bytes appended, or False at true EOF), never a
        no-op return: ``read`` loops on this until it has enough, so a
        return without progress would spin it."""
        while True:
            if self._z is None:
                chunk = self._fill_raw()
                if not chunk:
                    self._eof = True
                    return False
                self._next_member = self._comp_pos
                self._z = zlib.decompressobj(wbits=31)
                self._z_fed = False
                self._carry = chunk
                continue
            chunk = self._fill_raw()
            if not chunk:
                if self._z.unconsumed_tail or not self._z.eof:
                    raise WarcFormatError("truncated gzip member")
                self._z = None
                self._eof = True
                return False
            try:
                produced = self._z.decompress(chunk)
            except zlib.error as ex:
                # keep the failing chunk: one raw read can span MANY
                # members, and losing it would cost every record in it,
                # not just the corrupt one.  skip_to_next_member scans it
                # for the next gzip magic; when the corrupt member STARTS
                # this chunk, position 0 is its own magic — skip it.
                self._carry = chunk
                self._resync_from = 1 if not self._z_fed else 0
                raise WarcFormatError(f"corrupt gzip member: {ex}") from ex
            self._z_fed = True
            member_at = self._next_member  # member decoded THIS step
            consumed = len(chunk) - len(self._z.unused_data)
            self._comp_pos += consumed
            if self._z.eof:
                self._carry = self._z.unused_data
                self._z = None
                # subsequent decoded bytes belong to the next member
                self._next_member = self._comp_pos
            if produced:
                if not self._out:
                    self._out_member = member_at
                self._out.extend(produced)
                return True

    def read(self, n: int) -> bytes:
        while len(self._out) < n:
            try:
                if not self._fill():
                    break
            except zlib.error as ex:
                raise WarcFormatError(f"corrupt gzip member: {ex}") from ex
        out = bytes(self._out[:n])
        del self._out[:n]
        if self._out:
            pass  # _out_member still describes _out[0]'s member
        else:
            self._out_member = self._next_member
        return out

    def peek(self, n: int) -> bytes:
        """Up to ``n`` bytes WITHOUT consuming (record-boundary check).
        Decode errors during the peek report as empty — the main loop
        will hit them properly on its next read."""
        while len(self._out) < n:
            try:
                if not self._fill():
                    break
            except WarcFormatError:
                break
            except zlib.error:
                break
        return bytes(self._out[:n])

    def read_until(self, marker: bytes, limit: int) -> bytes | None:
        """Bytes up to and including ``marker``, or None if not within
        ``limit`` decompressed bytes (hostile/garbage input guard)."""
        scanned = 0  # resume each .find past already-searched bytes
        while True:
            idx = self._out.find(marker, max(0, scanned - len(marker) + 1))
            if idx >= 0:
                return self.read(idx + len(marker))
            scanned = len(self._out)
            if scanned > limit:
                return None
            try:
                if not self._fill():
                    return None
            except zlib.error as ex:
                raise WarcFormatError(f"corrupt gzip member: {ex}") from ex

    def skip_to_next_member(self) -> bool:
        """After a parse error: drop buffered output and compressed
        carry, scan the raw stream for the next gzip magic.  True if
        another member was found.  (Best effort: raw bytes the corrupt
        member's decompressor already consumed are not re-scanned.)"""
        self._out.clear()
        self._z = None
        data = self._carry
        self._carry = b""
        base = self._comp_pos
        # _resync_from=1 when the corrupt member's own magic sits at
        # data[0] (its first chunk failed) — never re-match it and loop
        start = self._resync_from
        self._resync_from = 0
        while True:
            idx = data.find(b"\x1f\x8b\x08", start)
            start = 0
            if idx >= 0:
                self._carry = data[idx:]
                self._comp_pos = base + idx
                self._next_member = self._comp_pos
                return True
            tail = data[-2:]
            nxt = self._raw.read(_READ_CHUNK)
            if not nxt:
                self._eof = True
                return False
            base += len(data) - len(tail)
            data = bytes(tail) + nxt


class _PlainStream:
    """The same read interface over an uncompressed .warc file."""

    def __init__(self, raw: io.BufferedIOBase):
        self._raw = raw
        self._pos = 0
        self._buf = bytearray()
        self._buf_at = 0

    def member_start(self) -> int:
        return self._buf_at

    def read(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._raw.read(max(_READ_CHUNK, n - len(self._buf)))
            if not chunk:
                break
            self._buf.extend(chunk)
        out = bytes(self._buf[:n])
        del self._buf[:n]
        self._buf_at += len(out)
        return out

    def peek(self, n: int) -> bytes:
        """Up to ``n`` bytes WITHOUT consuming (record-boundary check)."""
        while len(self._buf) < n:
            chunk = self._raw.read(max(_READ_CHUNK, n - len(self._buf)))
            if not chunk:
                break
            self._buf.extend(chunk)
        return bytes(self._buf[:n])

    def read_until(self, marker: bytes, limit: int) -> bytes | None:
        scanned = 0  # resume each .find past already-searched bytes
        while True:
            idx = self._buf.find(marker, max(0, scanned - len(marker) + 1))
            if idx >= 0:
                return self.read(idx + len(marker))
            scanned = len(self._buf)
            if scanned > limit:
                return None
            chunk = self._raw.read(_READ_CHUNK)
            if not chunk:
                return None
            self._buf.extend(chunk)

    def skip_to_next_member(self) -> bool:
        """Resync on the next 'WARC/1.' magic in the remaining bytes.

        Position 0 is a VALID match: every error path in
        ``iter_warc_records`` consumes at least one byte of the failed
        record before resyncing (header errors consume the header block,
        short-block errors consume the block bytes, the no-terminator
        path reads one probe byte), so a magic at the buffer head is
        always the NEXT record — skipping it would silently drop a good
        record after every malformed one."""
        while True:
            idx = self._buf.find(b"WARC/1.")
            if idx >= 0:
                self.read(idx)
                return True
            keep = self._buf[-6:]
            self._buf_at += len(self._buf) - len(keep)
            del self._buf[: len(self._buf) - len(keep)]
            chunk = self._raw.read(_READ_CHUNK)
            if not chunk:
                return False
            self._buf.extend(chunk)


def _hdec(b: bytes) -> str:
    """Header text decode: UTF-8 (what ISO 28500 specifies for field
    values, and what our writer emits) with a latin-1 fallback so
    arbitrary legacy bytes stay lossless instead of erroring."""
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return b.decode("latin-1")


def _parse_header_block(raw: bytes) -> tuple[str, dict[str, str]]:
    """(version-line, {lower-name: value}) with line folding support."""
    lines = raw.split(b"\r\n")
    version = _hdec(lines[0])
    headers: dict[str, str] = {}
    last: str | None = None
    for ln in lines[1:]:
        if not ln:
            continue
        if ln[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + _hdec(ln.strip())
            continue
        name, sep, val = ln.partition(b":")
        if not sep:
            raise WarcFormatError(f"malformed header line: {ln[:60]!r}")
        last = _hdec(name.strip()).lower()
        headers[last] = _hdec(val.strip())
    return version, headers


def _decode_chunked(body: bytes) -> bytes:
    out = bytearray()
    pos = 0
    while True:
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            raise WarcFormatError("chunked body: missing size line")
        size_tok = body[pos:nl].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError as ex:
            raise WarcFormatError(f"chunked body: bad size {size_tok[:20]!r}") from ex
        pos = nl + 2
        if size == 0:
            return bytes(out)
        if pos + size > len(body):
            raise WarcFormatError("chunked body: short chunk")
        out += body[pos : pos + size]
        pos += size + 2  # trailing CRLF per chunk


def _parse_http(block: bytes, rec: WarcRecord) -> None:
    """Split an HTTP/1.x message into status/headers/payload on ``rec``.
    Malformed messages degrade: payload = whole block, parse_error set.
    ``response`` blocks must open with ``HTTP/``; ``request`` blocks open
    with any method token (GET/POST/HEAD/...)."""
    if rec.warc_type == "response" and block[:5] != b"HTTP/":
        rec.payload = block
        rec.parse_error = "http:not-http"
        return
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        rec.payload = block
        rec.parse_error = "http:no-header-end"
        return
    head, body = block[:sep], block[sep + 4 :]
    lines = head.split(b"\r\n")
    try:
        parts = lines[0].split(None, 2)
        if parts and parts[0][:5] == b"HTTP/":
            rec.http_status = int(parts[1])
    except (IndexError, ValueError):
        rec.parse_error = "http:bad-status-line"
    hdrs: dict[str, str] = {}
    last = None
    for ln in lines[1:]:
        if ln[:1] in (b" ", b"\t") and last is not None:
            hdrs[last] += " " + ln.strip().decode("latin-1")
            continue
        name, s, val = ln.partition(b":")
        if not s:
            continue  # tolerate junk header lines — crawls contain them
        last = name.strip().decode("latin-1").lower()
        hdrs[last] = val.strip().decode("latin-1")
    rec.http_headers = hdrs
    if hdrs.get("transfer-encoding", "").lower().find("chunked") >= 0:
        try:
            body = _decode_chunked(body)
        except WarcFormatError:
            rec.parse_error = "http:bad-chunked"
    rec.payload = body


def iter_warc_records(
    raw: io.BufferedIOBase | bytes,
    parse_http: bool = True,
    max_payload_bytes: int | None = None,
    skip_payload: bool = False,
    start_offset: int = 0,
    end_offset: int | None = None,
):
    """Yield :class:`WarcRecord` from a plain or gzipped WARC stream.

    - ``max_payload_bytes``: blocks past the cap are read through but the
      record keeps only the first cap bytes, ``truncated=True`` — a
      hostile Content-Length burns I/O, never memory.
    - ``skip_payload``: headers-only inventory; ``block``/``payload``
      stay None (the Content-Length bytes are still consumed).
    - ``start_offset`` / ``end_offset``: parse only the member range
      ``[start_offset, end_offset)`` of a SEEKABLE input.  start_offset
      must be a member boundary (a ``WarcRecord.offset`` / sidecar-index
      value); records whose member starts at or past end_offset are not
      yielded.  Yielded offsets stay ABSOLUTE (file positions), so an
      indexed lookup and a range split agree with a sequential parse.
      This is the random-access path behind the ``.cdxj`` sidecar index
      (point lookup) and split-archive parallel scans.
    - Malformed records degrade per-record: one record with
      ``parse_error`` set is emitted, then parsing resyncs at the next
      gzip member (``.warc.gz``) or the next ``WARC/1.`` magic (plain) —
      one bad record never costs the rest of the file.
    """
    if isinstance(raw, (bytes, bytearray)):
        raw = io.BytesIO(bytes(raw))
    if start_offset:
        if not hasattr(raw, "seek"):
            raise WarcFormatError("start_offset requires a seekable input")
        raw.seek(start_offset)
    head = raw.read(2)
    if hasattr(raw, "seek"):
        raw.seek(start_offset)
        probe_stream = raw
    else:  # pragma: no cover - non-seekable stores (streaming S3 reads)
        probe_stream = _Concat(head, raw)
    stream = (
        _MemberStream(probe_stream) if head == b"\x1f\x8b" else _PlainStream(probe_stream)
    )
    while True:
        offset = start_offset + stream.member_start()
        if end_offset is not None and offset >= end_offset:
            return
        try:
            header_raw = stream.read_until(b"\r\n\r\n", _MAX_HEADER_BYTES)
        except WarcFormatError as ex:
            yield WarcRecord(offset, "", {}, parse_error=f"warc:{ex}")
            if not stream.skip_to_next_member():
                return
            continue
        if header_raw is None:
            leftover = stream.read(1)
            if leftover:
                yield WarcRecord(offset, "", {}, parse_error="warc:no-header-terminator")
                if stream.skip_to_next_member():
                    continue
            return
        if header_raw in (b"\r\n\r\n",):  # stray blank separators
            continue
        try:
            version, headers = _parse_header_block(header_raw[:-4])
            if not version.startswith("WARC/"):
                raise WarcFormatError(f"bad magic {version[:20]!r}")
            clen = int(headers["content-length"])
            if clen < 0:
                raise WarcFormatError("negative Content-Length")
        except (WarcFormatError, KeyError, ValueError, UnicodeDecodeError) as ex:
            yield WarcRecord(offset, "", {}, parse_error=f"warc:{ex}")
            if not stream.skip_to_next_member():
                return
            continue
        cap = clen if max_payload_bytes is None else min(clen, max_payload_bytes)
        try:
            block = stream.read(cap)
            if len(block) < cap:
                raise WarcFormatError(
                    f"short block: {len(block)} of {clen} bytes present"
                )
            remaining = clen - cap
            while remaining > 0:  # budget-capped: drain without keeping
                got = stream.read(min(remaining, _READ_CHUNK))
                if not got:
                    raise WarcFormatError("short block past payload cap")
                remaining -= len(got)
            stream.read(4)  # record terminator CRLFCRLF (tolerant at EOF)
        except WarcFormatError as ex:
            rec = WarcRecord(
                offset,
                headers.get("warc-type", ""),
                headers,
                parse_error=f"warc:{ex}",
            )
            yield rec
            if not stream.skip_to_next_member():
                return
            continue
        rec = WarcRecord(offset, headers.get("warc-type", ""), headers)
        rec.truncated = cap < clen or "warc-truncated" in headers
        if not skip_payload:
            rec.block = block
            if parse_http and rec.warc_type in ("response", "request") and not rec.truncated:
                _parse_http(block, rec)
            else:
                rec.payload = block
        yield rec
        # Record-boundary check: after block + terminator the stream must
        # sit at EOF, a stray blank separator, or the next record's magic.
        # A LYING Content-Length (over-claimed: the read swallowed the
        # following records' bytes; under-claimed: the terminator read ate
        # payload and left the real tail) would otherwise lose the
        # following records SILENTLY — the misaligned read mangles their
        # headers and the old resync could skip past several.  A separate
        # boundary-error row (the record above may be perfectly fine —
        # alien filler bytes after a correct record look identical to a
        # lying length, so the record itself stays unflagged) makes the
        # loss visible to warc_error_rollup, and the immediate resync
        # bounds it to the overrun span.
        nxt = stream.peek(7)
        if nxt and not b"WARC/1.".startswith(nxt) and not nxt.startswith(b"\r\n"):
            yield WarcRecord(
                start_offset + stream.member_start(),
                "",
                {},
                parse_error="warc:boundary-misaligned (lying Content-Length "
                "or inter-record filler); resyncing",
            )
            if not stream.skip_to_next_member():
                return


class _Concat:  # pragma: no cover - tiny shim for non-seekable inputs
    def __init__(self, head: bytes, rest):
        self._head = head
        self._rest = rest

    def read(self, n: int) -> bytes:
        if self._head:
            out, self._head = self._head[:n], self._head[n:]
            if len(out) < n:
                out += self._rest.read(n - len(out))
            return out
        return self._rest.read(n)


# --- writer (fixtures, exports, the q40 roundtrip variant) --------------------

_EPOCH_DATE = "2001-01-01T00:00:00Z"  # deterministic default, never wall-clock

# fields warc_record_bytes writes itself — extension headers may not shadow
# them (the parser's header dict is last-wins)
_RESERVED_HEADER_NAMES = frozenset(
    {
        "warc-type",
        "warc-record-id",
        "warc-date",
        "warc-target-uri",
        "content-type",
        "content-length",
    }
)


def warc_record_bytes(
    warc_type: str,
    block: bytes,
    headers: dict[str, str] | None = None,
    record_id: str | None = None,
    target_uri: str | None = None,
    date: str | None = None,
    content_type: str | None = None,
) -> bytes:
    """Serialize ONE record (uncompressed).  Mandatory fields are filled
    deterministically when absent; extension headers pass through
    ``headers`` verbatim (names case-preserved on the wire, parsed back
    lower-cased)."""
    h: list[tuple[str, str]] = [("WARC-Type", warc_type)]
    if target_uri:
        h.append(("WARC-Target-URI", target_uri))
    h.append(("WARC-Date", date or _EPOCH_DATE))
    h.append(("WARC-Record-ID", record_id or f"<urn:shardpack:{warc_type}:0>"))
    if content_type:
        h.append(("Content-Type", content_type))
    for k, v in (headers or {}).items():
        # mandatory-field guard: the parser's header dict is last-wins, so
        # an extension header literally named WARC-Type / WARC-Record-ID /
        # WARC-Date / WARC-Target-URI / Content-Length / Content-Type
        # would silently override the mandatory value on parse-back —
        # reject it like the CR/LF injection below (pass the real value
        # through the dedicated parameter instead)
        if k.lower() in _RESERVED_HEADER_NAMES:
            raise WarcFormatError(
                f"extension header {k!r} shadows a mandatory WARC field; "
                "use the dedicated warc_record_bytes parameter"
            )
        h.append((k, v))
    h.append(("Content-Length", str(len(block))))
    # injection guard: a CR/LF inside a name or value would terminate the
    # field early and let attacker-controlled column data forge arbitrary
    # WARC headers (e.g. override WARC-Type) — reject at the wire layer
    for k, v in h:
        if "\r" in k or "\n" in k or "\r" in v or "\n" in v:
            raise WarcFormatError(
                f"header field contains CR/LF (injection): {k!r}: {v[:40]!r}"
            )
    # UTF-8 per ISO 28500; the parser decodes UTF-8-first with a latin-1
    # fallback, so non-ASCII values (titles, URIs) roundtrip exactly
    head = b"WARC/1.0\r\n" + b"".join(
        f"{k}: {v}".encode("utf-8") + _CRLF for k, v in h
    )
    return head + _CRLF + block + _CRLF + _CRLF


def http_response_block(
    payload: bytes,
    status: int = 200,
    content_type: str = "text/plain; charset=utf-8",
    headers: dict[str, str] | None = None,
) -> bytes:
    """Wrap ``payload`` as the HTTP/1.1 response message a crawler would
    have stored (for building ``response`` records)."""
    reason = {200: "OK", 301: "Moved Permanently", 404: "Not Found"}.get(status, "X")
    lines = [f"HTTP/1.1 {status} {reason}", f"Content-Type: {content_type}"]
    for k, v in (headers or {}).items():
        lines.append(f"{k}: {v}")
    lines.append(f"Content-Length: {len(payload)}")
    head = "\r\n".join(lines).encode("latin-1")
    return head + b"\r\n\r\n" + payload


def write_warc(
    path_or_buf,
    records,
    gzip_members: bool = True,
    sizes_out: list[int] | None = None,
) -> int:
    """Write serialized records (bytes from :func:`warc_record_bytes`)
    as a ``.warc`` / ``.warc.gz`` file; one gzip member PER RECORD (the
    Common Crawl layout — members are the resync points readers rely
    on).  ``path_or_buf``: filesystem path or binary file-like.  Returns
    the record count.  Deterministic output (gzip mtime pinned to 0).

    ``sizes_out``: when given, the ON-DISK byte count of each record
    (compressed member size, or raw size for plain output) is appended —
    cumulative sums are exactly the member offsets a sidecar index needs,
    so exporters build the ``.cdxj`` index while writing, without a
    second read pass."""
    own = isinstance(path_or_buf, str)
    f = open(path_or_buf, "wb") if own else path_or_buf
    n = 0
    try:
        for rec in records:
            if gzip_members:
                co = zlib.compressobj(6, zlib.DEFLATED, 31)
                # wbits=31 writes a gzip header with mtime=0 — determinism
                data = co.compress(rec) + co.flush()
            else:
                data = rec
            f.write(data)
            if sizes_out is not None:
                sizes_out.append(len(data))
            n += 1
    finally:
        if own:
            f.close()
    return n


def list_warc_files(path: str, allow_empty: bool = False) -> list[str]:
    """Expand ``path`` to concrete WARC file paths via the storage layer:
    a file path is taken as-is; a directory lists ``*.warc.gz`` /
    ``*.warc`` / ``*.wet[.gz]`` / ``*.wat[.gz]`` (sorted — deterministic
    planning, and the STREAM offset order: crawl files are named
    monotonically, so new arrivals sort after consumed ones).

    Lives here (not in warc_source) so the pyspark-free CLI verbs
    (``warc-import``) share it without paying — or failing on — the
    ``pyspark.sql.datasource`` import that warc_source needs.  The
    imports it needs are MODULE-level: this function runs inside the
    Python worker's pickled-by-value plan, where a runtime
    ``from shardpack_spark...`` import dies with ModuleNotFoundError."""
    be = storage.for_path(path)
    if be.exists(path) and not path.endswith("/"):
        # a concrete file (exists() on directories is backend-dependent;
        # extension check keeps directories falling through to globbing)
        # (.arc.gz is deliberately NOT accepted: legacy ARC has no
        # WARC/1.0 record magic, so every record would parse_error —
        # rejecting the extension up front beats a 100%-error scan)
        # .wat[.gz] covers Common Crawl's *.warc.wat.gz metadata archives
        # (conformant WARC of application/json 'metadata' records — see
        # operators.webcorpus.wat_records)
        if path.endswith((".warc", ".warc.gz", ".wet", ".wet.gz", ".wat", ".wat.gz")):
            return [path]
    names: list[str] = []
    for pat in ("*.warc.gz", "*.warc", "*.wet.gz", "*.wet", "*.wat.gz", "*.wat"):
        names.extend(be.glob_names(path, pat))
    if not names:
        if allow_empty:
            return []
        raise ShardPackIOError(f"no WARC files under {path!r}")
    base = path.rstrip("/")
    return [f"{base}/{n}" for n in sorted(set(names))]
