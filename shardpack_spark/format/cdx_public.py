"""Public Common Crawl CDX(J) interop — read AND emit the crawl
ecosystem's standard index artifacts, pyspark-free.

Real crawl dumps do not ship this engine's house ``.cdxj`` sidecars
(``format/warc_index.py``); they ship the pywb/cc-index "zipnum" layout
already built:

- ``cdx-NNNNN.gz``: SURT-keyed index lines, globally sorted, compressed
  as INDEPENDENT gzip members of a few thousand lines each ("blocks") —
  so one ranged read + one gunzip serves any key neighborhood;
- ``cluster.idx``: a plain-text secondary index with one line per block
  — ``<first key>\\t<cdx file>\\t<byte offset>\\t<byte length>\\t<line#>``
  — small enough to bisect, making the whole dump's index two reads
  deep (the public CDX-server algorithm).

Line format (one per record)::

    com,example)/path?q=1 20240102030405 {"url": "...", "status": "200",
        "mime": "text/html", "offset": "4516", "length": "1107",
        "filename": "crawl-data/CC-MAIN-.../file.warc.gz", ...}

A user pointing the engine at an actual crawl segment has these files on
disk; without this module the engine would re-scan ~75 TB to rebuild
random access that already exists.  This module (a) parses and serves
point lookups from the public layout (``lookup_public_cdx``), (b)
converts it into house sidecars so split planning and the rest of the
index family work unchanged (``operators.webcorpus.cdx_to_sidecars``
rides :func:`cdx_rows_by_file`), and (c) emits the public layout from
archives (``build_public_cdx``) so downstream pywb-family tooling can
consume this engine's exports.

Coverage honesty: the public index names RESPONSE (and revisit) records
only — request/metadata records are invisible to it.  Everything built
from it is therefore marked PARTIAL (sidecar header ``kinds``, see
``warc_index.write_warc_index``), and pruning paths consult that mark so
a public-CDX MISS never drops a record type the index never enumerated.

All I/O goes through ``format.storage`` (local, sim://, memory://,
s3://).  SURT canonicalization is the documented common subset of the
public ``surt`` library's defaults, applied identically on emit and
lookup.
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import io
import json
import re
import zlib
from urllib.parse import urlsplit

from shardpack_spark.format import storage

CLUSTER_IDX = "cluster.idx"
# emit marker written next to cluster.idx by this engine's emitters; its
# presence proves the index keys came from THIS surt() — the condition
# under which a lookup MISS is a true absence (foreign indexes may
# canonicalize differently, so their misses must not prune; see
# warc_source._public_cdx_partitions)
CDX_META = "_cdx_meta.json"
SURT_VERSION = "shardpack-surt-1"
_CDX_SHARD_GLOB = "cdx-*.gz"
# cluster.idx at/below this size is read whole; above it, byte-bisected
# (full Common Crawl cluster.idx is ~200 MB — never stream it per lookup)
_CLUSTER_LINEAR_MAX = 4 << 20
_BISECT_WINDOW = 1 << 16
_WWW_RE = re.compile(r"^www\d*\.")


def surt(url: str) -> str:
    """Sort-friendly URI Reordering Transform — the key convention of the
    public CDX ecosystem: ``http://www.Example.com:80/Path?b=2&a=1`` ->
    ``com,example)/path?a=1&b=2``.

    The documented common subset of the ``surt`` library's default
    canonicalization: lowercase everything, drop the scheme and any
    userinfo, strip one leading ``www``/``wwwN`` host label, drop
    default ports (80/443; other ports stay as ``host:port``), reverse
    host labels with commas, sort query parameters, drop the fragment.
    Host-less inputs (``urn:...``) canonicalize to their lowercased
    form, so non-URL identities still produce stable keys."""
    u = url.strip().lower()
    if "://" not in u:
        # scheme-less host form ("example.com/x") gets implicit http;
        # non-hierarchical identities (urn:..., mailto:...) have no
        # authority to reorder — their lowercased form IS the key
        if "." not in u.split("/", 1)[0].split(":", 1)[0]:
            return u
        u = "//" + u
    parts = urlsplit(u, scheme="http")
    host = (parts.netloc or "").rsplit("@", 1)[-1]
    port = ""
    if ":" in host:
        host, _, p = host.rpartition(":")
        if p not in ("", "80", "443"):
            port = ":" + p
    host = _WWW_RE.sub("", host)
    if not host:
        return u  # no authority: keep the lowercased identity as the key
    key = ",".join(reversed(host.split("."))) + port + ")"
    key += parts.path or "/"
    if parts.query:
        key += "?" + "&".join(sorted(parts.query.split("&")))
    return key


def parse_cdx_line(line: str) -> dict | None:
    """One public CDXJ line -> ``{key, timestamp, url, filename, offset,
    length, status, mime, digest}`` (absent JSON fields None; offset/
    length as ints when parseable — CC writes them as strings).  None
    for blank/damaged lines — foreign indexes degrade, never crash."""
    line = line.strip()
    if not line:
        return None
    try:
        key, ts, blob = line.split(" ", 2)
        d = json.loads(blob)
        if not isinstance(d, dict):
            return None
        out = {
            "key": key,
            "timestamp": ts,
            "url": d.get("url"),
            "filename": d.get("filename"),
            "status": d.get("status"),
            "mime": d.get("mime"),
            "digest": d.get("digest"),
            "offset": None,
            "length": None,
        }
        for fld in ("offset", "length"):
            v = d.get(fld)
            if v is not None:
                try:
                    out[fld] = int(v)
                except (TypeError, ValueError):
                    return None  # a locator field that doesn't parse is damage
        return out
    except (ValueError, IndexError):
        return None


def _iter_text_lines(be, path: str):
    """Stream decoded text lines from a plain or (multi-member) gzip
    file through the storage layer — gzip.GzipFile handles concatenated
    members, which is exactly the zipnum block layout."""
    with be.open_read(path) as f:
        src = gzip.GzipFile(fileobj=f) if path.endswith(".gz") else f
        buf = b""
        while True:
            chunk = src.read(1 << 20)
            if chunk:
                buf += chunk
                lines = buf.split(b"\n")
                buf = lines.pop()
            else:
                lines = [buf] if buf else []
                buf = b""
            for raw in lines:
                yield raw.decode("utf-8", errors="replace")
            if not chunk:
                return


def iter_cdx_records(path: str, be=None):
    """Every parsed record of one cdx shard (or plain cdx file), in file
    order — the sequential-scan primitive conversions ride."""
    be = be or storage.for_path(path)
    for line in _iter_text_lines(be, path):
        rec = parse_cdx_line(line)
        if rec is not None:
            yield rec


def _list_cdx_shards(index_path: str, be) -> list[str]:
    """``index_path`` may be a directory (zipnum layout: cdx-*.gz [+
    cluster.idx]) or one concrete cdx file."""
    if index_path.endswith((".gz", ".cdx", ".cdxj")) and be.exists(index_path):
        return [index_path]
    base = index_path.rstrip("/")
    names = sorted(
        set(be.glob_names(base, _CDX_SHARD_GLOB))
        | set(be.glob_names(base, "*.cdx"))
        | set(be.glob_names(base, "*.cdxj.gz"))
    )
    return [f"{base}/{n}" for n in names]


def _first_line_at(be, path: str, pos: int, size: int) -> tuple[str, int] | None:
    """First complete text line starting at/after byte ``pos`` within
    ``[pos, size)``: ``(line, line_start)``.  ``pos == 0`` returns the
    first line; ``pos > 0`` drops the partial line in progress.  The
    cluster.idx analog of ``warc_index._row_offset_at``."""
    read_at = pos
    buf = b""
    dropped = pos == 0
    want = 1 << 16
    while True:
        nl = buf.find(b"\n")
        if nl < 0:
            if read_at >= size:
                return None
            chunk = be.read_bytes(path, read_at, min(want, size - read_at))
            if not chunk:
                return None
            buf += chunk
            read_at += len(chunk)
            want = min(want * 2, 8 << 20)
            continue
        line, buf = buf[:nl], buf[nl + 1 :]
        start = pos
        pos += nl + 1
        if not dropped:
            dropped = True
            continue
        if line.strip():
            return (line.decode("utf-8", errors="replace"), start)


def _cluster_candidate_blocks(
    be, idx_path: str, key: str
) -> list[tuple[str, int, int]]:
    """Block refs ``(cdx_file, offset, length)`` whose key range may hold
    ``key``: the greatest block start <= key plus every block start in
    ``(key, key_hi]`` (same-SURT lines span blocks; timestamps sort after
    the bare SURT, so ``key_hi = key + '!'``-free upper bound uses ``'~'``
    > any digit/printable key char).

    Small files are read whole; big ones are byte-BISECTED to the
    transition and streamed from there — O(log cluster + hits) reads on
    the ~200 MB Common Crawl cluster.idx, the same driver-I/O discipline
    as ``warc_index.snap_bounds``."""
    key_hi = key + " ~"
    try:
        size = be.getsize(idx_path)
    except Exception:
        return []

    def parse(line: str):
        cols = line.rstrip("\n").split("\t")
        if len(cols) < 4:
            return None
        try:
            return (cols[0], cols[1], int(cols[2]), int(cols[3]))
        except ValueError:
            return None

    lines: list[tuple[str, str, int, int]]
    if size <= _CLUSTER_LINEAR_MAX:
        raw = be.read_bytes(idx_path, 0, None).decode("utf-8", errors="replace")
        lines_iter = (parse(ln) for ln in raw.split("\n") if ln.strip())
        lines = [p for p in lines_iter if p is not None]
    else:
        # `lo` is ALWAYS a line start (0, or a probed start whose key
        # <= key) — so the greatest start <= key is at/after lo and the
        # stream below never skips it (same ownership discipline as
        # warc_index.snap_bounds' sidecar bisect)
        lo, hi = 0, size
        while hi - lo > _BISECT_WINDOW:
            mid = (lo + hi) // 2
            probe = _first_line_at(be, idx_path, mid, size)
            if probe is None:
                hi = mid
                continue
            p = parse(probe[0])
            if p is None or p[0] > key:
                hi = mid
            else:
                lo = probe[1]  # a line start strictly > mid: halves
        lines = []
        read_at = lo
        buf = b""
        done = False
        while not done:
            chunk = be.read_bytes(idx_path, read_at, 1 << 20)
            if chunk:
                read_at += len(chunk)
                buf += chunk
                raw_lines = buf.split(b"\n")
                buf = raw_lines.pop()
            else:
                raw_lines = [buf] if buf else []
                buf = b""
                done = True
            for raw in raw_lines:
                p = parse(raw.decode("utf-8", errors="replace"))
                if p is None:
                    continue
                lines.append(p)
                if p[0] > key_hi:
                    done = True
                    break

    out: list[tuple[str, int, int]] = []
    prev = None
    for p in lines:
        k = p[0]
        if k <= key:
            prev = p  # greatest start <= key so far
            continue
        if prev is not None and not out:
            out.append((prev[1], prev[2], prev[3]))
        if k <= key_hi:
            out.append((p[1], p[2], p[3]))
        else:
            break
    if prev is not None and not out:
        out.append((prev[1], prev[2], prev[3]))
    return out


def lookup_public_cdx(
    index_path: str, url: str | None = None, key: str | None = None, be=None
) -> list[dict]:
    """Point lookup against a public CDX index: all records whose SURT
    key equals ``surt(url)`` (or the given raw ``key``).

    Two-level when ``cluster.idx`` exists next to the shards: bisect the
    cluster (O(log) ranged reads), ranged-read ONLY the named gzip
    block(s), scan ~3000 lines — the public CDX-server algorithm, O(1)
    I/O in the dump size.  Without a cluster, shards are streamed
    (small/hand-built indexes).  Returns parsed rows (see
    :func:`parse_cdx_line`); unknown keys return []."""
    if key is None:
        if url is None:
            raise ValueError("lookup_public_cdx needs url or key")
        key = surt(url)
    be = be or storage.for_path(index_path)
    base = index_path.rstrip("/")
    cluster = f"{base}/{CLUSTER_IDX}"
    out: list[dict] = []
    if not index_path.endswith((".gz", ".cdx", ".cdxj")) and be.exists(cluster):
        shard_dir = base
        for cdx_file, off, length in _cluster_candidate_blocks(be, cluster, key):
            blob = be.read_bytes(f"{shard_dir}/{cdx_file}", off, length)
            try:
                text = gzip.decompress(blob).decode("utf-8", errors="replace")
            except (OSError, EOFError, zlib.error):
                # damaged block: degrade to a miss, never crash.  gzip
                # raises BadGzipFile (OSError) on a foreign magic, but
                # EOFError on truncation and zlib.error on corrupt
                # deflate bytes — a stale cluster.idx whose offset+length
                # overruns the shard hits the EOFError path
                continue
            for line in text.split("\n"):
                rec = parse_cdx_line(line)
                if rec is not None and rec["key"] == key:
                    out.append(rec)
        return out
    for shard in _list_cdx_shards(index_path, be):
        for rec in iter_cdx_records(shard, be=be):
            if rec["key"] == key:
                out.append(rec)
    return out


def write_cdx_meta(out_dir: str, be=None) -> None:
    """Stamp an emitted index with this engine's SURT version — the
    marker :func:`house_emitted` checks.  Ignored by pywb-family tooling
    (a loose JSON file outside the ``cdx-*``/``cluster.idx`` names)."""
    be = be or storage.for_path(out_dir)
    be.write_atomic(
        f"{out_dir.rstrip('/')}/{CDX_META}",
        json.dumps({"emitter": "shardpack-warc-cdxj", "surt": SURT_VERSION}).encode(),
    )


def house_emitted(index_path: str, be=None) -> bool:
    """True iff the index carries this engine's emit marker with a
    matching SURT version — keys then provably come from :func:`surt`,
    so a lookup MISS is a true absence.  Foreign/unmarked indexes (the
    real-crawl case) return False: their canonicalization may diverge,
    and callers must not treat a miss as proof of absence."""
    if index_path.endswith((".gz", ".cdx", ".cdxj")):
        return False  # bare shard file: no marker convention
    be = be or storage.for_path(index_path)
    p = f"{index_path.rstrip('/')}/{CDX_META}"
    try:
        if not be.exists(p):
            return False
        meta = json.loads(be.read_bytes(p, 0, None).decode("utf-8"))
        return meta.get("surt") == SURT_VERSION
    except Exception:
        return False


# --- emit --------------------------------------------------------------------


def _warc_ts(date: str | None) -> str:
    """WARC-Date (ISO 8601) -> the 14-digit CDX timestamp."""
    if not date:
        return "00000000000000"
    digits = "".join(c for c in date if c.isdigit())
    return (digits + "00000000000000")[:14]


def cdx_lines_for_archive(
    archive_path: str, filename: str, be=None
) -> list[str]:
    """Public CDXJ lines for ONE archive's response records — the
    per-archive unit of :func:`build_public_cdx` and the Spark exporter.

    One sequential parse; member ``length`` is the gap from a record's
    offset to the next member boundary of ANY record — request/metadata
    members interleaved after a response close its length, so a consumer
    ranged-reading exactly ``[offset, offset+length)`` (the pywb-family
    contract) gets that record's member and nothing else.  ``digest`` is
    the payload's SHA-1 in base32 — the public index convention.  Lines
    are returned UNSORTED (archive order); the caller owns the global
    key-sort the format requires."""
    from shardpack_spark.format.warc import iter_warc_records

    be = be or storage.for_path(archive_path)
    with be.open_read(archive_path) as f:
        f.seek(0, 2)
        size = f.tell()
    rows: list[tuple[int, dict, str]] = []  # (offset, json, ts)
    all_offs: set[int] = set()  # EVERY member boundary bounds a length
    with be.open_read(archive_path) as f:
        for rec in iter_warc_records(f, parse_http=True, skip_payload=False):
            all_offs.add(rec.offset)
            if rec.parse_error or rec.warc_type not in ("response", "revisit"):
                continue
            if not rec.target_uri:
                continue
            body = rec.payload if rec.payload is not None else rec.block
            # the public convention for REVISIT lines echoes the ORIGINAL
            # capture's digest from the WARC-Payload-Digest header
            # (sha1:B32) — never a hash of the revisit's own block, which
            # real writers (Heritrix convention) fill with the re-sent
            # HTTP headers, not page content
            h = rec.headers.get("warc-payload-digest") or ""
            hdr_digest = (
                h.split(":", 1)[1].strip() if h.lower().startswith("sha1:") else None
            )
            if rec.warc_type == "revisit":
                digest = hdr_digest
            elif body:
                digest = base64.b32encode(hashlib.sha1(body).digest()).decode("ascii")
            else:
                digest = hdr_digest
            d = {
                "url": rec.target_uri,
                # revisit records have no HTTP block; the public format
                # marks them "warc/revisit" (cdx_to_sidecars keys on it)
                "mime": (
                    "warc/revisit"
                    if rec.warc_type == "revisit"
                    else (rec.http_headers.get("content-type") or "").split(";")[0]
                    or None
                ),
                "status": str(rec.http_status) if rec.http_status is not None else None,
                "digest": digest,
                "offset": str(rec.offset),
                "filename": filename,
            }
            rows.append((rec.offset, {k: v for k, v in d.items() if v}, _warc_ts(rec.date)))
    lines: list[str] = []
    offs = sorted(all_offs)
    nxt = {o: (offs[i + 1] if i + 1 < len(offs) else size) for i, o in enumerate(offs)}
    for off, d, ts in rows:
        d["length"] = str(nxt[off] - off)
        lines.append(
            f"{surt(d['url'])} {ts} "
            + json.dumps(d, separators=(",", ":"), ensure_ascii=False)
        )
    return lines


def build_public_cdx(
    path: str, out_dir: str, block_lines: int = 3000, be=None
) -> dict:
    """Emit the public two-level index for a dump: globally key-sorted
    ``cdx-00000.gz`` (independent gzip members of ``block_lines`` lines)
    plus ``cluster.idx`` — the layout pywb-family tooling and
    :func:`lookup_public_cdx` consume.

    This is the Spark-free sequential twin (in-memory global sort —
    sized for small/medium dumps; a crawl-scale export is one
    ``orderBy(key)`` Spark job away using :func:`cdx_lines_for_archive`
    per archive).  ``filename`` fields are recorded relative to ``path``
    so the index travels with the dump."""
    from shardpack_spark.format.warc import list_warc_files

    be = be or storage.for_path(path)
    files = list_warc_files(path)
    base = path.rstrip("/")
    lines: list[str] = []
    for f in files:
        rel = f[len(base) + 1 :] if f.startswith(base + "/") else f.rsplit("/", 1)[-1]
        lines.extend(cdx_lines_for_archive(f, rel, be=storage.for_path(f)))
    lines.sort()
    obe = storage.for_path(out_dir)
    obe.makedirs(out_dir)
    shard_name = "cdx-00000.gz"
    cluster_lines: list[str] = []
    blob = io.BytesIO()
    pos = 0
    for i in range(0, len(lines), block_lines):
        block = ("\n".join(lines[i : i + block_lines]) + "\n").encode()
        member = gzip.compress(block, mtime=0)
        # cluster line: "<key> <ts>\t<file>\t<offset>\t<length>\t<line#>"
        cluster_lines.append(
            f"{lines[i].split(' {', 1)[0]}\t{shard_name}\t{pos}\t{len(member)}\t{i}"
        )
        blob.write(member)
        pos += len(member)
    obe.write_atomic(f"{out_dir.rstrip('/')}/{shard_name}", blob.getvalue())
    obe.write_atomic(
        f"{out_dir.rstrip('/')}/{CLUSTER_IDX}",
        ("\n".join(cluster_lines) + "\n").encode() if cluster_lines else b"",
    )
    write_cdx_meta(out_dir, be=obe)
    return {
        "out": out_dir,
        "files": len(files),
        "records": len(lines),
        "blocks": len(cluster_lines),
    }
