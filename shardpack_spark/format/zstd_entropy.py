"""Pure-Python zstd entropy coding: both halves of RFC 8878's
Compressed blocks.

Completes the fallback codec in ``codec.py``.  The DECODING half —
Finite State Entropy tables (§4.1), Huffman literals (§4.2), the
sequence execution loop (§3.1.1.3.2 / §3.1.1.4) — reads ANY
spec-compliant frame, so a dataset zstd-compressed with pyarrow or
libzstd on one machine remains readable on a machine with neither
wheel.  Validated in tests/test_codec.py by roundtripping frames
produced by pyarrow's bundled libzstd across compression levels and
data shapes (those frames use predefined, RLE, FSE-compressed and
repeat table modes, 1- and 4-stream Huffman literals, and treeless
blocks, so every decode path is exercised against the reference
implementation's output).

The ENCODING half (bottom of this module) gives the wheel-free writer
real compression: LZ77 greedy parse with backward extension and
repeat-offset history, per-stream sequence tables chosen RLE /
custom-FSE / predefined by cost, canonical-Huffman literals with
direct-weight tree descriptions.  Measured ~1.05-1.3x the output size
of libzstd level 3 on text corpora at pure-Python speed; its frames
decode with libzstd AND the decoder above (cross-verified plus fuzzed
in tests/test_codec.py).

The predefined FSE distributions and code tables are the RFC 8878
§3.1.1.3.2.2 constants (byte-for-byte identical to libzstd's
``LL_defaultNorm`` / ``ML_defaultNorm`` / ``OF_defaultNorm``).

Not supported (raises ``ValueError``, callers wrap in
ShardPackCodecError): dictionary frames (``Dictionary_ID_Flag != 0``)
— undecodable without the dictionary by definition.
"""

from __future__ import annotations

import bisect

# --- RFC 8878 §3.1.1.3.2.2: predefined FSE distributions ----------------------

_LL_DEFAULT_NORM = (
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
    -1, -1, -1, -1,
)
_LL_DEFAULT_AL = 6
_ML_DEFAULT_NORM = (
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
    -1, -1, -1, -1, -1,
)
_ML_DEFAULT_AL = 6
_OF_DEFAULT_NORM = (
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1,
)
_OF_DEFAULT_AL = 5

# RFC 8878 §3.1.1.3.2.1.1: literals-length code -> (baseline, extra bits)
_LL_CODE = [(i, 0) for i in range(16)] + [
    (16, 1), (18, 1), (20, 1), (22, 1), (24, 2), (28, 2), (32, 3), (40, 3),
    (48, 4), (64, 6), (128, 7), (256, 8), (512, 9), (1024, 10), (2048, 11),
    (4096, 12), (8192, 13), (16384, 14), (32768, 15), (65536, 16),
]
# §3.1.1.3.2.1.1: match-length code -> (baseline, extra bits)
_ML_CODE = [(i + 3, 0) for i in range(32)] + [
    (35, 1), (37, 1), (39, 1), (41, 1), (43, 2), (47, 2), (51, 3), (59, 3),
    (67, 4), (83, 4), (99, 5), (131, 7), (259, 8), (515, 9), (1027, 10),
    (2051, 11), (4099, 12), (8195, 13), (16387, 14), (32771, 15), (65539, 16),
]

_MAX_AL = {"ll": 9, "of": 8, "ml": 9}  # §3.1.1.3.2.1.2 accuracy-log caps
_HUF_WEIGHT_MAX_AL = 6  # §4.2.1.2
_HUF_MAX_BITS = 11  # §4.2.1


# --- bitstreams ---------------------------------------------------------------


class _BackBits:
    """RFC 8878 §3.1.1.7 backward bitstream: written forward, read from
    the last byte toward the first; the highest set bit of the final
    byte is a sentinel marking the end of meaningful bits.  Reads past
    the start zero-pad the LOW side of the returned value (matching the
    reference's shift-in-zeros container behavior) and drive ``bitpos``
    negative, which callers use as the exhaustion/overflow signal."""

    __slots__ = ("buf", "bitpos")

    def __init__(self, buf: bytes):
        if not buf or buf[-1] == 0:
            raise ValueError("zstd: backward bitstream missing sentinel bit")
        self.buf = buf
        self.bitpos = 8 * (len(buf) - 1) + buf[-1].bit_length() - 1

    def _extract(self, pos: int, n: int) -> int:
        lo = max(pos, 0)
        width = pos + n - lo
        if width <= 0:
            return 0
        b_lo = lo >> 3
        b_hi = (pos + n + 7) >> 3
        chunk = int.from_bytes(self.buf[b_lo:b_hi], "little")
        v = (chunk >> (lo - 8 * b_lo)) & ((1 << width) - 1)
        return (v << (n - width)) if pos < 0 else v

    def read(self, n: int) -> int:
        self.bitpos -= n
        return self._extract(self.bitpos, n) if n else 0

    def peek(self, n: int) -> int:
        return self._extract(self.bitpos - n, n)

    def consume(self, n: int) -> None:
        self.bitpos -= n


class _FwdBits:
    """Forward little-endian bitstream (FSE table descriptions, §4.1.1):
    bits are read LSB-first from successive bytes."""

    __slots__ = ("buf", "base", "bit")

    def __init__(self, buf: bytes, base: int):
        self.buf = buf
        self.base = base  # byte offset of bit 0
        self.bit = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        pos = self.base * 8 + self.bit
        b_lo = pos >> 3
        b_hi = (pos + n + 7) >> 3
        if b_hi > len(self.buf):
            raise ValueError("zstd: truncated FSE table description")
        chunk = int.from_bytes(self.buf[b_lo:b_hi], "little")
        self.bit += n
        return (chunk >> (pos - 8 * b_lo)) & ((1 << n) - 1)

    def bytes_consumed(self) -> int:
        return (self.bit + 7) >> 3


# --- FSE ----------------------------------------------------------------------


def _fse_build(norm: list[int] | tuple[int, ...], al: int) -> list[tuple[int, int, int]]:
    """Decoding table [(symbol, nb_bits, baseline)] per §4.1.1's spread
    and state-assignment algorithm.  Symbols with probability -1
    ("less than 1") take single cells at the table's top and always
    reload a full ``al`` bits."""
    size = 1 << al
    cells = [0] * size
    high = size
    for s, c in enumerate(norm):
        if c == -1:
            high -= 1
            cells[high] = s
    pos = 0
    step = (size >> 1) + (size >> 3) + 3
    mask = size - 1
    for s, c in enumerate(norm):
        for _ in range(max(c, 0)):
            cells[pos] = s
            pos = (pos + step) & mask
            while pos >= high:
                pos = (pos + step) & mask
    if pos != 0:
        raise ValueError("zstd: corrupt FSE distribution (spread incomplete)")
    # occurrence counters start at the symbol's frequency (1 for the -1
    # cells): the k-th cell of a symbol with frequency c gets x = c + k,
    # nb = al - floor(log2(x)), baseline = (x << nb) - size
    freq = [1 if c == -1 else c for c in norm]
    table: list[tuple[int, int, int]] = [None] * size  # type: ignore[list-item]
    for i in range(size):
        s = cells[i]
        x = freq[s]
        freq[s] = x + 1
        nb = al - (x.bit_length() - 1)
        table[i] = (s, nb, (x << nb) - size)
    return table


def _fse_parse_description(
    buf: bytes, off: int, max_al: int, max_symbol: int
) -> tuple[list[tuple[int, int, int]], int, int]:
    """Parse an FSE table description at ``buf[off:]`` (§4.1.1).
    Returns (decoding table, accuracy_log, bytes consumed)."""
    bits = _FwdBits(buf, off)
    al = bits.read(4) + 5
    if al > max_al:
        raise ValueError(f"zstd: FSE accuracy log {al} exceeds cap {max_al}")
    remaining = (1 << al) + 1
    threshold = 1 << al
    nb_bits = al + 1
    norm: list[int] = []
    prev_zero = False
    while remaining > 1 and len(norm) <= max_symbol:
        if prev_zero:
            while True:
                rep = bits.read(2)
                norm.extend((0,) * rep)
                if rep < 3:
                    break
            prev_zero = False
            if len(norm) > max_symbol + 1:
                raise ValueError("zstd: FSE description overruns symbol range")
            continue
        cutoff = (2 * threshold - 1) - remaining
        v = bits.read(nb_bits - 1)
        if v < cutoff:
            count = v
        else:
            # one more bit decides the high half
            v |= bits.read(1) << (nb_bits - 1)
            count = v if v < threshold else v - cutoff
        count -= 1  # [-1, remaining-1]
        remaining -= -count if count < 0 else count
        norm.append(count)
        prev_zero = count == 0
        while remaining < threshold:
            nb_bits -= 1
            threshold >>= 1
    if remaining != 1:
        raise ValueError("zstd: corrupt FSE description (counts don't sum)")
    return _fse_build(norm, al), al, bits.bytes_consumed()


# --- Huffman ------------------------------------------------------------------


def _huf_table_from_weights(weights: list[int]) -> tuple[list[tuple[int, int]], int]:
    """Decoding table (size 2^max_bits of (symbol, nb_bits)) from
    explicit weights; the LAST symbol's weight is implied (§4.2.1.1).
    Lower-weight (longer-code) symbols fill the table from position 0,
    ascending by weight then symbol — the canonical assignment."""
    total = sum((1 << (w - 1)) for w in weights if w > 0)
    if total == 0:
        raise ValueError("zstd: huffman weights all zero")
    # the last weight is implied: total must be topped up to the next
    # power of two, STRICTLY above total (so even an exact power gets
    # max_bits = log2+1 and a nonzero remainder for the implied symbol)
    max_bits = total.bit_length()
    left = (1 << max_bits) - total
    if left <= 0 or left & (left - 1):
        raise ValueError("zstd: corrupt huffman weights (no implied last)")
    weights = weights + [left.bit_length()]
    if max_bits > _HUF_MAX_BITS:
        raise ValueError(f"zstd: huffman table log {max_bits} > {_HUF_MAX_BITS}")
    table: list[tuple[int, int]] = [(0, 0)] * (1 << max_bits)
    pos = 0
    for w in range(1, max_bits + 1):
        span = 1 << (w - 1)
        nb = max_bits + 1 - w
        for sym, ws in enumerate(weights):
            if ws == w:
                for i in range(pos, pos + span):
                    table[i] = (sym, nb)
                pos += span
    if pos != len(table):
        raise ValueError("zstd: corrupt huffman weights (table underfilled)")
    return table, max_bits


def _huf_read_weights(src: bytes, off: int) -> tuple[list[int], int]:
    """Huffman tree description (§4.2.1.1) at src[off:]:
    header >= 128 -> direct 4-bit weights; else FSE-compressed weights
    decoded by two interleaved states (§4.2.1.2).  Returns (weights,
    bytes consumed including header)."""
    hb = src[off]
    if hb >= 128:
        n = hb - 127
        nbytes = (n + 1) // 2
        ws = []
        for i in range(n):
            b = src[off + 1 + (i >> 1)]
            ws.append((b >> 4) if i % 2 == 0 else (b & 0xF))
        return ws, 1 + nbytes
    csize = hb
    if off + 1 + csize > len(src):
        raise ValueError("zstd: truncated huffman tree description")
    region = src[off + 1 : off + 1 + csize]
    table, al, desc_bytes = _fse_parse_description(
        region, 0, _HUF_WEIGHT_MAX_AL, 255
    )
    bs = _BackBits(region[desc_bytes:])
    s1 = bs.read(al)
    s2 = bs.read(al)
    if bs.bitpos < 0:
        raise ValueError("zstd: huffman weight stream too short")
    ws: list[int] = []
    while True:
        sym, nb, base = table[s1]
        ws.append(sym)
        s1 = base + bs.read(nb)
        if bs.bitpos < 0:
            ws.append(table[s2][0])
            break
        sym, nb, base = table[s2]
        ws.append(sym)
        s2 = base + bs.read(nb)
        if bs.bitpos < 0:
            ws.append(table[s1][0])
            break
        if len(ws) > 255:
            raise ValueError("zstd: huffman weight stream overruns 255 symbols")
    return ws, 1 + csize


def _huf_decode_stream(
    buf: bytes, table: list[tuple[int, int]], max_bits: int, regen: int
) -> bytearray:
    bs = _BackBits(buf)
    out = bytearray()
    floor = -max_bits - 8
    while len(out) < regen:
        sym, nb = table[bs.peek(max_bits)]
        if nb == 0 or bs.bitpos < floor:
            raise ValueError("zstd: corrupt huffman stream")
        bs.consume(nb)
        out.append(sym)
    return out


# --- literals section ---------------------------------------------------------


def _decode_literals(src: bytes, off: int, end: int, ctx: dict) -> tuple[bytes, int]:
    """Literals section (§3.1.1.3.1) at src[off:end].  Returns
    (literals, offset past the section).  ``ctx['huf']`` carries the
    frame's last Huffman table for Treeless_Literals_Block reuse."""
    b0 = src[off]
    ltype = b0 & 3
    size_fmt = (b0 >> 2) & 3
    if ltype in (0, 1):  # Raw / RLE
        if size_fmt & 1 == 0:  # 00 or 10: 5-bit size, 1-byte header
            regen = b0 >> 3
            hdr = 1
        elif size_fmt == 1:
            regen = (b0 >> 4) | (src[off + 1] << 4)
            hdr = 2
        else:
            regen = (b0 >> 4) | (src[off + 1] << 4) | (src[off + 2] << 12)
            hdr = 3
        if ltype == 0:
            lits = src[off + hdr : off + hdr + regen]
            if len(lits) != regen:
                raise ValueError("zstd: truncated raw literals")
            return lits, off + hdr + regen
        return src[off + hdr : off + hdr + 1] * regen, off + hdr + 1
    # Compressed (2) / Treeless (3)
    if size_fmt == 0:
        streams = 1
        v = b0 >> 4 | (src[off + 1] << 4) | (src[off + 2] << 12)
        regen, csize = v & 0x3FF, v >> 10
        hdr = 3
    elif size_fmt == 1:
        streams = 4
        v = b0 >> 4 | (src[off + 1] << 4) | (src[off + 2] << 12)
        regen, csize = v & 0x3FF, v >> 10
        hdr = 3
    elif size_fmt == 2:
        streams = 4
        v = b0 >> 4 | (src[off + 1] << 4) | (src[off + 2] << 12) | (src[off + 3] << 20)
        regen, csize = v & 0x3FFF, v >> 14
        hdr = 4
    else:
        streams = 4
        v = (
            b0 >> 4
            | (src[off + 1] << 4)
            | (src[off + 2] << 12)
            | (src[off + 3] << 20)
            | (src[off + 4] << 28)
        )
        regen, csize = v & 0x3FFFF, v >> 18
        hdr = 5
    pos = off + hdr
    body_end = pos + csize
    if body_end > end:
        raise ValueError("zstd: literals section overruns block")
    if ltype == 2:
        weights, used = _huf_read_weights(src, pos)
        table, max_bits = _huf_table_from_weights(weights)
        ctx["huf"] = (table, max_bits)
        pos += used
    else:
        if ctx.get("huf") is None:
            raise ValueError("zstd: treeless literals with no previous table")
        table, max_bits = ctx["huf"]
    if streams == 1:
        lits = _huf_decode_stream(src[pos:body_end], table, max_bits, regen)
    else:
        s1 = int.from_bytes(src[pos : pos + 2], "little")
        s2 = int.from_bytes(src[pos + 2 : pos + 4], "little")
        s3 = int.from_bytes(src[pos + 4 : pos + 6], "little")
        pos += 6
        s4 = body_end - pos - s1 - s2 - s3
        if s4 <= 0:
            raise ValueError("zstd: corrupt 4-stream jump table")
        r13 = (regen + 3) >> 2
        r4 = regen - 3 * r13
        if r4 < 0:
            raise ValueError("zstd: corrupt 4-stream regenerated size")
        lits = bytearray()
        for sz, rg in ((s1, r13), (s2, r13), (s3, r13), (s4, r4)):
            lits += _huf_decode_stream(src[pos : pos + sz], table, max_bits, rg)
            pos += sz
    if len(lits) != regen:
        raise ValueError("zstd: literal count mismatch")
    return bytes(lits), body_end


# --- sequences ----------------------------------------------------------------


def _seq_table(
    src: bytes, pos: int, mode: int, kind: str, ctx: dict
) -> tuple[list[tuple[int, int, int]], int, int]:
    """One symbol-compression-mode table (§3.1.1.3.2.1.2).  Returns
    (table, accuracy_log, new position)."""
    if mode == 0:  # predefined
        norm, al = {
            "ll": (_LL_DEFAULT_NORM, _LL_DEFAULT_AL),
            "of": (_OF_DEFAULT_NORM, _OF_DEFAULT_AL),
            "ml": (_ML_DEFAULT_NORM, _ML_DEFAULT_AL),
        }[kind]
        t = ctx.setdefault("_predef", {}).get(kind)
        if t is None:
            t = _fse_build(norm, al)
            ctx["_predef"][kind] = t
        ctx[kind] = (t, al)
        return t, al, pos
    if mode == 1:  # RLE: single symbol, zero-bit state machine
        sym = src[pos]
        t = [(sym, 0, 0)]
        ctx[kind] = (t, 0)
        return t, 0, pos + 1
    if mode == 2:  # FSE-compressed description
        max_sym = {"ll": 35, "of": 31, "ml": 52}[kind]
        t, al, used = _fse_parse_description(src, pos, _MAX_AL[kind], max_sym)
        ctx[kind] = (t, al)
        return t, al, pos + used
    prev = ctx.get(kind)  # mode 3: repeat
    if prev is None:
        raise ValueError(f"zstd: repeat mode for {kind} with no previous table")
    return prev[0], prev[1], pos


def decode_compressed_block(src: bytes, off: int, bsize: int, out: bytearray, ctx: dict) -> None:
    """Decode one Compressed block (src[off:off+bsize]) appending the
    regenerated bytes to ``out`` (§3.1.1.3).  ``out`` holds the frame's
    prior output — sequence matches may reach back into it.  ``ctx``
    persists the frame's Huffman table and FSE tables for
    treeless/repeat modes."""
    end = off + bsize
    literals, pos = _decode_literals(src, off, end, ctx)
    # §3.1.1.3.2: number of sequences
    b0 = src[pos]
    if b0 < 128:
        nseq, pos = b0, pos + 1
    elif b0 < 255:
        nseq, pos = ((b0 - 128) << 8) | src[pos + 1], pos + 2
    else:
        # long form: byte0=255 -> LE u16 PLUS 0x7F00 (addition, not OR:
        # OR already has bit 8 set in 0x7F00, so it mis-decodes every
        # count >= 0x8000 — caught by review against a crafted frame)
        nseq, pos = (src[pos + 1] | (src[pos + 2] << 8)) + 0x7F00, pos + 3
    if nseq == 0:
        out += literals
        return
    modes = src[pos]
    pos += 1
    if modes & 3:
        raise ValueError("zstd: reserved sequence mode bits set")
    ll_t, ll_al, pos = _seq_table(src, pos, (modes >> 6) & 3, "ll", ctx)
    of_t, of_al, pos = _seq_table(src, pos, (modes >> 4) & 3, "of", ctx)
    ml_t, ml_al, pos = _seq_table(src, pos, (modes >> 2) & 3, "ml", ctx)
    bs = _BackBits(src[pos:end])
    ll_state = bs.read(ll_al)
    of_state = bs.read(of_al)
    ml_state = bs.read(ml_al)
    if bs.bitpos < 0:
        raise ValueError("zstd: sequence bitstream too short")
    # §3.1.1.5 repeat-offset history: initialized once per FRAME and
    # carried across blocks (a per-block reset decodes multi-block
    # frames wrong whenever block N's first sequences reuse block N-1's
    # offsets — caught by the >128 KiB cases in the cross-codec fuzz)
    rep = ctx.setdefault("rep", [1, 4, 8])
    lit_pos = 0
    for i in range(nseq):
        of_code = of_t[of_state][0]
        if of_code > 31:
            raise ValueError("zstd: offset code out of range")
        offset_value = (1 << of_code) + bs.read(of_code)
        ml_base, ml_bits = _ML_CODE[ml_t[ml_state][0]]
        ml = ml_base + bs.read(ml_bits)
        ll_base, ll_bits = _LL_CODE[ll_t[ll_state][0]]
        ll = ll_base + bs.read(ll_bits)
        if bs.bitpos < 0:
            raise ValueError("zstd: sequence bitstream exhausted mid-sequence")
        # resolve the offset against the 3-slot repeat history
        if offset_value > 3:
            offset = offset_value - 3
            rep = [offset, rep[0], rep[1]]
        else:
            idx = offset_value - 1 if ll != 0 else offset_value
            if idx == 0:
                offset = rep[0]
            elif idx == 1:
                offset = rep[1]
                rep = [rep[1], rep[0], rep[2]]
            elif idx == 2:
                offset = rep[2]
                rep = [rep[2], rep[0], rep[1]]
            else:  # ll == 0 and offset_value == 3
                offset = rep[0] - 1
                if offset <= 0:
                    raise ValueError("zstd: repeat offset underflow")
                rep = [offset, rep[0], rep[1]]
        out += literals[lit_pos : lit_pos + ll]
        lit_pos += ll
        if offset > len(out):
            raise ValueError("zstd: match offset beyond decoded window")
        if offset >= ml:
            start = len(out) - offset
            out += out[start : start + ml]
        else:  # overlapping copy: byte-at-a-time semantics
            start = len(out) - offset
            for k in range(ml):
                out.append(out[start + k])
        if i + 1 < nseq:
            ll_state = ll_t[ll_state][2] + bs.read(ll_t[ll_state][1])
            ml_state = ml_t[ml_state][2] + bs.read(ml_t[ml_state][1])
            of_state = of_t[of_state][2] + bs.read(of_t[of_state][1])
            if bs.bitpos < 0:
                raise ValueError("zstd: sequence state update past stream start")
    ctx["rep"] = rep
    out += literals[lit_pos:]


# --- encoding -------------------------------------------------------------------
#
# The ENCODING half of the fallback codec: real Compressed blocks (LZ77
# greedy parse -> predefined-FSE sequences + canonical-Huffman literals),
# emitted only when neither pyarrow nor zstandard is importable.  Every
# construction below is the exact mirror of a decoder above — the FSE
# encode view inverts _fse_build's decode table, the Huffman code
# assignment replays _huf_table_from_weights' fill order, the backward
# bit writer appends chunks in reverse decoder-read order — so the two
# halves pin each other, and libzstd (via pyarrow, where present in CI)
# pins both.
#
# Deliberately NOT emitted (simplicity over the last few %): repeat
# offsets (Offset_Value 1-3), treeless/repeat table modes,
# FSE-compressed Huffman weight descriptions (literals whose alphabet
# extends past symbol 128 fall back to raw literals — LZ still applies).


class _BackBitWriter:
    """Forward writer for the §3.1.1.7 backward bitstream: chunks
    appended here are read by ``_BackBits`` in reverse append order, so
    callers append in reverse decoder-read order.  ``finish`` adds the
    sentinel bit the decoder requires in the final byte."""

    __slots__ = ("out", "acc", "n")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def add(self, val: int, nb: int) -> None:
        self.acc |= val << self.n
        self.n += nb
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def finish(self) -> bytes:
        self.acc |= 1 << self.n
        self.n += 1
        while self.n > 0:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8
        return bytes(self.out)


def _pack_backward(values, widths) -> bytes:
    """Backward bitstream from parallel (value, bit-width) sequences —
    the vectorized equivalent of appending each pair to ``_BackBitWriter``
    in order and calling ``finish()`` (sentinel included).  Bit ranges
    are disjoint by construction, so the scatter is a bitwise OR; widths
    must stay <= 56 so a shifted chunk fits 8 bytes (ours cap at 28)."""
    import numpy as np

    v = np.asarray(values, dtype=np.uint64)
    w = np.asarray(widths, dtype=np.int64)
    if len(w) == 0:
        return b"\x01"
    ends = np.cumsum(w)
    total = int(ends[-1])
    starts = ends - w
    nbytes = (total + 8) >> 3  # + sentinel bit
    acc = np.zeros(nbytes + 8, dtype=np.uint8)
    b_idx = starts >> 3
    chunk = v << (starts & 7).astype(np.uint64)
    for k in range(5):
        np.bitwise_or.at(
            acc, b_idx + k,
            ((chunk >> np.uint64(8 * k)) & np.uint64(0xFF)).astype(np.uint8),
        )
    acc[total >> 3] |= np.uint8(1 << (total & 7))
    return acc[:nbytes].tobytes()


def _fse_enc_view(norm, al):
    """Encode view of the §4.1.1 decode table: for each symbol, its
    decode states as (baseline, nb_bits, state), sorted by baseline.
    tANS invariant: one symbol's [baseline, baseline + 2^nb) ranges tile
    the whole state space, so for any required next-state there is
    exactly one valid current state per symbol."""
    view: dict[int, list[tuple[int, int, int]]] = {}
    for state, (s, nb, base) in enumerate(_fse_build(norm, al)):
        view.setdefault(s, []).append((base, nb, state))
    for lst in view.values():
        lst.sort()
    return view


_ENC_VIEWS: dict[str, dict] = {}


def _enc_view(kind: str) -> dict:
    v = _ENC_VIEWS.get(kind)
    if v is None:
        norm, al = {
            "ll": (_LL_DEFAULT_NORM, _LL_DEFAULT_AL),
            "of": (_OF_DEFAULT_NORM, _OF_DEFAULT_AL),
            "ml": (_ML_DEFAULT_NORM, _ML_DEFAULT_AL),
        }[kind]
        v = _ENC_VIEWS[kind] = _fse_enc_view(norm, al)
    return v


def _fse_chunks(
    codes: list[int], view: dict, min_last_nb: int = 0
) -> tuple[int, list[tuple[int, int]]]:
    """Backward FSE state assignment.  Returns (initial state — the one
    the decoder reads first and uses to emit codes[0] — and, per
    transition i, the (value, nb_bits) the decoder reads to move from
    state_i to state_{i+1}).

    ``min_last_nb`` constrains the state chosen for the FINAL code:
    exhaustion-terminated streams (Huffman weights, §4.2.1.2) end when
    a state reload overruns the bitstream, so the state whose reload is
    the terminator must ask for >= 1 bit — a high-probability symbol
    (> half the table) owns nb=0 states that would never overrun.
    Every symbol has at least one state with nb >= 1 (its lowest
    occurrence), so the constraint is always satisfiable."""
    n = len(codes)
    upds: list[tuple[int, int]] = [(0, 0)] * (n - 1)
    last = view[codes[-1]]  # any state decoding the last code qualifies...
    state = next(e for e in last if e[1] >= min_last_nb)[2]  # ...within the floor
    for i in range(n - 2, -1, -1):
        lst = view[codes[i]]
        base, nb, st = lst[bisect.bisect_right(lst, (state, 1 << 30, 1 << 30)) - 1]
        upds[i] = (state - base, nb)
        state = st
    return state, upds


_LL_BASELINES = [b for b, _ in _LL_CODE]
_ML_BASELINES = [b for b, _ in _ML_CODE]


def _val_to_code(v: int, baselines: list[int], table) -> tuple[int, int, int]:
    c = bisect.bisect_right(baselines, v) - 1
    base, nb = table[c]
    return c, v - base, nb


def _encode_sequences(
    seqs: list[tuple[int, int, int]], rep: list[int]
) -> tuple[bytes, list[int]]:
    """Sequences section (§3.1.1.3.2) for (literal_length, offset,
    match_length) triples, predefined FSE tables for all three code
    streams.  ``rep`` is the frame's 3-slot repeat-offset history at
    block entry (§3.1.1.5); offsets found there encode as the 0-extra-bit
    Offset_Values 1-3 — the big bit-saver on text, where one template
    stride repeats for many sequences.  Returns (section bytes, the
    history at block exit) WITHOUT mutating ``rep``: the caller commits
    the new history only if it actually emits this compressed block (a
    raw-block fallback must leave the decoder-visible history
    untouched)."""
    out = bytearray()
    n = len(seqs)
    if n < 128:
        out.append(n)
    elif n < 0x7F00:
        out += bytes([128 + (n >> 8), n & 0xFF])
    else:
        out += bytes([255, (n - 0x7F00) & 0xFF, (n - 0x7F00) >> 8])
    if n == 0:
        return bytes(out), list(rep)
    rep = list(rep)
    ll_codes: list[int] = []
    of_codes: list[int] = []
    ml_codes: list[int] = []
    extras: list[tuple[tuple[int, int], tuple[int, int], tuple[int, int]]] = []
    for ll, off, ml in seqs:
        lc, le, lb = _val_to_code(ll, _LL_BASELINES, _LL_CODE)
        # repeat-offset resolution: the exact inverse of the decoder's
        # §3.1.1.5 branch (note idx shifts by one when ll == 0)
        if ll != 0 and off == rep[0]:
            ov = 1
        elif ll != 0 and off == rep[1]:
            ov = 2
            rep = [rep[1], rep[0], rep[2]]
        elif ll != 0 and off == rep[2]:
            ov = 3
            rep = [rep[2], rep[0], rep[1]]
        elif ll == 0 and off == rep[1]:
            ov = 1
            rep = [rep[1], rep[0], rep[2]]
        elif ll == 0 and off == rep[2]:
            ov = 2
            rep = [rep[2], rep[0], rep[1]]
        elif ll == 0 and off == rep[0] - 1 and off > 0:
            ov = 3
            rep = [off, rep[0], rep[1]]
        else:
            ov = off + 3
            rep = [off, rep[0], rep[1]]
        oc = ov.bit_length() - 1
        mc, me, mb = _val_to_code(ml, _ML_BASELINES, _ML_CODE)
        ll_codes.append(lc)
        of_codes.append(oc)
        ml_codes.append(mc)
        extras.append(((ov - (1 << oc), oc), (me, mb), (le, lb)))
    # per-stream mode: RLE / custom FSE / predefined, cheapest wins; the
    # mode byte is followed by the three table descriptions in LL, OF,
    # ML order — exactly what _seq_table consumes
    ll_mode, ll_desc, ll_view, ll_al = _choose_stream(ll_codes, "ll")
    of_mode, of_desc, of_view, of_al = _choose_stream(of_codes, "of")
    ml_mode, ml_desc, ml_view, ml_al = _choose_stream(ml_codes, "ml")
    out.append((ll_mode << 6) | (of_mode << 4) | (ml_mode << 2))
    out += ll_desc
    out += of_desc
    out += ml_desc
    ll_init, ll_upd = _fse_chunks(ll_codes, ll_view)
    of_init, of_upd = _fse_chunks(of_codes, of_view)
    ml_init, ml_upd = _fse_chunks(ml_codes, ml_view)
    # decoder read order (decode_compressed_block): init LL/OF/ML states,
    # then per sequence OF-extra, ML-extra, LL-extra, then (not last)
    # state updates LL, ML, OF
    chunks: list[tuple[int, int]] = [
        (ll_init, ll_al),
        (of_init, of_al),
        (ml_init, ml_al),
    ]
    for i in range(n):
        chunks += extras[i]
        if i + 1 < n:
            chunks.append(ll_upd[i])
            chunks.append(ml_upd[i])
            chunks.append(of_upd[i])
    chunks.reverse()
    out += _pack_backward([c[0] for c in chunks], [c[1] for c in chunks])
    return bytes(out), rep


def _huf_lengths(freqs: dict[int, int], max_len: int = _HUF_MAX_BITS):
    """Code lengths (dict symbol -> bits) for >= 2 symbols, Huffman then
    clamped to ``max_len`` with the Kraft sum repaired to exactly 1.
    Returns None when a complete code within the cap can't be reached
    (caller falls back to raw literals)."""
    import heapq

    heap = [(f, s, (s,)) for s, f in freqs.items()]
    heapq.heapify(heap)
    depth = {s: 0 for s in freqs}
    tie = 256
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        tie += 1
        heapq.heappush(heap, (f1 + f2, tie, g1 + g2))
    if max(depth.values()) <= max_len:
        return depth
    for s in depth:
        depth[s] = min(depth[s], max_len)
    target = 1 << max_len
    kraft = sum(1 << (max_len - d) for d in depth.values())
    by_freq = sorted(freqs, key=freqs.get)
    while kraft > target:  # over-full from clamping: push rare symbols down
        moved = False
        for s in by_freq:
            if depth[s] < max_len:
                kraft -= 1 << (max_len - depth[s] - 1)
                depth[s] += 1
                moved = True
                if kraft <= target:
                    break
        if not moved:
            return None
    while kraft < target:  # under-full: promote the deepest symbol that fits
        slack = target - kraft
        for s in sorted(depth, key=depth.get, reverse=True):
            gain = 1 << (max_len - depth[s])
            if depth[s] > 1 and gain <= slack:
                depth[s] -= 1
                kraft += gain
                break
        else:
            return None
    return depth


def _huf_encoder(depth: dict[int, int]):
    """(codes dict symbol -> (code, nb), weights list incl. the implied
    last symbol) with the code assignment _huf_table_from_weights will
    reconstruct: table positions ascending by weight, then symbol."""
    max_bits = max(depth.values())
    last = max(depth)
    weights = [0] * (last + 1)
    for s, d in depth.items():
        weights[s] = max_bits + 1 - d
    codes: dict[int, tuple[int, int]] = {}
    pos = 0
    for w in range(1, max_bits + 1):
        span = 1 << (w - 1)
        nb = max_bits + 1 - w
        for sym in range(last + 1):
            if weights[sym] == w:
                codes[sym] = (pos >> (w - 1), nb)
                pos += span
    if pos != 1 << max_bits:
        raise ValueError("zstd: internal: huffman code not Kraft-complete")
    return codes, weights


def _huf_stream(lits, codes) -> bytes:
    import numpy as np

    code_lut = np.zeros(256, dtype=np.uint64)
    nb_lut = np.zeros(256, dtype=np.int64)
    for sym, (v, nb) in codes.items():
        code_lut[sym] = v
        nb_lut[sym] = nb
    rev = np.frombuffer(bytes(lits), dtype=np.uint8)[::-1]
    return _pack_backward(code_lut[rev], nb_lut[rev])


def _rawish_lit_header(ltype: int, n: int) -> bytes:
    if n < 32:
        return bytes([ltype | (n << 3)])
    if n < 4096:
        return bytes([ltype | (1 << 2) | ((n & 0xF) << 4), n >> 4])
    return bytes([ltype | (3 << 2) | ((n & 0xF) << 4), (n >> 4) & 0xFF, n >> 12])


def _encode_literals_section(lits: bytes) -> bytes:
    """Literals section (§3.1.1.3.1): the smallest of raw, RLE, and
    Huffman-compressed (1 stream <= 1023 literals, else 4 streams with
    the jump table).  Huffman uses the direct-weight tree description,
    which covers alphabets up to symbol 128 — beyond that (binary-heavy
    literals) raw wins anyway."""
    n = len(lits)
    raw = _rawish_lit_header(0, n) + lits
    if n == 0:
        return raw
    freqs: dict[int, int] = {}
    for ch in lits:
        freqs[ch] = freqs.get(ch, 0) + 1
    if len(freqs) == 1:
        return _rawish_lit_header(1, n) + lits[:1]  # RLE literals
    if n < 32:
        return raw
    depth = _huf_lengths(freqs)
    if depth is None:
        return raw
    codes, weights = _huf_encoder(depth)
    nw = len(weights) - 1  # last symbol's weight is implied
    if nw <= 128:
        tree = bytes([127 + nw]) + bytes(
            (weights[i] << 4) | (weights[i + 1] if i + 1 < nw else 0)
            for i in range(0, nw, 2)
        )
    else:
        # alphabet extends past symbol 128: the direct 4-bit form can't
        # describe it; FSE-compress the weight list (multilingual UTF-8
        # literals land here routinely)
        tree = _huf_fse_weight_desc(weights[:nw])
        if tree is None:
            return raw
    if n <= 1023:
        body = tree + _huf_stream(lits, codes)
        csize = len(body)
        if csize > 1023:
            return raw
        v = n | (csize << 10)
        hdr = bytes([2 | ((v & 0xF) << 4), (v >> 4) & 0xFF, v >> 12])
    else:
        r13 = (n + 3) >> 2
        streams = [
            _huf_stream(lits[0:r13], codes),
            _huf_stream(lits[r13 : 2 * r13], codes),
            _huf_stream(lits[2 * r13 : 3 * r13], codes),
            _huf_stream(lits[3 * r13 :], codes),
        ]
        jump = b"".join(len(s).to_bytes(2, "little") for s in streams[:3])
        if max(len(s) for s in streams[:3]) > 0xFFFF:
            return raw
        body = tree + jump + b"".join(streams)
        csize = len(body)
        if n <= 16383 and csize <= 16383:
            v = n | (csize << 14)
            hdr = bytes(
                [2 | (2 << 2) | ((v & 0xF) << 4), (v >> 4) & 0xFF,
                 (v >> 12) & 0xFF, v >> 20]
            )
        elif csize < 1 << 18:
            v = n | (csize << 18)
            hdr = bytes(
                [2 | (3 << 2) | ((v & 0xF) << 4), (v >> 4) & 0xFF,
                 (v >> 12) & 0xFF, (v >> 20) & 0xFF, v >> 28]
            )
        else:
            return raw
    out = hdr + body
    return out if len(out) < len(raw) else raw


_OFF_CAP = (1 << 28) - 3  # keep Offset_Value codes within the predefined table


def _common_len(src: bytes, a: int, b: int, limit: int) -> int:
    l = 0
    while l + 64 <= limit and src[a + l : a + l + 64] == src[b + l : b + l + 64]:
        l += 64
    while l < limit and src[a + l] == src[b + l]:
        l += 1
    return l


def _lz_parse(
    src: bytes, start: int, end: int, table: dict[int, int]
) -> tuple[list[tuple[int, int, int]], bytes]:
    """Greedy 2-probe LZ77 over src[start:end] -> ((ll, offset, ml)
    sequences, concatenated literal bytes).  ``table`` (4-byte-hash ->
    the two most recent positions) persists across blocks, so matches
    may reach into earlier blocks of the same frame — legal in
    single-segment mode, where the window is the whole frame.  Matches
    extend BACKWARD into pending literals (the hash only fires at the
    repeat's 4-byte alignment; the repeat often starts earlier) and
    never cross the block end (each block regenerates independently).
    The skip counter accelerates through incompressible regions,
    trading a little ratio for bounded worst-case time."""
    import numpy as np

    # last position a 4-byte match atom may START at: the atom must fit
    # inside THIS block (a non-final block's end is mid-src, so the
    # block boundary binds before the buffer end does)
    hi = end - 3
    if hi - start < 1:
        return [], src[start:end]
    b = np.frombuffer(src, dtype=np.uint8)[start : hi + 3].astype(np.uint32)
    u32 = b[:-3] | (b[1:-2] << 8) | (b[2:-1] << 16) | (b[3:] << 24)
    hashes = ((u32 * np.uint32(2654435761)) >> np.uint32(13)).tolist()
    seqs: list[tuple[int, int, int]] = []
    lit_parts: list[bytes] = []
    i = start
    anchor = start
    miss = 0
    while i < hi:
        h = hashes[i - start]
        c0, c1 = table.get(h, (-1, -1))
        table[h] = (i, c0)
        best_ml = 0
        best_cand = -1
        probe = src[i : i + 4]
        for cand in (c0, c1):
            if cand >= 0 and 0 < i - cand <= _OFF_CAP and src[cand : cand + 4] == probe:
                ml = 4 + _common_len(src, cand + 4, i + 4, end - i - 4)
                if ml > best_ml:
                    best_ml, best_cand = ml, cand
        if best_ml:
            # 1-step lazy matching: a strictly longer match starting at
            # i+1 usually nets out positive (one extra literal vs the
            # longer copy) — the standard greedy-vs-lazy tradeoff
            if i + 1 < hi:
                h2 = hashes[i + 1 - start]
                d0, d1 = table.get(h2, (-1, -1))
                probe2 = src[i + 1 : i + 5]
                lazy_ml = 0
                lazy_cand = -1
                for cand in (d0, d1):
                    if (
                        cand >= 0
                        and 0 < i + 1 - cand <= _OFF_CAP
                        and src[cand : cand + 4] == probe2
                    ):
                        ml2 = 4 + _common_len(src, cand + 4, i + 5, end - i - 5)
                        if ml2 > lazy_ml:
                            lazy_ml, lazy_cand = ml2, cand
                # advance AT MOST once, after judging both candidates (an
                # in-loop advance with two winners desynced the literals)
                if lazy_ml > best_ml + 1:
                    table[h2] = (i + 1, d0)
                    i += 1
                    best_ml, best_cand = lazy_ml, lazy_cand
            cand, ml = best_cand, best_ml
            # backward extension: the repeat usually starts before the
            # position where its 4-byte hash first matched
            back = 0
            while (
                i - back > anchor
                and cand - back > 0
                and src[i - back - 1] == src[cand - back - 1]
            ):
                back += 1
            i -= back
            cand -= back
            ml += back
            seqs.append((i - anchor, i - cand, ml))
            lit_parts.append(src[anchor:i])
            # seed the table inside the matched span so later repeats of
            # its interior are findable (every 2nd position, cost-capped)
            stop = min(i + ml, hi)
            for j in range(i + 1, stop, 2):
                hj = hashes[j - start]
                p0, _ = table.get(hj, (-1, -1))
                table[hj] = (j, p0)
            i += ml
            anchor = i
            miss = 0
        else:
            miss += 1
            i += 1 + (miss >> 6)
    lit_parts.append(src[anchor:end])
    return seqs, b"".join(lit_parts)


def encode_compressed_block(
    src: bytes, start: int, end: int, lz_table: dict[int, int], rep: list[int]
) -> tuple[bytes, list[int]]:
    """Block_Content for one Compressed block over src[start:end]
    (literals section + sequences section) plus the repeat-offset
    history at block exit.  The caller compares the result's length
    against the raw size and falls back to a Raw block when entropy
    coding doesn't pay — committing the returned history ONLY when the
    compressed block is emitted, since the decoder's history advances
    only through decoded sequences."""
    seqs, lits = _lz_parse(src, start, end, lz_table)
    seq_sec, rep_out = _encode_sequences(seqs, rep)
    return _encode_literals_section(lits) + seq_sec, rep_out


class _FwdBitWriter:
    """Forward LSB-first bit writer — the inverse of ``_FwdBits``, used
    for FSE table descriptions (§4.1.1)."""

    __slots__ = ("out", "acc", "n")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def add(self, val: int, nb: int) -> None:
        self.acc |= val << self.n
        self.n += nb
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def finish(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.n = 0
        return bytes(self.out)


def _fse_normalize(cnt: dict[int, int], al: int) -> list[int]:
    """Normalized counts summing to exactly 2^al, every present symbol
    >= 1 cell, by largest remainder.  Caller guarantees the alphabet
    fits (distinct symbols <= 2^al)."""
    size = 1 << al
    total = sum(cnt.values())
    norm = [0] * (max(cnt) + 1)
    acc = 0
    fracs: list[tuple[float, int]] = []
    for s, c in cnt.items():
        exact = c * size / total
        p = max(1, int(exact))
        norm[s] = p
        acc += p
        fracs.append((exact - int(exact), s))
    fracs.sort(reverse=True)
    i = 0
    while acc < size:
        norm[fracs[i % len(fracs)][1]] += 1
        acc += 1
        i += 1
    while acc > size:
        s = max(range(len(norm)), key=lambda k: norm[k])
        if norm[s] <= 1:
            raise ValueError("zstd: internal: cannot normalize FSE counts")
        norm[s] -= 1
        acc -= 1
    return norm


def _fse_write_description(norm: list[int], al: int) -> bytes:
    """Serialize a normalized distribution — the exact inverse of
    ``_fse_parse_description`` (and of libzstd's FSE_writeNCount
    variable-precision scheme): counts+1 shrink in width as the
    remaining mass shrinks, zero counts are followed by 2-bit repeat
    runs.  ``norm`` must end at its last nonzero count."""
    w = _FwdBitWriter()
    w.add(al - 5, 4)
    remaining = (1 << al) + 1
    threshold = 1 << al
    nb_bits = al + 1
    i = 0
    while i < len(norm) and remaining > 1:
        p = norm[i]
        i += 1
        cutoff = (2 * threshold - 1) - remaining
        raw = p + 1
        if raw < cutoff:
            w.add(raw, nb_bits - 1)
        elif raw < threshold:
            w.add(raw, nb_bits)
        else:
            w.add(raw + cutoff, nb_bits)
        remaining -= p
        while remaining > 1 and remaining < threshold:
            nb_bits -= 1
            threshold >>= 1
        if p == 0:
            run = 0
            while i < len(norm) and norm[i] == 0:
                run += 1
                i += 1
            while run >= 3:
                w.add(3, 2)
                run -= 3
            w.add(run, 2)
    if remaining != 1:
        raise ValueError("zstd: internal: FSE description counts don't sum")
    return w.finish()


_PREDEF_NORMS = {
    "ll": (_LL_DEFAULT_NORM, _LL_DEFAULT_AL),
    "of": (_OF_DEFAULT_NORM, _OF_DEFAULT_AL),
    "ml": (_ML_DEFAULT_NORM, _ML_DEFAULT_AL),
}


def _choose_stream(codes: list[int], kind: str):
    """Pick the cheapest Symbol_Compression_Mode for one code stream:
    RLE when a single code repeats (zero bits per sequence), else
    custom FSE (mode 2) vs predefined (mode 0) by estimated cost —
    description bytes plus ~(al - log2(p)) bits per occurrence.  Custom
    tables are the big win on real corpora, where e.g. the LL stream is
    almost entirely code 0 (predefined prices that at 4 bits each).
    Returns (mode, description bytes, encode view, accuracy_log)."""
    import math
    from collections import Counter

    cnt = Counter(codes)
    if len(cnt) == 1:
        sym = codes[0]
        return 1, bytes([sym]), {sym: [(0, 0, 0)]}, 0
    norm_p, al_p = _PREDEF_NORMS[kind]
    cost_p = 0.0
    for s, c in cnt.items():
        p = norm_p[s] if s < len(norm_p) else 0
        if p == 0:
            cost_p = math.inf
            break
        cost_p += c * (al_p - math.log2(max(p, 1)))
    al_c = min(_MAX_AL[kind], max(5, (len(cnt) - 1).bit_length() + 1))
    norm_c = _fse_normalize(cnt, al_c)
    desc = _fse_write_description(norm_c, al_c)
    cost_c = len(desc) * 8.0
    for s, c in cnt.items():
        cost_c += c * (al_c - math.log2(norm_c[s]))
    if cost_c < cost_p:
        return 2, desc, _fse_enc_view(norm_c, al_c), al_c
    return 0, b"", _enc_view(kind), al_p


def _huf_fse_weight_desc(listed: list[int]) -> bytes | None:
    """FSE-compressed Huffman weight description (§4.2.1.2) — the
    header form that covers alphabets past symbol 128, where the
    4-bit direct representation runs out (multilingual UTF-8 literals
    routinely use bytes >= 0x80).  ``listed`` excludes the implied last
    weight.  Two interleaved FSE states decode the weights; the stream
    must exhaust EXACTLY after the (n-1)th update read, which holds
    whenever every table state reloads >= 1 bit — true for any
    distribution with >= 2 distinct weights (a one-weight table would
    spin forever, so it returns None; direct/raw covers it).  Returns
    header byte + description + bitstream, or None when this form
    can't apply (csize must stay < 128 to not collide with the direct
    marker)."""
    from collections import Counter

    cnt = Counter(listed)
    if len(cnt) < 2:
        return None
    al = _HUF_WEIGHT_MAX_AL
    if len(cnt) > (1 << al):
        return None
    norm = _fse_normalize(dict(cnt), al)
    desc = _fse_write_description(norm, al)
    view = _fse_enc_view(norm, al)
    # the machine whose LAST emission is e_{n-2} takes the terminating
    # overrun read from its final state — that state must reload >= 1 bit
    n = len(listed)
    sA, updA = _fse_chunks(listed[0::2], view, min_last_nb=1 if n % 2 == 0 else 0)
    sB, updB = _fse_chunks(listed[1::2], view, min_last_nb=0 if n % 2 == 0 else 1)
    # decoder read order (_huf_read_weights): s1 init, s2 init, then
    # updates alternating A, B — the final emission consumes no bits
    chunks: list[tuple[int, int]] = [(sA, al), (sB, al)]
    for k in range(len(listed) - 2):
        chunks.append(updA[k >> 1] if k % 2 == 0 else updB[k >> 1])
    w = _BackBitWriter()
    for v, nb in reversed(chunks):
        w.add(v, nb)
    body = desc + w.finish()
    if len(body) >= 128:
        return None
    return bytes([len(body)]) + body
