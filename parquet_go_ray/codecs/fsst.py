"""FSST — Fast Static Symbol Table string compression.

Not in the reference (SURVEY §2.3 flags it as the new stateful stage); built
from the published algorithm (PAPERS.md: "FSST: Fast Random Access String
Compression", VLDB 2020): a table of <=255 symbols of 1..8 bytes, code 255 =
escape + literal byte; greedy longest-match encoding; training by iterative
re-encoding of a sample and promoting high-gain symbol concatenations.

Implementation notes (everything hot is numpy; no per-byte Python loops):
  * match detection: one uint64 rolling key per position (low L bytes = the
    next L bytes), membership via sorted-array searchsorted per symbol length;
  * the greedy parse "take longest match, jump its length" is resolved with
    pointer doubling: next[i] = i + len(longest match at i); the set of token
    start positions = positions reachable from 0, computed in O(log n)
    vectorized rounds instead of a sequential walk;
  * data is processed in segments cut at value boundaries to bound peak memory
    (~20 bytes of scratch per input byte);
  * matches are clipped at value boundaries, preserving FSST's per-value
    random-access property;
  * decode expands codes via one gather from a (256, 8) symbol matrix; escape
    parsing exploits that every maximal run of 0xFF bytes starts at a code
    position (a non-escape byte always ends at a code boundary), so escapes
    fall at even offsets within such runs — no sequential scan.

Payload: varint(n_syms) + sym_lens + sym_bytes + delta_bp(orig value lengths)
+ varint(stream_len) + stream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..bits import read_uvarint, write_uvarint
from .base import binary_parts, build_binary, register
from .delta import delta_bp_decode_np, delta_bp_encode_np

ESCAPE = 255
MAX_SYMS = 255
MAX_LEN = 8
SAMPLE_BYTES = 1 << 16
TRAIN_GENERATIONS = 5
SEGMENT_BYTES = 16 << 20


class SymbolTable:
    __slots__ = (
        "symbols",
        "keys_by_len",
        "codes_by_len",
        "sym1_code",
        "sym_matrix",
        "sym_len",
        "pmax2",
        "code2",
        "lens_mask2",
    )

    def __init__(self, symbols: list[bytes]):
        self.symbols = symbols[:MAX_SYMS]
        # per-length sorted key arrays for the encoder
        self.keys_by_len: dict[int, np.ndarray] = {}
        self.codes_by_len: dict[int, np.ndarray] = {}
        by_len: dict[int, list[tuple[int, int]]] = {}
        self.sym1_code = np.full(256, -1, dtype=np.int32)
        # 2-byte-prefix prefilter tables: pmax2[p] = longest symbol (>=3) with
        # that prefix; code2[p] = code of the exact 2-byte symbol, else -1;
        # lens_mask2[p] = bit (len-3) set iff a symbol of EXACTLY that length
        # starts with prefix p (skips whole per-length search rounds for
        # candidates whose prefix admits no symbol of that length — measured
        # ~40% of the searched volume on the documents corpus).
        self.pmax2 = np.zeros(65536, dtype=np.uint8)
        self.code2 = np.full(65536, -1, dtype=np.int32)
        self.lens_mask2 = np.zeros(65536, dtype=np.uint8)
        for code, s in enumerate(self.symbols):
            key = int.from_bytes(s.ljust(8, b"\x00"), "little") & ((1 << (8 * len(s))) - 1)
            by_len.setdefault(len(s), []).append((key, code))
            if len(s) == 1:
                self.sym1_code[s[0]] = code
            elif len(s) == 2:
                self.code2[s[0] | (s[1] << 8)] = code
            else:
                p = s[0] | (s[1] << 8)
                self.pmax2[p] = max(self.pmax2[p], len(s))
                self.lens_mask2[p] |= 1 << (len(s) - 3)
        for ln, pairs in by_len.items():
            pairs.sort()
            self.keys_by_len[ln] = np.array([k for k, _ in pairs], dtype=np.uint64)
            self.codes_by_len[ln] = np.array([c for _, c in pairs], dtype=np.int32)
        # decoder tables
        self.sym_matrix = np.zeros((256, MAX_LEN), dtype=np.uint8)
        self.sym_len = np.ones(256, dtype=np.int64)  # escapes/unused expand 1 byte
        for code, s in enumerate(self.symbols):
            self.sym_matrix[code, : len(s)] = np.frombuffer(s, dtype=np.uint8)
            self.sym_len[code] = len(s)

    def serialize(self) -> bytes:
        out = bytearray(write_uvarint(len(self.symbols)))
        out += bytes(len(s) for s in self.symbols)
        for s in self.symbols:
            out += s
        return bytes(out)

    @classmethod
    def deserialize(cls, buf: bytes, pos: int) -> tuple["SymbolTable", int]:
        n, pos = read_uvarint(buf, pos)
        lens = list(buf[pos : pos + n])
        pos += n
        syms = []
        for ln in lens:
            syms.append(bytes(buf[pos : pos + ln]))
            pos += ln
        return cls(syms), pos


# ---------------------------------------------------------------------------
# encoding core
# ---------------------------------------------------------------------------


def _greedy_parse(
    buf: np.ndarray, value_lens: np.ndarray, table: SymbolTable
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Return (token_starts, token_lens, token_codes) for one segment.

    value_lens: lengths of the values whose concatenation is `buf`
    (sum == len(buf)); matches are clipped at value boundaries.
    """
    n = len(buf)
    value_ends = np.cumsum(value_lens)
    value_starts = (value_ends - value_lens).astype(np.int64)
    # sparse boundary clip: allowed match length per position is MAX_LEN
    # except the <=7 bytes before each value end — far cheaper than a full
    # dist-to-end array (1 byte/position vs 16)
    maxlen = np.full(n, MAX_LEN, dtype=np.uint8)
    if len(value_ends):
        # each position belongs to exactly one value, so per-distance fancy
        # assignment is duplicate-free (ufunc.at is a slow scalar fallback)
        for d in range(1, MAX_LEN):
            pos_d = value_ends - d
            ok = (pos_d >= value_starts) & (pos_d >= 0) & (pos_d < n)
            pd_ = pos_d[ok]
            maxlen[pd_] = np.minimum(maxlen[pd_], np.uint8(d))

    padded = np.zeros((n + MAX_LEN + 8) & ~7, dtype=np.uint8)
    padded[:n] = buf
    # overlapping u16 view at byte stride: k2[i] = buf[i] | buf[i+1]<<8
    k2 = np.lib.stride_tricks.as_strided(
        padded.view(np.uint16), shape=(n,), strides=(1,)
    )
    best_len = np.ones(n, dtype=np.int32)
    best_code = table.sym1_code[buf]  # -1 => escape

    # lengths >=3 only at positions whose 2-byte prefix admits a long symbol
    pmax = table.pmax2[k2]
    cand = np.flatnonzero((np.minimum(pmax, maxlen)) >= 3)
    if len(cand):
        # one unaligned-u64 gather instead of 8 byte gathers (measured 7.5x)
        u64 = np.lib.stride_tricks.as_strided(
            padded.view(np.uint64), shape=(len(padded) - 7,), strides=(1,)
        )
        keyc = u64[cand]
        lim_c = np.minimum(pmax[cand], maxlen[cand])
        lm_c = table.lens_mask2[(keyc & np.uint64(0xFFFF)).astype(np.uint32)]
        unmatched = np.ones(len(cand), dtype=bool)
        for ln in sorted((l for l in table.keys_by_len if l >= 3), reverse=True):
            keys = table.keys_by_len[ln]
            idx = np.flatnonzero(
                unmatched
                & (lim_c >= ln)
                & ((lm_c & np.uint8(1 << (ln - 3))) > 0)
            )
            if not len(idx):
                continue
            mask = np.uint64((1 << (8 * ln)) - 1)
            sub = keyc[idx] & mask
            pos_in = np.searchsorted(keys, sub)
            pos_in[pos_in == len(keys)] = 0
            hit = keys[pos_in] == sub
            hi = idx[hit]
            best_len[cand[hi]] = ln
            best_code[cand[hi]] = table.codes_by_len[ln][pos_in[hit]]
            unmatched[hi] = False

    # length 2: direct 65536-entry table lookup, no search
    c2 = table.code2[k2]
    hit2 = (best_len == 1) & (c2 >= 0) & (maxlen >= 2)
    best_len[hit2] = 2
    best_code[hit2] = c2[hit2]

    # Resolve the greedy parse "take match, jump its length".  Matches are
    # clipped at value boundaries, so each value's token chain is independent.
    max_vlen = int(value_lens.max()) if len(value_lens) else 0
    if max_vlen <= 1 << 16 and len(value_lens) > 1:
        # frontier walk: advance one token per value per round, all values in
        # lockstep; rounds = max tokens in any single value.
        ends_i64 = value_ends.astype(np.int64)
        frontier = value_starts.copy()
        limit = ends_i64
        token_chunks = []
        alive = frontier < limit
        frontier, limit = frontier[alive], limit[alive]
        while len(frontier):
            token_chunks.append(frontier.copy())
            frontier = frontier + best_len[frontier]
            alive = frontier < limit
            if not alive.all():
                frontier, limit = frontier[alive], limit[alive]
        if token_chunks:
            starts = np.concatenate(token_chunks)
            starts.sort()
        else:
            starts = np.empty(0, dtype=np.int64)
    else:
        # pointer doubling: O(log max_value_len) vectorized rounds
        jk = np.empty(n + 1, dtype=np.int64)
        jk[:n] = np.minimum(np.arange(n, dtype=np.int64) + best_len, n)
        jk[n] = n  # sink
        visited = np.zeros(n + 1, dtype=bool)
        visited[value_starts] = True
        visited[0] = True
        steps = max(int(np.ceil(np.log2(max(max_vlen, 2)))) + 1, 1)
        prev_count = 0
        for _ in range(steps):
            visited[jk[visited[:-1].nonzero()[0]]] = True
            count = int(visited.sum())
            if count == prev_count:
                break
            prev_count = count
            jk = jk[jk]
        starts = np.flatnonzero(visited[:n])
    return starts, best_len[starts], best_code[starts]


def _emit(buf: np.ndarray, starts, lens, codes) -> np.ndarray:
    """Token stream -> output bytes (escape = 0xFF + literal)."""
    esc = codes < 0
    out_sizes = np.where(esc, 2, 1).astype(np.int64)
    offs = np.zeros(len(starts) + 1, dtype=np.int64)
    np.cumsum(out_sizes, out=offs[1:])
    out = np.empty(offs[-1], dtype=np.uint8)
    out[offs[:-1]] = np.where(esc, ESCAPE, codes).astype(np.uint8)
    if esc.any():
        e = np.flatnonzero(esc)
        out[offs[e] + 1] = buf[starts[e]]
    return out


def fsst_encode_buffer(
    buf: np.ndarray, value_lens: np.ndarray, table: SymbolTable
) -> bytes:
    """Encode a concatenated byte buffer of values with the given lengths."""
    n = len(buf)
    if n == 0:
        return b""
    ends = np.cumsum(value_lens)
    chunks = []
    seg_start = 0
    vi = 0  # first value index of this segment
    nv = len(value_lens)
    while seg_start < n:
        # cut segment at a value boundary >= SEGMENT_BYTES past seg_start
        target = seg_start + SEGMENT_BYTES
        if target >= n:
            seg_end, vj = n, nv
        else:
            j = int(np.searchsorted(ends, target))
            vj = min(j + 1, nv)
            seg_end = int(ends[vj - 1])
            # a giant value would otherwise become one unbounded segment
            # (searchsorted guarantees seg_end >= target, so the old
            # `seg_end <= seg_start` guard could never fire): cap the
            # segment at 2x the target and split MID-VALUE, which bounds
            # the parse scratch at ~2*SEGMENT_BYTES as documented
            if seg_end - seg_start > 2 * SEGMENT_BYTES:
                if j > vi and int(ends[j - 1]) > seg_start:
                    # smaller values precede the giant inside this window:
                    # cut at the last whole-value boundary before the giant
                    # so seg_lens covers exactly the bytes in seg (the
                    # mid-value split below is only valid when the segment
                    # starts at/inside the giant value itself)
                    vj, seg_end = j, int(ends[j - 1])
                else:
                    # segment starts at/inside the giant (possibly after
                    # zero-length values whose boundaries equal seg_start):
                    # split mid-value; vj = j + 1 so seg_lens spans every
                    # value intersecting [seg_start, seg_end) and the
                    # min() clamp below truncates the giant's length
                    seg_end, vj = min(target, n), j + 1
        seg = buf[seg_start:seg_end]
        # per-value lengths inside the segment; a mid-split giant value is
        # treated as two values (slight ratio loss, no correctness impact)
        seg_ends_local = np.minimum(ends[vi:vj], seg_end) - seg_start
        seg_lens = np.diff(seg_ends_local, prepend=0)
        starts, lens, codes = _greedy_parse(seg, seg_lens, table)
        chunks.append(_emit(seg, starts, lens, codes))
        seg_start = seg_end
        vi = vj if int(ends[vj - 1]) <= seg_end else vj - 1
    return b"".join(c.tobytes() for c in chunks)


# ---------------------------------------------------------------------------
# decoding
# ---------------------------------------------------------------------------


def fsst_decode_buffer(stream: np.ndarray, table: SymbolTable) -> np.ndarray:
    n = len(stream)
    if n == 0:
        return np.empty(0, dtype=np.uint8)
    is_esc = np.zeros(n, dtype=bool)
    ff = stream == ESCAPE
    if ff.any():
        # maximal runs of 0xFF always start at a code position; escapes sit at
        # even offsets within each run, and an odd-length run also consumes the
        # byte right after it as a literal.
        d = np.diff(ff.astype(np.int8))
        run_starts = np.flatnonzero(d == 1) + 1
        if ff[0]:
            run_starts = np.concatenate(([0], run_starts))
        run_ends = np.flatnonzero(d == -1) + 1
        if ff[-1]:
            run_ends = np.concatenate((run_ends, [n]))
        run_lens = run_ends - run_starts
        n_esc = (run_lens + 1) // 2
        tot = int(n_esc.sum())
        base = np.repeat(run_starts, n_esc)
        within = np.arange(tot, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(n_esc[:-1]))), n_esc
        )
        is_esc[base + 2 * within] = True
    is_literal = np.zeros(n + 1, dtype=bool)
    is_literal[np.flatnonzero(is_esc) + 1] = True
    is_literal = is_literal[:n]
    is_code = ~is_esc & ~is_literal

    code_pos = np.flatnonzero(is_code)
    lit_pos = np.flatnonzero(is_esc)  # literal value = stream[esc+1]
    # interleave codes and literals in stream order
    kind = np.empty(n, dtype=np.int8)  # 1=code, 2=escape-literal, 0=skip
    kind[:] = 0
    kind[code_pos] = 1
    kind[lit_pos] = 2
    tok_pos = np.flatnonzero(kind > 0)
    tok_kind = kind[tok_pos]
    out_lens = np.where(tok_kind == 1, table.sym_len[stream[tok_pos]], 1)
    offs = np.zeros(len(tok_pos) + 1, dtype=np.int64)
    np.cumsum(out_lens, out=offs[1:])
    out = np.empty(offs[-1], dtype=np.uint8)
    # codes: gather symbol bytes
    cp = tok_kind == 1
    if cp.any():
        ci = tok_pos[cp]
        clen = table.sym_len[stream[ci]]
        total = int(clen.sum())
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(clen[:-1]))), clen
        )
        dest = np.repeat(offs[:-1][cp], clen) + within
        out[dest] = table.sym_matrix[np.repeat(stream[ci], clen), within]
    lp = tok_kind == 2
    if lp.any():
        out[offs[:-1][lp]] = stream[tok_pos[lp] + 1]
    return out


# ---------------------------------------------------------------------------
# training (runs on a small sample; Python-level counting is fine there)
# ---------------------------------------------------------------------------


def train(buf: np.ndarray, value_lens: np.ndarray, seed: int = 0) -> SymbolTable:
    n = len(buf)
    if n == 0:
        return SymbolTable([])
    if n > SAMPLE_BYTES:
        # evenly spaced slices preserve local structure better than random bytes
        n_slices = 64
        sl = SAMPLE_BYTES // n_slices
        starts = np.linspace(0, n - sl, n_slices).astype(np.int64)
        sample = np.concatenate([buf[s : s + sl] for s in starts])
        s_lens = np.full(n_slices, sl, dtype=np.int64)
    else:
        sample = buf
        s_lens = value_lens
    counts = np.bincount(sample, minlength=256)
    order = np.argsort(counts)[::-1]
    symbols = [bytes([b]) for b in order if counts[b] > 0][:MAX_SYMS]
    table = SymbolTable(symbols)
    for _ in range(TRAIN_GENERATIONS):
        starts, lens, codes = _greedy_parse(sample, s_lens, table)
        # token ids: 0..254 = current symbols, 256+b = escaped literal byte;
        # gain counting is pure bincount/unique — no per-token Python work
        ids = np.where(codes >= 0, codes, 256 + sample[starts].astype(np.int64))

        def id_bytes(i: int) -> bytes:
            return table.symbols[i] if i < 256 else bytes([i - 256])

        gains: dict[bytes, int] = {}
        cnt = np.bincount(ids, minlength=512)
        for i in np.flatnonzero(cnt):
            b = id_bytes(int(i))
            gains[b] = gains.get(b, 0) + int(cnt[i]) * ((len(b) - 1) * 8 + 7)
        if len(ids) > 1:
            # count ONLY pairs inside one value: the encoder clips matches
            # at value boundaries, so a cross-boundary concatenation symbol
            # can never match — promoting one wastes a slot of the 255
            ends_v = np.cumsum(s_lens)
            vid = np.searchsorted(ends_v, starts, side="right")
            same_val = vid[:-1] == vid[1:]
            pid = ids[:-1][same_val] * 512 + ids[1:][same_val]
            upair, pcnt = np.unique(pid, return_counts=True)
            id_len = np.array(
                [len(s) for s in table.symbols]
                + [0] * (256 - len(table.symbols))
                + [1] * 256,
                dtype=np.int64,
            )
            la, lb = id_len[upair // 512], id_len[upair % 512]
            ok = (la + lb) <= MAX_LEN
            upair, pcnt, plen = upair[ok], pcnt[ok], (la + lb)[ok]
            top = np.argsort(pcnt * plen)[::-1][: 4 * MAX_SYMS]
            for j in top:
                u = int(upair[j])
                cat = id_bytes(u // 512) + id_bytes(u % 512)
                gains[cat] = gains.get(cat, 0) + int(pcnt[j]) * len(cat) * 8
        best = sorted(gains.items(), key=lambda kv: (-kv[1], kv[0]))[:MAX_SYMS]
        table = SymbolTable([s for s, _ in best])
    return table


# ---------------------------------------------------------------------------
# registered codec
# ---------------------------------------------------------------------------


def encode_fsst(arr: pa.Array) -> tuple[bytes, dict]:
    lengths, data = binary_parts(arr)
    table = train(data, lengths)
    stream = fsst_encode_buffer(data, lengths, table)
    payload = (
        table.serialize()
        + delta_bp_encode_np(lengths)
        + write_uvarint(len(stream))
        + stream
    )
    return payload, {}


def decode_fsst(payload: bytes, meta: dict, typ: pa.DataType) -> pa.Array:
    table, pos = SymbolTable.deserialize(payload, 0)
    lengths, pos = delta_bp_decode_np(payload, pos)
    stream_len, pos = read_uvarint(payload, pos)
    stream = np.frombuffer(payload, dtype=np.uint8, count=stream_len, offset=pos)
    data = fsst_decode_buffer(stream, table)
    return build_binary(lengths, data, typ)


register("fsst", encode_fsst, decode_fsst)
