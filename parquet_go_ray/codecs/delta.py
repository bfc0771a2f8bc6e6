"""DELTA_BINARY_PACKED / DELTA_LENGTH_BYTE_ARRAY / DELTA_BYTE_ARRAY.

Byte format matches the Parquet spec and the reference's golden vectors
(reference: encoding/encodingwrite.go:287-502; golden bytes in
encoding/encodingwrite_test.go:216-286 — e.g. int32 {1..5} ->
[128,1,4,5,2,2,0,0,0,0]).  Block geometry: blocks of 128 deltas = 4
miniblocks x 32; per-block min-delta (frame of reference) zigzag-varint; 4
per-miniblock bit-width bytes; LSB-first bit-packed normalized deltas; short
final block padded with min-delta (so pad packs as 0); empty trailing
miniblocks get width 0 and no payload.

Vectorization: np.diff for deltas (wraparound int64 semantics, same as Go),
per-block/per-miniblock reductions via reshape, packing grouped BY WIDTH so
each distinct width costs one vectorized packbits call instead of a Python
loop per miniblock.

DELTA_BYTE_ARRAY prefix lengths are computed vectorized on a byte matrix of
the first `PREFIX_CAP` bytes of each value (any prefix <= the true common
prefix is format-valid, so capping trades ratio, never correctness — the
sequential per-pair scan in the reference, encoding/encodingwrite.go:479-493,
is the shape we deliberately avoid).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..bits import (
    pack_bits,
    read_uvarint,
    unpack_bits,
    write_uvarint,
    zigzag_decode_scalar,
    zigzag_encode_scalar,
)
from .base import arr_values_np, binary_parts, build_binary, register

BLOCK = 128
MINIBLOCKS = 4
MB_VALUES = BLOCK // MINIBLOCKS  # 32
PREFIX_CAP = 256


# ---------------------------------------------------------------------------
# DELTA_BINARY_PACKED core: int64 ndarray -> bytes
# ---------------------------------------------------------------------------


def delta_bp_encode_np(v: np.ndarray) -> bytes:
    v = v.astype(np.int64, copy=False)
    n = len(v)
    out = bytearray()
    out += write_uvarint(BLOCK)
    out += write_uvarint(MINIBLOCKS)
    out += write_uvarint(n)
    if n == 0:
        return bytes(out)
    out += write_uvarint(zigzag_encode_scalar(int(v[0])))
    if n == 1:
        return bytes(out)

    with np.errstate(over="ignore"):
        deltas = np.subtract(v[1:], v[:-1])  # wraparound int64, like Go
    nd = len(deltas)
    nblocks = (nd + BLOCK - 1) // BLOCK

    # pad deltas to whole blocks; pad value = that block's min so it packs as 0
    padded = np.empty(nblocks * BLOCK, dtype=np.int64)
    padded[:nd] = deltas
    blocks = padded.reshape(nblocks, BLOCK)
    # per-block min over REAL values only
    last_real = nd - (nblocks - 1) * BLOCK  # valid count in final block
    mins = blocks.min(axis=1)
    if last_real < BLOCK:
        mins[-1] = blocks[-1, :last_real].min()
        blocks[-1, last_real:] = mins[-1]
    with np.errstate(over="ignore"):
        norm = (blocks - mins[:, None]).view(np.uint64)

    # per-miniblock widths: bits.Len64(max)
    mb = norm.reshape(nblocks, MINIBLOCKS, MB_VALUES)
    mb_max = mb.max(axis=2)
    widths = np.zeros((nblocks, MINIBLOCKS), dtype=np.int64)
    nz = mb_max > 0
    widths[nz] = np.floor(np.log2(mb_max[nz].astype(np.float64))).astype(np.int64) + 1
    # float path is wrong above 2^53 — fix up exactly with a bit-length check
    big = mb_max >= (1 << 52)
    if big.any():
        widths[big] = [int(x).bit_length() for x in mb_max[big]]
    else:
        # cheap exactness guard: recompute where 1<<width <= max
        bad = (widths > 0) & (widths < 64) & ((np.uint64(1) << widths.astype(np.uint64)) <= mb_max)
        widths[bad] += 1

    # number of miniblocks that actually carry values, per block
    mb_counts = np.full(nblocks, MINIBLOCKS, dtype=np.int64)
    last_mb = (last_real + MB_VALUES - 1) // MB_VALUES
    mb_counts[-1] = last_mb
    widths[-1, last_mb:] = 0

    # pack all miniblocks grouped by width
    flat_mb = mb.reshape(-1, MB_VALUES)
    flat_w = widths.reshape(-1)
    active = np.zeros(nblocks * MINIBLOCKS, dtype=bool)
    for b in range(nblocks):
        active[b * MINIBLOCKS : b * MINIBLOCKS + mb_counts[b]] = True
    payload_of: dict[int, bytes] = {}
    sizes = np.where(active, flat_w * MB_VALUES // 8, 0)
    for w in np.unique(flat_w[active]):
        w = int(w)
        if w == 0:
            continue
        sel = np.flatnonzero(active & (flat_w == w))
        packed = pack_bits(flat_mb[sel].reshape(-1), w)
        step = w * MB_VALUES // 8
        for j, m in enumerate(sel):
            payload_of[int(m)] = packed[j * step : (j + 1) * step]

    for b in range(nblocks):
        out += write_uvarint(zigzag_encode_scalar(int(mins[b])))
        out += bytes(int(x) for x in widths[b])
        for m in range(b * MINIBLOCKS, b * MINIBLOCKS + int(mb_counts[b])):
            if sizes[m]:
                out += payload_of[m]
    return bytes(out)


def delta_bp_decode_np(buf: bytes, pos: int = 0) -> tuple[np.ndarray, int]:
    block, pos = read_uvarint(buf, pos)
    mbs, pos = read_uvarint(buf, pos)
    n, pos = read_uvarint(buf, pos)
    if n == 0:
        return np.empty(0, dtype=np.int64), pos
    zz, pos = read_uvarint(buf, pos)
    first = zigzag_decode_scalar(zz)
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    nd = n - 1
    mb_vals = block // mbs
    deltas = np.empty(((nd + block - 1) // block) * block, dtype=np.int64)
    got = 0
    while got < nd:
        zz, pos = read_uvarint(buf, pos)
        min_delta = zigzag_decode_scalar(zz)
        widths = list(buf[pos : pos + mbs])
        pos += mbs
        remaining = nd - got
        mb_used = min(mbs, (remaining + mb_vals - 1) // mb_vals)
        for m in range(mb_used):
            w = widths[m]
            vals = unpack_bits(buf, w, mb_vals, offset=pos)
            pos += w * mb_vals // 8
            with np.errstate(over="ignore"):
                deltas[got : got + mb_vals] = vals.view(np.int64) + np.int64(min_delta)
            got += mb_vals
    with np.errstate(over="ignore"):
        np.cumsum(deltas[:nd].view(np.uint64), out=out[1:].view(np.uint64))
        np.add(
            out[1:].view(np.uint64),
            np.uint64(first & 0xFFFFFFFFFFFFFFFF),  # negative first: mask before uint64 cast
            out=out[1:].view(np.uint64),
        )
    return out, pos


# ---------------------------------------------------------------------------
# registered codecs
# ---------------------------------------------------------------------------


def encode_delta_bp(arr: pa.Array) -> tuple[bytes, dict]:
    v = arr_values_np(arr).astype(np.int64, copy=False)
    return delta_bp_encode_np(v), {}


def decode_delta_bp(payload: bytes, meta: dict, typ: pa.DataType) -> pa.Array:
    v, _ = delta_bp_decode_np(payload)
    return pa.array(v.astype(typ.to_pandas_dtype(), copy=False), type=typ)


def encode_delta_length_ba(arr: pa.Array) -> tuple[bytes, dict]:
    lengths, data = binary_parts(arr)
    return delta_bp_encode_np(lengths) + data.tobytes(), {}


def decode_delta_length_ba(payload: bytes, meta: dict, typ: pa.DataType) -> pa.Array:
    lengths, pos = delta_bp_decode_np(payload)
    data = np.frombuffer(payload, dtype=np.uint8, offset=pos)
    return build_binary(lengths, data, typ)


def _common_prefix_lens(lengths: np.ndarray, data: np.ndarray) -> np.ndarray:
    """prefix_len[i] = shared prefix of value i with value i-1, capped at PREFIX_CAP."""
    n = len(lengths)
    pref = np.zeros(n, dtype=np.int64)
    if n <= 1:
        return pref
    cap = min(PREFIX_CAP, int(lengths.max()) if n else 0)
    if cap == 0:
        return pref
    # (n, cap) byte matrix of each value's first `cap` bytes, zero-padded
    mat = np.zeros((n, cap), dtype=np.uint8)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    take = np.minimum(lengths, cap)
    total = int(take.sum())
    if total:
        row = np.repeat(np.arange(n, dtype=np.int64), take)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(take[:-1]))), take
        )
        src = np.repeat(starts, take) + within
        mat[row, within] = data[src]
    eq = mat[1:] == mat[:-1]
    # prefix length = position of first mismatch
    mismatch = ~eq
    any_mm = mismatch.any(axis=1)
    first_mm = np.where(any_mm, mismatch.argmax(axis=1), cap)
    bound = np.minimum(np.minimum(lengths[1:], lengths[:-1]), cap)
    pref[1:] = np.minimum(first_mm, bound)
    return pref


def encode_delta_ba(arr: pa.Array) -> tuple[bytes, dict]:
    lengths, data = binary_parts(arr)
    n = len(lengths)
    pref = _common_prefix_lens(lengths, data)
    suf_lens = lengths - pref
    # gather suffix bytes
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    total = int(suf_lens.sum())
    if total:
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(suf_lens[:-1]))), suf_lens
        )
        src = np.repeat(starts + pref, suf_lens) + within
        suffix_data = data[src]
    else:
        suffix_data = np.empty(0, dtype=np.uint8)
    payload = delta_bp_encode_np(pref) + delta_bp_encode_np(suf_lens) + suffix_data.tobytes()
    return payload, {}


def decode_delta_ba(payload: bytes, meta: dict, typ: pa.DataType) -> pa.Array:
    pref, pos = delta_bp_decode_np(payload)
    suf_lens, pos = delta_bp_decode_np(payload, pos)
    suffixes = np.frombuffer(payload, dtype=np.uint8, offset=pos)
    n = len(pref)
    lengths = pref + suf_lens
    out = np.empty(int(lengths.sum()), dtype=np.uint8)
    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    suf_starts = np.zeros(n, dtype=np.int64)
    np.cumsum(suf_lens[:-1], out=suf_starts[1:])
    # suffix scatter is vectorizable; prefix copy references the PREVIOUS
    # reconstructed value -> inherently sequential, but only across values with
    # pref>0 and only for `pref` bytes (cheap: path-like columns).
    total_suf = int(suf_lens.sum())
    if total_suf:
        within = np.arange(total_suf, dtype=np.int64) - np.repeat(suf_starts, suf_lens)
        dest = np.repeat(starts + pref, suf_lens) + within
        out[dest] = suffixes
    for i in range(n):
        p = pref[i]
        if p:
            out[starts[i] : starts[i] + p] = out[starts[i - 1] : starts[i - 1] + p]
    return build_binary(lengths, out, typ)


register("delta_bp", encode_delta_bp, decode_delta_bp)
register("delta_length_ba", encode_delta_length_ba, decode_delta_length_ba)
register("delta_ba", encode_delta_ba, decode_delta_ba)
