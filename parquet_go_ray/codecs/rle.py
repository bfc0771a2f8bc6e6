"""RLE / bit-packed hybrid (Parquet spec).

The reference writes RLE runs only (reference: encoding/encodingwrite.go:149-172
— its WriteRLE never emits bit-packed groups) but decodes both run kinds
(encoding/encodingread.go:231-268).  Per SURVEY §2.2 we implement the TRUE
hybrid on the write path: long runs -> RLE run ``varint(count<<1) + value in
ceil(w/8) LE bytes``; everything else -> bit-packed groups of 8 with header
``varint(groups<<1 | 1)``.  Mid-stream bit-packed spans always hold full
8-value groups (we borrow leading values from the following long run to round
up); only the final span may carry zero padding, which the decoder drops via
the known total count.

Also exposes the u32-length-prefixed framing used for definition levels
(reference: encoding/encodingwrite.go:174-181, layout/page.go:219-232) and the
dict-index form with a leading bit-width byte (layout/dictpage.go:155-225).

As a registered chunk codec ("rle_bp") it encodes integer columns via
frame-of-reference: values - min -> unsigned, then hybrid-packed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..bits import bit_width, pack_bits, read_uvarint, unpack_bits, write_uvarint
from .base import arr_values_np, register

_MIN_RLE_RUN = 8  # shortest run worth an RLE encoding after group-borrowing


def encode_hybrid(values: np.ndarray, width: int) -> bytes:
    """values: non-negative ints fitting in `width` bits -> hybrid byte stream."""
    n = len(values)
    if n == 0:
        return b""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    vbytes = max((width + 7) // 8, 0)

    # run boundaries
    change = np.flatnonzero(v[1:] != v[:-1]) + 1
    starts = np.concatenate(([0], change))
    run_lens = np.diff(np.concatenate((starts, [n])))
    n_runs = len(starts)

    # mostly-unique fast path: single bit-packed span
    if n_runs > n - (n >> 2):
        return _bitpacked_span(v, 0, n, width, final=True)

    out = bytearray()
    i = 0  # run index
    bp_start = -1  # start position of pending bit-pack span
    bp_count = 0
    while i < n_runs:
        s, l = int(starts[i]), int(run_lens[i])
        if l >= _MIN_RLE_RUN:
            take = l
            if bp_count:
                # round pending span up to a full group by borrowing from this run
                pad = (-bp_count) % 8
                if l - pad >= _MIN_RLE_RUN:
                    bp_count += pad
                    take = l - pad
                    out += _bitpacked_span(v, bp_start, bp_count, width, final=False)
                    bp_start, bp_count = -1, 0
                    out += _rle_run(int(v[s + pad]), take, vbytes)
                    i += 1
                    continue
                else:  # run too short after borrowing: fold it into the span
                    bp_count += l
                    i += 1
                    continue
            out += _rle_run(int(v[s]), l, vbytes)
            i += 1
        else:
            if bp_count == 0:
                bp_start = s
            bp_count += l
            i += 1
    if bp_count:
        out += _bitpacked_span(v, bp_start, bp_count, width, final=True)
    return bytes(out)


def _rle_run(value: int, count: int, vbytes: int) -> bytes:
    return write_uvarint(count << 1) + int(value).to_bytes(vbytes, "little")


def _bitpacked_span(v: np.ndarray, start: int, count: int, width: int, final: bool) -> bytes:
    if count == 0:
        return b""
    groups = (count + 7) // 8
    if not final:
        assert count % 8 == 0, "mid-stream bit-packed span must be full groups"
    vals = v[start : start + count]
    if count % 8:
        vals = np.concatenate((vals, np.zeros((-count) % 8, dtype=np.uint64)))
    return write_uvarint((groups << 1) | 1) + pack_bits(vals, width)


def decode_hybrid(buf: bytes, width: int, count: int, pos: int = 0) -> tuple[np.ndarray, int]:
    """Decode `count` values; returns (values uint64, end_pos)."""
    out = np.empty(count, dtype=np.uint64)
    filled = 0
    vbytes = (width + 7) // 8
    n = len(buf)
    while filled < count and pos < n:
        header, pos = read_uvarint(buf, pos)
        if header & 1:  # bit-packed: (header>>1) groups of 8
            num = (header >> 1) * 8
            nbytes = num * width // 8
            vals = unpack_bits(buf, width, num, offset=pos)
            pos += nbytes
            take = min(num, count - filled)
            out[filled : filled + take] = vals[:take]
            filled += take
        else:  # RLE run
            run_len = header >> 1
            value = int.from_bytes(buf[pos : pos + vbytes], "little") if vbytes else 0
            pos += vbytes
            take = min(run_len, count - filled)
            out[filled : filled + take] = value
            filled += take
    if filled < count:
        raise ValueError(f"hybrid stream exhausted: {filled}/{count}")
    return out, pos


# -- framings ----------------------------------------------------------------


def encode_levels(levels: np.ndarray, max_level: int) -> bytes:
    """u32-length-prefixed hybrid (v1 data-page level stream)."""
    payload = encode_hybrid(levels, bit_width(max_level))
    return len(payload).to_bytes(4, "little") + payload


def decode_levels(buf: bytes, max_level: int, count: int, pos: int = 0) -> tuple[np.ndarray, int]:
    ln = int.from_bytes(buf[pos : pos + 4], "little")
    vals, _ = decode_hybrid(buf, bit_width(max_level), count, pos + 4)
    return vals, pos + 4 + ln


def encode_levels_bitpacked(levels: np.ndarray, max_level: int) -> bytes:
    """Deprecated BIT_PACKED level stream (parquet-format Encodings.md):
    each level as a big-endian ``bit_width(max_level)``-bit group, groups
    concatenated MSB-first into one continuous bitstream, NO length prefix
    (the byte count is implied by num_values).  Write analog of the
    reference's deprecated encoder (encoding/encodingwrite.go:420-466);
    the reference cannot READ what it encodes (layout/page.go:669-671) —
    this engine writes AND reads the encoding."""
    w = bit_width(max_level)
    n = len(levels)
    if w == 0 or n == 0:
        return b""
    v = levels.astype(np.uint64, copy=False)
    shifts = np.arange(w - 1, -1, -1, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & 1).astype(np.uint8).ravel()
    return np.packbits(bits).tobytes()  # packbits default = MSB-first


def decode_levels_bitpacked(
    buf: bytes, max_level: int, count: int, pos: int = 0
) -> tuple[np.ndarray, int]:
    """Inverse of encode_levels_bitpacked; consumes ceil(count*width/8)
    bytes at `pos` and returns (levels, new_pos)."""
    w = bit_width(max_level)
    if w == 0 or count == 0:
        return np.zeros(count, np.uint64), pos
    nbytes = (count * w + 7) // 8
    bits = np.unpackbits(np.frombuffer(buf, np.uint8, nbytes, pos))[: count * w]
    shifts = np.arange(w - 1, -1, -1, dtype=np.uint64)
    vals = (bits.reshape(count, w).astype(np.uint64) << shifts).sum(
        axis=1, dtype=np.uint64
    )
    return vals, pos + nbytes


# -- registered column codec: frame-of-reference + hybrid --------------------


def encode_rle_bp(arr: pa.Array) -> tuple[bytes, dict]:
    v = arr_values_np(arr)
    if pa.types.is_boolean(arr.type):
        v = v.astype(np.uint64)
        ref = 0
    else:
        v = v.astype(np.int64, copy=False)
        ref = int(v.min()) if len(v) else 0
        with np.errstate(over="ignore"):
            v = (v - ref).astype(np.uint64)
    w = bit_width(int(v.max())) if len(v) else 0
    return encode_hybrid(v, w), {"w": w, "ref": ref}


def decode_rle_bp(payload: bytes, meta: dict, typ: pa.DataType) -> pa.Array:
    n = meta["rows"]
    vals, _ = decode_hybrid(payload, meta["w"], n) if n else (np.empty(0, np.uint64), 0)
    if pa.types.is_boolean(typ):
        return pa.array(vals.astype(bool), type=typ)
    with np.errstate(over="ignore"):
        out = (vals.astype(np.int64) + np.int64(meta["ref"]))
    return pa.array(out.astype(typ.to_pandas_dtype()), type=typ)


register("rle_bp", encode_rle_bp, decode_rle_bp)
