"""Low-level bit/byte primitives shared by every codec.

Semantics follow the Parquet encoding spec, pinned by the reference's golden
byte vectors (reference: encoding/encodingwrite.go:132-270 for
varint / RLE / LSB-first bit-packing; encoding/encodingwrite_test.go:33-102).
All hot paths are vectorized numpy; Python loops only touch per-run /
per-block header assembly, never per-value work.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# ULEB128 varint (reference: encoding/encodingwrite.go:132-147)
# ---------------------------------------------------------------------------


def write_uvarint(x: int) -> bytes:
    """Unsigned LEB128: 7 bits per byte, high bit = continuation."""
    x = int(x)
    if x < 0:
        raise ValueError("uvarint requires non-negative input")
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_uvarint(buf, pos: int) -> tuple[int, int]:
    """Return (value, new_pos)."""
    x = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        x |= (b & 0x7F) << shift
        if not (b & 0x80):
            return x, pos
        shift += 7


def zigzag_encode(v: np.ndarray) -> np.ndarray:
    """int64 -> uint64 zigzag, wraparound-safe (matches Go's bit arithmetic)."""
    v = v.astype(np.int64, copy=False)
    with np.errstate(over="ignore"):
        return ((v.astype(np.uint64) << np.uint64(1)) ^ (v >> np.int64(63)).astype(np.uint64))


def zigzag_decode(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64, copy=False)
    return ((u >> np.uint64(1)) ^ (-(u & np.uint64(1))).astype(np.uint64)).astype(np.int64)


def zigzag_encode_scalar(v: int) -> int:
    return ((v << 1) ^ (v >> 63)) & 0xFFFFFFFFFFFFFFFF


def zigzag_decode_scalar(u: int) -> int:
    v = (u >> 1) ^ -(u & 1)
    # wrap to int64
    v &= 0xFFFFFFFFFFFFFFFF
    if v >= 1 << 63:
        v -= 1 << 64
    return v


# ---------------------------------------------------------------------------
# LSB-first bit packing (reference: encoding/encodingwrite.go:216-270,
# golden: [0..7]@3bits -> 88 C6 FA)
# ---------------------------------------------------------------------------


def bit_width(x: int) -> int:
    """Number of bits to represent x (0 -> 0), Go's bits.Len64."""
    return int(x).bit_length()


def pack_bits(vals: np.ndarray, width: int) -> bytes:
    """Pack len(vals) unsigned ints LSB-first at `width` bits each.

    len(vals)*width must be a multiple of 8 (callers pad to 8-value groups).
    """
    if width == 0 or len(vals) == 0:
        return b""
    v = np.ascontiguousarray(vals, dtype=np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.reshape(-1), bitorder="little").tobytes()


def unpack_bits(buf, width: int, count: int, offset: int = 0) -> np.ndarray:
    """Inverse of pack_bits: read `count` values of `width` bits from buf[offset:]."""
    if width == 0:
        return np.zeros(count, dtype=np.uint64)
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    nbytes = (count * width + 7) // 8
    raw = np.frombuffer(buf, dtype=np.uint8, count=nbytes, offset=offset)
    bits = np.unpackbits(raw, bitorder="little")[: count * width]
    shifts = np.arange(width, dtype=np.uint64)
    return ((bits.reshape(count, width).astype(np.uint64)) << shifts).sum(
        axis=1, dtype=np.uint64
    )


def write_uvarints(vals: np.ndarray) -> bytes:
    """Vectorized-ish multi-varint writer for header streams (small arrays)."""
    return b"".join(write_uvarint(int(v)) for v in vals)
