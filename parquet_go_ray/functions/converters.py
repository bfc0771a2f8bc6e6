"""Type converters — the reference's types/converter.go surface.

INT96 is parquet's legacy timestamp: 12 bytes = 8-byte little-endian
nanoseconds-of-day + 4-byte little-endian Julian day number
(types/converter.go:94-112).  Vectorized both directions; round-trips
through the chunk container's fixed_size_binary(12) physical path."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

JULIAN_UNIX_EPOCH = 2440588  # Julian day number of 1970-01-01
NS_PER_DAY = 86_400_000_000_000


def _fsb_bytes(arr: pa.Array, width: int) -> np.ndarray:
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return np.frombuffer(
        arr.buffers()[1], dtype=np.uint8, count=len(arr) * width, offset=arr.offset * width
    ).reshape(len(arr), width)


def int96_to_timestamp(arr: pa.Array, unit: str = "us") -> pa.Array:
    """fixed_size_binary(12) INT96 -> timestamp[unit] (null-preserving)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    assert arr.type == pa.binary(12), arr.type
    raw = _fsb_bytes(arr, 12)
    nanos = raw[:, :8].copy().view("<u8").reshape(-1).astype(np.int64)
    jd = raw[:, 8:12].copy().view("<u4").reshape(-1).astype(np.int64)
    total_ns = (jd - JULIAN_UNIX_EPOCH) * NS_PER_DAY + nanos
    div = {"ns": 1, "us": 1_000, "ms": 1_000_000, "s": 1_000_000_000}[unit]
    vals = total_ns // div
    if arr.null_count:
        mask = ~np.asarray(arr.is_valid())
        return pa.array(vals, type=pa.timestamp(unit), mask=mask)
    return pa.array(vals, type=pa.timestamp(unit))


def timestamp_to_int96(arr: pa.Array) -> pa.Array:
    """timestamp[any unit] -> fixed_size_binary(12) INT96 (null-preserving)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    assert pa.types.is_timestamp(t), t
    mul = {"s": 1_000_000_000, "ms": 1_000_000, "us": 1_000, "ns": 1}[t.unit]
    ticks = np.asarray(arr.cast(pa.int64()).fill_null(0))
    total_ns = ticks * mul
    # floor-divide handles pre-epoch timestamps correctly (negative days)
    days = np.floor_divide(total_ns, NS_PER_DAY)
    nanos = total_ns - days * NS_PER_DAY
    raw = np.empty((len(arr), 12), dtype=np.uint8)
    raw[:, :8] = nanos.astype("<u8").view(np.uint8).reshape(-1, 8)
    raw[:, 8:12] = (days + JULIAN_UNIX_EPOCH).astype("<u4").view(np.uint8).reshape(-1, 4)
    flat = raw.reshape(-1)
    out = pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(12), len(arr), [None, pa.py_buffer(flat.tobytes())]
    )
    if arr.null_count:
        mask = ~np.asarray(arr.is_valid())
        idx = pa.array(np.arange(len(arr)), mask=mask, type=pa.int64())
        out = out.take(idx)
    return out


# --- UUID <-> fixed_size_binary(16) -----------------------------------------
# The reference annotates FIXED_LEN_BYTE_ARRAY(16) with the UUID logical type
# (common/common.go:418-419) and round-trips the value as raw bytes; users
# hold canonical 8-4-4-4-12 hex strings.  Both directions vectorized (hex
# codec over the whole buffer, no per-row parsing).

_HEX = np.frombuffer(b"0123456789abcdef", dtype=np.uint8)


def uuid_to_fixed16(arr: pa.Array) -> pa.Array:
    """utf8 canonical UUID strings -> fixed_size_binary(16) (null-preserving).
    Fully vectorized: dash removal is an Arrow kernel, hex decode is a numpy
    nibble lookup over the contiguous value buffer."""
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    filled = arr.fill_null("00000000-0000-0000-0000-000000000000")
    hexs = pc.replace_substring(filled, "-", "")
    if isinstance(hexs, pa.ChunkedArray):
        hexs = hexs.combine_chunks()
    n = len(arr)
    buf = np.frombuffer(hexs.buffers()[2], dtype=np.uint8)
    off = np.frombuffer(hexs.buffers()[1], dtype=np.int32, count=n + 1)
    assert off[-1] - off[0] == 32 * n, "malformed UUID string (need 32 hex chars)"
    chars = buf[off[0] : off[-1]].reshape(n, 32)
    nib = (chars % 32 + 9 * (chars >> 6)) & 0x0F  # '0'-'9','a'-'f','A'-'F' -> 0-15
    raw = ((nib[:, 0::2] << 4) | nib[:, 1::2]).astype(np.uint8)
    out = pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(16), n, [None, pa.py_buffer(raw.reshape(-1).tobytes())]
    )
    if arr.null_count:
        mask = ~np.asarray(arr.is_valid())
        idx = pa.array(np.arange(len(arr)), mask=mask, type=pa.int64())
        out = out.take(idx)
    return out


def fixed16_to_uuid(arr: pa.Array) -> pa.Array:
    """fixed_size_binary(16) -> canonical UUID strings (null-preserving)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    assert arr.type == pa.binary(16), arr.type
    raw = _fsb_bytes(arr, 16)
    hi, lo = raw >> 4, raw & 0x0F
    hexes = np.empty((len(arr), 32), dtype=np.uint8)
    hexes[:, 0::2] = _HEX[hi]
    hexes[:, 1::2] = _HEX[lo]
    dash = np.frombuffer(b"-", dtype=np.uint8)[0]
    out = np.empty((len(arr), 36), dtype=np.uint8)
    for dst, src in (
        (slice(0, 8), slice(0, 8)),
        (slice(9, 13), slice(8, 12)),
        (slice(14, 18), slice(12, 16)),
        (slice(19, 23), slice(16, 20)),
        (slice(24, 36), slice(20, 32)),
    ):
        out[:, dst] = hexes[:, src]
    out[:, 8] = out[:, 13] = out[:, 18] = out[:, 23] = dash
    flat = out.reshape(-1)
    offsets = np.arange(0, (len(arr) + 1) * 36, 36, dtype=np.int32)
    strs = pa.StringArray.from_buffers(
        len(arr), pa.py_buffer(offsets.tobytes()), pa.py_buffer(flat.tobytes())
    )
    if arr.null_count:
        mask = ~np.asarray(arr.is_valid())
        idx = pa.array(np.arange(len(arr)), mask=mask, type=pa.int64())
        strs = strs.take(idx)
    return strs


# --- INTERVAL <-> fixed_size_binary(12) --------------------------------------
# Parquet INTERVAL: 3 x little-endian uint32 = (months, days, millis); the
# reference compares it most-significant-byte-last (common/common.go:905-916)
# and carries the raw 12-byte value.


def interval_to_fixed12(months, days, millis) -> pa.Array:
    """Three int sequences -> fixed_size_binary(12) INTERVAL values."""
    m = np.asarray(months, dtype="<u4")
    d = np.asarray(days, dtype="<u4")
    ms = np.asarray(millis, dtype="<u4")
    raw = np.empty((len(m), 12), dtype=np.uint8)
    raw[:, 0:4] = m.view(np.uint8).reshape(-1, 4)
    raw[:, 4:8] = d.view(np.uint8).reshape(-1, 4)
    raw[:, 8:12] = ms.view(np.uint8).reshape(-1, 4)
    return pa.FixedSizeBinaryArray.from_buffers(
        pa.binary(12), len(m), [None, pa.py_buffer(raw.reshape(-1).tobytes())]
    )


def fixed12_to_interval(arr: pa.Array) -> pa.Table:
    """fixed_size_binary(12) INTERVAL -> (months, days, millis) int64 table."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    assert arr.type == pa.binary(12), arr.type
    raw = _fsb_bytes(arr, 12)
    return pa.table(
        {
            "months": pa.array(raw[:, 0:4].copy().view("<u4").reshape(-1).astype(np.int64)),
            "days": pa.array(raw[:, 4:8].copy().view("<u4").reshape(-1).astype(np.int64)),
            "millis": pa.array(raw[:, 8:12].copy().view("<u4").reshape(-1).astype(np.int64)),
        }
    )
