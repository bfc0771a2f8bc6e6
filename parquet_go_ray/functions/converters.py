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
