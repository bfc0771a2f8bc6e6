"""Codec protocol + registry.

Registry pattern mirrors the reference's compressor registry
(reference: compress/compress.go:8-30); the per-codec encode/decode protocol is
the Ray-native seam replacing the reference's static per-column tag dispatch
(reference: layout/page.go:167-191).

Contract: every codec sees a NULL-FREE pyarrow array (chunk-level code strips
nulls to a validity/level stream first, mirroring layout/page.go:202-213) and
returns ``(payload: bytes, meta: dict)`` where meta is small and JSON-able.
``decode(payload, meta, type) -> pa.Array`` must round-trip bit-identically.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa

_ENCODERS: dict[str, Callable] = {}
_DECODERS: dict[str, Callable] = {}


def register(name: str, encode: Callable, decode: Callable) -> None:
    _ENCODERS[name] = encode
    _DECODERS[name] = decode


def get_encoder(name: str) -> Callable:
    return _ENCODERS[name]


def get_decoder(name: str) -> Callable:
    return _DECODERS[name]


def codec_names() -> list[str]:
    return sorted(_ENCODERS)


def encode(name: str, arr: pa.Array) -> tuple[bytes, dict]:
    payload, meta = _ENCODERS[name](arr)
    meta["codec"] = name
    meta["rows"] = len(arr)
    return payload, meta


def decode(payload: bytes, meta: dict, typ: pa.DataType) -> pa.Array:
    return _DECODERS[meta["codec"]](payload, meta, typ)


# ---------------------------------------------------------------------------
# numpy <-> arrow helpers shared by codecs (all zero-copy where possible)
# ---------------------------------------------------------------------------

import numpy as np


def arr_values_np(arr: pa.Array) -> np.ndarray:
    """Zero-copy numpy view of a null-free numeric/bool arrow array."""
    if pa.types.is_boolean(arr.type):
        return arr.to_numpy(zero_copy_only=False)
    return arr.to_numpy(zero_copy_only=True)


def binary_parts(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(lengths:int64, data:uint8) for a null-free string/binary array, zero-copy."""
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_t = np.int64
    else:
        off_t = np.int32
    buffers = arr.buffers()
    offsets = np.frombuffer(buffers[1], dtype=off_t, count=len(arr) + 1, offset=arr.offset * np.dtype(off_t).itemsize)
    data_buf = buffers[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)[offsets[0] : offsets[-1]]
        if data_buf is not None and len(data_buf) > 0
        else np.empty(0, dtype=np.uint8)
    )
    lengths = np.diff(offsets).astype(np.int64)
    return lengths, data


def build_binary(lengths: np.ndarray, data: np.ndarray, typ: pa.DataType) -> pa.Array:
    """Rebuild a string/binary arrow array from lengths + concatenated bytes."""
    offsets = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    data_buf = pa.py_buffer(np.ascontiguousarray(data).tobytes())
    if offsets[-1] > (1 << 31) - 1 or pa.types.is_large_string(typ) or pa.types.is_large_binary(typ):
        out_t = (
            pa.large_string()
            if pa.types.is_string(typ) or pa.types.is_large_string(typ)
            else pa.large_binary()
        )
        return pa.Array.from_buffers(
            out_t, len(lengths), [None, pa.py_buffer(offsets.tobytes()), data_buf]
        )
    off32 = offsets.astype(np.int32)
    return pa.Array.from_buffers(
        typ, len(lengths), [None, pa.py_buffer(off32.tobytes()), data_buf]
    )
