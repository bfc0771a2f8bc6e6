"""BYTE_STREAM_SPLIT — byte-plane transpose for FLOAT/DOUBLE (and ints).

Reference: encoding/encodingwrite.go:504-554 / encodingread.go:437-485.
Pure numpy: view values as a (n, k) byte matrix, transpose, copy.  Improves
downstream block compression of floats with shared exponent structure; the
encoding itself is size-neutral.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .base import arr_values_np, register


def encode_bss(arr: pa.Array) -> tuple[bytes, dict]:
    v = np.ascontiguousarray(arr_values_np(arr))
    k = v.dtype.itemsize
    planes = v.view(np.uint8).reshape(-1, k).T
    return np.ascontiguousarray(planes).tobytes(), {"k": k}


def decode_bss(payload: bytes, meta: dict, typ: pa.DataType) -> pa.Array:
    n, k = meta["rows"], meta["k"]
    planes = np.frombuffer(payload, dtype=np.uint8).reshape(k, n)
    v = np.ascontiguousarray(planes.T).reshape(-1).view(typ.to_pandas_dtype())
    return pa.array(v, type=typ)


register("byte_stream_split", encode_bss, decode_bss)
