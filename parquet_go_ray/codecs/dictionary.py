"""DICTIONARY / RLE_DICTIONARY — chunk-local dictionary + hybrid-packed indices.

Semantics follow the reference's dict pages (reference: layout/dictpage.go:74-225:
dict values PLAIN-encoded in a leading section; data = one bit-width byte +
RLE/bit-packed-hybrid indices) with two deliberate fixes flagged in SURVEY §2.3:
  * bit width = ceil(log2(dict size)), not the reference's fixed 32
    (writer/writer.go:324);
  * dictionary scope is the column chunk (no cross-shard global dict mutex,
    writer/writer.go:315-325) — the right granularity for distributed encode.

The dictionary build itself is Arrow's C++ hash kernel
(``pc.dictionary_encode``), not a Python dict probe.

Payload layout: varint(dict_payload_len) + PLAIN(dict values) +
bitwidth byte + hybrid(indices).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..bits import bit_width, read_uvarint, write_uvarint
from .base import register
from .plain import decode_plain, encode_plain
from .rle import decode_hybrid, encode_hybrid


def encode_dict_rle(arr: pa.Array) -> tuple[bytes, dict]:
    denc = pc.dictionary_encode(arr)
    if isinstance(denc, pa.ChunkedArray):
        denc = denc.combine_chunks()
    dict_vals = denc.dictionary
    indices = denc.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
    dict_payload, dict_meta = encode_plain(dict_vals)
    dict_meta["rows"] = len(dict_vals)
    w = bit_width(max(len(dict_vals) - 1, 0))
    payload = (
        write_uvarint(len(dict_payload))
        + dict_payload
        + bytes([w])
        + encode_hybrid(indices, w)
    )
    return payload, {"dict_rows": len(dict_vals)}


def decode_dict_rle(payload: bytes, meta: dict, typ: pa.DataType) -> pa.Array:
    dict_len, pos = read_uvarint(payload, 0)
    dict_vals = decode_plain(payload[pos : pos + dict_len], {"rows": meta["dict_rows"]}, typ)
    pos += dict_len
    w = payload[pos]
    pos += 1
    n = meta["rows"]
    if n == 0:
        return dict_vals.slice(0, 0)
    idx, _ = decode_hybrid(payload, w, n, pos + 0)
    return dict_vals.take(pa.array(idx.astype(np.int64), type=pa.int64()))


register("dict_rle", encode_dict_rle, decode_dict_rle)
