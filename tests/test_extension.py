"""User-extension surface (SURVEY §2.8): custom codecs registered at runtime
plug into the chunk container and per-column overrides, like the reference's
compressor registry (compress/compress.go:8-30) and encoding= tags."""

import numpy as np
import pyarrow as pa

from parquet_go_ray import codecs
from parquet_go_ray.chunk import decode_column_chunk, encode_column_chunk
from parquet_go_ray.config import EngineConfig
from parquet_go_ray.selector import select_codec


def test_custom_codec_roundtrip():
    def enc(arr):
        v = arr.to_numpy(zero_copy_only=False).astype(np.int64)
        return (v ^ 0x5A).tobytes(), {}

    def dec(payload, meta, typ):
        v = np.frombuffer(payload, dtype=np.int64) ^ 0x5A
        return pa.array(v.astype(typ.to_pandas_dtype()), type=typ)

    codecs.register("xor_demo", enc, dec)
    arr = pa.array([1, 2, None, 99], type=pa.int64())
    row = encode_column_chunk(arr, "xor_demo", outer="gzip")
    assert decode_column_chunk(row["blob"]).equals(arr)
    # per-column override (the reference's `encoding=` tag analog)
    cfg = EngineConfig(per_column_codec={"x": ("xor_demo", "lz4")})
    codec, outer, _ = select_codec(arr.drop_null(), cfg, column="x")
    assert (codec, outer) == ("xor_demo", "lz4")


def test_gzip_lz4_brotli_outer():
    # gzip/lz4 mirror the reference's registry; brotli goes beyond it
    # (the reference can't write BROTLI at all, README.md:172-173)
    arr = pa.array(["hello gzip"] * 100)
    for outer in ["gzip", "lz4", "brotli"]:
        row = encode_column_chunk(arr, "plain", outer=outer)
        assert decode_column_chunk(row["blob"]).equals(arr)


def test_int96_as_fixed_binary():
    # reference INT96 (types/converter.go:94-112) maps to binary(12) here
    vals = [bytes(range(i, i + 12)) for i in range(5)]
    arr = pa.array(vals, type=pa.binary(12))
    row = encode_column_chunk(arr, "plain")
    assert decode_column_chunk(row["blob"]).equals(arr)
