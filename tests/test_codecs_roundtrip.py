"""Round-trip encode->decode bit-identity for every registered codec,
modeled on the reference's read-back tests (encoding/encodingread_test.go:15-247)
including extreme values (MaxInt64/MinInt64 wraparound deltas, zigzag edges)."""

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_ray import bits
from parquet_go_ray import codecs

I64 = np.iinfo(np.int64)


def rt(codec, arr):
    payload, meta = codecs.encode(codec, arr)
    out = codecs.decode(payload, meta, arr.type)
    assert out.type == arr.type or (
        pa.types.is_large_string(out.type) and pa.types.is_string(arr.type)
    )
    assert out.equals(arr) or out.cast(arr.type).equals(arr), (
        f"{codec} mismatch: {arr[:10]} vs {out[:10]}"
    )
    return payload


INT_ARRAYS = [
    pa.array([], type=pa.int64()),
    pa.array([42], type=pa.int64()),
    pa.array([1, 2, 3, 4, 5], type=pa.int64()),
    pa.array([7, 5, 3, 1, 2, 3, 4, 5], type=pa.int32()),
    pa.array([I64.max, I64.min, I64.max, 0, -1, 1], type=pa.int64()),
    pa.array(np.random.default_rng(0).integers(-(10**12), 10**12, 1000), type=pa.int64()),
    pa.array(np.repeat(np.arange(17), 61), type=pa.int64()),  # long runs
    pa.array(np.arange(100000), type=pa.int64()),  # sorted
    pa.array(np.random.default_rng(1).integers(0, 8, 4096), type=pa.int32()),
]

STR_ARRAYS = [
    pa.array([], type=pa.string()),
    pa.array([""], type=pa.string()),
    pa.array(["a"], type=pa.string()),
    pa.array(["Hello", "World", "Foobar", "ABCDEF"]),
    pa.array(["", "", "x", ""]),
    pa.array(["src/a/b.py", "src/a/c.py", "src/a/c.pyc", "src/b/d.rs"] * 50),
    pa.array([("x" * 300) + str(i) for i in range(64)]),  # beyond PREFIX_CAP
    pa.array(["\x00\xff bin", "\x00\xff bin", "?"]),
]


@pytest.mark.parametrize("codec", ["plain", "rle_bp", "delta_bp", "dict_rle"])
@pytest.mark.parametrize("i", range(len(INT_ARRAYS)))
def test_int_roundtrip(codec, i):
    rt(codec, INT_ARRAYS[i])


@pytest.mark.parametrize("codec", ["plain", "dict_rle", "delta_length_ba", "delta_ba"])
@pytest.mark.parametrize("i", range(len(STR_ARRAYS)))
def test_str_roundtrip(codec, i):
    rt(codec, STR_ARRAYS[i])


@pytest.mark.parametrize(
    "arr",
    [
        pa.array([], type=pa.float64()),
        pa.array([0.0, -0.0, 1.5, float("inf"), float("-inf")], type=pa.float64()),
        pa.array(np.random.default_rng(2).normal(size=1000), type=pa.float64()),
        pa.array(np.random.default_rng(3).normal(size=1000).astype(np.float32), type=pa.float32()),
    ],
)
def test_float_roundtrip(arr):
    for codec in ["plain", "byte_stream_split"]:
        rt(codec, arr)


def test_float_nan_bit_identity():
    # NaN payload bits must survive — compare raw buffers, not values
    v = np.array([np.nan, 1.0, np.float64.fromhex("0x1.fp3")], dtype=np.float64)
    v[0] = np.frombuffer(b"\x01\x00\x00\x00\x00\x00\xf8\x7f", dtype=np.float64)[0]
    arr = pa.array(v, type=pa.float64())
    for codec in ["plain", "byte_stream_split"]:
        payload, meta = codecs.encode(codec, arr)
        out = codecs.decode(payload, meta, arr.type)
        assert out.to_numpy(zero_copy_only=False).tobytes() == v.tobytes()


def test_bool_roundtrip():
    for codec in ["plain", "rle_bp"]:
        rt(codec, pa.array([True, False, True, True, False, False, False, True, True]))
        rt(codec, pa.array([], type=pa.bool_()))


def test_zigzag_edges():
    # encoding/encodingread_test.go:169-188 analog
    v = np.array([0, -1, 1, I64.max, I64.min], dtype=np.int64)
    assert np.array_equal(bits.zigzag_decode(bits.zigzag_encode(v)), v)
    assert bits.zigzag_encode_scalar(0) == 0
    assert bits.zigzag_encode_scalar(-1) == 1
    assert bits.zigzag_encode_scalar(1) == 2
    assert bits.zigzag_decode_scalar(bits.zigzag_encode_scalar(I64.min)) == I64.min


def test_hybrid_mixed_runs():
    rng = np.random.default_rng(7)
    # interleave long runs with noise to force both run kinds in one stream
    parts = []
    for i in range(30):
        parts.append(np.full(rng.integers(1, 40), rng.integers(0, 100), dtype=np.uint64))
    v = np.concatenate(parts)
    enc = __import__("parquet_go_ray.codecs.rle", fromlist=["x"])
    payload = enc.encode_hybrid(v, 7)
    out, _ = enc.decode_hybrid(payload, 7, len(v))
    assert np.array_equal(out, v)


def test_binary_type_roundtrip():
    arr = pa.array([b"\x00\x01", b"", b"\xff" * 10], type=pa.binary())
    for codec in ["plain", "dict_rle", "delta_length_ba", "delta_ba"]:
        rt(codec, arr)
