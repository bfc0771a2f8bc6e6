"""Property-based round-trip testing (hypothesis) — goes beyond the
reference's table-driven tests (SURVEY §5 notes it has no property-based or
fuzz coverage): any generated column must survive chunk encode->decode
bit-identically under every applicable codec."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from parquet_go_ray.chunk import column_sha256, decode_column_chunk, encode_column_chunk

SETTINGS = dict(max_examples=25, deadline=None)

int_lists = st.lists(
    st.one_of(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.none(),
        st.integers(min_value=-100, max_value=100),
    ),
    max_size=300,
)

str_lists = st.lists(
    st.one_of(st.text(max_size=80), st.none()),
    max_size=200,
)

float_lists = st.lists(
    st.one_of(
        st.floats(allow_nan=True, allow_infinity=True, width=64),
        st.none(),
    ),
    max_size=200,
)


def rt(arr: pa.Array, codec: str, outer: str = "none"):
    row = encode_column_chunk(arr, codec, outer=outer)
    out = decode_column_chunk(row["blob"])
    assert len(out) == len(arr)
    assert column_sha256(out) == column_sha256(arr), f"{codec}: {arr} != {out}"


@settings(**SETTINGS)
@given(int_lists)
def test_int_codecs_property(vals):
    arr = pa.array(vals, type=pa.int64())
    for codec in ["plain", "rle_bp", "delta_bp", "dict_rle"]:
        rt(arr, codec)


@settings(**SETTINGS)
@given(str_lists)
def test_str_codecs_property(vals):
    arr = pa.array(vals, type=pa.string())
    for codec in ["plain", "dict_rle", "delta_length_ba", "delta_ba", "fsst"]:
        rt(arr, codec)


@settings(**SETTINGS)
@given(float_lists)
def test_float_codecs_property(vals):
    arr = pa.array(vals, type=pa.float64())
    for codec in ["plain", "byte_stream_split"]:
        rt(arr, codec, outer="zstd")


@settings(**SETTINGS)
@given(st.lists(st.one_of(st.booleans(), st.none()), max_size=300))
def test_bool_codecs_property(vals):
    arr = pa.array(vals, type=pa.bool_())
    for codec in ["plain", "rle_bp"]:
        rt(arr, codec)


@settings(**SETTINGS)
@given(
    st.lists(
        st.one_of(st.none(), st.lists(st.integers(-1000, 1000), max_size=20)),
        max_size=100,
    )
)
def test_list_chunks_property(vals):
    from parquet_go_ray.chunk import encode_list_chunk

    arr = pa.array(vals, type=pa.list_(pa.int64()))
    row = encode_list_chunk(arr)
    out = decode_column_chunk(row["blob"])
    assert out.equals(arr)


@settings(**SETTINGS)
@given(st.lists(st.binary(max_size=60), max_size=150))
def test_hybrid_rle_property(vals):
    # raw hybrid stream: random widths/values
    from parquet_go_ray.codecs.rle import decode_hybrid, encode_hybrid

    rng_vals = np.array([len(v) for v in vals], dtype=np.uint64)
    w = int(rng_vals.max()).bit_length() if len(rng_vals) else 0
    payload = encode_hybrid(rng_vals, w)
    if len(rng_vals):
        out, _ = decode_hybrid(payload, w, len(rng_vals))
        assert np.array_equal(out, rng_vals)
