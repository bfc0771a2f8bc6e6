"""Struct / map chunk round-trips — the reference's Dremel coverage analog
(marshal/marshal.go:69-224, schema/schemahandler.go:343-386): nulls at every
nesting level must round-trip bit-identically, and subtree reads must decode
only the requested field."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_go_ray.chunk import (
    column_sha256,
    decode_column_chunk,
    encode_any_chunk,
)
from parquet_go_ray.config import EngineConfig

CFG = EngineConfig()


def _rt(arr: pa.Array):
    row = encode_any_chunk(arr, CFG)
    out = decode_column_chunk(row["blob"])
    assert out.equals(arr), f"{arr.type}: {arr} != {out}"
    assert column_sha256(out) == column_sha256(arr)
    return row


def test_struct_roundtrip_nulls_every_level():
    t = pa.struct([("a", pa.int64()), ("b", pa.string())])
    arr = pa.array([{"a": 1, "b": "x"}, None, {"a": None, "b": "y"}, {"a": 3, "b": None}] * 25, t)
    _rt(arr)


def test_struct_nested_struct():
    t = pa.struct([("o", pa.struct([("i", pa.float64())])), ("k", pa.int32())])
    arr = pa.array(
        [{"o": {"i": 1.5}, "k": 2}, None, {"o": None, "k": 3}, {"o": {"i": None}, "k": None}] * 20,
        t,
    )
    _rt(arr)


def test_list_of_struct_and_struct_of_list():
    _rt(pa.array([[{"a": 1}, {"a": 2}], None, [], [{"a": None}]] * 20, pa.list_(pa.struct([("a", pa.int64())]))))
    _rt(pa.array([{"v": [1, 2, 3]}, None, {"v": None}, {"v": []}] * 20, pa.struct([("v", pa.list_(pa.int64()))])))


def test_map_roundtrip():
    _rt(pa.array([[("a", 1), ("b", 2)], None, [], [("c", None)]] * 20, pa.map_(pa.string(), pa.int64())))
    _rt(pa.array([[("a", [1, 2])], None, [("b", None)]] * 10, pa.map_(pa.string(), pa.list_(pa.int64()))))


def test_struct_all_null_and_empty():
    _rt(pa.array([None, None, None], pa.struct([("a", pa.int64())])))
    _rt(pa.array([], pa.map_(pa.string(), pa.int64())))
    _rt(pa.array([], pa.struct([("a", pa.int64())])))


def test_subtree_projection_skips_siblings():
    t = pa.struct([("big", pa.string()), ("small", pa.int64())])
    arr = pa.array([{"big": "x" * 1000, "small": i} for i in range(100)] + [None], t)
    row = encode_any_chunk(arr, CFG)
    sub = decode_column_chunk(row["blob"], path=["small"])
    exp = pa.array([i for i in range(100)] + [None], pa.int64())
    assert sub.equals(exp)
    with pytest.raises(KeyError):
        decode_column_chunk(row["blob"], path=["nope"])
    with pytest.raises(TypeError):
        decode_column_chunk(encode_any_chunk(pa.array([1, 2]), CFG)["blob"], path=["x"])


@settings(max_examples=25, deadline=None)
@given(
    rows=st.lists(
        st.one_of(
            st.none(),
            st.fixed_dictionaries(
                {
                    "a": st.one_of(st.none(), st.integers(-(2**60), 2**60)),
                    "b": st.one_of(st.none(), st.text(max_size=8)),
                    "v": st.one_of(
                        st.none(),
                        st.lists(st.one_of(st.none(), st.floats(allow_nan=False)), max_size=4),
                    ),
                }
            ),
        ),
        max_size=40,
    )
)
def test_struct_hypothesis(rows):
    t = pa.struct([("a", pa.int64()), ("b", pa.string()), ("v", pa.list_(pa.float64()))])
    arr = pa.array(rows, t)
    _rt(arr)


@settings(max_examples=25, deadline=None)
@given(
    rows=st.lists(
        st.one_of(
            st.none(),
            st.lists(
                st.tuples(st.text(max_size=6), st.one_of(st.none(), st.integers(-(2**40), 2**40))),
                max_size=4,
                unique_by=lambda kv: kv[0],
            ),
        ),
        max_size=40,
    )
)
def test_map_hypothesis(rows):
    arr = pa.array(rows, pa.map_(pa.string(), pa.int64()))
    _rt(arr)


def test_map_with_struct_values():
    t = pa.map_(pa.string(), pa.struct([("x", pa.int64()), ("y", pa.string())]))
    arr = pa.array(
        [
            [("k1", {"x": 1, "y": "a"}), ("k2", {"x": None, "y": None})],
            None,
            [],
            [("k3", None)],
        ]
        * 15,
        t,
    )
    _rt(arr)


def test_struct_with_map_field():
    t = pa.struct([("m", pa.map_(pa.string(), pa.int64())), ("z", pa.int64())])
    arr = pa.array(
        [{"m": [("a", 1)], "z": 5}, None, {"m": None, "z": 6}, {"m": [], "z": None}] * 15, t
    )
    _rt(arr)


def test_deep_nesting_list_of_map():
    t = pa.list_(pa.map_(pa.string(), pa.list_(pa.int64())))
    arr = pa.array(
        [[[("a", [1, 2])], [("b", None)]], None, [], [None]] * 10, t
    )
    _rt(arr)


# -- randomized schema fuzz: any nesting of scalars/list/struct/map ---------

_SCALARS = [pa.int64(), pa.int32(), pa.float64(), pa.string(), pa.bool_()]


def _rand_type(rng, depth: int) -> pa.DataType:
    if depth <= 0 or rng.random() < 0.45:
        return _SCALARS[rng.integers(0, len(_SCALARS))]
    kind = rng.integers(0, 3)
    if kind == 0:
        return pa.list_(_rand_type(rng, depth - 1))
    if kind == 1:
        n_fields = int(rng.integers(1, 4))
        return pa.struct(
            [(f"f{i}", _rand_type(rng, depth - 1)) for i in range(n_fields)]
        )
    return pa.map_(pa.string(), _rand_type(rng, depth - 1))


def _rand_value(rng, t: pa.DataType, depth=0):
    if depth > 6 or (rng.random() < 0.15):
        return None
    if pa.types.is_int64(t) or pa.types.is_int32(t):
        return int(rng.integers(-(2**30), 2**30))
    if pa.types.is_float64(t):
        return float(rng.normal())
    if pa.types.is_string(t):
        return "".join(chr(97 + int(c)) for c in rng.integers(0, 26, rng.integers(0, 8)))
    if pa.types.is_boolean(t):
        return bool(rng.integers(0, 2))
    if pa.types.is_list(t):
        return [
            _rand_value(rng, t.value_type, depth + 1) for _ in range(rng.integers(0, 4))
        ]
    if pa.types.is_struct(t):
        return {
            t.field(i).name: _rand_value(rng, t.field(i).type, depth + 1)
            for i in range(t.num_fields)
        }
    if pa.types.is_map(t):
        n = int(rng.integers(0, 3))
        keys = [f"k{j}" for j in range(n)]
        return [(k, _rand_value(rng, t.item_type, depth + 1)) for k in keys]
    raise AssertionError(t)


def test_random_schema_fuzz_roundtrip():
    rng = np.random.default_rng(12345)
    for trial in range(30):
        t = _rand_type(rng, depth=3)
        rows = [_rand_value(rng, t) for _ in range(int(rng.integers(0, 60)))]
        arr = pa.array(rows, t)
        _rt(arr)


def test_read_partial_struct_pipeline(ray_session):
    """Driver-level ReadPartial: the projected subfield equals a plain read
    of the same column (reader/reader.go:225-289 analog, end to end)."""
    import numpy as np
    import pyarrow.parquet as pq

    from parquet_go_ray.pipelines.roundtrip import read_partial_struct
    from tests.conftest import SF_DIR

    got = read_partial_struct(SF_DIR).to_pandas()
    exp = pq.read_table(
        f"{SF_DIR}/orders.parquet", columns=["o_totalprice"]
    ).to_pandas()
    assert got.columns.tolist() == ["o_totalprice"]
    np.testing.assert_array_equal(
        np.sort(got.o_totalprice.to_numpy()), np.sort(exp.o_totalprice.to_numpy())
    )
