"""Exotic converted/logical types: UUID, INTERVAL, ENUM, JSON, BSON.

Reference surface: tag-grammar converted types (common/common.go:330-525),
UUID logical type as FLBA(16) (common/common.go:418-419), INTERVAL as
FLBA(12) of 3 LE uint32 with byte-wise MSB-last compare
(common/common.go:701, 905-916).
"""

from __future__ import annotations

import uuid as uuid_mod

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_ray.chunk import decode_column_chunk, encode_column_chunk
from parquet_go_ray.functions.converters import (
    fixed12_to_interval,
    fixed16_to_uuid,
    interval_to_fixed12,
    uuid_to_fixed16,
)
from parquet_go_ray.sources.schema import field_from_tag


def test_tag_grammar_converted_types():
    assert field_from_tag("name=u, type=FIXED_LEN_BYTE_ARRAY, convertedtype=UUID").arrow_type == pa.binary(16)
    assert field_from_tag("name=iv, type=FIXED_LEN_BYTE_ARRAY, convertedtype=INTERVAL").arrow_type == pa.binary(12)
    assert field_from_tag("name=e, type=BYTE_ARRAY, convertedtype=ENUM").arrow_type == pa.string()
    assert field_from_tag("name=j, type=BYTE_ARRAY, convertedtype=JSON").arrow_type == pa.string()
    assert field_from_tag("name=b, type=BYTE_ARRAY, convertedtype=BSON").arrow_type == pa.binary()


def _uuids(n: int, with_nulls: bool = True) -> pa.Array:
    vals = [str(uuid_mod.uuid5(uuid_mod.NAMESPACE_URL, str(i))) for i in range(n)]
    if with_nulls:
        vals = [None if i % 17 == 0 else v for i, v in enumerate(vals)]
    return pa.array(vals, pa.string())


def test_uuid_converter_roundtrip():
    a = _uuids(500)
    f = uuid_to_fixed16(a)
    assert f.type == pa.binary(16)
    assert fixed16_to_uuid(f).to_pylist() == a.to_pylist()
    # uppercase input normalizes to lowercase canonical
    up = pa.array([v.upper() if v else None for v in a.to_pylist()], pa.string())
    assert fixed16_to_uuid(uuid_to_fixed16(up)).to_pylist() == a.to_pylist()
    # sliced input uses the right buffer window
    s = a.slice(33, 100)
    assert fixed16_to_uuid(uuid_to_fixed16(s)).to_pylist() == a.to_pylist()[33:133]


def test_interval_converter_roundtrip():
    rng = np.random.default_rng(5)
    m = rng.integers(0, 2**32, 300, dtype=np.uint64).astype("<u4")
    d = rng.integers(0, 2**32, 300, dtype=np.uint64).astype("<u4")
    ms = rng.integers(0, 2**32, 300, dtype=np.uint64).astype("<u4")
    iv = interval_to_fixed12(m, d, ms)
    assert iv.type == pa.binary(12)
    t = fixed12_to_interval(iv)
    np.testing.assert_array_equal(t["months"].to_numpy(), m.astype(np.int64))
    np.testing.assert_array_equal(t["days"].to_numpy(), d.astype(np.int64))
    np.testing.assert_array_equal(t["millis"].to_numpy(), ms.astype(np.int64))


def test_interval_reference_byte_order():
    # one month must compare below one day+1ms under the reference's
    # MSB-last byte compare ONLY via the struct layout, not numeric value:
    # layout is (months, days, millis) LE — reference compares from byte 11
    # down (common/common.go:905-916), i.e. millis field is MOST significant.
    a = interval_to_fixed12([1], [0], [0])[0].as_py()
    b = interval_to_fixed12([0], [0], [1])[0].as_py()
    assert bytes(reversed(a)) < bytes(reversed(b))


@pytest.mark.parametrize("codec", ["plain", "dict_rle"])
def test_uuid_interval_chunk_roundtrip(codec):
    u = uuid_to_fixed16(_uuids(400, with_nulls=False))
    # duplicate-heavy so dict_rle exercises its dictionary path
    idx = pa.array(np.arange(400) % 50, pa.int64())
    u = u.take(idx)
    row = encode_column_chunk(u, codec=codec, outer="zstd")
    back = decode_column_chunk(row["blob"])
    assert back.equals(u.combine_chunks() if isinstance(u, pa.ChunkedArray) else u)

    iv = interval_to_fixed12(*(np.arange(400) % k for k in (7, 11, 13)))
    row2 = encode_column_chunk(iv, codec=codec, outer="none")
    assert decode_column_chunk(row2["blob"]).equals(iv)


def test_uuid_chunk_roundtrip_with_nulls():
    u = uuid_to_fixed16(_uuids(300, with_nulls=True))
    row = encode_column_chunk(u, codec="plain", outer="snappy")
    assert decode_column_chunk(row["blob"]).equals(u)


def test_uuid_flba_through_native_par1(tmp_path):
    """Engine-written PAR1 file with an FLBA(16) UUID column is readable by
    DuckDB — the conformance proof for the FLBA physical path."""
    import duckdb

    from parquet_go_ray.formats.par1 import read_par1, write_par1

    strs = _uuids(200, with_nulls=False)
    t = pa.table({"id": pa.array(np.arange(200), pa.int64()), "u": uuid_to_fixed16(strs)})
    path = str(tmp_path / "uuid.parquet")
    write_par1(t, path, codec="snappy")
    got = duckdb.sql(f"SELECT id, u FROM read_parquet('{path}') ORDER BY id").arrow()
    assert got["u"].cast(pa.binary(16)).combine_chunks().equals(t["u"].combine_chunks() if isinstance(t["u"], pa.ChunkedArray) else t["u"])
    back = read_par1(path)
    assert back["u"].combine_chunks() if isinstance(back["u"], pa.ChunkedArray) else back["u"]
    assert fixed16_to_uuid(back["u"]).to_pylist() == strs.to_pylist()
