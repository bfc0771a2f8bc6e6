"""Legacy 2-level list read (LogicalTypes.md backward-compat rules).

The reference reads any footer schema generically through RL/DL
(marshal/unmarshal.go:31-264, layout/page.go:721-937), including pre-standard
repeated fields old Hive/Avro writers emit.  write_par1_legacy_list emulates
those writers; read_par1 must decode the files, and pyarrow (which also
implements the backward-compat rules) must agree on every value.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from parquet_go_ray.formats.par1 import read_par1, write_par1_legacy_list


def _roundtrip(tbl, tmp_path, **kw):
    p = str(tmp_path / "legacy.parquet")
    write_par1_legacy_list(tbl, p, **kw)
    return p, read_par1(p)


def test_unannotated_repeated_primitive(tmp_path):
    tbl = pa.table(
        {
            "doc_id": pa.array([10, 11, 12, 13], pa.int64()),
            "nums": pa.array([[1, 2, 3], [], [7], [5, 5]], pa.list_(pa.int64())),
        }
    )
    p, out = _roundtrip(tbl, tmp_path)
    assert out["doc_id"].to_pylist() == [10, 11, 12, 13]
    assert out["nums"].to_pylist() == [[1, 2, 3], [], [7], [5, 5]]
    # non-null list of non-null elements (legacy cannot express nulls)
    assert out["nums"].null_count == 0
    # pyarrow implements the same backward-compat rule — values must agree
    pa_tbl = pq.read_table(p)
    assert pa_tbl["nums"].to_pylist() == out["nums"].to_pylist()
    # footer really is 2-level: repeated leaf directly under root
    meta = pq.read_metadata(p)
    assert "nums" in [c.path_in_schema for rg in range(meta.num_row_groups)
                      for c in [meta.row_group(rg).column(1)]]


def test_unannotated_repeated_group(tmp_path):
    st = pa.struct([pa.field("a", pa.int64(), nullable=False), pa.field("b", pa.string())])
    rows = [
        [{"a": 1, "b": "x"}, {"a": 2, "b": None}],
        [],
        [{"a": 3, "b": "y"}],
    ]
    tbl = pa.table({"pairs": pa.array(rows, pa.list_(st))})
    p, out = _roundtrip(tbl, tmp_path)
    assert out["pairs"].to_pylist() == rows
    assert pq.read_table(p)["pairs"].to_pylist() == rows


def test_list_annotated_array_style(tmp_path):
    rows = [["a", "b"], None, [], ["zz"]]
    tbl = pa.table({"tags": pa.array(rows, pa.list_(pa.string()))})
    p, out = _roundtrip(tbl, tmp_path, style="array")
    assert out["tags"].to_pylist() == rows
    assert pq.read_table(p)["tags"].to_pylist() == rows


def test_mixed_flat_and_legacy_columns(tmp_path):
    tbl = pa.table(
        {
            "k": pa.array([1, 2, 3], pa.int64()),
            "vals": pa.array([[1.5], [], [2.5, 3.5]], pa.list_(pa.float64())),
            "name": pa.array(["p", "q", "r"]),
        }
    )
    p, out = _roundtrip(tbl, tmp_path)
    assert out["k"].to_pylist() == [1, 2, 3]
    assert out["vals"].to_pylist() == [[1.5], [], [2.5, 3.5]]
    assert out["name"].to_pylist() == ["p", "q", "r"]
    got = pq.read_table(p)
    assert got["vals"].to_pylist() == out["vals"].to_pylist()


def test_null_list_rejected_in_repeated_style(tmp_path):
    tbl = pa.table({"nums": pa.array([[1], None], pa.list_(pa.int64()))})
    with pytest.raises(ValueError, match="null lists"):
        write_par1_legacy_list(tbl, str(tmp_path / "x.parquet"))


def test_null_element_rejected(tmp_path):
    tbl = pa.table({"nums": pa.array([[1, None]], pa.list_(pa.int64()))})
    with pytest.raises(ValueError, match="null elements"):
        write_par1_legacy_list(tbl, str(tmp_path / "x.parquet"))


def test_legacy_random_roundtrip_vs_pyarrow(tmp_path):
    rng = np.random.default_rng(11)
    n = 500
    lens = rng.integers(0, 6, n)
    rows = [rng.integers(-(2**40), 2**40, k).tolist() for k in lens]
    strs = [[f"s{v}" for v in r] for r in rows]
    tbl = pa.table(
        {
            "ids": pa.array(rows, pa.list_(pa.int64())),
            "tags": pa.array(strs, pa.list_(pa.string())),
        }
    )
    p, out = _roundtrip(tbl, tmp_path, codec="snappy", page_rows=64)
    assert out["ids"].to_pylist() == rows
    assert out["tags"].to_pylist() == strs
    got = pq.read_table(p)
    assert got["ids"].to_pylist() == rows
    assert got["tags"].to_pylist() == strs
