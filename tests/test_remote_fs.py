"""Storage pluggability (source/source.go:9-16 analog): reads accept URIs,
partition checkpoints work on non-local (marker-last) backends."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR


def test_read_parquet_any_file_uri(ray_session):
    from parquet_go_ray.sources.io import read_parquet_any

    ds = read_parquet_any(f"file://{SF_DIR}/documents.parquet", columns=["doc_id"])
    assert ds.count() == 500


def test_pipeline_over_file_uri(ray_session):
    from parquet_go_ray.pipelines.textstats import token_count

    out = token_count(f"file://{SF_DIR}").to_pandas()
    assert len(out) == 500


def test_lineage_memory_fs():
    """memory:// has no rename: the marker-last protocol must still give
    exactly-once partition completion semantics."""
    import fsspec

    from parquet_go_ray.state import lineage as lin

    fs = fsspec.filesystem("memory")
    root = "memory://pgr_test_out"
    if fs.exists("/pgr_test_out"):
        fs.rm("/pgr_test_out", recursive=True)
    tbl = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
    rec = {"rows": 3, "raw_bytes": 24, "enc_bytes": 10, "ref_bytes": 12}
    assert lin.done_parts(root) == set()
    lin.write_partition(root, 7, tbl, rec)
    assert lin.is_done(root, 7)
    assert lin.done_parts(root) == {7}
    # idempotent retry keeps the first write
    lin.write_partition(root, 7, tbl, dict(rec, rows=999))
    assert lin.read_lineage(root, 7)["rows"] == 3
    man = lin.collect_manifest(root)
    assert man["partitions"] == 1 and man["rows"] == 3
    lin.write_manifest(root, man)
    assert fs.exists("/pgr_test_out/_manifest.json")


def test_resolve_filesystem_local_passthrough():
    from parquet_go_ray.sources.io import resolve_filesystem

    fs, p = resolve_filesystem("/tmp/x.parquet")
    assert fs is None and p == "/tmp/x.parquet"
    fs, p = resolve_filesystem("file:///tmp/x.parquet")
    assert fs is None and p == "/tmp/x.parquet"
    fs, p = resolve_filesystem("memory://bucket/key.parquet")
    assert fs is not None


def test_lineage_file_uri_normalizes(tmp_path):
    import os

    import pyarrow as pa

    from parquet_go_ray.state import lineage as L

    uri = f"file://{tmp_path}/ckpt"
    t = pa.table({"x": pa.array([1, 2], pa.int64())})
    L.write_partition(uri, 3, t, {"rows": 2})
    # the checkpoint must land at the REAL local path, not ./file:/...
    assert os.path.exists(tmp_path / "ckpt" / "part=00003" / "lineage.json")
    assert L.is_done(uri, 3) and L.is_done(str(tmp_path / "ckpt"), 3)
    assert L.done_parts(uri) == {3}
    assert L.read_lineage(uri, 3)["rows"] == 2


def test_multi_uri_read_same_filesystem(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_go_ray.sources.io import read_parquet_any

    for n in ("a", "b"):
        pq.write_table(pa.table({"x": pa.array([1], pa.int64())}), tmp_path / f"{n}.parquet")
    uris = [f"file://{tmp_path}/a.parquet", f"file://{tmp_path}/b.parquet"]
    assert read_parquet_any(uris).count() == 2
