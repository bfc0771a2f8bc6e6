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


# -- mocks3://: S3-semantics stand-in (no rename, PUT-on-close, no dirs) ----
# Backed by local disk so Ray WORKER processes see the same keys the driver
# wrote — memory:// can't cross a process boundary, which is why the dataset
# paths were never integration-tested before this.


@pytest.fixture()
def mocks3_bucket():
    import shutil
    import uuid

    import fsspec

    bucket = f"itest-{uuid.uuid4().hex[:8]}"
    yield f"mocks3://{bucket}"
    fs = fsspec.filesystem("mocks3")
    shutil.rmtree(f"{fs.root}/{bucket}", ignore_errors=True)


def test_mocks3_put_on_close_and_no_rename():
    import fsspec

    fs = fsspec.filesystem("mocks3")
    f = fs.open("sem-test/k.bin", "wb")
    f.write(b"abc")
    assert not fs.exists("sem-test/k.bin"), "key visible before close"
    f.close()
    assert fs.exists("sem-test/k.bin") and fs.size("sem-test/k.bin") == 3
    with pytest.raises(NotImplementedError):
        fs.mv("sem-test/k.bin", "sem-test/k2.bin")
    fs.rm_file("sem-test/k.bin")


def test_par1_dataset_roundtrip_mocks3(ray_session, mocks3_bucket):
    """write_par1_dataset -> listing -> manifest -> pruned read -> resume-skip
    -> compact -> validate, all through the no-rename object-store path."""
    import ray.data as rd

    from parquet_go_ray.formats.par1 import read_par1
    from parquet_go_ray.pipelines.native_io import (
        build_par1_manifest,
        compact_par1_dataset,
        explain_par1_scan,
        read_par1_dataset,
        validate_par1_dataset,
        write_par1_dataset,
    )

    out = f"{mocks3_bucket}/ds1"
    src = rd.range(2000).map_batches(
        lambda b: pa.table(
            {"k": b["id"], "grp": pa.array((b["id"].to_numpy() % 4).astype("int64"))}
        ),
        batch_format="pyarrow",
    ).repartition(4)

    man1 = write_par1_dataset(src, out, codec="zstd", sort_by="k").to_pandas()
    assert len(man1) == 4 and not man1["skipped"].any()
    assert man1["path"].str.startswith("mocks3://").all()

    # resume: identical rerun converges on the same content-named keys
    man2 = write_par1_dataset(src, out, codec="zstd", sort_by="k").to_pandas()
    assert man2["skipped"].all()
    assert sorted(man2["path"]) == sorted(man1["path"])

    # manifest build + manifest-level file pruning through the remote path
    mpath = build_par1_manifest(out)
    assert mpath.startswith("mocks3://")
    assert read_par1(mpath).num_rows == 4
    plan = explain_par1_scan(out, predicate=("k", "<", 500))
    assert plan["files_total"] == 4
    assert plan["files_after_manifest"] < 4  # sorted by k: manifest prunes files
    assert plan["rows_out"] == 500

    got = read_par1_dataset(out, columns=["k"], predicate=("k", "<", 500)).to_pandas()
    assert sorted(got["k"]) == list(range(500))

    # compaction: many small parts -> one file per bucket, still remote
    cout = f"{mocks3_bucket}/ds1_compact"
    cman = compact_par1_dataset(out, cout, target_bytes=1 << 30).to_pandas()
    assert len(cman) == 1 and cman["rows"].sum() == 2000
    assert read_par1_dataset(cout).count() == 2000

    # fsck sweep over the object store
    v = validate_par1_dataset(out).to_pandas()
    assert v["ok"].all(), v[~v["ok"]]["error"].tolist()


def test_par1_dataset_partitioned_mocks3(ray_session, mocks3_bucket):
    """Hive-partitioned layout on an object store: partition 'directories'
    are pure key prefixes; directory pruning still works."""
    import ray.data as rd

    from parquet_go_ray.pipelines.native_io import (
        read_par1_dataset,
        write_par1_dataset,
    )

    out = f"{mocks3_bucket}/part_ds"
    src = rd.range(400).map_batches(
        lambda b: pa.table(
            {"k": b["id"], "grp": pa.array((b["id"].to_numpy() % 2).astype("int64"))}
        ),
        batch_format="pyarrow",
    ).repartition(2)
    man = write_par1_dataset(src, out, partition_by="grp").to_pandas()
    assert set(man["partition"]) == {"grp=0", "grp=1"}
    got = read_par1_dataset(out, partitions={"grp": 1}).to_pandas()
    assert len(got) == 200 and (got["grp"] == 1).all()


def test_write_part_rewrites_truncated_remote_object(mocks3_bucket):
    """Crash-safety on object stores: a part truncated by a killed worker
    (partial PUT at the final content-named key) must NOT be skip-trusted on
    resume — _write_part validates the PAR1 footer magic and rewrites."""
    import fsspec

    from parquet_go_ray.pipelines.native_io import _fs_of, _write_part

    batch = pa.table({"x": pa.array(range(100), pa.int64())})
    part_dir = f"{mocks3_bucket}/data"
    r1 = _write_part(batch, part_dir, "", {})
    assert not r1["skipped"]
    fs, plain, _ = _fs_of(r1["path"])
    key = plain
    # simulate a hard kill mid-PUT: truncate the published object
    good = fs.open(key, "rb").read()
    with fs.open(key, "wb") as f:
        f.write(good[: len(good) // 2])
    assert fs.size(key) != len(good)
    r2 = _write_part(batch, part_dir, "", {})
    assert not r2["skipped"], "truncated object must be rewritten, not skipped"
    assert fs.open(key, "rb").read() == good
    # intact object IS skipped (exactly-once resume path unchanged)
    r3 = _write_part(batch, part_dir, "", {})
    assert r3["skipped"]


def test_write_part_cleans_partial_on_write_error(mocks3_bucket, monkeypatch):
    """A write_par1 that raises mid-stream must not leave a partial object
    at the final key (fsspec buffered files still PUT on close during
    exception unwind)."""
    import parquet_go_ray.pipelines.native_io as nio

    batch = pa.table({"x": pa.array(range(10), pa.int64())})
    part_dir = f"{mocks3_bucket}/data2"

    def boom(tbl, path, **kw):
        from parquet_go_ray.uri import open_any

        with open_any(path, "wb") as f:
            f.write(b"PARTIAL")
            raise RuntimeError("injected mid-write failure")

    monkeypatch.setattr(nio, "write_par1", boom)
    with pytest.raises(RuntimeError):
        nio._write_part(batch, part_dir, "", {})
    monkeypatch.undo()
    fs, plain, _ = nio._fs_of(part_dir)
    leftovers = [p for p in fs.ls(plain)] if fs.exists(plain) else []
    assert not leftovers, f"partial object survived the failed write: {leftovers}"
    # and a clean retry succeeds
    r = nio._write_part(batch, part_dir, "", {})
    assert not r["skipped"]
