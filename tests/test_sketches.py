"""HyperLogLog approx-distinct + exact distributed distinct count."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from parquet_go_ray.functions.sketches import (
    approx_distinct,
    distinct_count,
    hll_estimate,
    hll_registers,
)

SF = "/root/testdata/sf0.001"


def test_hll_kernel_accuracy_and_merge():
    rng = np.random.default_rng(3)
    vals = pa.array(rng.integers(0, 1 << 62, 500_000, dtype=np.int64))
    exact = len(pc.unique(vals))
    est = hll_estimate(hll_registers(vals))
    assert abs(est - exact) / exact < 0.03  # ~3.7 sigma at p=14
    # register merge is elementwise max: any split must give the SAME registers
    parts = [hll_registers(vals.slice(i * 100_000, 100_000)) for i in range(5)]
    np.testing.assert_array_equal(np.maximum.reduce(parts), hll_registers(vals))


def test_hll_linear_counting_small_range():
    small = pa.array([f"v{i % 37}" for i in range(10_000)])
    est = hll_estimate(hll_registers(small))
    assert abs(est - 37) < 1.5


def test_distinct_count_matches_duckdb(ray_session):
    import duckdb

    got = distinct_count(SF, "lineitem", "l_orderkey").to_pandas()
    want = duckdb.sql(
        f"SELECT COUNT(DISTINCT l_orderkey) FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchone()[0]
    assert int(got.distinct_count.iloc[0]) == want


def test_approx_distinct_within_bound(ray_session):
    import duckdb

    for col in ("l_orderkey", "l_partkey"):
        got = int(approx_distinct(SF, "lineitem", col).to_pandas().approx_distinct.iloc[0])
        want = duckdb.sql(
            f"SELECT COUNT(DISTINCT {col}) FROM read_parquet('{SF}/lineitem.parquet')"
        ).fetchone()[0]
        assert abs(got - want) / want < 0.05, (col, got, want)


def test_approx_distinct_string_column(ray_session):
    import duckdb

    got = int(approx_distinct(SF, "documents", "text").to_pandas().approx_distinct.iloc[0])
    want = duckdb.sql(
        f"SELECT COUNT(DISTINCT text) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    assert abs(got - want) / max(want, 1) < 0.05


def test_hash_sample_consistent(ray_session):
    from parquet_go_ray.functions.sampling import hash_sample

    a = hash_sample(SF, "documents", "doc_id", 0.2).to_pandas().doc_id.sort_values()
    b = hash_sample(SF, "documents", "doc_id", 0.2).to_pandas().doc_id.sort_values()
    assert list(a) == list(b)  # same subsample every run
    # monotone: a lower rate selects a SUBSET (consistent sampling property)
    small = set(hash_sample(SF, "documents", "doc_id", 0.05).to_pandas().doc_id)
    assert small <= set(a)


def test_vocab_topk_matches_duckdb(ray_session):
    import duckdb

    from parquet_go_ray.pipelines.textstats import vocab_topk, vocab_topk_oracle_sql

    got = vocab_topk(SF, k=20).to_pandas()
    sql = vocab_topk_oracle_sql(20).replace("documents", f"read_parquet('{SF}/documents.parquet')")
    want = duckdb.sql(sql).df()
    assert list(got.token) == list(want.token)
    assert list(got.n) == list(want.n)


def test_distinct_count_excludes_null_and_empty_hll(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_go_ray.functions.sketches import approx_distinct, distinct_count

    pq.write_table(
        pa.table({"x": pa.array([1, 1, 2, None, None], pa.int64())}),
        tmp_path / "t.parquet",
    )
    got = distinct_count(str(tmp_path), table="t", column="x").to_pandas()
    assert int(got["distinct_count"].iloc[0]) == 2  # NULL never counts
    # empty input: HLL finishes with 0 instead of IndexError
    pq.write_table(pa.table({"x": pa.array([], pa.int64())}), tmp_path / "e.parquet")
    out = approx_distinct(str(tmp_path), table="e", column="x").to_pandas()
    # empty input: either no batches reach finish (empty result) or the
    # 0-row-batch guard emits approx_distinct=0 — never an IndexError
    assert len(out) == 0 or int(out["approx_distinct"].iloc[0]) == 0
