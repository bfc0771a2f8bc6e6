"""Exact distributed quantiles (two-pass histogram selection)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from parquet_go_ray.functions.quantiles import exact_quantiles

SF = "/root/testdata/sf0.001"


def test_quantiles_match_duckdb(ray_session):
    import duckdb

    qs = (0.01, 0.25, 0.5, 0.75, 0.99, 1.0)
    got = exact_quantiles(SF, "lineitem", "l_extendedprice", qs=qs).to_pandas()
    for q, v in zip(got.q, got.value):
        want = duckdb.sql(
            f"SELECT quantile_disc(l_extendedprice, {q}) "
            f"FROM read_parquet('{SF}/lineitem.parquet')"
        ).fetchone()[0]
        assert v == want, (q, v, want)


def test_quantiles_int_column_and_duplicates(ray_session):
    import duckdb

    got = exact_quantiles(SF, "lineitem", "l_linenumber", qs=(0.5, 0.9)).to_pandas()
    for q, v in zip(got.q, got.value):
        want = duckdb.sql(
            f"SELECT quantile_disc(l_linenumber, {q}) "
            f"FROM read_parquet('{SF}/lineitem.parquet')"
        ).fetchone()[0]
        assert v == float(want), (q, v, want)


def test_quantiles_constant_column(ray_session, tmp_path):
    import pyarrow.parquet as pq

    p = tmp_path / "const"
    p.mkdir()
    pq.write_table(pa.table({"x": pa.array([7.5] * 100)}), str(p / "t.parquet"))
    got = exact_quantiles(str(p), "t", "x", qs=(0.5,)).to_pandas()
    assert got.value.iloc[0] == 7.5


def test_quantiles_nan_and_nulls_excluded(ray_session, tmp_path):
    import pyarrow.parquet as pq

    p = tmp_path / "nan"
    p.mkdir()
    vals = [1.0, 2.0, float("nan"), None, 3.0, 4.0, float("inf")]
    pq.write_table(pa.table({"x": pa.array(vals, pa.float64())}), str(p / "t.parquet"))
    got = exact_quantiles(str(p), "t", "x", qs=(0.5,)).to_pandas()
    # finite values only: [1,2,3,4] -> rank ceil(0.5*4)=2 -> 2.0
    assert got.value.iloc[0] == 2.0


def test_grouped_quantiles_match_duckdb(ray_session):
    import duckdb

    from parquet_go_ray.functions.quantiles import (
        grouped_quantiles,
        grouped_quantiles_oracle_sql,
    )

    got = grouped_quantiles(SF).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')"
    )
    want = con.sql(grouped_quantiles_oracle_sql()).df().reset_index(drop=True)
    assert list(got.l_returnflag) == list(want.l_returnflag)
    assert list(got.q) == list(want.q)
    assert list(got.value) == list(want.value)
