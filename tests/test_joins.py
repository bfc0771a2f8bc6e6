"""Join / lookup operators (engine-introduced, SURVEY §2.7)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def test_hash_join_inner_types_preserved(ray_session):
    from parquet_go_ray.functions.joins import hash_join

    left = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3, 4], "v": [10, 20, 30, 40]}))
    right = rd.from_pandas(pd.DataFrame({"k": [2, 3, 5], "w": ["b", "c", "e"]}))
    out = (
        hash_join(
            left, right, on="k",
            left_schema=pa.schema([("k", pa.int64()), ("v", pa.int64())]),
            right_schema=pa.schema([("k", pa.int64()), ("w", pa.string())]),
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out.to_dict("list") == {"k": [2, 3], "v": [20, 30], "w": ["b", "c"]}
    # the null-padding union must NOT demote ints to float
    assert out.v.dtype == np.int64 and out.k.dtype == np.int64


def test_hash_join_left_outer(ray_session):
    from parquet_go_ray.functions.joins import hash_join

    left = rd.from_pandas(pd.DataFrame({"k": [1, 2], "v": [10, 20]}))
    right = rd.from_pandas(pd.DataFrame({"k": [2], "w": [99]}))
    out = (
        hash_join(
            left, right, on="k", how="left",
            left_schema=pa.schema([("k", pa.int64()), ("v", pa.int64())]),
            right_schema=pa.schema([("k", pa.int64()), ("w", pa.int64())]),
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert len(out) == 2
    assert np.isnan(out.w[0]) and out.w[1] == 99


def test_broadcast_join_inner_and_left(ray_session):
    from parquet_go_ray.functions.joins import broadcast_join

    big = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3, 4, 2], "x": [1.0, 2.0, 3.0, 4.0, 5.0]}))
    small = pd.DataFrame({"k": [2, 4], "name": ["two", "four"]})
    inner = broadcast_join(big, small, on="k").to_pandas().sort_values(["k", "x"])
    assert list(inner.k) == [2, 2, 4]
    assert list(inner.name) == ["two", "two", "four"]
    left = broadcast_join(big, small, on="k", how="left").to_pandas()
    assert len(left) == 5 and left.name.isna().sum() == 2


def test_hash_join_randomized_vs_pandas(ray_session):
    """hash_join must agree with a pandas merge on random multisets
    (duplicate keys on both sides => cross-product multiplicities)."""
    rng = np.random.default_rng(3)
    from parquet_go_ray.functions.joins import hash_join

    for trial in range(3):
        lk = rng.integers(0, 20, 200)
        rk = rng.integers(0, 25, 80)
        left = pd.DataFrame({"k": lk, "v": rng.integers(0, 1000, len(lk))})
        right = pd.DataFrame({"k": rk, "w": rng.integers(0, 1000, len(rk))})
        exp = (
            left.merge(right, on="k")
            .sort_values(["k", "v", "w"])
            .reset_index(drop=True)
        )
        got = (
            hash_join(
                rd.from_pandas(left), rd.from_pandas(right), on="k", parts=7,
                left_schema=pa.schema([("k", pa.int64()), ("v", pa.int64())]),
                right_schema=pa.schema([("k", pa.int64()), ("w", pa.int64())]),
            )
            .to_pandas()
            .sort_values(["k", "v", "w"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got[["k", "v", "w"]], exp, check_dtype=False)


def test_hash_join_string_keys(ray_session):
    from parquet_go_ray.functions.joins import hash_join

    left = rd.from_pandas(pd.DataFrame({"k": ["x", "y", "z"], "v": [1, 2, 3]}))
    right = rd.from_pandas(pd.DataFrame({"k": ["y", "z", "w"], "w": [20, 30, 40]}))
    out = (
        hash_join(
            left, right, on="k", parts=5,
            left_schema=pa.schema([("k", pa.string()), ("v", pa.int64())]),
            right_schema=pa.schema([("k", pa.string()), ("w", pa.int64())]),
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out.to_dict("list") == {"k": ["y", "z"], "v": [2, 3], "w": [20, 30]}


def test_asof_join_matches_duckdb(ray_session):
    import duckdb

    from parquet_go_ray.functions.joins import asof_join_events, asof_join_oracle_sql

    sf = "/root/testdata/sf0.001"
    got = (
        asof_join_events(sf)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    want = con.sql(asof_join_oracle_sql()).df().sort_values("event_id").reset_index(drop=True)
    assert len(got) == len(want)
    assert (got.event_id.values == want.event_id.values).all()
    assert (got.ref_ts.values == want.ref_ts.values).all()
    assert (got.ref_value.values == want.ref_value.values).all()


def test_asof_join_no_matches(ray_session, tmp_path):
    """Left rows before any right row are dropped (inner as-of)."""
    import pandas as pd
    import pyarrow.parquet as pq

    d = tmp_path / "ev"
    d.mkdir()
    ts = pd.to_datetime([1, 2, 3, 4], unit="s")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([7, 7, 7, 7], pa.int64()),
                "event_type": pa.array(["click", "purchase", "click", "click"]),
                "value": pa.array([0.0, 5.0, 0.0, 0.0]),
            }
        ),
        str(d / "events.parquet"),
    )
    from parquet_go_ray.functions.joins import asof_join_events

    got = asof_join_events(str(d)).to_pandas().sort_values("event_id")
    # click@1 has no prior purchase; clicks @3,@4 attach purchase@2
    assert list(got.event_id) == [3, 4]
    assert (got.ref_value == 5.0).all()


def test_grouped_topk_matches_duckdb(ray_session):
    import duckdb

    from parquet_go_ray.functions.relational import grouped_topk, grouped_topk_oracle_sql

    sf = "/root/testdata/sf0.001"
    got = (
        grouped_topk(sf, n=3)
        .to_pandas()
        .sort_values(["o_custkey", "o_orderkey"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{sf}/orders.parquet')")
    want = (
        con.sql(grouped_topk_oracle_sql(n=3))
        .df()
        .sort_values(["o_custkey", "o_orderkey"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert (got.o_orderkey.values == want.o_orderkey.values).all()
    assert (got.o_totalprice.values == want.o_totalprice.values).all()


def test_broadcast_join_empty_small_and_bad_how(ray_session):
    import pandas as pd
    import pytest
    import pyarrow as pa
    import ray.data as rd

    from parquet_go_ray.functions.joins import broadcast_join

    big = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64())}))
    empty = pd.DataFrame({"k": pd.Series(dtype="int64"), "v": pd.Series(dtype="float64")})
    out = broadcast_join(big, empty, on="k", how="left").to_pandas()
    assert len(out) == 2 and out["v"].isna().all()
    assert broadcast_join(big, empty, on="k", how="inner").count() == 0
    with pytest.raises(ValueError, match="how"):
        broadcast_join(big, empty, on="k", how="right")
