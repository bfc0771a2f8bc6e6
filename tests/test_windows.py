"""Windowed aggregates: tumbling vs pandas recompute, session gap logic."""

import numpy as np
import pandas as pd

from tests.conftest import SF_DIR


def test_tumbling_matches_pandas(ray_session):
    import pyarrow.parquet as pq

    from parquet_go_ray.functions.windows import tumbling_window_agg

    out = tumbling_window_agg(SF_DIR, window_sec=900).to_pandas()
    ev = pq.read_table(f"{SF_DIR}/events.parquet").to_pandas()
    ev["w"] = ev.ts.astype("int64") // (900 * 1_000_000)
    exp = (
        ev.groupby(["w", "event_type"])
        .agg(n=("value", "size"), min_v=("value", "min"), max_v=("value", "max"))
        .reset_index()
    )
    key = ["w", "event_type"]
    got = out.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)


def test_session_windows_gap(ray_session):
    from parquet_go_ray.functions.windows import session_windows

    out = session_windows(SF_DIR, gap_sec=1800).to_pandas()
    assert (out.session_end_us >= out.session_start_us).all()
    assert (out.n_events >= 1).all()
    # sessions of one user never overlap and respect the gap
    for _, g in out.groupby("user_id"):
        g = g.sort_values("session_start_us")
        gaps = g.session_start_us.values[1:] - g.session_end_us.values[:-1]
        assert (gaps > 1800 * 1_000_000).all()


def test_streaming_tumbling_equals_batch(ray_session):
    """With lateness covering the disorder, the streaming aggregate must
    equal the batch tumbling aggregate exactly."""
    import pandas as pd

    from parquet_go_ray.functions.streaming import streaming_tumbling
    from parquet_go_ray.functions.windows import tumbling_window_agg
    from tests.conftest import SF_DIR

    batch = (
        tumbling_window_agg(SF_DIR, 900)
        .to_pandas()
        .sort_values(["w", "event_type"])
        .reset_index(drop=True)
    )
    stream = (
        streaming_tumbling(SF_DIR, 900, lateness_sec=10 ** 7)
        .to_pandas()
        .sort_values(["w", "event_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        batch[["w", "event_type", "n", "min_v", "max_v"]],
        stream[["w", "event_type", "n", "min_v", "max_v"]],
        check_dtype=False,
    )


def test_streaming_watermark_drops_late_events():
    """Events behind the watermark are dropped and counted."""
    import numpy as np
    import pyarrow as pa

    from parquet_go_ray.functions.streaming import TumblingStreamAggregator

    agg = TumblingStreamAggregator(window_sec=10, lateness_sec=5)
    us = 1_000_000

    def mk(ts_list):
        return pa.table(
            {
                "ts": pa.array(np.array(ts_list) * us, pa.int64()),
                "event_type": pa.array(["a"] * len(ts_list)),
                "value": pa.array([1.0] * len(ts_list)),
            }
        )

    closed = agg.feed(mk([0, 3, 12, 100]))  # watermark -> 95s
    assert agg.late_dropped == 0
    assert closed.num_rows >= 2  # windows [0,10) and [10,20) closed
    agg.feed(mk([4]))  # 4s < watermark 95s -> dropped
    assert agg.late_dropped == 1
    tail = agg.flush()
    total_n = closed["n"].to_pylist() + tail["n"].to_pylist()
    assert sum(total_n) == 4  # the late event never counted


def test_streaming_deskew_dominant_event_type(ray_session):
    """One event_type carrying ~90% of the stream must spread over many
    partitions (time-range sharding) AND still aggregate exactly like the
    batch recompute — the r2-verdict straggler scenario."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_go_ray.functions.streaming import (
        PARTS,
        shard_key,
        streaming_tumbling,
    )

    rng = np.random.default_rng(7)
    n = 50_000
    ts = np.sort(rng.integers(0, 900 * 1_000_000 * 64 * 6, n))  # ~6 shards
    et = np.where(rng.random(n) < 0.9, "hot", rng.choice(["a", "b", "c"], n))
    tmp = "/tmp/pgr_skew_events"
    import os
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    pq.write_table(
        pa.table(
            {
                "ts": pa.array(ts, pa.timestamp("us")),
                "event_type": pa.array(et.astype(object), pa.string()),
                "value": pa.array(rng.normal(size=n)),
                "user_id": pa.array(np.zeros(n, np.int64)),
                "event_id": pa.array(np.arange(n)),
            }
        ),
        f"{tmp}/events.parquet",
    )

    # the dominant type alone must span several partitions
    hot = et == "hot"
    parts_of_hot = np.unique(shard_key(et[hot], ts[hot], 900, 64))
    assert len(parts_of_hot) >= min(PARTS, 5), parts_of_hot
    # and no partition may hold a majority of the hot stream (balance)
    counts = np.bincount(shard_key(et[hot], ts[hot], 900, 64).astype(int), minlength=PARTS)
    assert counts.max() < 0.5 * hot.sum(), counts

    out = streaming_tumbling(tmp, 900, lateness_sec=10**9).to_pandas()
    ev = pd.DataFrame({"ts": ts, "event_type": et, "value": None})
    ev["value"] = pq.read_table(f"{tmp}/events.parquet")["value"].to_numpy()
    ev["w"] = ev.ts // (900 * 1_000_000)
    exp = (
        ev.groupby(["w", "event_type"])
        .agg(n=("value", "size"), min_v=("value", "min"), max_v=("value", "max"))
        .reset_index()
    )
    key = ["w", "event_type"]
    got = out.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)


def test_range_join_matches_duckdb(ray_session):
    import duckdb

    from parquet_go_ray.functions.windows import range_join_events, range_join_oracle_sql

    sf = "/root/testdata/sf0.001"
    got = (
        range_join_events(sf)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
        .astype("int64")
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')")
    want = (
        con.sql(range_join_oracle_sql()).df().sort_values("event_id").reset_index(drop=True).astype("int64")
    )
    assert got.equals(want)
    # genuinely partial: some events fall outside every qualifying session
    total = con.sql("SELECT COUNT(*) FROM events").fetchone()[0]
    assert 0 < len(got) < total


def test_tumbling_counts_null_values_like_count_star(ray_session, tmp_path):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_go_ray.functions.windows import tumbling_window_agg

    ts = pa.array(
        np.arange(10) * 1_000_000, pa.timestamp("us")
    )  # all in window 0 at 900s
    pq.write_table(
        pa.table(
            {
                "ts": ts,
                "event_type": pa.array(["a"] * 5 + ["b"] * 5),
                "value": pa.array([1.0, None, 3.0, None, 5.0] + [None] * 5),
            }
        ),
        tmp_path / "events.parquet",
    )
    out = tumbling_window_agg(str(tmp_path)).to_pandas().set_index("event_type")
    # COUNT(*) semantics: nulls count; the all-null group still appears
    assert out.loc["a", "n"] == 5 and out.loc["b", "n"] == 5
    assert np.isnan(out.loc["b", "min_v"]) or out.loc["b", "min_v"] is None
