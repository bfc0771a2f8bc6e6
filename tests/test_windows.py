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
