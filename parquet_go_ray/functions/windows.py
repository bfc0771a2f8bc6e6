"""Windowed aggregates over the events stream table.

The reference is a pure batch storage library (SURVEY §1.1: no
streaming/watermarks anywhere), but a data-processing engine at corpus scale
needs stream-shaped batch operators.  Ray Data idiom: treat events as an
ordered, partitioned log — window keys are computed vectorized per batch
(tumbling) or per sorted key-group (session), and the wide step is a plain
groupby over (window, key) with order-independent aggregates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def tumbling_window_agg(sf_dir: str, window_sec: int = 900) -> rd.Dataset:
    """(window, event_type) -> count/min/max over tumbling windows.

    Aggregates chosen to be bit-exact regardless of reduction order
    (COUNT/MIN/MAX, not float SUM), so the DuckDB oracle hash-matches."""

    def add_window(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = ts // (window_sec * 1_000_000)
        return pa.table(
            {
                "w": pa.array(w, pa.int64()),
                "event_type": batch["event_type"],
                "value": batch["value"],
            }
        )

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    ).map_batches(add_window, batch_format="pyarrow")

    def agg(group: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "w": [group.w.iloc[0]],
                "event_type": [group.event_type.iloc[0]],
                "n": [len(group)],
                "min_v": [group.value.min()],
                "max_v": [group.value.max()],
            }
        )

    return ds.groupby(["w", "event_type"]).map_groups(agg, batch_format="pandas")


def session_windows(sf_dir: str, gap_sec: int = 1800) -> rd.Dataset:
    """Per-user session windows: events closer than gap_sec chain into one
    session (groupby user -> sort by ts -> vectorized gap split).  Returns
    (user_id, session_start_us, session_end_us, n_events)."""

    def sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("ts")
        ts = g.ts.astype("int64").to_numpy()
        new = np.concatenate(([True], np.diff(ts) > gap_sec * 1_000_000))
        sid = np.cumsum(new) - 1
        out = (
            pd.DataFrame({"sid": sid, "ts": ts})
            .groupby("sid")
            .agg(session_start_us=("ts", "min"), session_end_us=("ts", "max"), n_events=("ts", "size"))
            .reset_index(drop=True)
        )
        out.insert(0, "user_id", g.user_id.iloc[0])
        return out

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    return ds.groupby("user_id").map_groups(sessions, batch_format="pandas")


def tumbling_oracle_sql(window_sec: int = 900) -> str:
    us = window_sec * 1_000_000
    return (
        f"SELECT CAST(FLOOR(EPOCH_US(ts) / {us}) AS BIGINT) AS w, event_type, "
        "COUNT(*) AS n, MIN(value) AS min_v, MAX(value) AS max_v "
        "FROM events GROUP BY 1, 2"
    )
