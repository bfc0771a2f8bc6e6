"""Windowed aggregates over the events stream table.

The reference is a pure batch storage library (SURVEY §1.1: no
streaming/watermarks anywhere), but a data-processing engine at corpus scale
needs stream-shaped batch operators.  Ray Data idiom: window keys are
computed vectorized per batch; the wide step is PARTIAL-aggregated inside
map_batches first (one row per (batch, window, key)), then folded with a
hash-partitioned groupby where each partition runs ONE vectorized pandas
aggregation — never one pandas call per window group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..sources.io import read_parquet_any as _read_parquet_any
from ..stages.common import hash_part as _hash_part

FOLD_PARTS = 16

# every fold emits THIS Arrow schema, including for empty groups: mixed
# pandas/arrow blocks (and schema-less empties) make Ray's exchange log
# schema-hash and RefBundle-mismatch warnings and defeat block-schema dedup
W_SCHEMA = pa.schema(
    [
        ("w", pa.int64()),
        ("event_type", pa.string()),
        ("n", pa.int64()),
        ("min_v", pa.float64()),
        ("max_v", pa.float64()),
    ]
)

SESSION_SCHEMA = pa.schema(
    [
        ("user_id", pa.int64()),
        ("session_start_us", pa.int64()),
        ("session_end_us", pa.int64()),
        ("n_events", pa.int64()),
    ]
)


_PART_SCHEMA = pa.schema(list(W_SCHEMA) + [pa.field("__part", pa.int64())])


def _window_partial(w: np.ndarray, event_type, value) -> pa.Table:
    """One batch's (w, event_type) -> count/min/max partial, fully
    Arrow-native (pa.Table.group_by C kernels — no pandas object conversion
    on the string column; round-3 verdict #9).  __part comes from a Knuth
    multiplicative hash of the window id: window count >> FOLD_PARTS, so
    partitions balance without hashing strings."""
    import pyarrow.compute as pc

    t = pa.table({"w": pa.array(w), "event_type": event_type, "value": value})
    # count mode="all" == SQL COUNT(*): plain "count" skips nulls, which
    # would undercount n (and drop all-null groups) on a nullable value
    # column while the oracle counts every row
    agg = t.group_by(["w", "event_type"]).aggregate(
        [
            ("value", "count", pc.CountOptions(mode="all")),
            ("value", "min"),
            ("value", "max"),
        ]
    )
    part = _hash_part(agg["w"].to_numpy(), FOLD_PARTS)
    return pa.table(
        {
            "w": agg["w"],
            "event_type": agg["event_type"],
            "n": agg["value_count"],
            "min_v": agg["value_min"],
            "max_v": agg["value_max"],
            "__part": pa.array(part),
        }
    ).cast(_PART_SCHEMA)


def _window_fold(g: pa.Table) -> pa.Table:
    if g.num_rows == 0:
        return W_SCHEMA.empty_table()
    agg = g.group_by(["w", "event_type"]).aggregate(
        [("n", "sum"), ("min_v", "min"), ("max_v", "max")]
    )
    return pa.table(
        {
            "w": agg["w"],
            "event_type": agg["event_type"],
            "n": agg["n_sum"],
            "min_v": agg["min_v_min"],
            "max_v": agg["max_v_max"],
        }
    ).cast(W_SCHEMA)


def tumbling_window_agg(sf_dir: str, window_sec: int = 900) -> rd.Dataset:
    """(window, event_type) -> count/min/max over tumbling windows.

    Aggregates chosen to be bit-exact regardless of reduction order
    (COUNT/MIN/MAX, not float SUM), so the DuckDB oracle hash-matches.
    Per-batch partial aggregation shrinks the shuffle to one row per
    (batch, window, type); the fold is per-PARTITION vectorized."""

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = ts // (window_sec * 1_000_000)
        return _window_partial(w, batch["event_type"], batch["value"])

    ds = _read_parquet_any(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])
    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("__part").map_groups(_window_fold, batch_format="pyarrow")


def session_windows(sf_dir: str, gap_sec: int = 1800) -> rd.Dataset:
    """Per-user session windows: events closer than gap_sec chain into one
    session.  Users are hash-PARTITIONED (all events of a user land in one
    partition); each partition sorts once by (user, ts) and splits sessions
    with one vectorized gap/user-change scan — no per-user pandas calls.
    Returns (user_id, session_start_us, session_end_us, n_events)."""

    def add_part(batch: pa.Table) -> pa.Table:
        uid = np.asarray(batch["user_id"], dtype=np.int64)
        part = _hash_part(uid, FOLD_PARTS)
        ts = batch["ts"]
        if isinstance(ts, pa.ChunkedArray):
            ts = ts.combine_chunks()
        if pa.types.is_timestamp(ts.type):
            # cast to int64 MICROSECONDS in Arrow, exactly like
            # streaming.py's guard: a pandas path that coerces temporal
            # columns to ns would make astype('int64') yield nanoseconds
            # and split sessions at gap/1000
            ts = ts.cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                "user_id": batch["user_id"],
                "ts": ts,
                "__part": pa.array(part),
            }
        )

    gap_us = gap_sec * 1_000_000

    def sessions(group: pd.DataFrame) -> pa.Table:
        if not len(group):
            return SESSION_SCHEMA.empty_table()
        g = group.sort_values(["user_id", "ts"])
        uid = g.user_id.to_numpy(np.int64)
        ts = g.ts.astype("int64").to_numpy()
        new = np.ones(len(g), dtype=bool)
        new[1:] = (uid[1:] != uid[:-1]) | (np.diff(ts) > gap_us)
        sid = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:] - 1, [len(g) - 1]])
        return pa.table(
            {
                "user_id": pa.array(uid[starts], pa.int64()),
                "session_start_us": pa.array(ts[starts], pa.int64()),
                "session_end_us": pa.array(ts[ends], pa.int64()),
                "n_events": pa.array((ends - starts + 1).astype(np.int64)),
            }
        )

    ds = _read_parquet_any(f"{sf_dir}/events.parquet", columns=["user_id", "ts"]).map_batches(
        add_part, batch_format="pyarrow"
    )
    return ds.groupby("__part").map_groups(sessions, batch_format="pandas")


def tumbling_oracle_sql(window_sec: int = 900) -> str:
    us = window_sec * 1_000_000
    return (
        f"SELECT CAST(FLOOR(EPOCH_US(ts) / {us}) AS BIGINT) AS w, event_type, "
        "COUNT(*) AS n, MIN(value) AS min_v, MAX(value) AS max_v "
        "FROM events GROUP BY 1, 2"
    )


def sessions_oracle_sql(gap_sec: int = 1800) -> str:
    """Gaps-and-islands twin of session_windows."""
    gap_us = gap_sec * 1_000_000
    return (
        "WITH o AS (SELECT user_id, EPOCH_US(ts) AS ts, "
        "LAG(EPOCH_US(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM events), "
        f"f AS (SELECT user_id, ts, CASE WHEN prev IS NULL OR ts - prev > {gap_us} "
        "THEN 1 ELSE 0 END AS brk FROM o), "
        "g AS (SELECT user_id, ts, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts "
        "ROWS UNBOUNDED PRECEDING) AS sid FROM f) "
        "SELECT user_id, MIN(ts) AS session_start_us, MAX(ts) AS session_end_us, "
        "CAST(COUNT(*) AS BIGINT) AS n_events FROM g GROUP BY user_id, sid"
    )


def hopping_window_agg(sf_dir: str, window_sec: int = 1800, hop_sec: int = 600) -> rd.Dataset:
    """(window, event_type) -> count/min/max over HOPPING windows (window
    covers [w*hop, w*hop + window)); each event replicates into
    window_sec/hop_sec windows vectorized (np.repeat), then the same
    partial-agg + partitioned fold as tumbling."""
    assert window_sec % hop_sec == 0, "window must be a multiple of hop"
    nwin = window_sec // hop_sec
    hop_us = hop_sec * 1_000_000

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        last = ts // hop_us  # newest window containing the event
        w = np.repeat(last, nwin) - np.tile(np.arange(nwin, dtype=np.int64), len(ts))
        # replicate rows with an Arrow take (C kernel) — no pandas objects
        idx = pa.array(np.repeat(np.arange(len(ts), dtype=np.int64), nwin))
        et = batch["event_type"]
        val = batch["value"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        if isinstance(val, pa.ChunkedArray):
            val = val.combine_chunks()
        return _window_partial(w, et.take(idx), val.take(idx))

    ds = _read_parquet_any(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])
    return ds.map_batches(partial, batch_format="pyarrow").groupby("__part").map_groups(
        _window_fold, batch_format="pyarrow"
    )


def hopping_oracle_sql(window_sec: int = 1800, hop_sec: int = 600) -> str:
    nwin = window_sec // hop_sec
    hop_us = hop_sec * 1_000_000
    return (
        "SELECT w, event_type, COUNT(*) AS n, MIN(value) AS min_v, MAX(value) AS max_v "
        "FROM (SELECT CAST(FLOOR(EPOCH_US(ts) / {h}) AS BIGINT) - unnest(range({n})) AS w, "
        "event_type, value FROM events) GROUP BY 1, 2"
    ).format(h=hop_us, n=nwin)


def range_join_events(
    sf_dir: str, gap_sec: int = 1800, min_events: int = 2, parts: int = 16
) -> rd.Dataset:
    """RANGE JOIN: assign each event to the (non-overlapping, per-user)
    session interval containing it — only sessions with >= min_events rows
    qualify, so the match is genuinely partial.

    Ray Data has no interval-join operator; the composition is the as-of
    trick specialized to non-overlapping intervals: hash-partition BOTH
    sides by user (intervals never cross partitions), merge_asof each event
    backward onto the latest interval START at-or-before it (one C kernel
    per partition), then keep rows whose ts is inside that interval's END.
    For overlapping intervals this would need an interval tree; session
    windows are disjoint by construction, so as-of + end-filter is exact."""
    from ..stages.common import arrow_out as _arrow_out

    sessions = session_windows(sf_dir, gap_sec).filter(expr=f"n_events >= {min_events}")
    events = _read_parquet_any(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"]
    )

    def _part_of(u: np.ndarray) -> np.ndarray:
        return _hash_part(u, parts)

    def tag_events(b: pa.Table) -> pa.Table:
        u = np.asarray(b["user_id"], dtype=np.int64)
        ts_us = b["ts"].cast(pa.timestamp("us")).cast(pa.int64())
        n = b.num_rows
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "ts_us": ts_us,
                "session_start_us": pa.nulls(n, pa.int64()),
                "session_end_us": pa.nulls(n, pa.int64()),
                "__side": pa.array(np.zeros(n, np.int8)),
                "__part": pa.array(_part_of(u).astype(np.int64)),
            }
        )

    def tag_sessions(b: pa.Table) -> pa.Table:
        u = np.asarray(b["user_id"], dtype=np.int64)
        n = b.num_rows
        return pa.table(
            {
                "event_id": pa.nulls(n, pa.int64()),
                "user_id": b["user_id"],
                "ts_us": pa.nulls(n, pa.int64()),
                "session_start_us": b["session_start_us"],
                "session_end_us": b["session_end_us"],
                "__side": pa.array(np.ones(n, np.int8)),
                "__part": pa.array(_part_of(u).astype(np.int64)),
            }
        )

    tagged = events.map_batches(tag_events, batch_format="pyarrow").union(
        sessions.map_batches(tag_sessions, batch_format="pyarrow")
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        e = g[g.__side == 0][["event_id", "user_id", "ts_us"]].copy()
        s = g[g.__side == 1][["user_id", "session_start_us", "session_end_us"]].copy()
        cols = ["event_id", "user_id", "ts_us", "session_start_us", "session_end_us"]
        if not len(e) or not len(s):
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
        for c, f in (("event_id", e), ("ts_us", e)):
            f[c] = f[c].astype("int64")
        for c in ("session_start_us", "session_end_us"):
            s[c] = s[c].astype("int64")
        e = e.sort_values("ts_us", kind="mergesort")
        s = s.sort_values("session_start_us", kind="mergesort")
        m = pd.merge_asof(
            e, s, left_on="ts_us", right_on="session_start_us",
            by="user_id", direction="backward",
        )
        m = m[m.session_end_us.notna() & (m.ts_us <= m.session_end_us)]
        m = m.astype({c: "int64" for c in cols})
        return m[cols]

    return tagged.groupby("__part").map_groups(_arrow_out(merge), batch_format="pandas")


def range_join_oracle_sql(gap_sec: int = 1800, min_events: int = 2) -> str:
    gap_us = gap_sec * 1_000_000
    return (
        "WITH o AS (SELECT user_id, EPOCH_US(ts) AS ts, "
        "LAG(EPOCH_US(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS prev FROM events), "
        f"f AS (SELECT user_id, ts, CASE WHEN prev IS NULL OR ts - prev > {gap_us} "
        "THEN 1 ELSE 0 END AS brk FROM o), "
        "g AS (SELECT user_id, ts, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts "
        "ROWS UNBOUNDED PRECEDING) AS sid FROM f), "
        "s AS (SELECT user_id, MIN(ts) AS session_start_us, MAX(ts) AS session_end_us "
        f"FROM g GROUP BY user_id, sid HAVING COUNT(*) >= {min_events}) "
        "SELECT e.event_id, e.user_id, EPOCH_US(e.ts) AS ts_us, "
        "s.session_start_us, s.session_end_us "
        "FROM events e JOIN s ON e.user_id = s.user_id "
        "AND EPOCH_US(e.ts) BETWEEN s.session_start_us AND s.session_end_us"
    )
