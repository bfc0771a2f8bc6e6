"""Streaming window aggregation with watermarks — the stateful-streaming
member of the window family (the reference has no streaming surface at all;
SURVEY §2.7).

Execution shape (documented partitioning assumption): the stream is
hash-partitioned by event_type, so every (window, type) group lives entirely
inside one partition's stream; each partition replays its events in
timestamp order through ONE stateful aggregator (actor semantics — state in
`open`, work per feed() batch), closing windows as the watermark
(max-seen-ts − allowed lateness) passes their end.  With lateness covering
the stream's disorder the union of closed+flushed windows equals the batch
tumbling aggregate bit-for-bit, which is exactly how the driver oracles it.

Events older than the watermark at arrival are DROPPED and counted
(`late_dropped`) — standard watermark semantics, surfaced so tests can pin
both the lossless and the lossy regime."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..sources.io import read_parquet_any as _read_parquet_any

PARTS = 16


def shard_key(
    event_type, ts_us: np.ndarray, window_sec: int, windows_per_shard: int
) -> np.ndarray:
    """Partition id for (event_type, window-aligned time range): a dominant
    event_type spreads over time shards instead of replaying its whole
    stream in one straggler task, while every window still lands wholly
    inside one shard (shard width = windows_per_shard exact windows)."""
    h = pd.util.hash_pandas_object(pd.Series(event_type), index=False).to_numpy()
    shard = (ts_us // (window_sec * 1_000_000 * windows_per_shard)).astype(np.uint64)
    with np.errstate(over="ignore"):
        return (h + shard * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(PARTS)


class TumblingStreamAggregator:
    """Stateful streaming tumbling-window aggregator (count/min/max).

    feed(batch) ingests one arrow batch (any within-batch order; batches must
    arrive roughly ts-ordered up to `lateness_sec`), returns CLOSED windows;
    flush() returns everything still open.  All per-batch math is vectorized;
    state is a dict keyed by (window, event_type) holding [n, min, max]."""

    def __init__(self, window_sec: int = 900, lateness_sec: int = 3600):
        self.w_us = window_sec * 1_000_000
        self.late_us = lateness_sec * 1_000_000
        self.open: dict[tuple[int, str], list] = {}
        self.watermark = -(1 << 62)
        self.late_dropped = 0

    def _emit_closed(self) -> pa.Table:
        closed_keys = [k for k in self.open if (k[0] + 1) * self.w_us <= self.watermark]
        rows = {"w": [], "event_type": [], "n": [], "min_v": [], "max_v": []}
        for k in closed_keys:
            n, mn, mx = self.open.pop(k)
            rows["w"].append(k[0])
            rows["event_type"].append(k[1])
            rows["n"].append(n)
            rows["min_v"].append(mn)
            rows["max_v"].append(mx)
        return pa.table(
            {
                "w": pa.array(rows["w"], pa.int64()),
                "event_type": pa.array(rows["event_type"], pa.string()),
                "n": pa.array(rows["n"], pa.int64()),
                "min_v": pa.array(rows["min_v"], pa.float64()),
                "max_v": pa.array(rows["max_v"], pa.float64()),
            }
        )

    def feed(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows:
            ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            keep = ts >= self.watermark
            self.late_dropped += int((~keep).sum())
            if keep.any():
                pdf = pd.DataFrame(
                    {
                        "w": ts[keep] // self.w_us,
                        "event_type": batch["event_type"].to_pandas().to_numpy()[keep],
                        "value": batch["value"].to_pandas().to_numpy()[keep],
                    }
                )
                agg = (
                    pdf.groupby(["w", "event_type"], sort=False)
                    .agg(n=("value", "size"), min_v=("value", "min"), max_v=("value", "max"))
                    .reset_index()
                )
                for w, et, n, mn, mx in agg.itertuples(index=False):
                    st = self.open.get((w, et))
                    if st is None:
                        self.open[(w, et)] = [int(n), float(mn), float(mx)]
                    else:
                        st[0] += int(n)
                        st[1] = min(st[1], float(mn))
                        st[2] = max(st[2], float(mx))
            self.watermark = max(self.watermark, int(ts.max()) - self.late_us)
        return self._emit_closed()

    def flush(self) -> pa.Table:
        self.watermark = 1 << 62
        return self._emit_closed()


def streaming_tumbling(
    sf_dir: str,
    window_sec: int = 900,
    lateness_sec: int = 3600,
    windows_per_shard: int = 64,
) -> rd.Dataset:
    """Distributed streaming tumbling aggregate: events hash-partitioned by
    (event_type, window-aligned time range), each partition replayed in ts
    order through one TumblingStreamAggregator.  With lateness >= stream
    disorder the result equals the batch tumbling aggregate (the driver's
    oracle).

    Partitioning assumption: the time-range shard width is an exact multiple
    of the window (`windows_per_shard` windows per shard), so every window
    lies entirely inside ONE shard — no boundary fragments to merge — while a
    single dominant event_type spreads over time shards instead of replaying
    its whole stream in one straggler task.  The watermark is therefore
    per-(type-set, range) partition rather than per-type; with lateness
    covering the stream's disorder the two are equivalent (and the driver's
    oracle pins that regime)."""

    def add_part(batch: pa.Table) -> pa.Table:
        et = batch["event_type"]
        if isinstance(et, pa.ChunkedArray):
            et = et.combine_chunks()
        ts = batch["ts"].cast(pa.int64())
        h = shard_key(
            et.to_pandas(),
            ts.to_numpy(zero_copy_only=False),
            window_sec,
            windows_per_shard,
        )
        return pa.table(
            {
                # int64 MICROSECONDS — keeps pandas from silently switching
                # the stream to datetime64[ns] units in the partition replay
                "ts": ts,
                "event_type": et,
                "value": batch["value"],
                "__part": pa.array(h.astype(np.int64)),
            }
        )

    def replay(group: pd.DataFrame) -> pa.Table:
        agg = TumblingStreamAggregator(window_sec, lateness_sec)
        g = group.sort_values("ts")
        outs = []
        # stream in ~4k-event arrival chunks to exercise incremental closing
        for lo in range(0, len(g), 4096):
            piece = g.iloc[lo : lo + 4096]
            t = pa.table(
                {
                    "ts": pa.array(piece["ts"].astype("int64"), pa.int64()),
                    "event_type": pa.array(piece["event_type"], pa.string()),
                    "value": pa.array(piece["value"], pa.float64()),
                }
            )
            closed = agg.feed(t)
            if closed.num_rows:
                outs.append(closed)
        tail = agg.flush()
        if tail.num_rows:
            outs.append(tail)
        if not outs:
            # typed empty keeps every block on one hashable Arrow schema
            return agg.flush().schema.empty_table()
        return pa.concat_tables(outs)

    ds = _read_parquet_any(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])
    return ds.map_batches(add_part, batch_format="pyarrow").groupby("__part").map_groups(
        replay, batch_format="pandas"
    )
