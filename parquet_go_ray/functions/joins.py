"""Join / lookup operators (SURVEY §2.7: absent in the reference; introduced
by this engine in the scale shapes that matter):

  hash_join       — partition-hash equi-join on integer keys (both sides
                    shuffle once; one vectorized pandas merge per partition).
                    Built on groupby/map_groups because Ray 2.49's native
                    Dataset.join crashes on empty hash partitions, rejects
                    list payloads, and deadlocks when num_partitions exceeds
                    cluster CPUs (see pipelines/dedup.py history).
  broadcast_join  — small side broadcast once via ray.put, applied with a
                    vectorized sorted-array lookup inside map_batches; the
                    big side STREAMS and never shuffles.  The right tool
                    whenever one side fits in worker memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..pipelines.dedup import _hash_join as _impl_hash_join
from ..stages.common import hash_part as _hash_part

DEFAULT_PARTS = 16


def hash_join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str,
    right_on: str | None = None,
    parts: int = DEFAULT_PARTS,
    how: str = "inner",
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> rd.Dataset:
    """Distributed equi-join; see module docstring.  Passing static schemas
    skips the plan-probing pass."""
    return _impl_hash_join(
        left, right, on, right_on=right_on, parts=parts, how=how,
        left_schema=left_schema, right_schema=right_schema,
    )


def broadcast_join(
    big: rd.Dataset, small: pd.DataFrame, on: str, how: str = "inner"
) -> rd.Dataset:
    """Join a streaming Dataset against a small in-memory table: the small
    side ships once (ray.put of sorted key + column arrays); each batch does
    a vectorized searchsorted lookup.  No shuffle of the big side.  Small-side
    keys must be UNIQUE (dimension-table lookup semantics)."""
    import ray

    if how not in ("inner", "left"):
        raise ValueError(f"broadcast_join: how={how!r} (inner or left)")

    key = small[on].to_numpy()
    order = np.argsort(key, kind="stable")
    payload_cols = [c for c in small.columns if c != on]
    ref = ray.put(
        (key[order], {c: small[c].to_numpy()[order] for c in payload_cols})
    )

    class Lookup:
        def __init__(self, ref):
            self.keys, self.cols = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            k = np.asarray(batch[on])
            idx = np.searchsorted(self.keys, k).clip(0, max(len(self.keys) - 1, 0))
            hit = (self.keys[idx] == k) if len(self.keys) else np.zeros(len(k), bool)
            cols = {name: batch[name] for name in batch.column_names}
            if how == "inner":
                sel = np.flatnonzero(hit)
                out = {name: batch[name].take(pa.array(sel, pa.int64())) for name in batch.column_names}
                for c, arr in self.cols.items():
                    out[c] = pa.array(arr[idx[sel]])
                return pa.table(out)
            # left join: misses become nulls (empty small side: all-null
            # payload columns — arr[idx] would IndexError on length 0)
            for c, arr in self.cols.items():
                if len(self.keys) == 0:
                    try:
                        t = pa.from_numpy_dtype(arr.dtype)
                    except (pa.ArrowNotImplementedError, ValueError):
                        t = pa.string()  # object-dtype payload
                    cols[c] = pa.nulls(len(k), t)
                    continue
                vals = pa.array(arr[idx])
                mask = pa.array(~hit)
                import pyarrow.compute as pc

                cols[c] = pc.if_else(mask, pa.scalar(None, type=vals.type), vals)
            return pa.table(cols)

    return big.map_batches(
        Lookup, batch_format="pyarrow", concurrency=(1, 8), fn_constructor_kwargs={"ref": ref}
    )


def asof_join_events(
    sf_dir: str,
    left_type: str = "click",
    right_type: str = "purchase",
    parts: int = 16,
) -> rd.Dataset:
    """AS-OF join (most recent right row at-or-before each left row, per
    key) — the classic event-attribution join Ray Data has no operator for.

    Composition: both sides stream from ONE read, tagged, hash-partitioned
    by user_id (all rows of a user land in one partition, so the as-of
    semantics never cross partitions); each partition runs ONE vectorized
    pandas merge_asof (C kernel, by=user_id, backward+inclusive — the same
    rule as SQL ASOF JOIN's `l.ts >= r.ts`).  Right side pre-aggregates to
    one row per (user_id, ts) so tied timestamps have a deterministic
    winner.  Shuffle payload is the two projected sides, nothing quadratic."""
    from ..sources.io import read_parquet_any as _read
    from ..stages.common import arrow_out as _arrow_out

    ev = _read(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )

    def tag(batch: pa.Table) -> pa.Table:
        et = batch["event_type"]
        keep = pa.compute.is_in(et, value_set=pa.array([left_type, right_type]))
        b = batch.filter(keep)
        part = _hash_part(np.asarray(b["user_id"], dtype=np.int64), parts)
        side = pa.compute.equal(b["event_type"], right_type).cast(pa.int8())
        return pa.table(
            {
                "event_id": b["event_id"],
                "user_id": b["user_id"],
                "ts": b["ts"],
                "value": b["value"],
                "__side": side,
                "__part": pa.array(part.astype(np.int64)),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g.__side == 0][["event_id", "user_id", "ts"]].sort_values("ts", kind="mergesort")
        r = (
            g[g.__side == 1]
            .groupby(["user_id", "ts"], as_index=False)["value"]
            .max()
            .rename(columns={"ts": "ref_ts", "value": "ref_value"})
            .sort_values("ref_ts", kind="mergesort")
        )
        if not len(l):
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype="int64"),
                    "user_id": pd.Series(dtype="int64"),
                    "ts": pd.Series(dtype="datetime64[us]"),
                    "ref_ts": pd.Series(dtype="datetime64[us]"),
                    "ref_value": pd.Series(dtype="float64"),
                }
            )
        m = pd.merge_asof(
            l,
            r,
            left_on="ts",
            right_on="ref_ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
        )
        m = m.dropna(subset=["ref_value"])
        m["ref_value"] = m["ref_value"].round(6)
        return m[["event_id", "user_id", "ts", "ref_ts", "ref_value"]]

    return (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(_arrow_out(merge), batch_format="pandas")
    )


def asof_join_oracle_sql(left_type: str = "click", right_type: str = "purchase") -> str:
    return (
        f"WITH l AS (SELECT event_id, user_id, ts FROM events WHERE event_type = '{left_type}'), "
        f"r AS (SELECT user_id, ts AS ref_ts, MAX(value) AS ref_value FROM events "
        f"WHERE event_type = '{right_type}' GROUP BY user_id, ts) "
        "SELECT l.event_id, l.user_id, l.ts, r.ref_ts, ROUND(r.ref_value, 6) AS ref_value "
        "FROM l ASOF JOIN r ON l.user_id = r.user_id AND l.ts >= r.ref_ts"
    )
