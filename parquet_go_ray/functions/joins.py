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
            # left join: misses become nulls
            for c, arr in self.cols.items():
                vals = pa.array(arr[idx])
                mask = pa.array(~hit)
                import pyarrow.compute as pc

                cols[c] = pc.if_else(mask, pa.scalar(None, type=vals.type), vals)
            return pa.table(cols)

    return big.map_batches(
        Lookup, batch_format="pyarrow", concurrency=(1, 8), fn_constructor_kwargs={"ref": ref}
    )
