"""Relational wide-ops the reference lacks entirely (SURVEY §2.7: "absent in
the reference") but a corpus-scale engine needs, each in the scale shape:
per-batch PARTIAL computation inside map_batches, then a small fold — never
a full sort/shuffle where a combiner suffices.

  top_k        — distributed top-k by column: per-batch local top-k (one
                 np.argpartition per batch), tiny driver merge; no global sort
  grouped_agg  — groupby count/min/max via partial-agg + hash-partitioned
                 vectorized fold (the stats.py pattern generalized to keys)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..sources.io import read_parquet_any as _read_parquet_any

FOLD_PARTS = 16


def top_k(sf_dir: str, table: str, column: str, k: int = 100) -> pa.Table:
    """k largest values of `column` — per-batch np.argpartition local top-k,
    candidates (<= k per batch) merged on the driver.  Never sorts or
    shuffles the table."""

    def local_topk(batch: pa.Table) -> pa.Table:
        v = batch[column].to_numpy(zero_copy_only=False)
        if len(v) > k:
            v = v[np.argpartition(-v, kth=k - 1)[:k]]
        return pa.table({column: pa.array(np.sort(v)[::-1])})

    ds = _read_parquet_any(f"{sf_dir}/{table}.parquet", columns=[column])
    cands = ds.map_batches(local_topk, batch_format="pyarrow").to_pandas()  # <= k rows/batch
    out = np.sort(cands[column].to_numpy())[::-1][:k]
    return pa.table({column: pa.array(out)})


def grouped_agg(
    sf_dir: str, table: str, key: str, value: str
) -> rd.Dataset:
    """(key) -> count / min / max of `value`: per-batch partial aggregation,
    hash-partitioned single-pass fold (order-independent aggregates only, so
    the DuckDB oracle hash-matches bit-exactly)."""

    def partial(batch: pa.Table) -> pa.Table:
        pdf = pd.DataFrame(
            {key: batch[key].to_pandas(), value: batch[value].to_pandas()}
        )
        agg = (
            pdf.groupby(key, sort=False)
            .agg(n=(value, "size"), min_v=(value, "min"), max_v=(value, "max"))
            .reset_index()
        )
        part = pd.util.hash_pandas_object(agg[key], index=False).to_numpy() % FOLD_PARTS
        agg["__part"] = part.astype(np.int64)
        return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return (
            g.groupby(key, sort=False)
            .agg(n=("n", "sum"), min_v=("min_v", "min"), max_v=("max_v", "max"))
            .reset_index()
        )

    ds = _read_parquet_any(f"{sf_dir}/{table}.parquet", columns=[key, value])
    return ds.map_batches(partial, batch_format="pyarrow").groupby("__part").map_groups(
        fold, batch_format="pandas"
    )
