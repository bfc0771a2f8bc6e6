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
from ..stages.common import hash_part as _hash_part

FOLD_PARTS = 16


def top_k(sf_dir: str, table: str, column: str, k: int = 100) -> pa.Table:
    """k largest values of `column` — per-batch np.argpartition local top-k,
    candidates (<= k per batch) merged on the driver.  Never sorts or
    shuffles the table."""

    def local_topk(batch: pa.Table) -> pa.Table:
        col = batch[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        # drop nulls FIRST: they convert to NaN, and argpartition(-v) ranks
        # NaN largest — a nullable column would return k NaNs where SQL's
        # ORDER BY ... DESC (NULLS LAST) returns real values.  If fewer than
        # k non-null values exist overall, the result holds just those.
        v = col.drop_null().to_numpy(zero_copy_only=False)
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


def _topn_per_group(key: np.ndarray, val: np.ndarray, tie: np.ndarray, n: int) -> np.ndarray:
    """Row indices of the top-n rows per key, ordered by (val desc, tie asc)
    within each key — one lexsort, no per-group Python work."""
    order = np.lexsort((tie, -val, key))
    sk = key[order]
    new = np.ones(len(sk), dtype=bool)
    new[1:] = sk[1:] != sk[:-1]
    starts = np.flatnonzero(new)
    run_start = np.repeat(starts, np.diff(np.append(starts, len(sk))))
    rank = np.arange(len(sk)) - run_start
    return order[rank < n]


def grouped_topk(
    sf_dir: str,
    table: str = "orders",
    group: str = "o_custkey",
    value: str = "o_totalprice",
    tie: str = "o_orderkey",
    n: int = 2,
    parts: int = FOLD_PARTS,
) -> rd.Dataset:
    """Top-n rows per group by (value desc, tie asc) — the window-function
    ROW_NUMBER() <= n pattern as a distributed combiner.

    Top-n-per-group is a semilattice (the top-n of unioned top-n's is the
    global top-n), so each batch FIRST reduces to <= n rows per group it has
    seen (one numpy lexsort — no per-group calls), and only those candidates
    hash-shuffle; each partition then applies the same kernel once more.
    Shuffle payload: <= n x (groups present per batch), never the table."""
    ds = _read_parquet_any(f"{sf_dir}/{table}.parquet", columns=[group, value, tie])

    def local(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {group: pa.array([], pa.int64()), value: pa.array([], pa.float64()),
                 tie: pa.array([], pa.int64()), "__part": pa.array([], pa.int64())}
            )
        g = np.asarray(batch[group], dtype=np.int64)
        v = np.asarray(batch[value], dtype=np.float64)
        t = np.asarray(batch[tie], dtype=np.int64)
        keep = _topn_per_group(g, v, t, n)
        keep.sort()
        sub = batch.take(pa.array(keep, pa.int64()))
        part = _hash_part(g[keep], parts)
        return sub.append_column("__part", pa.array(part))

    def fold(batch: pa.Table) -> pa.Table:
        out_schema = pa.schema(
            [(group, pa.int64()), (value, pa.float64()), (tie, pa.int64())]
        )
        if batch.num_rows == 0:
            return out_schema.empty_table()
        g = np.asarray(batch[group], dtype=np.int64)
        v = np.asarray(batch[value], dtype=np.float64)
        t = np.asarray(batch[tie], dtype=np.int64)
        keep = _topn_per_group(g, v, t, n)
        keep.sort()
        return batch.take(pa.array(keep, pa.int64())).drop_columns(["__part"]).cast(out_schema)

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(fold, batch_format="pyarrow")
    )


def grouped_topk_oracle_sql(
    table: str = "orders",
    group: str = "o_custkey",
    value: str = "o_totalprice",
    tie: str = "o_orderkey",
    n: int = 2,
) -> str:
    return (
        f"SELECT {group}, {value}, {tie} FROM ("
        f"SELECT {group}, {value}, {tie}, ROW_NUMBER() OVER ("
        f"PARTITION BY {group} ORDER BY {value} DESC, {tie}) AS rn FROM {table}) "
        f"WHERE rn <= {n}"
    )
