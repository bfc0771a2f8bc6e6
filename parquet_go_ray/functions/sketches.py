"""Distributed sketches — approximate aggregations for 100 TB-scale columns.

Not in the reference (its only aggregations are per-chunk min/max/null
stats, layout/page.go:83-123); these are the streaming-aggregate analogs a
training-data pipeline needs where exact answers would shuffle everything.

HyperLogLog (Flajolet et al. 2007, the public HLL paper): each batch hashes
its values (vectorized polars/xxhash), splits each 64-bit hash into a
register index (top ``p`` bits) and a rank (leading zeros of the rest + 1),
and reduces to ONE 2^p-byte register array per batch via
``np.maximum.reduceat`` on the sorted registers.  Register arrays merge by
elementwise max — associative + commutative, so the reduce tree shape (and
therefore Ray's block order) cannot change the answer.  Standard error is
~1.04/sqrt(2^p): p=14 -> ~0.8%.

The estimator applies the standard small-range (linear counting) and
large-range corrections from the paper.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..sources.io import read_parquet_any as _read_parquet_any

_P = 14  # 2^14 = 16384 registers, ~0.8% standard error


def _hash64(col: pa.Array) -> np.ndarray:
    """Vectorized 64-bit value hash (polars xxhash over Arrow buffers)."""
    from ..stages.common import polars_mod as _pm

    pl = _pm()

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return pl.from_arrow(pa.table({"v": col}))["v"].hash(seed=41).to_numpy().astype(np.uint64)


def hll_registers(col: pa.Array, p: int = _P) -> np.ndarray:
    """One (2^p,) uint8 register array for this batch's values."""
    h = _hash64(col)
    m = 1 << p
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad so rank <= 64-p+1
    # rank = leading zeros of `rest` + 1, vectorized via bit_length
    # (np.uint64 has no clz; 64 - bit_length == leading zeros)
    bl = np.zeros(len(rest), dtype=np.int64)
    r = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = r >= (np.uint64(1) << np.uint64(shift))
        bl[big] += shift
        r[big] >>= np.uint64(shift)
    bl += (r == 1).astype(np.int64)
    rank = (64 - bl + 1).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    order = np.argsort(idx, kind="stable")
    sidx, srank = idx[order], rank[order]
    bounds = np.flatnonzero(np.diff(sidx)) + 1
    starts = np.concatenate(([0], bounds))
    uniq = sidx[starts]
    regs[uniq] = np.maximum.reduceat(srank, starts)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Registers -> cardinality estimate with the paper's corrections."""
    m = len(regs)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.float64(2.0) ** -regs.astype(np.float64))
    if est <= 2.5 * m:
        zeros = int((regs == 0).sum())
        if zeros:
            est = m * np.log(m / zeros)  # linear counting
    elif est > (1 << 64) / 30.0:
        est = -(1 << 64) * np.log1p(-est / (1 << 64))
    return float(est)


def approx_distinct(
    sf_dir: str, table: str = "lineitem", column: str = "l_orderkey", p: int = _P
) -> rd.Dataset:
    """Approximate COUNT(DISTINCT column) as a 1-row Dataset.

    Map side: one register array per batch (fixed 2^p bytes regardless of
    batch size — the whole shuffle payload for a 100 TB column is
    n_batches x 16 KB).  Reduce: elementwise max, then the estimator."""
    ds = _read_parquet_any(f"{sf_dir}/{table}.parquet", columns=[column])

    def to_regs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"regs": pa.array([], pa.large_binary())})
        regs = hll_registers(batch[column], p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.large_binary())})

    def merge(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"regs": pa.array([], pa.large_binary())})
        acc = np.zeros(1 << p, dtype=np.uint8)
        for blob in batch["regs"]:
            acc = np.maximum(acc, np.frombuffer(blob.as_py(), dtype=np.uint8))
        return pa.table({"regs": pa.array([acc.tobytes()], pa.large_binary())})

    # two-level reduce: per-batch registers stream into ONE final merge task
    # (the payload is tiny; repartition(1) moves n_batches x 16 KB, not data)
    merged = (
        ds.map_batches(to_regs, batch_format="pyarrow")
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
    )

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # empty input: no registers at all
            return pa.table(
                {
                    "column": pa.array([column], pa.string()),
                    "approx_distinct": pa.array([0], pa.int64()),
                }
            )
        regs = np.frombuffer(batch["regs"][0].as_py(), dtype=np.uint8)
        return pa.table(
            {
                "column": pa.array([column], pa.string()),
                "approx_distinct": pa.array([int(round(hll_estimate(regs)))], pa.int64()),
            }
        )

    return merged.map_batches(finish, batch_format="pyarrow", batch_size=None)


def distinct_count(
    sf_dir: str, table: str = "lineitem", column: str = "l_orderkey", parts: int = 16
) -> rd.Dataset:
    """EXACT distributed COUNT(DISTINCT column) — the oracled twin that puts
    the same read + hash-partition machinery under the value-hash gate.
    Per-batch local dedup first (combiner), then per-partition dedup+count,
    then a tiny sum."""
    ds = _read_parquet_any(f"{sf_dir}/{table}.parquet", columns=[column])

    def local(batch: pa.Table) -> pa.Table:
        col = batch[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        import pyarrow.compute as pc

        # SQL COUNT(DISTINCT) never counts NULL — drop it before hashing
        u = pc.unique(col).drop_null()
        h = _hash64(u)
        part = (h % np.uint64(parts)).astype(np.int64)
        return pa.table({column: u, "__part": pa.array(part)})

    def per_part(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = len(pc.unique(batch[column])) if batch.num_rows else 0
        return pa.table({"n": pa.array([n], pa.int64())})

    counted = (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(per_part, batch_format="pyarrow")
    )

    def total(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "column": pa.array([column], pa.string()),
                "distinct_count": pa.array(
                    [int(np.asarray(batch["n"]).sum()) if batch.num_rows else 0], pa.int64()
                ),
            }
        )

    return counted.repartition(1).map_batches(total, batch_format="pyarrow", batch_size=None)
