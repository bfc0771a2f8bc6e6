"""Exact distributed quantiles in two streaming passes + an output-sized
final select — no global sort.

Not in the reference (its aggregations stop at min/max/null stats,
layout/page.go:83-123).  The classic selection-by-histogram composition:

  pass 1  map_batches -> per-batch (min, max, count) partials; tiny reduce
  pass 2  map_batches -> per-batch equi-width histogram (np.bincount over
          scaled indices, B bins); reduce = elementwise sum (16-32 KB per
          batch regardless of batch size)
  select  cumulative counts locate the bin holding each target rank; ONE
          filtered map_batches collects only the values inside those bins
          (expected n/B of the data per bin) and the exact rank is taken
          within the collected slice.

At 100 TB the two passes stream with backpressure and the shuffle payload
is histograms, not data; only the target bins' values (expected n/B of the
data unless the column is pathologically concentrated into one bin) reach
the driver.

Rank semantics match DuckDB's quantile_disc: value at 1-based sorted rank
ceil(q * n).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..sources.io import read_parquet_any as _read_parquet_any

BINS = 8192


def exact_quantiles(
    sf_dir: str,
    table: str = "lineitem",
    column: str = "l_extendedprice",
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.99),
    bins: int = BINS,
) -> "pa.Table":
    """(q, value) for each q — exact, matching SQL quantile_disc."""
    ds = _read_parquet_any(f"{sf_dir}/{table}.parquet", columns=[column])

    # -- pass 1: global min / max / count ------------------------------------
    def partial_stats(batch: pa.Table) -> pa.Table:
        v = _values(batch, column)
        if not len(v):
            return pa.table(
                {"lo": pa.array([], pa.float64()), "hi": pa.array([], pa.float64()),
                 "n": pa.array([], pa.int64())}
            )
        return pa.table(
            {"lo": pa.array([float(v.min())]), "hi": pa.array([float(v.max())]),
             "n": pa.array([len(v)], pa.int64())}
        )

    st = ds.map_batches(partial_stats, batch_format="pyarrow").to_pandas()
    if not len(st) or st.n.sum() == 0:
        return pa.table({"q": pa.array(list(qs)), "value": pa.nulls(len(qs), pa.float64())})
    lo, hi, n = float(st.lo.min()), float(st.hi.max()), int(st.n.sum())
    if hi == lo:
        return pa.table({"q": pa.array(list(qs)), "value": pa.array([lo] * len(qs))})
    width = (hi - lo) / bins

    # -- pass 2: global histogram --------------------------------------------
    def partial_hist(batch: pa.Table) -> pa.Table:
        v = _values(batch, column)
        if not len(v):
            return pa.table({"h": pa.array([], pa.large_binary())})
        idx = np.clip(((v - lo) / width).astype(np.int64), 0, bins - 1)
        h = np.bincount(idx, minlength=bins).astype(np.int64)
        return pa.table({"h": pa.array([h.tobytes()], pa.large_binary())})

    hp = ds.map_batches(partial_hist, batch_format="pyarrow").to_pandas()
    hist = np.zeros(bins, dtype=np.int64)
    for blob in hp.h:
        hist += np.frombuffer(blob, dtype=np.int64)
    cum = np.cumsum(hist)

    # -- locate target bins and their in-bin residual ranks -------------------
    ranks = [max(math.ceil(q * n), 1) for q in qs]  # 1-based
    targets = {}
    for q, r in zip(qs, ranks):
        b = int(np.searchsorted(cum, r))
        below = int(cum[b - 1]) if b > 0 else 0
        targets.setdefault(b, []).append((q, r - below))  # rank within bin, 1-based

    # -- final select: collect ONLY the target bins' values -------------------
    tbins = np.array(sorted(targets), dtype=np.int64)

    def collect(batch: pa.Table) -> pa.Table:
        v = _values(batch, column)
        if not len(v):
            return pa.table({"v": pa.array([], pa.float64()), "b": pa.array([], pa.int64())})
        idx = np.clip(((v - lo) / width).astype(np.int64), 0, bins - 1)
        m = np.isin(idx, tbins)
        return pa.table({"v": pa.array(v[m].astype(np.float64)), "b": pa.array(idx[m])})

    got = ds.map_batches(collect, batch_format="pyarrow").to_pandas()
    out_q, out_v = [], []
    for b, wants in targets.items():
        vals = np.sort(got.v.to_numpy()[got.b.to_numpy() == b])
        for q, r in wants:
            out_q.append(q)
            out_v.append(float(vals[r - 1]))
    order = np.argsort(out_q, kind="stable")
    return pa.table(
        {"q": pa.array(np.asarray(out_q)[order]), "value": pa.array(np.asarray(out_v)[order])}
    )


def quantiles_ds(sf_dir: str, table: str = "lineitem", column: str = "l_extendedprice") -> rd.Dataset:
    """Dataset wrapper for the driver contract."""
    return rd.from_arrow(exact_quantiles(sf_dir, table, column))


def _values(batch: pa.Table, column: str) -> np.ndarray:
    col = batch[column]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = col.drop_null()
    v = col.to_numpy(zero_copy_only=False)
    if v.dtype.kind == "f":
        # NaN/inf are excluded (like NULL) — casting NaN bin indices to int
        # is undefined; note this diverges from SQL's NaN-sorts-last rule
        v = v[np.isfinite(v)]
    return v


def grouped_quantiles(
    sf_dir: str,
    table: str = "lineitem",
    group: str = "l_returnflag",
    column: str = "l_extendedprice",
    qs: tuple[float, ...] = (0.5, 0.95),
    bins: int = 4096,
) -> "pa.Table":
    """Exact per-GROUP quantiles — the same 2-pass histogram selection, all
    groups in flight at once: every batch contributes ONE flat bincount of
    length n_groups x bins (group-local value ranges), so group count scales
    the sketch payload, never the number of passes.  For low-cardinality
    group columns (the corpus-stats case: language, source, return flag)
    this is 2 streaming passes + an output-sized select, no shuffle of data
    rows at all."""
    ds = _read_parquet_any(f"{sf_dir}/{table}.parquet", columns=[group, column])

    def partial_stats(batch: pa.Table) -> pa.Table:
        g, v = _group_values(batch, group, column)
        if not len(v):
            return pa.table(
                {group: pa.array([], batch[group].type), "lo": pa.array([], pa.float64()),
                 "hi": pa.array([], pa.float64()), "n": pa.array([], pa.int64())}
            )
        import pandas as pd

        df = pd.DataFrame({"g": g, "v": v}).groupby("g")["v"].agg(["min", "max", "count"]).reset_index()
        return pa.table(
            {group: pa.array(df["g"]), "lo": pa.array(df["min"].astype(np.float64)),
             "hi": pa.array(df["max"].astype(np.float64)), "n": pa.array(df["count"].astype(np.int64))}
        )

    st = ds.map_batches(partial_stats, batch_format="pyarrow").to_pandas()
    if not len(st):
        return pa.table({group: pa.array([], pa.string()), "q": pa.array([], pa.float64()),
                         "value": pa.array([], pa.float64())})
    agg = st.groupby(group).agg(lo=("lo", "min"), hi=("hi", "max"), n=("n", "sum"))
    groups = sorted(agg.index)
    gid = {g: i for i, g in enumerate(groups)}
    garr = np.array(groups, dtype=object)
    lo = agg.lo.reindex(groups).to_numpy()
    hi = agg.hi.reindex(groups).to_numpy()
    n = agg.n.reindex(groups).to_numpy()
    width = np.where(hi > lo, (hi - lo) / bins, 1.0)

    def bin_of(g: np.ndarray, v: np.ndarray) -> np.ndarray:
        # groups are sorted + complete (pass 1 saw every group), so the id
        # lookup is one vectorized searchsorted — no per-row dict access
        gi = np.searchsorted(garr, g.astype(object))
        b = np.clip(((v - lo[gi]) / width[gi]).astype(np.int64), 0, bins - 1)
        return gi * bins + b

    def partial_hist(batch: pa.Table) -> pa.Table:
        g, v = _group_values(batch, group, column)
        if not len(v):
            return pa.table({"h": pa.array([], pa.large_binary())})
        h = np.bincount(bin_of(g, v), minlength=len(groups) * bins).astype(np.int64)
        return pa.table({"h": pa.array([h.tobytes()], pa.large_binary())})

    hp = ds.map_batches(partial_hist, batch_format="pyarrow").to_pandas()
    hist = np.zeros(len(groups) * bins, dtype=np.int64)
    for blob in hp.h:
        hist += np.frombuffer(blob, dtype=np.int64)

    import math

    targets: dict[int, list[tuple[str, float, int]]] = {}
    for gname in groups:
        i = gid[gname]
        cum = np.cumsum(hist[i * bins : (i + 1) * bins])
        for q in qs:
            r = max(math.ceil(q * n[i]), 1)
            b = int(np.searchsorted(cum, r))
            below = int(cum[b - 1]) if b > 0 else 0
            targets.setdefault(i * bins + b, []).append((gname, q, r - below))

    tkeys = np.array(sorted(targets), dtype=np.int64)

    def collect(batch: pa.Table) -> pa.Table:
        g, v = _group_values(batch, group, column)
        if not len(v):
            return pa.table({"v": pa.array([], pa.float64()), "b": pa.array([], pa.int64())})
        keys = bin_of(g, v)
        m = np.isin(keys, tkeys)
        return pa.table({"v": pa.array(v[m].astype(np.float64)), "b": pa.array(keys[m])})

    got = ds.map_batches(collect, batch_format="pyarrow").to_pandas()
    out_g, out_q, out_v = [], [], []
    for key, wants in targets.items():
        vals = np.sort(got.v.to_numpy()[got.b.to_numpy() == key])
        for gname, q, r in wants:
            out_g.append(gname)
            out_q.append(q)
            out_v.append(float(vals[r - 1]))
    order = np.lexsort((out_q, np.array(out_g, dtype=object)))
    return pa.table(
        {
            group: pa.array(np.array(out_g, dtype=object)[order].tolist()),
            "q": pa.array(np.asarray(out_q)[order]),
            "value": pa.array(np.asarray(out_v)[order]),
        }
    )


def grouped_quantiles_ds(sf_dir: str) -> rd.Dataset:
    return rd.from_arrow(grouped_quantiles(sf_dir))


def grouped_quantiles_oracle_sql(
    table: str = "lineitem",
    group: str = "l_returnflag",
    column: str = "l_extendedprice",
    qs: tuple[float, ...] = (0.5, 0.95),
) -> str:
    parts = [
        f"SELECT {group}, {q} AS q, quantile_disc({column}, {q}) AS value "
        f"FROM {table} GROUP BY {group}"
        for q in qs
    ]
    return " UNION ALL ".join(parts) + f" ORDER BY {group}, q"


def _group_values(batch: pa.Table, group: str, column: str):
    import pandas as pd

    g = batch[group]
    v = batch[column]
    if isinstance(g, pa.ChunkedArray):
        g = g.combine_chunks()
    if isinstance(v, pa.ChunkedArray):
        v = v.combine_chunks()
    gv = np.asarray(g.to_numpy(zero_copy_only=False))
    vv = v.to_numpy(zero_copy_only=False)
    ok = pd.notna(gv) & pd.notna(vv)
    if vv.dtype.kind == "f":
        ok &= np.isfinite(np.where(pd.isna(vv), 0.0, vv))
    return gv[ok], vv[ok].astype(np.float64)
