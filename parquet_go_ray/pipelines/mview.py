"""Incrementally maintained grouped aggregates (materialized-view refresh)
over the snapshot log's CDC scan.

A 100 TB ingest table re-aggregated from scratch on every dashboard refresh
is the classic wasted-shuffle anti-pattern.  The snapshot log already
records exactly which files each commit added (``table_changes``), so an
append-only table's grouped aggregate can be maintained by folding ONLY
the new rows into the previous state: cost O(delta), not O(table).

The reference engine has no table lifecycle at all (one file per writer,
`writer/writer.go` Flush/WriteStop); this composes the engine's snapshot
layer with distributed partial aggregation:

* each changed file's rows reduce to per-batch partials INSIDE
  ``map_batches`` (pyarrow ``Table.group_by`` — vectorized, no Python
  rows), so the exchange moves group cards, not rows;
* the driver folds partials into the state table with one more Arrow
  group-by.  State is O(groups) — the same object a from-scratch
  aggregate would hand back — and serializes as a plain Arrow table.

Supported aggregate functions are the self-decomposable ones — ``sum``,
``count``, ``min``, ``max`` — whose partial form equals their final form
(count folds by sum).  Refresh REQUIRES every commit since the state's
version to be a pure append: deletes/upserts/overwrites/compactions
retract or rewrite rows, which sum/count cannot un-fold, so refresh raises
and the caller recomputes from scratch (``state=None``).  min/max would
survive appends only as well; the gate covers them automatically.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from .table import load_snapshot, table_changes, table_scan, table_versions

_MERGE_FN = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def _normalize_aggs(aggs) -> list[tuple[str, str, str | None]]:
    """-> [(out_name, fn, col)]; count takes col=None (counts rows)."""
    out = []
    for spec in aggs:
        name, fn, col = spec
        if fn not in _MERGE_FN:
            raise ValueError(f"unsupported aggregate fn {fn!r}")
        if fn != "count" and col is None:
            raise ValueError(f"{fn} needs a column")
        out.append((name, fn, col))
    names = [n for n, _f, _c in out]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate output names in {names}")
    return out


def _partial(tbl: pa.Table, keys: list[str], specs) -> pa.Table:
    """One vectorized Arrow group-by: rows -> per-group partials with the
    OUTPUT column names (so partials, state, and result share a schema)."""
    cols: dict[str, object] = {k: tbl[k] for k in keys}
    aggs = []
    rename: list[str] = list(keys)
    for i, (name, fn, col) in enumerate(specs):
        src = f"_a{i}"
        if fn == "count":
            cols[src] = pa.array([1] * tbl.num_rows, pa.int64())
            aggs.append((src, "sum"))
        else:
            cols[src] = tbl[col]
            aggs.append((src, fn))
    gt = pa.table(cols).group_by(keys).aggregate(aggs)
    # aggregate() names outputs "<src>_<fn>"; map back to the spec names
    got = {f"_a{i}_{('sum' if fn == 'count' else fn)}": name
           for i, (name, fn, _c) in enumerate(specs)}
    return gt.rename_columns([got.get(c, c) for c in gt.column_names]).select(
        keys + [n for n, _f, _c in specs]
    )


def _merge(parts: list[pa.Table], keys: list[str], specs) -> pa.Table:
    """Fold partial tables (schema: keys + out columns) into one."""
    merged = pa.concat_tables([p for p in parts if p.num_rows], promote_options="none")
    if merged.num_rows == 0:
        return parts[0].slice(0, 0)
    aggs = [(name, _MERGE_FN[fn]) for name, fn, _c in specs]
    gt = merged.group_by(keys).aggregate(aggs)
    got = {f"{name}_{_MERGE_FN[fn]}": name for name, fn, _c in specs}
    return gt.rename_columns([got.get(c, c) for c in gt.column_names]).select(
        keys + [n for n, _f, _c in specs]
    )


def _distributed_partials(ds: rd.Dataset, keys: list[str], specs) -> list[pa.Table]:
    def to_partial(batch: pa.Table) -> pa.Table:
        return _partial(batch, keys, specs)

    parts = ds.map_batches(to_partial, batch_format="pyarrow")
    # collect partials as ARROW (each is group-cardinality-sized): the
    # previous pandas round-trip copied every partial and perturbed types
    # (nullable int min/max -> float64 NaN)
    return list(parts.iter_batches(batch_format="pyarrow"))


def refresh_group_agg(
    table_dir: str,
    keys: list[str],
    aggs,
    state: dict | None = None,
    to_version: int | None = None,
) -> dict:
    """Compute (state=None) or incrementally refresh a grouped aggregate of
    a snapshot table.  ``aggs`` is ``[(out_name, fn, col)]`` with fn in
    sum/count/min/max (count ignores col).  Returns
    ``{"version": v, "keys": [...], "aggs": [...], "data": pa.Table}``;
    pass it back as `state` after more appends to fold in ONLY the rows
    those commits added (verified append-only via the snapshot ops —
    anything else raises, recompute from scratch)."""
    specs = _normalize_aggs(aggs)
    keys = list(keys)
    # head = MAIN's head, not versions[-1]: the newest version number can be
    # a write-audit-publish staging-branch snapshot whose rows main readers
    # must not see until publish
    head = (
        to_version
        if to_version is not None
        else load_snapshot(table_dir)["version"]
    )
    need = keys + [c for _n, _f, c in specs if c is not None]
    need = list(dict.fromkeys(need))
    if state is None:
        base = table_scan(table_dir, version=head, columns=need)
        parts = _distributed_partials(base, keys, specs)
        data = _merge(parts, keys, specs)
        return {"version": head, "keys": keys, "aggs": list(aggs), "data": data}
    if state["keys"] != keys or list(state["aggs"]) != list(aggs):
        raise ValueError("state was built for different keys/aggs")
    frm = state["version"]
    if head < frm:
        raise ValueError(f"state at v{frm} is newer than requested v{head}")
    if head == frm:
        return state
    for v in range(frm + 1, head + 1):
        s = load_snapshot(table_dir, v)
        if s.get("branch", "main") != "main":
            continue  # staged elsewhere; invisible to main until publish
        op = s["op"]
        if op != "append":
            raise ValueError(
                f"commit v{v} is {op!r}, not append-only — incremental refresh "
                "cannot un-fold retractions; recompute with state=None"
            )
    delta = table_changes(table_dir, frm, to_version=head, columns=need)
    parts = _distributed_partials(delta, keys, specs)
    data = _merge([state["data"], *parts], keys, specs)
    return {"version": head, "keys": keys, "aggs": list(aggs), "data": data}


# ---------------------------------------------------------------------------
# driver query (oracled at sf0.01 by __ray_entry__.oracle_sql)


def table_incremental_agg(sf_dir: str) -> pa.Table:
    """Incremental materialized-view refresh under the oracle: orders land
    in three append commits; the aggregate state is built at v1 and then
    REFRESHED from the CDC scan of commits 2-3 only (never rescanning v1's
    files).  The refreshed state must equal SQL's full GROUP BY over the
    whole table exactly — and the query cross-checks it against a
    from-scratch recompute before returning.  Order-independent aggregates
    (int sum / count / float min / max) keep the comparison bit-exact."""
    import numpy as np

    import uuid as _uuid

    from ..sources.io import read_parquet_any
    from .table import table_write

    d = f"/tmp/pgr_table_ia_{_uuid.uuid4().hex[:8]}"
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    orders = read_parquet_any(f"{sf_dir}/orders.parquet", columns=cols)

    def keep(rem: int):
        def f(batch: pa.Table) -> pa.Table:
            k = batch["o_orderkey"].to_numpy(zero_copy_only=False)
            return batch.filter(pa.array(k % 3 == rem))

        return f

    enc = {"o_orderkey": "delta_bp", "o_orderstatus": "dict",
           "o_totalprice": "byte_stream_split"}
    for rem in (0, 1, 2):
        table_write(
            orders.map_batches(keep(rem), batch_format="pyarrow").repartition(2),
            d, encodings=enc,
        )
    aggs = [
        ("sum_custkey", "sum", "o_custkey"),
        ("n_orders", "count", None),
        ("min_price", "min", "o_totalprice"),
        ("max_price", "max", "o_totalprice"),
    ]
    state = refresh_group_agg(d, ["o_orderstatus"], aggs, to_version=1)
    assert state["version"] == 1
    state = refresh_group_agg(d, ["o_orderstatus"], aggs, state=state)
    assert state["version"] == 3
    full = refresh_group_agg(d, ["o_orderstatus"], aggs)
    a = state["data"].sort_by("o_orderstatus")
    b = full["data"].sort_by("o_orderstatus")
    assert a.equals(b), "incremental refresh diverged from full recompute"
    return a
