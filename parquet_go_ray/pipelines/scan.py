"""Pruned scans over encoded chunk checkpoints — the distributed analog of
the reference's row/page skipping machinery (reader SkipRows
reader/reader.go:178-222 + ColumnIndex page stats writer/writer.go:418-481):
chunk min/max/null-count stats travel in each blob's meta, so a filtered read
decodes ONLY the chunks whose [min, max] range can satisfy the predicate.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..bits import read_uvarint
from ..chunk import MAGIC, chunk_arrow_type, decode_column_chunk


def chunk_meta(blob: bytes) -> dict:
    """Read a chunk blob's metadata WITHOUT decompressing or decoding it."""
    assert blob[:4] == MAGIC
    mlen, pos = read_uvarint(blob, 4)
    return json.loads(blob[pos : pos + mlen])


def _chunk_may_match(meta: dict, op: str, value) -> bool:
    if op == "==" and "bloom" in meta:
        # Bloom consult first: prunes chunks whose min/max SPAN the probe but
        # whose value set misses it (random-ordered ids/names, where stats
        # never prune).  False positives only -> never wrong, just decoded.
        from ..chunk import _chunk_type, bloom_may_contain

        if not bloom_may_contain(meta["bloom"], value, _chunk_type(meta)):
            return False
    mn, mx = meta.get("min"), meta.get("max")
    if mn is None or mx is None:
        return True  # no stats -> cannot prune
    if meta.get("max_trunc") and op in (">", ">=", "=="):
        return True  # truncated max cannot safely prune upper-bound predicates
    if isinstance(mn, str):
        # non-numeric column: stats carry the str() encoding; compare likewise
        v = str(value)
    else:
        # numeric stats are native JSON numbers; Python int/float comparison
        # is exact, so >53-bit ints prune correctly (no float round-trip)
        v = value
    if op == "==":
        return mn <= v <= mx
    if op == "<":
        return mn < v
    if op == "<=":
        return mn <= v
    if op == ">":
        return mx > v
    if op == ">=":
        return mx >= v
    return True


def scan_column(
    chunks: rd.Dataset,
    column: str,
    predicate: tuple[str, object] | None = None,
) -> rd.Dataset:
    """Decode `column` from a chunk-table Dataset, skipping chunks whose
    min/max stats exclude `predicate` (op, value); rows are then exactly
    filtered.  Returns (chunk_id, row_idx, value) rows."""

    from ..chunk import _chunk_type

    def fn(batch: pa.Table) -> pa.Table:
        out_vals = []
        out_cid = []
        out_idx = []
        val_type = None
        for i in range(batch.num_rows):
            if batch["column"][i].as_py() != column:
                continue
            blob = batch["blob"][i].as_py()
            meta = chunk_meta(blob)
            if meta["codec"] == "list":
                raise TypeError("scan_column targets scalar columns; decode list chunks via decode_column_chunk")
            val_type = _chunk_type(meta)  # known without decoding
            if predicate is not None and not _chunk_may_match(meta, *predicate):
                continue  # pruned: never decompressed/decoded
            arr = decode_column_chunk(blob)
            if predicate is not None:
                op, v = predicate
                kernel = {
                    "==": pc.equal,
                    "<": pc.less,
                    "<=": pc.less_equal,
                    ">": pc.greater,
                    ">=": pc.greater_equal,
                }[op]
                mask = kernel(arr, pa.scalar(v, type=arr.type))
                idx = np.flatnonzero(np.asarray(mask.fill_null(False)))
            else:
                idx = np.arange(len(arr))
            taken = arr.take(pa.array(idx, pa.int64()))
            out_vals.append(taken)
            out_cid.extend([batch["chunk_id"][i].as_py()] * len(idx))
            out_idx.append(idx)
        if not out_vals:
            return pa.table(
                {
                    "chunk_id": pa.array([], pa.string()),
                    "row_idx": pa.array([], pa.int64()),
                    column: pa.array([], val_type or pa.int64()),
                }
            )
        vals = pa.concat_arrays([v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v for v in out_vals])
        return pa.table(
            {
                "chunk_id": pa.array(out_cid, pa.string()),
                "row_idx": pa.array(np.concatenate(out_idx), pa.int64()),
                column: vals,
            }
        )

    return chunks.map_batches(fn, batch_format="pyarrow")


def count_pruned(chunks: rd.Dataset, column: str, predicate: tuple[str, object]) -> dict:
    """Report how many chunks the predicate pruned vs decoded (driver-side)."""
    pruned = decoded = 0
    for batch in chunks.iter_batches(batch_format="pyarrow"):
        for i in range(batch.num_rows):
            if batch["column"][i].as_py() != column:
                continue
            meta = chunk_meta(batch["blob"][i].as_py())
            if _chunk_may_match(meta, *predicate):
                decoded += 1
            else:
                pruned += 1
    return {"pruned": pruned, "decoded": decoded}


def skip_read(
    chunks: rd.Dataset, column: str, row_offset: int, row_count: int
) -> pa.Table:
    """SkipRows analog (reference: reader/reader.go:178-222 +
    reader/columnbuffer.go:158-230): return rows [row_offset,
    row_offset+row_count) of `column` in chunk order.

    Two passes: a metadata pass (no blobs leave the workers) builds the
    cumulative row index and picks the overlapping chunks; the decode pass
    touches ONLY those chunks and decodes ONLY the in-chunk row range
    (byte-sliced for PLAIN fixed-width).  Whole chunks before the offset are
    skipped without decompression."""
    from ray.data import DataContext

    # a Dataset snapshots its DataContext at creation: the global flag alone
    # does NOT affect `chunks` — set preserve_order on BOTH so the metadata
    # pass and the decode pass walk blocks in the same (file) order
    ctx = DataContext.get_current()
    old = ctx.execution_options.preserve_order
    ds_ctx = chunks.context
    ds_old = ds_ctx.execution_options.preserve_order
    ctx.execution_options.preserve_order = True
    ds_ctx.execution_options.preserve_order = True
    try:
        meta_pdf = (
            chunks.select_columns(["chunk_id", "column", "rows"])
            .filter(expr=f"column == '{column}'")
            .to_pandas()  # chunk COUNT rows, not data rows: tiny
        )
        import numpy as _np

        ns = meta_pdf["rows"].to_numpy()
        starts = _np.concatenate(([0], _np.cumsum(ns)[:-1]))
        lo, hi = row_offset, row_offset + row_count
        wanted = {}
        for cid, st, n in zip(meta_pdf["chunk_id"], starts, ns):
            a, b = max(lo, st), min(hi, st + n)
            if a < b:
                wanted[cid] = (int(a - st), int(b - a))

        def fn(batch: pa.Table) -> pa.Table:
            outs = []
            col_blob = None
            for i in range(batch.num_rows):
                if batch["column"][i].as_py() != column:
                    continue
                blob = batch["blob"][i].as_py()
                col_blob = blob
                cid = batch["chunk_id"][i].as_py()
                if cid not in wanted:
                    continue
                off, cnt = wanted[cid]
                arr = decode_column_chunk(blob, row_offset=off, row_count=cnt)
                outs.append(pa.table({column: arr}))
            if not outs:
                # TYPED empty (type read from any same-column blob header,
                # nothing decompressed) so every block shares one schema
                if col_blob is not None:
                    try:
                        t = chunk_arrow_type(col_blob)
                    except TypeError:
                        t = decode_column_chunk(col_blob, row_offset=0, row_count=0).type
                    return pa.table({column: pa.array([], t)})
                return pa.table({})
            return pa.concat_tables(outs)

        parts = [
            b
            for b in chunks.map_batches(fn, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
            if b.num_rows
        ]
        return pa.concat_tables(parts) if parts else pa.table({column: []})
    finally:
        ctx.execution_options.preserve_order = old
        ds_ctx.execution_options.preserve_order = ds_old
