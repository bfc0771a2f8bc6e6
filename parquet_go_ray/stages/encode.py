"""Encode / decode stages — the map_batches kernels and actor classes.

The ChunkEncoder is the Ray-native analog of the reference's
pages->chunk flush path (reference: writer/writer.go:367-500) with
dictionary/FSST state chunk-local instead of writer-global
(writer/writer.go:315-325's mutex-guarded DictRecs — deliberately dropped;
see SURVEY §7.3): one input batch -> one column chunk per column, encoded
with the auto-selected codec, emitted as rows of a chunk table.

Chunk ids are deterministic content hashes, so task retries are idempotent
(same input batch -> same chunk id/bytes).
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
import pyarrow as pa

from ..chunk import (
    column_sha256,
    decode_column_chunk,
    encode_column_chunk,
    raw_nbytes,
)
from ..config import DEFAULT, EngineConfig
from ..selector import REFERENCE_POLICY, select_codec

META_COLS = ["chunk_id", "part", "column", "codec", "outer", "rows", "nulls",
             "raw_bytes", "enc_bytes", "ref_bytes", "sha256"]


def encode_table(table: pa.Table, cfg: EngineConfig = DEFAULT, part: int = 0) -> pa.Table:
    """Encode every column of `table` as one chunk; returns the chunk table."""
    from .common import retain_malloc_arena

    retain_malloc_arena()  # idempotent; see common.py (buffer-reuse scaling)
    drop = [c for c in ("__part",) if c in table.column_names]
    if drop:
        part = int(table["__part"][0].as_py())
        table = table.drop_columns(drop)
    shas = [column_sha256(table[c]) for c in table.column_names]
    chunk_id = hashlib.sha256("|".join(shas).encode()).hexdigest()[:20]
    rows = {k: [] for k in META_COLS + ["blob"]}
    for name, sha in zip(table.column_names, shas):
        col = table[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if (
            pa.types.is_list(col.type)
            or pa.types.is_large_list(col.type)
            or pa.types.is_struct(col.type)
            or pa.types.is_map(col.type)
        ):
            from ..chunk import encode_any_chunk

            row = encode_any_chunk(col, cfg)
            # reference floor for nested: its default policy is PLAIN+snappy
            # over the value stream; approximate with snappy(raw buffers)
            ref = len(
                pa.Codec("snappy").compress(
                    b"".join(bytes(b) for b in col.buffers() if b is not None),
                    asbytes=True,
                )
            )
            rows["chunk_id"].append(chunk_id)
            rows["part"].append(part)
            rows["column"].append(name)
            rows["codec"].append(row["codec"])
            rows["outer"].append(row["outer"])
            rows["rows"].append(row["rows"])
            rows["nulls"].append(row["nulls"])
            rows["raw_bytes"].append(row["raw_bytes"])
            rows["enc_bytes"].append(row["enc_bytes"])
            rows["ref_bytes"].append(max(ref, 1))
            rows["sha256"].append(sha)
            rows["blob"].append(row["blob"])
            continue
        values = col.drop_null() if col.null_count else col
        codec, outer, stats = select_codec(values, cfg, column=name)
        # sha already computed above for the chunk id — don't recompute per row
        row = encode_column_chunk(
            col, codec, outer, cfg, precomputed=stats.get("full_payload"),
            sha=sha if cfg.verify_sha256 else "",
        )
        ref_bytes = None
        if cfg.enforce_reference_floor:
            # actual reference-policy size on the full chunk: the floor
            # candidates are cheap (snappy ~GB/s, arrow dict encode is C++)
            best_ref = None
            for rcodec, router in REFERENCE_POLICY:
                if rcodec == "dict_rle":
                    # skip the dict floor trial for high-cardinality columns;
                    # under global planning stats is {} -> measure cheaply on
                    # a slice instead of always paying a full dict encode
                    cr = stats.get("card_ratio")
                    if cr is None:
                        import pyarrow.compute as pc

                        sample = values.slice(0, min(len(values), 2048))
                        cr = pc.count_distinct(sample).as_py() / max(len(sample), 1)
                    if cr > 0.9:
                        continue
                try:
                    # sha="" — the row's sha256 field comes from the
                    # precomputed chunk-id hash below, never from a trial
                    rrow = encode_column_chunk(col, rcodec, router, cfg, sha="")
                except Exception:
                    continue
                if best_ref is None or rrow["enc_bytes"] < best_ref["enc_bytes"]:
                    best_ref = rrow
            forced = name in (cfg.per_column_codec or {})
            if best_ref is not None:
                ref_bytes = best_ref["enc_bytes"]
                # the <=-reference guarantee applies to AUTO-selected codecs;
                # an explicit per-column override is honored as-is
                if not forced and best_ref["enc_bytes"] < row["enc_bytes"]:
                    row = best_ref
        rows["chunk_id"].append(chunk_id)
        rows["part"].append(part)
        rows["column"].append(name)
        rows["codec"].append(row["codec"])
        rows["outer"].append(row["outer"])
        rows["rows"].append(row["rows"])
        rows["nulls"].append(row["nulls"])
        rows["raw_bytes"].append(row["raw_bytes"])
        rows["enc_bytes"].append(row["enc_bytes"])
        rows["ref_bytes"].append(ref_bytes if ref_bytes is not None else row["enc_bytes"])
        rows["sha256"].append(sha)
        rows["blob"].append(row["blob"])
    return pa.table(
        {
            "chunk_id": pa.array(rows["chunk_id"], pa.string()),
            "part": pa.array(rows["part"], pa.int64()),
            "column": pa.array(rows["column"], pa.string()),
            "codec": pa.array(rows["codec"], pa.string()),
            "outer": pa.array(rows["outer"], pa.string()),
            "rows": pa.array(rows["rows"], pa.int64()),
            "nulls": pa.array(rows["nulls"], pa.int64()),
            "raw_bytes": pa.array(rows["raw_bytes"], pa.int64()),
            "enc_bytes": pa.array(rows["enc_bytes"], pa.int64()),
            "ref_bytes": pa.array(rows["ref_bytes"], pa.int64()),
            "sha256": pa.array(rows["sha256"], pa.string()),
            "blob": pa.array(rows["blob"], pa.large_binary()),
        }
    )


class ChunkEncoder:
    """Actor-pool stage: holds config + warmed scratch (malloc arenas, codec
    tables) across batches; setup once per actor (__init__), work per batch."""

    def __init__(self, cfg: EngineConfig = DEFAULT):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        return encode_table(batch, self.cfg)


class ChunkDecoder:
    """Row-wise chunk decode -> verification rows (sha match, sizes).

    Each chunk-table row is independently decodable, so verification needs no
    grouping/shuffle at all."""

    def __init__(self, recompute_sha: bool = True):
        from .common import retain_malloc_arena

        retain_malloc_arena()
        self.recompute_sha = recompute_sha

    def __call__(self, batch: pa.Table) -> pa.Table:
        ok = []
        for i in range(batch.num_rows):
            blob = batch["blob"][i].as_py()
            arr = decode_column_chunk(blob)
            good = len(arr) == batch["rows"][i].as_py()
            if self.recompute_sha:
                good = good and column_sha256(arr) == batch["sha256"][i].as_py()
            ok.append(good)
        return pa.table(
            {
                "chunk_id": batch["chunk_id"],
                "column": batch["column"],
                "codec": batch["codec"],
                "rows": batch["rows"],
                "raw_bytes": batch["raw_bytes"],
                "enc_bytes": batch["enc_bytes"],
                "ok": pa.array(ok, pa.bool_()),
            }
        )


def reassemble_chunk(group: pa.Table) -> pa.Table:
    """chunk-table rows of ONE chunk_id -> the original columns."""
    cols = {}
    n = None
    for i in range(group.num_rows):
        name = group["column"][i].as_py()
        arr = decode_column_chunk(group["blob"][i].as_py())
        cols[name] = arr
        n = len(arr)
    return pa.table(cols)


def reassemble_blocks(batch: pa.Table) -> pa.Table:
    """Within-block reassembly: encode_table emits every column row of a
    chunk in the same block, so regrouping needs NO shuffle — split the batch
    into chunk_id runs and reassemble each (pass batch_size=None so blocks
    arrive whole)."""
    import numpy as np

    if batch.num_rows == 0:
        return pa.table({})
    ids = batch["chunk_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    sorted_ids = ids[order]
    bounds = np.flatnonzero(sorted_ids[1:] != sorted_ids[:-1]) + 1
    parts = []
    colsets = set()
    for run in np.split(order, bounds):
        t = reassemble_chunk(batch.take(pa.array(run, pa.int64())))
        colsets.add(tuple(sorted(t.column_names)))
        parts.append(t)
    if len(colsets) > 1:
        # a chunk's column rows were split across blocks — reassembling the
        # fragments would silently union mismatched schemas
        raise ValueError(
            f"chunk rows not co-located within blocks (saw column sets {colsets}); "
            "read chunk tables with one block per file"
        )
    return pa.concat_tables(parts)
