"""Round-trip query helpers: read -> encode -> decode -> reassembled table.

These drive the correctness gate: the decoded output must hash-match a plain
``SELECT`` of the same columns (bit-identical values incl. validity), the
pipeline-scale analog of the reference's encode/decode round-trip tests
(encoding/encodingread_test.go, writer/writer_test.go)."""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from ..sources.io import read_parquet_any as _read_parquet_any

from ..config import EngineConfig
from ..stages.encode import reassemble_blocks
from .encode_pipeline import encode_dataset


def roundtrip_table(
    sf_dir: str,
    table: str,
    columns: list[str] | None = None,
    codec_map: dict | None = None,
    cfg: EngineConfig | None = None,
) -> rd.Dataset:
    """read_parquet -> chunk-encode -> decode -> original columns."""
    cfg = cfg or EngineConfig()
    if codec_map:
        import dataclasses

        # never mutate the CALLER's cfg: a shared EngineConfig reused for a
        # later call would silently inherit this run's per-column codecs
        cfg = dataclasses.replace(cfg, per_column_codec=dict(codec_map))
    ds = _read_parquet_any(f"{sf_dir}/{table}.parquet", columns=columns)
    chunks = encode_dataset(ds, cfg)
    # no shuffle: encode emits all of a chunk's column rows in one block, so
    # within-block regrouping reunites them (VERDICT r1 #10)
    return chunks.map_batches(reassemble_blocks, batch_format="pyarrow", batch_size=None)


def encode_stats(
    sf_dir: str, table: str, columns: list[str] | None = None, cfg: EngineConfig | None = None
) -> rd.Dataset:
    """sizetool analog (reference: tool/parquet-tools/sizetool/sizetool.go:9-39):
    per-chunk codec choice + raw/encoded byte sizes."""
    cfg = cfg or EngineConfig()
    ds = _read_parquet_any(f"{sf_dir}/{table}.parquet", columns=columns)
    chunks = encode_dataset(ds, cfg)
    return chunks.drop_columns(["blob"])


def roundtrip_struct(sf_dir: str, cfg: EngineConfig | None = None) -> rd.Dataset:
    """Nested STRUCT round-trip over real data: pack orders columns into one
    struct column, chunk-encode (struct = per-field child chunks + validity
    levels, the marshal/marshal.go:69-147 Dremel analog), decode, unpack back
    to flat columns so the driver's plain-SELECT oracle hash-checks it."""
    cfg = cfg or EngineConfig()
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"]
    ds = _read_parquet_any(f"{sf_dir}/orders.parquet", columns=cols)

    def pack(b: pa.Table) -> pa.Table:
        arrays = [
            b[c].combine_chunks() if isinstance(b[c], pa.ChunkedArray) else b[c] for c in cols
        ]
        return pa.table({"s": pa.StructArray.from_arrays(arrays, names=cols)})

    chunks = encode_dataset(ds.map_batches(pack, batch_format="pyarrow"), cfg)
    out = chunks.map_batches(reassemble_blocks, batch_format="pyarrow", batch_size=None)

    def unpack(b: pa.Table) -> pa.Table:
        s = b["s"]
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        return pa.table({c: s.field(c) for c in cols})

    return out.map_batches(unpack, batch_format="pyarrow")


def roundtrip_map(sf_dir: str, cfg: EngineConfig | None = None) -> rd.Dataset:
    """Nested MAP round-trip over real data: one {lang: n_chars} entry per
    document (MAP = repeated group<key,value>, schema/schemahandler.go:343-386
    analog), encode + decode, then unnest back to flat columns."""
    cfg = cfg or EngineConfig()
    ds = _read_parquet_any(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"])

    def pack(b: pa.Table) -> pa.Table:
        n = b.num_rows
        offsets = pa.array(range(n + 1), pa.int32())
        keys = b["lang"].combine_chunks() if isinstance(b["lang"], pa.ChunkedArray) else b["lang"]
        items = (
            b["n_chars"].combine_chunks()
            if isinstance(b["n_chars"], pa.ChunkedArray)
            else b["n_chars"]
        )
        m = pa.MapArray.from_arrays(offsets, keys, items)
        return pa.table({"doc_id": b["doc_id"], "m": m})

    chunks = encode_dataset(ds.map_batches(pack, batch_format="pyarrow"), cfg)
    out = chunks.map_batches(reassemble_blocks, batch_format="pyarrow", batch_size=None)

    def unpack(b: pa.Table) -> pa.Table:
        m = b["m"]
        if isinstance(m, pa.ChunkedArray):
            m = m.combine_chunks()
        # one entry per row by construction: keys/items align with rows
        return pa.table({"doc_id": b["doc_id"], "lang": m.keys, "n_chars": m.items})

    return out.map_batches(unpack, batch_format="pyarrow")


def read_partial_struct(
    sf_dir: str, fields: list[str] | None = None, cfg: EngineConfig | None = None
) -> rd.Dataset:
    """ReadPartial analog (reader/reader.go:225-289): decode ONE subfield of
    an encoded struct column.  Sibling child chunks inside the struct blob
    are skipped by length without decompression (`_decode_struct_chunk`
    path walk), so a point projection never pays for the other fields."""
    from ..chunk import decode_column_chunk

    cfg = cfg or EngineConfig()
    fields = fields or ["o_totalprice"]
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"]

    def pack(b: pa.Table) -> pa.Table:
        arrays = [
            b[c].combine_chunks() if isinstance(b[c], pa.ChunkedArray) else b[c]
            for c in cols
        ]
        return pa.table({"s": pa.StructArray.from_arrays(arrays, names=cols)})

    ds = _read_parquet_any(f"{sf_dir}/orders.parquet", columns=cols)
    chunks = encode_dataset(ds.map_batches(pack, batch_format="pyarrow"), cfg)

    def project(batch: pa.Table) -> pa.Table:
        # chunk granularity: a handful of blob rows per batch, vectorized
        # decode inside each
        outs = {f: [] for f in fields}
        for blob in batch["blob"]:
            for f in fields:
                outs[f].append(decode_column_chunk(blob.as_py(), path=[f]))
        if not next(iter(outs.values()), []):
            # zero blob rows in this block: concat_arrays([]) would raise.
            # Null-typed empties unify with the real schema downstream.
            return pa.table({f: pa.nulls(0) for f in fields})
        return pa.table(
            {f: pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in v]) for f, v in outs.items()}
        )

    return chunks.map_batches(project, batch_format="pyarrow")
