"""parquet-tools equivalents (reference: tool/parquet-tools/parquet-tools.go:
26-145 — schema / rowcount / size / cat subcommands) over both plain parquet
files and our encoded chunk directories."""

from __future__ import annotations

import json
import os
import sys

import pyarrow.parquet as pq


def schema(path: str) -> list[dict]:
    """schematool analog (tool/parquet-tools/schematool)."""
    s = pq.read_schema(path)
    return [{"name": n, "type": str(s.field(n).type), "nullable": s.field(n).nullable} for n in s.names]


def rowcount(path: str) -> int:
    return pq.read_metadata(path).num_rows


def size(path: str) -> dict:
    """sizetool analog (tool/parquet-tools/sizetool/sizetool.go:23-39):
    compressed + uncompressed byte totals from footer metadata."""
    md = pq.read_metadata(path)
    comp = unc = 0
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for c in range(g.num_columns):
            col = g.column(c)
            unc += col.total_uncompressed_size
            comp += col.total_compressed_size
    return {"compressed_bytes": comp, "uncompressed_bytes": unc}


def cat(path: str, limit: int = 10, skip: int = 0) -> list[dict]:
    """cat analog with SkipRows semantics (reference: reader/reader.go:178-222)
    — row-group/offset skipping happens in the parquet reader, not by
    decoding discarded rows."""
    t = pq.read_table(path)
    return t.slice(skip, limit).to_pylist()


def chunk_dir_size(out_dir: str) -> dict:
    """size over an encoded chunk directory (our format)."""
    from .state import lineage as lin

    return lin.collect_manifest(out_dir)


def chunk_cat(out_dir: str, column: str, limit: int = 10, skip: int = 0) -> list:
    """cat over an encoded chunk directory: decode rows [skip, skip+limit) of
    `column` — whole chunks before the offset are skipped undecompressed
    (SkipRows over OUR format, not parquet)."""
    import pyarrow.parquet as pq

    from .chunk import decode_column_chunk
    from .state import lineage as lin

    out = []
    remaining_skip, remaining = skip, limit
    for part in sorted(lin.done_parts(out_dir)):
        path = f"{lin.part_dir(out_dir, part)}/chunks.parquet"
        # metadata-only first pass: pick the FEW chunk rows the window
        # touches, then fetch ONLY those rows' blobs (a blanket blob-column
        # read would load every payload in the part — including wholly
        # skipped chunks — just to cat a handful of rows)
        meta = pq.read_table(path, columns=["column", "rows"])
        need: list[tuple[int, int, int]] = []  # (row index, offset, count)
        rs, rm = remaining_skip, remaining
        for i in range(meta.num_rows):
            if meta["column"][i].as_py() != column:
                continue
            n = meta["rows"][i].as_py()
            if rs >= n:
                rs -= n  # skipped: blob never read at all
                continue
            take = min(n - rs, rm)
            need.append((i, rs, take))
            rs = 0
            rm -= take
            if rm <= 0:
                break
        if need:
            pf = pq.ParquetFile(path)
            rows_seen = 0
            want = {i: (off, cnt) for i, off, cnt in need}
            max_row = max(want) + 1
            for b in pf.iter_batches(columns=["blob"]):
                for j in range(b.num_rows):
                    ridx = rows_seen + j
                    if ridx in want:
                        off, cnt = want[ridx]
                        arr = decode_column_chunk(
                            b["blob"][j].as_py(), row_offset=off, row_count=cnt
                        )
                        out.extend(arr.to_pylist())
                rows_seen += b.num_rows
                if rows_seen >= max_row:
                    break  # later blobs never leave disk
        remaining_skip, remaining = rs, rm
        if remaining <= 0:
            return out
    return out


_ENC_NAMES = {
    0: "PLAIN", 2: "PLAIN_DICTIONARY", 3: "RLE", 4: "BIT_PACKED",
    5: "DELTA_BINARY_PACKED", 6: "DELTA_LENGTH_BYTE_ARRAY",
    7: "DELTA_BYTE_ARRAY", 8: "RLE_DICTIONARY", 9: "BYTE_STREAM_SPLIT",
}
_COMP_NAMES = {0: "UNCOMPRESSED", 1: "SNAPPY", 2: "GZIP", 3: "LZO",
               4: "BROTLI", 5: "LZ4", 6: "ZSTD", 7: "LZ4_RAW"}


def meta(path: str) -> dict:
    """Footer inspection through the ENGINE's own thrift reader (not
    pyarrow): per-chunk codec/encodings/sizes and which auxiliary
    structures are present (Statistics, ColumnIndex/OffsetIndex with page
    count, spec bloom filter).  parquet-tools has no equivalent; this is
    the debugging surface for engine-written PAR1 files."""
    from .formats.par1 import read_par1_meta

    fmd = read_par1_meta(path)
    rgs = []
    for rg in fmd["row_groups"]:
        cols = []
        for ch in rg["columns"]:
            md = ch["meta_data"]
            cols.append(
                {
                    "column": ".".join(md["path_in_schema"]),
                    "codec": _COMP_NAMES.get(md["codec"], md["codec"]),
                    "encodings": [
                        _ENC_NAMES.get(e, e) for e in md.get("encodings", [])
                    ],
                    "compressed_bytes": md["total_compressed_size"],
                    "uncompressed_bytes": md["total_uncompressed_size"],
                    "has_statistics": md.get("statistics") is not None,
                    "has_dictionary_page": md.get("dictionary_page_offset") is not None,
                    "has_page_index": ch.get("column_index_offset") is not None
                    and ch.get("offset_index_offset") is not None,
                    "has_bloom": md.get("bloom_filter_offset") is not None,
                }
            )
        rgs.append({"rows": rg["num_rows"], "columns": cols})
    return {
        "created_by": fmd.get("created_by"),
        "version": fmd.get("version"),
        "num_rows": fmd["num_rows"],
        "row_groups": rgs,
    }


def main(argv=None):
    argv = argv or sys.argv[1:]
    cmd, path = argv[0], argv[1]
    opts = argv[2:]
    if cmd == "schema":
        out = schema(path)
    elif cmd == "meta":
        out = meta(path)
    elif cmd == "rowcount":
        out = rowcount(path)
    elif cmd == "size":
        out = size(path)
    elif cmd == "cat":
        out = cat(path, limit=int(opts[0]) if opts else 10, skip=int(opts[1]) if len(opts) > 1 else 0)
    elif cmd == "chunkdir":
        out = chunk_dir_size(path)
    elif cmd == "chunkcat":
        out = chunk_cat(path, opts[0], limit=int(opts[1]) if len(opts) > 1 else 10,
                        skip=int(opts[2]) if len(opts) > 2 else 0)
    elif cmd == "manifest":
        # summarize (or build with "manifest <dir> build") a dataset manifest
        from .formats.par1 import read_par1
        from .pipelines.native_io import MANIFEST_NAME, build_par1_manifest

        mpath = os.path.join(path, MANIFEST_NAME)
        if "build" in opts or not os.path.exists(mpath):
            import ray

            if not ray.is_initialized():
                ray.init(address="local", include_dashboard=False)
            mpath = build_par1_manifest(path)
        mt = read_par1(mpath, columns=["path", "partition", "rows", "bytes"])
        parts: dict[str, dict] = {}
        for pt, r, b in zip(
            mt["partition"].to_pylist(), mt["rows"].to_pylist(), mt["bytes"].to_pylist()
        ):
            e = parts.setdefault(pt or ".", {"files": 0, "rows": 0, "bytes": 0})
            e["files"] += 1
            e["rows"] += r
            e["bytes"] += b
        out = {
            "manifest": mpath,
            "files": mt.num_rows,
            "rows": sum(mt["rows"].to_pylist()),
            "bytes": sum(mt["bytes"].to_pylist()),
            "partitions": parts,
        }
    elif cmd == "fsck":
        # distributed integrity sweep over a native dataset directory
        import ray

        from .pipelines.native_io import validate_par1_dataset

        if not ray.is_initialized():
            ray.init(address="local", include_dashboard=False)
        df = validate_par1_dataset(path).to_pandas()
        out = {
            "files": int(len(df)),
            "ok": int(df.ok.sum()),
            "bad": [
                {"path": r.path, "error": r.error}
                for r in df[~df.ok].itertuples()
            ],
        }
    else:
        raise SystemExit(f"unknown subcommand {cmd}")
    print(json.dumps(out, indent=1, default=str))


if __name__ == "__main__":
    main()
