"""Native PAR1 parquet file writer/reader over the engine's own codecs.

The interop proof the chunk container can't give: pages this engine encodes
(PLAIN, RLE_DICTIONARY, DELTA_BINARY_PACKED, DELTA_LENGTH_BYTE_ARRAY,
DELTA_BYTE_ARRAY, BYTE_STREAM_SPLIT) are written into a real parquet file —
``PAR1`` magic, thrift-compact page headers and footer — that DuckDB and
pyarrow read directly; and foreign (pyarrow-written) parquet pages are
decoded through the engine's own decoders.

File assembly mirrors the reference's writer/reader
(write: writer/writer.go:142-225 footer+magic, layout/page.go:219-281 page
framing; read: reader/reader.go:148-176 footer, layout/page.go:721-937 page
parse) re-expressed over numpy/Arrow kernels.

Scope: flat schemas (no nesting — nested data uses the engine's own chunk
container), types bool/int32/int64/float/double/string/binary/date32/
timestamp, v1 and v2 data pages on read, v1 on write, optional columns via
definition levels.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..bits import bit_width
from ..codecs.bss import decode_bss, encode_bss
from ..codecs.delta import (
    decode_delta_ba,
    decode_delta_length_ba,
    delta_bp_decode_np,
    delta_bp_encode_np,
    encode_delta_ba,
    encode_delta_length_ba,
)
from ..codecs.plain import decode_plain, encode_plain
from ..codecs.rle import decode_hybrid, decode_levels, encode_hybrid, encode_levels
from .parquet_meta import (
    COMP_GZIP,
    COMP_LZ4_RAW,
    COMP_SNAPPY,
    COMP_UNCOMPRESSED,
    COMP_ZSTD,
    CONV_DATE,
    CONV_TIMESTAMP_MICROS,
    CONV_TIMESTAMP_MILLIS,
    CONV_UTF8,
    ENC_BYTE_STREAM_SPLIT,
    ENC_DELTA_BINARY_PACKED,
    ENC_DELTA_BYTE_ARRAY,
    ENC_DELTA_LENGTH_BYTE_ARRAY,
    ENC_PLAIN,
    ENC_PLAIN_DICTIONARY,
    ENC_RLE,
    ENC_RLE_DICTIONARY,
    PAGE_DATA,
    PAGE_DATA_V2,
    PAGE_DICTIONARY,
    PT_BOOLEAN,
    PT_BYTE_ARRAY,
    PT_DOUBLE,
    PT_FLBA,
    PT_FLOAT,
    PT_INT32,
    PT_INT64,
    REP_OPTIONAL,
    REP_REQUIRED,
    SPECS,
)
from .thrift_compact import CompactReader, CompactWriter

MAGIC = b"PAR1"

_COMP_NAME = {
    "none": COMP_UNCOMPRESSED,
    "snappy": COMP_SNAPPY,
    "gzip": COMP_GZIP,
    "zstd": COMP_ZSTD,
    "lz4_raw": COMP_LZ4_RAW,
}
_COMP_ARROW = {
    COMP_SNAPPY: "snappy",
    COMP_GZIP: "gzip",
    COMP_ZSTD: "zstd",
    COMP_LZ4_RAW: "lz4_raw",
}


def _compress(body: bytes, comp: int) -> bytes:
    if comp == COMP_UNCOMPRESSED:
        return body
    return pa.Codec(_COMP_ARROW[comp]).compress(body, asbytes=True)


def _decompress(body: bytes, comp: int, raw_len: int) -> bytes:
    if comp == COMP_UNCOMPRESSED:
        return body
    return pa.Codec(_COMP_ARROW[comp]).decompress(body, raw_len, asbytes=True)


# -- type mapping -------------------------------------------------------------


def _physical(t: pa.DataType) -> tuple[int, int | None, dict | None, pa.DataType]:
    """arrow type -> (physical, converted_type, logicalType, storage arrow type)."""
    if pa.types.is_boolean(t):
        return PT_BOOLEAN, None, None, pa.bool_()
    if pa.types.is_int32(t):
        return PT_INT32, None, None, pa.int32()
    if pa.types.is_int64(t):
        return PT_INT64, None, None, pa.int64()
    if pa.types.is_float32(t):
        return PT_FLOAT, None, None, pa.float32()
    if pa.types.is_float64(t):
        return PT_DOUBLE, None, None, pa.float64()
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return PT_BYTE_ARRAY, CONV_UTF8, {"STRING": {}}, pa.string()
    if pa.types.is_fixed_size_binary(t):
        # FIXED_LEN_BYTE_ARRAY (reference: types/types.go:11-78 maps it to a
        # length-tagged string); plain encoding = raw concatenated bytes
        return PT_FLBA, None, None, t
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return PT_BYTE_ARRAY, None, None, pa.binary()
    if pa.types.is_date32(t):
        return PT_INT32, CONV_DATE, {"DATE": {}}, pa.int32()
    if pa.types.is_timestamp(t):
        unit = t.unit
        if unit == "ms":
            conv, lt_unit = CONV_TIMESTAMP_MILLIS, {"MILLIS": {}}
        else:
            conv, lt_unit = CONV_TIMESTAMP_MICROS, {"MICROS": {}}
        lt = {"TIMESTAMP": {"isAdjustedToUTC": t.tz is not None, "unit": lt_unit}}
        return PT_INT64, conv, lt, pa.int64()
    raise NotImplementedError(f"PAR1 writer: unsupported type {t} (flat types only)")


def _logical_type(elem: dict) -> pa.DataType:
    """SchemaElement -> arrow type (reader side)."""
    pt = elem["type"]
    conv = elem.get("converted_type")
    lt = elem.get("logicalType") or {}
    if pt == PT_BOOLEAN:
        return pa.bool_()
    if pt == PT_INT32:
        if conv == CONV_DATE:
            return pa.date32()
        if conv in (15, 16, 17):  # INT_8/16/32
            return {15: pa.int8(), 16: pa.int16(), 17: pa.int32()}[conv]
        if conv in (11, 12, 13):  # UINT_8/16/32
            return {11: pa.uint8(), 12: pa.uint16(), 13: pa.uint32()}[conv]
        return pa.int32()
    if pt == PT_INT64:
        ts = lt.get("TIMESTAMP")
        if ts is not None:
            unit = "ms" if "MILLIS" in ts.get("unit", {}) else (
                "ns" if "NANOS" in ts.get("unit", {}) else "us"
            )
            tz = "UTC" if ts.get("isAdjustedToUTC") else None
            return pa.timestamp(unit, tz=tz)
        if conv == CONV_TIMESTAMP_MILLIS:
            return pa.timestamp("ms")
        if conv == CONV_TIMESTAMP_MICROS:
            return pa.timestamp("us")
        if conv == 14:  # UINT_64
            return pa.uint64()
        return pa.int64()
    if pt == PT_FLOAT:
        return pa.float32()
    if pt == PT_DOUBLE:
        return pa.float64()
    if pt == PT_BYTE_ARRAY:
        if conv == CONV_UTF8 or "STRING" in lt:
            return pa.string()
        return pa.binary()
    if pt == PT_FLBA:
        return pa.binary(elem.get("type_length", 0))
    raise NotImplementedError(f"PAR1 reader: unsupported physical type {pt}")


# -- writer -------------------------------------------------------------------


def _default_encoding(arr: pa.Array, t: pa.DataType) -> str:
    if pa.types.is_boolean(t):
        return "plain"
    n = max(len(arr), 1)
    card = pc.count_distinct(arr).as_py() / n if len(arr) else 1.0
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t):
        return "dict" if card < 0.6 else "delta_length_ba"
    if pa.types.is_integer(t) or pa.types.is_date32(t) or pa.types.is_timestamp(t):
        return "dict" if card < 0.05 else "delta_bp"
    if pa.types.is_fixed_size_binary(t):
        return "dict" if card < 0.6 else "plain"
    return "byte_stream_split"  # floats


_ENC_ID = {
    "plain": ENC_PLAIN,
    "delta_bp": ENC_DELTA_BINARY_PACKED,
    "delta_length_ba": ENC_DELTA_LENGTH_BYTE_ARRAY,
    "delta_ba": ENC_DELTA_BYTE_ARRAY,
    "byte_stream_split": ENC_BYTE_STREAM_SPLIT,
    "dict": ENC_RLE_DICTIONARY,
}


def _encode_values(enc: str, arr: pa.Array) -> bytes:
    if enc == "plain":
        return encode_plain(arr)[0]
    if enc == "delta_bp":
        return delta_bp_encode_np(np.asarray(arr).astype(np.int64, copy=False))
    if enc == "delta_length_ba":
        return encode_delta_length_ba(arr)[0]
    if enc == "delta_ba":
        return encode_delta_ba(arr)[0]
    if enc == "byte_stream_split":
        return encode_bss(arr)[0]
    raise ValueError(enc)


def _write_page(out, writer_specs, page_type: int, header_struct: dict, payload: bytes, comp: int):
    body = _compress(payload, comp)
    w = CompactWriter(writer_specs)
    hdr = {
        "type": page_type,
        "uncompressed_page_size": len(payload),
        "compressed_page_size": len(body),
    }
    hdr.update(header_struct)
    w.write_struct("PageHeader", hdr)
    out.write(bytes(w.out))
    out.write(body)
    return len(w.out) + len(payload), len(w.out) + len(body)


def write_par1(
    table: pa.Table,
    path: str,
    codec: str = "snappy",
    encodings: dict[str, str] | None = None,
    row_group_rows: int | None = None,
    page_rows: int = 65536,
) -> dict:
    """Write `table` as a real parquet file through the engine's encoders.

    `encodings`: column -> one of plain/delta_bp/delta_length_ba/delta_ba/
    byte_stream_split/dict; unspecified columns get a light auto policy.
    Returns the footer dict (for tests/metrics)."""
    comp = _COMP_NAME[codec]
    encodings = encodings or {}
    names = table.column_names
    schema_elems = [{"name": "schema", "num_children": len(names)}]
    col_phys = {}
    for name in names:
        t = table.schema.field(name).type
        pt, conv, lt, storage = _physical(t)
        col_phys[name] = (pt, storage)
        elem = {
            "type": pt,
            "repetition_type": REP_OPTIONAL,
            "name": name,
            "converted_type": conv,
            "logicalType": lt,
        }
        if pt == PT_FLBA:
            elem["type_length"] = storage.byte_width
        schema_elems.append(elem)

    rg_rows = row_group_rows or table.num_rows or 1
    row_groups = []
    with open(path, "wb") as out:
        out.write(MAGIC)
        for lo in range(0, table.num_rows, rg_rows) if table.num_rows else []:
            rg = table.slice(lo, rg_rows)
            chunks_meta = []
            rg_unc = rg_comp = 0
            for name in names:
                pt, storage = col_phys[name]
                col = rg[name]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                col = col.cast(storage)
                enc = encodings.get(name) or _default_encoding(col, table.schema.field(name).type)
                enc_id = _ENC_ID[enc]
                first_off = out.tell()
                dict_off = None
                chunk_unc = chunk_comp = 0
                dict_vals = idx_np = None
                if enc == "dict":
                    denc = col.drop_null().dictionary_encode()
                    if isinstance(denc, pa.ChunkedArray):
                        denc = denc.combine_chunks()
                    dict_vals = denc.dictionary
                    idx_np = denc.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
                    dict_off = out.tell()
                    u, c = _write_page(
                        out,
                        SPECS,
                        PAGE_DICTIONARY,
                        {
                            "dictionary_page_header": {
                                "num_values": len(dict_vals),
                                "encoding": ENC_PLAIN,
                            }
                        },
                        encode_plain(dict_vals)[0],
                        comp,
                    )
                    chunk_unc += u
                    chunk_comp += c
                data_off = out.tell()
                nn_cursor = 0  # non-null values consumed so far
                for plo in range(0, max(rg.num_rows, 1), page_rows):
                    page = col.slice(plo, page_rows)
                    if rg.num_rows and len(page) == 0:
                        break
                    present = np.ones(len(page), dtype=np.uint64)
                    if page.null_count:
                        present = page.is_valid().to_numpy(zero_copy_only=False).astype(np.uint64)
                    payload = encode_levels(present, 1)
                    nn = int(present.sum())
                    if enc == "dict":
                        w_bits = bit_width(max(len(dict_vals) - 1, 0))
                        payload += bytes([w_bits]) + encode_hybrid(
                            idx_np[nn_cursor : nn_cursor + nn], w_bits
                        )
                    else:
                        payload += _encode_values(enc, page.drop_null())
                    nn_cursor += nn
                    u, c = _write_page(
                        out,
                        SPECS,
                        PAGE_DATA,
                        {
                            "data_page_header": {
                                "num_values": len(page),
                                "encoding": enc_id,
                                "definition_level_encoding": ENC_RLE,
                                "repetition_level_encoding": ENC_RLE,
                            }
                        },
                        payload,
                        comp,
                    )
                    chunk_unc += u
                    chunk_comp += c
                enc_list = sorted({ENC_RLE, enc_id} | ({ENC_PLAIN} if enc == "dict" else set()))
                chunks_meta.append(
                    {
                        "file_offset": first_off,
                        "meta_data": {
                            "type": pt,
                            "encodings": enc_list,
                            "path_in_schema": [name],
                            "codec": comp,
                            "num_values": rg.num_rows,
                            "total_uncompressed_size": chunk_unc,
                            "total_compressed_size": chunk_comp,
                            "data_page_offset": data_off,
                            "dictionary_page_offset": dict_off,
                        },
                    }
                )
                rg_unc += chunk_unc
                rg_comp += chunk_comp
            row_groups.append(
                {
                    "columns": chunks_meta,
                    "total_byte_size": rg_unc,
                    "num_rows": rg.num_rows,
                    "file_offset": chunks_meta[0]["file_offset"],
                    "total_compressed_size": rg_comp,
                }
            )
        fmd = {
            "version": 1,
            "schema": schema_elems,
            "num_rows": table.num_rows,
            "row_groups": row_groups,
            "created_by": "parquet_go_ray",
        }
        w = CompactWriter(SPECS)
        w.write_struct("FileMetaData", fmd)
        out.write(bytes(w.out))
        out.write(len(w.out).to_bytes(4, "little"))
        out.write(MAGIC)
    return fmd


# -- reader -------------------------------------------------------------------


def read_par1_meta(path: str) -> dict:
    with open(path, "rb") as f:
        f.seek(0, 2)
        size = f.tell()
        f.seek(size - 8)
        tail = f.read(8)
        if tail[4:] != MAGIC:
            raise ValueError("not a parquet file (missing PAR1 magic)")
        flen = int.from_bytes(tail[:4], "little")
        f.seek(size - 8 - flen)
        footer = f.read(flen)
    fmd, _ = CompactReader(SPECS, footer).read_struct("FileMetaData")
    return fmd


def _decode_value_bytes(
    enc: int, buf: bytes, nn: int, pt: int, atype: pa.DataType, dict_vals
) -> pa.Array:
    if enc == ENC_PLAIN:
        meta = {"rows": nn}
        if pa.types.is_fixed_size_binary(atype):
            meta["width"] = atype.byte_width
        return decode_plain(buf, meta, atype)
    if enc in (ENC_RLE_DICTIONARY, ENC_PLAIN_DICTIONARY):
        if dict_vals is None:
            raise ValueError("dictionary-encoded page without a dictionary page")
        w = buf[0]
        idx, _ = decode_hybrid(buf, w, nn, 1) if nn else (np.empty(0, np.uint64), 0)
        return dict_vals.take(pa.array(idx.astype(np.int64)))
    if enc == ENC_DELTA_BINARY_PACKED:
        v, _ = delta_bp_decode_np(buf)
        return pa.array(v.astype(atype.to_pandas_dtype(), copy=False), type=atype)
    if enc == ENC_DELTA_LENGTH_BYTE_ARRAY:
        return decode_delta_length_ba(buf, {"rows": nn}, atype)
    if enc == ENC_DELTA_BYTE_ARRAY:
        return decode_delta_ba(buf, {"rows": nn}, atype)
    if enc == ENC_BYTE_STREAM_SPLIT:
        return decode_bss(buf, {"rows": nn, "k": atype.bit_width // 8}, atype)
    if enc == ENC_RLE:  # boolean values as RLE hybrid (u32-length-prefixed)
        vals, _ = decode_levels(buf, 1, nn)
        return pa.array(vals.astype(bool))
    raise NotImplementedError(f"PAR1 reader: encoding {enc}")


def _with_validity(values: pa.Array, present: np.ndarray) -> pa.Array:
    if present.all():
        return values
    pos = np.cumsum(present) - 1
    idx = pa.array(pos.astype(np.int64), mask=~present.astype(bool))
    return values.take(idx)


def read_par1_chunk(f, chunk: dict, storage: pa.DataType, optional: bool) -> pa.Array:
    """Decode one column chunk from an open file through the engine decoders
    (page walk mirrors reference layout/page.go:721-937 / chunk read
    reader/columnbuffer.go:105-156)."""
    md = chunk["meta_data"]
    start = md.get("dictionary_page_offset")
    if start is None or start > md["data_page_offset"]:
        start = md["data_page_offset"]
    f.seek(start)
    buf = f.read(md["total_compressed_size"])
    comp = md["codec"]
    pos = 0
    rdr = CompactReader(SPECS, buf)
    dict_vals = None
    parts = []
    rows_done = 0
    while rows_done < md["num_values"]:
        hdr, pos = rdr.read_struct("PageHeader", pos)
        body = buf[pos : pos + hdr["compressed_page_size"]]
        pos += hdr["compressed_page_size"]
        if hdr["type"] == PAGE_DICTIONARY:
            raw = _decompress(body, comp, hdr["uncompressed_page_size"])
            dph = hdr["dictionary_page_header"]
            if dph["encoding"] not in (ENC_PLAIN, ENC_PLAIN_DICTIONARY):
                raise NotImplementedError("non-PLAIN dictionary page")
            dict_vals = decode_plain(raw, {"rows": dph["num_values"]}, storage)
            continue
        if hdr["type"] == PAGE_DATA:
            raw = _decompress(body, comp, hdr["uncompressed_page_size"])
            dph = hdr["data_page_header"]
            n = dph["num_values"]
            vpos = 0
            present = np.ones(n, dtype=np.uint64)
            if optional:
                present, vpos = decode_levels(raw, 1, n)
            nn = int(present.sum())
            values = _decode_value_bytes(
                dph["encoding"], raw[vpos:], nn, None, storage, dict_vals
            )
            parts.append(_with_validity(values, present.astype(np.int64)))
            rows_done += n
            continue
        if hdr["type"] == PAGE_DATA_V2:
            dph = hdr["data_page_header_v2"]
            n = dph["num_values"]
            dl_len = dph.get("definition_levels_byte_length", 0)
            rl_len = dph.get("repetition_levels_byte_length", 0)
            if rl_len:
                raise NotImplementedError("repetition levels (nested) in PAR1 reader")
            levels = body[:dl_len]
            vals_body = body[dl_len:]
            if dph.get("is_compressed", True):
                vals_body = _decompress(
                    vals_body, comp, hdr["uncompressed_page_size"] - dl_len
                )
            present = np.ones(n, dtype=np.uint64)
            if optional and dl_len:
                # v2 levels are the raw hybrid stream, no u32 prefix
                present, _ = decode_hybrid(levels, 1, n)
            nn = n - dph.get("num_nulls", 0)
            values = _decode_value_bytes(
                dph["encoding"], vals_body, nn, None, storage, dict_vals
            )
            parts.append(_with_validity(values, present.astype(np.int64)))
            rows_done += n
            continue
        # index or unknown page: skip
    if not parts:
        return pa.nulls(0, storage)
    if len(parts) == 1:
        return parts[0]
    return pa.concat_arrays([p.combine_chunks() if isinstance(p, pa.ChunkedArray) else p for p in parts])


def _leaf_elems(fmd: dict) -> list[dict]:
    schema = fmd["schema"]
    root_children = schema[0].get("num_children") or 0
    leaves = []
    i = 1
    for _ in range(root_children):
        elem = schema[i]
        if elem.get("num_children"):
            raise NotImplementedError(
                "PAR1 reader: nested schemas unsupported (engine chunk container covers nesting)"
            )
        leaves.append(elem)
        i += 1
    return leaves


def read_par1(
    path: str, columns: list[str] | None = None, row_groups: list[int] | None = None
) -> pa.Table:
    """Read a flat parquet file (ours or a foreign writer's) entirely through
    the engine's page decoders."""
    fmd = read_par1_meta(path)
    leaves = _leaf_elems(fmd)
    want = [l["name"] for l in leaves if columns is None or l["name"] in columns]
    by_name = {l["name"]: l for l in leaves}
    groups = fmd["row_groups"]
    if row_groups is not None:
        groups = [groups[i] for i in row_groups]
    cols: dict[str, list[pa.Array]] = {n: [] for n in want}
    with open(path, "rb") as f:
        for rg in groups:
            chunk_by_name = {c["meta_data"]["path_in_schema"][0]: c for c in rg["columns"]}
            for name in want:
                elem = by_name[name]
                atype = _logical_type(elem)
                pt, _, _, storage = _physical(atype)
                optional = elem.get("repetition_type", REP_REQUIRED) == REP_OPTIONAL
                arr = read_par1_chunk(f, chunk_by_name[name], storage, optional)
                cols[name].append(arr.cast(atype) if storage != atype else arr)
    out = {}
    for name in want:
        atype = _logical_type(by_name[name])
        arrs = cols[name]
        out[name] = pa.chunked_array(arrs, type=atype) if arrs else pa.chunked_array([], type=atype)
    return pa.table(out)
