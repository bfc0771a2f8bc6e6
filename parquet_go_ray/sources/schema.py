"""Schema declaration front-ends — the reference's two user-facing schema
grammars re-expressed for this engine:

  * tag strings   — "name=Id, type=INT64, encoding=DELTA_BINARY_PACKED,
                     compression=ZSTD, repetitiontype=OPTIONAL"
                    (common/common.go:76-291 key=value grammar)
  * JSON schema   — {"Tag": "name=root", "Fields": [{"Tag": "name=..."}, ...]}
                    (schema/json.go:21-157 shape)

Both produce (pyarrow schema, EngineConfig overrides): parquet physical +
converted types map to arrow types, ENCODING tags map to this engine's codec
registry, COMPRESSION tags to outer compressors.  Used by the CSV/JSON
ingestion front-ends so untyped sources get real types + forced codecs."""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import pyarrow as pa

from ..config import EngineConfig

_ENCODING_TO_CODEC = {
    "PLAIN": "plain",
    "RLE": "rle_bp",
    "BIT_PACKED": "rle_bp",
    "PLAIN_DICTIONARY": "dict_rle",
    "RLE_DICTIONARY": "dict_rle",
    "DELTA_BINARY_PACKED": "delta_bp",
    "DELTA_BYTE_ARRAY": "delta_ba",
    "DELTA_LENGTH_BYTE_ARRAY": "delta_length_ba",
    "BYTE_STREAM_SPLIT": "byte_stream_split",
    "FSST": "fsst",  # engine extension, not in parquet-format
}

_COMPRESSION_TO_OUTER = {
    "UNCOMPRESSED": "none",
    "SNAPPY": "snappy",
    "GZIP": "gzip",
    "ZSTD": "zstd",
    "LZ4": "lz4",
    "LZ4_RAW": "lz4",
}


def _arrow_type(type_name: str, converted: str | None, length: int | None,
                scale: int | None, precision: int | None) -> pa.DataType:
    t, c = type_name.upper(), (converted or "").upper()
    if t == "BOOLEAN":
        return pa.bool_()
    if t == "INT32":
        return {
            "DATE": pa.date32(),
            "TIME_MILLIS": pa.time32("ms"),
            "INT_8": pa.int8(),
            "INT_16": pa.int16(),
            "UINT_8": pa.uint8(),
            "UINT_16": pa.uint16(),
            "UINT_32": pa.uint32(),
        }.get(c, pa.int32())
    if t == "INT64":
        return {
            "TIMESTAMP_MILLIS": pa.timestamp("ms"),
            "TIMESTAMP_MICROS": pa.timestamp("us"),
            "TIME_MICROS": pa.time64("us"),
            "UINT_64": pa.uint64(),
        }.get(c, pa.int64())
    if t == "INT96":
        return pa.binary(12)
    if t == "FLOAT":
        return pa.float32()
    if t == "DOUBLE":
        return pa.float64()
    if t == "BYTE_ARRAY":
        # ENUM and JSON annotate utf8 payloads; BSON is opaque bytes
        # (reference: common/common.go:330-525 builds these logical types
        # from the same tag grammar)
        if c in ("UTF8", "ENUM", "JSON"):
            return pa.string()
        if c == "DECIMAL":
            return pa.decimal128(precision or 38, scale or 0)
        return pa.binary()
    if t == "FIXED_LEN_BYTE_ARRAY":
        if c == "DECIMAL":
            return pa.decimal128(precision or 38, scale or 0)
        if c == "UUID":
            # UUID logical type = FLBA(16) (common/common.go:418-419);
            # functions/converters.py uuid_to_fixed16 maps canonical strings
            return pa.binary(16)
        if c == "INTERVAL":
            # 3 x LE uint32 (months, days, millis), FLBA(12)
            # (common/common.go:701, byte-compare at 905-916);
            # functions/converters.py interval_to_fixed12
            return pa.binary(12)
        return pa.binary(length or 1)
    raise ValueError(f"unknown parquet type {type_name}")


@dataclass
class FieldSpec:
    name: str
    arrow_type: pa.DataType
    optional: bool = True
    codec: str | None = None
    outer: str | None = None
    children: list["FieldSpec"] = field(default_factory=list)


def parse_tag(tag: str) -> dict:
    """'name=Id, type=INT64, encoding=PLAIN' -> lowercase-key dict."""
    out = {}
    for part in tag.split(","):
        part = part.strip()
        if not part:
            continue
        k, _, v = part.partition("=")
        out[k.strip().lower()] = v.strip()
    return out


def field_from_tag(tag: str, children: list[FieldSpec] | None = None) -> FieldSpec:
    kv = parse_tag(tag)
    name = kv["name"]
    children = children or []
    rep = kv.get("repetitiontype", "OPTIONAL").upper()
    if children:
        # group node: LIST/MAP/struct
        conv = kv.get("convertedtype", "").upper()
        if conv == "LIST":
            inner = children[0]
            at = pa.list_(pa.field(inner.name, inner.arrow_type, inner.optional))
        elif conv == "MAP":
            kf, vf = children[0], children[1]
            at = pa.map_(kf.arrow_type, vf.arrow_type)
        else:
            at = pa.struct(
                [pa.field(c.name, c.arrow_type, c.optional) for c in children]
            )
        return FieldSpec(name, at, rep != "REQUIRED", None, None, children)
    at = _arrow_type(
        kv["type"],
        kv.get("convertedtype"),
        int(kv["length"]) if "length" in kv else None,
        int(kv["scale"]) if "scale" in kv else None,
        int(kv["precision"]) if "precision" in kv else None,
    )
    codec = _ENCODING_TO_CODEC.get(kv.get("encoding", "").upper()) if "encoding" in kv else None
    outer = _COMPRESSION_TO_OUTER.get(kv.get("compression", "").upper()) if "compression" in kv else None
    return FieldSpec(name, at, rep != "REQUIRED", codec, outer)


def parse_json_schema(text: str | dict) -> tuple[pa.Schema, EngineConfig]:
    """JSON schema string -> (arrow schema, EngineConfig with per-column
    codec/compression overrides for every tagged leaf)."""
    node = json.loads(text) if isinstance(text, str) else text

    def build(n: dict) -> FieldSpec:
        kids = [build(c) for c in n.get("Fields", [])]
        return field_from_tag(n["Tag"], kids)

    root = build(node)
    fields = root.children if root.children else [root]
    schema = pa.schema([pa.field(f.name, f.arrow_type, f.optional) for f in fields])
    cfg = EngineConfig()
    per = {}
    for f in fields:
        if f.codec:
            per[f.name] = (f.codec, f.outer or "none")
    cfg.per_column_codec = per
    return schema, cfg


def csv_schema(tags: list[str]) -> tuple[pa.Schema, EngineConfig]:
    """CSVWriter-style flat tag list (writer/csv.go:16-41 shape)."""
    doc = {"Tag": "name=root", "Fields": [{"Tag": t} for t in tags]}
    return parse_json_schema(doc)
