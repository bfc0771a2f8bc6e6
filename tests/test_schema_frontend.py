"""Schema declaration front-ends (common/common.go:76-291 tag grammar +
schema/json.go:21-157 JSON schema) and INT96 converter parity
(types/converter.go:94-112)."""

import datetime

import numpy as np
import pyarrow as pa

from parquet_go_ray.functions.converters import int96_to_timestamp, timestamp_to_int96
from parquet_go_ray.sources.schema import csv_schema, parse_json_schema, parse_tag


def test_parse_tag_grammar():
    kv = parse_tag("name=Id, type=INT64, encoding=DELTA_BINARY_PACKED, repetitiontype=REQUIRED")
    assert kv == {
        "name": "Id",
        "type": "INT64",
        "encoding": "DELTA_BINARY_PACKED",
        "repetitiontype": "REQUIRED",
    }


def test_json_schema_to_arrow_and_codecs():
    doc = {
        "Tag": "name=root",
        "Fields": [
            {"Tag": "name=id, type=INT64, encoding=DELTA_BINARY_PACKED, compression=ZSTD, repetitiontype=REQUIRED"},
            {"Tag": "name=name, type=BYTE_ARRAY, convertedtype=UTF8, encoding=RLE_DICTIONARY"},
            {"Tag": "name=score, type=DOUBLE, encoding=BYTE_STREAM_SPLIT"},
            {"Tag": "name=day, type=INT32, convertedtype=DATE"},
            {"Tag": "name=legacy_ts, type=INT96"},
            {"Tag": "name=amount, type=FIXED_LEN_BYTE_ARRAY, convertedtype=DECIMAL, precision=10, scale=2, length=16"},
        ],
    }
    schema, cfg = parse_json_schema(doc)
    assert schema.field("id").type == pa.int64() and not schema.field("id").nullable
    assert schema.field("name").type == pa.string()
    assert schema.field("day").type == pa.date32()
    assert schema.field("legacy_ts").type == pa.binary(12)
    assert schema.field("amount").type == pa.decimal128(10, 2)
    assert cfg.per_column_codec["id"] == ("delta_bp", "zstd")
    assert cfg.per_column_codec["name"] == ("dict_rle", "none")
    assert cfg.per_column_codec["score"] == ("byte_stream_split", "none")
    assert "day" not in cfg.per_column_codec  # no encoding tag -> auto-select


def test_json_schema_nested_list_and_map():
    doc = {
        "Tag": "name=root",
        "Fields": [
            {
                "Tag": "name=vals, type=LIST, convertedtype=LIST",
                "Fields": [{"Tag": "name=element, type=INT64"}],
            },
            {
                "Tag": "name=attrs, type=MAP, convertedtype=MAP",
                "Fields": [
                    {"Tag": "name=key, type=BYTE_ARRAY, convertedtype=UTF8"},
                    {"Tag": "name=value, type=INT64"},
                ],
            },
        ],
    }
    schema, _ = parse_json_schema(doc)
    assert pa.types.is_list(schema.field("vals").type)
    assert pa.types.is_map(schema.field("attrs").type)


def test_csv_schema_roundtrip_through_engine(ray_session, tmp_path):
    """CSVWriter analog: tag list -> typed read -> forced codecs -> decode."""
    import ray.data as rd

    from parquet_go_ray.pipelines.encode_pipeline import encode_dataset
    from parquet_go_ray.stages.encode import reassemble_blocks

    csv = tmp_path / "t.csv"
    csv.write_text("id,name,score\n1,alpha,1.5\n2,beta,2.5\n3,alpha,3.5\n")
    schema, cfg = csv_schema(
        [
            "name=id, type=INT64, encoding=DELTA_BINARY_PACKED",
            "name=name, type=BYTE_ARRAY, convertedtype=UTF8, encoding=RLE_DICTIONARY",
            "name=score, type=DOUBLE, encoding=BYTE_STREAM_SPLIT",
        ]
    )
    from pyarrow import csv as pacsv

    ds = rd.read_csv(
        str(csv),
        convert_options=pacsv.ConvertOptions(
            column_types={f.name: f.type for f in schema}
        ),
    )
    chunks = encode_dataset(ds, cfg)
    pdf = chunks.to_pandas()
    by_col = dict(zip(pdf.column, pdf.codec))
    assert by_col["id"] == "delta_bp"
    assert by_col["name"] == "dict_rle"
    assert by_col["score"] == "byte_stream_split"
    out = (
        rd.from_pandas(pdf)
        .map_batches(reassemble_blocks, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values("id")
    )
    assert list(out.name) == ["alpha", "beta", "alpha"]
    assert list(out.score) == [1.5, 2.5, 3.5]


def test_int96_roundtrip_and_epoch():
    ts = pa.array(
        [
            datetime.datetime(2024, 5, 17, 12, 34, 56, 789012),
            None,
            datetime.datetime(1969, 12, 31, 23, 59, 59),
            datetime.datetime(1970, 1, 1),
        ],
        pa.timestamp("us"),
    )
    i96 = timestamp_to_int96(ts)
    assert i96.type == pa.binary(12)
    assert int96_to_timestamp(i96, "us").equals(ts)
    # epoch vector: nanos-of-day 0 + Julian day 2440588 (reference
    # types/converter.go:94-112 constants)
    raw = i96[3].as_py()
    assert raw[:8] == b"\0" * 8
    assert int.from_bytes(raw[8:], "little") == 2440588


def test_int96_units():
    ts_ms = pa.array([1_700_000_000_000], pa.timestamp("ms"))
    i96 = timestamp_to_int96(ts_ms)
    back = int96_to_timestamp(i96, "ms")
    assert back.cast(pa.int64()).to_pylist() == [1_700_000_000_000]


def test_int96_property_random():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=50, deadline=None)
    @given(
        ticks=st.lists(
            st.one_of(st.none(), st.integers(-(2**52), 2**52)), min_size=0, max_size=50
        )
    )
    def inner(ticks):
        ts = pa.array(ticks, pa.timestamp("us"))
        back = int96_to_timestamp(timestamp_to_int96(ts), "us")
        assert back.equals(ts)

    inner()
