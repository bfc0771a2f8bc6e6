"""Sub-chunk page index (ColumnIndex/OffsetIndex analog — reference:
writer/writer.go:418-481): paged chunks round-trip bit-identically for every
codec and decode ONLY the pages overlapping a requested row range."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from parquet_go_ray.chunk import (
    decode_column_chunk,
    encode_column_chunk,
    paged_skip_stats,
)
from parquet_go_ray.config import EngineConfig
from parquet_go_ray.pipelines.scan import chunk_meta

RNG = np.random.default_rng(1234)
CFG = EngineConfig(page_rows=5000, verify_sha256=False)


def _cases():
    n = 23456  # deliberately not a page multiple
    return [
        ("dict_rle", pa.array(RNG.integers(0, 40, n))),
        ("dict_rle", pa.array([f"k{v}" for v in RNG.integers(0, 25, n)])),
        ("delta_bp", pa.array(np.cumsum(RNG.integers(0, 7, n)))),
        ("delta_length_ba", pa.array([f"v-{v}" for v in RNG.integers(0, 10**7, n)])),
        ("delta_ba", pa.array(sorted(f"p/{v:08d}" for v in RNG.integers(0, 10**6, n)))),
        ("byte_stream_split", pa.array(RNG.normal(size=n))),
        ("plain", pa.array(RNG.integers(-(2**40), 2**40, n))),
        ("fsst", pa.array([f"id-{v % 97}-{v % 13}" for v in RNG.integers(0, 10**5, n)])),
        ("delta_bp", pa.array(RNG.integers(0, 10**15, n)).cast(pa.timestamp("us"))),
    ]


@pytest.mark.parametrize("outer", ["none", "zstd"])
@pytest.mark.parametrize("codec,arr", _cases(), ids=lambda v: v if isinstance(v, str) else "")
def test_paged_roundtrip_and_skip(codec, arr, outer):
    row = encode_column_chunk(arr, codec, outer, CFG)
    meta = chunk_meta(row["blob"])
    assert meta["codec"] == "paged" and meta["inner"] == codec
    assert len(meta["pages"]) == -(-len(arr) // CFG.page_rows)
    full = decode_column_chunk(row["blob"])
    assert full.equals(arr)
    for off, cnt in [(0, 10), (9990, 30), (12345, 678), (len(arr) - 7, 7), (0, len(arr))]:
        got = decode_column_chunk(row["blob"], row_offset=off, row_count=cnt)
        assert got.equals(arr.slice(off, cnt)), (codec, outer, off, cnt)
    st = paged_skip_stats(row["blob"], 12345, 100)
    assert st["pages_decoded"] == 1
    assert st["bytes_decoded"] < st["bytes_total"]


def test_paged_nulls_roundtrip():
    n = 20000
    base = pa.array(RNG.integers(0, 30, n))
    mask = RNG.random(n) < 0.15
    arr = pc.if_else(pa.array(~mask), base, pa.scalar(None, type=base.type))
    row = encode_column_chunk(arr, "dict_rle", "zstd", CFG)
    assert chunk_meta(row["blob"])["codec"] == "paged"
    assert decode_column_chunk(row["blob"]).equals(arr)
    for off, cnt in [(0, 1000), (7777, 4444), (n - 100, 100)]:
        got = decode_column_chunk(row["blob"], row_offset=off, row_count=cnt)
        assert got.equals(arr.slice(off, cnt)), (off, cnt)


def test_paged_shared_dictionary_not_duplicated():
    # one chunk-level dictionary (parquet dict-page analog): per-page
    # payloads carry only index streams, so total size ~ unpaged dict size
    vals = pa.array([f"repo-{v}" for v in RNG.integers(0, 20, 40000)])
    paged = encode_column_chunk(vals, "dict_rle", "none", CFG)
    unpaged = encode_column_chunk(vals, "dict_rle", "none", EngineConfig(verify_sha256=False))
    meta = chunk_meta(paged["blob"])
    assert meta["shared"] > 0 and meta["dict_rows"] == 20
    assert paged["enc_bytes"] < unpaged["enc_bytes"] * 1.2


def test_paged_small_chunk_stays_unpaged():
    arr = pa.array(RNG.integers(0, 10, 100))
    row = encode_column_chunk(arr, "dict_rle", "none", CFG)
    assert chunk_meta(row["blob"])["codec"] == "dict_rle"


def test_paged_skip_decodes_fewer_bytes_than_plain_path():
    # the verdict-#6 gate: a dict_rle chunk supports true row-skip — the
    # decoded-bytes accounting for a 500-row mid-chunk read is a small
    # fraction of the full chunk payload
    arr = pa.array([f"text-{v % 100}" for v in RNG.integers(0, 100, 60000)])
    row = encode_column_chunk(arr, "dict_rle", "zstd", CFG)
    st = paged_skip_stats(row["blob"], 30000, 500)
    assert st["pages_total"] == 12
    assert st["pages_decoded"] == 1
    assert st["bytes_decoded"] * 5 < st["bytes_total"]
    got = decode_column_chunk(row["blob"], row_offset=30000, row_count=500)
    assert got.equals(arr.slice(30000, 500))
