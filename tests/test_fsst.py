"""FSST codec: round-trip identity, escape handling, symbol-table serde,
compression effectiveness on code-like text (PAPERS.md: FSST, VLDB 2020)."""

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_ray.codecs import decode, encode
from parquet_go_ray.codecs import fsst


def rt(arr):
    payload, meta = encode("fsst", arr)
    out = decode(payload, meta, arr.type)
    assert out.equals(arr) or out.cast(arr.type).equals(arr)
    return payload


@pytest.mark.parametrize(
    "vals,typ",
    [
        ([], pa.string()),
        ([""], pa.string()),
        (["a"], pa.string()),
        (["hello world"] * 100, pa.string()),
        (["\xff" * 5, "", "x"], pa.string()),
        (["\xff\xff\xff\x41"], pa.string()),  # escape-run parity edge
        ([b"\x00\x01\xff\xfe" * 10, b""], pa.binary()),
        (["z" * 100000, "q"], pa.string()),  # giant value, segment split
    ],
)
def test_roundtrip_edges(vals, typ):
    rt(pa.array(vals, type=typ))


def test_compresses_code_like_text():
    rng = np.random.default_rng(0)
    words = ["def ", "return ", "self.", "import ", "    ", "(x, y)", "\n"]
    vals = ["".join(rng.choice(words, size=rng.integers(5, 60))) for _ in range(3000)]
    arr = pa.array(vals)
    payload = rt(arr)
    raw = sum(len(v) for v in vals)
    assert len(payload) < raw / 2, f"fsst ratio too weak: {raw}/{len(payload)}"


def test_symbol_table_serde():
    syms = [b"def ", b"x", b"\xff\xff", b"return "]
    t = fsst.SymbolTable(syms)
    buf = t.serialize()
    t2, pos = fsst.SymbolTable.deserialize(buf, 0)
    assert pos == len(buf)
    assert t2.symbols == syms


def test_escape_only_table():
    # empty symbol table -> everything escapes, still round-trips
    t = fsst.SymbolTable([])
    data = np.frombuffer(b"abc\xff\xffdef", dtype=np.uint8)
    lens = np.array([8], dtype=np.int64)
    stream = fsst.fsst_encode_buffer(data, lens, t)
    out = fsst.fsst_decode_buffer(np.frombuffer(stream, np.uint8), t)
    assert out.tobytes() == data.tobytes()
    assert len(stream) == 2 * len(data)


def test_random_bytes_roundtrip():
    rng = np.random.default_rng(3)
    vals = [bytes(rng.integers(0, 256, rng.integers(0, 200), dtype=np.uint8)) for _ in range(500)]
    rt(pa.array(vals, type=pa.binary()))


def test_giant_value_segments_bounded():
    import numpy as np

    from parquet_go_ray.codecs import fsst as F

    # one value far larger than SEGMENT_BYTES must round-trip AND be parsed
    # in bounded segments (the old guard was unreachable -> one huge parse)
    import pyarrow as pa

    rng = np.random.default_rng(5)
    # scale SEGMENT_BYTES down for the test so a "giant" value stays cheap
    old = F.SEGMENT_BYTES
    F.SEGMENT_BYTES = 1 << 12
    try:
        big = bytes(rng.integers(97, 105, size=3 * F.SEGMENT_BYTES).astype(np.uint8))
        vals = [big, b"small", b"", b"tail" * 50]
        arr = pa.array(vals, pa.binary())
        payload, meta = F.encode_fsst(arr)
        out = F.decode_fsst(payload, meta, pa.binary())
        assert out.to_pylist() == vals
    finally:
        F.SEGMENT_BYTES = old


def test_giant_value_preceded_by_small_values():
    import numpy as np
    import pyarrow as pa

    from parquet_go_ray.codecs import fsst as F

    # a giant value preceded by smaller values inside the same segment window
    # must not corrupt the stream (the capped branch must cut at the last
    # whole-value boundary, not pretend the window holds a single value)
    old = F.SEGMENT_BYTES
    F.SEGMENT_BYTES = 1 << 12
    try:
        rng = np.random.default_rng(7)
        big = bytes(rng.integers(97, 105, size=3 * F.SEGMENT_BYTES).astype(np.uint8))
        for prefix in (
            [b"x" * 300],
            [b"x" * 300, b"", b"y" * 10],
            [b"a", b"b" * 100, b"c" * 4000],
        ):
            vals = prefix + [big, b"small", big + b"!", b"tail" * 50]
            arr = pa.array(vals, pa.binary())
            payload, meta = F.encode_fsst(arr)
            out = F.decode_fsst(payload, meta, pa.binary())
            assert out.to_pylist() == vals
        # zero-length values right before the giant (boundary == seg_start)
        vals = [b"", b"", big, b"z"]
        arr = pa.array(vals, pa.binary())
        payload, meta = F.encode_fsst(arr)
        out = F.decode_fsst(payload, meta, pa.binary())
        assert out.to_pylist() == vals
    finally:
        F.SEGMENT_BYTES = old
