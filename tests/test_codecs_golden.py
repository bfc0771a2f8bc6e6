"""Golden byte vectors ported from the reference's encoder tests
(reference: encoding/encodingwrite_test.go:33-302).  Where our write path is a
deliberate superset (true RLE/bit-packed hybrid vs the reference's RLE-only
writer), we pin the primitives the formats share: varint, LSB bit-packing,
PLAIN kernels, the DELTA family, and RLE runs."""

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_ray import bits
from parquet_go_ray.codecs import plain, rle, delta


# encoding/encodingwrite_test.go:34-67
VARINT_CASES = [
    (0x0, b"\x00"),
    (0x7F, b"\x7f"),
    (0x80, b"\x80\x01"),
    (0x2000, b"\x80\x40"),
    (0x3FFF, b"\xff\x7f"),
    (0x4000, b"\x80\x80\x01"),
    (0x1FFFFF, b"\xff\xff\x7f"),
    (0x200000, b"\x80\x80\x80\x01"),
    (0x8000000, b"\x80\x80\x80\x40"),
    (0xFFFFFFF, b"\xff\xff\xff\x7f"),
]


@pytest.mark.parametrize("x,expected", VARINT_CASES)
def test_uvarint_golden(x, expected):
    assert bits.write_uvarint(x) == expected
    val, pos = bits.read_uvarint(expected, 0)
    assert val == x and pos == len(expected)


def test_rle_runs_golden():
    # encoding/encodingwrite_test.go:69-85 — pure-RLE streams our hybrid also
    # produces for long runs; pinned per-run framing varint(count<<1)+value.
    assert rle._rle_run(0, 3, 0) == bytes([3 << 1])
    assert rle._rle_run(3, 1, 1) == bytes([1 << 1, 3])
    assert (
        rle._rle_run(1, 1, 1) + rle._rle_run(2, 1, 1) + rle._rle_run(3, 2, 1)
        == bytes([2, 1, 2, 2, 4, 3])
    )
    # decoder consumes the reference's RLE-only stream
    v, _ = rle.decode_hybrid(bytes([2, 1, 2, 2, 4, 3]), 2, 4)
    assert v.tolist() == [1, 2, 3, 3]


def test_bitpacked_golden():
    # encoding/encodingwrite_test.go:87-102: [0..7] @3 bits -> header 3 + 88 C6 FA
    got = rle._bitpacked_span(np.arange(8, dtype=np.uint64), 0, 8, 3, final=True)
    assert got == bytes([3, 0x88, 0xC6, 0xFA])
    v, _ = rle.decode_hybrid(got, 3, 8)
    assert v.tolist() == list(range(8))
    assert rle._bitpacked_span(np.zeros(8, np.uint64), 0, 8, 0, final=True) == bytes([3])


def test_plain_boolean_golden():
    # encoding/encodingwrite_test.go:104-121
    cases = [
        ([], b""),
        ([True], b"\x01"),
        ([True, False], b"\x01"),
        ([True, False, False, True, False], b"\x09"),
    ]
    for vals, expected in cases:
        payload, _ = plain.encode_plain(pa.array(vals, type=pa.bool_()))
        assert payload == expected


def test_plain_int_golden():
    payload, _ = plain.encode_plain(pa.array([0, 1, 2], type=pa.int32()))
    assert payload == bytes([0, 0, 0, 0, 1, 0, 0, 0, 2, 0, 0, 0])
    payload, _ = plain.encode_plain(pa.array([0, 1, 2], type=pa.int64()))
    assert payload == bytes(
        [0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0]
    )


def test_plain_byte_array_golden():
    # encoding/encodingwrite_test.go:181-197
    payload, _ = plain.encode_plain(pa.array(["a", "abc"], type=pa.string()))
    assert payload == bytes([1, 0, 0, 0, 97, 3, 0, 0, 0, 97, 98, 99])


def test_plain_flba_golden():
    payload, _ = plain.encode_plain(pa.array([b"bca", b"abc"], type=pa.binary(3)))
    assert payload == bytes([98, 99, 97, 97, 98, 99])


def test_delta_bp_golden_int32_int64():
    # encoding/encodingwrite_test.go:216-250
    expected1 = bytes([128, 1, 4, 5, 2, 2, 0, 0, 0, 0])
    expected2 = bytes([128, 1, 4, 8, 14, 3, 2, 0, 0, 0, 192, 63, 0, 0, 0, 0, 0, 0])
    assert delta.delta_bp_encode_np(np.array([1, 2, 3, 4, 5])) == expected1
    assert delta.delta_bp_encode_np(np.array([7, 5, 3, 1, 2, 3, 4, 5])) == expected2
    v, _ = delta.delta_bp_decode_np(expected2)
    assert v.tolist() == [7, 5, 3, 1, 2, 3, 4, 5]


def test_delta_length_ba_golden():
    # encoding/encodingwrite_test.go:252-266
    expected = bytes(
        [128, 1, 4, 4, 10, 0, 1, 0, 0, 0, 2, 0, 0, 0]
    ) + b"HelloWorldFoobarABCDEF"
    arr = pa.array(["Hello", "World", "Foobar", "ABCDEF"])
    payload, _ = delta.encode_delta_length_ba(arr)
    assert payload == expected


def test_delta_ba_golden():
    # encoding/encodingwrite_test.go:268-282 — prefix lens all 0 for this input
    expected = bytes([128, 1, 4, 4, 0, 0, 0, 0, 0, 0]) + bytes(
        [128, 1, 4, 4, 10, 0, 1, 0, 0, 0, 2, 0, 0, 0]
    ) + b"HelloWorldFoobarABCDEF"
    arr = pa.array(["Hello", "World", "Foobar", "ABCDEF"])
    payload, _ = delta.encode_delta_ba(arr)
    assert payload == expected
