"""Seeded adversarial fuzz sweeps over the bit-level kernels — wider than the
hypothesis strategies (all bit widths, run-structured patterns, many seeds)."""

import numpy as np
import pyarrow as pa
import pytest

from parquet_go_ray.bits import pack_bits, unpack_bits
from parquet_go_ray.codecs.delta import delta_bp_decode_np, delta_bp_encode_np
from parquet_go_ray.codecs.rle import decode_hybrid, encode_hybrid


@pytest.mark.parametrize("width", [0, 1, 2, 3, 5, 7, 8, 13, 16, 24, 31, 32, 47, 63, 64])
def test_pack_unpack_all_widths(width):
    rng = np.random.default_rng(width)
    n = 64
    hi = (1 << width) - 1 if width else 0
    vals = rng.integers(0, hi + 1, n, dtype=np.uint64) if width < 64 else rng.integers(
        0, 1 << 62, n, dtype=np.uint64
    ) * np.uint64(4) + rng.integers(0, 4, n, dtype=np.uint64)
    packed = pack_bits(vals, width)
    out = unpack_bits(packed, width, n)
    assert np.array_equal(out, vals)


@pytest.mark.parametrize("seed", range(12))
def test_hybrid_run_structured_fuzz(seed):
    rng = np.random.default_rng(seed)
    parts = []
    for _ in range(rng.integers(1, 40)):
        kind = rng.integers(0, 3)
        if kind == 0:  # long run
            parts.append(np.full(rng.integers(8, 100), rng.integers(0, 1 << 20), np.uint64))
        elif kind == 1:  # short runs
            parts.append(np.full(rng.integers(1, 8), rng.integers(0, 1 << 20), np.uint64))
        else:  # noise
            parts.append(rng.integers(0, 1 << 20, rng.integers(1, 50)).astype(np.uint64))
    v = np.concatenate(parts)
    w = int(v.max()).bit_length()
    payload = encode_hybrid(v, w)
    out, _ = decode_hybrid(payload, w, len(v))
    assert np.array_equal(out, v)


@pytest.mark.parametrize("seed", range(8))
def test_delta_bp_block_boundaries(seed):
    rng = np.random.default_rng(seed)
    for n in [1, 2, 127, 128, 129, 255, 256, 257, 384, 513]:
        v = rng.integers(-(1 << 40), 1 << 40, n)
        out, _ = delta_bp_decode_np(delta_bp_encode_np(v))
        assert np.array_equal(out, v), n


@pytest.mark.parametrize("seed", range(6))
def test_fsst_fuzz(seed):
    from parquet_go_ray.codecs import decode, encode

    rng = np.random.default_rng(seed)
    # mix of compressible, random, escape-heavy and empty values
    vals = []
    for _ in range(rng.integers(10, 200)):
        kind = rng.integers(0, 4)
        if kind == 0:
            vals.append(b"")
        elif kind == 1:
            vals.append(bytes(rng.integers(250, 256, rng.integers(1, 50), dtype=np.uint8)))
        elif kind == 2:
            vals.append((b"pattern" * rng.integers(1, 30))[: rng.integers(1, 120)])
        else:
            vals.append(bytes(rng.integers(0, 256, rng.integers(0, 100), dtype=np.uint8)))
    arr = pa.array(vals, type=pa.binary())
    p, m = encode("fsst", arr)
    out = decode(p, m, arr.type)
    assert out.cast(arr.type).equals(arr) or out.equals(arr)
