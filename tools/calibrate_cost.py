"""Calibrate the selector's STATIC codec-cost table (selector.py).

Measures, for each (codec | outer compressor), best-of-N encode time over
multi-MB representative arrays, normalized by a just-measured memcpy of the
same byte count ("slowdown": 1.0 = memcpy speed).  Multi-MB inputs matter:
on KB-sized samples fixed per-call overhead dominates and the constants come
out 10-100x too high.

Why static constants instead of measuring at selection time: this class of
shared host swings 2-4x in memory throughput between runs, and a measured
cost term flips codec choices run-to-run — the engine's output size becomes
a function of the weather, not the data (observed: size_vs_reference 0.50 vs
0.593 across runs of identical code + input).  The RELATIVE cost of codecs
is far more stable than the absolute throughput, so it is baked in, and this
script re-derives it when codecs change.

    python tools/calibrate_cost.py [corpus.parquet]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, ".")

from parquet_go_ray import codecs  # noqa: E402
from parquet_go_ray.chunk import _outer_compress  # noqa: E402
from parquet_go_ray.selector import logical_nbytes  # noqa: E402


def memcpy_sec(n: int) -> float:
    data = np.zeros(n, dtype=np.uint8)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        data.copy()
        best = min(best, time.perf_counter() - t0)
    return best


def inner_slowdown(codec: str, arr: pa.Array, reps: int = 3) -> float:
    raw = logical_nbytes(arr)
    mc = memcpy_sec(raw)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        codecs.encode(codec, arr)
        best = min(best, time.perf_counter() - t0)
    return best / mc


def outer_slowdown(outer: str, payload: bytes, rawlen: int, reps: int = 3) -> float:
    mc = memcpy_sec(rawlen)
    lvl = 9 if outer == "zstd9" else (7 if outer == "zstd7" else 3)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        _outer_compress(payload, outer, lvl)
        best = min(best, time.perf_counter() - t0)
    return best / mc


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/pgr_bench_corpus"
    import glob
    import os

    if os.path.isdir(corpus):
        corpus = sorted(glob.glob(f"{corpus}/*.parquet"))[0]
    t = pq.read_table(corpus, columns=["content", "repo"])
    content = t["content"].combine_chunks().slice(0, 4000)
    repo = t["repo"].combine_chunks()
    rng = np.random.default_rng(7)
    ints = pa.array(np.cumsum(rng.integers(0, 50, 1_000_000)).astype(np.int64))
    floats = pa.array(rng.normal(size=1_000_000) * 1e4)

    print("# binary (string) codecs, slowdown vs memcpy")
    for c in ("plain", "dict_rle", "delta_length_ba", "delta_ba", "fsst"):
        print(f"  content {c}: {inner_slowdown(c, content):.0f}")
        print(f"  repo    {c}: {inner_slowdown(c, repo):.0f}")
    print("# fixed-width codecs")
    for c in ("plain", "delta_bp", "rle_bp", "dict_rle", "byte_stream_split"):
        print(f"  ints    {c}: {inner_slowdown(c, ints):.0f}")
    for c in ("plain", "byte_stream_split"):
        print(f"  floats  {c}: {inner_slowdown(c, floats):.0f}")
    print("# outer compressors (per raw byte)")
    for name, arr in (("content", content), ("ints", ints)):
        payload, _ = codecs.encode("plain", arr)
        for o in ("snappy", "zstd", "zstd7", "zstd9"):
            print(f"  {name} {o}: {outer_slowdown(o, payload, logical_nbytes(arr)):.0f}")


if __name__ == "__main__":
    main()
