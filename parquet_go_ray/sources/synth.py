"""Deterministic synthetic source-code corpus.

BASELINE.json input_hint: Parquet table (repo:string, path:string,
commit:string, lang:string, content:string) — a 10^12-file corpus in
production, synthesized here at small scale, seeded and fully deterministic.

Realism knobs that matter to the engine:
  * zipf-skewed repo sizes (giant repos exercise salting),
  * per-repo dominant language, per-repo small commit set (dictionary-friendly
    within a partition),
  * hierarchical paths (prefix-sharing for DELTA_BYTE_ARRAY),
  * code-like content assembled from per-language line pools (FSST/zstd
    compressible, like real source).

Content assembly is fully vectorized: pick line indices per file, then one
gather builds the concatenated byte buffer and the Arrow string column is
constructed directly from (offsets, data) — no per-row Python string work.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = {
    "py": ["def {f}({a}):", "    return {a}.{f}({n})", "import {m}", "class {C}:",
           "    self.{a} = {a}", "for {a} in range({n}):", "    if {a} == {n}:",
           "# {c}", "from {m} import {f}", "    {a} = [{n} for _ in {a}]"],
    "go": ["func {f}({a} int) error {{", "\treturn nil", "}}", "package {m}",
           "\tif err != nil {{", "\t\treturn err", "var {a} = {n}",
           "type {C} struct {{", "\t{a} []byte", "// {c}"],
    "rs": ["fn {f}({a}: u64) -> u64 {{", "    let {a} = {n};", "}}",
           "use crate::{m};", "pub struct {C} {{", "    {a}: Vec<u8>,",
           "impl {C} {{", "    match {a} {{", "// {c}", "    {a} += {n};"],
    "js": ["function {f}({a}) {{", "  return {a}.map(x => x + {n});", "}}",
           "const {a} = require('{m}');", "let {a} = {n};", "// {c}",
           "export default {C};", "  if ({a} === {n}) {{", "class {C} {{", "}};"],
    "c": ["int {f}(int {a}) {{", "    return {a} + {n};", "}}",
          "#include <{m}.h>", "static int {a} = {n};", "/* {c} */",
          "struct {C} {{", "    char {a}[{n}];", "}};", "    {a}++;"],
    "md": ["# {C}", "## {f}", "- {c}", "see `{m}` for details", "", "{c} {c}",
           "```", "{a} = {n}", "| {a} | {n} |", "> {c}"],
}
IDENTS = ["data", "value", "index", "result", "buffer", "count", "offset",
          "state", "config", "handler", "ctx", "node", "item", "key", "row"]
MODULES = ["core", "utils", "engine", "parser", "codec", "store", "net", "api"]
CLASSES = ["Encoder", "Decoder", "Parser", "Builder", "Manager", "Worker"]
COMMENTS = ["fast path", "todo: optimize", "see spec", "handle edge case",
            "fallback", "keep in sync", "hot loop", "invariant holds"]
DIRS = ["src", "lib", "pkg", "internal", "cmd", "tests", "docs", "tools"]
NAMES = ["main", "util", "codec", "table", "reader", "writer", "index",
         "chunk", "server", "client", "types", "common", "config", "hash"]


def _line_pool(lang: str, rng: np.random.Generator, size: int = 512) -> list[bytes]:
    tpls = LANGS[lang]
    pool = []
    for _ in range(size):
        t = tpls[rng.integers(len(tpls))]
        line = t.format(
            f="fn_" + IDENTS[rng.integers(len(IDENTS))],
            a=IDENTS[rng.integers(len(IDENTS))],
            n=int(rng.integers(0, 100)),
            m=MODULES[rng.integers(len(MODULES))],
            C=CLASSES[rng.integers(len(CLASSES))],
            c=COMMENTS[rng.integers(len(COMMENTS))],
        )
        pool.append(line.encode() + b"\n")
    return pool


def make_code_table(n_rows: int, seed: int = 42, avg_lines: int = 40) -> pa.Table:
    rng = np.random.default_rng(seed)
    n_repos = max(4, n_rows // 128)
    # zipf-skewed repo popularity (giant head repos)
    ranks = np.arange(1, n_repos + 1, dtype=np.float64)
    weights = 1.0 / ranks**1.15
    weights /= weights.sum()
    repo_idx = rng.choice(n_repos, size=n_rows, p=weights)

    repo_names = np.array(
        [f"org{i % 97}/repo-{MODULES[i % len(MODULES)]}-{i}" for i in range(n_repos)]
    )
    lang_keys = list(LANGS)
    repo_main_lang = rng.integers(0, len(lang_keys), size=n_repos)
    # 80% of files in a repo use its dominant language
    use_main = rng.random(n_rows) < 0.8
    lang_idx = np.where(use_main, repo_main_lang[repo_idx], rng.integers(0, len(lang_keys), n_rows))
    langs = np.array(lang_keys)[lang_idx]

    # per-repo commit sets (1..8 commits, low per-partition cardinality)
    commit_pool = np.array(["".join(f"{b:02x}" for b in rng.integers(0, 256, 20)) for _ in range(256)])
    commit_of = commit_pool[(repo_idx * 7 + rng.integers(0, 1 + repo_idx % 8, n_rows)) % 256]

    d1 = rng.integers(0, len(DIRS), n_rows)
    d2 = rng.integers(0, len(NAMES), n_rows)
    d3 = rng.integers(0, len(NAMES), n_rows)
    paths = np.array(
        [f"{DIRS[a]}/{NAMES[b]}/{NAMES[c]}_{i % 23}.{l}"
         for i, (a, b, c, l) in enumerate(zip(d1, d2, d3, langs))]
    )

    # vectorized content assembly from per-lang line pools
    pools = {l: _line_pool(l, np.random.default_rng(seed + 1 + k)) for k, l in enumerate(lang_keys)}
    pool_flat: list[bytes] = []
    pool_base = {}
    for l in lang_keys:
        pool_base[l] = len(pool_flat)
        pool_flat.extend(pools[l])
    pool_lens = np.array([len(b) for b in pool_flat], dtype=np.int64)
    pool_offs = np.zeros(len(pool_flat) + 1, dtype=np.int64)
    np.cumsum(pool_lens, out=pool_offs[1:])
    pool_buf = np.frombuffer(b"".join(pool_flat), dtype=np.uint8)

    lines_per_file = np.maximum(
        1, rng.lognormal(mean=np.log(avg_lines), sigma=0.9, size=n_rows)
    ).astype(np.int64)
    # FIXTURES.md F1: some empty files and a few multi-100KB outliers
    empty = rng.random(n_rows) < 0.005
    lines_per_file[empty] = 0
    outlier = rng.random(n_rows) < 0.001
    lines_per_file[outlier] = rng.integers(5_000, 40_000, int(outlier.sum()))
    total_lines = int(lines_per_file.sum())
    base = np.array([pool_base[l] for l in langs], dtype=np.int64)
    picks = np.repeat(base, lines_per_file) + rng.integers(0, 512, total_lines)
    picked_lens = pool_lens[picks]
    # gather all picked lines into one buffer
    out_total = int(picked_lens.sum())
    src = np.repeat(pool_offs[picks], picked_lens) + (
        np.arange(out_total, dtype=np.int64)
        - np.repeat(np.concatenate(([0], np.cumsum(picked_lens[:-1]))), picked_lens)
    )
    data = pool_buf[src]
    # per-file lengths = sum of picked line lengths
    file_of_line = np.repeat(np.arange(n_rows, dtype=np.int64), lines_per_file)
    file_lens = np.bincount(file_of_line, weights=picked_lens, minlength=n_rows).astype(np.int64)
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(file_lens, out=offsets[1:])
    if offsets[-1] < (1 << 31) - 1:
        content = pa.Array.from_buffers(
            pa.string(), n_rows,
            [None, pa.py_buffer(offsets.astype(np.int32).tobytes()), pa.py_buffer(data.tobytes())],
        )
    else:
        content = pa.Array.from_buffers(
            pa.large_string(), n_rows,
            [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data.tobytes())],
        )

    return pa.table(
        {
            "repo": pa.array(repo_names[repo_idx], pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commit_of, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": content,
        }
    )


def ensure_code_corpus(path: str, n_rows: int, seed: int = 42, chunk: int = 50_000) -> str:
    """Write the synthetic corpus once as a DIRECTORY of parquet shards;
    reuse across runs.

    One shard file per `chunk` rows (each with a derived seed) so peak
    generation memory stays bounded AND the read parallelizes — a single
    monolithic file forces one serial ReadParquet task onto the critical
    path (measured: 3-5 s of the headline wall at 596 MB).  The 100 TB
    production input is inherently many files.  The directory is renamed
    into place atomically after all shards are written."""
    dname = os.path.join(path, f"code_sf_v3_{n_rows}_{seed}")
    if not os.path.isdir(dname):
        os.makedirs(path, exist_ok=True)
        # unique tmp dir per writer: os.replace on a DIRECTORY is not
        # overwrite-atomic (a concurrent builder winning the race leaves a
        # non-empty dname and the rename raises) — losing the race just means
        # someone else built the identical deterministic corpus
        import shutil as _shutil

        tmp = f"{dname}.tmp.{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        done = 0
        i = 0
        while done < n_rows:
            rows = min(chunk, n_rows - done)
            t = make_code_table(rows, seed if n_rows <= chunk else seed * 1000 + i)
            pq.write_table(t, os.path.join(tmp, f"shard_{i:05d}.parquet"))
            done += rows
            i += 1
        try:
            os.replace(tmp, dname)
        except OSError:
            if not os.path.isdir(dname):
                raise
            _shutil.rmtree(tmp, ignore_errors=True)
    return dname
