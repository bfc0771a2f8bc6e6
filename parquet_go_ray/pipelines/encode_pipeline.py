"""The flagship pipeline: Parquet source-code table -> encoded column chunks.

Ray-Data shape (SURVEY §3.3 "Ray Data equivalent of the whole lifecycle"):

    read_parquet(columns=needed)
      -> map_batches(add salted (repo,lang) partition key)   [stateless, arrow]
      -> groupby(__part).map_groups(PartitionEncoder)        [the one shuffle]
           - local sort by (repo, path)  (helps DELTA_BYTE_ARRAY/dicts;
             local pc.sort_indices, never a global sort)
           - slice into ~batch_size_rows chunks
           - encode columns via auto-selector
           - write part dir atomically (chunks.parquet + lineage.json)
      -> small metrics rows only (blobs never return to the driver)

Skew: the partition key is hash(repo) salted into `salt_buckets` sub-buckets
(default: full spread over every partition — measured 31% wall reduction vs
8-way salting at a ~2% compression-ratio cost, since the within-partition
sort re-clusters repos anyway; north rule: "explicit salting to defuse
giant-repo skew").  Resume: partitions already on disk are
filtered BEFORE the shuffle, so a rerun only pays for missing partitions.

The no-shuffle variant (`encode_dataset`) maps batches straight through the
ChunkEncoder — used for round-trip correctness queries where partitioning is
irrelevant.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..sources.io import read_parquet_any as _read_parquet_any

from ..config import DEFAULT, EngineConfig
from ..stages.encode import encode_table
from ..state import lineage as lin


def _plan_codecs(ds: rd.Dataset, cfg: EngineConfig) -> EngineConfig:
    """Plan codecs ONCE on a driver-side sample and broadcast the choices.

    Per-chunk trial encoding is numpy-allocation-heavy and anti-scales on
    memory-bound hosts; a single plan keeps per-task work dominated by the C
    kernels (memcpy/zstd/snappy/sha), which parallelize.  The per-chunk
    reference-policy floor still guards mispredictions (chunks where the
    planned codec loses fall back to plain/dict+snappy)."""
    import dataclasses

    from ..selector import select_codec

    sample = ds.take_batch(cfg.plan_sample_rows, batch_format="pyarrow")
    if cfg.sort_within_partition and {"repo", "path"} <= set(sample.column_names):
        # partitions are sorted before encoding — plan on sorted data so
        # order-sensitive codecs (delta_ba, rle) see realistic stats
        sample = sample.take(
            pc.sort_indices(
                sample.select(["repo", "path"]),
                sort_keys=[("repo", "ascending"), ("path", "ascending")],
            )
        )
    plan = {}
    for name in sample.column_names:
        col = sample[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        if (
            pa.types.is_list(col.type)
            or pa.types.is_large_list(col.type)
            or pa.types.is_struct(col.type)
            or pa.types.is_map(col.type)
        ):
            continue  # nested columns keep per-chunk selection
        values = col.drop_null() if col.null_count else col
        codec, outer, _ = select_codec(values, cfg, column=name)
        plan[name] = (codec, outer)
    return dataclasses.replace(cfg, per_column_codec=plan)


def add_partition_key(num_parts: int, salt_buckets: int):
    """Vectorized salted partition key: hash(repo) -> part, with hot repos
    fanned out over salt_buckets sub-partitions by a content-derived salt."""

    def fn(batch: pa.Table) -> pa.Table:
        import polars as pl

        # polars hash is vectorized C over the Arrow buffers — never convert
        # string columns to Python objects in this hot path.  Tables without
        # the code-corpus (repo, path) key partition by their first column.
        if "repo" in batch.column_names and "path" in batch.column_names:
            df = pl.from_arrow(batch.select(["repo", "path"]))
            h = df["repo"].hash(seed=17).to_numpy().astype(np.uint64)
            ph = df["path"].hash(seed=29).to_numpy().astype(np.uint64)
        else:
            key = batch.column_names[0]
            df = pl.from_arrow(batch.select([key]))
            h = df[key].hash(seed=17).to_numpy().astype(np.uint64)
            ph = df[key].hash(seed=29).to_numpy().astype(np.uint64)
        # salt: spread each repo over salt_buckets sub-partitions by path hash
        salt = ph % np.uint64(max(salt_buckets, 1))
        with np.errstate(over="ignore"):
            part = (h * np.uint64(1000003) + salt) % np.uint64(num_parts)
        return batch.append_column("__part", pa.array(part.astype(np.int64)))

    return fn


def encode_partition(group: pa.Table, cfg: EngineConfig, out_dir: str | None) -> pa.Table:
    """map_groups body: one group = one output partition.

    Deliberately a plain FUNCTION, not an actor: all dictionary/FSST state is
    chunk-local (SURVEY §7.3), so the stage is stateless and runs on Ray's
    persistent task workers — no per-execution actor cold-start (measured:
    30 actors importing numpy/pyarrow inside the timed window inverted the
    8->32 CPU scaling curve)."""
    part = int(group["__part"][0].as_py())
    group = group.drop_columns(["__part"])
    if cfg.sort_within_partition and {"repo", "path"} <= set(group.column_names):
        idx = pc.sort_indices(
            group.select(["repo", "path"]),
            sort_keys=[("repo", "ascending"), ("path", "ascending")],
        )
        group = group.take(idx)
    t0 = time.time()
    chunk_tables = []
    bs = cfg.batch_size_rows
    for lo in range(0, max(group.num_rows, 1), bs):
        piece = group.slice(lo, bs)
        if piece.num_rows == 0:
            continue
        chunk_tables.append(encode_table(piece, cfg, part=part))
    chunks = (
        pa.concat_tables(chunk_tables)
        if chunk_tables
        else encode_table(group, cfg, part=part).slice(0, 0)
    )
    wall = time.time() - t0
    metrics = {
        "part": part,
        "rows": int(group.num_rows),
        "raw_bytes": int(sum(chunks["raw_bytes"].to_pylist())),
        "enc_bytes": int(sum(chunks["enc_bytes"].to_pylist())),
        "ref_bytes": int(sum(chunks["ref_bytes"].to_pylist())),
        "chunks": len(chunk_tables),
        "encode_sec": round(wall, 4),
    }
    if out_dir is not None:
        codecs = dict(zip(*np.unique(np.asarray(chunks["codec"]), return_counts=True))) if chunks.num_rows else {}
        lineage = dict(metrics, codecs={k: int(v) for k, v in codecs.items()})
        lin.write_partition(out_dir, part, chunks, lineage)
        return pa.Table.from_pylist([metrics])
    return chunks


def _task_cpus(cfg: EngineConfig) -> int:
    """Clamp the declared per-task CPU footprint to the cluster so small
    sessions can still schedule (a 2-CPU driver session must not deadlock on
    num_cpus=4 tasks)."""
    import ray as _ray

    try:
        total = int(_ray.cluster_resources().get("CPU", cfg.cpus_per_encode_task))
    except Exception:
        total = cfg.cpus_per_encode_task
    return max(1, min(cfg.cpus_per_encode_task, total // 2 or 1))


def encode_dataset(ds: rd.Dataset, cfg: EngineConfig = DEFAULT) -> rd.Dataset:
    """No-shuffle encode: each Ray block batch -> one chunk set (stateless
    task pool; chunk-local codec state needs no actors)."""
    import functools

    return ds.map_batches(
        functools.partial(_encode_batch, cfg=cfg),
        batch_format="pyarrow",
        batch_size=cfg.batch_size_rows,
        num_cpus=_task_cpus(cfg),
    )


def _encode_batch(batch: pa.Table, cfg: EngineConfig) -> pa.Table:
    return encode_table(batch, cfg)


def encode_partitioned(
    ds: rd.Dataset,
    out_dir: str | None,
    cfg: EngineConfig = DEFAULT,
    num_parts: int | None = None,
    total_bytes: int | None = None,
) -> rd.Dataset:
    """Salted-shuffle encode with per-partition checkpoints; returns the
    metrics dataset (blobs go to out_dir) or the chunk dataset if out_dir is
    None."""
    import os as _os

    import ray as _ray
    from ray.data import DataContext as _DC

    # push-based shuffle moves the groupby exchange off the centralized
    # sort path — measured ~2.3x faster on the 225MB bench corpus (and 4x
    # faster than HASH_SHUFFLE there)
    try:
        from ray.data.context import ShuffleStrategy

        _DC.get_current().shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    except ImportError:  # older ray
        _DC.get_current().use_push_based_shuffle = True
    ncpu = _os.cpu_count() or 8
    if num_parts is None:
        if cfg.partitions:
            num_parts = cfg.partitions
        else:
            if total_bytes is None:
                total_bytes = ds.size_bytes() or (64 << 20)
            # enough partitions to cap chunk memory AND keep every core busy,
            # but not so many that per-chunk selector overhead dominates
            by_size = int(total_bytes // cfg.target_chunk_bytes)
            by_cpu = min(2 * ncpu, int(total_bytes // (8 << 20)))
            num_parts = max(1, by_size, by_cpu)
    if cfg.plan_codecs_globally and not cfg.per_column_codec:
        cfg = _plan_codecs(ds, cfg)
    ds = ds.map_batches(
        add_partition_key(
            num_parts, cfg.salt_buckets if cfg.salt_buckets is not None else num_parts
        ),
        batch_format="pyarrow"
    )
    if out_dir is not None:
        done = lin.done_parts(out_dir)
        if done:
            done_arr = np.array(sorted(done), dtype=np.int64)

            def drop_done(batch: pa.Table) -> pa.Table:
                mask = ~np.isin(np.asarray(batch["__part"]), done_arr)
                return batch.filter(pa.array(mask))

            ds = ds.map_batches(drop_done, batch_format="pyarrow")
    import functools

    return ds.groupby("__part").map_groups(
        functools.partial(encode_partition, cfg=cfg, out_dir=out_dir),
        batch_format="pyarrow",
        num_cpus=_task_cpus(cfg),
    )


def decode_partitions(out_dir: str, parts: list[int] | None = None) -> rd.Dataset:
    """Read checkpointed chunk tables back as a Dataset of chunk rows."""
    import os

    if parts is None:
        parts = sorted(lin.done_parts(out_dir))
    files = [os.path.join(lin.part_dir(out_dir, p), "chunks.parquet") for p in parts]
    # one block per file: a chunk's column rows MUST stay co-located so the
    # shuffle-free reassemble_blocks path can reunite them within-block
    return _read_parquet_any(files, override_num_blocks=max(len(files), 1))
