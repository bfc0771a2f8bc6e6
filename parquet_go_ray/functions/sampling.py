"""Consistent (hash-based) sampling — the reproducible subsample a 100 TB
pipeline needs: the same row set survives every run, on every cluster size,
and two tables sampled on a shared key stay join-compatible.

Not in the reference (no sampling surface); random_shuffle/ds.random_sample
give a DIFFERENT set each run, which breaks resume + lineage.  The filter is
a pure per-batch map — no shuffle, no state — and SQL-expressible (Knuth
multiplicative hash in uint32 space), so the driver oracle checks it
value-for-value.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..sources.io import read_parquet_any as _read_parquet_any

KNUTH = 2654435761  # 2^32 / phi, Knuth multiplicative hashing constant
MOD = 1 << 32


def hash_sample(
    sf_dir: str,
    table: str = "documents",
    key: str = "doc_id",
    rate: float = 0.1,
) -> rd.Dataset:
    """Rows where hash(key) lands under `rate` of the uint32 space."""
    threshold = int(rate * MOD)

    def keep(batch: pa.Table) -> pa.Table:
        k = batch[key]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        # int64 -> uint64 wraps negatives to 2^64+v; since 2^64 ≡ 0 (mod 2^32)
        # the result equals the mathematical non-negative (v*KNUTH) mod 2^32,
        # which is exactly what the HUGEINT oracle SQL computes — the kernel
        # and oracle agree on the FULL signed int64 key domain.
        v = np.asarray(k, dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (v * np.uint64(KNUTH)) % np.uint64(MOD)
        return batch.filter(pa.array(h < np.uint64(threshold)))

    return _read_parquet_any(f"{sf_dir}/{table}.parquet").map_batches(
        keep, batch_format="pyarrow"
    )


def hash_sample_oracle_sql(table: str = "documents", key: str = "doc_id", rate: float = 0.1) -> str:
    # HUGEINT avoids int64 overflow in key*KNUTH, and the double-mod makes the
    # remainder non-negative — mirroring the kernel's uint64 wrap, so the two
    # agree even for negative keys (DuckDB's % alone is negative there).
    threshold = int(rate * MOD)
    return (
        f"SELECT * FROM {table} "
        f"WHERE ((({key}::HUGEINT * {KNUTH}) % {MOD}) + {MOD}) % {MOD} < {threshold}"
    )


# --- stratified (data-mixing) sampling ---------------------------------------

# default mixing weights for the driver query: up-weight some sources, drop
# others — the "domain mixing" step of a training-data pipeline, made
# deterministic/reproducible by the same consistent-hash filter
DEFAULT_MIX = {
    "src0": 1.0,
    "src1": 0.75,
    "src2": 0.5,
    "src3": 0.25,
    "src4": 0.0,
}
DEFAULT_MIX_FALLBACK = 0.4


def stratified_sample(
    sf_dir: str,
    table: str = "documents",
    key: str = "doc_id",
    group: str = "source",
    rates: dict[str, float] | None = None,
    default_rate: float = DEFAULT_MIX_FALLBACK,
) -> rd.Dataset:
    """Per-group sampling rates over `group` (domain / source mixing):
    every group g keeps the rows where hash(key) < rates.get(g, default) of
    the uint32 space.  Pure per-batch filter — no shuffle, no state — and
    because the hash is keyed on `key` alone, rows kept at rate r are a
    SUBSET of rows kept at any rate >= r, so re-mixing weights later reuses
    the same cached subsets (nested samples).  Dictionary-encode the group
    column upstream if it is high-cardinality; rates dict ships in the
    closure (KBs)."""
    if rates is None:
        rates = DEFAULT_MIX
    thresholds = {g: np.uint64(int(r * MOD)) for g, r in rates.items()}
    default_thr = np.uint64(int(default_rate * MOD))

    def keep(batch: pa.Table) -> pa.Table:
        k = batch[key]
        if isinstance(k, pa.ChunkedArray):
            k = k.combine_chunks()
        v = np.asarray(k, dtype=np.int64).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = (v * np.uint64(KNUTH)) % np.uint64(MOD)
        g = batch[group].to_pandas().map(thresholds).fillna(default_thr)
        return batch.filter(pa.array(h < g.to_numpy(dtype=np.uint64)))

    return _read_parquet_any(f"{sf_dir}/{table}.parquet").map_batches(
        keep, batch_format="pyarrow"
    )


def stratified_sample_oracle_sql(
    table: str = "documents",
    key: str = "doc_id",
    group: str = "source",
    rates: dict[str, float] | None = None,
    default_rate: float = DEFAULT_MIX_FALLBACK,
) -> str:
    if rates is None:
        rates = DEFAULT_MIX
    cases = " ".join(
        f"WHEN '{g}' THEN {int(r * MOD)}" for g, r in rates.items()
    )
    thr = f"CASE {group} {cases} ELSE {int(default_rate * MOD)} END"
    return (
        f"SELECT * FROM {table} "
        f"WHERE ((({key}::HUGEINT * {KNUTH}) % {MOD}) + {MOD}) % {MOD} < {thr}"
    )
