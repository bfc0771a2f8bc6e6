"""Composite corpus-cleaning pipeline — the end-to-end training-data story
that chains the engine's operators the way a 100 TB run would:

    documents
      -> quality filter        (vectorized QualityScore, SQL-checkable)
      -> exact dedup           (hash-partitioned drop_duplicates)
      -> near-dup dedup        (MinHash-LSH clusters, keep representative)
      -> cleaned corpus + per-stage report

Each stage WRITES partitioned parquet into the workdir and the next stage
reads it back: stage boundaries are durable checkpoints, so a crashed run
resumes at the first missing stage output (the resumable-output rule), and
every stage's input is a plain parquet dir any other tool can inspect."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from ..sources.io import read_parquet_any as _read_parquet_any


def _stage_done(path: str) -> bool:
    """A stage counts as done only when its _SUCCESS marker exists — Ray's
    write_parquet lands part files incrementally, so "any .parquet present"
    would resume past a crash-truncated stage and silently lose rows (the
    same marker-last rule as state/lineage.py)."""
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def _mark_done(path: str) -> None:
    with open(os.path.join(path, "_SUCCESS"), "w") as f:
        f.write("ok")


def clean_corpus(
    sf_dir: str,
    workdir: str = "/tmp/pgr_clean",
    min_words: int = 5,
    max_punct_ratio: float = 0.2,
    near_threshold: float = 0.8,
    resume: bool = True,
) -> dict:
    """Run the staged cleaning pipeline; returns the per-stage report with
    row counts (the final corpus lives at <workdir>/stage3_near)."""
    from .dedup import dedup_exact, dedup_minhash
    from .textstats import QualityScore

    if not resume:
        shutil.rmtree(workdir, ignore_errors=True)
    os.makedirs(workdir, exist_ok=True)
    s1 = os.path.join(workdir, "stage1_quality")
    s2 = os.path.join(workdir, "stage2_exact")
    s3 = os.path.join(workdir, "stage3_near")
    report: dict = {}

    docs = _read_parquet_any(f"{sf_dir}/documents.parquet")
    report["input_rows"] = docs.count()

    # -- stage 1: quality filter (keep docs with enough words, sane punct) --
    if not _stage_done(s1):
        qs = QualityScore()

        def keep_quality(batch: pa.Table) -> pa.Table:
            m = qs(batch)
            keep = (m["words"].to_numpy() >= min_words) & (
                m["punct_ratio"].to_numpy() <= max_punct_ratio
            )
            return batch.filter(pa.array(keep))

        shutil.rmtree(s1, ignore_errors=True)
        docs.map_batches(keep_quality, batch_format="pyarrow").write_parquet(s1)
        _mark_done(s1)
    report["after_quality"] = _read_parquet_any(f"{s1}").count()

    # -- stage 2: exact dedup --
    if not _stage_done(s2):
        shutil.rmtree(s2, ignore_errors=True)
        dedup_exact(s1).write_parquet(s2)
        _mark_done(s2)
    report["after_exact"] = _read_parquet_any(f"{s2}").count()

    # -- stage 3: near-dup dedup (keep each cluster's min doc_id) --
    if not _stage_done(s3):
        labels = dedup_minhash(s2, threshold=near_threshold)

        def survivors(b: pa.Table) -> pa.Table:
            keep = pa.array(
                np.asarray(b["doc_id"], np.int64) == np.asarray(b["cluster"], np.int64)
            )
            return pa.table({"doc_id": b["doc_id"].filter(keep)})

        keep_ids = labels.map_batches(survivors, batch_format="pyarrow")
        from .dedup import _hash_join

        cleaned = _hash_join(
            _read_parquet_any(s2),
            keep_ids,
            on="doc_id",
            left_schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("text", pa.string()),
                    ("lang", pa.string()),
                    ("source", pa.string()),
                    ("n_chars", pa.int64()),
                ]
            ),
            right_schema=pa.schema([("doc_id", pa.int64())]),
        )
        shutil.rmtree(s3, ignore_errors=True)
        cleaned.write_parquet(s3)
        _mark_done(s3)
    report["after_near"] = _read_parquet_any(f"{s3}").count()
    report["workdir"] = workdir
    return report


def corpus_to_native_query(sf_dir: str) -> pd.DataFrame:
    """Capstone: the cleaned corpus (quality filter + exact dedup, the
    deterministic stages) flows into the hive-partitioned NATIVE sink
    (lang=<v>/ dirs of indexed, checksummed PAR1 files) and comes back
    through the engine's distributed pruning scan — the complete
    pretraining-data path (filter -> dedup -> partitioned columnar layout
    -> scan) under one value-hash oracle."""
    import tempfile

    from .native_io import read_par1_dataset, write_par1_dataset

    workdir = tempfile.mkdtemp(prefix="pgr_c2n_")
    try:
        clean_corpus(sf_dir, workdir, resume=False)
        out = os.path.join(workdir, "native")
        ds = _read_parquet_any(os.path.join(workdir, "stage2_exact"))
        write_par1_dataset(
            ds, out, codec="zstd", partition_by="lang",
            encodings={"doc_id": "delta_bp", "source": "dict", "lang": "dict"},
        ).materialize()
        return read_par1_dataset(out).to_pandas()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


def clean_corpus_query(sf_dir: str) -> pd.DataFrame:
    """Driver query: surviving doc_ids after the quality+exact stages
    (deterministic, SQL-oracle-able) plus the near-dedup survivor count as a
    separate row-count check in the report."""
    import tempfile

    workdir = tempfile.mkdtemp(prefix="pgr_clean_")
    try:
        report = clean_corpus(sf_dir, workdir, resume=False)
        ids = (
            _read_parquet_any(os.path.join(workdir, "stage2_exact"), columns=["doc_id"])
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert report["after_near"] <= report["after_exact"] <= report["after_quality"]
        return ids
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
