"""Per-partition lineage + metrics checkpoints and resume.

The reference has no checkpointing (SURVEY §4); the north rule requires it.
Layout (resumable-output pattern): one directory per partition, written
atomically (tmp + rename), holding the partition's chunk table and a lineage
record:

    out_dir/
      part=00042/
        chunks.parquet       # chunk table rows (blobs + metadata)
        lineage.json         # inputs, codec choices, metrics, sha256s
      _manifest.json         # driver-side roll-up after the run

On resume, partitions with a lineage.json are skipped (their metrics are
loaded from the checkpoint instead of recomputed)."""

from __future__ import annotations

import json
import os
import shutil
import tempfile


def part_dir(out_dir: str, part: int) -> str:
    return os.path.join(out_dir, f"part={part:05d}")


def is_done(out_dir: str, part: int) -> bool:
    return os.path.exists(os.path.join(part_dir(out_dir, part), "lineage.json"))


def done_parts(out_dir: str) -> set[int]:
    if not os.path.isdir(out_dir):
        return set()
    out = set()
    for name in os.listdir(out_dir):
        if name.startswith("part=") and os.path.exists(
            os.path.join(out_dir, name, "lineage.json")
        ):
            out.add(int(name.split("=")[1]))
    return out


def write_partition(out_dir: str, part: int, chunk_table, lineage: dict) -> str:
    """Atomically write one partition's chunks + lineage record."""
    import pyarrow.parquet as pq

    final = part_dir(out_dir, part)
    os.makedirs(out_dir, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix=f".part{part}-", dir=out_dir)
    try:
        pq.write_table(chunk_table, os.path.join(tmp, "chunks.parquet"))
        with open(os.path.join(tmp, "lineage.json"), "w") as f:
            json.dump(lineage, f, indent=1)
        if os.path.exists(final):  # idempotent retry: keep the first writer
            shutil.rmtree(tmp)
        else:
            os.replace(tmp, final)
    except BaseException:
        shutil.rmtree(tmp, ignore_errors=True)
        raise
    return final


def read_lineage(out_dir: str, part: int) -> dict:
    with open(os.path.join(part_dir(out_dir, part), "lineage.json")) as f:
        return json.load(f)


def write_manifest(out_dir: str, manifest: dict) -> None:
    tmp = os.path.join(out_dir, "_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "_manifest.json"))


def collect_manifest(out_dir: str) -> dict:
    parts = sorted(done_parts(out_dir))
    recs = [read_lineage(out_dir, p) for p in parts]
    return {
        "partitions": len(parts),
        "rows": sum(r["rows"] for r in recs),
        "raw_bytes": sum(r["raw_bytes"] for r in recs),
        "enc_bytes": sum(r["enc_bytes"] for r in recs),
        "ref_bytes": sum(r.get("ref_bytes", 0) for r in recs),
        "parts": parts,
    }
