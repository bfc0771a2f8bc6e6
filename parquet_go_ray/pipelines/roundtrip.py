"""Round-trip query helpers: read -> encode -> decode -> reassembled table.

These drive the correctness gate: the decoded output must hash-match a plain
``SELECT`` of the same columns (bit-identical values incl. validity), the
pipeline-scale analog of the reference's encode/decode round-trip tests
(encoding/encodingread_test.go, writer/writer_test.go)."""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from ..config import EngineConfig
from ..stages.encode import reassemble_chunk
from .encode_pipeline import encode_dataset


def roundtrip_table(
    sf_dir: str,
    table: str,
    columns: list[str] | None = None,
    codec_map: dict | None = None,
    cfg: EngineConfig | None = None,
) -> rd.Dataset:
    """read_parquet -> chunk-encode -> decode -> original columns."""
    cfg = cfg or EngineConfig()
    if codec_map:
        cfg.per_column_codec = dict(codec_map)
    ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)
    chunks = encode_dataset(ds, cfg)
    return chunks.groupby("chunk_id").map_groups(
        reassemble_chunk, batch_format="pyarrow"
    )


def encode_stats(
    sf_dir: str, table: str, columns: list[str] | None = None, cfg: EngineConfig | None = None
) -> rd.Dataset:
    """sizetool analog (reference: tool/parquet-tools/sizetool/sizetool.go:9-39):
    per-chunk codec choice + raw/encoded byte sizes."""
    cfg = cfg or EngineConfig()
    ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)
    chunks = encode_dataset(ds, cfg)
    return chunks.drop_columns(["blob"])
