"""Source front-ends — the reference's writer/reader front-end matrix
(reference: writer/json.go:14-46 JSONWriter, writer/csv.go:16-71 CSVWriter,
writer/arrow.go:22-85 ArrowWriter, reader/reader.go:41-89) re-expressed as
Ray Data sources/sinks.  Arrow needs no transpose here (the reference's
row-transpose at writer/arrow.go:63-85 is an artifact of its row-based
writer; Ray blocks are already Arrow — SURVEY §2.1 flags this as dropped).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from ..config import DEFAULT, EngineConfig
from ..pipelines.encode_pipeline import encode_dataset


def read_csv_typed(paths, schema: dict[str, pa.DataType] | None = None) -> rd.Dataset:
    """CSV -> typed Dataset (arrow's C++ converter plays StrToParquetType,
    reference: types/types.go:81-204)."""
    from pyarrow import csv as pacsv

    opts = None
    if schema:
        opts = pacsv.ConvertOptions(column_types=schema)
    return rd.read_csv(paths, convert_options=opts) if opts else rd.read_csv(paths)


def read_json_rows(paths) -> rd.Dataset:
    """JSON-lines -> Dataset (reference: marshal/json.go:18-244 semantics)."""
    return rd.read_json(paths)


def from_arrow(table: pa.Table) -> rd.Dataset:
    return rd.from_arrow(table)


def encode_from_csv(paths, cfg: EngineConfig = DEFAULT, schema=None) -> rd.Dataset:
    """CSVWriter analog: CSV rows -> encoded chunk table."""
    return encode_dataset(read_csv_typed(paths, schema), cfg)


def encode_from_json(paths, cfg: EngineConfig = DEFAULT) -> rd.Dataset:
    """JSONWriter analog: JSON rows -> encoded chunk table."""
    return encode_dataset(read_json_rows(paths), cfg)


def encode_from_arrow(table: pa.Table, cfg: EngineConfig = DEFAULT) -> rd.Dataset:
    """ArrowWriter analog, minus the reference's row transpose."""
    return encode_dataset(from_arrow(table), cfg)
