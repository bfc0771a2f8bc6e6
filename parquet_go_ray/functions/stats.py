"""Column statistics aggregation — the reference's only aggregate surface
(reference: min/max/null-count comparators common/common.go:767-930, folded
page->chunk at layout/chunk.go:30-43), generalized to a distributed
partial-aggregate: per-batch (column, n, nulls, min, max) rows inside
map_batches, then one tiny groupby fold — no full-table shuffle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..sources.io import read_parquet_any as _read_parquet_any


def _batch_stats(columns: list[str]):
    def fn(batch: pa.Table) -> pa.Table:
        rows = {"column": [], "n": [], "nulls": [], "min_v": [], "max_v": []}
        for c in columns:
            col = batch[c]
            rows["column"].append(c)
            rows["n"].append(len(col))
            rows["nulls"].append(col.null_count)
            mm = pc.min_max(col)
            rows["min_v"].append(mm["min"].as_py())
            rows["max_v"].append(mm["max"].as_py())
        return pa.table(
            {
                "column": pa.array(rows["column"]),
                "n": pa.array(rows["n"], pa.int64()),
                "nulls": pa.array(rows["nulls"], pa.int64()),
                "min_v": pa.array(rows["min_v"], pa.float64()),
                "max_v": pa.array(rows["max_v"], pa.float64()),
            }
        )

    return fn


def numeric_column_stats(sf_dir: str, table: str, columns: list[str]) -> pa.Table:
    """Distributed min/max/null-count/count for numeric columns."""
    ds = _read_parquet_any(f"{sf_dir}/{table}.parquet", columns=columns)
    partials = ds.map_batches(_batch_stats(columns), batch_format="pyarrow")
    pdf = partials.to_pandas()  # tiny: one row per (batch, column)
    agg = (
        pdf.groupby("column", sort=True)
        .agg(n=("n", "sum"), nulls=("nulls", "sum"), min_v=("min_v", "min"), max_v=("max_v", "max"))
        .reset_index()
    )
    return pa.Table.from_pandas(agg, preserve_index=False).replace_schema_metadata(None)


def stats_oracle_sql(table: str, columns: list[str]) -> str:
    parts = [
        f"SELECT '{c}' AS column, COUNT(*) AS n, "
        f"COUNT(*) - COUNT({c}) AS nulls, "  # stays BIGINT (SUM(CASE..) is hugeint -> decimal128, hash-mismatch)
        f"CAST(MIN({c}) AS DOUBLE) AS min_v, CAST(MAX({c}) AS DOUBLE) AS max_v FROM {table}"
        for c in columns
    ]
    return " UNION ALL ".join(parts)
