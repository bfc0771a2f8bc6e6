"""Shared stage utilities."""

from __future__ import annotations

import functools

import pandas as pd
import pyarrow as pa


def pandas_to_arrow(df: pd.DataFrame) -> pa.Table:
    """pandas -> metadata-free Arrow.  Ray's own pandas->arrow block
    conversion attaches the b'pandas' schema blob, which makes the schema
    unhashable in this pyarrow: every downstream shuffle/sort reduce then
    logs 'Failed to hash the schemas' per block pair and falls back to O(n)
    schema unification.  Converting here keeps all blocks arrow + clean."""
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


def arrow_out(fn):
    """Wrap a pandas-batch fn so its pandas outputs leave as metadata-free
    Arrow blocks (see pandas_to_arrow)."""

    @functools.wraps(fn)
    def wrapped(batch, *args, **kwargs):
        out = fn(batch, *args, **kwargs)
        if isinstance(out, pd.DataFrame):
            return pandas_to_arrow(out)
        if isinstance(out, pa.Table) and out.schema.metadata:
            return out.replace_schema_metadata(None)
        return out

    return wrapped


def polars_mod():
    """Import polars defensively for use inside Ray worker UDFs.

    polars populates ``polars._reexport`` lazily; if a worker's first import
    is interrupted (task error / OOM mid-import), sys.modules caches the
    partially-initialized module and every later ``pl.from_arrow`` in that
    worker dies with ``module 'polars._reexport' has no attribute
    'DataFrame'`` (observed as a rare full-suite flake).  Detect the broken
    state and re-import from scratch."""
    import sys

    import polars as pl

    try:
        pl._reexport.DataFrame  # noqa: B018 — touch the lazy re-export
        return pl
    except AttributeError:
        for k in [k for k in sys.modules if k == "polars" or k.startswith("polars.")]:
            del sys.modules[k]
        import polars as pl  # noqa: F811

        return pl
