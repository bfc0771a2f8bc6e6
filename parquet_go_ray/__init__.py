"""parquet_go_ray — a Ray-Data-native per-column lightweight-compression engine.

From-scratch reimplementation of the encoding-layer capabilities of
xitongsys/parquet-go (reference at /root/reference, cited per-module as
file:line) as idiomatic Ray Data pipelines: zero-copy Arrow batches through
``map_batches``, actor pools for stateful dictionary/FSST training, explicit
salted partitioning, per-partition lineage checkpoints.
"""

__version__ = "0.1.0"


def _install_ray_log_filter() -> None:
    """Drop ONE specific Ray Data log artifact: the streaming executor warns
    'RefBundle with a different schema ... new schema: .' whenever a task's
    output is entirely empty (hash-shuffle partitions with no keys produce
    block-less bundles whose schema is None — user code cannot attach a
    schema to a bundle that has no blocks).  Real schema divergences (both
    schemas non-empty) still log."""
    import logging

    class _EmptyBundleNoise(logging.Filter):
        def filter(self, record: logging.LogRecord) -> bool:
            msg = record.getMessage()
            return not (
                "RefBundle with a different schema" in msg
                and "new schema: ." in msg
            )

    logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    ).addFilter(_EmptyBundleNoise())


_install_ray_log_filter()


def _register_mock_object_store() -> None:
    """Register the `mocks3://` S3-semantics test backend (lazy: the class
    path string defers the module import to first use).  Runs in every
    process that imports any engine module — including Ray workers — so
    URIs resolve on both sides of a task boundary."""
    try:
        import fsspec

        fsspec.register_implementation(
            "mocks3",
            "parquet_go_ray.sources.objectstore.LocalObjectStoreFS",
            clobber=True,
        )
    except ImportError:
        pass


_register_mock_object_store()
