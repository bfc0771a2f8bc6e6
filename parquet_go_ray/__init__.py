"""parquet_go_ray — a Ray-Data-native per-column lightweight-compression engine.

From-scratch reimplementation of the encoding-layer capabilities of
xitongsys/parquet-go (reference at /root/reference, cited per-module as
file:line) as idiomatic Ray Data pipelines: zero-copy Arrow batches through
``map_batches``, actor pools for stateful dictionary/FSST training, explicit
salted partitioning, per-partition lineage checkpoints.
"""

__version__ = "0.1.0"
