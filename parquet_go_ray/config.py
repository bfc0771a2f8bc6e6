"""Engine configuration.

Defaults mirror the reference where a corresponding knob exists
(reference: writer/writer.go:63-65 — PageSize 8KB, RowGroupSize 128MB, SNAPPY)
re-tuned for Ray Data block granularity.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class EngineConfig:
    # codec selection
    sample_rows: int = 4096          # rows sampled per chunk for trial encoding
    sample_max_bytes: int = 1 << 20  # byte cap on the trial sample
    expensive_codecs: tuple = ("fsst",)
    expensive_trial_bytes: int = 128 << 10  # trial subsample for slow kernels
    outer_codecs: tuple = ("none", "snappy", "zstd", "zstd7", "zstd9")
    zstd_level: int = 3
    size_tolerance: float = 1.30  # hard guard: candidates more than 30% above
                                  # the smallest trial size are never eligible,
                                  # no matter how fast
    cost_model: str = "static"    # "static": codec cost = calibrated constants
                                  # (tools/calibrate_cost.py) -> selection is a
                                  # pure function of the DATA, identical every
                                  # run.  "measured": cost = trial-encode time
                                  # normalized by a live memcpy baseline —
                                  # adapts to unknown hardware but on this
                                  # 2-4x-phase-swinging host it flipped codec
                                  # choices run-to-run (size_vs_reference 0.50
                                  # vs 0.593 on identical code + input)
    speed_weight: float = 0.7e-4  # cost-weighted pick among eligibles:
                                  # score = ratio + speed_weight * slowdown,
                                  # where slowdown is the STATIC calibrated
                                  # codec cost in memcpy-multiples (see
                                  # cost_model / selector._STATIC_*).
                                  # Semantics: one memcpy-multiple of encode
                                  # time must save speed_weight fraction of
                                  # raw size.  At 0.7e-4 the zstd-class
                                  # outers win decisively over snappy on the
                                  # code corpus AND the zstd7->zstd9 step
                                  # (+60 memcpy-multiples for ~0.5% of raw)
                                  # pays on long text — a compression engine's
                                  # default leans ratio where the cost is one
                                  # parallelizable C kernel; truly slow
                                  # kernels (fsst on long text, delta_ba's
                                  # prefix matching) stay rejected.  0 = pure
                                  # min-size
    enforce_reference_floor: bool = True  # hard per-chunk <= reference-policy size
    per_column_codec: dict = field(default_factory=dict)  # name -> codec override
    plan_codecs_globally: bool = True  # one driver-side plan vs per-chunk trials
    plan_sample_rows: int = 20000
    page_rows: int | None = None     # sub-chunk page index (OffsetIndex analog,
                                     # reference: writer/writer.go:418-481): split
                                     # each scalar chunk into pages of this many
                                     # values, each independently compressed +
                                     # decodable, with per-page offsets in chunk
                                     # meta — row-range reads then decode ONLY the
                                     # overlapping pages (true row-skip for
                                     # dict/delta/rle chunks, not just PLAIN).
                                     # None = single-payload chunks (default)
    # pipeline shape
    cpus_per_encode_task: int = 4    # encode tasks are memory-bandwidth-heavy:
                                     # reserving >1 CPU keeps schedulers from
                                     # oversubscribing the memory bus
    batch_size_rows: int = 8192      # rows per encode batch (chunk granularity;
                                     # sized so a chunk stays cache-resident)
    target_chunk_bytes: int = 64 << 20
    salt_buckets: int | None = None  # repo salting fan-out; None = full spread
                                     # (= partitions): near-uniform partition
                                     # load (measured -31%% wall for ~2%% ratio
                                     # on the code corpus); set small to favor
                                     # repo locality over balance
    partitions: int | None = None    # override output partition count
    sort_within_partition: bool = True  # sort by (repo, path) to help delta_ba
    pack_shuffle: bool = False       # serialize each (block x part) cell into one
                                     # compressed Arrow IPC blob BEFORE the groupby
                                     # exchange: the all-to-all then moves a few
                                     # thousand ~3x-smaller blobs instead of every
                                     # raw row (Spark-style shuffle compression,
                                     # re-expressed inside the Dataset API).  On a
                                     # multi-node cluster the exchange is network-
                                     # bound and this wins ~3x on shuffle bytes; on
                                     # this single-node sandbox the object store is
                                     # shared memory and the extra (de)serialization
                                     # pass measurably LOSES (A/B: 8.1 vs 7.3 s at
                                     # 596 MB) — so default off, enable for real
                                     # network-bound clusters
    pack_codec: str = "lz4"          # IPC body compression for packed cells
    shuffle_strategy: str = "HASH_SHUFFLE"  # groupby exchange: HASH_SHUFFLE
                                     # streams through aggregator actors (no
                                     # sort barrier) and measured ~5x lower
                                     # run-to-run variance than push-based
                                     # sort on this host at equal best case
    bloom_bits_per_value: int = 0    # >0: per-chunk Bloom filter over int/
                                     # string values in the chunk header
                                     # (equality scans prune chunks whose
                                     # min/max span the probe but whose value
                                     # set misses it); 10 bits/value ~ 1% fpp.
                                     # Off by default: the filter bytes count
                                     # against encoded size
    # verification
    verify_sha256: bool = True


DEFAULT = EngineConfig()
