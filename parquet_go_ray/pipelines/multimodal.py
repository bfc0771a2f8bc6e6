"""Multimodal columns: opaque binary payloads + typed metadata.

The decode kernels themselves are STUBBED (no image/audio libs in this
container — an import-try picks the real library when present, else a
clearly-marked deterministic fake), but the Ray-side plumbing is real and
tested: schema, small-batch sizing for fat binary rows, actor-pool stage
shape, vectorized batch bodies, output layout.

    make_media_table   — deterministic synthetic (id, payload, mime, meta)
    media_from_documents — payloads derived from the documents table so the
                           driver can oracle sha-derived outputs in SQL
    ImageFeatureStage  — actor: decode -> resize -> feature-extract
    AudioSampleStage   — actor: decode -> frame-sample
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd

from ..sources.io import read_parquet_any as _read_parquet_any

MEDIA_BATCH_ROWS = 64  # binary payloads are fat: keep batches small


def make_media_table(n: int, seed: int = 42) -> pa.Table:
    rng = np.random.default_rng(seed)
    mimes = np.array(["image/png", "image/jpeg", "audio/wav"])
    payload_lens = rng.integers(1_000, 20_000, n)
    payloads = [bytes(rng.integers(0, 256, l, dtype=np.uint8)) for l in payload_lens]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n), pa.int64()),
            "mime": pa.array(mimes[rng.integers(0, 3, n)]),
            "payload": pa.array(payloads, pa.large_binary()),
            "width": pa.array(rng.integers(64, 4096, n), pa.int32()),
            "height": pa.array(rng.integers(64, 4096, n), pa.int32()),
        }
    )


def media_from_documents(sf_dir: str) -> rd.Dataset:
    """(media_id, mime, payload) derived deterministically from documents:
    payload = utf8 bytes of text, mime cycles by doc_id — reproducible in
    SQL, so sha-derived stage outputs are oracle-checkable."""
    ds = _read_parquet_any(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"], dtype=np.int64)
        mimes = np.array(["image/png", "image/jpeg", "audio/wav"])[ids % 3]
        return pa.table(
            {
                "media_id": b["doc_id"],
                "mime": pa.array(mimes),
                "payload": b["text"].cast(pa.large_binary()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


class ImageFeatureStage:
    """decode -> resize(target) -> feature vector.  Real decode only if PIL
    exists; otherwise the deterministic sha-derived fake keeps the pipeline
    testable AND SQL-oracle-able.  Batch body is vectorized: the only
    per-row work is the C sha256 kernel over each payload."""

    DIM = 8

    def __init__(self, target: tuple[int, int] = (224, 224)):
        self.target = target
        try:
            from PIL import Image  # noqa: F401

            self.real = True
        except ImportError:
            self.real = False

    def _decode_real(self, payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            "real image decode requires PIL; this container runs the stub"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        mime = batch["mime"]
        if isinstance(mime, pa.ChunkedArray):
            mime = mime.combine_chunks()
        payload = batch["payload"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        import pyarrow.compute as pc

        is_img = np.asarray(pc.starts_with(mime.cast(pa.string()), "image/"))
        if self.real:  # pragma: no cover — no PIL in this container
            raise NotImplementedError
        # sha256 per payload (C kernel), parsed into features in one
        # vectorized pass over the concatenated digest buffer
        digests = b"".join(
            hashlib.sha256(p).digest() if ok else b"\0" * 32
            for p, ok in zip(payload.to_pylist(), is_img)
        )
        mat = (
            np.frombuffer(digests, dtype="<u4")
            .reshape(n, 8)[:, : self.DIM]
            .astype(np.float32)
            / np.float32(2**32)
        )
        sha_hex = [digests[i * 32 : (i + 1) * 32].hex() for i in range(n)]
        flat = np.where(np.repeat(is_img, self.DIM), mat.reshape(-1), np.float32(0))
        offsets = pa.array(np.arange(0, (n + 1) * self.DIM, self.DIM, dtype=np.int32))
        feats = pa.ListArray.from_arrays(offsets, pa.array(flat, pa.float32()))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "decoded_ok": pa.array(is_img),
                "target_w": pa.array(np.full(n, self.target[0], dtype=np.int32)),
                "target_h": pa.array(np.full(n, self.target[1], dtype=np.int32)),
                "payload_sha": pa.array(
                    [h if ok else "" for h, ok in zip(sha_hex, is_img)], pa.string()
                ),
                "features": feats,
            }
        )


class AudioSampleStage:
    """decode -> fixed-rate frame sample (stubbed decode, real plumbing).
    Fully vectorized: one strided gather over the concatenated payload
    buffer for the whole batch."""

    def __init__(self, n_frames: int = 16):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..codecs.base import binary_parts

        n = batch.num_rows
        mime = batch["mime"]
        if isinstance(mime, pa.ChunkedArray):
            mime = mime.combine_chunks()
        payload = batch["payload"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        import pyarrow.compute as pc

        is_audio = np.asarray(pc.starts_with(mime.cast(pa.string()), "audio/"))
        lengths, data = binary_parts(payload)
        starts = np.concatenate(([0], np.cumsum(lengths[:-1])))
        k = self.n_frames
        # per-row linspace over [0, len-1], vectorized for the whole batch
        frac = np.arange(k, dtype=np.float64) / max(k - 1, 1)
        idx = starts[:, None] + (
            frac[None, :] * np.maximum(lengths - 1, 0)[:, None]
        ).astype(np.int64)  # truncate, matching np.linspace(...).astype(int64)
        idx = np.clip(idx, 0, max(len(data) - 1, 0))
        if len(data):
            frames = data[idx].astype(np.float32) / np.float32(255.0)
        else:
            frames = np.zeros((n, k), dtype=np.float32)
        keep = is_audio & (lengths > 0)
        counts = np.where(keep, k, 0).astype(np.int32)
        offsets = pa.array(np.concatenate(([0], np.cumsum(counts))).astype(np.int32))
        flat = frames[keep].reshape(-1)
        out = pa.ListArray.from_arrays(offsets, pa.array(flat, pa.float32()))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "is_audio": pa.array(is_audio),
                "frames": out,
            }
        )


def image_features(media: rd.Dataset) -> rd.Dataset:
    return media.map_batches(
        ImageFeatureStage,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_ROWS,
        concurrency=(1, 4),
    )


def audio_frames(media: rd.Dataset) -> rd.Dataset:
    return media.map_batches(
        AudioSampleStage,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_ROWS,
        concurrency=(1, 4),
    )


def image_features_docs(sf_dir: str) -> rd.Dataset:
    """Oracled projection: sha-derived features over documents-backed media
    (DuckDB twin: sha256(text) where doc_id%3 < 2)."""
    out = image_features(media_from_documents(sf_dir))
    return out.select_columns(["media_id", "decoded_ok", "payload_sha"])


def audio_frames_docs(sf_dir: str) -> rd.Dataset:
    """Frame-sampling over documents-backed media; frame values are engine-
    side (strided byte gather), rows+schema checked by the driver."""
    out = audio_frames(media_from_documents(sf_dir))

    def proj(b: pa.Table) -> pa.Table:
        fr = b["frames"]
        if isinstance(fr, pa.ChunkedArray):
            fr = fr.combine_chunks()
        import pyarrow.compute as pc

        return pa.table(
            {
                "media_id": b["media_id"],
                "is_audio": b["is_audio"],
                "n_frames": pc.list_value_length(fr).cast(pa.int64()),
            }
        )

    return out.map_batches(proj, batch_format="pyarrow")
