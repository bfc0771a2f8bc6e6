"""Multimodal columns: opaque binary payloads + typed metadata.

The decode kernels themselves are STUBBED (no image/audio libs in this
container — an import-try picks the real library when present, else a
clearly-marked deterministic fake), but the Ray-side plumbing is real and
tested: schema, small-batch sizing for fat binary rows, actor-pool stage
shape, output layout.

    make_media_table   — deterministic synthetic (id, payload, mime, meta)
    ImageFeatureStage  — actor: decode -> resize -> feature-extract
    AudioSampleStage   — actor: decode -> frame-sample
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

import ray.data as rd

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


def _fake_features(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in for a real image-embedding model."""
    d = hashlib.sha256(payload).digest()
    return np.frombuffer(d[: dim * 4], dtype=np.uint32).astype(np.float32) / 2**32


class ImageFeatureStage:
    """decode -> resize(target) -> feature vector.  Real decode only if PIL
    exists; otherwise the deterministic fake keeps the pipeline testable."""

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
        feats, ok = [], []
        for i in range(batch.num_rows):
            mime = batch["mime"][i].as_py()
            payload = batch["payload"][i].as_py()
            if not mime.startswith("image/"):
                feats.append([])
                ok.append(False)
                continue
            if self.real:
                arr = self._decode_real(payload)  # pragma: no cover
                feats.append(arr.tolist())
            else:
                feats.append(_fake_features(payload).tolist())
            ok.append(True)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "decoded_ok": pa.array(ok, pa.bool_()),
                "target_w": pa.array([self.target[0]] * batch.num_rows, pa.int32()),
                "target_h": pa.array([self.target[1]] * batch.num_rows, pa.int32()),
                "features": pa.array(feats, pa.list_(pa.float32())),
            }
        )


class AudioSampleStage:
    """decode -> fixed-rate frame sample (stubbed decode, real plumbing)."""

    def __init__(self, n_frames: int = 16):
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        frames, is_audio = [], []
        for i in range(batch.num_rows):
            mime = batch["mime"][i].as_py()
            payload = batch["payload"][i].as_py()
            if not mime.startswith("audio/"):
                # empty frame list (not null): keeps the column a clean
                # fixed-ragged list type through pandas/tensor conversions
                frames.append([])
                is_audio.append(False)
                continue
            # deterministic fake "samples": strided bytes as float frames
            raw = np.frombuffer(payload, dtype=np.uint8)
            idx = np.linspace(0, len(raw) - 1, self.n_frames).astype(np.int64)
            frames.append((raw[idx].astype(np.float32) / 255.0).tolist())
            is_audio.append(True)
        return pa.table(
            {
                "media_id": batch["media_id"],
                "is_audio": pa.array(is_audio, pa.bool_()),
                "frames": pa.array(frames, pa.list_(pa.float32())),
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
