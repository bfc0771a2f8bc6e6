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

    def __init__(self, target: tuple[int, int] = (224, 224), use_real: bool = False):
        self.target = target
        # OPT-IN, never probed: auto-detecting PIL used to flip self.real on
        # any machine with pillow installed — and then crash every batch,
        # because _decode_real is an honest stub.  The deterministic
        # sha-derived fake is the supported path; a deployment with real
        # decode passes use_real=True together with its own _decode_real.
        self.real = use_real

    def _decode_real(self, payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            "real image decode is deliberately stubbed (no image library in "
            "this container); subclass and override _decode_real, then "
            "construct with use_real=True"
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
        if self.real:  # pragma: no cover — opt-in subclass path
            self._decode_real(b"")  # informative NotImplementedError
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


class VideoFrameSampleStage:
    """decode -> evenly-spaced frame sample over a video payload.

    Real container demuxing (mp4/mkv) is stubbed like ImageFeatureStage's
    codec decode — no av/ffmpeg in this container; subclass and override
    ``_decode_real``.  The deterministic fake treats the payload as raw
    consecutive ``frame_bytes``-sized frames (an uncompressed-stream model),
    samples ``n_frames`` evenly among the full frames, and emits per-frame
    mean byte values — one vectorized (rows × k × frame_bytes) gather for
    the whole batch, no per-row Python.  Output layout (ids, flags, counts,
    list<float32> features) is the real dataloader-facing shape."""

    def __init__(self, n_frames: int = 8, frame_bytes: int = 32, use_real: bool = False):
        self.n_frames = n_frames
        self.frame_bytes = frame_bytes
        self.real = use_real

    def _decode_real(self, payload: bytes) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError(
            "real video demux/decode needs an av/ffmpeg binding (absent in "
            "this container); subclass and override _decode_real, then "
            "construct with use_real=True"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..codecs.base import binary_parts

        import pyarrow.compute as pc

        n = batch.num_rows
        mime = batch["mime"]
        if isinstance(mime, pa.ChunkedArray):
            mime = mime.combine_chunks()
        payload = batch["payload"]
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        is_video = np.asarray(pc.starts_with(mime.cast(pa.string()), "video/"))
        lengths, data = binary_parts(payload)
        fb = self.frame_bytes
        n_total = np.where(is_video, lengths // fb, 0).astype(np.int64)
        k_row = np.minimum(n_total, self.n_frames).astype(np.int64)
        if self.real:  # pragma: no cover — opt-in subclass path
            feats = [
                self._decode_real(bytes(p)) if v else np.empty(0, np.float32)
                for p, v in zip(payload.to_pylist(), is_video)
            ]
            flat = np.concatenate(feats) if feats else np.empty(0, np.float32)
            counts = np.array([len(f) for f in feats], dtype=np.int32)
            # a real decoder returns one value per DECODED frame and the
            # container's total frame count isn't known without demux
            # metadata: report both counts from the decoded result so
            # n_sampled always equals len(frame_means[i]) (the byte-model
            # n_total below would be meaningless for a compressed container)
            n_total = counts.astype(np.int64)
            k_row = counts.astype(np.int64)
        else:
            k = self.n_frames
            starts = np.concatenate(([0], np.cumsum(lengths[:-1])))
            # evenly-spaced frame indices in [0, n_total-1], truncated —
            # rows with fewer than k frames reuse index 0 but only the
            # first k_row entries are kept by the offsets below
            frac = np.arange(k, dtype=np.float64) / max(k - 1, 1)
            fidx = (frac[None, :] * np.maximum(n_total - 1, 0)[:, None]).astype(
                np.int64
            )
            byte0 = starts[:, None, None] + fidx[:, :, None] * fb + np.arange(
                fb, dtype=np.int64
            )[None, None, :]
            byte0 = np.clip(byte0, 0, max(len(data) - 1, 0))
            if len(data):
                means = data[byte0].astype(np.float32).mean(axis=2)
            else:
                means = np.zeros((n, k), dtype=np.float32)
            # keep only each row's first k_row sampled frames
            keep2d = np.arange(k)[None, :] < k_row[:, None]
            flat = means[keep2d]
            counts = k_row.astype(np.int32)
        offsets = pa.array(np.concatenate(([0], np.cumsum(counts))).astype(np.int32))
        out = pa.ListArray.from_arrays(offsets, pa.array(flat, pa.float32()))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "is_video": pa.array(is_video),
                "n_frames_total": pa.array(n_total, pa.int64()),
                "n_sampled": pa.array(k_row, pa.int64()),
                "frame_means": out,
            }
        )


def video_frames(media: rd.Dataset, **kw) -> rd.Dataset:
    return media.map_batches(
        VideoFrameSampleStage,
        fn_constructor_kwargs=kw,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_ROWS,
        concurrency=(1, 4),
    )


def video_frames_docs(sf_dir: str) -> rd.Dataset:
    """Oracled: payload = utf8 text bytes, mime = video/mp4 on even doc_ids
    — frame counts are closed-form in SQL (length(text) // frame_bytes),
    so the driver value-hashes ids, flags and both counts."""
    ds = _read_parquet_any(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(b: pa.Table) -> pa.Table:
        ids = np.asarray(b["doc_id"], dtype=np.int64)
        mimes = np.where(ids % 2 == 0, "video/mp4", "application/octet-stream")
        return pa.table(
            {
                "media_id": b["doc_id"],
                "mime": pa.array(mimes.tolist(), pa.string()),
                "payload": b["text"].cast(pa.large_binary()),
            }
        )

    out = video_frames(ds.map_batches(fn, batch_format="pyarrow"))
    return out.select_columns(["media_id", "is_video", "n_frames_total", "n_sampled"])


# -- REAL decode path: PPM (P6) needs no image library ------------------------
#
# The stubbed JPEG/PNG path above is honest about the missing libs; PPM/BMP
# are uncompressed formats a pure-numpy parser decodes for real.  The
# pipeline below synthesizes actual P6 files as binary payloads, ships them
# through Ray as a large_binary column, and an actor pool parses the bytes
# back into HxWx3 arrays and extracts features — every stage a real decode,
# and the features are closed-form so DuckDB can oracle them exactly.

_PPM_W = _PPM_H = 32


def _ppm_pixels(media_id: int, w: int = _PPM_W, h: int = _PPM_H) -> np.ndarray:
    """Deterministic RGB content (closed form, SQL-expressible):
    r=(id+x*y)%256, g=(2id+x+y)%256, b=(3id+x+2y)%256."""
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    r = (media_id + x * y) % 256
    g = (2 * media_id + x + y) % 256
    b = (3 * media_id + x + 2 * y) % 256
    return np.stack(
        [np.broadcast_to(c, (h, w)) for c in (r, g, b)], axis=-1
    ).astype(np.uint8)


def make_ppm(media_id: int, w: int = _PPM_W, h: int = _PPM_H) -> bytes:
    """A real P6 PPM file: ASCII header + raw big-endian RGB rows."""
    return f"P6\n{w} {h}\n255\n".encode() + _ppm_pixels(media_id, w, h).tobytes()


def decode_ppm(buf: bytes) -> np.ndarray:
    """Pure-numpy P6 parser -> (H, W, 3) uint8.  Raises ValueError on
    malformed input (magic, dims, maxval, payload size)."""
    if not buf.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    fields: list[bytes] = []
    pos = 2
    while len(fields) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":  # comment line
            pos = buf.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(buf) and not buf[end : end + 1].isspace():
            end += 1
        fields.append(buf[pos:end])
        pos = end
    pos += 1  # single whitespace after maxval
    w, h, maxval = (int(f) for f in fields)
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    need = w * h * 3
    raw = buf[pos : pos + need]
    if len(raw) != need:
        raise ValueError(f"payload {len(raw)} != {need}")
    return np.frombuffer(raw, np.uint8).reshape(h, w, 3)


class PpmFeatureStage:
    """Actor: REAL decode (pure-numpy P6 parse) -> per-channel mean
    features.  Setup-free, but kept as a class so the stage shape matches
    the library-backed ImageFeatureStage (actor pool, fat-row batches)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["media_id"].to_pylist()
        means = np.empty((len(ids), 3), np.float64)
        dims = np.empty((len(ids), 2), np.int64)
        for i, payload in enumerate(batch["payload"].to_pylist()):
            img = decode_ppm(payload)
            dims[i] = img.shape[1], img.shape[0]
            # uint8 sums over 1024 px are exact in float64; /2^k is exact ->
            # bit-stable against the SQL oracle's AVG
            means[i] = img.astype(np.float64).mean(axis=(0, 1))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "width": pa.array(dims[:, 0], pa.int64()),
                "height": pa.array(dims[:, 1], pa.int64()),
                "mean_r": pa.array(means[:, 0], pa.float64()),
                "mean_g": pa.array(means[:, 1], pa.float64()),
                "mean_b": pa.array(means[:, 2], pa.float64()),
            }
        )


def image_ppm_features(sf_dir: str) -> rd.Dataset:
    """documents -> one REAL P6 PPM per doc (binary column) -> actor-pool
    decode + feature extract.  The whole chain crosses real bytes: the
    synth stage serializes actual PPM files, the feature stage parses them
    back with no image library."""

    def synth(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_pylist()
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "payload": pa.array([make_ppm(i) for i in ids], pa.large_binary()),
            }
        )

    media = _read_parquet_any(f"{sf_dir}/documents.parquet", columns=["doc_id"]).map_batches(
        synth, batch_format="pyarrow", batch_size=MEDIA_BATCH_ROWS
    )
    return media.map_batches(
        PpmFeatureStage,
        batch_format="pyarrow",
        batch_size=MEDIA_BATCH_ROWS,
        concurrency=2,
    )
