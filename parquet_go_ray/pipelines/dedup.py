"""Deduplication operators over the documents table.

Not present in the reference (SURVEY §2.7: its only dedup-adjacent machinery
is the per-chunk dictionary probe, layout/dictpage.go:104-111 — value-level
exact dedup within a column chunk); these are the corpus-level operators a
100 TB training-data pipeline needs, built Ray-Data-first:

  exact      — vectorized content hash in map_batches, hash-partitioned
               groupby, keep min doc_id per identical text (hash collisions
               disambiguated by exact compare inside the group)
  minhash    — char-shingle rolling hashes -> k=64 minhash via
               np.minimum.reduceat -> LSH bands -> groupby(band, key) buckets
               -> candidate pairs -> exact-Jaccard verify -> min-label
               connected components -> keep cluster representative
  simhash    — 64-bit simhash via np.add.reduceat over token-hash bit matrix,
               16-bit band buckets, Hamming-distance verify
  embedding  — cosine near-dup: random-hyperplane LSH buckets -> in-bucket
               normalized matmul -> threshold

All per-batch math is numpy; the only shuffles are the bucket groupbys
(banded keys are small ints + doc ids, never the full text).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

MERSENNE = (1 << 61) - 1


def _docs(sf_dir: str, columns=None) -> rd.Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def _add_text_hash(batch: pa.Table) -> pa.Table:
    import polars as pl

    h = pl.from_arrow(batch.select(["text"])).with_columns(
        pl.col("text").hash(seed=7).alias("__h")
    )["__h"].to_numpy()
    return batch.append_column("__h", pa.array(h.astype(np.uint64)))


def _keep_first_exact(group: pd.DataFrame) -> pd.DataFrame:
    # one hash bucket: dedup by exact text, keep smallest doc_id
    g = group.sort_values("doc_id").drop_duplicates(subset="text", keep="first")
    return g.drop(columns="__h")


def dedup_exact(sf_dir: str) -> rd.Dataset:
    """Exact text dedup; survivors keep all original columns."""
    ds = _docs(sf_dir).map_batches(_add_text_hash, batch_format="pyarrow")
    return ds.groupby("__h").map_groups(_keep_first_exact, batch_format="pandas")


# ---------------------------------------------------------------------------
# minhash + LSH
# ---------------------------------------------------------------------------

K_HASHES = 64
BANDS = 16
ROWS_PER_BAND = K_HASHES // BANDS
SHINGLE = 5  # char shingle width


def _shingle_hashes(texts: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(hashes, doc_boundaries) of char SHINGLE-grams via vectorized rolling
    polynomial hash; docs shorter than SHINGLE get one hash of the whole doc."""
    from ..codecs.base import binary_parts

    lengths, data = binary_parts(texts)
    n = len(lengths)
    n_sh = np.maximum(lengths - SHINGLE + 1, 1).astype(np.int64)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    # rolling hash: h[i] = sum(data[i+j] * B^j) over window, via cumulative
    # polynomial trick on the whole buffer, per-doc restart handled by taking
    # windows fully inside the doc (start offsets limited to n_sh per doc)
    total = int(n_sh.sum())
    doc_of = np.repeat(np.arange(n, dtype=np.int64), n_sh)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(n_sh[:-1]))), n_sh
    )
    pos = np.repeat(starts, n_sh) + within
    h = np.zeros(total, dtype=np.uint64)
    B = np.uint64(1000003)
    pad = np.zeros(len(data) + SHINGLE, dtype=np.uint8)
    pad[: len(data)] = data
    for j in range(SHINGLE):
        h = h * B + pad[pos + j]
    # avalanche (splitmix-ish) so LSH band slices are well mixed
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    return h, n_sh


def _minhash_sig(texts: pa.Array, seed: int = 0) -> np.ndarray:
    """(n_docs, K_HASHES) uint64 minhash signatures."""
    h, n_sh = _shingle_hashes(texts)
    n = len(n_sh)
    offsets = np.concatenate(([0], np.cumsum(n_sh[:-1])))
    rng = np.random.default_rng(seed)
    A = rng.integers(1, MERSENNE, K_HASHES, dtype=np.uint64) | np.uint64(1)
    C = rng.integers(0, MERSENNE, K_HASHES, dtype=np.uint64)
    sig = np.empty((n, K_HASHES), dtype=np.uint64)
    for k in range(K_HASHES):
        with np.errstate(over="ignore"):
            hk = h * A[k] + C[k]
        sig[:, k] = np.minimum.reduceat(hk, offsets)
    return sig


def minhash_bands(sf_dir: str) -> rd.Dataset:
    """(doc_id, band, key) LSH bucket rows — the shuffle-side payload is
    3 ints per band, never the text."""

    def fn(batch: pa.Table) -> pa.Table:
        sig = _minhash_sig(batch["text"].combine_chunks() if isinstance(batch["text"], pa.ChunkedArray) else batch["text"])
        n = len(sig)
        bands = sig.reshape(n, BANDS, ROWS_PER_BAND)
        keys = np.zeros((n, BANDS), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for r in range(ROWS_PER_BAND):
                keys = keys * np.uint64(0x9E3779B97F4A7C15) + bands[:, :, r]
        doc = np.asarray(batch["doc_id"]).repeat(BANDS)
        band = np.tile(np.arange(BANDS, dtype=np.int64), n)
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "band": pa.array(band, pa.int64()),
                "key": pa.array(keys.reshape(-1).astype(np.int64)),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def _band_pairs(group: pd.DataFrame) -> pd.DataFrame:
    """All bucket pairs within ONE band, vectorized: sort by key, split into
    key-runs, emit each small bucket's pair set.  One task per band instead
    of one map_groups call per (band, key) bucket."""
    keys = group["key"].to_numpy()
    ids = group["doc_id"].to_numpy()
    order = np.argsort(keys, kind="stable")
    ks, di = keys[order], ids[order]
    bounds = np.flatnonzero(np.diff(ks)) + 1
    outs_a, outs_b = [], []
    for bucket in np.split(di, bounds):
        if 2 <= len(bucket) <= 2000:  # skew guard: give up on mega-buckets
            bs = np.sort(bucket)
            a, b = np.triu_indices(len(bs), k=1)
            outs_a.append(bs[a])
            outs_b.append(bs[b])
    if not outs_a:
        return pd.DataFrame({"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64)})
    return pd.DataFrame({"a": np.concatenate(outs_a), "b": np.concatenate(outs_b)})


def jaccard(texts_a: list[str], texts_b: list[str]) -> np.ndarray:
    """Exact char-shingle Jaccard for candidate verification."""
    out = np.empty(len(texts_a))
    for i, (ta, tb) in enumerate(zip(texts_a, texts_b)):
        sa = {ta[j : j + SHINGLE] for j in range(max(len(ta) - SHINGLE + 1, 1))}
        sb = {tb[j : j + SHINGLE] for j in range(max(len(tb) - SHINGLE + 1, 1))}
        inter = len(sa & sb)
        out[i] = inter / max(len(sa) + len(sb) - inter, 1)
    return out


def minhash_candidate_pairs(sf_dir: str) -> pd.DataFrame:
    """Distinct candidate pairs from LSH buckets (a < b)."""
    bands = minhash_bands(sf_dir)
    pairs = bands.groupby("band").map_groups(_band_pairs, batch_format="pandas")
    pdf = pairs.to_pandas()
    return pdf.drop_duplicates().reset_index(drop=True)


def dedup_minhash(sf_dir: str, threshold: float = 0.8) -> rd.Dataset:
    """Near-dup clusters: (doc_id, cluster) for ALL docs; cluster = min doc_id
    reachable through verified near-dup pairs (iterated min-label propagation,
    so transitive chains converge without a driver-side union-find).

    Candidate verification is two-stage: a vectorized minhash-signature
    similarity PREFILTER kills the bulk of LSH false candidates for free, then
    exact shingle-Jaccard runs only on survivors, fanned out over Ray tasks
    with the needed texts broadcast once (ray.put)."""
    cand = minhash_candidate_pairs(sf_dir)
    docs = _docs(sf_dir, ["doc_id"]).to_pandas()
    verified = cand
    if len(cand):
        # signatures for prefilter (driver-held; at 10^12-doc scale this
        # becomes a signature join through the same band groupby instead)
        sig_pdf = (
            _docs(sf_dir, ["doc_id", "text"])
            .map_batches(
                lambda b: pa.table(
                    {
                        "doc_id": b["doc_id"],
                        "sig": pa.array(
                            list(
                                _minhash_sig(
                                    b["text"].combine_chunks()
                                    if isinstance(b["text"], pa.ChunkedArray)
                                    else b["text"]
                                ).astype(np.int64)
                            )
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .to_pandas()
        )
        sig_of = {
            int(d): np.asarray(s, dtype=np.int64)
            for d, s in zip(sig_pdf.doc_id, sig_pdf.sig)
        }
        SA = np.stack([sig_of[a] for a in cand.a])
        SB = np.stack([sig_of[b] for b in cand.b])
        est = (SA == SB).mean(axis=1)
        cand = cand[est >= max(threshold - 0.2, 0.0)].reset_index(drop=True)
    if len(cand):
        need = set(cand.a) | set(cand.b)
        texts = _docs(sf_dir, ["doc_id", "text"]).map_batches(
            lambda b: b.filter(
                pa.array(np.isin(np.asarray(b["doc_id"]), list(need) or [-1]))
            ),
            batch_format="pyarrow",
        ).to_pandas()
        text_of = dict(zip(texts.doc_id, texts.text))
        if len(cand) > 20000:
            # parallel exact verify: broadcast texts once, map over pair batches
            import ray as _ray

            ref = _ray.put(text_of)

            class Verify:
                def __init__(self):
                    self.text_of = _ray.get(ref)

                def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                    j = jaccard(
                        [self.text_of[a] for a in b.a],
                        [self.text_of[x] for x in b.b],
                    )
                    return b[j >= threshold]

            verified = (
                rd.from_pandas(cand)
                .repartition(64)
                .map_batches(Verify, batch_format="pandas", concurrency=(2, 16))
                .to_pandas()
            )
        else:
            j = jaccard([text_of[a] for a in cand.a], [text_of[b] for b in cand.b])
            verified = cand[j >= threshold]
    else:
        verified = cand
    # min-label propagation over the pair graph (small: pairs only)
    label = {int(d): int(d) for d in docs.doc_id}
    edges = list(zip(verified.a.astype(int), verified.b.astype(int)))
    changed = True
    while changed:
        changed = False
        for a, b in edges:
            m = min(label[a], label[b])
            if label[a] != m or label[b] != m:
                label[a] = label[b] = m
                changed = True
    out = pd.DataFrame(
        {"doc_id": list(label.keys()), "cluster": list(label.values())}
    ).sort_values("doc_id")
    return rd.from_pandas(out)


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.5) -> pd.DataFrame:
    """Verified near-dup pairs with their exact char-n-gram Jaccard score
    (a, b, jaccard).  Candidates come from the MinHash-LSH buckets, so the
    exact O(len) set comparison only runs on plausible pairs — the standalone
    n-gram-Jaccard operator from the training-data op list."""
    cand = minhash_candidate_pairs(sf_dir)
    if not len(cand):
        return pd.DataFrame(
            {"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64), "jaccard": pd.Series(dtype=np.float64)}
        )
    need = set(cand.a) | set(cand.b)
    texts = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: b.filter(pa.array(np.isin(np.asarray(b["doc_id"]), list(need)))),
        batch_format="pyarrow",
    ).to_pandas()
    text_of = dict(zip(texts.doc_id, texts.text))
    j = jaccard([text_of[a] for a in cand.a], [text_of[b] for b in cand.b])
    out = cand.assign(jaccard=np.round(j, 6))
    out = out[out.jaccard >= threshold].sort_values(["a", "b"]).reset_index(drop=True)
    return out


def dedup_minhash_survivors(sf_dir: str, threshold: float = 0.8) -> pd.DataFrame:
    lab = dedup_minhash(sf_dir, threshold).to_pandas()
    return lab[lab.doc_id == lab.cluster][["doc_id"]].reset_index(drop=True)


# ---------------------------------------------------------------------------
# simhash
# ---------------------------------------------------------------------------


def simhash_signatures(sf_dir: str) -> rd.Dataset:
    """(doc_id, simhash) — 64-bit simhash over char shingles, vectorized via
    per-bit weighted sums with np.add.reduceat."""

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        h, n_sh = _shingle_hashes(texts)
        offsets = np.concatenate(([0], np.cumsum(n_sh[:-1])))
        n = len(n_sh)
        sig = np.zeros(n, dtype=np.uint64)
        for bit in range(64):
            bits = ((h >> np.uint64(bit)) & np.uint64(1)).astype(np.int64) * 2 - 1
            s = np.add.reduceat(bits, offsets)
            sig |= (s > 0).astype(np.uint64) << np.uint64(bit)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "simhash": pa.array(sig.astype(np.int64)),
            }
        )

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(fn, batch_format="pyarrow")


def dedup_simhash(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """Near-dup pairs (a, b, hamming) via 16-bit band buckets + verify."""
    sig = simhash_signatures(sf_dir).to_pandas()
    s = sig.simhash.to_numpy().astype(np.uint64)
    ids = sig.doc_id.to_numpy()
    cand = set()
    for band in range(4):
        key = (s >> np.uint64(16 * band)) & np.uint64(0xFFFF)
        order = np.argsort(key, kind="stable")
        ks = key[order]
        bounds = np.flatnonzero(np.diff(ks)) + 1
        for grp in np.split(order, bounds):
            if 2 <= len(grp) <= 2000:
                gi = np.sort(ids[grp])
                a, b = np.triu_indices(len(gi), k=1)
                cand.update(zip(gi[a].tolist(), gi[b].tolist()))
    if not cand:
        return pd.DataFrame({"a": [], "b": [], "hamming": []}, dtype=np.int64)
    arr = np.array(sorted(cand), dtype=np.int64)
    id_to_sig = dict(zip(ids.tolist(), s.tolist()))
    sa = np.array([id_to_sig[a] for a in arr[:, 0]], dtype=np.uint64)
    sb = np.array([id_to_sig[b] for b in arr[:, 1]], dtype=np.uint64)
    ham = np.array([bin(int(x)).count("1") for x in (sa ^ sb)])
    keep = ham <= max_hamming
    return pd.DataFrame({"a": arr[keep, 0], "b": arr[keep, 1], "hamming": ham[keep]})


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


def dedup_embedding(sf_dir: str, threshold: float = 0.95, planes: int = 8) -> pd.DataFrame:
    """Near-dup vector pairs via random-hyperplane LSH buckets + in-bucket
    cosine matmul.  The bucket key keeps the shuffle payload tiny at scale."""
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def to_bucket(batch: pa.Table) -> pa.Table:
        emb = np.stack(batch["embedding"].to_pandas().to_numpy())
        # fixed-seed hyperplanes: deterministic across tasks, no broadcast needed
        Hl = np.random.default_rng(11).normal(size=(emb.shape[1], planes))
        nrm = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        bits = (nrm @ Hl > 0).astype(np.uint64)
        key = (bits << np.arange(planes, dtype=np.uint64)).sum(axis=1)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "bucket": pa.array(key.astype(np.int64)),
                "embedding": batch["embedding"],
            }
        )

    def in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        emb = np.stack(group["embedding"].to_numpy()).astype(np.float64)
        ids = group["vec_id"].to_numpy()
        nrm = emb / np.maximum(np.linalg.norm(emb, axis=1, keepdims=True), 1e-12)
        cos = nrm @ nrm.T
        a, b = np.triu_indices(len(ids), k=1)
        m = cos[a, b] >= threshold
        order = np.argsort(ids)
        ids_s = ids  # already arbitrary order; emit canonical a<b
        aa, bb = ids[a[m]], ids[b[m]]
        lo, hi = np.minimum(aa, bb), np.maximum(aa, bb)
        return pd.DataFrame({"a": lo, "b": hi, "cosine": np.round(cos[a, b][m], 6)})

    buckets = ds.map_batches(to_bucket, batch_format="pyarrow")
    pairs = buckets.groupby("bucket").map_groups(in_bucket, batch_format="pandas")
    pdf = pairs.to_pandas()
    if len(pdf) == 0 or "a" not in pdf.columns:
        return pd.DataFrame({"a": pd.Series(dtype=np.int64), "b": pd.Series(dtype=np.int64), "cosine": pd.Series(dtype=np.float64)})
    pdf = pdf.drop_duplicates(subset=["a", "b"]).reset_index(drop=True)
    return pdf.sort_values(["a", "b"]).reset_index(drop=True)
