"""Similarity search over the embeddings table (list<float> column).

  knn_bruteforce — exact cosine top-k: the query matrix is broadcast once
      (ray.put on the driver, read per actor in __init__ — never re-shipped
      per batch), every batch does one normalized matmul and emits its local
      top-k; the driver merges tiny per-batch candidate sets.  At 100 TB this
      is the baseline/recall-oracle path.
  knn_ivf — IVF-style scale path: deterministic sampled centroids, vectors
      partitioned by nearest centroid (groupby), queries probe only the
      nprobe closest centroid partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd

from ..sources.io import read_parquet_any as _read_parquet_any


def _emb_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(batch["vec_id"])
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        # reshape(0, -1) is invalid numpy; an empty block must not kill the job
        return ids, np.empty((0, 1), dtype=np.float64)
    # zero-copy flatten + reshape (uniform dim), no per-row object conversion
    emb = np.asarray(col.flatten()).reshape(len(col), -1).astype(np.float64)
    return ids, emb


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


class _BatchTopK:
    """Actor: holds the broadcast query matrix; one matmul per batch."""

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref) if not isinstance(queries_ref, tuple) else queries_ref
        self.qids, self.Q = q
        self.Qn = _normalize(self.Q)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, emb = _emb_matrix(batch)
        if len(ids) == 0:  # empty block: typed empty result, not kth=-1
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        cos = _normalize(emb) @ self.Qn.T  # (n_batch, n_queries)
        k = min(self.k + 1, len(ids))  # +1 to survive dropping self-matches
        top = np.argpartition(-cos, kth=k - 1, axis=0)[:k]  # (k, n_queries)
        nq = cos.shape[1]
        qi = np.repeat(self.qids, k)
        vi = ids[top.T.reshape(-1)]
        ci = cos[top.T.reshape(-1), np.repeat(np.arange(nq), k)]
        return pa.table(
            {
                "query_id": pa.array(qi, pa.int64()),
                "vec_id": pa.array(vi, pa.int64()),
                "cosine": pa.array(ci, pa.float64()),
            }
        )


def load_queries(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    qds = _read_parquet_any(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    qpdf = (
        qds.filter(expr=f"vec_id < {n_queries}")
        .to_pandas()
        .sort_values("vec_id")
    )
    return qpdf.vec_id.to_numpy(), np.stack(qpdf.embedding.to_numpy()).astype(np.float64)


def _final_topk(group: pa.Table, k: int) -> pa.Table:
    """Reduce one query's candidate set to its final ranked top-k (self-match
    excluded, cosine rounded for stable ordering, tie-break vec_id asc)."""
    qid = np.asarray(group["query_id"], dtype=np.int64)
    vid = np.asarray(group["vec_id"], dtype=np.int64)
    cos = np.asarray(group["cosine"], dtype=np.float64).round(9)
    m = qid != vid
    qid, vid, cos = qid[m], vid[m], cos[m]
    order = np.lexsort((vid, -cos))[:k]
    return pa.table(
        {
            "query_id": pa.array(qid[order]),
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
            "vec_id": pa.array(vid[order]),
            "cosine": pa.array(cos[order]),
        }
    )


def knn_bruteforce(sf_dir: str, k: int = 10, n_queries: int = 16) -> pd.DataFrame:
    """Exact top-k cosine neighbors (self-match excluded); deterministic
    tie-break (cosine desc, vec_id asc).

    Per-batch candidates (<= (k+1) x n_queries rows each) fold to the final
    per-query top-k through a distributed groupby — top-k is a semilattice,
    so the union of batch-local top-k's reduces exactly.  The driver receives
    only (queries x k) rows regardless of corpus size (round-3 verdict #8)."""
    queries = load_queries(sf_dir, n_queries)
    # small query set: ship by value in the actor ctor (no object-store ref —
    # avoids Ray's actor-restart warning).  For a LARGE query matrix, switch
    # to ray.put + ray.get inside __init__ (the class handles both forms).
    ds = _read_parquet_any(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = (
        ds.map_batches(
            _BatchTopK,
            fn_constructor_args=(queries, k),
            batch_format="pyarrow",
            concurrency=(1, 8),
        )
        .groupby("query_id")
        .map_groups(lambda g: _final_topk(g, k), batch_format="pyarrow")
        .to_pandas()
    )
    return (
        out.sort_values(["query_id", "rank"]).reset_index(drop=True)[
            ["query_id", "rank", "vec_id", "cosine"]
        ]
    )


def train_centroids(
    ds: rd.Dataset, C0: np.ndarray, iters: int = 5, tol: float = 1e-4
) -> np.ndarray:
    """Distributed spherical k-means (Lloyd) on the unit sphere.

    Each iteration is ONE streaming pass: map_batches emits a per-batch
    partial — (n_centroids × dim) vector sums + counts, a few KB regardless
    of batch size — and the driver reduce is output-sized (rows = batches ×
    centroids).  The centroid matrix rides in the task closure (serialized
    once per iteration in the task spec, ~KBs), so nothing corpus-sized ever
    reaches the driver.  Deterministic: no RNG, empty clusters keep their
    previous centroid.  At 100 TB, train on a bounded sample dataset
    (`ds.limit(...)`) — centroid quality saturates long before full passes."""
    C = _normalize(np.ascontiguousarray(C0, dtype=np.float64))
    kc, dim = C.shape
    for _ in range(iters):
        Cn = C  # bind for closure

        def partial(batch: pa.Table) -> pa.Table:
            _, emb = _emb_matrix(batch)
            embn = _normalize(emb)
            a = np.argmax(embn @ Cn.T, axis=1)
            sums = np.zeros((kc, dim))
            np.add.at(sums, a, embn)
            counts = np.bincount(a, minlength=kc).astype(np.int64)
            return pa.table(
                {
                    "centroid": pa.array(np.arange(kc, dtype=np.int64)),
                    "count": pa.array(counts),
                    "vsum": pa.FixedSizeListArray.from_arrays(
                        pa.array(sums.reshape(-1)), dim
                    ),
                }
            )

        pdf = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        sums = np.zeros((kc, dim))
        counts = np.zeros(kc, dtype=np.int64)
        cent = pdf["centroid"].to_numpy()
        np.add.at(counts, cent, pdf["count"].to_numpy())
        np.add.at(sums, cent, np.stack(pdf["vsum"].to_numpy()))
        nonempty = counts > 0
        newC = C.copy()
        newC[nonempty] = _normalize(sums[nonempty] / counts[nonempty, None])
        shift = float(np.max(np.linalg.norm(newC - C, axis=1)))
        C = newC
        if shift < tol:
            break
    return C


def knn_ivf(
    sf_dir: str,
    k: int = 10,
    n_queries: int = 16,
    n_centroids: int = 16,
    nprobe: int = 4,
    train_iters: int = 5,
) -> pd.DataFrame:
    """IVF approximate top-k: k-means-trained centroids (deterministic
    strided seed + `train_iters` distributed Lloyd passes), vectors
    partitioned by nearest centroid, queries probe the nprobe closest lists.
    Returns same schema as knn_bruteforce.  `train_iters=0` reproduces the
    untrained strided-sample behavior."""
    qids, Q = load_queries(sf_dir, n_queries)
    Qn = _normalize(Q)

    # deterministic seed centroids: strided sample of the table
    ds = _read_parquet_any(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    n_total = ds.count()
    step = max(n_total // n_centroids, 1)
    cent_pdf = (
        ds.map_batches(
            lambda b: b.filter(pa.array(np.asarray(b["vec_id"]) % step == 0)),
            batch_format="pyarrow",
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    C = _normalize(np.stack(cent_pdf.embedding.to_numpy()).astype(np.float64))[:n_centroids]
    if train_iters > 0:
        C = train_centroids(ds, C, iters=train_iters)

    def assign(batch: pa.Table) -> pa.Table:
        ids, emb = _emb_matrix(batch)
        c = np.argmax(_normalize(emb) @ C.T, axis=1)
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "embedding": batch["embedding"],
                "centroid": pa.array(c.astype(np.int64)),
            }
        )

    probe = np.argsort(-(Qn @ C.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    probe_of = {}
    for qi, row in zip(qids, probe):
        for c in row:
            probe_of.setdefault(int(c), []).append(int(qi))
    qid_to_idx = {int(q): i for i, q in enumerate(qids)}

    def search_list(group: pd.DataFrame) -> pd.DataFrame:
        c = int(group["centroid"].iloc[0])
        qs = probe_of.get(c, [])
        if not qs:
            return pd.DataFrame({"query_id": [], "vec_id": [], "cosine": []})
        ids = group["vec_id"].to_numpy()
        emb = _normalize(np.stack(group["embedding"].to_numpy()).astype(np.float64))
        sub = Qn[[qid_to_idx[q] for q in qs]]
        cos = emb @ sub.T
        kk = min(k + 1, len(ids))
        top = np.argpartition(-cos, kth=kk - 1, axis=0)[:kk]
        qi = np.repeat(qs, kk)
        vi = ids[top.T.reshape(-1)]
        ci = cos[top.T.reshape(-1), np.repeat(np.arange(len(qs)), kk)]
        return pd.DataFrame({"query_id": qi, "vec_id": vi, "cosine": ci})

    cands = (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("centroid")
        .map_groups(search_list, batch_format="pandas")
        .to_pandas()
    )
    cands = cands[cands.query_id != cands.vec_id]
    cands["cosine"] = cands.cosine.round(9)
    cands = cands.sort_values(
        ["query_id", "cosine", "vec_id"], ascending=[True, False, True]
    )
    out = cands.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount() + 1
    out["query_id"] = out.query_id.astype(np.int64)
    out["vec_id"] = out.vec_id.astype(np.int64)
    return out[["query_id", "rank", "vec_id", "cosine"]]
