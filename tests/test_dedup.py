"""Dedup operators: planted duplicates must be found; exact matches oracle
semantics (keep min doc_id)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def planted(ray_session, tmp_path_factory):
    """documents table with planted exact + near dups."""
    import pyarrow.parquet as pq

    base = [
        "the quick brown fox jumps over the lazy dog " * 5,
        "pack my box with five dozen liquor jugs " * 5,
        "how vexingly quick daft zebras jump " * 5,
        "sphinx of black quartz judge my vow " * 5,
    ]
    texts, srcs = [], []
    for i in range(40):
        if i < 4:  # originals
            t = base[i]
        elif i >= 36:  # exact dups of docs 0..3
            t = base[i - 36]
        elif i >= 32:  # near dups of docs 0..3: small edit
            t = base[i - 32][:-10] + " extra tail"
        else:  # unique filler
            t = f"unique document number {i} " + base[i % 4][: 40 + i] + f" trailer {i * 7}"
        texts.append(t)
        srcs.append("s")
    tbl = pa.table(
        {
            "doc_id": pa.array(range(40), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 40),
            "source": pa.array(srcs),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    d = tmp_path_factory.mktemp("planted")
    pq.write_table(tbl, d / "documents.parquet")
    return str(d)


def test_dedup_exact_planted(planted):
    from parquet_go_ray.pipelines.dedup import dedup_exact

    out = dedup_exact(planted).to_pandas()
    # 36..39 are exact dups of 0..3 -> dropped; survivors keep min doc_id
    assert len(out) == 36
    assert set(range(36)) == set(out.doc_id)


def test_dedup_exact_join_path_matches_broadcast(planted):
    """Force the distributed anti-join path (loser_broadcast_limit=0) and
    assert survivors are identical to the default broadcast path — the
    size-adaptive fallback for dup-heavy corpora where the loser-id
    broadcast would be driver-memory-sized."""
    from parquet_go_ray.pipelines.dedup import dedup_exact

    small = dedup_exact(planted).to_pandas().sort_values("doc_id").reset_index(drop=True)
    big = (
        dedup_exact(planted, loser_broadcast_limit=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(big.doc_id) == list(small.doc_id)
    assert sorted(big.columns) == sorted(small.columns)
    pd.testing.assert_frame_equal(
        big[sorted(big.columns)], small[sorted(small.columns)]
    )


def test_dedup_exact_join_path_no_dups(planted, tmp_path):
    """Join path on a dup-free corpus keeps everything (empty loser table
    only exercises the broadcast path; plant a single dup so losers=1>0)."""
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "doc_id": pa.array(range(6), pa.int64()),
            "text": pa.array(["a doc", "b doc", "c doc", "d doc", "e doc", "a doc"]),
        }
    )
    pq.write_table(tbl, tmp_path / "documents.parquet")
    from parquet_go_ray.pipelines.dedup import dedup_exact

    out = dedup_exact(str(tmp_path), loser_broadcast_limit=0).to_pandas()
    assert sorted(out.doc_id) == [0, 1, 2, 3, 4]


def test_dedup_minhash_planted(planted):
    from parquet_go_ray.pipelines.dedup import dedup_minhash

    lab = dedup_minhash(planted, threshold=0.7).to_pandas()
    assert len(lab) == 40
    lab = lab.set_index("doc_id").cluster
    # exact dups cluster with their originals
    for i in range(36, 40):
        assert lab[i] == lab[i - 36] == i - 36
    # near dups (32..35) share >0.8 jaccard with originals 0..3
    for i in range(32, 36):
        assert lab[i] == i - 32


def test_dedup_simhash_planted(planted):
    from parquet_go_ray.pipelines.dedup import dedup_simhash

    pairs = dedup_simhash(planted, max_hamming=3)
    got = set(zip(pairs.a, pairs.b))
    for i in range(36, 40):
        assert (i - 36, i) in got or any(a == i - 36 and b == i for a, b in got)


def test_minhash_jaccard_exact():
    from parquet_go_ray.pipelines.dedup import jaccard

    j = jaccard(["abcdefgh"], ["abcdefgh"])
    assert j[0] == 1.0
    j = jaccard(["abcdefghij"], ["zzzzzzzzzz"])
    assert j[0] == 0.0


def test_dedup_embedding_finds_planted(ray_session, tmp_path):
    import pyarrow.parquet as pq

    rng = np.random.default_rng(0)
    emb = rng.normal(size=(50, 16)).astype(np.float32)
    emb[40:45] = emb[:5] + rng.normal(scale=0.01, size=(5, 16)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(50), pa.int64()),
            "embedding": pa.array([list(map(float, e)) for e in emb], pa.list_(pa.float32())),
            "label": pa.array([0] * 50, pa.int32()),
        }
    )
    d = tmp_path / "emb"
    d.mkdir()
    pq.write_table(tbl, d / "embeddings.parquet")
    from parquet_go_ray.pipelines.dedup import dedup_embedding

    pairs = dedup_embedding(str(d), threshold=0.98, planes=4)
    got = set(zip(pairs.a, pairs.b))
    found = sum((i, 40 + i) in got for i in range(5))
    assert found >= 3  # LSH recall: most planted near-dups surface


def test_ngram_jaccard_pairs_planted(planted):
    from parquet_go_ray.pipelines.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(planted, threshold=0.7)
    got = set(zip(pairs.a, pairs.b))
    # exact dups score 1.0 and must appear
    for i in range(36, 40):
        assert (i - 36, i) in got
    ones = pairs[pairs.jaccard == 1.0]
    assert len(ones) >= 4


def test_exact_dedup_exchange_payload_is_hashes_only(ray_session, planted):
    """The shuffle side of exact dedup must carry (doc_id, h1, h2, __part) —
    never the text (the 100 TB shuffle-bytes bill)."""
    from parquet_go_ray.pipelines.dedup import _docs, _text_hash_keys

    keys = _docs(planted, ["doc_id", "text"]).map_batches(
        _text_hash_keys(8), batch_format="pyarrow"
    )
    batch = keys.take_batch(10, batch_format="pyarrow")
    assert set(batch.column_names) == {"doc_id", "h1", "h2", "__part"}
    # fixed-width payload: ~32 bytes/row regardless of text size
    assert batch.nbytes <= 40 * batch.num_rows


def test_run_pairs_idx_matches_per_bucket_triu():
    """Vectorized run-pair expansion == the old per-bucket triu loop."""
    from parquet_go_ray.pipelines.dedup import _run_pairs_idx

    rng = np.random.default_rng(11)
    keys = np.sort(rng.integers(0, 50, 500))
    ids = rng.permutation(500).astype(np.int64)
    order = np.lexsort((ids, keys))
    ks, di = keys[order], ids[order]
    ia, ib = _run_pairs_idx(ks, cap=30)
    got = set(zip(di[ia].tolist(), di[ib].tolist()))
    # reference: per-bucket loop
    want = set()
    bounds = np.flatnonzero(np.diff(ks)) + 1
    for bucket in np.split(di, bounds):
        if 2 <= len(bucket) <= 30:
            bs = np.sort(bucket)
            i, j = np.triu_indices(len(bs), k=1)
            want |= set(zip(bs[i].tolist(), bs[j].tolist()))
    assert got == want
    assert all(a < b for a, b in got)

    # empty and degenerate inputs
    e1, e2 = _run_pairs_idx(np.empty(0, np.int64))
    assert len(e1) == len(e2) == 0
    e1, e2 = _run_pairs_idx(np.array([5]))
    assert len(e1) == 0


def test_dedup_minhash_collapse_identical_sigs(planted):
    """Opt-in signature collapse gives the SAME clusters as the default path
    (exact dups have identical signatures by construction)."""
    from parquet_go_ray.pipelines.dedup import dedup_minhash

    base = dedup_minhash(planted).to_pandas().sort_values("doc_id").reset_index(drop=True)
    fast = (
        dedup_minhash(planted, collapse_identical_signatures=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(base.doc_id) == list(fast.doc_id)
    assert list(base.cluster) == list(fast.cluster)


def test_dedup_minhash_collapse_join_path(planted, monkeypatch):
    """Force the distributed resolution everywhere (_SMALL_EDGE_LIMIT=0: the
    collapse-map hash-join, label hash-join, and iterated components all take
    their large-scale branches) — clusters must equal the default path's."""
    import parquet_go_ray.pipelines.dedup as dd

    base = (
        dd.dedup_minhash(planted).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    monkeypatch.setattr(dd, "_SMALL_EDGE_LIMIT", 0)
    fast = (
        dd.dedup_minhash(planted, collapse_identical_signatures=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(base.doc_id) == list(fast.doc_id)
    assert list(base.cluster) == list(fast.cluster)


def test_dedup_minhash_collapse_adversarial_density(ray_session, tmp_path):
    """A tiny-vocabulary corpus (every doc a shingle-space near-neighbor)
    must still produce identical clusters under the collapse path."""
    import numpy as np
    import pyarrow.parquet as pq

    from parquet_go_ray.pipelines.dedup import dedup_minhash

    rng = np.random.default_rng(3)
    words = np.array(["aa", "bb", "cc", "dd", "ee"], dtype=object)
    texts = [" ".join(words[rng.integers(0, 5, 40)].tolist()) + f" uid{i}" for i in range(300)]
    texts += [texts[i] for i in range(60)]  # 20% exact dups
    n = len(texts)
    d = tmp_path / "adv"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * n),
                "source": pa.array(["s"] * n),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(d / "documents.parquet"),
    )
    base = dedup_minhash(str(d)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    fast = (
        dedup_minhash(str(d), collapse_identical_signatures=True)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(base.cluster) == list(fast.cluster)
    # planted exact dups land in their original's cluster
    for i in range(60):
        assert fast.cluster[300 + i] == fast.cluster[i]


def test_run_pairs_idx_star_sampling():
    """sample_above: runs <= S expand fully (identical to triu); longer runs
    emit exactly the n_reps-representative star — every member paired with
    every rep, pairs (i < j), connectivity covers the whole run."""
    from parquet_go_ray.pipelines.dedup import _run_pairs_idx, _star_offsets

    # one small run (full expansion) + one big run (sampled)
    ks = np.concatenate([np.zeros(4, np.int64), np.ones(50, np.int64)])
    ia, ib = _run_pairs_idx(ks, cap=10, sample_above=8, n_reps=4)
    got = set(zip(ia.tolist(), ib.tolist()))
    # run 1 (positions 0..3): full triu
    full = {(i, j) for i in range(4) for j in range(i + 1, 4)}
    # run 2 (positions 4..53): star around reps at strided offsets
    lo, hi = _star_offsets(50, 4)
    star = {(4 + a, 4 + b) for a, b in zip(lo.tolist(), hi.tolist())}
    assert got == full | star
    assert all(a < b for a, b in got)
    # star covers every member of the sampled run
    touched = {a for a, _ in star} | {b for _, b in star}
    assert touched == set(range(4, 54))
    # linear, not quadratic: ~reps*L not L^2/2
    assert len(star) <= 4 * 50

    # without sample_above the big run is skipped entirely (old guard)
    ia2, ib2 = _run_pairs_idx(ks, cap=10)
    assert set(zip(ia2.tolist(), ib2.tolist())) == full


def test_dedup_minhash_bucket_sampling_recall(planted):
    """Opt-in mega-bucket star sampling keeps the planted exact+near dups in
    their originals' clusters even when EVERY bucket goes through the sampled
    path (sample_above=1 forces it)."""
    from parquet_go_ray.pipelines.dedup import dedup_minhash

    base = dedup_minhash(planted).to_pandas().sort_values("doc_id").reset_index(drop=True)
    samp = (
        dedup_minhash(planted, bucket_sample_above=1, bucket_reps=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(samp.doc_id) == list(range(40))
    # planted exact dups (36..39) and near dups (32..35) keep their clusters
    for i in range(32, 40):
        assert samp.cluster[i] == base.cluster[i], i
    # with reps >= max bucket size the star degenerates to the exact result
    samp_full = (
        dedup_minhash(planted, bucket_sample_above=1, bucket_reps=64)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(samp_full.cluster) == list(base.cluster)


def test_minhash_bucket_stats_sampling_columns(planted):
    from parquet_go_ray.pipelines.dedup import minhash_bucket_stats

    st = minhash_bucket_stats(planted, sample_above=2, n_reps=4)
    assert {"sampled_buckets", "pairs_full", "pairs_star"} <= set(st.columns)
    assert (st.pairs_star >= 0).all() and st.sampled_buckets.sum() > 0
    st0 = minhash_bucket_stats(planted)
    assert st0.sampled_buckets.sum() == 0 and st0.pairs_star.sum() == 0


def test_hash_join_left_preserves_int64_above_2_53(ray_session):
    """Left-join unmatched rows used to demote int payloads to float64,
    silently rounding ids above 2^53; the join now promotes through
    nullable Int64 and must round-trip exactly."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from parquet_go_ray.pipelines.dedup import _hash_join

    big = (1 << 53) + 1  # not representable in float64
    left = rd.from_arrow(pa.table({"doc_id": pa.array([1, 2, 3], pa.int64())}))
    right = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([2], pa.int64()),
                "label": pa.array([big], pa.int64()),
            }
        )
    )
    ds = _hash_join(
        left, right, on="doc_id", parts=2, how="left",
        left_schema=pa.schema([("doc_id", pa.int64())]),
        right_schema=pa.schema([("doc_id", pa.int64()), ("label", pa.int64())]),
    )
    # collect as ARROW: pandas' own int64+null -> float64 demotion is the
    # very bug class this guards against
    rows = sorted(ds.take_all(), key=lambda r: r["doc_id"])
    assert ds.schema().types[1] == pa.int64()
    assert rows[1]["label"] == big  # float64 would give 2^53
    assert rows[0]["label"] is None and rows[2]["label"] is None
