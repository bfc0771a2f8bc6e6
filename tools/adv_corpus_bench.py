"""Adversarial/realistic 100k-doc dedup benchmark (round-4 verdict item 7).

Builds the deterministic 100k-doc corpus (90k unique + 5k exact + 5k near
dups, seed 42) from a given vocabulary size and times dedup_minhash,
reporting planted-pair recall.  vocab=20 is the adversarial tiny-vocabulary
case (every doc a shingle-space near-neighbor); vocab=8000 the realistic
control.  Usage: python tools/adv_corpus_bench.py {default|sampled} {20|8000}
"""
import sys, time, os
sys.path.insert(0, "/root/repo")
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

def build(vocab_size, out_dir, n_unique=90_000, n_exact=5_000, n_near=5_000, seed=42):
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:04d}" for i in range(vocab_size)], dtype=object)
    uniq = [" ".join(vocab[rng.integers(0, vocab_size, 100)].tolist()) for _ in range(n_unique)]
    texts = list(uniq)
    # exact dups of the first n_exact uniques
    texts += [uniq[i] for i in range(n_exact)]
    # near dups: replace last 5 words
    near_pairs = []
    for i in range(n_near):
        base_i = n_exact + i
        words = uniq[base_i].split()
        words[-5:] = vocab[rng.integers(0, vocab_size, 5)].tolist()
        texts.append(" ".join(words))
        near_pairs.append((base_i, len(texts) - 1))
    n = len(texts)
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s"] * n),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), os.path.join(out_dir, "documents.parquet"))
    return near_pairs

def recall(pdf, near_pairs, n_exact=5_000):
    lab = dict(zip(pdf.doc_id, pdf.cluster))
    hit_near = sum(lab[a] == lab[b] for a, b in near_pairs)
    hit_exact = sum(lab[i] == lab[90_000 + i] for i in range(n_exact))
    return hit_near / len(near_pairs), hit_exact / n_exact

if __name__ == "__main__":
    mode = sys.argv[1]            # "default" | "sampled"
    vocab = int(sys.argv[2])      # 20 adversarial, 8000 realistic
    import ray
    ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from parquet_go_ray.pipelines.dedup import dedup_minhash
    d = f"/tmp/adv_corpus_{vocab}"
    marker = os.path.join(d, "documents.parquet")
    near_pairs = build(vocab, d)
    kw = {} if mode == "default" else {"bucket_sample_above": 64, "bucket_reps": 4}
    t0 = time.time()
    pdf = dedup_minhash(d, threshold=0.8, **kw).to_pandas()
    wall = time.time() - t0
    rn, re_ = recall(pdf, near_pairs)
    print(f"RESULT mode={mode} vocab={vocab} wall={wall:.1f}s recall_near={rn:.4f} recall_exact={re_:.4f} clusters={int((pdf.doc_id==pdf.cluster).sum())}")
    ray.shutdown()
