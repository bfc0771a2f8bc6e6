"""Text analysis operators over the documents table: language ID, quality
scoring, token counting, document fingerprinting.  All per-batch work is
vectorized (pandas .str / numpy); regexes compile once per actor.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

# tiny marker-word profiles (n-gram heuristic langid); the synthetic corpus is
# English-ish word soup, real profiles would be char-trigram tables
LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "value", "table", "row"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein"},
    "fr": {"le", "la", "les", "et", "est", "pas", "une", "dans"},
    "es": {"el", "la", "los", "y", "es", "no", "una", "que"},
}


class LangId:
    """Actor stage: marker tables built once per actor."""

    def __init__(self):
        self.word_re = re.compile(r"[a-zA-Z]+")
        self.langs = list(LANG_MARKERS)
        self.markers = [LANG_MARKERS[l] for l in self.langs]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(self.word_re)
        scores = np.zeros((len(batch), len(self.langs)))
        for j, mk in enumerate(self.markers):
            scores[:, j] = toks.map(lambda ws: sum(w in mk for w in ws)).to_numpy()
        best = scores.argmax(axis=1)
        conf = scores.max(axis=1) / np.maximum(toks.str.len().to_numpy(), 1)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": [self.langs[b] for b in best],
                "lang_conf": np.round(conf, 6),
            }
        )


def lang_id(sf_dir: str) -> rd.Dataset:
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(LangId, batch_format="pandas", concurrency=(1, 4))


class QualityScore:
    """Quality metrics chosen to be SQL-expressible for the oracle:
    chars, whitespace words, punctuation count, plus a composite score."""

    def __init__(self):
        self.ws = re.compile(r"\s+")
        self.punct = re.compile(r"[.!?,;:]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"]
        chars = text.str.len().astype(np.int64)
        words = text.str.strip().str.split(self.ws).str.len().astype(np.int64)
        words = words.where(text.str.strip().str.len() > 0, 0)
        punct = text.str.count(self.punct).astype(np.int64)
        avg_word_len = np.where(words > 0, (chars - (words - 1).clip(lower=0)) / np.maximum(words, 1), 0.0)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "chars": chars,
                "words": words,
                "punct": punct,
                "punct_ratio": np.round(punct / np.maximum(chars, 1), 9),
            }
        )


def text_quality(sf_dir: str) -> rd.Dataset:
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(QualityScore, batch_format="pandas", concurrency=(1, 4))


class TokenCount:
    """Whitespace tokens + a BPE-ish regex token count (\\w+ runs and single
    non-space symbols, the usual pre-tokenizer shape)."""

    def __init__(self):
        self.ws = re.compile(r"\s+")
        self.bpe = re.compile(r"\w+|[^\w\s]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"]
        stripped = text.str.strip()
        ws_tokens = stripped.str.split(self.ws).str.len().astype(np.int64)
        ws_tokens = ws_tokens.where(stripped.str.len() > 0, 0)
        bpe_tokens = text.str.findall(self.bpe).str.len().astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "ws_tokens": ws_tokens,
                "bpe_tokens": bpe_tokens,
            }
        )


def token_count(sf_dir: str) -> rd.Dataset:
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(TokenCount, batch_format="pandas", concurrency=(1, 4))


def fingerprint(sf_dir: str, k: int = 7, window: int = 4) -> rd.Dataset:
    """Winnowing document fingerprints: rolling k-gram hashes, per-window
    minimum (standard winnowing), emit per-doc fingerprint count + digest."""
    from .dedup import _shingle_hashes

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        h, n_sh = _shingle_hashes(texts)
        offsets = np.concatenate(([0], np.cumsum(n_sh[:-1])))
        n = len(n_sh)
        counts = np.zeros(n, dtype=np.int64)
        digests = np.zeros(n, dtype=np.uint64)
        # winnow per doc: sliding-window min over the hash sequence
        pos = 0
        for i in range(n):
            hs = h[offsets[i] : offsets[i] + n_sh[i]]
            if len(hs) <= window:
                mins = np.array([hs.min()]) if len(hs) else np.empty(0, np.uint64)
            else:
                sw = np.lib.stride_tricks.sliding_window_view(hs, window)
                mins = sw.min(axis=1)
                mins = np.unique(mins)
            counts[i] = len(mins)
            with np.errstate(over="ignore"):
                digests[i] = (
                    np.bitwise_xor.reduce(mins * np.uint64(0x100000001B3))
                    if len(mins)
                    else np.uint64(0)
                )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_fingerprints": pa.array(counts),
                "digest": pa.array(digests.astype(np.int64)),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(fn, batch_format="pyarrow")
