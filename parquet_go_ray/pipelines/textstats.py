"""Text analysis operators over the documents table: language ID, quality
scoring, token counting, document fingerprinting.  All per-batch work is
vectorized; the counting stages run entirely on Arrow RE2 kernels
(pc.count_substring_regex) over zero-copy pyarrow batches — no Arrow->pandas
object-array conversion in the hot path, and the SAME regex engine family as
the DuckDB oracle.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..sources.io import read_parquet_any as _read_parquet_any

# tiny marker-word profiles (n-gram heuristic langid); the synthetic corpus is
# English-ish word soup, real profiles would be char-trigram tables
LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "value", "table", "row"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein"},
    "fr": {"le", "la", "les", "et", "est", "pas", "une", "dans"},
    "es": {"el", "la", "los", "y", "es", "no", "una", "que"},
}


class LangId:
    """Actor stage: one marker regex per language, applied with the Arrow
    RE2 count kernel over zero-copy pyarrow batches — no per-row Python and
    no object-array conversion.  Scores are whole-word marker occurrences;
    prediction is the first language with the max score (langs order breaks
    ties), confidence = score / word count.  Semantics are deliberately
    SQL-expressible (regexp_extract_all lengths) so the driver can oracle
    this query — same RE2 engine family on both sides."""

    def __init__(self):
        self.langs = list(LANG_MARKERS)
        self.lang_arr = np.array(self.langs)
        self.patterns = [
            r"\b(?:" + "|".join(sorted(LANG_MARKERS[l])) + r")\b" for l in self.langs
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"]
        low = pc.utf8_lower(text)
        scores = np.zeros((batch.num_rows, len(self.langs)), np.int64)
        for j, pat in enumerate(self.patterns):
            scores[:, j] = pc.count_substring_regex(low, pat).to_numpy(
                zero_copy_only=False
            )
        words = pc.count_substring_regex(text, "[a-zA-Z]+").to_numpy(
            zero_copy_only=False
        )
        best = scores.argmax(axis=1)
        conf = scores.max(axis=1) / np.maximum(words, 1)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "lang_pred": pa.array(self.lang_arr[best]),
                "lang_conf": pa.array(np.round(conf, 6)),
            }
        )


def lang_id_oracle_sql() -> str:
    """ANSI-SQL twin of LangId for the DuckDB oracle (RE2 \\b == re \\b)."""
    exprs = []
    for l in LANG_MARKERS:
        pat = r"\b(?:" + "|".join(sorted(LANG_MARKERS[l])) + r")\b"
        exprs.append(f"len(regexp_extract_all(lower(text), '{pat}')) AS s_{l}")
    langs = list(LANG_MARKERS)
    cases = []
    for i, l in enumerate(langs):
        conds = " AND ".join(f"s_{l} >= s_{m}" for m in langs[i + 1 :])
        cases.append(f"WHEN {conds} THEN '{l}'" if conds else f"ELSE '{l}'")
    case = "CASE " + " ".join(cases) + " END"
    greatest = "GREATEST(" + ", ".join(f"s_{l}" for l in langs) + ")"
    return (
        "WITH s AS (SELECT doc_id, "
        + ", ".join(exprs)
        + ", len(regexp_extract_all(text, '[a-zA-Z]+')) AS words FROM documents) "
        + f"SELECT doc_id, {case} AS lang_pred, "
        + f"ROUND(CAST({greatest} AS DOUBLE) / GREATEST(words, 1), 6) AS lang_conf FROM s"
    )


def lang_id(sf_dir: str) -> rd.Dataset:
    ds = _read_parquet_any(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(LangId, batch_format="pyarrow", concurrency=(1, 4))


class QualityScore:
    """Quality metrics chosen to be SQL-expressible for the oracle: chars,
    whitespace words, punctuation count, plus a composite score.  Arrow RE2
    kernels end to end; words = count of \\S+ runs (== the oracle's
    len(regexp_split_to_array(TRIM(text))) with the empty-text case)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"]
        chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        words = pc.count_substring_regex(text, r"\S+").to_numpy(zero_copy_only=False)
        punct = pc.count_substring_regex(text, r"[.!?,;:]").to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "chars": pa.array(chars),
                "words": pa.array(words.astype(np.int64)),
                "punct": pa.array(punct.astype(np.int64)),
                "punct_ratio": pa.array(np.round(punct / np.maximum(chars, 1), 9)),
            }
        )


def text_quality(sf_dir: str) -> rd.Dataset:
    ds = _read_parquet_any(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(QualityScore, batch_format="pyarrow", concurrency=(1, 4))


class TokenCount:
    """Whitespace tokens + a BPE-ish regex token count (\\w+ runs and single
    non-space symbols, the usual pre-tokenizer shape), both as single Arrow
    RE2 count kernels."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"]
        ws = pc.count_substring_regex(text, r"\S+").to_numpy(zero_copy_only=False)
        bpe = pc.count_substring_regex(text, r"\w+|[^\w\s]").to_numpy(
            zero_copy_only=False
        )
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "ws_tokens": pa.array(ws.astype(np.int64)),
                "bpe_tokens": pa.array(bpe.astype(np.int64)),
            }
        )


def token_count(sf_dir: str) -> rd.Dataset:
    ds = _read_parquet_any(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(TokenCount, batch_format="pyarrow", concurrency=(1, 4))


def fingerprint(sf_dir: str, k: int = 7, window: int = 4) -> rd.Dataset:
    """Winnowing document fingerprints: rolling k-gram hashes, per-window
    minimum (standard winnowing), emit per-doc count of distinct window-min
    hashes + an order-independent XOR digest.  Fully vectorized: ONE global
    sliding-window-min over the concatenated hash buffer with boundary
    masking for docs shorter than the window — no per-document Python loop."""
    from .dedup import _shingle_hashes

    def fn(batch: pa.Table) -> pa.Table:
        texts = batch["text"]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        h, n_sh = _shingle_hashes(texts, k)
        n = len(n_sh)
        if n == 0:
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "n_fingerprints": pa.array([], pa.int64()),
                    "digest": pa.array([], pa.int64()),
                }
            )
        offsets = np.concatenate(([0], np.cumsum(n_sh[:-1])))
        # windows fully inside each doc; short docs (< window hashes) get one
        # window covering the whole doc
        n_w = np.maximum(n_sh - window + 1, 1)
        w_off = np.concatenate(([0], np.cumsum(n_w[:-1])))
        total_w = int(n_w.sum())
        doc_of_w = np.repeat(np.arange(n, dtype=np.int64), n_w)
        within = np.arange(total_w, dtype=np.int64) - np.repeat(w_off, n_w)
        pos = np.repeat(offsets, n_w) + within
        # global sliding min (pad tail so every start position has a window)
        padded = np.concatenate([h, np.full(window, np.uint64(0xFFFFFFFFFFFFFFFF))])
        sw_min = np.lib.stride_tricks.sliding_window_view(padded, window).min(axis=1)
        mins = sw_min[pos]
        # short docs: that single window crossed into the neighbor — replace
        # with the doc's own segment min
        short = n_sh < window
        if short.any():
            seg_min = np.minimum.reduceat(h, offsets)
            first_w = w_off[short]
            mins[first_w] = seg_min[short]
        # distinct mins per doc: lexsort + first-occurrence flags
        order = np.lexsort((mins, doc_of_w))
        dws, msorted = doc_of_w[order], mins[order]
        first = np.ones(total_w, bool)
        first[1:] = (dws[1:] != dws[:-1]) | (msorted[1:] != msorted[:-1])
        counts = np.add.reduceat(first.astype(np.int64), w_off)
        with np.errstate(over="ignore"):
            contrib = np.where(first, msorted * np.uint64(0x100000001B3), np.uint64(0))
        digests = np.bitwise_xor.reduceat(contrib, w_off)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_fingerprints": pa.array(counts),
                "digest": pa.array(digests.astype(np.int64)),
            }
        )

    ds = _read_parquet_any(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(fn, batch_format="pyarrow")


def token_counts(sf_dir: str, parts: int = 16, col: str = "token") -> rd.Dataset:
    """Distributed (token, n) counts over documents.text — THE shared
    combiner (vocab_topk, bpe.word_freqs, llmprep.unigram_model all build on
    it): each batch pre-aggregates its tokens (pc.split_pattern_regex ->
    list_flatten -> value_counts, all Arrow/RE2 kernels), so the groupby
    exchange moves per-batch VOCABULARIES (bounded by distinct tokens, not
    token occurrences); the per-partition fold is one vectorized pandas
    groupby-sum.  `col` names the output token column."""
    import pyarrow.compute as pc

    ds = _read_parquet_any(f"{sf_dir}/documents.parquet", columns=["text"])

    def local_counts(batch: pa.Table) -> pa.Table:
        c = batch["text"]
        if isinstance(c, pa.ChunkedArray):
            c = c.combine_chunks()
        toks = pc.list_flatten(pc.split_pattern_regex(c, r"\s+"))
        toks = toks.filter(pc.not_equal(toks, ""))
        vc = toks.value_counts()
        token, n = vc.field("values"), vc.field("counts")
        from ..stages.common import polars_mod as _pm

        pl = _pm()

        h = pl.from_arrow(pa.table({"t": token}))["t"].hash(seed=13).to_numpy()
        part = (h.astype(np.uint64) % np.uint64(parts)).astype(np.int64)
        return pa.table({col: token, "n": n.cast(pa.int64()), "__part": pa.array(part)})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(col, sort=False, as_index=False)["n"].sum()

    from ..stages.common import arrow_out as _arrow_out

    return (
        ds.map_batches(local_counts, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(_arrow_out(fold), batch_format="pandas")
    )


def vocab_topk(sf_dir: str, k: int = 100, parts: int = 16) -> rd.Dataset:
    """Corpus vocabulary: whitespace tokens -> counts -> top-k (one final
    vocabulary-sized sort task).  Tiebreak (count desc, token asc) is total,
    so the result is deterministic and SQL-oracle-able."""
    counts = token_counts(sf_dir, parts)

    def topk(batch: pa.Table) -> pa.Table:
        import pandas as _pd

        df = batch.to_pandas()
        df = df.sort_values(["n", "token"], ascending=[False, True], kind="mergesort").head(k)
        return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)

    return counts.repartition(1).map_batches(topk, batch_format="pyarrow", batch_size=None)


def vocab_topk_oracle_sql(k: int = 100) -> str:
    return (
        "SELECT token, COUNT(*) AS n FROM ("
        "SELECT unnest(regexp_split_to_array(text, '\\s+')) AS token FROM documents) "
        "WHERE token <> '' GROUP BY token ORDER BY n DESC, token LIMIT " + str(k)
    )
