"""LLM training-data preparation operators over the documents table:
word-level repetition quality filters (Gopher-style, adapted to the corpus's
single-line texts), PII/secret redaction, and distributed sequence packing
(global token prefix-sum -> context-window chunk assignment).

Every operator here is deliberately SQL-expressible so the driver can oracle
it value-for-value against DuckDB; the implementations are the distributed
Ray Data shapes (vectorized per-batch kernels, one narrow shuffle at most).

Scale notes (the 100 TB story):
  * repetition/redaction are embarrassingly parallel map_batches over
    (doc_id, text) with compiled-regex actor state — no exchange at all;
  * sequence packing needs a GLOBAL exclusive prefix sum over doc_id order.
    We never sort the corpus: doc ids are range-bucketed (R buckets), a tiny
    per-range token-total aggregate (R rows, KBs) computes range base
    offsets on the driver, and one groupby(range) shuffle of the narrow
    (doc_id, tokens) projection — 16 B/row, the same exchange shape as
    dedup_exact — finishes the within-range cumsum.  The 100 TB text column
    is read exactly once.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..sources.io import read_parquet_any as _read_parquet_any
from ..stages.common import arrow_out as _arrow_out
from ..stages.common import pandas_to_arrow as _pandas_to_arrow

# RE2's \S is exactly [^\t\n\f\r ] (no \x0b, \x85, \xa0 — unlike Python
# re's Unicode \S complement, and even re.ASCII still treats \x0b as
# whitespace).  The explicit class makes the Python kernels tokenize
# byte-for-byte like the DuckDB/Arrow RE2 oracles and like the RE2
# \s+-splits in textstats/bpe word counting; a mismatch here doesn't just
# perturb one row — in seq_pack it shifts token_start for every later doc.
_WORD_RE = r"[^ \t\n\f\r]+"
_WS_RE = r"[ \t\n\f\r]+"  # complement: the separator form of _WORD_RE

# keep-thresholds for the repetition filter (Gopher-style rules adapted to
# word level: the synthetic corpus is single-line word soup, so line-based
# rules would be degenerate).  Chosen to split the sf0.001 corpus ~50/50.
_KEEP_MIN_WORDS = 20
_KEEP_MAX_DUP_WORD = 0.55
_KEEP_MAX_TOP_WORD = 0.20
_KEEP_MAX_DUP_2GRAM = 0.10


class RepetitionScore:
    """Word-level repetition metrics per document, all vectorized:
    explode words once, then C-level pandas groupbys for distinct counts,
    top-word dominance, and adjacent-bigram duplication."""

    def __init__(self):
        self.word_re = re.compile(_WORD_RE)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"]
        lists = text.str.findall(self.word_re)
        words = lists.str.len().to_numpy(np.int64)
        n = len(batch)
        doc_ids = batch["doc_id"].to_numpy(np.int64)

        # one exploded frame drives all three groupby metrics
        ex = lists.reset_index(drop=True).explode()
        ex = ex[ex.notna()]
        rep_doc = ex.index.to_numpy(np.int64)
        flat = ex.to_numpy(dtype=object)
        e = pd.DataFrame({"d": rep_doc, "w": flat})

        distinct = np.zeros(n, dtype=np.int64)
        top_cnt = np.zeros(n, dtype=np.int64)
        distinct_bg = np.zeros(n, dtype=np.int64)
        if len(e):
            g = e.groupby("d")["w"]
            nu = g.nunique()
            distinct[nu.index.to_numpy()] = nu.to_numpy()
            tc = e.groupby(["d", "w"]).size().groupby(level=0).max()
            top_cnt[tc.index.to_numpy()] = tc.to_numpy()
            # adjacent bigrams: shift within the exploded order, mask the
            # last word of each doc (next row belongs to the next doc).
            # Plain slicing, NOT np.roll: roll wraps the batch's last word
            # around to its first, fabricating a bigram whenever the first
            # and last rows belong to the same doc (single-doc batches)
            same_doc = rep_doc[:-1] == rep_doc[1:]
            bg = pd.DataFrame(
                {
                    "d": rep_doc[:-1][same_doc],
                    "b": pd.Series(flat[:-1][same_doc]).str.cat(
                        pd.Series(flat[1:][same_doc]), sep="\n"
                    ),
                }
            )
            if len(bg):
                nb = bg.groupby("d")["b"].nunique()
                distinct_bg[nb.index.to_numpy()] = nb.to_numpy()

        w = words.astype(np.float64)
        dup_word = np.where(words > 0, 1.0 - distinct / np.maximum(w, 1), 0.0)
        top_word = np.where(words > 0, top_cnt / np.maximum(w, 1), 0.0)
        dup_2g = np.where(
            words >= 2, 1.0 - distinct_bg / np.maximum(w - 1, 1), 0.0
        )
        # half-AWAY-from-zero like DuckDB's ROUND (np.round is half-to-even:
        # an exactly-dyadic tie like 1/1024 at 9 digits flips the last digit
        # between the two); all three fractions are non-negative
        dup_word = np.floor(dup_word * 1e9 + 0.5) / 1e9
        top_word = np.floor(top_word * 1e9 + 0.5) / 1e9
        dup_2g = np.floor(dup_2g * 1e9 + 0.5) / 1e9
        keep = (
            (words >= _KEEP_MIN_WORDS)
            & (dup_word <= _KEEP_MAX_DUP_WORD)
            & (top_word <= _KEEP_MAX_TOP_WORD)
            & (dup_2g <= _KEEP_MAX_DUP_2GRAM)
        )
        return pd.DataFrame(
            {
                "doc_id": doc_ids,
                "words": words,
                "distinct_words": distinct,
                "dup_word_frac": dup_word,
                "top_word_frac": top_word,
                "dup_2gram_frac": dup_2g,
                "keep": keep,
            }
        )


def quality_repetition(sf_dir: str) -> rd.Dataset:
    ds = _read_parquet_any(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(RepetitionScore, batch_format="pandas", concurrency=(1, 4))


def quality_repetition_oracle_sql(table: str = "documents") -> str:
    """DuckDB twin.  NB DuckDB list slices are 1-based with INCLUSIVE ends
    (l[:-1] keeps the last element!), hence l[:len(l)-1]."""
    return (
        "WITH w AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS l "
        f"FROM {table}), "
        "e AS (SELECT doc_id, unnest(l) AS word FROM w), "
        "tc AS (SELECT doc_id, max(cnt) AS top_cnt FROM "
        "(SELECT doc_id, word, count(*) AS cnt FROM e GROUP BY 1,2) GROUP BY 1), "
        "s AS (SELECT w.doc_id, len(l) AS words, "
        "len(list_distinct(l)) AS distinct_words, "
        "CASE WHEN len(l) >= 2 THEN len(list_distinct(list_transform("
        "list_zip(l[:len(l)-1], l[2:]), p -> concat(p[1], chr(10), p[2])))) "
        "ELSE 0 END AS distinct_bigrams, "
        "COALESCE(tc.top_cnt, 0) AS top_cnt "
        "FROM w LEFT JOIN tc ON w.doc_id = tc.doc_id) "
        "SELECT doc_id, words, distinct_words, "
        "ROUND(CASE WHEN words > 0 THEN 1.0 - CAST(distinct_words AS DOUBLE)/words ELSE 0.0 END, 9) AS dup_word_frac, "
        "ROUND(CASE WHEN words > 0 THEN CAST(top_cnt AS DOUBLE)/words ELSE 0.0 END, 9) AS top_word_frac, "
        "ROUND(CASE WHEN words >= 2 THEN 1.0 - CAST(distinct_bigrams AS DOUBLE)/(words-1) ELSE 0.0 END, 9) AS dup_2gram_frac, "
        f"(words >= {_KEEP_MIN_WORDS} "
        f"AND CASE WHEN words > 0 THEN 1.0 - CAST(distinct_words AS DOUBLE)/words ELSE 0.0 END <= {_KEEP_MAX_DUP_WORD} "
        f"AND CASE WHEN words > 0 THEN CAST(top_cnt AS DOUBLE)/words ELSE 0.0 END <= {_KEEP_MAX_TOP_WORD} "
        f"AND CASE WHEN words >= 2 THEN 1.0 - CAST(distinct_bigrams AS DOUBLE)/(words-1) ELSE 0.0 END <= {_KEEP_MAX_DUP_2GRAM}"
        ") AS keep FROM s"
    )


# --- PII / secret redaction -------------------------------------------------

# Patterns chosen to mean the same thing in Python re and DuckDB's RE2
# (no lookaround, no backreferences; \b is the ASCII word boundary in both).
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
_PII_HEX = r"\b[0-9a-f]{32,}\b"


def _pii_salt(doc_ids: np.ndarray) -> pd.Series:
    """Deterministic synthetic PII appended per doc so the redaction oracle
    is meaningful on a corpus that contains none (mirrored exactly in SQL).
    doc_id % 4: 0 -> email, 1 -> ipv4, 2 -> md5-hex secret, 3 -> nothing.
    np.fmod (sign of dividend) mirrors DuckDB's %: a negative doc_id
    matches no CASE branch on either side."""
    m = np.fmod(doc_ids, 4)
    ids = doc_ids.astype(str).astype(object)
    email = " contact user" + ids + "@mail.example.com now"
    ip = (
        " host 10.0."
        + (doc_ids % 256).astype(str).astype(object)
        + "."
        + ((doc_ids * 7) % 256).astype(str).astype(object)
        + " up"
    )
    # md5 has no vectorized kernel; it only runs on the 1/4 salted-with-secret
    # rows and exists purely to give the redaction oracle real material
    secret = np.array(
        [
            " key " + hashlib.md5(str(d).encode()).hexdigest() + " leaked"
            for d in doc_ids[m == 2]
        ],
        dtype=object,
    )
    out = np.select([m == 0, m == 1], [email, ip], default="").astype(object)
    out[m == 2] = secret
    return pd.Series(out)


class RedactPII:
    """Sequential vectorized redaction: count-then-replace each pattern on
    the current text (email -> ip -> hex secret), same order as the SQL CTE
    chain so intermediate counts agree.  Runs on Arrow's RE2 kernels
    (count_substring_regex / replace_substring_regex) — the same regex
    engine DuckDB uses, zero-copy from the object store, no pandas
    object-array hop for the text column."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").combine_chunks()
        ids_np = doc_ids.to_numpy(zero_copy_only=False).astype(np.int64)
        salt = pa.array(_pii_salt(ids_np), type=pa.large_string())
        text = pc.binary_join_element_wise(
            pc.cast(batch.column("text").combine_chunks(), pa.large_string()),
            salt,
            pa.scalar("", type=pa.large_string()),
        )
        n_email = pc.count_substring_regex(text, _PII_EMAIL)
        t1 = pc.replace_substring_regex(text, _PII_EMAIL, "<EMAIL>")
        n_ip = pc.count_substring_regex(t1, _PII_IPV4)
        t2 = pc.replace_substring_regex(t1, _PII_IPV4, "<IP>")
        n_hex = pc.count_substring_regex(t2, _PII_HEX)
        t3 = pc.replace_substring_regex(t2, _PII_HEX, "<SECRET>")
        n_email = pc.cast(n_email, pa.int64())
        n_ip = pc.cast(n_ip, pa.int64())
        n_hex = pc.cast(n_hex, pa.int64())
        return pa.table(
            {
                "doc_id": doc_ids,
                "clean_text": t3,
                "n_email": n_email,
                "n_ip": n_ip,
                "n_secret": n_hex,
                "n_pii": pc.add(pc.add(n_email, n_ip), n_hex),
            }
        )


def redact_pii(sf_dir: str) -> rd.Dataset:
    ds = _read_parquet_any(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(RedactPII, batch_format="pyarrow", concurrency=(1, 4))


def redact_pii_oracle_sql(table: str = "documents") -> str:
    salt = (
        "CASE doc_id % 4 "
        "WHEN 0 THEN concat(' contact user', doc_id, '@mail.example.com now') "
        "WHEN 1 THEN concat(' host 10.0.', doc_id % 256, '.', (doc_id * 7) % 256, ' up') "
        "WHEN 2 THEN concat(' key ', md5(CAST(doc_id AS VARCHAR)), ' leaked') "
        "ELSE '' END"
    )
    return (
        f"WITH s AS (SELECT doc_id, text || {salt} AS t FROM {table}), "
        f"a AS (SELECT doc_id, len(regexp_extract_all(t, '{_PII_EMAIL}')) AS n_email, "
        f"regexp_replace(t, '{_PII_EMAIL}', '<EMAIL>', 'g') AS t FROM s), "
        f"b AS (SELECT doc_id, n_email, len(regexp_extract_all(t, '{_PII_IPV4}')) AS n_ip, "
        f"regexp_replace(t, '{_PII_IPV4}', '<IP>', 'g') AS t FROM a), "
        f"c AS (SELECT doc_id, n_email, n_ip, len(regexp_extract_all(t, '{_PII_HEX}')) AS n_secret, "
        f"regexp_replace(t, '{_PII_HEX}', '<SECRET>', 'g') AS t FROM b) "
        "SELECT doc_id, t AS clean_text, n_email, n_ip, n_secret, "
        "n_email + n_ip + n_secret AS n_pii FROM c"
    )


# --- distributed sequence packing --------------------------------------------

PACK_BUDGET = 512  # context-window token budget per training chunk
PACK_RANGES = 256  # doc_id range buckets for the two-level prefix sum


class _TokCount:
    def __call__(self, batch: pa.Table) -> pa.Table:
        # Arrow RE2 count of the same ASCII whitespace-token pattern; a
        # fresh pa.table keeps the output metadata-free for the groupby
        # shuffle (see stages.common.pandas_to_arrow on schema-hash fallback)
        toks = pc.cast(
            pc.count_substring_regex(
                pc.cast(batch.column("text"), pa.large_string()), _WORD_RE
            ),
            pa.int64(),
        )
        return pa.table(
            {"doc_id": pc.cast(batch.column("doc_id"), pa.int64()), "tokens": toks}
        )


def _max_doc_id(path: str) -> int | None:
    """Footer-stats max of doc_id (no data pass); None if stats are absent."""
    try:
        import pyarrow.parquet as pq

        md = pq.read_metadata(path)
        idx = md.schema.to_arrow_schema().get_field_index("doc_id")
        best = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or st.max is None:
                return None
            best = st.max if best is None else max(best, st.max)
        return best
    except Exception:
        return None


def seq_pack(
    sf_dir: str, budget: int = PACK_BUDGET, ranges: int = PACK_RANGES
) -> rd.Dataset:
    """GPT-style sequence packing: concatenate all documents in doc_id order
    into one token stream and assign each document its [chunk_first,
    chunk_last] context-window span (budget tokens per chunk).

    Global exclusive prefix sum without a global sort:
      1. one pass over the text column -> narrow (doc_id, tokens),
         materialized once (16 B/row; the 100 TB text is never re-read);
      2. per-batch np.bincount partials by doc_id range -> a `ranges`-row
         aggregate -> driver computes range base offsets (KBs, broadcast in
         the closure);
      3. groupby(range).map_groups: sort the range's ids, cumsum, add the
         base offset.  The only exchange moves 16 B/row.
    """
    path = f"{sf_dir}/documents.parquet"
    ds = _read_parquet_any(path, columns=["doc_id", "text"])
    tok = ds.map_batches(
        _TokCount, batch_format="pyarrow", concurrency=(1, 4)
    ).materialize()

    maxid = _max_doc_id(path)
    if maxid is None:
        maxid = tok.max("doc_id")  # None on an empty table
        if maxid is None:
            return rd.from_arrow(
                pa.table(
                    {
                        c: pa.array([], pa.int64())
                        for c in (
                            "doc_id", "tokens", "token_start",
                            "chunk_first", "chunk_last", "n_chunks",
                        )
                    }
                )
            )
    width = max(1, (int(maxid) + ranges) // ranges)

    def _partials(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        t = batch.column("tokens").to_numpy()
        if len(d) and d.min() < 0:
            raise ValueError(
                "seq_pack requires non-negative doc_id (range bucketing)"
            )
        rid = d // width
        sums = np.bincount(rid, weights=t, minlength=ranges)
        nz = np.nonzero(sums)[0]
        return pa.table(
            {"range_id": nz.astype(np.int64), "toks": sums[nz].astype(np.int64)}
        )

    totals = (
        tok.map_batches(_partials, batch_format="pyarrow")
        .groupby("range_id")
        .sum("toks")
        .to_pandas()
    )
    base = np.zeros(ranges, dtype=np.int64)
    base[totals["range_id"].to_numpy()] = totals["sum(toks)"].to_numpy()
    base = np.concatenate([[0], np.cumsum(base)[:-1]])

    def _add_range(batch: pa.Table) -> pa.Table:
        rid = batch.column("doc_id").to_numpy() // width
        return batch.append_column("range_id", pa.array(rid, type=pa.int64()))

    def _pack_range(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id")
        t = g["tokens"].to_numpy(np.int64)
        start = base[int(g["range_id"].iloc[0])] + np.concatenate(
            [[0], np.cumsum(t)[:-1]]
        )
        first = start // budget
        last = (start + np.maximum(t, 1) - 1) // budget
        n_chunks = np.where(t == 0, 0, last - first + 1)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(np.int64),
                "tokens": t,
                "token_start": start,
                "chunk_first": first,
                "chunk_last": last,
                "n_chunks": n_chunks.astype(np.int64),
            }
        )

    return (
        tok.map_batches(_add_range, batch_format="pyarrow")
        .groupby("range_id")
        .map_groups(_arrow_out(_pack_range), batch_format="pandas")
    )


def seq_pack_oracle_sql(table: str = "documents", budget: int = PACK_BUDGET) -> str:
    return (
        f"WITH t AS (SELECT doc_id, len(regexp_extract_all(text, '\\S+')) AS tokens FROM {table}), "
        "p AS (SELECT doc_id, tokens, CAST(COALESCE(SUM(tokens) OVER ("
        "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS token_start FROM t) "
        f"SELECT doc_id, tokens, token_start, token_start // {budget} AS chunk_first, "
        f"(token_start + GREATEST(tokens, 1) - 1) // {budget} AS chunk_last, "
        f"CASE WHEN tokens = 0 THEN 0 ELSE (token_start + tokens - 1) // {budget} "
        f"- token_start // {budget} + 1 END AS n_chunks FROM p"
    )


# --- unigram LM quality scoring (CCNet-style, simplified to unigrams) --------


def unigram_model(sf_dir: str) -> tuple[pd.Series, float]:
    """Corpus unigram model: (word -> ln(count/total)) trained with the
    distributed word-frequency combiner (the exchange moves vocabularies,
    never token occurrences — bpe.word_freqs).  The model table is bounded
    by the distinct vocabulary, so it broadcasts (ray.put once, read per
    actor), never re-ships per batch."""
    from .bpe import word_freqs

    freqs = word_freqs(sf_dir).to_pandas()
    total = float(freqs["n"].sum())
    logp = pd.Series(
        np.log(freqs["n"].to_numpy(np.float64) / total),
        index=freqs["word"],
    )
    return logp, total


class UnigramScore:
    """Actor: holds the broadcast unigram log-prob table; per batch one
    explode + ONE Arrow hash-table probe (pc.index_in) + bincount.  Words
    outside the model vocabulary are excluded from both the token count and
    the sum (mirrors the oracle's inner join); documents with no in-vocab
    words are dropped."""

    def __init__(self, model_ref):
        import ray

        logp = (
            ray.get(model_ref)
            if isinstance(model_ref, ray.ObjectRef)
            else model_ref
        )
        # vocab as an Arrow string array once per actor: pc.index_in probes
        # it with a single C-level hash-table pass per batch (the old
        # Series.map re-dispatched through pandas machinery per batch and
        # was the stage's inner loop at scale)
        self.vocab = pa.array(logp.index.to_numpy(dtype=object), pa.string())
        self.vals = logp.to_numpy(np.float64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        # tokenize entirely in Arrow: split on the whitespace class (the
        # complement of _WORD_RE), flatten, drop the empty tokens a
        # leading/trailing separator produces — equivalent to re.findall
        # of [^ \t\n\f\r]+ without a pandas object-array explode
        text = pc.cast(batch.column("text").combine_chunks(), pa.large_string())
        lists = pc.split_pattern_regex(text, pattern=_WS_RE)
        flat = pc.list_flatten(lists)
        parent = pc.list_parent_indices(lists)
        nonempty = pc.not_equal(pc.binary_length(flat), 0)
        toks = pc.cast(flat.filter(nonempty), pa.string())
        doc_idx = parent.filter(nonempty).to_numpy(zero_copy_only=False)
        idx = pc.index_in(toks, value_set=self.vocab).to_numpy(
            zero_copy_only=False
        )  # float64 with NaN for out-of-vocab
        ok = ~np.isnan(idx)
        vals = self.vals[idx[ok].astype(np.int64)]
        n = len(batch)
        words = np.bincount(doc_idx[ok], minlength=n).astype(np.int64)
        lp = np.bincount(doc_idx[ok], weights=vals, minlength=n)
        keep = words > 0
        return pa.table(
            {
                "doc_id": pa.array(
                    batch.column("doc_id")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)[keep]
                ),
                "words": pa.array(words[keep]),
                "logprob": pa.array(np.round(lp[keep], 6)),
                "avg_logprob": pa.array(np.round(lp[keep] / words[keep], 6)),
            }
        )


def unigram_logprob(sf_dir: str) -> rd.Dataset:
    import ray

    logp, _total = unigram_model(sf_dir)
    ref = ray.put(logp)
    ds = _read_parquet_any(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        UnigramScore,
        fn_constructor_args=(ref,),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def unigram_logprob_oracle_sql(table: str = "documents") -> str:
    return (
        "WITH w AS (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS word "
        f"FROM {table}), "
        "f AS (SELECT word, count(*) AS n FROM w GROUP BY word), "
        "tot AS (SELECT sum(n) AS t FROM f), "
        "s AS (SELECT w.doc_id, count(*) AS words, sum(ln(f.n / tot.t)) AS lp "
        "FROM w JOIN f USING (word), tot GROUP BY w.doc_id) "
        "SELECT doc_id, words, ROUND(lp, 6) AS logprob, "
        "ROUND(lp / words, 6) AS avg_logprob FROM s"
    )


def pack_expand(sf_dir: str, budget: int = PACK_BUDGET) -> rd.Dataset:
    """The (doc_id, chunk_id) assignment table a dataloader consumes: one
    row per context-window chunk a document overlaps, with the token count
    it contributes to that chunk.  Pure vectorized per-batch expansion of
    seq_pack's spans (np.repeat + per-run offsets) — no extra exchange."""
    packed = seq_pack(sf_dir, budget=budget)

    def expand(batch: pa.Table) -> pa.Table:
        tokens = batch.column("tokens").to_numpy()
        keep = tokens > 0
        tokens = tokens[keep]
        start = batch.column("token_start").to_numpy()[keep]
        first = batch.column("chunk_first").to_numpy()[keep]
        last = batch.column("chunk_last").to_numpy()[keep]
        doc = batch.column("doc_id").to_numpy()[keep]
        nch = last - first + 1
        total = int(nch.sum())
        rep = np.repeat(np.arange(len(doc)), nch)
        run_start = np.concatenate([[0], np.cumsum(nch)[:-1]])
        off = np.arange(total) - run_start[rep]
        cid = first[rep] + off
        lo = np.maximum(start[rep], cid * budget)
        hi = np.minimum(start[rep] + tokens[rep], (cid + 1) * budget)
        return pa.table(
            {
                "doc_id": pa.array(doc[rep], pa.int64()),
                "chunk_id": pa.array(cid, pa.int64()),
                "tokens_in_chunk": pa.array(hi - lo, pa.int64()),
            }
        )

    return packed.map_batches(expand, batch_format="pyarrow")


def pack_expand_oracle_sql(table: str = "documents", budget: int = PACK_BUDGET) -> str:
    return (
        f"WITH t AS (SELECT doc_id, len(regexp_extract_all(text, '\\S+')) AS tokens FROM {table}), "
        "p AS (SELECT doc_id, tokens, CAST(COALESCE(SUM(tokens) OVER ("
        "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS token_start "
        "FROM t), "
        "e AS (SELECT doc_id, tokens, token_start, "
        f"unnest(generate_series(token_start // {budget}, "
        f"(token_start + tokens - 1) // {budget})) AS chunk_id "
        "FROM p WHERE tokens > 0) "
        "SELECT doc_id, chunk_id, "
        f"LEAST(token_start + tokens, (chunk_id + 1) * {budget}) "
        f"- GREATEST(token_start, chunk_id * {budget}) AS tokens_in_chunk FROM e"
    )


# --- benchmark decontamination ------------------------------------------------

DECON_K = 16  # char shingle width (~3 words in this corpus)
DECON_MOD = 97  # benchmark set = docs with doc_id % DECON_MOD == 0


def _shingle_bytes(texts: pa.Array, k: int = DECON_K):
    """All char k-gram windows of each doc as raw bytes: one vectorized
    gather over the concatenated buffer (dedup._shingle_hashes' layout,
    materializing the window BYTES instead of hashes so membership is
    exact-string — byte==char for this ASCII corpus, matching SQL substr).
    Docs shorter than k contribute no windows (mirrors generate_series).
    Returns (windows as np 'S<k>' array, doc index per window)."""
    from ..codecs.base import binary_parts

    lengths, data = binary_parts(texts)
    n = len(lengths)
    n_sh = np.maximum(lengths - k + 1, 0).astype(np.int64)
    total = int(n_sh.sum())
    if total == 0:
        return np.empty(0, dtype=f"S{k}"), np.empty(0, np.int64)
    ends = np.cumsum(lengths)
    starts = ends - lengths
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(n_sh[:-1]))), n_sh
    )
    pos = np.repeat(starts[n_sh > 0], n_sh[n_sh > 0]) + within
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), n_sh)
    gather = data[pos[:, None] + np.arange(k, dtype=np.int64)]
    return np.ascontiguousarray(gather).view(f"S{k}").ravel(), doc_idx


def benchmark_shingles(sf_dir: str, k: int = DECON_K, mod: int = DECON_MOD):
    """The benchmark set's distinct shingles.  Test sets are tiny (KBs-MBs
    against a 100 TB corpus — in production they'd live in their own small
    file); here the benchmark rows are carved from the corpus by a
    distributed filter scan and only the MATCHING rows' shingle sets come
    back to the driver for the ray.put broadcast."""

    def bench_rows(batch: pa.Table) -> pa.Table:
        d = batch.column("doc_id").to_numpy()
        t = batch.filter(pa.array(d % mod == 0)).column("text")
        sh, _ = _shingle_bytes(t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t, k)
        uniq = np.unique(sh)
        return pa.table({"s": pa.array(uniq.tolist(), pa.binary())})

    ds = _read_parquet_any(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    parts = ds.map_batches(bench_rows, batch_format="pyarrow").take_all()
    return {r["s"] for r in parts}


class Decontaminate:
    """Actor: holds the broadcast benchmark shingle set; per batch one
    vectorized window gather + C-level hash-set membership (Series.isin)."""

    def __init__(self, bench_ref, k: int = DECON_K, mod: int = DECON_MOD):
        import ray

        bench = (
            ray.get(bench_ref)
            if isinstance(bench_ref, ray.ObjectRef)
            else bench_ref
        )
        # sorted fixed-width array ONCE per actor: Series.isin(set) would
        # rebuild an object array + hash table from the set on every batch
        self.bench = np.sort(np.array(sorted(bench), dtype=f"S{k}"))
        self.k = k
        self.mod = mod

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = (
            batch.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        keep = doc_ids % self.mod != 0  # benchmark rows are not scored
        texts = pc.cast(
            batch.column("text").combine_chunks().filter(pa.array(keep)),
            pa.string(),
        )
        sh, doc_idx = _shingle_bytes(texts, self.k)
        n = int(keep.sum())
        n_hits = np.zeros(n, dtype=np.int64)
        if len(sh):
            # binary-search membership against the pre-sorted bench array
            pos = np.searchsorted(self.bench, sh)
            pos = np.minimum(pos, len(self.bench) - 1) if len(self.bench) else pos
            hit = (
                self.bench[pos] == sh
                if len(self.bench)
                else np.zeros(len(sh), dtype=bool)
            )
            if hit.any():
                # distinct (doc, shingle) pairs via one lexsort over the
                # (few) hit rows, then a bincount per doc
                hd, hs = doc_idx[hit], sh[hit]
                order = np.lexsort((hs, hd))
                hd, hs = hd[order], hs[order]
                first = np.ones(len(hd), dtype=bool)
                first[1:] = (hd[1:] != hd[:-1]) | (hs[1:] != hs[:-1])
                n_hits = np.bincount(hd[first], minlength=n).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[keep]),
                "n_hits": pa.array(n_hits),
                "contaminated": pa.array(n_hits >= 1),
            }
        )


def decontaminate(sf_dir: str, k: int = DECON_K, mod: int = DECON_MOD) -> rd.Dataset:
    """Test-set decontamination: flag corpus documents sharing any char
    k-gram with the benchmark set (n_hits = DISTINCT shared shingles).
    The benchmark shingle set broadcasts once (ray.put -> actor __init__);
    the corpus streams through an embarrassingly parallel actor stage."""
    import ray

    ref = ray.put(benchmark_shingles(sf_dir, k, mod))
    ds = _read_parquet_any(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        Decontaminate,
        fn_constructor_args=(ref, k, mod),
        batch_format="pyarrow",
        concurrency=(1, 4),
    )


def decontaminate_oracle_sql(
    table: str = "documents", k: int = DECON_K, mod: int = DECON_MOD
) -> str:
    return (
        f"WITH b AS (SELECT text FROM {table} WHERE doc_id % {mod} = 0), "
        f"bs AS (SELECT DISTINCT substr(b.text, CAST(i AS INT), {k}) AS s "
        f"FROM b, LATERAL (SELECT unnest(range(1, length(text) - {k - 1} + 1)) AS i) g), "
        f"d AS (SELECT doc_id, text FROM {table} WHERE doc_id % {mod} <> 0), "
        f"ds AS (SELECT doc_id, substr(text, CAST(i AS INT), {k}) AS s "
        f"FROM d, LATERAL (SELECT unnest(range(1, length(text) - {k - 1} + 1)) AS i) g), "
        "hits AS (SELECT doc_id, count(DISTINCT ds.s) AS n_hits "
        "FROM ds JOIN bs USING (s) GROUP BY doc_id) "
        "SELECT d.doc_id, COALESCE(h.n_hits, 0) AS n_hits, "
        "COALESCE(h.n_hits, 0) >= 1 AS contaminated "
        "FROM d LEFT JOIN hits h ON d.doc_id = h.doc_id"
    )


def pack_texts(
    sf_dir: str, budget: int = PACK_BUDGET, ranges: int = PACK_RANGES,
    parts: int = 16,
) -> rd.Dataset:
    """MATERIALIZE the packed training chunks: one row per context window
    (chunk_id, tokens, text) with the chunk's tokens space-joined in global
    doc_id order — the step that actually writes an LLM's training shards.

    Shape: seq_pack's sort-free prefix sum gives each doc its token_start;
    one hash join attaches it to the text, and each batch then emits
    per-(chunk, DOC) contiguous fragments pre-joined in gidx order; a final
    groupby(chunk_id) concatenates the few fragments per chunk by their min
    gidx.  Fragments are disjoint gidx intervals (per doc, never merged
    across docs batch-locally), so the pre-join commutes with the final
    ordered join.  Cost honesty: repacking by token position inherently
    moves the text through TWO exchanges (the join and the chunk merge) —
    both move ~text-size fragment strings, never token-count rows."""
    from .dedup import _hash_join

    packed = seq_pack(sf_dir, budget=budget, ranges=ranges)

    def narrow(b: pa.Table) -> pa.Table:
        return b.select(["doc_id", "token_start"])

    docs = _read_parquet_any(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    joined = _hash_join(
        docs,
        packed.map_batches(narrow, batch_format="pyarrow"),
        on="doc_id",
        parts=parts,
        left_schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
        right_schema=pa.schema([("doc_id", pa.int64()), ("token_start", pa.int64())]),
    )

    word_re = re.compile(_WORD_RE)

    def frags(batch: pd.DataFrame) -> pa.Table:
        lists = batch["text"].str.findall(word_re)
        nw = lists.str.len().to_numpy(np.int64)
        s = batch["token_start"].to_numpy(np.int64)
        ex = lists.reset_index(drop=True).explode()
        ex = ex[ex.notna()]
        if not len(ex):
            return pa.table(
                {
                    "chunk_id": pa.array([], pa.int64()),
                    "o": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "frag": pa.array([], pa.string()),
                }
            )
        within = np.concatenate([np.arange(k) for k in nw if k > 0])
        gidx = np.repeat(s, nw) + within
        dpos = np.repeat(np.arange(len(batch)), nw)
        # fragment per (chunk, DOC): a batch's docs need not be adjacent in
        # gidx, so merging a whole chunk's batch-local tokens would join
        # non-contiguous intervals out of order; per-doc fragments are
        # contiguous by construction and the fold's min-gidx sort is sound
        df = pd.DataFrame(
            {
                "c": gidx // budget,
                "d": dpos,
                "o": gidx,
                "t": ex.to_numpy(dtype=object),
            }
        )
        fr = (
            df.sort_values("o")
            .groupby(["c", "d"], sort=False)
            .agg(o=("o", "min"), n=("t", "size"), frag=("t", " ".join))
            .reset_index()
        )
        return _pandas_to_arrow(
            fr.rename(columns={"c": "chunk_id"})[["chunk_id", "o", "n", "frag"]]
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("o")
        return pd.DataFrame(
            {
                "chunk_id": [np.int64(g["chunk_id"].iloc[0])],
                "tokens": [np.int64(g["n"].sum())],
                "text": [" ".join(g["frag"])],
            }
        )

    return (
        joined.map_batches(frags, batch_format="pandas")
        .groupby("chunk_id")
        .map_groups(_arrow_out(fold), batch_format="pandas")
    )


def pack_texts_oracle_sql(table: str = "documents", budget: int = PACK_BUDGET) -> str:
    return (
        f"WITH t AS (SELECT doc_id, regexp_extract_all(text, '\\S+') AS l FROM {table}), "
        "p AS (SELECT doc_id, l, CAST(COALESCE(SUM(len(l)) OVER ("
        "ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start FROM t), "
        "e AS (SELECT start, unnest(l) AS tok, unnest(range(1, len(l)+1)) AS j FROM p), "
        "g AS (SELECT start + j - 1 AS gidx, tok FROM e) "
        f"SELECT gidx // {budget} AS chunk_id, count(*) AS tokens, "
        "string_agg(tok, ' ' ORDER BY gidx) AS text FROM g GROUP BY 1"
    )
