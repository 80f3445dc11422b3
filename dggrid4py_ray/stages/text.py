"""Text-analysis stages for large-scale training-data pipelines.

Each is a map_batches stage over the `documents` table (driver testdata:
doc_id, text, lang, source, n_chars).  All kernels are vectorized across the
batch — pyarrow.compute string kernels for counting/splitting, flat-buffer
numpy with reduceat for per-document aggregation, column-wise Horner for the
byte-sequential FNV hash — no per-row Python in the hot path.  Stateful
pieces (compiled patterns, stopword sets) live in actor __init__.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that",
           "with", "for", "on", "my", "how", "over", "at", "by", "this", "not"},
    "de": {"der", "die", "das", "und", "ist", "ich", "nicht", "ein", "zu", "mit"},
    "fr": {"le", "la", "les", "et", "est", "je", "ne", "un", "une", "dans"},
    "es": {"el", "la", "los", "y", "es", "no", "un", "una", "en", "que"},
}

_WORD_SPLIT = r"[^a-zA-ZÀ-ÿ]+"


def _str_array(batch: pa.Table, col: str) -> pa.Array:
    arr = batch[col]
    return arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr


def _word_lists(arr: pa.Array):
    """(flat lowercase words (pa.Array), doc offsets (np.ndarray)) — empty
    split artifacts removed."""
    words = pc.split_pattern_regex(pc.utf8_lower(arr), _WORD_SPLIT)
    words = pa.ListArray.from_arrays(words.offsets, words.values)
    nonempty = pc.utf8_length(words.values)
    keep = pc.greater(nonempty, 0)
    # per-doc counts of non-empty words
    off = words.offsets.to_numpy()
    keep_np = keep.to_numpy(zero_copy_only=False)
    csum = np.concatenate([[0], np.cumsum(keep_np)])
    new_off = csum[off]
    flat = words.values.filter(keep)
    return flat, new_off


def _segment_sum(values: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Sum of values[offsets[i]:offsets[i+1]] per segment (0 for empty)."""
    n = len(offsets) - 1
    csum = np.concatenate([[0], np.cumsum(values, dtype=np.float64)])
    return csum[offsets[1:]] - csum[offsets[:-1]]


from .hashing import hash64, _finalize  # noqa: E402

_GRAM_MULT = np.uint64(0x100000001B3)  # FNV-ish odd multiplier


def _space_tokens(arr: pa.Array):
    """split(' ') token hashes + doc offsets.  Returns (token_hash flat
    uint64, offsets int64 (n_docs+1), flat token values pa.Array)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    words = pc.split_pattern(arr, " ")
    off = words.offsets.to_numpy().astype(np.int64)
    flat = words.values
    return hash64(flat), off, flat


def _gram_hashes(tok_hash: np.ndarray, offsets: np.ndarray, n: int):
    """Rolling n-gram hashes over the flat token-hash array, masked to
    grams that do not cross document boundaries.

    Returns (gram_hash flat uint64, doc_index per gram int64,
    grams_per_doc int64 (n_docs,)).  Fully vectorized: n vector ops for
    the roll (n is 2-8), one repeat for the doc index."""
    n_docs = len(offsets) - 1
    lens = np.diff(offsets)
    per_doc = np.maximum(lens - n + 1, 0)
    total = len(tok_hash)
    if total < n or per_doc.sum() == 0:
        return (np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64),
                per_doc)
    m = total - n + 1
    g = tok_hash[:m].copy()
    for k in range(1, n):
        g = g * _GRAM_MULT + tok_hash[k:m + k]
    g = _finalize(g)
    # a gram is valid when its first and last token are in the same doc
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    valid = doc_of[:m] == doc_of[n - 1:]
    return g[valid], doc_of[:m][valid], per_doc


class TokenCounter:
    """Whitespace tokens + a BPE-ish regex token count + char count, all via
    pyarrow.compute count kernels."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        # GPT-2-style pretokenizer shape (public pattern family)
        self.bpe_pattern = r"\w+|[^\w\s]"

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = _str_array(batch, self.text_col)
        ws = pc.count_substring_regex(arr, r"\S+")
        bpe = pc.count_substring_regex(arr, self.bpe_pattern)
        chars = pc.utf8_length(arr)
        return (batch.append_column("n_tokens_ws", pc.cast(ws, pa.int64()))
                     .append_column("n_tokens_re", pc.cast(bpe, pa.int64()))
                     .append_column("n_chars_computed", pc.cast(chars, pa.int64())))


class QualityScorer:
    """Heuristic quality features: length, punctuation ratio, stopword ratio,
    mean word length, uppercase ratio — flat-word-array + segment sums."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.stop = pa.array(sorted(set().union(*_STOPWORDS.values())))

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = _str_array(batch, self.text_col)
        n = batch.num_rows
        length = np.maximum(pc.utf8_length(arr).to_numpy(zero_copy_only=False), 1)
        punct = pc.count_substring_regex(arr, r"[^\w\s]").to_numpy(zero_copy_only=False)
        upper = pc.count_substring_regex(arr, r"[A-Z]").to_numpy(zero_copy_only=False)
        flat, off = _word_lists(arr)
        wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
        is_stop = pc.is_in(flat, value_set=self.stop).to_numpy(zero_copy_only=False)
        nw = np.maximum(off[1:] - off[:-1], 1)
        stop_ratio = _segment_sum(is_stop.astype(np.int64), off) / nw
        mean_wlen = _segment_sum(wlen, off) / nw
        punct_ratio = punct / length
        upper_ratio = upper / length
        score = (np.clip(stop_ratio * 3, 0, 1) * 0.4
                 + np.clip(mean_wlen / 8.0, 0, 1) * 0.3
                 + (1.0 - np.clip(punct_ratio * 4, 0, 1)) * 0.2
                 + (1.0 - np.clip(upper_ratio * 5, 0, 1)) * 0.1)
        return (batch.append_column("punct_ratio", pa.array(punct_ratio))
                     .append_column("stopword_ratio", pa.array(stop_ratio))
                     .append_column("quality_score", pa.array(score)))


class LanguageId:
    """Tiny stopword-count language heuristic over {en,de,fr,es} + 'other':
    one is_in membership pass per language over the flat word array."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.langs = sorted(_STOPWORDS)
        self.sets = {k: pa.array(sorted(v)) for k, v in _STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = _str_array(batch, self.text_col)
        n = batch.num_rows
        flat, off = _word_lists(arr)
        scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        for j, lang in enumerate(self.langs):
            hit = pc.is_in(flat, value_set=self.sets[lang]) \
                    .to_numpy(zero_copy_only=False).astype(np.int64)
            scores[:, j] = _segment_sum(hit, off)
        best = np.argmax(scores, axis=1)
        has = scores.max(axis=1) > 0
        langs = np.array(self.langs, dtype=object)
        out = np.where(has, langs[best], "other")
        return batch.append_column(self.out_col, pa.array(out, type=pa.string()))


class Redactor:
    """Pattern redaction (the PII-scrub shape of a curation pipeline):
    apply an ordered list of (regex, replacement) rewrites to a text
    column.  Runs entirely in Arrow's RE2 ``replace_substring_regex`` —
    zero per-row Python, and the same regex engine family as DuckDB's
    ``regexp_replace(..., 'g')``, which is what lets the driver oracle
    check the redacted output byte-for-byte.

    Patterns compile implicitly inside Arrow per call; the stage is
    stateless, so it fuses with the read (no actor pool needed).  At
    100 TB the cost is one RE2 scan per pattern over the flat UTF-8
    buffer — add patterns judiciously and prefer one alternation over
    many passes."""

    def __init__(self, patterns=None, text_col: str = "text",
                 out_col: str = "text_redacted"):
        self.patterns = list(patterns or
                             [(r"[0-9][0-9 \-]{6,}[0-9]", "<NUM>")])
        self.text_col = text_col
        self.out_col = out_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = _str_array(batch, self.text_col)
        for pat, rep in self.patterns:
            arr = pc.replace_substring_regex(arr, pattern=pat,
                                             replacement=rep)
        return batch.append_column(self.out_col, arr)


class Fingerprinter:
    """Deterministic 64-bit document fingerprint (FNV-1a over bytes) and a
    rolling-hash shingle min (cheap near-dup signal).

    FNV-1a is byte-sequential, so it is vectorized ACROSS documents:
    right-aligned padded byte matrix + column-wise Horner (pad positions
    masked), exactly reproducing the per-document scalar FNV-1a.  Documents
    longer than ``max_bytes`` hash their first ``max_bytes`` bytes."""

    _FNV_OFF = np.uint64(0xCBF29CE484222325)
    _FNV_PRIME = np.uint64(0x100000001B3)

    def __init__(self, text_col: str = "text", shingle: int = 8,
                 max_bytes: int = 65536):
        self.text_col = text_col
        self.shingle = shingle
        self.max_bytes = max_bytes

    _CHUNK = 256  # docs per chunk: keeps the byte matrix cache-resident

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_numpy(zero_copy_only=False)
        n = len(texts)
        h = np.full(n, self._FNV_OFF)
        rmin = np.full(n, self._FNV_OFF)
        k = self.shingle
        pw = np.uint64(257) ** np.arange(k, dtype=np.uint64)
        for s in range(0, n, self._CHUNK):
            sub = texts[s:s + self._CHUNK]
            m = len(sub)
            bufs = [str(t).encode("utf-8", "ignore")[:self.max_bytes] for t in sub]
            lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=m)
            total = int(lens.sum())
            flat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            maxlen = int(lens.max()) if m else 0
            # FNV-1a: right-aligned (maxlen, m) matrix -> row-contiguous
            # Horner over byte positions with pad mask
            doc_rep = np.repeat(np.arange(m), lens)
            col_idx = (np.arange(total) - np.repeat(starts, lens)
                       + np.repeat(maxlen - lens, lens))
            mat = np.zeros((maxlen, m), dtype=np.uint64)
            mat[col_idx, doc_rep] = flat
            hh = np.full(m, self._FNV_OFF)
            pad_until = maxlen - lens
            with np.errstate(over="ignore"):
                for c in range(maxlen):
                    active = c >= pad_until
                    hh = np.where(active, (hh ^ mat[c]) * self._FNV_PRIME, hh)
            h[s:s + m] = hh
            # rolling-hash shingle min over the flat buffer, per-doc reduceat
            rr = hh.copy()
            long_enough = lens >= k
            if long_enough.any() and total >= k:
                win = np.lib.stride_tricks.sliding_window_view(
                    flat.astype(np.uint64), k)
                with np.errstate(over="ignore"):
                    hashes = (win * pw[None, :]).sum(axis=1)
                le = np.nonzero(long_enough)[0]
                seg = np.empty(2 * len(le), dtype=np.int64)
                seg[0::2] = starts[le]
                seg[1::2] = starts[le] + lens[le] - k + 1
                seg_min = np.minimum.reduceat(
                    hashes, np.clip(seg[:-1], 0, len(hashes) - 1))
                rr[le] = seg_min[0::2]
            rmin[s:s + m] = rr
        return (batch.append_column("fingerprint", pa.array(h.view(np.int64)))
                     .append_column("shingle_min", pa.array(rmin.view(np.int64))))


class RepetitionScorer:
    """Gopher-style repetition/quality signals per document (Rae et al.
    2021 §A1.1 repetition filters, public): duplicate n-gram fraction and
    most-frequent-token share, emitted as exact integer counts so an SQL
    oracle can reproduce them bit-for-bit.

    Tokenization is split-on-single-space (DuckDB ``string_split(text,' ')``
    parity); duplicate detection sorts (doc, gram-hash) pairs batch-wide —
    one lexsort + run-length scan, no per-document Python.  Documents with
    fewer than ``gram_n`` tokens emit no row (they have no grams — matches
    the oracle's join semantics).  Gram identity is 64-bit hashed; a
    collision (p ~ grams_per_doc^2/2^64) would undercount distinct grams
    by one — negligible."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 gram_n: int = 2):
        self._grams = _gram_hashes
        self._toks = _space_tokens
        self.text_col = text_col
        self.id_col = id_col
        self.n = gram_n

    def __call__(self, batch: pa.Table) -> pa.Table:
        th, off, _ = self._toks(batch[self.text_col])
        n_docs = batch.num_rows
        lens = np.diff(off)
        g, gdi, per_doc = self._grams(th, off, self.n)

        # distinct grams per doc: run starts in the (doc, gram)-sorted pairs
        if len(g):
            order = np.lexsort((g, gdi))
            gs, ds_ = g[order], gdi[order]
            new_run = np.empty(len(gs), dtype=bool)
            new_run[0] = True
            new_run[1:] = (ds_[1:] != ds_[:-1]) | (gs[1:] != gs[:-1])
            distinct = np.bincount(ds_[new_run], minlength=n_docs)
        else:
            distinct = np.zeros(n_docs, dtype=np.int64)

        # most-frequent-token count per doc: run lengths of sorted (doc, tok)
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        order = np.lexsort((th, doc_of))
        ts, tdi = th[order], doc_of[order]
        starts = np.empty(len(ts), dtype=bool)
        if len(ts):
            starts[0] = True
            starts[1:] = (tdi[1:] != tdi[:-1]) | (ts[1:] != ts[:-1])
        sidx = np.flatnonzero(starts)
        run_len = np.diff(np.append(sidx, len(ts)))
        run_doc = tdi[sidx]
        top_count = np.zeros(n_docs, dtype=np.int64)
        if len(sidx):
            docs_present, seg_starts = np.unique(run_doc, return_index=True)
            top_count[docs_present] = np.maximum.reduceat(run_len, seg_starts)

        keep = per_doc > 0
        ids = batch[self.id_col]
        return pa.table({
            self.id_col: ids.filter(pa.array(keep)) if not keep.all() else ids,
            "n_tokens": pa.array(lens[keep].astype(np.int64)),
            "n_grams": pa.array(per_doc[keep].astype(np.int64)),
            "n_dup_grams": pa.array((per_doc - distinct)[keep].astype(np.int64)),
            "top_token_count": pa.array(top_count[keep]),
        })


def token_document_frequency(ds, text_col: str = "text",
                             id_col: str = "doc_id"):
    """Corpus document-frequency / collection-frequency per token (the
    TF-IDF denominator): per-batch partial (each document lives wholly in
    one batch, so per-batch ``nunique`` doc counts SUM to the corpus df)
    -> one vocabulary-sized groupby.  Only (token, counts) rows ever
    shuffle — vocabulary-bounded, never corpus-bounded."""
    import pandas as pd
    import ray.data
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        _, off, flat = _space_tokens(batch[text_col])
        doc_of = np.repeat(np.arange(batch.num_rows, dtype=np.int64),
                           np.diff(off))
        pdf = pd.DataFrame({"tok": flat.to_pandas(), "d": doc_of})
        gr = pdf.groupby("tok", sort=False)["d"].agg(cf="size", df="nunique")
        return pa.Table.from_pandas(gr.reset_index(), preserve_index=False)

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby("tok").aggregate(Sum("df", alias_name="df"),
                                        Sum("cf", alias_name="cf")))


def inverted_index(ds, text_col: str = "text", id_col: str = "doc_id",
                   bucket_docs: int = 100):
    """Sharded inverted index: one row per (token, doc-id bucket) with the
    bucket's sorted posting list and document frequency.

    Scale shape: a stopword's corpus-wide posting list is corpus-sized, so
    posting lists are sharded by ``doc_id // bucket_docs`` — every group's
    assembly memory and output row is bounded by ``bucket_docs`` no matter
    how hot the token, and the groupby key space is vocab x buckets (the
    shuffle carries only distinct (token, doc) pairs, never text).  Bucket
    shards concatenate in bucket order to recover the full posting list."""
    import pandas as pd

    def pairs(batch: pa.Table) -> pa.Table:
        _, off, flat = _space_tokens(batch[text_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        doc_rep = np.repeat(ids, np.diff(off))
        pdf = pd.DataFrame({"tok": flat.to_pandas(), id_col: doc_rep})
        pdf = pdf.drop_duplicates()
        pdf["bucket"] = (pdf[id_col] // bucket_docs).astype(np.int64)
        return pa.Table.from_pandas(pdf, preserve_index=False)

    def assemble(g: "pd.DataFrame") -> "pd.DataFrame":
        ids = np.sort(g[id_col].to_numpy())
        return pd.DataFrame({
            "tok": [g["tok"].iloc[0]],
            "bucket": [int(g["bucket"].iloc[0])],
            "postings": [",".join(str(i) for i in ids)],
            "df_bucket": [np.int64(len(ids))],
        })

    return (ds.map_batches(pairs, batch_format="pyarrow")
              .groupby(["tok", "bucket"]).map_groups(assemble,
                                                     batch_format="pandas"))


def extract_json_int_field(ds: "ray.data.Dataset", col: str, field: str,
                           out_col: str | None = None) -> "ray.data.Dataset":
    """Vectorized extraction of a flat integer field from a JSON-string
    column (the semi-structured 'props' pattern): one Arrow
    ``extract_regex`` kernel per batch — no per-row json.loads.  Nulls
    and rows without the field become null int64.  For nested/typed JSON
    use a real parser in an actor pool; this is the hot fast path for the
    flat telemetry case."""
    import re

    import pyarrow as pa
    import pyarrow.compute as pc

    pat = '"' + re.escape(field) + r'"\s*:\s*(?P<v>-?\d+)'

    def extract(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col or field,
                                   pa.array([], pa.int64()))
        hit = pc.extract_regex(t[col].combine_chunks(), pat)
        v = pc.cast(pc.struct_field(hit, "v"), pa.int64())
        return t.append_column(out_col or field, v)

    return ds.map_batches(extract, batch_format="pyarrow")


def tfidf_topk(ds: "ray.data.Dataset", text_col: str = "text",
               id_col: str = "doc_id", k: int = 3,
               scale: int = 10000) -> "ray.data.Dataset":
    """Top-k TF-IDF terms per document (keyword extraction / relevance
    features; reference scope is the binning/statistics analog — this is
    the beyond-reference text surface).

    Scale shape: ONE vocabulary-bounded aggregate
    (``token_document_frequency`` — only (token, df) rows shuffle, never
    text), idf table broadcast once via ``ray.put`` and loaded per actor
    in ``__init__``; then a single pure map over the corpus computes
    per-document tf and top-k with one lexsort per batch — the text
    column never enters an exchange.  Scores are emitted integer-scaled
    (round(tf * ln(N/df) * scale)) so the DuckDB oracle compares
    bit-for-bit; ties break (score desc, token asc), matching
    ROW_NUMBER() OVER (ORDER BY score DESC, tok).

    Vocabulary is assumed driver-bounded (true for natural-language
    corpora after the df aggregate; for adversarial vocabularies prune
    with a min_df filter upstream)."""
    import ray

    import pandas as pd

    dfs = token_document_frequency(ds, text_col, id_col).to_pandas()
    n_docs = ds.count()
    idf = np.log(float(n_docs) / dfs["df"].to_numpy(np.float64))
    idf_ref = ray.put(pd.Series(idf, index=dfs["tok"].to_numpy()))

    class TfidfScorer:
        def __init__(self, ref, k_, scale_, text_c, id_c):
            self.idf = ray.get(ref)
            self.k, self.scale = k_, scale_
            self.text_col, self.id_col = text_c, id_c

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table({self.id_col: batch[self.id_col],
                                 "tok": pa.array([], pa.string()),
                                 "score": pa.array([], pa.int64())})
            _, off, flat = _space_tokens(batch[self.text_col])
            doc_of = np.repeat(np.arange(batch.num_rows, dtype=np.int64),
                               np.diff(off))
            pdf = pd.DataFrame({"tok": flat.to_pandas(), "d": doc_of})
            tf = (pdf.groupby(["d", "tok"], sort=False).size()
                  .reset_index(name="tf"))
            w = tf["tok"].map(self.idf).to_numpy(np.float64)
            tf["score"] = np.round(
                tf["tf"].to_numpy(np.float64) * w * self.scale
            ).astype(np.int64)
            tf = tf.sort_values(["d", "score", "tok"],
                                ascending=[True, False, True],
                                kind="stable")
            top = tf.groupby("d", sort=False).head(self.k)
            ids = batch[self.id_col].to_numpy(zero_copy_only=False)
            return pa.table({
                self.id_col: pa.array(ids[top["d"].to_numpy()]),
                "tok": pa.array(top["tok"].to_numpy(), pa.string()),
                "score": pa.array(top["score"].to_numpy())})

    # actor pool sized to the box (the repo's measured pitfall: text
    # stages capped at 8 actors lose 2-3x on 32 CPUs)
    return ds.map_batches(TfidfScorer,
                          fn_constructor_args=(idf_ref, k, scale,
                                               text_col, id_col),
                          batch_format="pyarrow", concurrency=(1, 32))


def token_cooccurrence(ds, text_col: str = "text", id_col: str = "doc_id",
                       vocab_size: int = 32):
    """Document-level token co-occurrence over the top-``vocab_size``
    vocabulary: one row per unordered token pair (tok_a < tok_b) with the
    number of documents containing BOTH, plus each token's document
    frequency (so PMI = log(n_both * N / (df_a * df_b)) is derivable
    exactly downstream).

    Scale shape: the vocabulary is fixed FIRST (token_document_frequency —
    vocab-bounded shuffle — then an answer-sized top-V pull broadcast into
    the pair stage), so the pair space is <= V^2 regardless of corpus
    size; text never shuffles.  Pair emission is vectorized by token-count
    class: docs with c in-vocab tokens stack into an (m, c) matrix and one
    triu_indices(c, 1) emits all m*c*(c-1)/2 pairs — no per-doc Python."""
    from ray.data.aggregate import Sum

    top = (token_document_frequency(ds, text_col, id_col)
           .sort(["df", "cf", "tok"], descending=[True, True, False])
           .limit(vocab_size).to_pandas())          # answer-sized pull
    vocab = top["tok"].tolist()
    dfs = top["df"].to_numpy().astype(np.int64)
    vocab_pa = pa.array(vocab, pa.string())
    V = len(vocab)

    def pairs(batch: pa.Table) -> pa.Table:
        out_a, out_b = [], []
        if batch.num_rows:
            _, off, flat = _space_tokens(batch[text_col])
            doc_of = np.repeat(np.arange(batch.num_rows, dtype=np.int64),
                               np.diff(off))
            idx = pc.index_in(flat, value_set=vocab_pa)
            valid = pc.is_valid(idx).to_numpy(zero_copy_only=False)
            tid = idx.to_numpy(zero_copy_only=False)[valid].astype(np.int64)
            # distinct (doc, tok), sorted by (doc, tok) — one np.unique
            key = np.unique(doc_of[valid] * V + tid)
            docs, cnt = np.unique(key // V, return_counts=True)
            toks = key % V
            start = np.concatenate([[0], np.cumsum(cnt)[:-1]])
            for c in np.unique(cnt):
                if c < 2:
                    continue
                s = start[cnt == c]
                mat = toks[s[:, None] + np.arange(c)]
                iu, ju = np.triu_indices(int(c), 1)
                out_a.append(mat[:, iu].ravel())
                out_b.append(mat[:, ju].ravel())
        if out_a:
            a = np.concatenate(out_a)
            b = np.concatenate(out_b)
            key, n = np.unique(a * V + b, return_counts=True)
            return pa.table({"ia": pa.array(key // V),
                             "ib": pa.array(key % V),
                             "n_both": pa.array(n.astype(np.int64))})
        return pa.table({"ia": pa.array([], pa.int64()),
                         "ib": pa.array([], pa.int64()),
                         "n_both": pa.array([], pa.int64())})

    agg = (ds.map_batches(pairs, batch_format="pyarrow")
             .groupby(["ia", "ib"])
             .aggregate(Sum("n_both", alias_name="n_both")))

    vocab_arr = np.array(vocab, dtype=object)

    def finish(t: pa.Table) -> pa.Table:
        ia = t["ia"].to_numpy(zero_copy_only=False).astype(np.int64)
        ib = t["ib"].to_numpy(zero_copy_only=False).astype(np.int64)
        # canonicalize to LEXICOGRAPHIC pair order (tok_a < tok_b), not
        # vocabulary-rank order — the SQL-expressible contract
        swap = vocab_arr[ia] > vocab_arr[ib]
        a = np.where(swap, ib, ia)
        b = np.where(swap, ia, ib)
        return pa.table({
            "tok_a": pa.array(vocab_arr[a].tolist(), pa.string()),
            "tok_b": pa.array(vocab_arr[b].tolist(), pa.string()),
            "df_a": pa.array(dfs[a]),
            "df_b": pa.array(dfs[b]),
            "n_both": pc.cast(t["n_both"], pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


def levenshtein(a: str, b: str) -> int:
    """Exact edit distance with the row-DP vectorized over ``b`` (the
    cur[j-1] carry resolved by the prefix-min identity
    cur[j] = min_k<=j (t[k] + (j - k)) = accumulate-min(t[k] - k) + j),
    so the inner loop is numpy, not Python — ~1 ms for 500x500.
    Matches DuckDB ``levenshtein`` (unit costs, codepoint granularity)."""
    if a == b:
        return 0
    if not a or not b:
        return max(len(a), len(b))
    bb = np.fromiter(map(ord, b), dtype=np.int64, count=len(b))
    n = len(b)
    j = np.arange(n + 1, dtype=np.int64)
    prev = j.copy()
    for i, ca in enumerate(a, 1):
        c = np.minimum(prev[1:] + 1, prev[:-1] + (bb != ord(ca)))
        t = np.concatenate(([i], c)) - j
        prev = np.minimum.accumulate(t) + j
    return int(prev[n])


def blocked_edit_join(ds: "ray.data.Dataset", block_col: str,
                      id_col: str = "doc_id", text_col: str = "text",
                      max_dist: int = 50, max_block: int = 256
                      ) -> "ray.data.Dataset":
    """Edit-distance similarity self-join under a blocking key: all pairs
    of rows sharing ``block_col`` with levenshtein(text_a, text_b) <=
    ``max_dist``.  Output (id_a, id_b, dist), id_a < id_b.

    The blocking key bounds the quadratic verify the way LSH bands bound
    minhash: ONE groupby shuffle on the block key (rows carry only id +
    text), per-block pair DP inside ``map_groups``.  Blocks larger than
    ``max_block`` are truncated to their ``max_block`` smallest ids (a
    block that big means the blocking key is too weak for edit-distance
    verification anyway) — documented recall cap, same contract as the
    dedup family's ``max_bucket``."""
    import pandas as _pd

    proj = ds.map_batches(
        lambda t: pa.table({"_bk": t[block_col], id_col: t[id_col],
                            text_col: t[text_col]}),
        batch_format="pyarrow")

    def pairs(g: _pd.DataFrame) -> _pd.DataFrame:
        g = g.sort_values(id_col, ignore_index=True)
        if len(g) > max_block:
            g = g.iloc[:max_block]
        ids = g[id_col].to_numpy()
        texts = g[text_col].tolist()
        out_a, out_b, out_d = [], [], []
        for i in range(len(g) - 1):
            for k in range(i + 1, len(g)):
                d = levenshtein(texts[i], texts[k])
                if d <= max_dist:
                    out_a.append(ids[i])
                    out_b.append(ids[k])
                    out_d.append(d)
        return _pd.DataFrame({"id_a": np.asarray(out_a, dtype=ids.dtype),
                              "id_b": np.asarray(out_b, dtype=ids.dtype),
                              "dist": np.asarray(out_d, dtype=np.int64)})

    return proj.groupby("_bk").map_groups(pairs, batch_format="pandas")


def bigram_lm_score(ds: "ray.data.Dataset", text_col: str = "text",
                    id_col: str = "doc_id", scale: int = 1_000_000):
    """CCNet-style n-gram language-model quality scoring: train an
    add-one-smoothed bigram LM on the corpus itself, then score every
    document by its summed negative log-likelihood (high = surprising /
    low-quality under the corpus LM — the Wikipedia-perplexity filter of
    Wenzek et al. 2020, with the corpus standing in for the reference LM).

    Dataflow (two scans, both vocabulary-bounded on the wire):
      1. ONE pass emits per-batch partial bigram counts AND unigram
         token counts (distinguished by an integer tag key column, so
         no in-band sentinel can collide with a real token) -> one
         groupby over the vocab^2-bounded key space.  Only (word, word,
         tag, count) rows shuffle, never text.
      2. The count table (answer-small) folds on the driver into a
         per-bigram integer score ``nll_e6 = round(ln((c(w1 .) + V) /
         (c(w1 w2) + 1)) * scale)`` (V = corpus vocabulary size) and
         broadcasts via ray.put; a pure map then segment-sums the
         integer scores per document — deterministic at any parallelism
         (per-gram rounding makes the doc score an integer SUM, immune
         to float summation order).

    Every document bigram exists in the LM by construction (the model is
    trained on the scored corpus); for scoring a stream against a fixed
    reference LM, unseen bigrams would take the ``c=0`` smoothed score.
    Returns (id_col, n_bigrams, nll_sum_e6); documents with fewer than
    two tokens carry no bigram evidence and are omitted (SQL inner-join
    semantics)."""
    import pandas as pd
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    def _doc_bigrams(batch: pa.Table):
        """(words flat np object array, doc lens, valid bigram mask over
        positions 0..total-2, per-doc bigram counts)."""
        _, off, flat = _space_tokens(batch[text_col])
        words = flat.to_pandas().to_numpy()
        lens = np.diff(off)
        total = len(words)
        n_docs = batch.num_rows
        per_doc = np.maximum(lens - 1, 0)
        if total < 2 or per_doc.sum() == 0:
            return words, lens, np.zeros(max(total - 1, 0), bool), per_doc
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        valid = doc_of[:-1] == doc_of[1:]
        return words, lens, valid, per_doc

    def count_partial(batch: pa.Table) -> pa.Table:
        words, lens, valid, _ = _doc_bigrams(batch)
        empty = pd.DataFrame({"w1": pd.Series([], dtype=object),
                              "w2": pd.Series([], dtype=object),
                              "tag": pd.Series([], dtype=np.int64),
                              "c": pd.Series([], dtype=np.int64)})
        frames = [empty]
        if len(words):
            uni = pd.DataFrame({"w1": words}).groupby(
                "w1", sort=False).size().reset_index(name="c")
            uni["w2"] = ""
            uni["tag"] = np.int64(0)
            frames.append(uni[["w1", "w2", "tag", "c"]])
        if valid.any():
            bi = pd.DataFrame({"w1": words[:-1][valid],
                               "w2": words[1:][valid]})
            bi = bi.groupby(["w1", "w2"], sort=False) \
                .size().reset_index(name="c")
            bi["tag"] = np.int64(1)
            frames.append(bi[["w1", "w2", "tag", "c"]])
        out = pd.concat(frames, ignore_index=True)
        if not len(out):
            # typed empty (pd->Arrow turns empty object columns into
            # null type, which poisons the downstream aggregate)
            return pa.table({"w1": pa.array([], pa.string()),
                             "w2": pa.array([], pa.string()),
                             "tag": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        return pa.Table.from_pandas(out, preserve_index=False)

    counts = (ds.map_batches(count_partial, batch_format="pyarrow")
              .groupby(["w1", "w2", "tag"])
              .aggregate(Sum("c", alias_name="c"))
              .to_pandas())
    uni = counts[counts["tag"] == 0]
    bi = counts[counts["tag"] == 1].copy()
    vocab = len(uni)
    prefix = bi.groupby("w1")["c"].sum()
    cp = bi["w1"].map(prefix).to_numpy(np.float64)
    nll_e6 = np.round(np.log((cp + vocab) / (bi["c"].to_numpy(np.float64)
                                             + 1.0)) * scale).astype(np.int64)
    lm = pd.Series(nll_e6,
                   index=bi["w1"].to_numpy() + " " + bi["w2"].to_numpy())
    lm_ref = ray.put(lm)

    def score(batch: pa.Table) -> pa.Table:
        lm = ray.get(lm_ref)
        words, lens, valid, per_doc = _doc_bigrams(batch)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keep = per_doc > 0
        if not valid.any():
            return pa.table({id_col: ids[:0],
                             "n_bigrams": pa.array([], pa.int64()),
                             "nll_sum_e6": pa.array([], pa.int64())})
        grams = pd.Series(words[:-1][valid]).str.cat(
            pd.Series(words[1:][valid]), sep=" ")
        nll_f = grams.map(lm).to_numpy(np.float64)
        if np.isnan(nll_f).any():
            raise ValueError("bigram_lm_score: gram missing from the LM "
                             "(model trained on a different corpus?)")
        nll = nll_f.astype(np.int64)
        stops = np.cumsum(per_doc[keep])
        sums = np.add.reduceat(nll, np.concatenate([[0], stops[:-1]]))
        return pa.table({id_col: ids[keep],
                         "n_bigrams": pa.array(per_doc[keep]),
                         "nll_sum_e6": pa.array(sums.astype(np.int64))})

    return ds.map_batches(score, batch_format="pyarrow")


def source_gram_overlap(ds: "ray.data.Dataset", text_col: str = "text",
                        source_col: str = "source", n: int = 3,
                        scale: int = 1_000_000):
    """Pairwise n-gram-set overlap between corpus sources — the
    cross-source duplication audit run before mixing training sources
    ("how much of source B already lives in source A").  Returns one row
    per source pair with shared / union distinct-gram counts and
    Jaccard (pairs sharing zero grams are omitted, SQL inner-join
    semantics).

    Scale shape: per-batch distinct (gram-hash, source) partials -> ONE
    grouped_reduce for corpus-level distinctness -> per-gram source
    BITMASK fold (sources are a bounded vocabulary, <= 62) -> the
    pairwise matrix collapses to an answer-sized per-mask count table
    folded on the driver.  Text never shuffles; gram identity is the
    64-bit rolling hash (collisions vanishingly rare and purely
    pessimistic on Jaccard)."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    sources = sorted(set().union(*[
        set(b[source_col].to_pandas())
        for b in ds.select_columns([source_col])
        .map_batches(lambda t: pa.table({source_col: pa.compute.unique(
            t[source_col].combine_chunks()
            if isinstance(t[source_col], pa.ChunkedArray)
            else t[source_col])}), batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")]))
    if len(sources) > 62:
        raise ValueError("source_gram_overlap: bitmask fold supports at "
                         f"most 62 sources (got {len(sources)})")
    src_idx = {s: i for i, s in enumerate(sources)}
    ref = ray.put(src_idx)

    def pairs(batch: pa.Table) -> pa.Table:
        idx = ray.get(ref)
        th, off, _ = _space_tokens(batch[text_col])
        g, doc_of, _ = _gram_hashes(th, off, n)
        if not len(g):
            return pa.table({"gram": pa.array([], pa.int64()),
                             "bit": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        src = batch[source_col].to_numpy(zero_copy_only=False)
        pdf = pd.DataFrame({
            "gram": g.view(np.int64),
            "bit": pd.Series(src[doc_of]).map(idx).to_numpy(np.int64)}) \
            .drop_duplicates()
        pdf["bit"] = np.int64(1) << pdf["bit"].to_numpy()
        pdf["b"] = pdf["bit"]     # reduce copy (a key can't also reduce)
        return pa.Table.from_pandas(pdf, preserve_index=False)

    from .groupagg import grouped_reduce
    # corpus-level distinct (gram, source) then per-gram source mask
    dist = grouped_reduce(ds.map_batches(pairs, batch_format="pyarrow"),
                          ["gram", "bit"], {"b": "b"}, how="max") \
        .map_batches(lambda t: t.select(["gram", "b"]),
                     batch_format="pyarrow")
    masks = grouped_reduce(dist, "gram", {"b": "mask"}, how="sum")
    per_mask = (masks.map_batches(
        lambda t: pa.table({"mask": t["mask"],
                            "c": pa.array(np.ones(t.num_rows, np.int64))}),
        batch_format="pyarrow")
        .groupby("mask").aggregate(Sum("c", alias_name="c")).to_pandas())

    m = per_mask["mask"].to_numpy(np.int64)
    c = per_mask["c"].to_numpy(np.int64)
    rows = []
    for a in range(len(sources)):
        na = int(c[(m >> a) & 1 == 1].sum())
        for b in range(a + 1, len(sources)):
            nb = int(c[(m >> b) & 1 == 1].sum())
            shared = int(c[((m >> a) & 1 == 1) & ((m >> b) & 1 == 1)].sum())
            if shared == 0:
                continue
            union = na + nb - shared
            rows.append({"source_a": sources[a], "source_b": sources[b],
                         "shared_grams": shared, "union_grams": union,
                         # floor(x+0.5): DuckDB ROUND half-away parity
                         # (python round() is half-even)
                         "jaccard_e6": int(np.floor(
                             shared / union * scale + 0.5))})
    out = pd.DataFrame(rows, columns=["source_a", "source_b",
                                      "shared_grams", "union_grams",
                                      "jaccard_e6"])
    return pa.Table.from_pandas(out, preserve_index=False)


def adjacent_pair_counts(ds, text_col: str = "text",
                         left_col: str = "tok_l", right_col: str = "tok_r",
                         out_col: str = "n"):
    """Corpus-wide adjacent token-pair frequencies — the BPE merge-step
    statistic (Sennrich et al. 2016: each merge picks the most frequent
    adjacent symbol pair; this stage computes that frequency table over
    space tokenization, the engine's tokenizer-parity convention, cf.
    token_document_frequency).

    Ray shape: per-batch vectorized pair extraction over the flat Arrow
    token buffer (one boolean mask drops the document-boundary pairs —
    no per-row Python) + a partial pandas count combiner, then ONE
    sort-based grouped_reduce over the distinct-pair space.  The pair
    vocabulary is corpus-dependent (unbounded for natural text), so no
    hash aggregate; only distinct (pair, count) rows leave each batch."""
    import pandas as pd

    from .groupagg import grouped_reduce

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table({left_col: pa.array([], pa.string()),
                          right_col: pa.array([], pa.string()),
                          "_n": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        _, off, flat = _space_tokens(batch[text_col])
        n_flat = len(flat)
        if n_flat < 2:
            return empty
        keep = np.ones(n_flat - 1, dtype=bool)
        last = off[1:] - 1                       # each doc's last token
        # a zero-token doc at batch start yields last == -1, which must
        # not wrap around and mask the batch's final pair
        keep[last[(last >= 0) & (last < n_flat - 1)]] = False
        idx = np.flatnonzero(keep)
        if len(idx) == 0:
            return empty
        left = flat.take(pa.array(idx, type=pa.int64()))
        right = flat.take(pa.array(idx + 1, type=pa.int64()))
        pdf = pd.DataFrame({left_col: left.to_pandas(),
                            right_col: right.to_pandas()})
        g = (pdf.groupby([left_col, right_col], sort=False)
                .size().rename("_n").reset_index())
        g["_n"] = g["_n"].astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_reduce(parts, [left_col, right_col], {"_n": out_col},
                          how="sum")


def chunk_documents(ds, text_col: str = "text", id_col: str = "doc_id",
                    size: int = 200, overlap: int = 40):
    """Sliding-window document chunking — the RAG/context-window prep op:
    each doc becomes ceil((len-size)/stride)+1 chunks (1 if len<=size) at
    codepoint starts 0, stride, 2*stride, ... with stride = size-overlap;
    the last chunk is the (possibly short) tail.  Output rows
    (id, chunk_id, start, chunk_text); chunk boundaries are codepoint
    indices in BOTH engines (utf8_slice_codeunits slices codepoints, as
    does SQL substr), proven by a non-ASCII parity test.

    Vectorized per chunk INDEX, not per row: chunk i is ONE
    utf8_slice_codeunits call over every doc long enough to own it, so
    per-batch work is O(max_chunks) Arrow kernel calls.  Pure flat-map —
    no shuffle, no state."""
    if overlap >= size:
        raise ValueError("overlap must be < size")
    stride = size - overlap

    def explode(t: pa.Table) -> pa.Table:
        ids, starts, chunks, texts = [], [], [], []
        text = _str_array(t, text_col)
        n = pc.utf8_length(text).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        n_chunks = np.where(n <= size, 1,
                            -((n - size) // -stride) + 1)
        doc_ids = t[id_col]
        i = 0
        while True:
            mask = n_chunks > i
            if not mask.any():
                break
            keep = pa.array(mask)
            sub = text.filter(keep)
            start = i * stride
            ids.append(doc_ids.filter(keep))
            texts.append(pc.utf8_slice_codeunits(sub, start=start,
                                                 stop=start + size))
            k = int(mask.sum())
            starts.append(np.full(k, start, np.int64))
            chunks.append(np.full(k, i, np.int64))
            i += 1
        if not ids:
            return pa.table({
                id_col: pa.array([], t.schema.field(id_col).type),
                "chunk_id": pa.array([], pa.int64()),
                "start": pa.array([], pa.int64()),
                "chunk_text": pa.array([], pa.string())})
        return pa.table({
            id_col: pa.concat_arrays([a.combine_chunks()
                                      if isinstance(a, pa.ChunkedArray)
                                      else a for a in ids]),
            "chunk_id": pa.array(np.concatenate(chunks)),
            "start": pa.array(np.concatenate(starts)),
            "chunk_text": pa.concat_arrays(
                [c.combine_chunks() if isinstance(c, pa.ChunkedArray)
                 else c for c in texts])})

    return ds.map_batches(explode, batch_format="pyarrow")


def extract_pattern_stats(ds, patterns: dict, text_col: str = "text",
                          id_col: str = "doc_id",
                          first_of: str | None = None):
    """Per-document regex match statistics — the extraction half of the
    text-analysis surface (PII scans, feature mining, filter audits).
    ``patterns`` maps output column -> RE2 pattern; each column is the
    count of NON-OVERLAPPING leftmost matches in the document
    (pyarrow.compute.count_substring_regex — RE2, the same engine and
    semantics as DuckDB's regexp_extract_all, so the SQL twin is
    bit-exact).  ``first_of`` optionally adds a ``first_match`` column:
    the first match of that pattern, '' when absent (DuckDB
    regexp_extract parity — Arrow's null-on-no-match is filled).

    A pure vectorized map — no shuffle, no per-row Python; compiled RE2
    state lives inside the Arrow kernel."""
    def stats(t: pa.Table) -> pa.Table:
        cols = {id_col: t[id_col]}
        arr = _str_array(t, text_col)
        for out_col, pat in patterns.items():
            cols[out_col] = pc.cast(
                pc.count_substring_regex(arr, pat), pa.int64())
        if first_of is not None:
            m = pc.extract_regex(arr, f"(?P<m>{first_of})")
            cols["first_match"] = pc.fill_null(
                pc.struct_field(m, "m"), "")
        return pa.table(cols)

    return ds.map_batches(stats, batch_format="pyarrow")


def bm25_topk(ds, terms: list, text_col: str = "text",
              id_col: str = "doc_id", k: int = 10,
              k1: float = 1.2, b: float = 0.75, scale: int = 10000):
    """Top-k documents by BM25 relevance for a fixed query-term list
    (Robertson/Lucene variant: idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
    tf saturation k1, length normalization b) — the ranked-retrieval
    counterpart of ``tfidf_topk``.

    Scale shape: pass 1 is a pure map emitting ONE row per batch
    (n_docs, sum_dl, per-query-term df partials — all integers, so the
    driver-side sums are exact at any parallelism); pass 2 broadcasts
    the m-term idf vector and scores each batch with a (docs x m)
    bincount matrix + one vectorized expression, keeping only a
    per-batch top-k partial — text never shuffles and only <= k rows
    per block reach the final answer-sized sort.  Scores are emitted
    integer-scaled with the expression tree mirrored in the SQL oracle
    so the comparison is bit-exact."""
    import pandas as pd
    import ray.data

    m = len(terms)
    terms_pa = pa.array(list(terms), pa.string())

    def stats_partial(t: pa.Table) -> pa.Table:
        _, off, flat = _space_tokens(t[text_col])
        dl = np.diff(off)
        doc_of = np.repeat(np.arange(t.num_rows, dtype=np.int64), dl)
        ti = pc.fill_null(pc.index_in(flat, value_set=terms_pa), -1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {"n_docs": pa.array([t.num_rows], pa.int64()),
                "sum_dl": pa.array([int(dl.sum())], pa.int64())}
        for j in range(m):
            cols[f"df_{j}"] = pa.array(
                [int(len(np.unique(doc_of[ti == j])))], pa.int64())
        return pa.table(cols)

    p = ds.map_batches(stats_partial, batch_format="pyarrow").to_pandas()
    n_docs = int(p["n_docs"].sum())
    sum_dl = int(p["sum_dl"].sum())
    df = np.array([int(p[f"df_{j}"].sum()) for j in range(m)], np.int64)
    idf = np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))

    def score(t: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], t.schema.field(id_col).type),
                          "score_e4": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        _, off, flat = _space_tokens(t[text_col])
        dl = np.diff(off).astype(np.int64)
        doc_of = np.repeat(np.arange(t.num_rows, dtype=np.int64), dl)
        ti = pc.fill_null(pc.index_in(flat, value_set=terms_pa), -1) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
        hit = ti >= 0
        tfm = np.zeros((t.num_rows, m), np.float64)
        np.add.at(tfm, (doc_of[hit], ti[hit]), 1.0)
        # per-doc length norm mirrors SQL `dl * n / CAST(sumdl AS DOUBLE)`
        denom = k1 * ((1.0 - b) + b * (dl * n_docs).astype(np.float64)
                      / float(sum_dl))
        s = ((tfm * (k1 + 1.0)) / (tfm + denom[:, None]) * idf[None, :]) \
            .sum(axis=1)
        keep = tfm.sum(axis=1) > 0
        if not keep.any():
            return empty
        ids = t[id_col].to_numpy(zero_copy_only=False)[keep]
        sc = np.round(s[keep] * scale).astype(np.int64)
        order = np.lexsort((ids, -sc))[:k]
        return pa.table({id_col: pa.array(ids[order]),
                         "score_e4": pa.array(sc[order])})

    return (ds.map_batches(score, batch_format="pyarrow")
              .sort(["score_e4", id_col], descending=[True, False])
              .limit(k))
