"""Text-analysis stages for large-scale training-data pipelines.

Each is a vectorized map_batches stage over the `documents` table
(driver testdata: doc_id, text, lang, source, n_chars).  Stateful pieces
(compiled regexes, stopword sets) live in actor __init__.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that",
           "with", "for", "on", "my", "how", "over", "at", "by", "this", "not"},
    "de": {"der", "die", "das", "und", "ist", "ich", "nicht", "ein", "zu", "mit"},
    "fr": {"le", "la", "les", "et", "est", "je", "ne", "un", "une", "dans"},
    "es": {"el", "la", "los", "y", "es", "no", "un", "una", "en", "que"},
}


class TokenCounter:
    """Whitespace tokens + a BPE-ish regex token count + char count."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        # GPT-2-style pretokenizer shape (public pattern family)
        self.bpe = re.compile(r"\w+|[^\w\s]")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_numpy(zero_copy_only=False)
        ws = np.fromiter((len(t.split()) for t in texts), dtype=np.int64, count=len(texts))
        bpe = np.fromiter((len(self.bpe.findall(t)) for t in texts), dtype=np.int64, count=len(texts))
        chars = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
        return (batch.append_column("n_tokens_ws", pa.array(ws))
                     .append_column("n_tokens_re", pa.array(bpe))
                     .append_column("n_chars_computed", pa.array(chars)))


class QualityScorer:
    """Heuristic quality features: length, punctuation ratio, stopword ratio,
    mean word length, uppercase ratio."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.punct = re.compile(r"[^\w\s]")
        self.word = re.compile(r"[a-zA-Z]+")
        self.stop = set().union(*_STOPWORDS.values())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_numpy(zero_copy_only=False)
        n = len(texts)
        punct_ratio = np.zeros(n)
        stop_ratio = np.zeros(n)
        mean_wlen = np.zeros(n)
        upper_ratio = np.zeros(n)
        for i, t in enumerate(texts):
            L = max(len(t), 1)
            punct_ratio[i] = len(self.punct.findall(t)) / L
            words = self.word.findall(t.lower())
            if words:
                stop_ratio[i] = sum(w in self.stop for w in words) / len(words)
                mean_wlen[i] = sum(len(w) for w in words) / len(words)
            upper_ratio[i] = sum(c.isupper() for c in t) / L
        score = (np.clip(stop_ratio * 3, 0, 1) * 0.4
                 + np.clip(mean_wlen / 8.0, 0, 1) * 0.3
                 + (1.0 - np.clip(punct_ratio * 4, 0, 1)) * 0.2
                 + (1.0 - np.clip(upper_ratio * 5, 0, 1)) * 0.1)
        return (batch.append_column("punct_ratio", pa.array(punct_ratio))
                     .append_column("stopword_ratio", pa.array(stop_ratio))
                     .append_column("quality_score", pa.array(score)))


class LanguageId:
    """Tiny n-gram/stopword language heuristic over {en,de,fr,es} + 'other'."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col = text_col
        self.out_col = out_col
        self.word = re.compile(r"[a-zA-ZÀ-ÿ]+")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_numpy(zero_copy_only=False)
        out = np.empty(len(texts), dtype=object)
        for i, t in enumerate(texts):
            words = set(self.word.findall(t.lower())[:200])
            best, bestn = "other", 0
            for lang, sw in _STOPWORDS.items():
                k = len(words & sw)
                if k > bestn:
                    best, bestn = lang, k
            out[i] = best
        return batch.append_column(self.out_col, pa.array(out, type=pa.string()))


class Fingerprinter:
    """Deterministic 64-bit document fingerprint (FNV-1a over bytes) and a
    rolling-hash shingle min (cheap near-dup signal)."""

    def __init__(self, text_col: str = "text", shingle: int = 8):
        self.text_col = text_col
        self.shingle = shingle

    @staticmethod
    def _fnv1a(data: bytes) -> int:
        h = 0xCBF29CE484222325
        for b in data:
            h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        return h

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_numpy(zero_copy_only=False)
        fp = np.empty(len(texts), dtype=np.uint64)
        rmin = np.empty(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            b = t.encode("utf-8", "ignore")
            fp[i] = self._fnv1a(b)
            k = self.shingle
            if len(b) < k:
                rmin[i] = fp[i]
            else:
                arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
                # polynomial rolling hash of all k-grams, vectorized
                pw = np.power(np.uint64(257), np.arange(k, dtype=np.uint64).astype(object)).astype(np.uint64)
                windows = np.lib.stride_tricks.sliding_window_view(arr, k)
                hashes = (windows * pw[None, :]).sum(axis=1)
                rmin[i] = hashes.min()
        return (batch.append_column("fingerprint", pa.array(fp.view(np.int64)))
                     .append_column("shingle_min", pa.array(rmin.view(np.int64))))
