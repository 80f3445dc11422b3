"""Benchmark contamination detection (training-data decontamination).

The canonical pretraining hygiene step: flag corpus documents that share
token n-grams with an evaluation benchmark, so eval examples can be
removed from the training set.  (Beyond the reference — the reference
engine has no text surface; part of the training-data brief.)

Scale shape (100 TB):
- The benchmark side is SMALL by definition (eval suites are 10^3-10^7
  grams).  Its distinct gram-hash set is built distributively (per-batch
  unique partials), collected once on the driver, sorted, and broadcast
  via ``ray.put`` — every corpus task reads the same object-store copy.
- The corpus side is a pure ``map_batches`` membership scan
  (``np.searchsorted`` against the sorted broadcast array): zero
  shuffle, zero corpus materialization; throughput is the tokenizer.

Tokenization is ``split on a single space`` — exactly DuckDB's
``string_split(text, ' ')`` (empty tokens from doubled spaces preserved)
so the driver oracle can recompute gram sets verbatim.  Gram identity is
a 64-bit rolling hash over per-token ``hashing.hash64`` values; a
cross-gram collision (p ~ n_grams^2 / 2^64) would count a false hit —
negligible against real corpora and absent at gate scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


# token/gram primitives live in stages/text (general text
# machinery); re-exported here for back-compat of existing imports
from .text import _GRAM_MULT, _gram_hashes, _space_tokens  # noqa: F401,E402


def benchmark_gram_set(bench_ds: ray.data.Dataset, n: int = 3,
                       text_col: str = "text") -> np.ndarray:
    """Distinct n-gram hashes of the benchmark set: per-batch unique
    partials -> driver union (benchmark-sized, small by definition) ->
    sorted uint64 array ready to broadcast."""
    def partial(batch: pa.Table) -> pa.Table:
        th, off, _ = _space_tokens(batch[text_col])
        g, _, _ = _gram_hashes(th, off, n)
        return pa.table({"gram": pa.array(np.unique(g))})

    parts = bench_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    return np.unique(parts["gram"].to_numpy().astype(np.uint64))


class ContaminationChecker:
    """Actor-pool stage: benchmark gram set fetched from the object store
    ONCE per actor in __init__; per batch one searchsorted membership scan
    + one segment-sum."""

    def __init__(self, bench_ref, n: int, text_col: str, id_col: str):
        self.bench = np.asarray(ray.get(bench_ref), dtype=np.uint64)
        self.n = n
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        th, off, _ = _space_tokens(batch[self.text_col])
        g, di, per_doc = _gram_hashes(th, off, self.n)
        hit = np.zeros(len(g), dtype=np.int64)
        if len(g) and len(self.bench):
            pos = np.searchsorted(self.bench, g)
            pos[pos == len(self.bench)] = len(self.bench) - 1
            hit = (self.bench[pos] == g).astype(np.int64)
        hits_per_doc = np.bincount(di, weights=hit,
                                   minlength=len(per_doc)).astype(np.int64)
        ids = batch[self.id_col]
        keep = per_doc > 0          # docs with <n tokens have no grams
        return pa.table({
            self.id_col: ids.filter(pa.array(keep)) if not keep.all()
            else ids,
            "n_grams": pa.array(per_doc[keep]),
            "n_hits": pa.array(hits_per_doc[keep]),
        })


def contamination_check(ds: ray.data.Dataset, bench_grams: np.ndarray,
                        n: int = 3, text_col: str = "text",
                        id_col: str = "doc_id",
                        concurrency=None) -> ray.data.Dataset:
    """Per-document benchmark-overlap counts: (id, n_grams, n_hits).
    Documents shorter than ``n`` tokens emit no row (no grams — matches
    the SQL oracle's semantics).  Pure map over the corpus."""
    ref = ray.put(np.asarray(bench_grams, dtype=np.uint64))
    return ds.map_batches(ContaminationChecker,
                          fn_constructor_args=(ref, n, text_col, id_col),
                          batch_format="pyarrow",
                          concurrency=concurrency or (1, 32))
