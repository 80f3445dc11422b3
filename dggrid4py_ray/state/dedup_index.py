"""Shared mutable dedup index — the one stage shape that genuinely needs
raw Ray actors (SURVEY §4 rule: drop below the Dataset API only where it
can't express the semantics, e.g. a shared mutable index).

A pool of shard actors each owns a disjoint slice of the 64-bit key-hash
space and answers "which of these keys are new?" ATOMICALLY (actor method
calls serialize per shard); a ``map_batches`` stage routes each batch's
key hashes to their shards and keeps only first-seen rows.  Unlike the
batch ``exact_dedup`` (sort + first-per-group, needs the whole input),
this admits rows ONLINE with no global barrier — the shape for continuous
ingest, and the index outlives any one Dataset (a second stream run
through the same index drops everything already admitted).

Determinism contract: the SET of admitted keys is always exactly the
distinct key set (each key accepted exactly once, by exactly one shard);
WHICH duplicate row wins depends on arrival order — key the downstream on
the admitted key, not the row, where that matters.

Scale: memory is the distinct-key set spread over ``n_shards`` actors
(8 bytes + set overhead per key; shard count sizes the cluster memory
budget and the admission throughput).  Each batch does one round trip per
touched shard — batches should be large (>=8k rows) so the actor-call
latency amortizes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray


@ray.remote
class _DedupShard:
    """Owns one slice of the hash space; check_and_add is atomic."""

    def __init__(self):
        self._seen: set[int] = set()

    def check_and_add(self, hashes: np.ndarray) -> np.ndarray:
        seen = self._seen
        out = np.zeros(len(hashes), dtype=bool)
        for i, h in enumerate(hashes.tolist()):
            if h not in seen:
                seen.add(h)
                out[i] = True
        return out

    def size(self) -> int:
        return len(self._seen)


class DedupIndex:
    """Handle bundle for a sharded seen-set; picklable (actor handles
    serialize), so one index threads through many map_batches stages and
    many Datasets."""

    def __init__(self, n_shards: int = 8):
        self.shards = [_DedupShard.remote() for _ in range(n_shards)]

    def size(self) -> int:
        return int(sum(ray.get([s.size.remote() for s in self.shards])))


class StreamingDedupFilter:
    """map_batches callable: keep only rows whose key the shared index has
    not seen.  Within a batch, a key duplicated multiple times keeps only
    its first row (the shard sees the batch's occurrences in order)."""

    def __init__(self, index: DedupIndex, key_col: str):
        self.shards = index.shards
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        from ..stages.sampling import _md5_u64
        keys = batch[self.key_col].to_numpy(zero_copy_only=False)
        h = _md5_u64(keys).view(np.int64)
        n_sh = len(self.shards)
        shard_of = (h.view(np.uint64) % np.uint64(n_sh)).astype(np.int64)
        keep = np.zeros(len(h), dtype=bool)
        pending = []
        for s in range(n_sh):
            m = shard_of == s
            if m.any():
                pending.append(
                    (m, self.shards[s].check_and_add.remote(h[m])))
        for m, fut in pending:
            keep[m] = ray.get(fut)
        return batch.filter(pa.array(keep))


def streaming_dedup(ds, key_col: str, index: DedupIndex | None = None,
                    n_shards: int = 8):
    """Online exact dedup of ``ds`` on ``key_col`` against a shared
    mutable index (created fresh unless one is passed in — pass the same
    index across calls to dedup a sequence of streams against the union
    of everything admitted so far).  Returns (filtered dataset, index)."""
    idx = index or DedupIndex(n_shards)
    # MATERIALIZE: the filter mutates the shared index as a side effect,
    # so it is not idempotent — a lazy result re-executed (second
    # consumption, task retry, lineage reconstruction) would re-probe
    # already-admitted keys and silently drop its own rows.  Pinning the
    # admitted rows makes consumption and retries safe; a mid-run worker
    # loss still re-runs a batch (exactly-once admission holds for the
    # KEY set, the winning row may differ) — checkpoint via
    # state/checkpoint.py for stronger guarantees.
    out = ds.map_batches(StreamingDedupFilter(idx, key_col),
                         batch_format="pyarrow").materialize()
    return out, idx
