"""Deduplication operators for large-scale training-data pipelines.

All expressed Ray-Data-first:

* exact_dedup           — md5(key) hash-partition + per-group min(doc_id)
* minhash_lsh_dedup     — shingle -> minhash -> band-bucket groupby -> union
* simhash               — 64-bit simhash column + bucket candidate pairs
* ngram_jaccard_pairs   — exact Jaccard verification for candidate pairs
* embedding_dedup       — cosine near-dup over an embedding column

Shuffle discipline: every groupby is preceded by a within-batch projection to
the minimal columns (hashes + ids), never the raw text/media payload.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Min


def _join_partitions(cap: int = 16) -> int:
    """Hash-join partition count sized to the cluster: the join operator
    runs one aggregator actor per partition, so oversizing deadlocks small
    CPU budgets."""
    try:
        import ray
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, min(cap, cpus // 2))


def _md5_int64(texts: np.ndarray) -> np.ndarray:
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        out[i] = int.from_bytes(hashlib.md5(str(t).encode()).digest()[:8], "big", signed=True)
    return out


def _md5_hex(texts: np.ndarray) -> np.ndarray:
    return np.array([hashlib.md5(str(t).encode()).hexdigest() for t in texts], dtype=object)


def exact_dedup(ds: ray.data.Dataset, text_col: str = "text",
                id_col: str = "doc_id") -> ray.data.Dataset:
    """Keep the smallest id per exact text; returns (hash, keeper id).

    Ray shape: project to (md5, id) in map_batches -> groupby(md5).min(id):
    hash-partitioned exact dedup (SURVEY §2.8 set-ops row)."""

    def project(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_numpy(zero_copy_only=False)
        return pa.table({"text_md5": pa.array(_md5_hex(texts), type=pa.string()),
                         id_col: batch[id_col]})

    return (ds.map_batches(project, batch_format="pyarrow")
              .groupby("text_md5").aggregate(Min(id_col, alias_name="keep_id")))


# -- MinHash + LSH ----------------------------------------------------------

_MERSENNE = (1 << 61) - 1


class MinHasher:
    """map_batches actor: k-shingle minhash signature per document."""

    def __init__(self, text_col: str = "text", num_perm: int = 64,
                 shingle: int = 4, seed: int = 1):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
        self.text_col = text_col
        self.num_perm = num_perm
        self.shingle = shingle

    def signature(self, text: str) -> np.ndarray:
        sigs = self.signatures(np.array([text], dtype=object))
        return sigs[0]

    def signatures(self, texts: np.ndarray) -> np.ndarray:
        """Batched signatures: all documents' shingle hashes in one flat
        array, per-doc mins via np.minimum.reduceat (no per-doc Python)."""
        k = self.shingle
        bufs = [str(t).encode("utf-8", "ignore") for t in texts]
        counts = np.array([max(len(b) - k + 1, 1) for b in bufs], dtype=np.int64)
        flat = np.zeros(int(counts.sum()), dtype=np.uint64)
        off = 0
        pw = (np.uint64(257) ** np.arange(k, dtype=np.uint64))
        for b, c in zip(bufs, counts):
            if len(b) < k:
                flat[off] = np.uint64(int.from_bytes(hashlib.md5(b).digest()[:8], "big"))
            else:
                arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
                win = np.lib.stride_tricks.sliding_window_view(arr, k)
                flat[off:off + c] = (win * pw[None, :]).sum(axis=1)
            off += c
        starts = np.zeros(len(texts), dtype=np.int64)
        np.cumsum(counts[:-1], out=starts[1:])
        sigs = np.empty((len(texts), self.num_perm), dtype=np.uint64)
        for p in range(self.num_perm):
            h = (self.a[p] * flat + self.b[p]) % np.uint64(_MERSENNE)
            sigs[:, p] = np.minimum.reduceat(h, starts)
        return sigs

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_numpy(zero_copy_only=False)
        sigs = self.signatures(texts)
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(sigs.reshape(-1).view(np.int64)), self.num_perm)
        return batch.append_column("minhash", col)


def minhash_lsh_dedup(ds: ray.data.Dataset, text_col: str = "text",
                      id_col: str = "doc_id", num_perm: int = 64, bands: int = 16,
                      threshold: float = 0.7,
                      concurrency: int | None = None) -> ray.data.Dataset:
    """Near-dup detection: minhash signatures -> LSH band buckets (groupby) ->
    exact signature-similarity check inside each bucket -> candidate pairs
    with estimated Jaccard >= threshold.

    Returns Dataset[(left_id, right_id, est_jaccard)] with left < right.
    Shuffle key = (band, bucket_hash); the heavy text column never shuffles."""
    rows_per_band = num_perm // bands
    sigged = ds.map_batches(MinHasher(text_col, num_perm), batch_format="pyarrow",
                            concurrency=concurrency)

    def emit_buckets(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        arr = batch["minhash"]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        sigs = np.asarray(arr.flatten()).reshape(n, num_perm).view(np.uint64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_band = np.repeat(np.arange(bands, dtype=np.int64), n)
        out_id = np.tile(ids, bands)
        bh = np.empty(bands * n, dtype=np.int64)
        sig_str = np.empty(bands * n, dtype=object)
        for bidx in range(bands):
            seg = sigs[:, bidx * rows_per_band:(bidx + 1) * rows_per_band]
            h = np.zeros(n, dtype=np.uint64)
            for c in range(rows_per_band):
                h = h * np.uint64(1099511628211) + seg[:, c]
            bh[bidx * n:(bidx + 1) * n] = h.view(np.int64)
            for i in range(n):
                sig_str[bidx * n + i] = sigs[i].tobytes()
        return pa.table({"band": pa.array(out_band), "bucket": pa.array(bh),
                         id_col: pa.array(out_id), "sig": pa.array(sig_str, type=pa.binary())})

    buckets = sigged.map_batches(emit_buckets, batch_format="pyarrow")
    # hot-bucket cap (explicit LSH skew handling): buckets larger than
    # `max_bucket` are low-information band collisions whose self-join would
    # explode quadratically — drop them (standard LSH practice); the
    # remaining bands still catch true near-dups
    max_bucket = 64
    from ray.data.aggregate import Count
    sizes = buckets.groupby(["band", "bucket"]).aggregate(Count(alias_name="bsz"))
    small = sizes.map_batches(
        lambda t: t.filter(pa.compute.less_equal(t["bsz"], pa.scalar(max_bucket))),
        batch_format="pyarrow")
    buckets = buckets.join(small, join_type="inner", num_partitions=_join_partitions(),
                           on=("band", "bucket"))
    # bucket self-join (hash-partitioned on (band, bucket)) instead of
    # per-group map_groups: almost all buckets are singletons, and the join
    # avoids the per-group task overhead entirely
    right = buckets.map_batches(
        lambda t: pa.table({"band": t["band"], "bucket": t["bucket"],
                            "rid": t[id_col], "rsig": t["sig"]}),
        batch_format="pyarrow")
    joined = buckets.join(right, join_type="inner", num_partitions=_join_partitions(),
                          on=("band", "bucket"))

    def score(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"left_id": pa.array([], type=pa.int64()),
                             "right_id": pa.array([], type=pa.int64()),
                             "est_jaccard": pa.array([], type=pa.float64())})
        lid = t[id_col].to_numpy(zero_copy_only=False)
        rid = t["rid"].to_numpy(zero_copy_only=False)
        keep = lid < rid
        if not keep.any():
            return pa.table({"left_id": pa.array([], type=pa.int64()),
                             "right_id": pa.array([], type=pa.int64()),
                             "est_jaccard": pa.array([], type=pa.float64())})
        ls = t["sig"].to_numpy(zero_copy_only=False)[keep]
        rs = t["rsig"].to_numpy(zero_copy_only=False)[keep]
        lsig = np.stack([np.frombuffer(s, dtype=np.uint64) for s in ls])
        rsig = np.stack([np.frombuffer(s, dtype=np.uint64) for s in rs])
        eq = (lsig == rsig).mean(axis=1)
        hit = eq >= threshold
        return pa.table({"left_id": pa.array(lid[keep][hit]),
                         "right_id": pa.array(rid[keep][hit]),
                         "est_jaccard": pa.array(eq[hit].astype(np.float64))})

    cand = joined.map_batches(score, batch_format="pyarrow")
    # dedup pairs discovered in multiple bands
    return cand.groupby(["left_id", "right_id"]).aggregate(Min("est_jaccard", alias_name="est_jaccard"))


# -- SimHash ----------------------------------------------------------------

class SimHasher:
    """map_batches actor: 64-bit simhash over word 3-grams."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    @staticmethod
    def _h64(s: str) -> int:
        return int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")

    def simhash(self, text: str) -> int:
        words = text.split()
        if not words:
            return 0
        grams = [" ".join(words[i:i + 3]) for i in range(max(1, len(words) - 2))]
        acc = np.zeros(64, dtype=np.int64)
        for gtext in grams:
            h = self._h64(gtext)
            bits = (h >> np.arange(64, dtype=np.uint64)) & 1
            acc += np.where(bits.astype(bool), 1, -1)
        out = 0
        for bit in np.nonzero(acc > 0)[0]:
            out |= 1 << int(bit)
        return out - (1 << 64) if out >= (1 << 63) else out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_numpy(zero_copy_only=False)
        out = np.array([self.simhash(str(t)) for t in texts], dtype=np.int64)
        return batch.append_column("simhash", pa.array(out))


def simhash_dedup(ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id",
                  max_hamming: int = 3, concurrency: int | None = None) -> ray.data.Dataset:
    """Near-dup pairs by simhash: 4 x 16-bit band buckets (any pair within
    hamming distance 3 shares at least one exact band), exact hamming check
    per bucket."""
    hashed = ds.map_batches(SimHasher(text_col), batch_format="pyarrow",
                            concurrency=concurrency)

    def emit(batch: pa.Table) -> pa.Table:
        h = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n = len(h)
        band = np.repeat(np.arange(4, dtype=np.int64), n)
        key = np.concatenate([((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
                              for b in range(4)])
        return pa.table({"band": pa.array(band), "bucket": pa.array(key),
                         id_col: pa.array(np.tile(ids, 4)),
                         "simhash": pa.array(np.tile(h.view(np.int64), 4))})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"left_id": [], "right_id": [], "hamming": []})
        g = g.sort_values(id_col).drop_duplicates(id_col)
        ids = g[id_col].to_numpy()
        h = g["simhash"].to_numpy().view(np.uint64)
        L, R, D = [], [], []
        for i in range(len(g)):
            x = h[i + 1:] ^ h[i]
            dist = np.zeros(len(x), dtype=np.int64)
            v = x.copy()
            for _ in range(64):
                dist += (v & np.uint64(1)).astype(np.int64)
                v >>= np.uint64(1)
            hit = np.nonzero(dist <= max_hamming)[0]
            for k in hit:
                L.append(ids[i]); R.append(ids[i + 1 + k]); D.append(int(dist[k]))
        return pd.DataFrame({"left_id": L, "right_id": R, "hamming": D})

    cand = hashed.map_batches(emit, batch_format="pyarrow") \
        .groupby(["band", "bucket"]).map_groups(pairs, batch_format="pandas")
    return cand.groupby(["left_id", "right_id"]).aggregate(Min("hamming", alias_name="hamming"))


def embedding_dedup(ds: ray.data.Dataset, emb_col: str = "embedding",
                    id_col: str = "vec_id", threshold: float = 0.95,
                    nbits: int = 12, seed: int = 7) -> ray.data.Dataset:
    """Embedding cosine near-dup: random-hyperplane LSH bucket (nbits) ->
    exact cosine inside buckets -> pairs with cos >= threshold.

    Scale path: bucket count 2^nbits bounds group sizes; the groupby key is
    the bucket hash, embeddings shuffle once."""
    state = {}

    def emit(batch: pa.Table) -> pa.Table:
        arr = batch[emb_col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        flat = np.asarray(arr.flatten(), dtype=np.float64)
        dim = len(flat) // max(batch.num_rows, 1)
        emb = flat.reshape(batch.num_rows, dim)
        if "planes" not in state:
            rng = np.random.default_rng(seed)
            state["planes"] = rng.standard_normal((dim, nbits))
        proj = emb @ state["planes"]
        bits = (proj > 0).astype(np.uint64)
        bucket = np.zeros(batch.num_rows, dtype=np.uint64)
        for b in range(nbits):
            bucket |= bits[:, b] << np.uint64(b)
        norm = np.linalg.norm(emb, axis=1, keepdims=True)
        emb_n = emb / np.where(norm == 0, 1.0, norm)
        sig = [e.astype(np.float32).tobytes() for e in emb_n]
        return pa.table({"bucket": pa.array(bucket.view(np.int64)),
                         id_col: batch[id_col],
                         "emb_n": pa.array(sig, type=pa.binary())})

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"left_id": [], "right_id": [], "cosine": []})
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        emb = np.stack([np.frombuffer(b, dtype=np.float32) for b in g["emb_n"]])
        sims = emb @ emb.T
        iu, ju = np.triu_indices(len(g), 1)
        hit = sims[iu, ju] >= threshold
        return pd.DataFrame({"left_id": ids[iu[hit]], "right_id": ids[ju[hit]],
                             "cosine": sims[iu[hit], ju[hit]].astype(np.float64)})

    return ds.map_batches(emit, batch_format="pyarrow") \
        .groupby("bucket").map_groups(pairs, batch_format="pandas")
