"""Vectorized 64/128-bit string hashing for the scale path of
exact_dedup / hash_sample (VERDICT r3 #6).

The md5 default in those operators is per-row ``hashlib`` (~1.5 us/row —
bit-identical to the DuckDB oracle, which is why it stays the default), so
at 10^12 docs the hash itself dominates the pipeline.  This module hashes
an entire Arrow string column with no per-row Python at all:

1. the column's flat UTF-8 buffer + offsets come zero-copy from Arrow
   (non-string key columns are cast with the vectorized ``pc.cast``);
2. the per-document hash is a degree-L polynomial over the bytes,
   h = sum b_i * P^(L-1-i) mod 2^64 — NOT byte-sequential like FNV/md5, so
   it vectorizes as ONE segmented weighted sum over the whole flat buffer
   (power-table gather + np.add.reduceat, the MinHasher/SimHasher trick);
3. a murmur3 fmix64 finalizer spreads low-entropy keys over all 64 bits.

``hash128`` runs two lanes with independent multipliers for a 128-bit key:
at 10^12 documents a single 64-bit key expects ~30 birthday collisions
(n^2 / 2^65) — i.e. ~30 wrongly-merged doc pairs in exact_dedup — while
128 bits expects ~1e-14.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# odd multipliers (distinct splitmix64 increments); any odd constant gives a
# bijection per Horner step mod 2^64
_P1 = np.uint64(0x9E3779B97F4A7C15)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_NULL_SENTINEL = np.uint64(0xD6E8FEB86659FD93)


def _flat_utf8(arr) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """(flat uint8 byte buffer, per-row byte lengths, null mask or None)
    for an Arrow string column — zero-copy from the Arrow buffers
    (offset-slice aware).  Non-string columns are cast via the vectorized
    Arrow cast (int64 123 -> b"123", matching str())."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if not pa.types.is_string(arr.type) and not pa.types.is_large_string(arr.type):
        arr = pc.cast(arr, pa.string())
    nulls = (pc.is_null(arr).to_numpy(zero_copy_only=False)
             if arr.null_count else None)
    odt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], dtype=odt)[arr.offset:arr.offset + len(arr) + 1]
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None \
        else np.zeros(0, dtype=np.uint8)
    flat = data[int(off[0]):int(off[-1])]
    lens = np.diff(off.astype(np.int64))
    return flat, lens, nulls


def _finalize(h: np.ndarray) -> np.ndarray:
    """murmur3 fmix64 avalanche."""
    with np.errstate(over="ignore"):
        h = h.copy()
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xC4CEB9FE1A85EC53)
        h ^= h >> np.uint64(33)
    return h


def _poly_hash(flat: np.ndarray, lens: np.ndarray, P: np.uint64) -> np.ndarray:
    """h_d = len_d * P^len_d + sum_i byte_i * P^(len_d-1-i) (mod 2^64), as
    one weighted segmented sum: power table by cumprod, exponent per byte by
    repeat arithmetic, per-doc totals by np.add.reduceat.  The length term
    separates prefixes of zero bytes from the empty string."""
    n = len(lens)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    total = int(lens.sum())
    maxlen = int(lens.max()) if n else 0
    with np.errstate(over="ignore"):
        pw = np.empty(maxlen + 1, dtype=np.uint64)
        pw[0] = 1
        if maxlen:
            np.cumprod(np.full(maxlen, P, dtype=np.uint64), out=pw[1:])
        out = lens.astype(np.uint64) * pw[lens]
        if total:
            starts = np.zeros(n, dtype=np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            pos = np.arange(total, dtype=np.int64)
            exp = np.repeat(lens - 1, lens) - (pos - np.repeat(starts, lens))
            terms = flat.astype(np.uint64) * pw[exp]
            nz = lens > 0
            seg = np.add.reduceat(terms, starts[nz])
            out[nz] += seg
    return out


def hash64(arr, seed: int = 0) -> np.ndarray:
    """uint64 hash per row of an Arrow (chunked) array — vectorized
    polynomial hash over the UTF-8 bytes + murmur fmix64 finalizer.
    ``seed`` xors into the pre-finalizer state (seed=0 is the default
    lane).  Deterministic across runs, partitioning and cluster size.
    NULL rows hash to a dedicated sentinel lane (a null is NOT the empty
    string and NOT the string 'None' — unlike the md5 path's str())."""
    flat, lens, nulls = _flat_utf8(arr)
    h = _poly_hash(flat, lens, _P1)
    if nulls is not None:
        h[nulls] ^= _NULL_SENTINEL
    return _finalize(h ^ np.uint64(seed))


def hash128(arr) -> tuple[np.ndarray, np.ndarray]:
    """Two independent uint64 lanes (distinct multipliers) — a 128-bit key
    for collision-safe exact dedup at trillion-doc scale.  NULL rows get
    the sentinel lane (distinct from the empty string) in both lanes."""
    flat, lens, nulls = _flat_utf8(arr)
    h1 = _poly_hash(flat, lens, _P1)
    h2 = _poly_hash(flat, lens, _P2)
    if nulls is not None:
        h1[nulls] ^= _NULL_SENTINEL
        h2[nulls] ^= _NULL_SENTINEL
    return _finalize(h1), _finalize(h2)
