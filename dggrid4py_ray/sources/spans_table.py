"""Deterministic synthetic interleaved text+media documents table.

The driver's input_hint shape (BASELINE.json): rows of
(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>) where
kind='geo' spans carry "lon lat" in `text`.  Synthesized deterministically
(integer hashing, no RNG state) so any scale factor reproduces bit-identical
data on every node — the basis for resumable, verifiable runs.

Skew: ~half the geo spans concentrate on a Zipf-weighted set of "hot"
locations (the coastline/urban analog in the north star) to exercise the
combiner/salting path of the binning shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

KINDS = np.array(["text", "geo", "image", "audio"], dtype=object)

# 24 deterministic hot centers (Zipf weights) — rough major-city lon/lats
_HOT = np.array([
    (-74.0, 40.7), (139.7, 35.7), (116.4, 39.9), (2.35, 48.85), (-0.13, 51.5),
    (72.9, 19.1), (121.5, 31.2), (-43.2, -22.9), (151.2, -33.9), (37.6, 55.75),
    (-118.2, 34.05), (103.8, 1.35), (28.98, 41.01), (77.2, 28.6), (126.98, 37.57),
    (-99.1, 19.4), (31.2, 30.05), (-58.4, -34.6), (13.4, 52.52), (100.5, 13.75),
    (-87.6, 41.88), (18.42, -33.92), (55.27, 25.2), (-122.4, 37.77),
])
_HOT_W = 1.0 / np.arange(1, len(_HOT) + 1) ** 1.2
_HOT_W = _HOT_W / _HOT_W.sum()
_HOT_CDF = np.cumsum(_HOT_W)

_WORDS = np.array("the of and a to in is was he for it with as his on be at by i this had not are but from or have an they which one you were her all she there would their we him been has when who will more no if out so said what up its about into than them can only other new some could time these two may then do first any my now such like our over man me even most made after also did many".split(), dtype=object)


def _mix(*cols) -> np.ndarray:
    """SplitMix64-style integer hash of several uint64 columns."""
    h = np.zeros_like(np.asarray(cols[0], dtype=np.uint64))
    for c in cols:
        h = h ^ (np.asarray(c, dtype=np.uint64) + np.uint64(0x9E3779B97F4A7C15)
                 + (h << np.uint64(6)) + (h >> np.uint64(2)))
        z = h
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h = z ^ (z >> np.uint64(31))
    return h


def _u01(h: np.ndarray) -> np.ndarray:
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def spans_batch(start: int, count: int, seed: int = 42,
                max_spans: int = 6, hot_frac: float = 0.5) -> pa.Table:
    """Rows [start, start+count) of the deterministic spans table."""
    doc_idx = np.arange(start, start + count, dtype=np.uint64)
    n_spans = 1 + (_mix(doc_idx, np.uint64(seed), np.uint64(1)) % np.uint64(max_spans)).astype(np.int64)
    total = int(n_spans.sum())
    offsets = np.zeros(count + 1, dtype=np.int32)
    np.cumsum(n_spans, out=offsets[1:])
    # flat span index space
    d_of = np.repeat(doc_idx, n_spans)
    j_of = (np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], n_spans)).astype(np.uint64)
    hk = _mix(d_of, j_of, np.uint64(seed), np.uint64(2))
    kind_idx = (hk % np.uint64(4)).astype(np.int64)
    # guarantee at least one geo span per doc: first span of every doc is geo
    kind_idx[offsets[:-1]] = 1
    kinds = KINDS[kind_idx]
    # geo coordinates
    hgeo = _mix(d_of, j_of, np.uint64(seed), np.uint64(3))
    u = _u01(hgeo)
    hot = u < hot_frac
    hsel = np.searchsorted(_HOT_CDF, _u01(_mix(hgeo, np.uint64(5))))
    hsel = np.minimum(hsel, len(_HOT) - 1)
    jit1 = (_u01(_mix(hgeo, np.uint64(6))) - 0.5) * 0.4
    jit2 = (_u01(_mix(hgeo, np.uint64(7))) - 0.5) * 0.4
    lon_hot = _HOT[hsel, 0] + jit1
    lat_hot = _HOT[hsel, 1] + jit2
    lon_cold = _u01(_mix(hgeo, np.uint64(8))) * 360.0 - 180.0
    lat_cold = np.degrees(np.arcsin(2.0 * _u01(_mix(hgeo, np.uint64(9))) - 1.0))
    lon = np.where(hot, lon_hot, lon_cold)
    lat = np.where(hot, lat_hot, np.clip(lat_cold, -89.9, 89.9))
    lon = np.clip(lon, -179.999, 179.999)
    lat = np.clip(lat, -89.9, 89.9)
    is_geo = kind_idx == 1
    # texts
    w1 = _WORDS[(_mix(hk, np.uint64(11)) % np.uint64(len(_WORDS))).astype(np.int64)]
    w2 = _WORDS[(_mix(hk, np.uint64(12)) % np.uint64(len(_WORDS))).astype(np.int64)]
    w3 = _WORDS[(_mix(hk, np.uint64(13)) % np.uint64(len(_WORDS))).astype(np.int64)]
    geo_txt = np.char.add(np.char.add(np.char.mod("%.6f", lon), " "),
                          np.char.mod("%.6f", lat))
    word_txt = np.char.add(np.char.add(np.char.add(np.char.add(
        w1.astype("U16"), " "), w2.astype("U16")), " "), w3.astype("U16"))
    blob = np.char.add(np.char.add("blob://", kinds.astype("U8")),
                       np.char.add("/", np.char.mod("%012d", (hk % np.uint64(10**12)).astype(np.int64))))
    texts = np.where(is_geo, geo_txt.astype(object),
                     np.where(kind_idx == 0, word_txt.astype(object), ""))
    media = np.where(kind_idx >= 2, blob.astype(object), "")
    span_offset = (j_of * np.uint64(16)).astype(np.int32)
    struct = pa.StructArray.from_arrays(
        [pa.array(kinds, type=pa.string()), pa.array(texts, type=pa.string()),
         pa.array(media, type=pa.string()), pa.array(span_offset, type=pa.int32())],
        names=["kind", "text", "media_ref", "offset"])
    spans = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), struct)
    doc_ids = pa.array([f"doc{int(i):012d}" for i in doc_idx], type=pa.string())
    return pa.table({"doc_id": doc_ids, "spans": spans})


def spans_dataset(n_docs: int, seed: int = 42, batch_rows: int = 8192,
                  override_num_blocks: int | None = None):
    """Lazy Ray Dataset of the deterministic spans table — generated in
    parallel read tasks (range -> map_batches), never materialized on the
    driver."""
    import ray.data

    nblocks = override_num_blocks or max(8, n_docs // batch_rows)
    base = ray.data.range(n_docs, override_num_blocks=nblocks)

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        if len(ids) == 0:
            return spans_batch(0, 0, seed)
        # ids within a block are contiguous ranges
        return spans_batch(int(ids[0]), len(ids), seed)

    return base.map_batches(gen, batch_format="pyarrow")
