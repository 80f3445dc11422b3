"""Distributed prefix scan + sequence packing for training-data pipelines.

``prefix_sum`` is the classic two-pass parallel scan expressed in Ray Data:
one range sort on the order key, per-block partial sums (answer-sized: one
row per block), a driver-side exclusive prefix over the ordered block
summaries (blocks tile the sorted order, so ordering them by their first
key is global order), then a broadcast of per-block offsets and a
vectorized local cumsum.  The corpus shuffles exactly once; driver state
is O(#blocks).

``pack_sequences`` uses it for the GPT-style packed-dataset layout: docs
are concatenated in deterministic (order-key) order into fixed
token-budget sequences, documents splitting across sequence boundaries
(standard concat-and-chunk packing).  Every row's (seq_id, seq_offset) is
a pure function of the global token prefix sum — stable under retries,
resume, and any parallelism, and exactly SQL-expressible
(``SUM(tokens) OVER (ORDER BY key ROWS UNBOUNDED PRECEDING)``), unlike
block-local greedy bin packing whose output depends on block boundaries.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def prefix_sum(ds: ray.data.Dataset, order_col: str, value_col: str,
               out_col: str = "prefix") -> ray.data.Dataset:
    """Exclusive prefix sum of ``value_col`` in global ``order_col`` order.
    Requires unique order keys (block identity is keyed on each sorted
    block's first key).  Output: input columns + ``out_col`` (int64),
    globally sorted by ``order_col``."""
    srt = ds.sort(order_col).materialize()

    def block_sum(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:     # skewed range sort can hand a block 0 rows
            first = t[order_col]
            if isinstance(first, pa.ChunkedArray):
                first = first.combine_chunks()
            return pa.table({"_first": first,
                             "_sum": pa.array([], pa.int64())})
        keys = t[order_col].to_numpy(zero_copy_only=False)
        vals = t[value_col].to_numpy(zero_copy_only=False)
        return pa.table({"_first": pa.array(keys[:1]),
                         "_sum": pa.array([int(vals.sum())], pa.int64())})

    summ = srt.map_batches(block_sum, batch_format="pyarrow").take_all()
    summ.sort(key=lambda r: r["_first"])
    offsets = {}
    acc = 0
    for r in summ:
        if r["_first"] in offsets:
            # a key spanning two blocks means duplicate order keys — the
            # offsets would silently mis-assign, so fail loudly instead
            raise ValueError(
                f"prefix_sum requires unique {order_col!r} values "
                f"(duplicate {r['_first']!r} spans a block boundary)")
        offsets[r["_first"]] = acc
        acc += r["_sum"]
    off_ref = ray.put(offsets)

    def scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        keys = t[order_col].to_numpy(zero_copy_only=False)
        vals = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        base = ray.get(off_ref)[keys[0]]
        pre = base + np.concatenate([[0], np.cumsum(vals[:-1])])
        return t.append_column(out_col, pa.array(pre))

    return srt.map_batches(scan, batch_format="pyarrow")


def pack_sequences(ds: ray.data.Dataset, order_col: str, token_col: str,
                   budget: int) -> ray.data.Dataset:
    """Concat-and-chunk sequence packing: returns the input (in global
    ``order_col`` order) plus ``seq_id`` (which fixed-``budget`` training
    sequence the document STARTS in) and ``seq_offset`` (its start
    position inside that sequence).  A document with
    seq_offset + tokens > budget continues into the next sequence(s) —
    chunking is the consumer's slice, the layout is fully determined
    here."""
    pre = prefix_sum(ds, order_col, token_col, out_col="_prefix")

    def place(t: pa.Table) -> pa.Table:
        p = t["_prefix"].to_numpy(zero_copy_only=False)
        return (t.append_column("seq_id", pa.array(p // budget))
                 .append_column("seq_offset", pa.array(p % budget))
                 .drop_columns(["_prefix"]))

    return pre.map_batches(place, batch_format="pyarrow")
