"""Round-5 scale checks (results recorded in BASELINE.md):

1. reassemble_spans carry-chain (verdict #8) at >= 1M docs — the
   explode -> reassemble round trip with the sort + block-local rebuild
   + boundary-merge implementation, plus the span-sequence fingerprint
   invariant on a sample.
2. exact_dedup default path (hash="fast", verdict #7) vs the md5 lane
   at 1M docs — the per-row-Python tax the new default removes.

Run: python experiments/scale_checks_r5.py
"""

import time

import numpy as np
import pyarrow as pa
import ray

ray.init(address="local", num_cpus=32, include_dashboard=False,
         logging_level="ERROR")
import ray.data  # noqa: E402

ray.data.DataContext.get_current().enable_progress_bars = False

import dggrid4py_ray  # noqa: E402,F401  (installs the empty-block patches)
from dggrid4py_ray.sources.spans_table import spans_dataset  # noqa: E402
from dggrid4py_ray.stages.spans import (explode_spans,  # noqa: E402
                                        reassemble_spans)

N_DOCS = 1_000_000


def check_reassemble():
    ds = spans_dataset(N_DOCS, batch_rows=8192,
                       override_num_blocks=256).materialize()
    rows = explode_spans(ds).materialize()
    n_spans = rows.count()
    t0 = time.time()
    back = reassemble_spans(rows).materialize()
    dt = time.time() - t0
    n_docs = back.count()
    assert n_docs == N_DOCS, (n_docs, N_DOCS)

    # fingerprint invariant on a sample: doc d's span sequence must be
    # byte-equal after the round trip
    sample = back.filter(
        lambda r: r["doc_id"].endswith("000")).to_pandas()
    orig = ds.filter(
        lambda r: r["doc_id"].endswith("000")).to_pandas()
    a = {d: [(s["kind"], s["text"], s["media_ref"]) for s in sp]
         for d, sp in zip(sample["doc_id"], sample["spans"])}
    b = {d: [(s["kind"], s["text"], s["media_ref"]) for s in sp]
         for d, sp in zip(orig["doc_id"], orig["spans"])}
    assert a == b and len(a) > 0, len(a)
    print(f"reassemble_spans: {N_DOCS} docs / {n_spans} spans in "
          f"{dt:.1f}s = {N_DOCS/dt:,.0f} docs/s "
          f"(fingerprint OK on {len(a)} sampled docs)")


def check_dedup_hash_lanes():
    from dggrid4py_ray.stages.dedup import exact_dedup

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64)),
            "text": pa.array([f"document body {i % (N_DOCS // 2)}"
                              for i in ids])})

    ds = ray.data.range(N_DOCS, override_num_blocks=128) \
        .map_batches(gen, batch_format="pyarrow").materialize()
    for lane in ("fast", "md5"):
        t0 = time.time()
        n = exact_dedup(ds, hash=lane).count()
        dt = time.time() - t0
        assert n == N_DOCS // 2, n
        print(f"exact_dedup[{lane}]: {N_DOCS} docs -> {n} keepers in "
              f"{dt:.1f}s = {N_DOCS/dt:,.0f} docs/s")


if __name__ == "__main__":
    check_reassemble()
    check_dedup_hash_lanes()
    ray.shutdown()
