"""Round-4h operator scale checks (BASELINE.md evidence): run the new
operators at multi-million-row scale and print one JSON line each.

Usage: python experiments/scale_checks_r4h.py [check ...]
(owns its Ray session; checks: ppjoin bfs sssp dupwin hist audit)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import pyarrow as pa


def _emit(name, rows, t0, **kw):
    dt = time.time() - t0
    print(json.dumps({"check": name, "rows": rows, "sec": round(dt, 2),
                      "rows_per_sec": round(rows / dt), **kw}),
          flush=True)


def main():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    only = set(sys.argv[1:])

    def want(k):
        return not only or k in only

    # 1. set_similarity_join: 1M docs (8-14 tokens of a 50k vocab, 2%
    # planted clones) — prefix-filter candidate generation + exact verify
    if want("ppjoin"):
        from dggrid4py_ray.stages.dedup import set_similarity_join

        def gen_docs(t: pa.Table) -> pa.Table:
            i = t["id"].to_numpy()
            rng = np.random.default_rng(int(i[0]) + 1)
            n = len(i)
            k = rng.integers(8, 15, n)
            toks = rng.integers(0, 50_000, int(k.sum()))
            texts = []
            pos = 0
            for kk in k:
                texts.append(" ".join(f"t{x}" for x in toks[pos:pos + kk]))
                pos += kk
            # 2% clones of the previous doc
            clone = rng.random(n) < 0.02
            for j in range(1, n):
                if clone[j]:
                    texts[j] = texts[j - 1]
            return pa.table({"doc_id": pa.array(i),
                             "text": pa.array(texts, pa.string())})

        ds = ray.data.range(1_000_000, override_num_blocks=64) \
            .map_batches(gen_docs, batch_format="pyarrow").materialize()
        t0 = time.time()
        n_pairs = set_similarity_join(ds, tau_1e6=900_000).count()
        _emit("set_similarity_join_1M_docs", 1_000_000, t0,
              pairs=n_pairs)

    # 2. BFS: 10M-edge graph over 2M nodes, large-frontier regime forced
    if want("bfs"):
        from dggrid4py_ray.stages.graph import bfs_shortest_hops

        def gen_edges(t: pa.Table) -> pa.Table:
            # 1M nodes x 10 out-edges to splitmix-scrambled dsts: the
            # frontier grows ~10x/hop (10 -> ~100 -> ~1k -> ~10k), so
            # hops 3-4 run the bloom large regime at threshold 1k
            i = t["id"].to_numpy().astype(np.int64)
            h = i.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(29)
            return pa.table({
                "src": pa.array(i % 1_000_000),
                "dst": pa.array((h % np.uint64(1_000_000)).astype(
                    np.int64))})

        edges = ray.data.range(10_000_000, override_num_blocks=64) \
            .map_batches(gen_edges, batch_format="pyarrow").materialize()
        t0 = time.time()
        reached = bfs_shortest_hops(edges, [0], max_hops=4,
                                    broadcast_threshold=1_000).count()
        _emit("bfs_10M_edges_4hops_large_frontier", 10_000_000, t0,
              reached=reached)

    # 3. SSSP: same graph with weights, broadcast regime
    if want("sssp"):
        from dggrid4py_ray.stages.graph import sssp_bounded

        def gen_wedges(t: pa.Table) -> pa.Table:
            i = t["id"].to_numpy().astype(np.int64)
            h = i.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
            h ^= h >> np.uint64(29)
            return pa.table({
                "src": pa.array(i % 1_000_000),
                "dst": pa.array((h % np.uint64(1_000_000)).astype(
                    np.int64)),
                "w": pa.array(i % 13 + 1)})

        edges = ray.data.range(10_000_000, override_num_blocks=64) \
            .map_batches(gen_wedges, batch_format="pyarrow").materialize()
        t0 = time.time()
        reached = sssp_bounded(edges, [0], max_hops=4).count()
        _emit("sssp_10M_edges_4hops_broadcast", 10_000_000, t0,
              reached=reached)

    # 4. duplicated windows: 1M docs x ~40 tokens (40M windows), 1%
    # planted clones
    if want("dupwin"):
        from dggrid4py_ray.stages.dedup import duplicated_window_counts

        def gen_long(t: pa.Table) -> pa.Table:
            i = t["id"].to_numpy()
            rng = np.random.default_rng(int(i[0]) + 7)
            n = len(i)
            toks = rng.integers(0, 30_000, n * 40).reshape(n, 40)
            texts = [" ".join(f"t{x}" for x in row) for row in toks]
            clone = rng.random(n) < 0.01
            for j in range(1, n):
                if clone[j]:
                    texts[j] = texts[j - 1]
            return pa.table({"doc_id": pa.array(i),
                             "text": pa.array(texts, pa.string())})

        ds = ray.data.range(1_000_000, override_num_blocks=64) \
            .map_batches(gen_long, batch_format="pyarrow").materialize()
        t0 = time.time()
        out = duplicated_window_counts(ds, window=8)
        import pyarrow.compute as pc
        tot = out.map_batches(
            lambda t: pa.table({"s": pa.array(
                [pc.sum(t["n_dup_windows"]).as_py() or 0])}),
            batch_format="pyarrow").sum("s")
        _emit("dup_windows_1M_docs_33M_windows", 1_000_000, t0,
              dup_windows=int(tot))

    # 5. value_histogram: 50M values, one narrow pass
    if want("hist"):
        from dggrid4py_ray.stages.relational import value_histogram

        def gen_v(t: pa.Table) -> pa.Table:
            i = t["id"].to_numpy().astype(np.int64)
            return pa.table({"v": (i * 48271) % 1_000_000})

        ds = ray.data.range(50_000_000, override_num_blocks=64) \
            .map_batches(gen_v, batch_format="pyarrow")
        t0 = time.time()
        n = value_histogram(ds, "v", lo=0, hi=1_000_000,
                            n_buckets=1000).count()
        _emit("value_histogram_50M", 50_000_000, t0, buckets_out=n)

    # 6. expectation_audit: 50M rows, 3 checks + uniqueness
    if want("audit"):
        import pyarrow.compute as pc
        from dggrid4py_ray.stages.validate import expectation_audit

        def gen_a(t: pa.Table) -> pa.Table:
            i = t["id"].to_numpy().astype(np.int64)
            return pa.table({"id": i, "v": (i * 48271) % 1_000_000})

        ds = ray.data.range(50_000_000, override_num_blocks=64) \
            .map_batches(gen_a, batch_format="pyarrow")
        checks = {
            "v_neg": lambda t: pc.less(t["v"], 0),
            "v_big": lambda t: pc.greater(t["v"], 999_000),
            "id_neg": lambda t: pc.less(t["id"], 0),
        }
        t0 = time.time()
        out = expectation_audit(ds, checks, unique_col="id").to_pandas()
        _emit("expectation_audit_50M_3checks_unique", 50_000_000, t0,
              result={r[0]: int(r[1]) for r in
                      out.itertuples(index=False, name=None)})

    ray.shutdown()


if __name__ == "__main__":
    main()
