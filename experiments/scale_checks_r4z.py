"""Round-4z operator scale checks (BASELINE.md evidence): this session's
new operators at multi-million-row scale, one JSON line each.

Usage: python experiments/scale_checks_r4z.py [check ...]
(owns its Ray session; checks: knn magg hits lprop ivfpq)
"""

from __future__ import annotations

import json
import shutil
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

    # 1. large-large kNN join: 4M points x 100k sites, k=2
    if want("knn"):
        from dggrid4py_ray.stages.join import knn_join_via_buckets

        # rng-uniform coordinates, NOT a multiplicative lattice: a
        # (a*i mod M, b*i mod M) generator puts all sites on a few
        # diagonal lines of the torus (the classic bad-LCG lattice), so
        # half the points had ZERO sites within r0 and the retry radius
        # exploded the candidate join
        def pts(t: pa.Table) -> pa.Table:
            i = t["id"].to_numpy()
            rng = np.random.default_rng(int(i[0]) + 11)
            return pa.table({
                "event_id": pa.array(i),
                "lon": pa.array(rng.uniform(-180, 180, len(i))),
                "lat": pa.array(rng.uniform(-80, 80, len(i)))})

        def sites(t: pa.Table) -> pa.Table:
            i = t["id"].to_numpy()
            rng = np.random.default_rng(int(i[0]) + 13)
            return pa.table({
                "site_id": pa.array(i),
                "slon": pa.array(rng.uniform(-180, 180, len(i))),
                "slat": pa.array(rng.uniform(-80, 80, len(i)))})

        # r0 sized for ~10 expected candidates per point: the radius
        # join's candidate table is n x density x pi r^2 rows — at
        # r0=400 km that was ~280M rows (~25 GB through the sort) and
        # filled the object store + spill disk; 150 km keeps it ~70M
        n, m = 4_000_000, 100_000
        p = ray.data.range(n, override_num_blocks=64) \
            .map_batches(pts, batch_format="pyarrow")
        s = ray.data.range(m, override_num_blocks=16) \
            .map_batches(sites, batch_format="pyarrow")
        t0 = time.time()
        out = knn_join_via_buckets(p, s, k=2, r0_km=150.0,
                                   num_partitions=64)
        cnt = out.count()
        _emit("knn_join_buckets", n, t0, n_sites=m, k=2,
              out_rows=cnt)
        assert cnt == 2 * n, cnt

    # 2. manifest aggregation pushdown over a 50M-row clustered table
    if want("magg"):
        from dggrid4py_ray.state.checkpoint import (manifest_range_agg,
                                                    write_clustered)
        n = 50_000_000
        d = "/tmp/magg_scale"
        shutil.rmtree(d, ignore_errors=True)

        def gen(t: pa.Table) -> pa.Table:
            i = t["id"].to_numpy()
            return pa.table({"k": pa.array(i),
                             "v": pa.array((i * 7) % 101)})

        ds = ray.data.range(n, override_num_blocks=64) \
            .map_batches(gen, batch_format="pyarrow")
        write_clustered(ds, d, "k", ["k"], rows_per_file=1 << 20,
                        stats_cols=["v"])
        t0 = time.time()
        r = manifest_range_agg(d, "k", 5_000_000, 45_000_000, "v")
        _emit("manifest_range_agg", n, t0, **r)
        assert r["n"] == 40_000_000
        assert r["files_scanned"] <= 2
        shutil.rmtree(d, ignore_errors=True)

    # 3. HITS over 10M bipartite edges (1M + 100k nodes, skewed)
    if want("hits") or want("lprop"):
        def edges(t: pa.Table) -> pa.Table:
            i = t["id"].to_numpy()
            return pa.table({
                "u": pa.array((i * 31) % 1_000_000),
                "v": pa.array(2_000_000 + (i * i % 100_000))})

        e = ray.data.range(10_000_000, override_num_blocks=64) \
            .map_batches(edges, batch_format="pyarrow").materialize()
        if want("hits"):
            from dggrid4py_ray.stages.graph import hits_scores
            t0 = time.time()
            cnt = hits_scores(e).count()
            _emit("hits_2iter", 10_000_000, t0, n_nodes=cnt)
        if want("lprop"):
            from dggrid4py_ray.stages.graph import label_propagation_min
            t0 = time.time()
            cnt = label_propagation_min(e, rounds=2).count()
            _emit("labelprop_2r", 10_000_000, t0, n_nodes=cnt)

    # 4. IVF-PQ: encode 1M x 64d vectors, one query
    if want("ivfpq"):
        from dggrid4py_ray.stages.ann import ivfpq_build, ivfpq_topk

        def vecs(t: pa.Table) -> pa.Table:
            i = t["id"].to_numpy()
            rng = np.random.default_rng(int(i[0]) + 5)
            X = rng.normal(size=(len(i), 64))
            return pa.table({
                "vec_id": pa.array(i),
                "embedding": pa.array(list(X), pa.list_(pa.float64()))})

        n = 1_000_000
        ds = ray.data.range(n, override_num_blocks=64) \
            .map_batches(vecs, batch_format="pyarrow")
        t0 = time.time()
        C, books, codes = ivfpq_build(ds, n_centroids=64, n_sub=8,
                                      pq_centroids=64)
        codes = codes.materialize()
        t_enc = time.time() - t0
        q = np.asarray(codes.limit(1).to_pandas()["codes"][0], np.float64)
        q = np.random.default_rng(1).normal(size=64)
        t1 = time.time()
        top = ivfpq_topk(codes, q, C, books, k=10, nprobe=8)
        _emit("ivfpq_encode", n, t0, encode_sec=round(t_enc, 2),
              query_sec=round(time.time() - t1, 3),
              top_rows=top.num_rows)

    ray.shutdown()


if __name__ == "__main__":
    raise SystemExit(main())
