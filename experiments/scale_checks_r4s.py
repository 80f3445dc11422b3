"""Round-4s operator scale checks (BASELINE.md evidence): this session's
new operators at multi-million-row scale, one JSON line each.

Usage: python experiments/scale_checks_r4s.py [check ...]
(owns its Ray session; checks: rrf hardneg linkage refresh s2 scd2 zmj hpd)
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


def _docs(n_rows: int, parallelism: int = 64):
    import ray.data

    def gen(t: pa.Table) -> pa.Table:
        i = t["id"].to_numpy()
        rng = np.random.default_rng(int(i[0]) + 3)
        n = len(i)
        return pa.table({
            "doc_id": pa.array(i),
            "s1": pa.array(rng.integers(0, 1 << 20, n)),
            "s2": pa.array(rng.integers(0, 1 << 20, n)),
            "bk": pa.array((i % 200_000).astype(np.int64)),
            "f1": pa.array(rng.integers(0, 50, n).astype("U2")),
            "f2": pa.array(rng.integers(0, 1000, n))})

    return ray.data.range(n_rows, override_num_blocks=parallelism) \
        .map_batches(gen, batch_format="pyarrow")


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

    # 1. RRF over 10M docs, two score columns (two sorts + top-100 merge)
    if want("rrf"):
        from dggrid4py_ray.stages.search import rrf_fuse
        n = 10_000_000
        ds = _docs(n).select_columns(["doc_id", "s1", "s2"])
        t0 = time.time()
        out = rrf_fuse(ds, "doc_id", ["s1", "s2"], top_n=100)
        assert out.num_rows == 100
        _emit("rrf_fuse", n, t0)

    # 2. hard negatives: 4M x 64-d corpus, 16 queries, k=10
    if want("hardneg"):
        from dggrid4py_ray.stages.search import hard_negatives
        n, d, nq = 4_000_000, 64, 16

        def emb(t: pa.Table) -> pa.Table:
            i = t["id"].to_numpy()
            rng = np.random.default_rng(int(i[0]) + 5)
            X = rng.normal(size=(len(i), d)).astype(np.float32)
            return pa.table({
                "vec_id": pa.array(i),
                "embedding": pa.array(list(X)),
                "label": pa.array(rng.integers(0, 4, len(i))
                                  .astype(np.int32))})

        ds = ray.data.range(n, override_num_blocks=64) \
            .map_batches(emb, batch_format="pyarrow")
        rng = np.random.default_rng(0)
        Q = rng.normal(size=(nq, d))
        t0 = time.time()
        out = hard_negatives(ds, Q, rng.integers(0, 4, nq), k=10)
        assert out.num_rows == nq * 10
        _emit("hard_negatives", n, t0, n_queries=nq, dim=d)

    # 3. record linkage: 10M rows, 200k blocks (~50 rows each ->
    # ~12M scored pairs generated and filtered distributed)
    if want("linkage"):
        from dggrid4py_ray.stages.linkage import linkage_score_pairs
        n = 10_000_000
        ds = _docs(n).select_columns(["doc_id", "bk", "f1", "f2"])
        t0 = time.time()
        pairs = linkage_score_pairs(ds, "bk", "doc_id",
                                    {"f1": 2, "f2": 3}, threshold=2)
        n_pairs = pairs.count()
        _emit("linkage_pairs", n, t0, n_pairs=n_pairs)

    # 4. incremental view refresh: 100k-group view + 2M-row delta —
    # refresh must scale with the DELTA, not the 50M-row base
    if want("refresh"):
        from dggrid4py_ray.stages.groupagg import grouped_reduce
        from dggrid4py_ray.stages.incremental import (delta_partials,
                                                      refresh_grouped_view)
        n_delta, n_groups = 2_000_000, 100_000

        def rows(t: pa.Table) -> pa.Table:
            i = t["id"].to_numpy()
            return pa.table({"k": pa.array(i % n_groups),
                             "v": pa.array(i * 7 % 1000)})

        # stored view: synthesized directly (stands in for a 50M-row base)
        view = ray.data.range(n_groups, override_num_blocks=8).map_batches(
            lambda t: pa.table({"k": t["id"],
                                "sv": pa.array(t["id"].to_numpy() * 11),
                                "n": pa.array(np.full(t.num_rows, 500,
                                                      np.int64))}),
            batch_format="pyarrow")
        delta = ray.data.range(n_delta, override_num_blocks=32) \
            .map_batches(rows, batch_format="pyarrow")
        t0 = time.time()
        out = refresh_grouped_view(view, delta, ["k"], {"v": "sv"})
        n_out = out.count()
        assert n_out == n_groups
        _emit("view_refresh", n_delta, t0, n_groups=n_groups)

    # 5. S2 encode throughput: 20M points, level 12 + parent rollup
    if want("s2"):
        from dggrid4py_ray.dggs import s2 as s2mod
        n = 20_000_000

        def enc(t: pa.Table) -> pa.Table:
            i = t["id"].to_numpy()
            lon = ((i * 7919) % 360000) / 1000.0 - 180.0
            lat = ((i * 104729) % 180000) / 1000.0 - 90.0
            c = s2mod.encode(lon, lat, level=12)
            return pa.table({"p": pa.array(s2mod.parent(c, level=6)),
                             "n": pa.array(np.ones(len(i), np.int64))})

        from dggrid4py_ray.stages.groupagg import grouped_reduce
        ds = ray.data.range(n, override_num_blocks=64) \
            .map_batches(enc, batch_format="pyarrow")
        t0 = time.time()
        out = grouped_reduce(ds, ["p"], {"n": "n"}, how="sum")
        n_cells = out.count()
        _emit("s2_encode_bin", n, t0, n_parent_cells=n_cells)

    # 6. SCD2 lead at 20M events, 1M users (carry-chain, no map_groups)
    if want("scd2"):
        from dggrid4py_ray.stages.window import group_shift
        n, n_users = 20_000_000, 1_000_000

        def ev(t: pa.Table) -> pa.Table:
            i = t["id"].to_numpy()
            return pa.table({
                "user_id": pa.array(i % n_users),
                "_rel": pa.array((i * 40009 % (10**12)).astype(np.int64)),
                "eid": pa.array(i)})

        ds = ray.data.range(n, override_num_blocks=64) \
            .map_batches(ev, batch_format="pyarrow") \
            .map_batches(lambda t: t.append_column(
                "_negrel", pa.array(-t["_rel"].to_numpy())).append_column(
                "_negeid", pa.array(-t["eid"].to_numpy())),
                batch_format="pyarrow")
        t0 = time.time()
        led = group_shift(ds, "user_id", ["_negrel", "_negeid"], "_rel",
                          k=1, out_col="_lead")
        n_out = led.count()
        assert n_out == n
        _emit("scd2_lead", n, t0, n_users=n_users)

    # 7. zone-map merge join vs hash join: 20M x 5M rows pre-clustered
    # on the key — the exchange-free path must beat the shuffle join
    if want("zmj"):
        import shutil
        from dggrid4py_ray.stages.join import zonemap_merge_join
        from dggrid4py_ray.state.checkpoint import write_clustered
        n_a, n_b = 20_000_000, 5_000_000
        da, db = "/tmp/zmj_a", "/tmp/zmj_b"
        shutil.rmtree(da, ignore_errors=True)
        shutil.rmtree(db, ignore_errors=True)

        def rows(prefix):
            def f(t: pa.Table) -> pa.Table:
                i = t["id"].to_numpy()
                return pa.table({"k": pa.array(i * 3 % 10_000_000),
                                 prefix: pa.array(i % 1000)})
            return f

        a = ray.data.range(n_a, override_num_blocks=64) \
            .map_batches(rows("va"), batch_format="pyarrow")
        b = ray.data.range(n_b, override_num_blocks=64) \
            .map_batches(rows("vb"), batch_format="pyarrow")
        write_clustered(a, da, "k", ["k"], rows_per_file=1 << 19)
        write_clustered(b, db, "k", ["k"], rows_per_file=1 << 19)
        t0 = time.time()
        nj = zonemap_merge_join(da, db, "k").count()
        t_zmj = time.time() - t0
        t0 = time.time()
        nh = ray.data.read_parquet(da).join(
            ray.data.read_parquet(db), join_type="inner",
            num_partitions=64, on=("k",)).count()
        t_hash = time.time() - t0
        assert nj == nh, (nj, nh)
        _emit("zonemap_merge_join", n_a, time.time() - t_zmj,
              sec_hash_join=round(t_hash, 2), n_out=nj)

    # 8. hilbert pushdown at 50M rows: bbox read must touch a small
    # fraction of files
    if want("hpd"):
        import shutil
        from dggrid4py_ray.stages.sfc import (add_hilbert_key,
                                              hilbert_bbox_ranges)
        from dggrid4py_ray.state.checkpoint import (write_clustered,
                                                    zonemap_pruned_files)
        n = 50_000_000
        d = "/tmp/hpd_events"
        shutil.rmtree(d, ignore_errors=True)

        def binp(t: pa.Table) -> pa.Table:
            i = t["id"].to_numpy()
            return pa.table({
                "gx": pa.array((i * 7919) % 36000 // 40),
                "gy": pa.array((i * 104729) % 18000 // 40),
                "v": pa.array(i % 100)})

        ds = ray.data.range(n, override_num_blocks=64) \
            .map_batches(binp, batch_format="pyarrow")
        write_clustered(add_hilbert_key(ds, "gx", "gy"), d,
                        "hilbert_key", ["hilbert_key"],
                        rows_per_file=1 << 19)
        t0 = time.time()
        ranges = hilbert_bbox_ranges(100, 160, 80, 120)
        keep, _n_total = zonemap_pruned_files(d, "hilbert_key", ranges)
        sub = ray.data.read_parquet(keep)
        n_hit = sub.map_batches(
            lambda t: t.filter(pa.array(
                (t["gx"].to_numpy() >= 100) & (t["gx"].to_numpy() <= 160)
                & (t["gy"].to_numpy() >= 80)
                & (t["gy"].to_numpy() <= 120))),
            batch_format="pyarrow").count()
        _emit("hilbert_pushdown", n, t0, files_read=len(keep),
              files_total=_n_total, rows_hit=n_hit,
              n_ranges=len(ranges))
        assert len(keep) < _n_total * 0.5, (len(keep), _n_total)
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree("/tmp/zmj_a", ignore_errors=True)
        shutil.rmtree("/tmp/zmj_b", ignore_errors=True)

    ray.shutdown()


if __name__ == "__main__":
    main()
