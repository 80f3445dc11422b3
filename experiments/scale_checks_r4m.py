"""Round-4i..4m operator scale checks (BASELINE.md evidence): run the
newest operators at multi-million-row scale and print one JSON line each.

Usage: python experiments/scale_checks_r4m.py [check ...]
(owns its Ray session; checks: chunk qnorm debounce linfit spearman
benford fkaudit profile)
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


def _events(n_rows: int, n_users: int, parallelism: int = 64):
    """Deterministic synthetic event stream: (event_id, user_id, g, ts_us,
    v) — v in cents-scale ints, ts over 30 days."""
    import ray.data

    def gen(t: pa.Table) -> pa.Table:
        i = t["id"].to_numpy()
        rng = np.random.default_rng(int(i[0]) + 7)
        n = len(i)
        return pa.table({
            "event_id": pa.array(i),
            "user_id": pa.array(rng.integers(0, n_users, n)),
            "g": pa.array(rng.integers(0, 8, n).astype("U1")),
            "ts_us": pa.array(rng.integers(0, 30 * 86400 * 10**6, n)),
            "v": pa.array(rng.integers(1, 5_000_000, n))})

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

    # 1. chunk_documents: 3M docs (~300 chars) -> sliding 120/30 chunks
    if want("chunk"):
        from dggrid4py_ray.stages.text import chunk_documents

        def gen_docs(t: pa.Table) -> pa.Table:
            i = t["id"].to_numpy()
            rng = np.random.default_rng(int(i[0]) + 1)
            lens = rng.integers(50, 600, len(i))
            chars = rng.integers(97, 123, int(lens.sum()),
                                 dtype=np.uint8).view("S1")
            texts, pos = [], 0
            for ln in lens:
                texts.append(chars[pos:pos + ln].tobytes().decode())
                pos += ln
            return pa.table({"doc_id": pa.array(i),
                             "text": pa.array(texts, pa.string())})

        docs = ray.data.range(3_000_000, override_num_blocks=64) \
            .map_batches(gen_docs, batch_format="pyarrow")
        t0 = time.time()
        n = chunk_documents(docs, "text", "doc_id",
                            size=120, overlap=30).count()
        _emit("chunk_documents_3M_docs", 3_000_000, t0, chunks=n)

    # 2. quantile_normalize: 10M rows, 8 groups (two corpus sorts + one
    # rank join)
    if want("qnorm"):
        from dggrid4py_ray.stages.normalize import quantile_normalize

        ds = _events(10_000_000, 1_000_000)
        t0 = time.time()
        n = quantile_normalize(ds, "g", "v", "event_id").count()
        _emit("quantile_normalize_10M", n, t0)

    # 3. debounce_events: 20M events / 1M users, 60 s min gap
    if want("debounce"):
        from dggrid4py_ray.stages.temporal import debounce_events

        def with_ts(t: pa.Table) -> pa.Table:
            return t.append_column("ts", t["ts_us"].combine_chunks()
                                   .cast(pa.timestamp("us")))

        ds = _events(20_000_000, 1_000_000) \
            .map_batches(with_ts, batch_format="pyarrow")
        t0 = time.time()
        kept = debounce_events(ds, "user_id", "ts", "event_id", 60).count()
        _emit("debounce_20M_events", 20_000_000, t0, kept=kept)

    # 4. group_linear_fit: 50M rows, 8 groups — pure partial-sum fold
    if want("linfit"):
        from dggrid4py_ray.stages.linalg import group_linear_fit

        # x in HOURS (<=720) so sum_xx stays far from int64 range even at
        # 50M rows (720^2 * 5e7 ~ 2.6e13)
        def xy(t: pa.Table) -> pa.Table:
            x = t["ts_us"].to_numpy(zero_copy_only=False) // (3600 * 10**6)
            return pa.table({"g": t["g"], "x": pa.array(x),
                             "y": t["v"].combine_chunks()})

        ds = _events(50_000_000, 1_000_000) \
            .map_batches(xy, batch_format="pyarrow")
        t0 = time.time()
        out = group_linear_fit(ds, "g", "x", "y").count()
        _emit("group_linear_fit_50M", 50_000_000, t0, groups=out)

    # 5. group_spearman: 10M rows, 8 groups — two rank carry chains
    if want("spearman"):
        from dggrid4py_ray.stages.linalg import group_spearman

        ds = _events(10_000_000, 1_000_000)
        t0 = time.time()
        out = group_spearman(ds, "g", "v", "ts_us", "event_id").count()
        _emit("group_spearman_10M", 10_000_000, t0, groups=out)

    # 6. benford_counts: 50M rows — (group, digit) partials only
    if want("benford"):
        from dggrid4py_ray.stages.validate import benford_counts

        ds = _events(50_000_000, 1_000_000)
        t0 = time.time()
        out = benford_counts(ds, "g", "v").count()
        _emit("benford_50M", 50_000_000, t0, cells=out)

    # 7. referential_audit: 20M child rows vs 1M parents, ~0.5% orphans
    if want("fkaudit"):
        from dggrid4py_ray.stages.validate import referential_audit

        def child_keys(t: pa.Table) -> pa.Table:
            i = t["id"].to_numpy()
            rng = np.random.default_rng(int(i[0]) + 3)
            k = rng.integers(0, 1_000_000, len(i))
            orphan = rng.random(len(i)) < 0.005
            k = np.where(orphan, k + 10_000_000, k)
            return pa.table({"k": pa.array(k)})

        child = ray.data.range(20_000_000, override_num_blocks=64) \
            .map_batches(child_keys, batch_format="pyarrow")
        parent = ray.data.range(1_000_000).map_batches(
            lambda t: pa.table({"p": t["id"]}), batch_format="pyarrow")
        t0 = time.time()
        row = referential_audit(child, "k", parent, "p", "r").to_pylist()[0]
        _emit("referential_audit_20M", 20_000_000, t0,
              orphans=row["n_orphans"], orphan_keys=row["n_orphan_keys"])

    # 8. profile_table: 20M rows x 4 columns (1 scan + 4 distinct sorts)
    if want("profile"):
        from dggrid4py_ray.stages.validate import profile_table

        ds = _events(20_000_000, 1_000_000)
        t0 = time.time()
        out = profile_table(ds, ["user_id", "g", "ts_us", "v"])
        _emit("profile_table_20Mx4", 20_000_000, t0,
              cols=out.num_rows)

    # 9. rolling_median_daily: 10M events / 1M users / 30 days
    if want("rollmed"):
        from dggrid4py_ray.stages.temporal import rolling_median_daily

        def with_ts(t: pa.Table) -> pa.Table:
            return t.append_column("ts", t["ts_us"].combine_chunks()
                                   .cast(pa.timestamp("us")))

        ds = _events(10_000_000, 1_000_000) \
            .map_batches(with_ts, batch_format="pyarrow")
        t0 = time.time()
        n = rolling_median_daily(ds, "user_id", "ts", "v",
                                 window_days=7).count()
        _emit("rolling_median_10M", 10_000_000, t0, out_rows=n)

    # 10. rolling_range_sum: 10M events / 1M users, 1 h trailing window
    if want("rangesum"):
        from dggrid4py_ray.stages.temporal import rolling_range_sum

        def with_ts(t: pa.Table) -> pa.Table:
            return t.append_column("ts", t["ts_us"].combine_chunks()
                                   .cast(pa.timestamp("us")))

        ds = _events(10_000_000, 1_000_000) \
            .map_batches(with_ts, batch_format="pyarrow")
        t0 = time.time()
        n = rolling_range_sum(ds, "user_id", "ts", "v", "event_id",
                              3600).count()
        _emit("rolling_range_sum_10M", 10_000_000, t0, out_rows=n)

    ray.shutdown()


if __name__ == "__main__":
    main()
