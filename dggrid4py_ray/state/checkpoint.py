"""Resumable partitioned output with per-partition lineage manifests.

The reference has no checkpointing at all (temp files deleted best-effort,
dggrid_runner.py:1378-1396).  Design per SURVEY §4: deterministic partition
ids; layout

    out_dir/
      part-00000/data.parquet
      part-00000/manifest.json     {partition, rows, input, checksum, ...}
      ...
      _dataset_manifest.json       (written last = commit marker)

A re-run with the same ``run_checkpointed`` call skips partitions whose
manifest is complete, re-processing only the missing ones — so a failed
100 TB run resumes instead of restarting.  Checksums make outputs verifiable
(lineage: which input shard produced which partition under which code
version).
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import pyarrow as pa
import pyarrow.parquet as pq


def _checksum(table: pa.Table) -> str:
    h = hashlib.md5()
    for col in sorted(table.column_names):
        arr = table[col]
        for chunk in (arr.chunks if isinstance(arr, pa.ChunkedArray) else [arr]):
            for buf in chunk.buffers():
                if buf is not None:
                    h.update(buf)
    return h.hexdigest()


def partition_done(out_dir: str, pid: int) -> bool:
    return os.path.exists(os.path.join(out_dir, f"part-{pid:05d}", "manifest.json"))


def write_partition(out_dir: str, pid: int, table: pa.Table, lineage: dict | None = None):
    """Atomic partition write: data first, manifest last (commit marker)."""
    pdir = os.path.join(out_dir, f"part-{pid:05d}")
    os.makedirs(pdir, exist_ok=True)
    tmp = os.path.join(pdir, ".data.parquet.tmp")
    pq.write_table(table, tmp)
    os.replace(tmp, os.path.join(pdir, "data.parquet"))
    manifest = {
        "partition": pid,
        "rows": table.num_rows,
        "columns": table.column_names,
        "checksum": _checksum(table),
        "written_at": time.time(),
        "lineage": lineage or {},
    }
    mtmp = os.path.join(pdir, ".manifest.json.tmp")
    with open(mtmp, "w") as f:
        json.dump(manifest, f)
    os.replace(mtmp, os.path.join(pdir, "manifest.json"))
    return manifest


def run_checkpointed(make_partition, n_partitions: int, out_dir: str,
                     lineage_base: dict | None = None, parallel: bool = True):
    """Execute ``make_partition(pid) -> pa.Table`` for every incomplete
    partition (as Ray tasks when parallel), write + manifest each, then the
    dataset-level manifest.  Returns the list of partition manifests."""
    os.makedirs(out_dir, exist_ok=True)
    todo = [p for p in range(n_partitions) if not partition_done(out_dir, p)]
    if parallel and todo:
        import ray

        @ray.remote
        def _one(pid):
            t = make_partition(pid)
            return write_partition(out_dir, pid, t,
                                   dict(lineage_base or {}, partition=pid))

        ray.get([_one.remote(p) for p in todo])
    else:
        for p in todo:
            write_partition(out_dir, p, make_partition(p),
                            dict(lineage_base or {}, partition=p))
    manifests = []
    for p in range(n_partitions):
        with open(os.path.join(out_dir, f"part-{p:05d}", "manifest.json")) as f:
            manifests.append(json.load(f))
    ds_manifest = {
        "n_partitions": n_partitions,
        "total_rows": sum(m["rows"] for m in manifests),
        "completed_at": time.time(),
        "skipped_existing": n_partitions - len(todo),
    }
    tmp = os.path.join(out_dir, "._dataset_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(ds_manifest, f)
    os.replace(tmp, os.path.join(out_dir, "_dataset_manifest.json"))
    return manifests


def completed_partitions(out_dir: str) -> set[int]:
    """Partition ids whose manifest (commit marker) exists."""
    done = set()
    if not os.path.isdir(out_dir):
        return done
    for name in os.listdir(out_dir):
        if name.startswith("part-") and os.path.exists(
                os.path.join(out_dir, name, "manifest.json")):
            done.add(int(name.split("-")[1]))
    return done


def clean_incomplete_partitions(out_dir: str):
    """Remove data files of partitions without a manifest (orphans from a
    crashed run) so a resume can rewrite them from scratch."""
    if not os.path.isdir(out_dir):
        return
    for name in os.listdir(out_dir):
        pdir = os.path.join(out_dir, name)
        if (name.startswith("part-") and os.path.isdir(pdir)
                and not os.path.exists(os.path.join(pdir, "manifest.json"))):
            for f in os.listdir(pdir):
                os.remove(os.path.join(pdir, f))


def write_dataset_checkpointed(ds, out_dir: str, lineage: dict | None = None,
                               part_col: str = "part_id",
                               zone_cols: list[str] | None = None):
    """STREAMING partitioned parquet sink with per-partition lineage
    manifests.

    Partition identity comes from the deterministic ``part_col`` column the
    caller assigns from input lineage (e.g. the input file / fragment index
    — see run_flagship_checkpointed), NOT from Ray block boundaries (which
    vary run to run).  Each batch is written to its partition directories
    AS IT FLOWS through ``map_batches`` — execution and writing overlap and
    nothing is materialized; only tiny (partition, rows, file) summaries
    return to the driver.  Manifests are written last (commit markers) once
    the stream is fully consumed; a crash leaves orphan data files that the
    next run's ``clean_incomplete_partitions`` removes before resuming.

    Resume contract: the CALLER filters already-completed partitions out of
    the input (``completed_partitions``) so finished work is skipped at the
    source.  NOTE: partitions are written on the worker that processes them
    — on a multi-node cluster ``out_dir`` must be a shared filesystem (or
    object-store URI via an fsspec-compatible path).

    ``zone_cols`` (round-4 verdict #5 — the zone-map clustered layout
    promoted into the flagship sink): when given, every data file is
    written SORTED by ``zone_cols[0]`` and its per-file [min, max] of
    each zone column is recorded in the partition manifest
    (``file_zones``), so a resumed 100-TB output is pruned-readable by
    default — ``read_checkpointed_pruned`` skips whole files whose zone
    cannot intersect the predicate, without opening them.
    """
    import uuid

    os.makedirs(out_dir, exist_ok=True)
    clean_incomplete_partitions(out_dir)

    def write_batch(batch: pa.Table) -> pa.Table:
        pids = batch[part_col].to_numpy(zero_copy_only=False)
        out_pids, out_rows, out_files = [], [], []
        out_bytes, out_secs, out_zones = [], [], []
        import numpy as np
        for pid in np.unique(pids):
            t0 = time.time()
            sl = batch.filter(pa.array(pids == pid))
            if zone_cols:
                sl = sl.sort_by([(zone_cols[0], "ascending")])
            pdir = os.path.join(out_dir, f"part-{int(pid):05d}")
            os.makedirs(pdir, exist_ok=True)
            fname = f"data-{uuid.uuid4().hex[:12]}.parquet"
            tmp = os.path.join(pdir, "." + fname + ".tmp")
            pq.write_table(sl, tmp)
            os.replace(tmp, os.path.join(pdir, fname))
            out_pids.append(int(pid))
            out_rows.append(sl.num_rows)
            out_files.append(fname)
            out_bytes.append(os.path.getsize(os.path.join(pdir, fname)))
            out_secs.append(time.time() - t0)
            if zone_cols:
                import pyarrow.compute as _pc
                out_zones.append(json.dumps({
                    c: [int(_pc.min(sl[c]).as_py()),
                        int(_pc.max(sl[c]).as_py())]
                    for c in zone_cols} if sl.num_rows else {}))
        cols = {"part_id": pa.array(out_pids, type=pa.int64()),
                "rows": pa.array(out_rows, type=pa.int64()),
                "file": pa.array(out_files, type=pa.string()),
                "bytes": pa.array(out_bytes, type=pa.int64()),
                "secs": pa.array(out_secs, type=pa.float64())}
        if zone_cols:
            cols["zones"] = pa.array(out_zones, type=pa.string())
        return pa.table(cols)

    summaries = ds.map_batches(write_batch, batch_format="pyarrow") \
                  .take_all()   # tiny: one row per (batch, partition)
    per_part: dict[int, dict] = {}
    for row in summaries:
        p = per_part.setdefault(int(row["part_id"]),
                                {"rows": 0, "files": [], "bytes": 0,
                                 "write_secs": 0.0, "file_zones": {}})
        p["rows"] += int(row["rows"])
        p["files"].append(row["file"])
        p["bytes"] += int(row["bytes"])
        p["write_secs"] += float(row["secs"])
        if zone_cols:
            p["file_zones"][row["file"]] = json.loads(row["zones"])
    for pid, info in per_part.items():
        pdir = os.path.join(out_dir, f"part-{pid:05d}")
        manifest = {
            "partition": pid,
            "rows": info["rows"],
            "files": sorted(info["files"]),
            # per-partition METRICS (north-rule: lineage + metrics):
            # bytes on disk and cumulative filter+write wall seconds
            "metrics": {"bytes": info["bytes"],
                        "write_secs": round(info["write_secs"], 4),
                        "n_files": len(info["files"])},
            "written_at": time.time(),
            "lineage": dict(lineage or {}, partition=pid),
        }
        if zone_cols:
            manifest["zone_cols"] = list(zone_cols)
            manifest["file_zones"] = info["file_zones"]
        mtmp = os.path.join(pdir, ".manifest.json.tmp")
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(mtmp, os.path.join(pdir, "manifest.json"))
    # dataset-level manifest (covers every completed partition, incl. ones
    # finished in earlier runs)
    done = completed_partitions(out_dir)
    total, total_bytes = 0, 0
    for pid in done:
        with open(os.path.join(out_dir, f"part-{pid:05d}", "manifest.json")) as f:
            m = json.load(f)
        total += m["rows"]
        total_bytes += m.get("metrics", {}).get("bytes", 0)
    tmp = os.path.join(out_dir, "._dataset_manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"n_partitions": len(done), "total_rows": total,
                   "total_bytes": total_bytes,
                   "completed_at": time.time(),
                   "written_this_run": sorted(per_part)}, f)
    os.replace(tmp, os.path.join(out_dir, "_dataset_manifest.json"))
    return out_dir


def read_checkpointed_pruned(out_dir: str, col: str, lo: int, hi: int,
                             columns: list | None = None):
    """Zone-map-pruned read of a ``write_dataset_checkpointed(...,
    zone_cols=[...])`` table: keep only data files whose manifest-recorded
    [min, max] of ``col`` intersects [lo, hi) — pruned files are never
    opened — then apply the exact residual filter.  Returns
    (dataset, n_files_read, n_files_total)."""
    import ray.data

    paths, total = [], 0
    for name in sorted(os.listdir(out_dir)):
        pdir = os.path.join(out_dir, name)
        man = os.path.join(pdir, "manifest.json")
        if not (name.startswith("part-") and os.path.exists(man)):
            continue
        with open(man) as f:
            m = json.load(f)
        zones = m.get("file_zones", {})
        for fname in m["files"]:
            total += 1
            z = zones.get(fname, {}).get(col)
            if z is None or (z[0] < hi and z[1] >= lo):
                paths.append(os.path.join(pdir, fname))
    if not paths:
        schema = None
        for name in sorted(os.listdir(out_dir)):
            pdir = os.path.join(out_dir, name)
            man = os.path.join(pdir, "manifest.json")
            if name.startswith("part-") and os.path.exists(man):
                with open(man) as f:
                    m = json.load(f)
                if m["files"]:
                    schema = pq.read_schema(
                        os.path.join(pdir, m["files"][0]))
                    break
        import ray.data as _rd
        empty = schema.empty_table() if schema is not None \
            else pa.table({})
        if columns and schema is not None:
            empty = empty.select(columns)
        return _rd.from_arrow(empty), 0, total
    ds = ray.data.read_parquet(paths, columns=columns)
    return ds.filter(expr=f"{col} >= {int(lo)} and {col} < {int(hi)}"), \
        len(paths), total


def write_clustered(ds, out_dir: str, cluster_col: str,
                    zone_cols: list | None = None,
                    rows_per_file: int = 1 << 20,
                    stats_cols: list | None = None) -> dict:
    """Cluster-and-zone-map sink: range-sort by ``cluster_col`` (give it a
    locality key — a Morton/Hilbert key, a DGGS cell id, a timestamp — so
    spatially/temporally close rows land in the same files), stream each
    sorted block to its own parquet file, and record per-file MIN/MAX of
    every ``zone_cols`` entry in a ``_zonemap.json`` manifest.

    The zone map is what makes a 100-TB table queryable without a full
    scan: ``read_zonemap_pruned`` opens only files whose [min, max]
    overlaps the predicate range — after a locality-key sort a range
    predicate touches O(matching) files, not O(all).  (The same idea as
    parquet row-group statistics, lifted to the file level so pruning
    happens BEFORE tasks are scheduled — no footer reads, no task
    startup for pruned files.)

    ``stats_cols`` (INTEGER-valued columns only — the exactness
    contract of the engine's other int64 lanes) additionally records a
    per-file SUM, enabling ``manifest_range_agg`` to answer COUNT/SUM
    range queries from the manifest alone: files fully inside the
    predicate range contribute their pre-computed (rows, sum) with NO
    data read; only the <= 2 boundary files are scanned.

    Returns the manifest dict.  Writing is streaming (each block written
    as it flows; only (file, min, max, rows) summaries return to the
    driver); the manifest is written last as the commit marker."""
    import uuid

    import numpy as np

    zone_cols = list(zone_cols or [cluster_col])
    stats_cols = list(stats_cols or [])
    os.makedirs(out_dir, exist_ok=True)
    for f in os.listdir(out_dir):
        if f.endswith(".parquet") or f == "_zonemap.json" \
                or (f.startswith("_zonemap.v") and f.endswith(".json")):
            os.remove(os.path.join(out_dir, f))

    srt = ds.sort(cluster_col)

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"file": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64()),
                             **{f"_min_{c}": pa.array([], pa.int64())
                                for c in zone_cols},
                             **{f"_max_{c}": pa.array([], pa.int64())
                                for c in zone_cols},
                             **{f"_sum_{c}": pa.array([], pa.int64())
                                for c in stats_cols}})
        fname = f"clustered-{uuid.uuid4().hex[:12]}.parquet"
        tmp = os.path.join(out_dir, "." + fname + ".tmp")
        pq.write_table(batch, tmp)
        os.replace(tmp, os.path.join(out_dir, fname))
        cols = {"file": pa.array([fname]),
                "rows": pa.array([batch.num_rows], pa.int64())}
        for c in zone_cols:
            v = batch[c].to_numpy(zero_copy_only=False)
            cols[f"_min_{c}"] = pa.array([int(np.min(v))], pa.int64())
            cols[f"_max_{c}"] = pa.array([int(np.max(v))], pa.int64())
        for c in stats_cols:
            v = batch[c].to_numpy(zero_copy_only=False)
            cols[f"_sum_{c}"] = pa.array(
                [int(v.astype(np.int64).sum())], pa.int64())
        return pa.table(cols)

    summaries = srt.map_batches(write_block, batch_size=rows_per_file,
                                batch_format="pyarrow").take_all()
    manifest = {
        "cluster_col": cluster_col,
        "zone_cols": zone_cols,
        "stats_cols": stats_cols,
        "version": 1,
        "files": [
            {"file": s["file"], "rows": int(s["rows"]),
             "zones": {c: [int(s[f"_min_{c}"]), int(s[f"_max_{c}"])]
                       for c in zone_cols},
             **({"sums": {c: int(s[f"_sum_{c}"]) for c in stats_cols}}
                if stats_cols else {})}
            for s in summaries],
    }
    # ledger snapshot FIRST, then the current-manifest swap: a crash
    # between the two leaves an orphan ledger entry (harmless — its files
    # exist), never a live _zonemap.json whose version is missing from
    # the ledger (which would break read_clustered_version(latest))
    _write_version_manifest(out_dir, manifest)
    tmp = os.path.join(out_dir, "._zonemap.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "_zonemap.json"))
    return manifest


def _write_version_manifest(out_dir: str, manifest: dict) -> None:
    """Snapshot a manifest as ``_zonemap.vNNNNN.json`` (the Iceberg-style
    version ledger ``read_clustered_version`` time-travels over)."""
    v = int(manifest.get("version", 1))
    tmp = os.path.join(out_dir, f"._zonemap.v{v:05d}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, f"_zonemap.v{v:05d}.json"))


def list_clustered_versions(out_dir: str) -> list:
    """Sorted snapshot versions available for time travel."""
    out = []
    for f in os.listdir(out_dir):
        if f.startswith("_zonemap.v") and f.endswith(".json"):
            out.append(int(f[len("_zonemap.v"):-len(".json")]))
    return sorted(out)


def read_clustered_version(out_dir: str, version: int | None = None):
    """Time-travel read of a ``write_clustered`` table: the Dataset of
    the snapshot manifest ``version`` (default: the current manifest).
    Requires the versions to still exist — compactions run with
    ``retain_history=True`` keep superseded files on disk; the default
    destructive compaction invalidates older snapshots (their manifest
    stays as a record, but files may be gone — raises here).
    Returns (dataset, manifest)."""
    import ray.data

    if version is None:
        path = os.path.join(out_dir, "_zonemap.json")
    else:
        path = os.path.join(out_dir, f"_zonemap.v{int(version):05d}.json")
    if not os.path.exists(path):
        raise ValueError(
            f"no snapshot version {version!r} in {out_dir} "
            f"(have {list_clustered_versions(out_dir)})")
    with open(path) as f:
        man = json.load(f)
    paths = [os.path.join(out_dir, e["file"]) for e in man["files"]]
    missing = [p for p in paths if not os.path.exists(p)]
    if missing:
        raise ValueError(
            f"snapshot v{man.get('version')} is no longer readable: "
            f"{len(missing)} of its files were removed by a destructive "
            "compaction (pass retain_history=True to compact_clustered "
            "to keep time travel valid)")
    if not paths:
        return None, man
    return ray.data.read_parquet(paths), man


def zonemap_pruned_files(out_dir: str, col: str,
                         ranges: list) -> tuple:
    """File-level zone-map pruning for a ``write_clustered`` table: the
    DISTINCT files whose [min, max] zone on ``col`` intersects ANY of
    the half-open ``[lo, hi)`` ranges.  This is the ONE home of the
    overlap predicate (``zone_min < hi and zone_max >= lo``) — the
    single-range reader and the multi-range (Hilbert bbox) callers all
    route through it.  Returns (sorted file paths, n_files_total)."""
    with open(os.path.join(out_dir, "_zonemap.json")) as f:
        manifest = json.load(f)
    if col not in manifest["zone_cols"]:
        raise ValueError(f"no zone map for column {col!r} "
                         f"(have {manifest['zone_cols']})")
    keep = sorted({e["file"] for e in manifest["files"]
                   for lo, hi in ranges
                   if e["zones"][col][0] < hi and e["zones"][col][1] >= lo})
    return ([os.path.join(out_dir, f) for f in keep],
            len(manifest["files"]))


def manifest_range_agg(out_dir: str, col: str, lo: int, hi: int,
                       stats_col: str) -> dict:
    """COUNT(*) + SUM(stats_col) over ``col in [lo, hi)`` answered
    mostly from the ``write_clustered`` manifest: a file whose zone on
    the cluster column lies FULLY inside the range contributes its
    pre-computed (rows, sum) with zero IO; only the boundary files
    (zone straddles lo or hi — after a cluster sort, at most a couple)
    are scanned and filtered exactly.  The metadata-only aggregation
    trick of Iceberg/Snowflake pruning, at file granularity.

    Returns {"n": ..., "sum": ..., "files_scanned": ...,
    "files_total": ...}.  Exact because file zones partition the sorted
    key space: full-inside files hold ONLY in-range rows."""
    import numpy as np
    import ray.data

    with open(os.path.join(out_dir, "_zonemap.json")) as f:
        man = json.load(f)
    if stats_col not in man.get("stats_cols", []):
        raise ValueError(f"no per-file sums for column {stats_col!r} "
                         f"(have {man.get('stats_cols', [])}); pass "
                         "stats_cols= to write_clustered")
    n = s = 0
    boundary = []
    for e in man["files"]:
        zmin, zmax = e["zones"][col]
        if zmin >= hi or zmax < lo:
            continue                      # fully outside — pruned
        if zmin >= lo and zmax < hi:
            n += e["rows"]                # fully inside — metadata only
            s += e["sums"][stats_col]
        else:
            boundary.append(e["file"])
    if boundary:
        ds = ray.data.read_parquet(
            [os.path.join(out_dir, f) for f in boundary],
            columns=[col, stats_col])

        def part(t: pa.Table) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False)
            keep = (v >= lo) & (v < hi)
            x = t[stats_col].to_numpy(zero_copy_only=False)[keep]
            return pa.table({
                "n": pa.array([int(keep.sum())], pa.int64()),
                "s": pa.array([int(x.astype(np.int64).sum())],
                              pa.int64())})

        res = ds.map_batches(part, batch_format="pyarrow").to_pandas()
        n += int(res["n"].sum())
        s += int(res["s"].sum())
    return {"n": int(n), "sum": int(s),
            "files_scanned": len(boundary),
            "files_total": len(man["files"])}


def read_zonemap_pruned(out_dir: str, col: str, lo: int, hi: int):
    """Range-predicate read against a ``write_clustered`` table: keep only
    files whose zone [min, max] intersects [lo, hi) (file-level skip —
    no task is even scheduled for a pruned file), then apply the exact
    residual filter.  Returns (dataset, n_files_read, n_files_total)."""
    import ray.data

    paths, total = zonemap_pruned_files(out_dir, col, [(lo, hi)])
    if not paths:
        # every file pruned: return a TYPED empty dataset (schema from
        # any table file) so downstream stages keep working — None broke
        # every caller on legitimately-empty ranges
        with open(os.path.join(out_dir, "_zonemap.json")) as f:
            man = json.load(f)
        if man["files"]:
            import pyarrow.parquet as _pq
            schema = _pq.read_schema(
                os.path.join(out_dir, man["files"][0]["file"]))
            return ray.data.from_arrow(schema.empty_table()), 0, total
        return ray.data.from_arrow(pa.table({})), 0, total
    ds = ray.data.read_parquet(paths)
    return ds.filter(expr=f"{col} >= {int(lo)} and {col} < {int(hi)}"), \
        len(paths), total


def compact_clustered(out_dir: str, delta, rows_per_file: int = 1 << 20,
                      retain_history: bool = False) -> dict:
    """LSM-style delta compaction into a ``write_clustered`` table: merge
    new rows into the clustered layout while PRESERVING the cluster
    order and zone-map invariants — without rewriting the whole table.

    Mechanics (the Iceberg/Delta 'merge-on-write compaction' shape):
    1. Range-sort the delta once.
    2. For each delta block, the driver plans which EXISTING files its
       key range overlaps (manifest lookup — O(#files), no data read).
    3. Overlapping files + the delta rows that hit them are re-sorted
       and rewritten as fresh files; untouched files (usually the vast
       majority — deltas are small and clustered deltas are local) are
       carried over verbatim into the new manifest.
    4. Delta rows beyond every existing zone append as new sorted files.
    The new manifest replaces the old atomically (os.replace commit
    marker), so a crash mid-compaction leaves the previous manifest
    valid and only orphan files to clean — the same recovery contract
    as the lineage sinks above.

    Scale shape: rewrite cost is O(|delta| + |overlapped files|); the
    fact table is never rescanned.  Returns the new manifest."""
    import uuid

    import numpy as np
    import ray.data

    with open(os.path.join(out_dir, "_zonemap.json")) as f:
        man = json.load(f)
    key = man["cluster_col"]
    zone_cols = man["zone_cols"]
    stats_cols = man.get("stats_cols", [])

    # 1. collect the delta sorted by key.  The delta materializes on
    # the driver: compaction is a MAINTENANCE op over the small recent
    # delta (the incremental-view contract), not a bulk load — bulk
    # loads go through write_clustered.
    import ray as _ray
    dsrt = delta.sort(key)
    dtab = pa.concat_tables([_ray.get(r) for r in dsrt.to_arrow_refs()])
    if dtab.num_rows == 0:
        return man
    dtab = dtab.combine_chunks()
    dkeys = dtab[key].to_numpy(zero_copy_only=False)

    # 2. plan: which existing files does the delta touch?  Files are
    # processed in zone order with an assignment cursor so a delta key
    # sitting exactly on two files' shared boundary lands in exactly
    # one rewrite.
    touched, kept = [], []
    for e in sorted(man["files"], key=lambda e: e["zones"][key][0]):
        lo, hi = e["zones"][key]
        i0 = np.searchsorted(dkeys, lo, side="left")
        i1 = np.searchsorted(dkeys, hi, side="right")
        (touched if i1 > i0 else kept).append(e)

    # 3. rewrite touched files merged with their delta slice; rows of
    # the delta outside every touched zone become fresh append files
    covered = np.zeros(len(dkeys), bool)
    new_entries = []

    def _write(tab: pa.Table) -> list:
        out = []
        for off in range(0, tab.num_rows, rows_per_file):
            part = tab.slice(off, rows_per_file)
            fname = f"clustered-{uuid.uuid4().hex[:12]}.parquet"
            tmp = os.path.join(out_dir, "." + fname + ".tmp")
            pq.write_table(part, tmp)
            os.replace(tmp, os.path.join(out_dir, fname))
            zones = {}
            for c in zone_cols:
                v = part[c].to_numpy(zero_copy_only=False)
                zones[c] = [int(np.min(v)), int(np.max(v))]
            entry = {"file": fname, "rows": part.num_rows,
                     "zones": zones}
            if stats_cols:
                entry["sums"] = {
                    c: int(part[c].to_numpy(zero_copy_only=False)
                           .astype(np.int64).sum())
                    for c in stats_cols}
            out.append(entry)
        return out

    cursor = 0
    to_delete = []
    for e in touched:
        lo, hi = e["zones"][key]
        i0 = max(int(np.searchsorted(dkeys, lo, side="left")), cursor)
        i1 = max(int(np.searchsorted(dkeys, hi, side="right")), i0)
        cursor = i1
        covered[i0:i1] = True
        old = pq.read_table(os.path.join(out_dir, e["file"]))
        merged = pa.concat_tables(
            [old, dtab.slice(i0, i1 - i0).select(old.column_names)])
        merged = merged.sort_by([(key, "ascending")])
        new_entries.extend(_write(merged))
        to_delete.append(os.path.join(out_dir, e["file"]))

    if (~covered).any():
        rest = dtab.filter(pa.array(~covered))
        if kept or touched:
            ref = (kept or touched)[0]["file"]
            names = pq.read_schema(os.path.join(out_dir, ref)).names
        else:
            names = rest.column_names
        new_entries.extend(_write(rest.select(names)))

    man2 = {"cluster_col": key, "zone_cols": zone_cols,
            "stats_cols": stats_cols,
            "version": int(man.get("version", 1)) + 1,
            "files": kept + new_entries}
    # ledger-then-swap order (see write_clustered): the version snapshot
    # must exist before _zonemap.json names that version as current
    _write_version_manifest(out_dir, man2)
    tmp = os.path.join(out_dir, "._zonemap.json.tmp")
    with open(tmp, "w") as f:
        json.dump(man2, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "_zonemap.json"))
    # Old files are removed only AFTER the new manifest is live: a crash
    # anywhere above leaves the previous manifest pointing at files that
    # all still exist (new files are mere orphans, cleaned next run).
    # retain_history=True keeps them permanently, so every snapshot in
    # the _zonemap.vNNNNN.json ledger stays time-travel-readable.
    if not retain_history:
        for p in to_delete:
            os.remove(p)
    return man2
