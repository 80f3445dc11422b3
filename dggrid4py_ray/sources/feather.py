"""Arrow IPC (Feather v2) source/sink.

The IPC file format is the zero-copy interchange layer between Arrow
engines (mmap-able, preserves every Arrow type exactly — timestamps,
lists, dictionaries — where CSV/JSON lose type fidelity), so a
training-data pipeline that hands blocks to another Arrow-native system
(DuckDB, polars, a feature store) round-trips through it losslessly.

Scale shape: the sink is a pure ``map_batches`` stage — each block
writes its own ``.arrow`` file and reports its filename upward; the
driver commits a ``_manifest.json`` listing exactly the files whose
writer task's output was actually consumed, so a task retried after a
worker crash leaves only an orphan file that no read ever sees
(the ``write_clustered`` exactly-once pattern).  The source is
``ray.data.read_binary_files`` over the manifest's file list (one
streaming read task per file, no driver materialization) + a zero-copy
``pa.ipc.open_file`` decode per file.
"""

from __future__ import annotations

import io
import json
import os
import uuid

import pyarrow as pa
import ray.data


def write_feather_dir(ds: ray.data.Dataset, out_dir: str) -> int:
    """Write every block of ``ds`` as its own Arrow IPC file under
    ``out_dir`` and commit a ``_manifest.json``; returns the number of
    rows written.  Runs as a streaming consumer (no driver-side row
    collection — only the answer-sized (file, rows) manifest)."""
    os.makedirs(out_dir, exist_ok=True)

    def sink(t: pa.Table) -> pa.Table:
        fname = f"block-{uuid.uuid4().hex}.arrow"
        path = os.path.join(out_dir, fname)
        tmp = path + ".tmp"
        with pa.ipc.new_file(tmp, t.schema) as w:
            w.write_table(t)
        os.rename(tmp, path)          # atomic publish
        return pa.table({"file": pa.array([fname]),
                         "rows": pa.array([t.num_rows], pa.int64())})

    manifest = ds.map_batches(sink, batch_format="pyarrow").to_pandas()
    # Exactly-once: a retried sink task may have published an orphan
    # .arrow file, but only the consumed attempt's filename reaches this
    # manifest — readers see each block exactly once.
    if "file" not in manifest.columns:
        # zero-block dataset: map_batches never ran, to_pandas has no
        # columns — commit an empty manifest so the dir round-trips
        files, nrows = [], 0
    else:
        files, nrows = manifest["file"].tolist(), int(manifest["rows"].sum())
    tmp = os.path.join(out_dir, "._manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"files": files}, f)
    os.replace(tmp, os.path.join(out_dir, "_manifest.json"))
    return nrows


def read_feather_dir(path: str,
                     columns: list | None = None) -> ray.data.Dataset:
    """Read a feather dir as a Dataset — manifest-listed files only
    (orphans from retried sink tasks are ignored); one read task per
    file via ``read_binary_files``, decoded zero-copy per batch.
    Falls back to globbing ``*.arrow`` for foreign dirs without a
    manifest."""
    man = os.path.join(path, "_manifest.json")
    if os.path.exists(man):
        with open(man) as f:
            files = [os.path.join(path, x) for x in json.load(f)["files"]]
        if not files:
            # empty manifest (zero-block write): read_binary_files([])
            # errors, so return an empty dataset directly
            empty = pa.table({}) if columns is None else \
                pa.table({c: pa.array([], pa.null()) for c in columns})
            return ray.data.from_arrow(empty)
        raw = ray.data.read_binary_files(files)
    else:
        raw = ray.data.read_binary_files(path, file_extensions=["arrow"])

    def decode(t: pa.Table) -> pa.Table:
        tables = []
        for buf in t["bytes"]:
            rd = pa.ipc.open_file(io.BytesIO(buf.as_py()))
            tb = rd.read_all()
            if columns is not None:
                tb = tb.select(columns)
            tables.append(tb)
        return pa.concat_tables(tables)

    return raw.map_batches(decode, batch_format="pyarrow", batch_size=1)
