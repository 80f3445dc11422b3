"""Format-adaptive document-table reader (Lance or Parquet).

The north-star input is a LANCE table of interleaved text+media documents
(BASELINE.json input_hint); this sandbox has no ``lance`` wheel, so the
adapter dispatches at runtime: a ``.lance`` dataset directory with the
``lance`` package importable reads through ``ray.data.read_lance``
(zero-copy Arrow fragments, column projection pushed down exactly like
parquet), anything else reads parquet.  Pipelines written against
``read_documents`` run unchanged on either storage format.
"""

from __future__ import annotations

import os

import ray.data


def _is_lance(path: str) -> bool:
    return path.rstrip("/").endswith(".lance") or (
        os.path.isdir(path) and os.path.isdir(os.path.join(path, "_versions")))


def read_documents(path: str, columns: list[str] | None = None,
                   **kw) -> ray.data.Dataset:
    """Read a document table from ``path`` — Lance dataset directory or
    parquet file/directory — with column pruning pushed to the format
    layer in both branches."""
    if _is_lance(path):
        try:
            import lance  # noqa: F401  (availability probe only)
        except ImportError as ex:
            raise ImportError(
                f"{path} looks like a Lance dataset but the 'lance' package "
                "is not installed in this environment; install pylance or "
                "convert the table to parquet") from ex
        return ray.data.read_lance(path, columns=columns, **kw)
    return ray.data.read_parquet(path, columns=columns, **kw)
