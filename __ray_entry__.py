"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01
and compares it against the matching ``oracle_sql()[name]`` via DuckDB
(row-count + schema + order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing here
or in the library calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: interleaved text+media
    documents -> per-span IGEO7 cell assignment (span sequence preserved) —
    the north-star cell-assignment pipeline at small scale.  Scales the
    synthetic interleaved table to the sf0.001 documents table it reads."""
    import pyarrow.parquet as pq

    from dggrid4py_ray.pipelines.queries import spans_cell_assignments

    sf_dir = "/root/testdata/sf0.001"
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    return spans_cell_assignments(sf_dir, n_docs=max(n_docs, 100) * 10)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented pipeline/operator family (SURVEY.md §2 +
    the beyond-reference training-data surface): relational aggregates /
    joins / top-k / quantiles / windows / sessions / as-of + range joins,
    grid binning (value + presence), zonal raster, polyfill, dateline
    split, hierarchy/codec round-trips incl. DGGRID-order SEQNUM, spatial
    joins (broadcast PIP + coarse-cell cogroup), dedup (exact, MinHash-LSH,
    SimHash, embedding-LSH, exact n-gram verify), text analysis, sampling +
    HyperLogLog, ANN (brute force + IVF), media plumbing, the curation
    composition, and the interleaved-spans flagship."""
    from dggrid4py_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """A DuckDB oracle for EVERY query (25/25): plain SQL for the relational
    and SQL-expressible grid checks; closed-form range() oracles for the grid
    algebra (polyfill counts, children/neighbor counts, codec round-trips);
    planted-duplicate pair lists for the sketch dedup operators (identical
    payloads make the sketch statistics exact); a gram-set self-join for the
    exact n-gram Jaccard verifier; conservation + pinned-literal checks for
    the non-SQL-expressible IGEO7/ISEA43H cell ids (golden VALUES)."""
    from dggrid4py_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
