"""Data-quality expectation audit — the schema/contract validation stage a
production ingest pipeline runs before anything else (Great-Expectations
shape, Ray-Data-native).

One NARROW pass over the corpus: every check is a vectorized predicate
(pyarrow.compute / numpy) evaluated per block; only (check, count) partial
rows — #checks per block — leave the workers, folded by one answer-sized
aggregate.  The optional uniqueness check rides the existing
high-cardinality ``grouped_count`` machinery (sort-based, no hash Aggregate
over per-row keys).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum


def expectation_audit(ds: ray.data.Dataset, checks: dict,
                      unique_col: str | None = None) -> ray.data.Dataset:
    """Run vectorized data-quality checks over ``ds``.

    ``checks``: {check_name: fn(pa.Table) -> bool mask (np or pa) of
    VIOLATING rows}.  Returns one row per check: (check, n_bad), plus
    ``_rows`` (total row count) and, if ``unique_col`` is given,
    ``dup_<unique_col>`` = rows minus distinct values (0 when the column
    is a proper key).  Deterministic at any parallelism.
    """
    names = sorted(checks)

    def partial(t: pa.Table) -> pa.Table:
        out_n, out_bad = [], []
        for name in names:
            m = checks[name](t)
            if isinstance(m, (pa.Array, pa.ChunkedArray)):
                import pyarrow.compute as pc
                m = pc.fill_null(m, False)  # null predicate = not a violation
                bad = int(np.asarray(m.to_numpy(zero_copy_only=False),
                                     dtype=bool).sum())
            else:
                bad = int(np.asarray(m, dtype=bool).sum())
            out_n.append(name)
            out_bad.append(bad)
        out_n.append("_rows")
        out_bad.append(t.num_rows)
        return pa.table({"check": pa.array(out_n, pa.string()),
                         "n_bad": pa.array(out_bad, pa.int64())})

    out = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("check").aggregate(Sum("n_bad", alias_name="n_bad")))

    if unique_col is not None:
        from .groupagg import grouped_count
        total = ds.count()
        distinct = grouped_count(
            ds.map_batches(lambda t: t.select([unique_col]),
                           batch_format="pyarrow"), unique_col).count()
        dup = ray.data.from_arrow(pa.table({
            "check": pa.array([f"dup_{unique_col}"], pa.string()),
            "n_bad": pa.array([total - distinct], pa.int64())}))
        out = out.union(dup)
    return out


def table_fingerprint(ds: ray.data.Dataset, cols: list,
                      sep: str = "|") -> ray.data.Dataset:
    """Order-insensitive whole-table content fingerprint: one row
    (n_rows, fp) where fp = XOR of md5_number_upper over each row's
    canonical string (``col1|col2|...``, values cast to string) —
    bit-identical to the DuckDB twin
    ``SELECT COUNT(*), bit_xor(md5_number_upper(c1 || '|' || c2 ...))``.

    The reconciliation primitive of a resumable pipeline: two runs (or a
    source and its checkpointed copy) agree iff (n_rows, fp) agree, at
    the cost of ONE narrow pass with a single (xor, count) partial per
    block — XOR is commutative/associative, so the fold is
    parallelism-deterministic.  Pass integer/string columns (scale
    floats to cents first — float→string formatting is not portable).
    """
    import pyarrow.compute as pc

    from .sampling import _md5_u64

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"_fp": pa.array([], pa.uint64()),
                             "_n": pa.array([], pa.int64())})
        parts = [t[c].cast(pa.string()) for c in cols]
        joined = parts[0] if len(parts) == 1 else \
            pc.binary_join_element_wise(*parts, sep)
        h = _md5_u64(joined.to_numpy(zero_copy_only=False))
        return pa.table({
            "_fp": pa.array([np.bitwise_xor.reduce(h)], pa.uint64()),
            "_n": pa.array([t.num_rows], pa.int64())})

    def fold(t: pa.Table) -> pa.Table:
        fp = t["_fp"].to_numpy(zero_copy_only=False)
        n = t["_n"].to_numpy(zero_copy_only=False)
        return pa.table({
            "n_rows": pa.array([int(n.sum())], pa.int64()),
            "fp": pa.array([np.bitwise_xor.reduce(fp) if len(fp)
                            else np.uint64(0)], pa.uint64())})

    # identity partial (xor 0, +0): guarantees fold sees >= 1 row even
    # when the input is empty (zero blocks would skip fold entirely)
    seed = ray.data.from_arrow(pa.table({
        "_fp": pa.array([0], pa.uint64()), "_n": pa.array([0], pa.int64())}))
    return (ds.map_batches(partial, batch_format="pyarrow").union(seed)
              .repartition(1).map_batches(fold, batch_format="pyarrow"))
