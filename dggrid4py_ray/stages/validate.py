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
        total = int(n.sum())
        # bit_xor over ZERO rows is NULL in the SQL twin — match it,
        # so reconciling against a table that lost all rows still
        # compares bit-exactly
        val = np.bitwise_xor.reduce(fp) if total else None
        return pa.table({
            "n_rows": pa.array([total], pa.int64()),
            "fp": pa.array([val], pa.uint64())})

    # identity partial (xor 0, +0): guarantees fold sees >= 1 row even
    # when the input is empty (zero blocks would skip fold entirely)
    seed = ray.data.from_arrow(pa.table({
        "_fp": pa.array([0], pa.uint64()), "_n": pa.array([0], pa.int64())}))
    return (ds.map_batches(partial, batch_format="pyarrow").union(seed)
              .repartition(1).map_batches(fold, batch_format="pyarrow"))


def benford_counts(ds: ray.data.Dataset, group_col: str, value_col: str,
                   digit_col: str = "digit",
                   out_col: str = "n") -> ray.data.Dataset:
    """Leading-digit distribution per group over a POSITIVE integer value
    column — the Benford's-law data-quality audit (fraud/synthetic-data
    screening; compare against log10(1 + 1/d)).  Rows with value <= 0
    have no leading digit and are excluded.

    Vectorized digit extraction: 18 conditional integer halvings-by-ten
    (int64 has at most 19 digits) — no string round-trip, no per-row
    Python.  Partial (group, digit) counts leave each batch; one
    sort-based grouped_reduce finishes at any group cardinality."""
    import pandas as pd

    from .groupagg import grouped_reduce

    def partial(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = v > 0
        d = v[keep]
        for _ in range(18):
            d = np.where(d >= 10, d // 10, d)
        g = t[group_col].to_numpy(zero_copy_only=False)[keep]
        pdf = (pd.DataFrame({group_col: g, digit_col: d})
               .groupby([group_col, digit_col], sort=False)
               .size().rename("_n").reset_index())
        pdf["_n"] = pdf["_n"].astype(np.int64)
        pdf[digit_col] = pdf[digit_col].astype(np.int64)
        return pa.Table.from_pandas(pdf, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_reduce(parts, [group_col, digit_col], {"_n": out_col},
                          how="sum")


def referential_audit(child: ray.data.Dataset, child_col: str,
                      parent: ray.data.Dataset, parent_col: str,
                      relation: str) -> pa.Table:
    """Foreign-key orphan audit (the referential-integrity expectation of
    a DQ suite): ONE answer row per relation —
    (relation, n_rows, n_orphans, n_orphan_keys) where an orphan is a
    child row whose key has no parent.

    Shape: bloom_anti_join finds the exact orphan set (bloom-negative
    rows never enter the join exchange — for a healthy table the shuffle
    carries ~nothing), distinct orphan keys via one sort-based
    grouped_count; every aggregate is answer-sized."""
    from .bloom import bloom_anti_join
    from .groupagg import grouped_count

    keys = child.select_columns([child_col])
    n_rows = keys.count()
    orphans = bloom_anti_join(keys, parent.select_columns([parent_col]),
                              child_col, parent_col).materialize()
    n_orphans = orphans.count()
    n_keys = grouped_count(orphans, child_col).count() if n_orphans else 0
    return pa.table({"relation": pa.array([relation]),
                     "n_rows": pa.array([n_rows], pa.int64()),
                     "n_orphans": pa.array([n_orphans], pa.int64()),
                     "n_orphan_keys": pa.array([n_keys], pa.int64())})


def profile_table(ds: ray.data.Dataset, cols: list) -> pa.Table:
    """Column-profile report — the ingest-time ANALYZE/profiling pass:
    one answer-sized row per column, (column, n_rows, n_null,
    n_distinct, min_str, max_str).  min/max are computed TYPED (never a
    lexicographic string min over numbers) and cast to string only in
    the final answer row, matching SQL ``CAST(MIN(col) AS VARCHAR)``;
    n_distinct excludes nulls (COUNT DISTINCT semantics).

    Shape: ONE corpus scan emits a per-batch wide partial (per column:
    count, null count, typed min, typed max — a single row per batch),
    folded on one block; exact distinct counts ride one single-column
    sort-based ``grouped_count`` per column (each reads ONLY that
    column).  Everything that crosses the wire is answer-sized except
    the distinct sorts.

    Float/timestamp string parity with DuckDB VARCHAR casts holds for
    round-trip float repr and microsecond timestamps (both engines print
    shortest-round-trip doubles and 'YYYY-MM-DD HH:MM:SS[.ffffff]');
    exotic float formats (nan/inf) are not normalized."""
    import pandas as pd
    import pyarrow.compute as pc

    from .groupagg import grouped_count

    def partial(t: pa.Table) -> pa.Table:
        out = {}
        for c in cols:
            arr = t[c]
            out[f"_n_{c}"] = pa.array([t.num_rows], pa.int64())
            out[f"_nn_{c}"] = pa.array([arr.null_count], pa.int64())
            valid = arr.drop_null()
            if len(valid):
                out[f"_mn_{c}"] = pa.array([pc.min(valid).as_py()],
                                           arr.type)
                out[f"_mx_{c}"] = pa.array([pc.max(valid).as_py()],
                                           arr.type)
            else:
                out[f"_mn_{c}"] = pa.array([None], arr.type)
                out[f"_mx_{c}"] = pa.array([None], arr.type)
        return pa.table(out)

    folded = (ds.map_batches(partial, batch_format="pyarrow")
                .repartition(1)
                .map_batches(lambda t: pa.table({
                    **{f"_n_{c}": [int(pc.sum(t[f"_n_{c}"]).as_py() or 0)]
                       for c in cols},
                    **{f"_nn_{c}": [int(pc.sum(t[f"_nn_{c}"]).as_py() or 0)]
                       for c in cols},
                    **{f"_mn_{c}": pa.array([pc.min(t[f"_mn_{c}"]).as_py()],
                                            t.schema.field(f"_mn_{c}").type)
                       for c in cols},
                    **{f"_mx_{c}": pa.array([pc.max(t[f"_mx_{c}"]).as_py()],
                                            t.schema.field(f"_mx_{c}").type)
                       for c in cols},
                }), batch_format="pyarrow")
              ).take_batch(1, batch_format="pyarrow")

    def to_str(v) -> str | None:
        if v is None:
            return None
        if isinstance(v, (np.datetime64, pd.Timestamp)):
            return str(pd.Timestamp(v))
        if hasattr(v, "isoformat"):          # datetime.datetime
            return str(pd.Timestamp(v))
        return str(v)

    rows = {"column": [], "n_rows": [], "n_null": [], "n_distinct": [],
            "min_str": [], "max_str": []}
    for c in cols:
        distinct = grouped_count(
            ds.select_columns([c]).map_batches(
                lambda t, c=c: t.drop_null(), batch_format="pyarrow"),
            c).count()
        rows["column"].append(c)
        rows["n_rows"].append(folded[f"_n_{c}"][0].as_py())
        rows["n_null"].append(folded[f"_nn_{c}"][0].as_py())
        rows["n_distinct"].append(int(distinct))
        rows["min_str"].append(to_str(folded[f"_mn_{c}"][0].as_py()))
        rows["max_str"].append(to_str(folded[f"_mx_{c}"][0].as_py()))
    return pa.table({
        "column": pa.array(rows["column"]),
        "n_rows": pa.array(rows["n_rows"], pa.int64()),
        "n_null": pa.array(rows["n_null"], pa.int64()),
        "n_distinct": pa.array(rows["n_distinct"], pa.int64()),
        "min_str": pa.array(rows["min_str"], pa.string()),
        "max_str": pa.array(rows["max_str"], pa.string())})


def contingency_counts(ds: ray.data.Dataset, row_col: str,
                       col_col: str) -> pa.Table:
    """Contingency table with marginals — the integer inputs of a
    chi-square independence test (drift / association audits between two
    categorical columns).  Emits one row per observed (row, col) pair:
    observed count, row total, column total, grand total — all int64, so
    the SQL window-SUM twin is bit-exact, and the chi-square statistic
    sum((N*obs - rt*ct)^2 / (N*rt*ct)) is a pure driver-side fold over
    the answer-sized table.

    Shape: within-batch combiner (a hot pair contributes one partial row
    per batch) + one hash aggregate over the category-pair domain
    (answer-sized by definition); marginals fold driver-side."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        if (t[row_col].null_count or t[col_col].null_count):
            # pandas groupby would silently DROP null groups where SQL
            # keeps them — refuse instead of diverging (the grouped_reduce
            # null-key convention)
            raise ValueError("contingency_counts: null category values in "
                             f"{row_col!r}/{col_col!r} are not supported")
        df = pd.DataFrame({
            "r": t[row_col].to_numpy(zero_copy_only=False),
            "c": t[col_col].to_numpy(zero_copy_only=False)})
        g = df.groupby(["r", "c"], sort=False).size().reset_index(name="o")
        return pa.Table.from_pandas(g, preserve_index=False)

    obs = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["r", "c"]).aggregate(Sum("o", alias_name="observed")) \
        .to_pandas()
    rt = obs.groupby("r")["observed"].sum()
    ct = obs.groupby("c")["observed"].sum()
    n = int(obs["observed"].sum())
    obs["row_total"] = obs["r"].map(rt).astype(np.int64)
    obs["col_total"] = obs["c"].map(ct).astype(np.int64)
    obs["n"] = np.int64(n)
    obs = obs.rename(columns={"r": row_col, "c": col_col}) \
        .sort_values([row_col, col_col], ignore_index=True)
    return pa.Table.from_pandas(obs, preserve_index=False)


def k_anonymity_audit(ds: ray.data.Dataset, quasi_cols: list, k: int,
                      out_col: str = "n") -> ray.data.Dataset:
    """k-anonymity violation audit (Sweeney 2002): the quasi-identifier
    value combinations held by FEWER than ``k`` rows — each such combo
    re-identifies its members within a group smaller than the privacy
    threshold.  Returns (quasi_cols..., n) for every violating combo.

    Scale shape: one ``grouped_count`` (sort-based, unbounded combo
    cardinality — exactly where k-anonymity matters, since violations
    live in the long tail of rare combos a hash aggregate would blow
    up on) + a vectorized size filter.  Null quasi values are a single
    anonymity class per SQL GROUP BY semantics — but the underlying
    carry chain refuses null group keys (engine contract); fill
    sentinel values upstream."""
    from .groupagg import grouped_count

    if k < 2:
        raise ValueError(f"k must be >= 2 for a meaningful audit, got {k}")
    counts = grouped_count(ds, list(quasi_cols), out_col=out_col)
    return counts.filter(expr=f"{out_col} < {int(k)}")
