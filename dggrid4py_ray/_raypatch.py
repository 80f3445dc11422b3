"""Workaround for a Ray Data 2.49 empty-block schema leak.

Ray's ``map_batches`` transform bypasses the UDF for EMPTY input blocks
(``plan_udf_map_op.py``: "For empty input blocks, we directly output them
without calling the UDF ... because some all-to-all operators output empty
blocks with no schema").  Consequence: an empty dataset loses all schema
EVOLUTION through a map chain — a sort/aggregate that produced typed
0-row blocks keeps its PRE-map schema forever, and any downstream
consumer that needs the post-map schema (pyarrow's hash join above all:
"No match ... for key field reference FieldRef.Name(...)") breaks on
legitimately-empty inputs (a filter that matched nothing, a tiny
partition, a dry day in a dated feed).

This patch narrows the bypass: a TYPED empty batch (>=1 column) is run
through the UDF so the output carries the UDF's schema; if the UDF cannot
handle a 0-row batch (raises), we fall back to the old passthrough — for
an empty input any empty output is equally valid, so the fallback is
never worse than stock Ray.  Schema-less (zero-column) empties and all
non-empty batches take Ray's stock path, byte for byte.

Applied at import of ``dggrid4py_ray``; idempotent; silently skipped if
Ray's internals move (the engine then degrades to stock behavior, which
``stages.join.join_safe`` still hardens at every join boundary).
"""

from __future__ import annotations

import collections.abc
from types import GeneratorType


def _batch_is_typed_empty(batch) -> bool:
    if isinstance(batch, collections.abc.Mapping):
        return False
    ncols = getattr(batch, "num_columns", None)          # pyarrow.Table
    if ncols is not None:
        return batch.num_rows == 0 and ncols > 0
    cols = getattr(batch, "columns", None)               # pandas.DataFrame
    if cols is not None:
        return len(batch) == 0 and len(cols) > 0
    return False


def _install_typed_empty_batch() -> bool:
    """Patch ``BlocksToBatchesMapTransformFn``: its all-empty fallback
    builds the placeholder batch with ``builder().build()`` — a
    ZERO-COLUMN table — even when every input block is TYPED 0-row.  Use
    a 0-row slice of the first block converted to the requested batch
    format instead, so the schema reaches the UDF stage."""
    import itertools

    try:
        from ray.data._internal.execution.operators import (
            map_transformer as _mt)
        from ray.data.block import BlockAccessor
    except Exception:
        return False
    cls = getattr(_mt, "BlocksToBatchesMapTransformFn", None)
    if cls is None or getattr(cls, "_dggrid4py_ray_empty_patch", False):
        return cls is not None

    from ray.data._internal.block_batching.block_batching import batch_blocks

    def patched_call(self, blocks, _ctx):
        block_iter = iter(blocks)
        first = next(block_iter, None)
        if first is None:
            return []
        try:
            zero = BlockAccessor.for_block(first).slice(0, 0, copy=True)
            empty_batch = BlockAccessor.for_block(zero).to_batch_format(
                self._batch_format)
        except Exception:
            empty_batch = BlockAccessor.for_block(first).builder().build()
        blocks = itertools.chain([first], block_iter)
        first = None
        formatted = batch_blocks(
            blocks=blocks, stats=None, batch_size=self._batch_size,
            batch_format=self._batch_format, ensure_copy=self._ensure_copy)
        head = next(formatted, None)
        if head is None:
            return [empty_batch]
        return itertools.chain([head], formatted)

    cls.__call__ = patched_call
    cls._dggrid4py_ray_empty_patch = True
    return True


def _install_typed_sort_partitions() -> bool:
    """Patch ``sort_and_partition``: for a 0-row block it emits
    ``_empty_table()`` — a ZERO-COLUMN table — as every output partition,
    so sorting an empty dataset destroys its schema.  Replace any
    zero-column output with a typed 0-row slice of the source block."""
    try:
        from ray.data._internal.arrow_block import ArrowBlockAccessor
        from ray.data._internal.pandas_block import PandasBlockAccessor
    except Exception:
        return False

    def wrap(cls, is_arrow):
        if getattr(cls, "_dggrid4py_ray_empty_patch", False):
            return
        orig = cls.sort_and_partition

        def patched(self, boundaries, sort_key):
            out = orig(self, boundaries, sort_key)
            src = self._table
            ncols = src.num_columns if is_arrow else len(src.columns)
            if ncols == 0:
                return out
            typed0 = None
            fixed = []
            for b in out:
                bcols = b.num_columns if is_arrow else len(b.columns)
                nrows = b.num_rows if is_arrow else len(b)
                if nrows == 0 and bcols == 0:
                    if typed0 is None:
                        typed0 = src.slice(0, 0) if is_arrow \
                            else src.iloc[0:0]
                    fixed.append(typed0)
                else:
                    fixed.append(b)
            return fixed

        cls.sort_and_partition = patched
        cls._dggrid4py_ray_empty_patch = True

    wrap(ArrowBlockAccessor, True)
    wrap(PandasBlockAccessor, False)

    from ray.data.block import BlockExecStats, BlockMetadataWithSchema

    def wrap_merge(cls, is_arrow):
        """``merge_sorted_blocks`` drops all 0-row inputs and then emits a
        ZERO-COLUMN ``_empty_table()`` — keep the schema of any TYPED
        input instead (a 0-row slice is trivially sorted)."""
        if getattr(cls, "_dggrid4py_ray_merge_patch", False):
            return
        m = cls.__dict__["merge_sorted_blocks"]
        orig_merge = m.__func__ if isinstance(m, staticmethod) else m

        def patched_merge(blocks, sort_key):
            nrows = [(b.num_rows if is_arrow else len(b)) for b in blocks]
            if sum(nrows) == 0:
                for b in blocks:
                    ncols = b.num_columns if is_arrow else len(b.columns)
                    if ncols > 0:
                        stats = BlockExecStats.builder()
                        ret = b.slice(0, 0) if is_arrow else b.iloc[0:0]
                        return ret, BlockMetadataWithSchema.from_block(
                            ret, stats=stats.build())
            return orig_merge(blocks, sort_key)

        cls.merge_sorted_blocks = staticmethod(patched_merge)
        cls._dggrid4py_ray_merge_patch = True

    wrap_merge(ArrowBlockAccessor, True)
    wrap_merge(PandasBlockAccessor, False)
    return True


_ORIG = {}


def _patched_sort_map(idx, block, output_num_blocks, boundaries, sort_key):
    # runs in WORKER processes: this function pickles by reference to
    # dggrid4py_ray._raypatch, so unpickling imports the package, whose
    # __init__ calls install() — the accessor patches therefore exist in
    # every process that executes a sort map task
    install()
    return _ORIG["sort_map"](idx, block, output_num_blocks, boundaries,
                             sort_key)


def _patched_sort_reduce(sort_key, batch_format, *mapper_outputs,
                         partial_reduce=False):
    install()        # worker-side: activates the merge_sorted_blocks patch
    return _ORIG["sort_reduce"](sort_key, batch_format, *mapper_outputs,
                                partial_reduce=partial_reduce)


def _patched_agg_map(idx, block, output_num_blocks, boundaries, sort_key,
                     aggs):
    install()
    return _ORIG["agg_map"](idx, block, output_num_blocks, boundaries,
                            sort_key, aggs)


def _patched_agg_reduce(key, aggs, batch_format, *mapper_outputs,
                        partial_reduce=False):
    install()
    return _ORIG["agg_reduce"](key, aggs, batch_format, *mapper_outputs,
                               partial_reduce=partial_reduce)


def _install_aggregate_taskspec() -> bool:
    """Reroute ``SortAggregateTaskSpec.map/reduce`` through this module so
    the worker processes executing them run install() first (the accessor
    patches below are process-local)."""
    try:
        from ray.data._internal.planner.exchange.aggregate_task_spec import (
            SortAggregateTaskSpec)
    except Exception:
        return False
    if "agg_map" not in _ORIG:
        m = SortAggregateTaskSpec.__dict__["map"]
        _ORIG["agg_map"] = m.__func__ if isinstance(m, staticmethod) else m
    if "agg_reduce" not in _ORIG:
        r = SortAggregateTaskSpec.__dict__["reduce"]
        _ORIG["agg_reduce"] = r.__func__ if isinstance(r, staticmethod) \
            else r
    if getattr(SortAggregateTaskSpec, "_dggrid4py_ray_empty_patch", False):
        return True
    SortAggregateTaskSpec.map = staticmethod(_patched_agg_map)
    SortAggregateTaskSpec.reduce = staticmethod(_patched_agg_reduce)
    SortAggregateTaskSpec._dggrid4py_ray_empty_patch = True
    return True


def _install_typed_empty_aggregate() -> bool:
    """``ArrowBlockAccessor._aggregate`` and
    ``TableBlockAccessor._combine_aggregated_blocks`` both build their
    output row-by-row, so an all-empty (but TYPED) input yields a
    ZERO-COLUMN table and the aggregate's schema (keys + agg aliases) is
    lost.  Recover it:

    * map side: run the original aggregation on a 1-row all-null DUMMY
      with the input's schema, then slice to 0 rows — names and partial
      types come from the real machinery;
    * reduce side: synthesize one row from ``agg.init`` /
      ``agg.finalize`` for types, then slice to 0 rows.

    Any exception falls back to stock behavior (zero-column empty)."""
    try:
        import pyarrow as _pa
        from ray.data._internal.arrow_block import ArrowBlockAccessor
        from ray.data._internal.table_block import TableBlockAccessor
        from ray.data.block import BlockAccessor, BlockMetadataWithSchema
        from ray.data.block import BlockExecStats
    except Exception:
        return False

    def _zero_array(typ):
        """1-element TYPED array holding a zero-ish value — never a
        null-typed array (the row-based agg builders turn null inputs
        into null-TYPED outputs, which poison downstream joins worse
        than the zero-column blocks this patch exists to fix)."""
        try:
            return _pa.array([0]).cast(typ)
        except Exception:
            if _pa.types.is_string(typ) or _pa.types.is_large_string(typ):
                return _pa.array([""], typ)
            if _pa.types.is_boolean(typ):
                return _pa.array([False], typ)
            raise

    def _no_null_types(tab) -> bool:
        return all(not _pa.types.is_null(f.type) for f in tab.schema)

    if not getattr(ArrowBlockAccessor, "_dggrid4py_ray_agg_patch", False):
        orig_agg = ArrowBlockAccessor._aggregate

        def patched_aggregate(self, sort_key, aggs):
            t = self._table
            if t.num_rows == 0 and t.num_columns > 0:
                try:
                    dummy = _pa.table(
                        {f.name: _zero_array(f.type) for f in t.schema})
                    out = orig_agg(BlockAccessor.for_block(dummy),
                                   sort_key, aggs)
                    if _no_null_types(out):
                        return out.slice(0, 0)
                except Exception:
                    pass
            return orig_agg(self, sort_key, aggs)

        ArrowBlockAccessor._aggregate = patched_aggregate
        ArrowBlockAccessor._dggrid4py_ray_agg_patch = True

    if not getattr(TableBlockAccessor, "_dggrid4py_ray_combine_patch",
                   False):
        # NOTE: a CLASSMETHOD on TableBlockAccessor — grab it bound
        orig_combine = TableBlockAccessor._combine_aggregated_blocks

        def patched_combine(cls, blocks, sort_key, aggs, finalize=True):
            try:
                arrow = [b for b in blocks
                         if isinstance(b, _pa.Table)]
                total = sum(getattr(b, "num_rows", len(b)) for b in blocks)
                typed = next((b for b in arrow if b.num_columns > 0), None)
                if total == 0 and typed is not None \
                        and _no_null_types(typed):
                    # run the REAL merge/finalize machinery over one
                    # zero-valued dummy PARTIAL row, then 0-row slice —
                    # output names and types come from the machinery
                    dummy = _pa.table({f.name: _zero_array(f.type)
                                       for f in typed.schema})
                    ret, _m2 = orig_combine([dummy], sort_key, aggs,
                                            finalize=finalize)
                    if isinstance(ret, _pa.Table) and _no_null_types(ret):
                        ret = ret.slice(0, 0)
                        stats = BlockExecStats.builder()
                        return ret, BlockMetadataWithSchema.from_block(
                            ret, stats=stats.build())
            except Exception:
                pass
            return orig_combine(blocks, sort_key, aggs, finalize=finalize)

        TableBlockAccessor._combine_aggregated_blocks = classmethod(
            patched_combine)
        TableBlockAccessor._dggrid4py_ray_combine_patch = True
    return True


def _patched_shuffle_block_fn(block, input_index, key_columns, pool,
                              block_transformer=None,
                              send_empty_blocks=False,
                              override_partition_id=None):
    """Worker body replacing Ray's ``_shuffle_block`` remote fn.

    Stock Ray early-returns on 0-row blocks BEFORE the schema-broadcast
    step — so when the first shuffled block of an input sequence is
    empty, the aggregators never learn that sequence's schema, every
    partition builder stays zero-column, and downstream finalize (join /
    aggregate) emits schema-less tables or crashes ("No match ...
    FieldRef").  Here a TYPED empty block with ``send_empty_blocks=True``
    broadcasts its schema to every aggregator instead of being dropped."""
    install()
    import ray as _ray
    from ray.data._internal.execution.operators import hash_shuffle as _hs
    from ray.data.block import (BlockAccessor, BlockExecStats, BlockType)
    from ray.data._internal.table_block import TableBlockAccessor

    orig = _ORIG["shuffle_block"]
    if block_transformer is not None:
        block = block_transformer(block)
        block_transformer = None
    block = TableBlockAccessor.try_convert_block_type(
        block, block_type=BlockType.ARROW)
    nrows = BlockAccessor.for_block(block).num_rows()
    ncols = getattr(block, "num_columns", 0)
    if not (nrows == 0 and ncols > 0 and send_empty_blocks):
        return orig(block, input_index, key_columns, pool,
                    block_transformer=None,
                    send_empty_blocks=send_empty_blocks,
                    override_partition_id=override_partition_id)
    # typed empty + schema-broadcast requested: fan the schema out to
    # every aggregator (mirrors the stock submit loop)
    stats = BlockExecStats.builder()
    empty = _hs._create_empty_table(block.schema)
    pending = []
    for pid in range(pool.num_partitions):
        aggregator = pool.get_aggregator_for_partition(pid)
        ref = _ray.put(empty)
        pending.append(aggregator.submit.remote(input_index, pid, ref))
    while pending:
        _, pending = _ray.wait(pending, num_returns=len(pending),
                               timeout=1)
    meta = BlockAccessor.for_block(block).get_metadata(
        exec_stats=stats.build())
    return meta, {}


def _install_hash_shuffle_broadcast() -> bool:
    try:
        import ray as _ray
        from ray.data._internal.execution.operators import (
            hash_shuffle as _hs)
    except Exception:
        return False
    if getattr(_hs, "_dggrid4py_ray_empty_patch", False):
        return True
    rf = getattr(_hs, "_shuffle_block", None)
    fn = getattr(rf, "_function", None)
    if fn is None:
        return False
    _ORIG.setdefault("shuffle_block", fn)
    _hs._shuffle_block = _ray.remote(_patched_shuffle_block_fn)
    _hs._dggrid4py_ray_empty_patch = True
    return True


def _install_sort_taskspec() -> bool:
    """Reroute ``SortTaskSpec.map`` through this module so sort map tasks
    (remote, worker-side) run with the accessor patches installed."""
    try:
        from ray.data._internal.planner.exchange.sort_task_spec import (
            SortTaskSpec)
    except Exception:
        return False
    if "sort_map" not in _ORIG:
        m = SortTaskSpec.__dict__["map"]
        _ORIG["sort_map"] = m.__func__ if isinstance(m, staticmethod) else m
    if "sort_reduce" not in _ORIG:
        r = SortTaskSpec.__dict__["reduce"]
        _ORIG["sort_reduce"] = r.__func__ if isinstance(r, staticmethod) \
            else r
    if getattr(SortTaskSpec, "_dggrid4py_ray_empty_patch", False):
        return True
    SortTaskSpec.map = staticmethod(_patched_sort_map)
    SortTaskSpec.reduce = staticmethod(_patched_sort_reduce)
    SortTaskSpec._dggrid4py_ray_empty_patch = True
    return True


def _install_map_groups_empty() -> bool:
    """``_apply_udf_to_groups`` yields one UDF result per group, so an
    EMPTY (typed) block yields NOTHING and a ``map_groups`` over an empty
    dataset loses the UDF's output schema entirely.  Run the UDF once on
    the typed 0-row batch instead (exceptions → stock empty yield).

    Worker-side activation rides the same vector as every other patch
    here: the map_batches wrapper closures reference this module by
    value, so any worker executing a map task imports the package and
    runs install() before the group UDF is applied."""
    try:
        from ray.data import grouped_data as _gd
        from ray.data.block import BlockAccessor
    except Exception:
        return False
    if getattr(_gd, "_dggrid4py_ray_empty_patch", False):
        return True
    orig = _gd._apply_udf_to_groups

    def patched(udf, block, keys, batch_format, *args, **kwargs):
        acc = BlockAccessor.for_block(block)
        if acc.num_rows() == 0:
            ncols = getattr(block, "num_columns", None)
            if ncols is None:
                cols = getattr(block, "columns", None)
                ncols = len(cols) if cols is not None else 0
            if ncols > 0:
                try:
                    out = udf(acc.to_batch_format(batch_format),
                              *args, **kwargs)
                    if out is not None:
                        yield out
                except Exception:
                    pass
            return
        yield from orig(udf, block, keys, batch_format, *args, **kwargs)

    _gd._apply_udf_to_groups = patched
    _gd._dggrid4py_ray_empty_patch = True
    return True


def _install_typed_repartition_padding() -> bool:
    """``SplitRepartitionTaskScheduler.execute`` pads its output to
    ``output_num_blocks`` with ``ArrowBlockBuilder().build()`` — ZERO-
    COLUMN blocks — even when the real output schema is known.  Wrap it
    (driver-side) and rebuild any schema-less empty output bundle as a
    typed empty using the schema of any other output/input bundle."""
    try:
        import pandas as _pd
        import pyarrow as _pa
        import ray as _ray
        from ray.data._internal.execution.interfaces import RefBundle
        from ray.data._internal.pandas_block import PandasBlockSchema
        from ray.data._internal.planner.exchange import (
            split_repartition_task_scheduler as _srts)
        from ray.data.block import BlockAccessor
    except Exception:
        return False
    cls = _srts.SplitRepartitionTaskScheduler
    if getattr(cls, "_dggrid4py_ray_empty_patch", False):
        return True
    orig_exec = cls.execute

    def _bundle_schema(b):
        s = getattr(b, "schema", None)
        if isinstance(s, _pa.Schema) and len(s.names) > 0:
            return s
        if isinstance(s, PandasBlockSchema) and len(s.names) > 0:
            return s
        return None

    def _typed_empty_block(schema):
        if isinstance(schema, _pa.Schema):
            return schema.empty_table()
        return _pd.DataFrame({n: _pd.Series(dtype=t)
                              for n, t in zip(schema.names, schema.types)})

    def patched_execute(self, refs, output_num_blocks, ctx,
                        map_ray_remote_args=None,
                        reduce_ray_remote_args=None):
        out, stats = orig_exec(
            self, refs, output_num_blocks, ctx,
            map_ray_remote_args=map_ray_remote_args,
            reduce_ray_remote_args=reduce_ray_remote_args)
        try:
            schema = None
            for b in list(out) + list(refs):
                schema = _bundle_schema(b)
                if schema is not None:
                    break
            if schema is None:
                return out, stats
            typed_empty = _typed_empty_block(schema)
            meta = BlockAccessor.for_block(typed_empty).get_metadata()
            fixed = []
            changed = False
            for b in out:
                if (b.num_rows() == 0 and _bundle_schema(b) is None):
                    fixed.append(RefBundle(
                        [(_ray.put(typed_empty), meta)],
                        owns_blocks=True, schema=schema))
                    changed = True
                else:
                    fixed.append(b)
            return (fixed if changed else out), stats
        except Exception:
            return out, stats

    cls.execute = patched_execute
    cls._dggrid4py_ray_empty_patch = True
    return True


def _install_to_pandas_schema() -> bool:
    """``Dataset.to_pandas()`` of an empty dataset returns a DataFrame
    with NO columns (empty blocks are skipped during iteration), so any
    driver-side ``df["col"]`` on a legitimately-empty result raises
    KeyError.  With the block patches above the schema IS known — return
    a typed empty frame instead."""
    try:
        import pyarrow as _pa
        import ray.data as _rd
    except Exception:
        return False
    if getattr(_rd.Dataset, "_dggrid4py_ray_empty_patch", False):
        return True
    orig = _rd.Dataset.to_pandas

    def patched(self, *args, **kwargs):
        df = orig(self, *args, **kwargs)
        if len(df) == 0 and len(df.columns) == 0:
            try:
                sch = self.schema(fetch_if_missing=True)
                base = getattr(sch, "base_schema", None)
                if isinstance(base, _pa.Schema) and len(base.names) > 0:
                    return base.empty_table().to_pandas()
                if sch is not None and getattr(sch, "names", None):
                    import pandas as _pd
                    return _pd.DataFrame(
                        {n: _pd.Series(dtype=object) for n in sch.names})
            except Exception:
                pass
        return df

    _rd.Dataset.to_pandas = patched
    _rd.Dataset._dggrid4py_ray_empty_patch = True
    return True


def install() -> bool:
    try:
        from ray.data._internal.planner import plan_udf_map_op as _m
    except Exception:
        return False
    if not _install_typed_empty_batch():
        return False
    if not _install_typed_sort_partitions():
        return False
    if not _install_sort_taskspec():
        return False
    if not _install_hash_shuffle_broadcast():
        return False
    if not _install_aggregate_taskspec():
        return False
    if not _install_typed_empty_aggregate():
        return False
    if not _install_typed_repartition_padding():
        return False
    if not _install_map_groups_empty():
        return False
    if not _install_to_pandas_schema():
        return False
    if getattr(_m, "_dggrid4py_ray_empty_patch", False):
        return True
    orig = getattr(_m, "_generate_transform_fn_for_map_batches", None)
    if orig is None or not hasattr(_m, "_validate_batch_output"):
        return False

    def patched(fn):
        if _m._is_async_udf(fn):
            return orig(fn)
        base = orig(fn)

        def wrapper(batches, ctx):
            for batch in batches:
                if _batch_is_typed_empty(batch):
                    try:
                        res = fn(batch)
                        outs = list(res) if isinstance(res, GeneratorType) \
                            else [res]
                        for out in outs:
                            _m._validate_batch_output(out)
                    except Exception:
                        yield batch          # stock passthrough fallback
                    else:
                        yield from outs
                else:
                    # stock path, one batch at a time (keeps order and
                    # Ray's own error handling exactly)
                    yield from base(iter([batch]), ctx)

        return wrapper

    _m._generate_transform_fn_for_map_batches = patched
    _m._dggrid4py_ray_empty_patch = True
    return True
