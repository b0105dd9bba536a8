"""Plan executor.

Reference analogue: the Acero push-based engine (acero/exec_plan.h:54,
source_node.cc morsels, task scheduler). TPU re-architecture (SURVEY §7
stage 4): a plan is a tree of Declarations compiled into a few jitted
device stages over whole DeviceBatches. There is no push dataflow, no task
scheduler, no backpressure — XLA schedules the fused stage; host sync
happens only where output capacity is data-dependent (join materialize)
and at the final download.

Each node is a pure function DeviceBatch -> DeviceBatch. Single-input chains
are composed into ONE jitted stage so XLA fuses filter+project+aggregate
end-to-end (the morsel pipeline P1/P2 of SURVEY §2.9 collapses into
compiler-scheduled fusion on a single chip).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence

import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import types as T
from ..array.array import array as make_array
from ..compute import join as J
from ..compute.grouper import (group_capacity_bound, group_ids,
                               group_slot_bound_exact)
from ..compute.registry import ArrowInvalid, ExecContext, get_function
from ..compute.selection import filter_batch
from ..device.column import (BLOCK, DeviceBatch, DeviceColumn,
                             capacity_class, download_table, round_up,
                             upload_table)
from ..table import RecordBatch, Table
from ..types import Field, Schema
from .expression import Expression
from .options import AggregateNodeOptions, FetchNodeOptions, FilterNodeOptions, HashJoinNodeOptions, OrderByNodeOptions, ProjectNodeOptions

_JIT_CACHE: Dict[tuple, Callable] = {}


def _bloom_mode() -> str:
    """ARROW_TPU_BLOOM = auto (default: probe >= 4x build) | always |
    never."""
    import os
    return os.environ.get("ARROW_TPU_BLOOM", "auto")


class PlanMetrics:
    """Per-node observability (reference: ExecPlan::ToString + OTel spans,
    SURVEY §5). Records dispatch wall time per node of the most recent
    execute_declaration call; device execution is asynchronous, so node
    times measure graph dispatch and any host sync the node performs."""

    def __init__(self):
        self.nodes: List[tuple] = []

    def record(self, factory: str, seconds: float):
        self.nodes.append((factory, seconds))

    def reset(self):
        self.nodes = []

    def to_string(self) -> str:
        return "\n".join(f"{f}: {s * 1000:.2f} ms dispatch"
                          for f, s in self.nodes)


last_plan_metrics = PlanMetrics()


# --- speculative capacity classes -------------------------------------------
# (reference analogue: none — adaptive requery is a TPU-architecture
# consequence: data-dependent output sizes must resolve to static
# capacity classes before the next program dispatches, and on a
# tunneled device that mid-plan sync costs a full RTT)

_SPEC = {"depth": 0, "checks": [], "caps": {}, "uniq": {}, "uchecks": []}


def _spec_enabled() -> bool:
    return os.environ.get("ARROW_TPU_SPECULATIVE_CAPS", "off") == "on"


def _spec_cap(key: tuple, owner, total_dev, extra_dev=None):
    """Capacity class for a data-dependent output size.

    Returns (cap, total_int_or_None). Inside an active speculation
    scope with a cached class for this node, the guess is used WITHOUT
    reading the count back; the (count, cap) pair is queued for the
    end-of-plan verification. Otherwise: synchronous readback (today's
    behavior) and the class is remembered. `owner` anchors the id()-
    keyed entry against id recycling via a weakref."""
    import weakref
    if _SPEC["depth"] > 0:
        hit = _SPEC["caps"].get(key)
        if hit is not None:
            ref, cap = hit
            if ref() is owner:
                _SPEC["checks"].append((total_dev, extra_dev, cap, key))
                return cap, None
    total = int(total_dev)
    extra = int(extra_dev) if extra_dev is not None else 0
    cap = capacity_class(max(total + extra, 1))
    try:
        _SPEC["caps"][key] = (weakref.ref(owner), cap)
    except TypeError:
        pass
    return cap, total


def _spec_verify():
    """End-of-plan verification of every speculated capacity; returns
    the keys whose counts exceeded their class (evicted)."""
    import numpy as _vnp
    bad = []
    for total_dev, extra_dev, cap, key in _SPEC["checks"]:
        n = int(_vnp.asarray(total_dev))
        if extra_dev is not None:
            n += int(_vnp.asarray(extra_dev))
        if n > cap:
            bad.append(key)
            _SPEC["caps"].pop(key, None)
    # speculated unique-build joins: the PK-join materialize is only
    # CORRECT when max(counts) <= 1 held this execution too — a
    # violated guess is a wrong answer, not just a truncation, so it
    # verifies exactly like capacities and forces a re-execution
    for max_c_dev, key in _SPEC["uchecks"]:
        if int(_vnp.asarray(max_c_dev)) > 1:
            bad.append(key)
            _SPEC["uniq"].pop(key, None)
    return bad


def _cached_jit(key: tuple, make_fn: Callable, **jit_kwargs) -> Callable:
    fn = _JIT_CACHE.get(key)
    if fn is None:
        fn = _JIT_CACHE[key] = jax.jit(make_fn(), **jit_kwargs)
    return fn


# --- dictionary utilities (host-side; dictionaries are host metadata) ------

def unify_dictionaries(cols: Sequence[DeviceColumn]) -> List[DeviceColumn]:
    """Re-encode dictionary-coded columns against their union dictionary so
    codes are directly comparable (reference precedent:
    acero/hash_join_dict.cc re-encodes dictionary join keys)."""
    if all(c.dictionary is None for c in cols):
        return list(cols)
    union_vals: List = []
    memo: Dict = {}
    per_col_maps = []
    for c in cols:
        vals = c.dictionary.to_pylist()
        mapping = np.empty(max(len(vals), 1), dtype=np.int64)
        for i, v in enumerate(vals):
            j = memo.get(v)
            if j is None:
                j = memo[v] = len(union_vals)
                union_vals.append(v)
            mapping[i] = j
        per_col_maps.append(mapping)
    union_arr = make_array(union_vals, cols[0].dictionary.type)
    out = []
    for c, mapping in zip(cols, per_col_maps):
        codes = jnp.asarray(mapping)[c.values.astype(jnp.int64)]
        out.append(DeviceColumn(codes.astype(jnp.int32), c.validity,
                                c.type, union_arr))
    return out


def _dict_remap_table(old_dict, union_dict) -> np.ndarray:
    """old-code -> union-code remap table (host metadata step)."""
    pos = {v: i for i, v in enumerate(union_dict.to_pylist())}
    ovals = old_dict.to_pylist()
    out = np.zeros(max(len(ovals), 1), dtype=np.int64)
    for i, v in enumerate(ovals):
        out[i] = pos[v]
    return out


def _plan_unify(ldict, rdict, value_type):
    """Host-only union-dictionary planning: (union Array, lmap, rmap)
    remap tables — no device compute (the remaps apply INSIDE the fused
    join program; reference precedent acero/hash_join_dict.cc)."""
    union_vals: List = []
    memo: Dict = {}

    def add(vals):
        mapping = np.empty(max(len(vals), 1), dtype=np.int32)
        for i, v in enumerate(vals):
            j = memo.get(v)
            if j is None:
                j = memo[v] = len(union_vals)
                union_vals.append(v)
            mapping[i] = j
        return mapping

    lmap = add(ldict.to_pylist() if ldict is not None else [])
    rmap = add(rdict.to_pylist() if rdict is not None else [])
    src = ldict if ldict is not None else rdict
    union_arr = make_array(union_vals, src.type)
    return union_arr, lmap, rmap


# --- node implementations --------------------------------------------------

def _apply_fns(fns, batch):
    for f in fns:
        batch = f(batch)
    return batch


def _collect_pre_chain(decl):
    """Trailing run of filter/project nodes above a join input, in
    execution order, plus the node below them. Disabled when fusion is
    off (ARROW_TPU_FUSE=off -> per-node programs for debugging)."""
    if _fuse_mode() == "off":
        return (), decl
    chain = []
    cur = decl
    while cur.factory_name in ("filter", "project"):
        chain.append(cur)
        cur = cur.inputs[0]
    chain.reverse()
    return tuple(chain), cur


def _node_filter(options: FilterNodeOptions, schema: Schema):
    expr = options.filter_expression

    def fn(batch: DeviceBatch) -> DeviceBatch:
        ctx = ExecContext(batch.capacity, batch.row_count)
        mask = expr.evaluate(batch, ctx)
        return filter_batch(batch, mask)

    return fn, schema


def _node_project(options: ProjectNodeOptions, schema: Schema):
    exprs = options.expressions
    names = options.names or [repr(e) if e.kind != Expression.KIND_FIELD
                              else e.name for e in exprs]

    def fn(batch: DeviceBatch) -> DeviceBatch:
        ctx = ExecContext(batch.capacity, batch.row_count)
        cols = []
        for e in exprs:
            c = e.evaluate(batch, ctx)
            if not isinstance(c, DeviceColumn):
                # broadcast literal
                v = jnp.full(batch.capacity, c)
                from ..types import from_numpy_dtype
                c = DeviceColumn(v, None, from_numpy_dtype(
                    np.asarray(c).dtype))
            cols.append(c)
        out_schema = Schema([Field(n, c.type) for n, c in zip(names, cols)])
        return DeviceBatch(out_schema, cols, batch.row_count)

    # output schema resolved lazily on first batch (expression types are
    # data-driven); we return None and let the executor read batch.schema
    return fn, None


_SCALAR_AGG_0ARY = {"count_all"}


def _node_aggregate(options: AggregateNodeOptions, schema: Schema,
                    pre_mask_expr=None):
    # segmented aggregation folds segment keys into grouping keys; the
    # executor adds the segment-order sort after this node
    if getattr(options, "segment_keys", None):
        options = AggregateNodeOptions(
            [(t, f, o, n) for (t, f, o, n) in options.aggregates],
            keys=list(options.segment_keys) + list(options.keys))
    return _node_aggregate_inner(options, schema, pre_mask_expr)


def _node_aggregate_inner(options: AggregateNodeOptions, schema: Schema,
                          pre_mask_expr=None):
    """pre_mask_expr: a filter predicate fused INTO the aggregation
    (planner rewrite): instead of physically compacting filtered rows, the
    mask simply joins the aggregation's row mask — one pass, no data
    movement."""
    aggs = options.aggregates
    keys = options.keys

    def _ctx(batch):
        ctx = ExecContext(batch.capacity, batch.row_count)
        if pre_mask_expr is not None:
            from ..compute.selection import selection_mask
            mask_col = pre_mask_expr.evaluate(batch, ctx)
            keep, _ = selection_mask(ctx, mask_col)
            masked = ExecContext(batch.capacity, batch.row_count)
            masked.row_mask_ = keep
            return masked
        return ctx

    if keys:
        def fn(batch: DeviceBatch) -> DeviceBatch:
            ctx = _ctx(batch)
            key_cols = [batch.column(k) for k in keys]
            g = group_ids(ctx, key_cols)
            cap = batch.capacity
            out_cols, out_fields = [], []
            # keys first (reference output order, groupby_aggregate_node.cc)
            rep_bound = group_slot_bound_exact(key_cols, cap)
            safe_rep = jnp.where(
                jnp.arange(rep_bound, dtype=jnp.int64) < g.num_groups,
                g.rep_indices[:rep_bound], 0)
            # ONE shared sort-based gather for all key columns (plain
            # element gathers lower quadratically on TPU — move.py)
            from ..compute.selection import gather_columns
            rep_cols = gather_columns(key_cols, safe_rep)
            for k, rc in zip(keys, rep_cols):
                out_cols.append(rc)
                out_fields.append(Field(k, rc.type))
            bound_static = group_slot_bound_exact(key_cols, cap)
            for target, fname, opts, out_name in aggs:
                dev_name = fname if fname.startswith("hash_") \
                    else "hash_" + fname
                impl = get_function(dev_name).impl
                kw = dict(opts)
                import inspect as _inspect
                if "num_segments" in _inspect.signature(impl).parameters:
                    kw["num_segments"] = bound_static
                if fname.replace("hash_", "") == "count_all":
                    r = impl(ctx, g.group_ids, g.num_groups, **kw)
                else:
                    tcol = batch.column(target if isinstance(target, str)
                                        else target[0])
                    r = impl(ctx, tcol, g.group_ids, g.num_groups, **kw)
                if isinstance(r, dict):  # min_max style struct output
                    for sub, rr in r.items():
                        out_cols.append(rr.column)
                        out_fields.append(Field(f"{out_name}_{sub}",
                                                rr.column.type))
                else:
                    out_cols.append(r.column)
                    out_fields.append(Field(out_name, r.column.type))
            # unify capacities: key/agg outputs are exact-bound sized;
            # pad up to a block multiple so downstream shapes stay aligned
            bound = group_capacity_bound(key_cols, cap)
            uniform = []
            for c in out_cols:
                vals, validity = c.values, c.validity
                n_have = vals.shape[0]
                if n_have > bound:
                    vals = vals[:bound]
                    validity = validity[:bound] if validity is not None \
                        else None
                elif n_have < bound:
                    pad = bound - n_have
                    vals = jnp.concatenate(
                        [vals, jnp.zeros(pad, vals.dtype)])
                    if validity is not None:
                        validity = jnp.concatenate(
                            [validity, jnp.zeros(pad, jnp.bool_)])
                uniform.append(DeviceColumn(vals, validity, c.type,
                                            c.dictionary))
            return DeviceBatch(Schema(out_fields), uniform,
                               g.num_groups.astype(jnp.int32))
        return fn, None

    def fn(batch: DeviceBatch) -> DeviceBatch:
        ctx = _ctx(batch)
        out_cols, out_fields = [], []
        for target, fname, opts, out_name in aggs:
            impl = get_function(fname).impl
            if fname in _SCALAR_AGG_0ARY:
                tcol = batch.columns[0]
            else:
                tcol = batch.column(target if isinstance(target, str)
                                    else target[0])
            r = impl(ctx, tcol, **opts)
            vals = r.value if isinstance(r.value, tuple) else (r.value,)
            valid = r.valid if isinstance(r.valid, tuple) else (r.valid,)
            names = ([f"{out_name}_{f}" for f in r.fields]
                     if r.fields else [out_name])
            for nm, v, ok in zip(names, vals, valid):
                col_v = jnp.zeros(BLOCK, jnp.asarray(v).dtype).at[0].set(v)
                col_m = jnp.zeros(BLOCK, jnp.bool_).at[0].set(ok)
                t = r.type if not r.fields else (
                    r.type.fields[0].type if r.fields else r.type)
                out_cols.append(DeviceColumn(col_v, col_m, t))
                out_fields.append(Field(nm, t))
        return DeviceBatch(Schema(out_fields), out_cols,
                           jnp.asarray(1, jnp.int32))
    return fn, None


_TOPK_MAX = 1024


def _make_topk_fn(options: OrderByNodeOptions, offset: int, count: int):
    """Fused order_by+fetch(k) as a TOP-K program (reference:
    vector_select_k.cc): ONE sort carrying ONLY the row index, a static
    k-slice, then direct k-row gathers of every column. The naive
    order_by carries ALL columns as sort payloads — at 16 columns x 6M
    rows that multi-operand sort is exactly the program shape the
    tunneled remote compiler wedges on (docs/TUNNEL.md), and it moves
    the whole table to keep k rows."""
    names = [k for k, _ in options.sort_keys]
    orders = [o for _, o in options.sort_keys]
    placement = options.null_placement

    def fn(batch: DeviceBatch) -> DeviceBatch:
        from ..compute.keys import sort_key_arrays
        from ..compute.move import sort_with_payload
        ctx = ExecContext(batch.capacity, batch.row_count)
        cols = []
        for n in names:
            c = batch.column(n)
            if c.dictionary is not None:
                c = _rank_col(c)
            cols.append(c)
        keys = sort_key_arrays(cols, orders, placement, ctx.row_mask())
        idx = jnp.arange(batch.capacity, dtype=jnp.int32)
        (sidx,) = sort_with_payload(keys, [idx])
        take = sidx[offset:offset + count]
        out_cols = []
        for c in batch.columns:
            v = c.values[take]
            val = c.validity[take] if c.validity is not None else None
            out_cols.append(DeviceColumn(v, val, c.type, c.dictionary))
        new_count = jnp.clip(batch.row_count - offset, 0, count)
        return DeviceBatch(batch.schema, out_cols,
                           new_count.astype(jnp.int32))
    return fn


def _node_order_by(options: OrderByNodeOptions, schema: Schema):
    names = [k for k, _ in options.sort_keys]
    orders = [o for _, o in options.sort_keys]
    placement = options.null_placement

    def fn(batch: DeviceBatch) -> DeviceBatch:
        from ..compute.keys import sort_key_arrays
        from ..compute.move import sort_with_payload
        ctx = ExecContext(batch.capacity, batch.row_count)
        cols = []
        for n in names:
            c = batch.column(n)
            if c.dictionary is not None:
                c = _rank_col(c)
            cols.append(c)
        keys = sort_key_arrays(cols, orders, placement, ctx.row_mask())
        # carry every buffer through the ONE sort (element gathers are
        # quadratic on TPU; payload sorts are linear — compute/move.py)
        arrays, spec = [], []
        for c in batch.columns:
            arrays.append(c.values)
            has_v = c.validity is not None
            if has_v:
                arrays.append(c.validity)
            spec.append(has_v)
        outs = sort_with_payload(keys, arrays)
        out_cols, i = [], 0
        for c, has_v in zip(batch.columns, spec):
            vals = outs[i]; i += 1
            validity = None
            if has_v:
                validity = outs[i]; i += 1
            out_cols.append(DeviceColumn(vals, validity, c.type,
                                         c.dictionary))
        return DeviceBatch(batch.schema, out_cols, batch.row_count)

    return fn, schema


def _rank_col(c: DeviceColumn) -> DeviceColumn:
    vals = c.dictionary.to_pylist()
    if not vals:
        # empty dictionary (0-row batch): every slot is padding — any
        # constant key sorts it correctly
        return DeviceColumn(jnp.zeros(c.capacity, jnp.int64),
                            c.validity, T.int64())
    order = np.argsort(np.array(vals, dtype=object), kind="stable")
    ranks = np.empty(len(vals), dtype=np.int64)
    ranks[order] = np.arange(len(vals))
    safe = jnp.clip(c.values.astype(jnp.int64), 0, len(vals) - 1)
    new_vals = jnp.asarray(ranks)[safe]
    return DeviceColumn(new_vals, c.validity, T.int64())


def _node_fetch(options: FetchNodeOptions, schema: Schema):
    offset, count = options.offset, options.count

    def fn(batch: DeviceBatch) -> DeviceBatch:
        remaining = jnp.maximum(batch.row_count - offset, 0)
        new_count = remaining if count < 0 else \
            jnp.minimum(remaining, count)
        cols = []
        for c in batch.columns:
            # static-shift roll is linear on TPU (slice + concat)
            vals = jnp.roll(c.values, -offset) if offset else c.values
            validity = (jnp.roll(c.validity, -offset)
                        if (c.validity is not None and offset)
                        else c.validity)
            cols.append(DeviceColumn(vals, validity, c.type, c.dictionary))
        return DeviceBatch(batch.schema, cols,
                           new_count.astype(jnp.int32))

    return fn, schema


def _union_cols(cols: List[DeviceColumn], total_cap: int):
    vals = jnp.concatenate([c.values for c in cols])
    if any(c.validity is not None for c in cols):
        parts = [c.validity if c.validity is not None
                 else jnp.ones(c.capacity, jnp.bool_) for c in cols]
        validity = jnp.concatenate(parts)
    else:
        validity = None
    return vals, validity


# --- declaration + executor ------------------------------------------------

class Declaration:
    """Declarative plan node (reference: acero/exec_plan.h:400)."""

    def __init__(self, factory_name: str, options=None, inputs=()):
        self.factory_name = factory_name
        self.options = options
        self.inputs = list(inputs)

    @staticmethod
    def from_sequence(decls: Sequence["Declaration"]) -> "Declaration":
        it = iter(decls)
        current = next(it)
        for d in it:
            d = Declaration(d.factory_name, d.options,
                            d.inputs + [current] if d.inputs
                            else [current])
            current = d
        return current

    def to_table(self, use_threads: bool = True,
                 chunk_rows: int = None, distributed: bool = False,
                 mesh=None, query_options=None) -> Table:
        # speculative capacity classes (ARROW_TPU_SPECULATIVE_CAPS=on):
        # repeat executions reuse each join's last output-capacity class
        # instead of synchronously reading the match count mid-plan —
        # on the tunneled chip every such sync is a ~27 ms RTT. All
        # speculated counts verify HERE, at the end-of-plan sync the
        # result readback already pays; an exceeded capacity (the
        # output silently truncates to its class) invalidates that
        # node's cache and re-executes the whole plan — correctness
        # never depends on the guess.
        if _spec_enabled() and _SPEC["depth"] == 0:
            _SPEC["depth"] = 1
            try:
                out = None
                for _attempt in range(3):
                    _SPEC["checks"] = []
                    _SPEC["uchecks"] = []
                    out = self.to_table(use_threads=use_threads,
                                        chunk_rows=chunk_rows,
                                        distributed=distributed,
                                        mesh=mesh,
                                        query_options=query_options)
                    bad = _spec_verify()
                    if not bad:
                        return out
                    import warnings
                    warnings.warn(
                        f"speculative capacity exceeded on {len(bad)} "
                        "node(s); re-executing with fresh counts",
                        stacklevel=2)
                return out
            finally:
                _SPEC["depth"] = 0
                _SPEC["checks"] = []
                _SPEC["uchecks"] = []
        # query_options: per-query resource controls + metrics
        # (QueryOptions, acero/query_context.py; reference
        # exec_plan.h:510 / query_context.h:36)
        if query_options is not None:
            from .query_context import QueryContext, query_scope
            qc = QueryContext(query_options)
            with query_scope(qc):
                out = self.to_table(use_threads=use_threads,
                                    chunk_rows=chunk_rows,
                                    distributed=distributed, mesh=mesh)
            self.last_query_context = qc
            if os.environ.get("ARROW_TPU_OTEL_EXPORT"):
                from ..utils.otel import export_query
                export_query(qc, plan_name=self.factory_name)
            return out
        # column-pruning rewrite (prune.py): narrows hashjoin output
        # projections / sources / projects to what the plan above needs.
        # Cached on the root so repeated to_table() calls reuse the same
        # pruned options objects (keeps upload + jit caches warm).
        from .prune import prune_enabled, prune_plan
        if prune_enabled() and getattr(self, "_pruned_plan", None) is None \
                and any(d.factory_name == "hashjoin"
                        for d in _walk_decls(self)):
            p = prune_plan(self)
            p._pruned_plan = p  # sentinel: already pruned
            self._pruned_plan = p
        pruned = getattr(self, "_pruned_plan", None)
        if pruned is not None and pruned is not self:
            return pruned.to_table(use_threads=use_threads,
                                   chunk_rows=chunk_rows,
                                   distributed=distributed, mesh=mesh)
        from .host_agg import HOST_AGGS, maybe_host_aggregate
        if self.factory_name == "aggregate" and any(
                (a[1][5:] if a[1].startswith("hash_") else a[1])
                in HOST_AGGS for a in self.options.aggregates):
            return maybe_host_aggregate(self)
        # distributed: run the plan across a device mesh (dist_exec.py);
        # unsupported shapes fall through to single-device execution
        if distributed or mesh is not None:
            from .dist_exec import maybe_execute_distributed
            out = maybe_execute_distributed(self, mesh)
            if out is not None:
                return out
        # chunked (streaming) execution bounds device memory at
        # O(chunk + carry state) — the morsel analogue (acero/chunked.py)
        from . import chunked as _chunked
        from .chunked import chunk_rows_env, maybe_execute_chunked
        cr = chunk_rows if chunk_rows is not None else chunk_rows_env()
        if cr:
            try:
                out = maybe_execute_chunked(self, cr)
            except ArrowInvalid as e:
                if "host tier" not in str(e):
                    raise
                out = None
            if out is not None:
                return out
            reason = _chunked.LAST_FALLBACK_REASON
            if reason is not None:
                # chunking was requested but this plan shape can't
                # stream: the memory-boundedness guarantee is gone for
                # this query — say so (or refuse, with the knob)
                rows = _plan_source_rows(self)
                msg = (f"chunked execution unavailable ({reason}); "
                       f"falling back to whole-table upload"
                       + (f" of {rows} rows" if rows else ""))
                if os.environ.get("ARROW_TPU_REQUIRE_CHUNKED") == "1":
                    raise ArrowInvalid(msg)
                import warnings
                warnings.warn(msg, stacklevel=2)
        try:
            batch = execute_declaration(self)
        except ArrowInvalid as e:
            # trace-time signal from decode_numeric_dict: the aggregate's
            # target column is code-valued (wide decimal / nested) — rerun
            # the aggregation exactly on the host tier
            if self.factory_name == "aggregate" and "host tier" in str(e):
                return maybe_host_aggregate(self, force=True)
            raise
        return download_table(batch)

    def to_batches(self) -> List[RecordBatch]:
        return self.to_table().to_batches()

    def to_reader(self, chunk_rows: int = None):
        """Streaming results (reference: DeclarationToReader,
        exec_plan.cc:780 family). Terminal-free linear plans yield one
        batch per device chunk AS COMPUTED — results stream while the
        plan still runs; terminal shapes (aggregate/sort) materialize
        then iterate."""
        from .chunked import chunk_rows_env, stream_batches
        cr = chunk_rows if chunk_rows is not None \
            else (chunk_rows_env() or 1 << 18)
        gen = stream_batches(self, cr)
        if gen is not None:
            return gen
        return iter(self.to_batches())

    def __repr__(self):
        return f"Declaration({self.factory_name})"


def _walk_decls(decl: Declaration):
    yield decl
    for i in decl.inputs:
        yield from _walk_decls(i)


def _plan_source_rows(decl: Declaration) -> int:
    rows = 0
    for d in _walk_decls(decl):
        tbl = getattr(d.options, "table", None)
        if tbl is not None:
            try:
                rows += tbl.num_rows
            except Exception:  # noqa: BLE001
                pass
    return rows


def _config_key(decl: Declaration) -> str:
    o = decl.options
    if isinstance(o, FilterNodeOptions):
        return repr(o.filter_expression)
    if isinstance(o, ProjectNodeOptions):
        return repr((o.names, [repr(e) for e in o.expressions]))
    if isinstance(o, AggregateNodeOptions):
        return repr((o.aggregates, o.keys))
    if isinstance(o, OrderByNodeOptions):
        return repr((o.sort_keys, o.null_placement))
    if isinstance(o, FetchNodeOptions):
        return repr((o.offset, o.count))
    return repr(o.__dict__ if o is not None else None)


_CHAINABLE = {
    "filter": _node_filter,
    "project": _node_project,
    "aggregate": _node_aggregate,
    "order_by": _node_order_by,
    "fetch": _node_fetch,
}


def execute_declaration(decl: Declaration,
                        _root: bool = True) -> DeviceBatch:
    """Recursively execute with per-node dispatch metrics, cooperative
    cancellation polls, and profiler trace annotations."""
    import time as _time

    from ..cancel import default_stop_token
    if _root:
        last_plan_metrics.reset()
    default_stop_token().poll()
    t0 = _time.perf_counter()
    with jax.profiler.TraceAnnotation(f"arrow_tpu::{decl.factory_name}"):
        out = _execute_node(decl)
    # per-query resource accounting (query_context.py): capacity-based
    # byte tracking + optional budget enforcement per node output
    from .query_context import current_query_context
    qc = current_query_context()
    if qc is not None:
        qc.stop_token.poll()
        nbytes = qc.track_batch(decl.factory_name, out)
        qc.record_node(decl.factory_name,
                       _time.perf_counter() - t0, nbytes)
    if _sync_nodes():
        # On the tunneled axon TPU platform, deep queues of per-node
        # executables can deadlock the transfer relay (observed: Q3's
        # ~10 queued programs wedge the device while each program's cost
        # analysis is linear and sub-millisecond). Bounding the in-flight
        # depth to one program sidesteps it; on cpu/tpu-direct the async
        # pipeline stays on.
        jax.block_until_ready(jax.tree_util.tree_leaves(out))
    last_plan_metrics.record(decl.factory_name,
                             _time.perf_counter() - t0)
    return out


_SYNC_NODES = None


def _sync_nodes() -> bool:
    global _SYNC_NODES
    mode = os.environ.get("ARROW_TPU_SYNC_NODES", "auto")
    if mode == "on":
        return True
    if mode == "off":
        return False
    if _SYNC_NODES is None:
        try:
            _SYNC_NODES = jax.devices()[0].platform == "tpu" and \
                "axon" in os.environ.get("JAX_PLATFORMS", "")
        except Exception:
            _SYNC_NODES = False
    return _SYNC_NODES


def _execute_node(decl: Declaration) -> DeviceBatch:
    if decl.factory_name in ("table_source", "named_table"):
        # cache the uploaded DeviceBatch on the options object: repeated
        # plan executions then reuse identity-stable dictionaries, so the
        # per-node jit caches stay warm. Without this every to_table()
        # re-uploads, mints new dictionary objects, changes the cache
        # keys, and RECOMPILES every stage — ~100 ms per stage on CPU but
        # 60-90 s per stage through the remote TPU compiler.
        cached = getattr(decl.options, "_device_batch", None)
        if cached is None:
            cached = upload_table(decl.options.table)
            decl.options._device_batch = cached
        return cached
    if decl.factory_name in ("source", "record_batch_source",
                             "exec_batch_source", "array_vector_source",
                             "scan"):
        return upload_table(decl.options.table)
    if decl.factory_name == "record_batch_reader_source":
        # drain the reader into one device batch (source_node.cc:579-586
        # registers the same family of source factories)
        reader = decl.options.reader
        batches = list(reader)
        tbl = Table.from_batches(batches, batches[0].schema
                                 if batches else decl.options.schema)
        return upload_table(tbl)

    if decl.factory_name == "hashjoin":
        # fuse each side's trailing filter/project chain INTO the join's
        # prepare+plan program instead of running them as separate
        # programs (VERDICT round-1 #3: fewer dispatches per join plan)
        left_pre, lsrc = _collect_pre_chain(decl.inputs[0])
        right_pre, rsrc = _collect_pre_chain(decl.inputs[1])
        left = execute_declaration(lsrc, _root=False)
        right = execute_declaration(rsrc, _root=False)
        return _execute_hashjoin(decl.options, left, right,
                                 left_pre, right_pre)

    if decl.factory_name == "union":
        batches = [execute_declaration(i, _root=False) for i in decl.inputs]
        return _execute_union(batches)

    if decl.factory_name == "asofjoin":
        left = execute_declaration(decl.inputs[0], _root=False)
        right = execute_declaration(decl.inputs[1], _root=False)
        return _execute_asof_join(decl.options, left, right)

    if decl.factory_name == "pivot_longer":
        inner = execute_declaration(decl.inputs[0], _root=False)
        return upload_table(_pivot_longer_host(decl.options,
                                               download_table(inner)))

    if decl.factory_name == "sorted_merge":
        batches = [execute_declaration(i, _root=False) for i in decl.inputs]
        return _execute_sorted_merge(decl.options, batches)

    if decl.factory_name == "aggregate" and \
            getattr(decl.options, "segment_keys", None):
        inner = execute_declaration(decl.inputs[0], _root=False)
        fn, _ = _node_aggregate(decl.options, None)
        key = ("seg_agg", _config_key(decl), _dict_ids(inner))
        out = _cached_jit(key, lambda: fn)(inner)
        sort_fn, _ = _node_order_by(OrderByNodeOptions(
            [(k, "ascending") for k in decl.options.segment_keys]), None)
        return jax.jit(sort_fn)(out)

    if decl.factory_name in _CHAINABLE:
        # Collect the maximal linear segment of chainable unary nodes and
        # compile it as ONE XLA program (measured on v5e: Q1 SF0.1 as one
        # program runs 1.6x faster than per-node programs — 1.81 vs
        # 2.88 ms — and matches at SF1 where device compute dominates;
        # one program also cuts the remote-compiler invocations that made
        # Q3 compile-bound on the tunneled platform). Segmented
        # aggregates stay un-fused (they re-enter the executor above).
        # ARROW_TPU_FUSE=off restores per-node programs for debugging.
        seg = [decl]
        cur = decl.inputs[0]
        limit = 1 if _fuse_mode() == "off" else 64
        while (len(seg) < limit and cur.factory_name in _CHAINABLE
               and not (cur.factory_name == "aggregate"
                        and getattr(cur.options, "segment_keys", None))):
            seg.append(cur)
            cur = cur.inputs[0]
        decls_exec_order = list(reversed(seg))
        input_batch = execute_declaration(cur, _root=False)
        key = ("segment",
               tuple((d.factory_name, _config_key(d))
                     for d in decls_exec_order),
               _dict_ids(input_batch))

        def make(decls=tuple(decls_exec_order)):
            fns = _segment_fns(decls)

            def staged(batch):
                for f in fns:
                    batch = f(batch)
                return batch
            return staged

        fn = _cached_jit(key, make)
        return fn(input_batch)

    if decl.factory_name in ("sink", "table_sink", "consuming_sink",
                             "order_by_sink", "select_k_sink"):
        # sink family (sink_node.cc:557-561): terminals in the reference's
        # push model; in this pull model they evaluate their input (plus
        # the fused sort / top-k for the ordering sinks) and surface it
        # through to_table()/to_reader().
        inner = execute_declaration(decl.inputs[0], _root=False)
        opts = decl.options
        if decl.factory_name == "order_by_sink":
            fn, _ = _node_order_by(OrderByNodeOptions(
                opts.sort_keys, getattr(opts, "null_placement", "at_end")),
                None)
            inner = jax.jit(fn)(inner)
        elif decl.factory_name == "select_k_sink":
            fn, _ = _node_order_by(OrderByNodeOptions(opts.sort_keys), None)
            inner = jax.jit(fn)(inner)
            fetch_fn, _ = _node_fetch(FetchNodeOptions(0, opts.k), None)
            inner = jax.jit(fetch_fn)(inner)
        elif decl.factory_name == "consuming_sink":
            tbl = download_table(inner)
            for rb in tbl.to_batches():
                opts.consumer(rb)
            finish = getattr(opts.consumer, "finish", None)
            if callable(finish):
                finish()
        return inner

    raise ArrowInvalid(f"unknown node factory {decl.factory_name!r}")


_FUSE_MODE = None


def _fuse_mode() -> str:
    global _FUSE_MODE
    if _FUSE_MODE is None:
        _FUSE_MODE = os.environ.get("ARROW_TPU_FUSE", "on")
    return _FUSE_MODE


def _segment_fns(decls: Sequence[Declaration]) -> List[Callable]:
    """Lower a linear run of chainable declarations (execution order) to
    composable DeviceBatch -> DeviceBatch functions, applying the
    filter-into-aggregate planner rewrite: an aggregate over
    filter(+projects) consumes the filter MASK instead of a compacted
    batch — the filter's data movement disappears (projects are
    elementwise and mask-independent, so they commute with the
    rewrite)."""
    decls = list(decls)
    node_fns: List[Callable] = []
    i = 0
    while i < len(decls):
        d = decls[i]
        if d.factory_name == "filter":
            j = i + 1
            while j < len(decls) and decls[j].factory_name == "project":
                j += 1
            if j < len(decls) and decls[j].factory_name == "aggregate":
                mask_expr = d.options.filter_expression
                proj_fns = [_CHAINABLE["project"](p2.options, None)[0]
                            for p2 in decls[i + 1:j]]
                agg_fn, _ = _node_aggregate(decls[j].options, None,
                                            pre_mask_expr=mask_expr)

                def fused(batch, proj_fns=tuple(proj_fns),
                          agg_fn=agg_fn):
                    # carry the ORIGINAL columns too: the mask may
                    # reference columns the projects drop
                    projected = batch
                    for f in proj_fns:
                        projected = f(projected)
                    merged_cols = list(projected.columns)
                    merged_fields = list(projected.schema.fields)
                    have = set(projected.schema.names)
                    for fld, c in zip(batch.schema.fields, batch.columns):
                        if fld.name not in have:
                            merged_cols.append(c)
                            merged_fields.append(fld)
                    merged = DeviceBatch(Schema(merged_fields),
                                         merged_cols, batch.row_count)
                    return agg_fn(merged)

                node_fns.append(fused)
                i = j + 1
                continue
        if (d.factory_name == "order_by" and i + 1 < len(decls)
                and decls[i + 1].factory_name == "fetch"):
            fo = decls[i + 1].options
            if (fo.count is not None and fo.count >= 0
                    and fo.offset >= 0
                    and fo.offset + fo.count <= _TOPK_MAX):
                node_fns.append(_make_topk_fn(d.options, fo.offset,
                                              fo.count))
                i += 2
                continue
        fn, _ = _CHAINABLE[d.factory_name](d.options, None)
        node_fns.append(fn)
        i += 1
    return node_fns


def _pivot_longer_host(options, tbl: Table) -> Table:
    """Wide -> long reshape (reference: acero/options.h:800-869,
    pivot_longer_node.cc). Output rows = input rows x templates; columns =
    passthrough (inputs not consumed as measurements) + feature columns
    (literal strings per template) + measurement columns."""
    from ..array.array import array as make_array
    from .. import types as T

    templates = options.row_templates
    consumed = {m for t in templates for m in t.measurement_values
                if m is not None}
    pass_names = [n for n in tbl.column_names if n not in consumed]
    n = tbl.num_rows
    k = len(templates)

    arrays, names = [], []
    for name in pass_names:
        col = tbl.column(name).combine()
        vals = col.to_pylist()
        arrays.append(make_array(
            [v for v in vals for _ in range(k)], col.type))
        names.append(name)
    for j, fname in enumerate(options.feature_field_names):
        per_template = [t.feature_values[j] for t in templates]
        arrays.append(make_array(per_template * n, T.string()))
        names.append(fname)
    for j, mname in enumerate(options.measurement_field_names):
        srcs = [t.measurement_values[j] for t in templates]
        src_vals = {s: tbl.column(s).combine().to_pylist()
                    for s in set(srcs) if s is not None}
        mtype = next((tbl.column(s).combine().type
                      for s in srcs if s is not None), T.null())
        out = []
        for r in range(n):
            for s in srcs:
                out.append(None if s is None else src_vals[s][r])
        arrays.append(make_array(out, mtype))
        names.append(mname)
    return Table.from_arrays(arrays, names)


def _dict_ids(batch: DeviceBatch) -> tuple:
    return tuple(id(c.dictionary) if c.dictionary is not None else 0
                 for c in batch.columns)


def _execute_union(batches: List[DeviceBatch]) -> DeviceBatch:
    schema = batches[0].schema
    # unify dictionaries per column (host)
    ncols = len(schema)
    cols_by_i = []
    for i in range(ncols):
        cols = [b.columns[i] for b in batches]
        if any(c.dictionary is not None for c in cols):
            cols = unify_dictionaries(cols)
        cols_by_i.append(cols)
    total_cap = sum(b.capacity for b in batches)
    out_cols = []
    for i in range(ncols):
        vals, validity = _union_cols(cols_by_i[i], total_cap)
        out_cols.append(DeviceColumn(vals, validity, cols_by_i[i][0].type,
                                     cols_by_i[i][0].dictionary))
    # compact: move all live rows to the front
    counts = [b.row_count for b in batches]
    offsets = []
    pos = 0
    keep_parts = []
    for b in batches:
        keep_parts.append(jnp.arange(b.capacity, dtype=jnp.int32)
                          < b.row_count)
    keep = jnp.concatenate(keep_parts)
    from ..compute.selection import compact_column, compaction_indices
    positions, count = compaction_indices(keep)
    out_cols = [compact_column(c, positions) for c in out_cols]
    return DeviceBatch(schema, out_cols, count)


def _execute_hashjoin(options: HashJoinNodeOptions, left: DeviceBatch,
                      right: DeviceBatch, left_pre=(),
                      right_pre=()) -> DeviceBatch:
    """Probe side = LEFT (Acero builds on right input: hash_join_node.cc
    builds from inputs[1]). left_pre/right_pre are chainable
    filter/project Declarations fused into the prepare+plan program."""
    jt = options.join_type
    left_pre = tuple(left_pre or ())
    right_pre = tuple(right_pre or ())
    if getattr(options, "filter_expression", None) is not None:
        # residual (non-equi) filter: pairs are materialized inner-style,
        # filtered, THEN join-type semantics apply (post-filter match
        # counts — swiss_join_internal.h:882 JoinResidualFilter)
        if left_pre:
            left = jax.jit(lambda b: _apply_fns(
                _segment_fns(left_pre), b))(left)
        if right_pre:
            right = jax.jit(lambda b: _apply_fns(
                _segment_fns(right_pre), b))(right)
        return _execute_hashjoin_residual(options, left, right)
    # key metadata (schema + dictionaries) AFTER the fused pre-chains —
    # abstract trace only, DeviceColumn aux (type/dictionary) rides
    # through eval_shape untouched
    lmeta = left if not left_pre else jax.eval_shape(
        lambda b: _apply_fns(_segment_fns(left_pre), b), left)
    rmeta = right if not right_pre else jax.eval_shape(
        lambda b: _apply_fns(_segment_fns(right_pre), b), right)
    lkeys = [lmeta.column(k) for k in options.left_keys]
    rkeys = [rmeta.column(k) for k in options.right_keys]

    # union-dictionary planning (host metadata only; memoized on the
    # options object per key index + dictionary identities: chunked
    # probes re-join many probe chunks against one build side, and fresh
    # union dictionaries per chunk would thrash the jit caches). The code
    # REMAPS run inside the fused prepare+plan program below.
    memo = getattr(options, "_unify_memo", None)
    if memo is None:
        memo = options._unify_memo = {}
    unify: List = []
    remaps: Dict[str, jax.Array] = {}
    for i, (lk, rk) in enumerate(zip(lkeys, rkeys)):
        if lk.dictionary is None and rk.dictionary is None:
            unify.append(None)
            continue
        if lk.dictionary is None or rk.dictionary is None:
            raise ArrowInvalid(
                "hashjoin key mixes dictionary-coded and plain columns")
        mkey = (i, id(lk.dictionary), id(rk.dictionary))
        hit = memo.get(mkey)
        if not (hit is not None and hit[0] is lk.dictionary
                and hit[1] is rk.dictionary):
            union_arr, lmap, rmap = _plan_unify(lk.dictionary,
                                                rk.dictionary, lk.type)
            hit = memo[mkey] = (lk.dictionary, rk.dictionary, union_arr,
                                lmap, rmap)
        unify.append(hit[2])
        remaps[f"l{i}"] = jnp.asarray(hit[3])
        remaps[f"r{i}"] = jnp.asarray(hit[4])

    # bloom pushdown applies when an unmatched probe row can contribute
    # no output rows (bloom has no false negatives, so dropped rows truly
    # cannot match); capacities are static so the decision is host-side.
    bloom_on = (_bloom_mode() != "never"
                and not options.disable_bloom_filter
                and jt in ("inner", "left semi", "right semi",
                           "right outer")
                and (_bloom_mode() == "always"
                     or left.capacity >= 4 * right.capacity))

    # ---- fused prepare+plan: pre filter/project chains on both sides,
    # dictionary-code remaps, bloom build/query/compaction and the join
    # capacity plan run as ONE program (VERDICT round-1: a join plan is
    # <= 3 programs — prepare+plan, [build filter], materialize — instead
    # of one per node; reference contrast: swiss_join.cc phases each
    # schedule task groups).
    l_changed = bool(left_pre) or bloom_on
    r_changed = bool(right_pre)
    prep_key = ("join_prep", jt, tuple(options.left_keys),
                tuple(options.right_keys),
                tuple((d.factory_name, _config_key(d)) for d in left_pre),
                tuple((d.factory_name, _config_key(d)) for d in right_pre),
                bloom_on,
                tuple(i for i, u in enumerate(unify) if u is not None),
                tuple(left.schema.names), tuple(right.schema.names),
                _dict_ids(left), _dict_ids(right))

    def make_prep(left_pre=left_pre, right_pre=right_pre, unify=tuple(unify)):
        from ..compute.move import gather_rows
        lfns = _segment_fns(left_pre) if left_pre else []
        rfns = _segment_fns(right_pre) if right_pre else []
        key_names_l = tuple(options.left_keys)
        key_names_r = tuple(options.right_keys)

        def fn(left_b, right_b, remaps):
            for f in lfns:
                left_b = f(left_b)
            for f in rfns:
                right_b = f(right_b)
            lkeys = [left_b.column(k) for k in key_names_l]
            rkeys = [right_b.column(k) for k in key_names_r]
            for i, u in enumerate(unify):
                if u is None:
                    continue
                lk, rk = lkeys[i], rkeys[i]
                (lv,) = gather_rows([remaps[f"l{i}"]],
                                    lk.values.astype(jnp.int32))
                (rv,) = gather_rows([remaps[f"r{i}"]],
                                    rk.values.astype(jnp.int32))
                lkeys[i] = DeviceColumn(lv, lk.validity, lk.type, u)
                rkeys[i] = DeviceColumn(rv, rk.validity, rk.type, u)
            if bloom_on:
                from ..compute import bloom as B
                lb = B.log_bits_for(right_b.capacity)
                b_live = jnp.arange(right_b.capacity,
                                    dtype=jnp.int32) < right_b.row_count
                p_live = left_b.row_mask()
                for c in rkeys:
                    b_live = jnp.logical_and(b_live, c.valid_mask(None))
                for c in lkeys:
                    p_live = jnp.logical_and(p_live, c.valid_mask(None))
                bf = B.build_bloom(rkeys, b_live, lb)
                hit = B.bloom_query(bf, lkeys, p_live)
                # probe codes must compare unified: swap unified key
                # columns into the probe batch before compaction
                # (planning-only re-encode, like hash_join_dict.cc)
                if any(u is not None for u in unify):
                    repl = dict(zip(key_names_l, lkeys))
                    cols = [repl.get(f2.name, c) for f2, c in
                            zip(left_b.schema.fields, left_b.columns)]
                    left_b = DeviceBatch(left_b.schema, cols,
                                         left_b.row_count)
                left_b = filter_batch(left_b, DeviceColumn(hit, None,
                                                           T.bool_()))
                lkeys = [left_b.column(k) for k in key_names_l]
            plan = J.build_join_plan(rkeys, lkeys, right_b.row_count,
                                     left_b.row_count, jt)
            unmatched, matched = J.unmatched_build_plan(
                plan, right_b.row_count)
            out = {"plan": plan, "unmatched": unmatched,
                   "matched": matched,
                   "n_unm": jnp.sum(unmatched, dtype=jnp.int64),
                   "n_mat": jnp.sum(matched, dtype=jnp.int64),
                   "max_c": jnp.max(plan.counts)}
            if l_changed:
                out["left"] = left_b
            if r_changed:
                out["right"] = right_b
            return out
        return fn

    res = _cached_jit(prep_key, make_prep)(left, right, remaps)
    if l_changed:
        left = res["left"]
    if r_changed:
        right = res["right"]
    plan, unmatched, matched = res["plan"], res["unmatched"], res["matched"]
    n_unmatched, n_matched = res["n_unm"], res["n_mat"]

    # semi/anti on the BUILD (right) side: pure build-row filters
    if jt in ("right semi", "right anti"):
        fkey = ("join_build_filter", jt, tuple(right.schema.names),
                _dict_ids(right))

        def make_bfilter():
            def fn(batch, mask_vals):
                return filter_batch(batch, DeviceColumn(mask_vals, None,
                                                        T.bool_()))
            return fn

        mask_vals = matched if jt == "right semi" else unmatched
        return _cached_jit(fkey, make_bfilter)(right, mask_vals)
    if jt in ("left semi", "left anti"):
        out_cap, total = _spec_cap(
            ("join_cap", jt, id(options), left.capacity, right.capacity),
            options, plan.total)
        return _join_materialize(options, plan, left, right, out_cap,
                                 total or 0, 0, unmatched,
                                 probe_only=True)

    extra_dev = n_unmatched if jt in ("right outer", "full outer") else None
    # primary-key (unique-build) detection piggybacks on the capacity
    # readback: max(counts) rides the SAME prep program, and fetching it
    # together with total costs no extra round trip. Skipped under
    # speculative capacity classes (the whole point there is no sync;
    # a stale uniqueness guess would be a CORRECTNESS bug, not a
    # capacity miss, so it never speculates).
    unique_build = False
    total_pref = plan.total
    spec_active = _spec_enabled() and _SPEC["depth"] > 0
    ukey = ("join_unique", jt, id(options), left.capacity, right.capacity)
    if jt in ("inner", "left outer") and \
            os.environ.get("ARROW_TPU_JOIN_UNIQUE", "on") == "on":
        hit = _SPEC["uniq"].get(ukey) if spec_active else None
        if hit is not None and hit[0]() is options:
            # speculation-scope cache hit: no sync — reuse the
            # remembered uniqueness and queue max(counts) for the
            # end-of-plan verify (a stale True would be WRONG output,
            # so it re-executes on violation, like capacity misses)
            unique_build = hit[1]
            if unique_build:
                _SPEC["uchecks"].append((res["max_c"], ukey))
        else:
            # sync readback (first execution pays this via _spec_cap
            # anyway); remember the flag for later speculated runs
            tot_i, max_i = (int(v) for v in
                            jax.device_get((plan.total, res["max_c"])))
            unique_build = max_i <= 1
            total_pref = tot_i
            import weakref
            try:
                _SPEC["uniq"][ukey] = (weakref.ref(options), unique_build)
            except TypeError:
                pass
    out_cap, total = _spec_cap(
        ("join_cap", jt, id(options), left.capacity, right.capacity),
        options, total_pref, extra_dev)
    if unique_build:
        # identity / compaction expansion works in probe-capacity space
        out_cap = left.capacity if jt == "left outer" \
            else min(out_cap, left.capacity)
    # total/extra beyond capacity choice ride the program as traced
    # values (plan.total / n_unm) — the ints are display-only
    return _join_materialize(options, plan, left, right, out_cap,
                             total or 0, 0, unmatched,
                             unique_build=unique_build)


def _join_output_schema(options: HashJoinNodeOptions, left: DeviceBatch,
                        right: DeviceBatch, probe_only: bool):
    lnames = options.left_output if options.left_output is not None \
        else left.schema.names
    if probe_only:
        # semi/anti output only the probe side: no collisions, no suffixes
        return lnames, [], Schema([left.schema.field(n) for n in lnames])
    rnames = options.right_output if options.right_output is not None \
        else right.schema.names
    fields = []
    for n in lnames:
        f = left.schema.field(n)
        if n in rnames:
            f = f.with_name(n + options.output_suffix_for_left)
        fields.append(f)
    for n in rnames:
        f = right.schema.field(n)
        if n in lnames:
            f = f.with_name(n + options.output_suffix_for_right)
        fields.append(f)
    return lnames, rnames, Schema(fields)


def _join_materialize(options, plan, left, right, out_cap: int, total: int,
                      extra: int, unmatched, probe_only: bool = False,
                      unique_build: bool = False):
    jt = options.join_type
    lnames, rnames, out_schema = _join_output_schema(options, left, right,
                                                     probe_only)
    key = ("join_mat", jt, out_cap, tuple(lnames), tuple(rnames),
           _dict_ids(left), _dict_ids(right), unique_build)

    def make():
        def fn(plan, left, right, unmatched):
            probe_idx, build_idx, build_valid, row_live = \
                J.join_gather_indices(plan, out_cap, jt,
                                      unique_build=unique_build)
            # an EMPTY output list is a valid projection (emit no
            # columns from that side — tpch q3's inner join does this),
            # distinct from None/unset meaning "all columns"
            lsub = left.select(list(lnames))
            if unique_build and jt == "left outer":
                # identity expansion: probe columns pass through unmoved
                lcols = list(lsub.columns)
            elif not lnames:
                lcols = []
            else:
                lcols = J.gather_batch_columns(lsub, probe_idx, None,
                                               out_cap)
            out_cols = list(lcols)
            n_out = plan.total.astype(jnp.int32)
            if not probe_only:
                rsub = right.select(list(rnames))
                bv = build_valid if jt in ("left outer", "full outer") \
                    else None
                rcols = [] if not rnames else \
                    J.gather_batch_columns(rsub, build_idx, bv, out_cap)
                out_cols = out_cols + rcols
                if jt in ("right outer", "full outer"):
                    # append unmatched build rows after the probe output
                    from ..compute.selection import (compact_column,
                                                     compaction_indices)
                    positions, n_unm = compaction_indices(unmatched)
                    n_l = len(lnames)
                    appended = []
                    for ci, c in enumerate(out_cols):
                        if ci < n_l:  # left side: nulls
                            newv = c.values
                            newval = jnp.zeros(out_cap, jnp.bool_) \
                                if c.validity is None else c.validity
                            appended.append((newv, newval, None))
                        else:
                            src = rsub.columns[ci - n_l]
                            comp = compact_column(src, positions)
                            appended.append((comp.values,
                                             comp.validity if comp.validity
                                             is not None else
                                             jnp.ones(src.capacity,
                                                      jnp.bool_),
                                             src))
                    # scatter appended rows at [total, total+extra)
                    out2 = []
                    dst = jnp.arange(out_cap, dtype=jnp.int64)
                    for ci, (c, (av, avalid, src)) in enumerate(
                            zip(out_cols, appended)):
                        if ci < n_l:
                            base_valid = c.validity if c.validity is not None \
                                else jnp.ones(out_cap, jnp.bool_)
                            validity = jnp.where(dst < plan.total,
                                                 base_valid, False)
                            out2.append(DeviceColumn(c.values, validity,
                                                     c.type, c.dictionary))
                        else:
                            idx2 = dst - plan.total
                            in_app = jnp.logical_and(idx2 >= 0, True)
                            safe2 = jnp.clip(idx2, 0,
                                             av.shape[0] - 1)
                            vals = jnp.where(in_app, av[safe2], c.values)
                            base_valid = c.validity if c.validity is not None \
                                else jnp.ones(out_cap, jnp.bool_)
                            validity = jnp.where(in_app, avalid[safe2],
                                                 base_valid)
                            out2.append(DeviceColumn(vals, validity,
                                                     c.type, c.dictionary))
                    out_cols = out2
                    n_out = (plan.total + n_unm).astype(jnp.int32)
            return out_cols, n_out
        return fn

    fn = _cached_jit(key, make)
    out_cols, n_out = fn(plan, left, right, unmatched)
    return DeviceBatch(out_schema, out_cols, n_out)


def _null_like(c: DeviceColumn, cap: int) -> tuple:
    """(values, validity) planes of an all-null column shaped like c."""
    return (jnp.zeros((cap,) + c.values.shape[1:], c.values.dtype),
            jnp.zeros(cap, jnp.bool_))


def _execute_hashjoin_residual(options: HashJoinNodeOptions,
                               left: DeviceBatch,
                               right: DeviceBatch) -> DeviceBatch:
    """Hash join with a residual (non-equi) filter.

    Reference: JoinResidualFilter (swiss_join_internal.h:882) evaluates
    the filter on each equi-matched row pair between match expansion and
    materialization, and outer/semi/anti decisions use POST-filter match
    counts. TPU shape: program A builds the inner equi-plan, expands all
    pairs, evaluates the filter, and reduces pass counts per probe/build
    row; the host reads the counts to pick an output capacity; program B
    assembles the requested join type by compacting [passing pairs ||
    unmatched-probe rows || unmatched-build rows] in one shared sort."""
    jt = options.join_type
    expr = options.filter_expression
    lkeys = [left.column(k) for k in options.left_keys]
    rkeys = [right.column(k) for k in options.right_keys]
    for lk, rk in zip(lkeys, rkeys):
        if (lk.dictionary is None) != (rk.dictionary is None):
            raise ArrowInvalid(
                "hashjoin key mixes dictionary-coded and plain columns")
        if lk.dictionary is not None and lk.dictionary is not rk.dictionary:
            raise ArrowInvalid(
                "residual-filter join requires shared key dictionaries; "
                "cast dictionary keys to values first")

    plan_key = ("join_res_plan", tuple(options.left_keys),
                tuple(options.right_keys), tuple(left.schema.names),
                tuple(right.schema.names), _dict_ids(left),
                _dict_ids(right))

    def make_plan(key_names_l=tuple(options.left_keys),
                  key_names_r=tuple(options.right_keys)):
        def fn(left_b, right_b):
            lks = [left_b.column(k) for k in key_names_l]
            rks = [right_b.column(k) for k in key_names_r]
            return J.build_join_plan(rks, lks, right_b.row_count,
                                     left_b.row_count, "inner")
        return fn

    plan = _cached_jit(plan_key, make_plan)(left, right)
    total = int(plan.total)
    pair_cap = capacity_class(max(total, 1))

    # --- program A: expand pairs, evaluate filter, count passes --------
    a_key = ("join_res_pairs", pair_cap, repr(expr),
             tuple(left.schema.names), tuple(right.schema.names),
             _dict_ids(left), _dict_ids(right))

    def make_pairs():
        def fn(plan, left_b, right_b):
            probe_idx, build_idx, _bv, row_live = \
                J.join_gather_indices(plan, pair_cap, "inner")
            lcols = J.gather_batch_columns(left_b, probe_idx, None,
                                           pair_cap)
            rcols = J.gather_batch_columns(right_b, build_idx, None,
                                           pair_cap)
            pair_schema = Schema(
                list(left_b.schema.fields) + list(right_b.schema.fields))
            n_pairs = jnp.minimum(plan.total,
                                  jnp.asarray(pair_cap, jnp.int64))
            pairs = DeviceBatch(pair_schema, lcols + rcols,
                                n_pairs.astype(jnp.int32))
            ctx = ExecContext(pair_cap, pairs.row_count)
            mask_col = expr.evaluate(pairs, ctx)
            passed = mask_col.values.astype(jnp.bool_)
            if mask_col.validity is not None:  # null -> reject
                passed = jnp.logical_and(passed, mask_col.validity)
            passed = jnp.logical_and(passed, row_live)
            # post-filter match counts per probe / build row
            from ..compute.move import segment_count
            p_cap = left_b.capacity
            b_cap = right_b.capacity
            probe_hits = segment_count(passed, probe_idx, p_cap)
            build_hits = segment_count(
                passed, jnp.where(passed, build_idx,
                                  jnp.asarray(b_cap, build_idx.dtype)),
                b_cap)
            probe_live = left_b.row_mask()
            build_live = jnp.arange(b_cap, dtype=jnp.int32) < \
                right_b.row_count
            probe_unmatched = jnp.logical_and(probe_live, probe_hits == 0)
            build_unmatched = jnp.logical_and(build_live, build_hits == 0)
            return {"pairs": pairs, "passed": passed,
                    "probe_matched": jnp.logical_and(probe_live,
                                                     probe_hits > 0),
                    "build_matched": jnp.logical_and(build_live,
                                                     build_hits > 0),
                    "probe_unmatched": probe_unmatched,
                    "build_unmatched": build_unmatched,
                    "n_pass": jnp.sum(passed, dtype=jnp.int64),
                    "n_probe_unm": jnp.sum(probe_unmatched,
                                           dtype=jnp.int64),
                    "n_build_unm": jnp.sum(build_unmatched,
                                           dtype=jnp.int64)}
        return fn

    res = _cached_jit(a_key, make_pairs)(plan, left, right)

    # --- semi/anti: pure one-side filters on post-filter counts --------
    if jt in ("left semi", "left anti"):
        mask = res["probe_matched"] if jt == "left semi" \
            else res["probe_unmatched"]
        out = filter_batch(left, DeviceColumn(mask, None, T.bool_()))
        lnames, _, out_schema = _join_output_schema(options, left, right,
                                                    probe_only=True)
        sel = out.select(list(lnames))
        return sel.with_columns(out_schema, sel.columns)
    if jt in ("right semi", "right anti"):
        mask = res["build_matched"] if jt == "right semi" \
            else res["build_unmatched"]
        return filter_batch(right, DeviceColumn(mask, None, T.bool_()))

    n_pass = int(res["n_pass"])
    extra_p = int(res["n_probe_unm"]) if jt in ("left outer",
                                                "full outer") else 0
    extra_b = int(res["n_build_unm"]) if jt in ("right outer",
                                                "full outer") else 0
    out_cap = capacity_class(max(n_pass + extra_p + extra_b, 1))
    lnames, rnames, out_schema = _join_output_schema(options, left, right,
                                                     probe_only=False)

    b_key = ("join_res_mat", jt, pair_cap, out_cap, tuple(lnames),
             tuple(rnames), _dict_ids(left), _dict_ids(right))

    def make_mat():
        include_p = jt in ("left outer", "full outer")
        include_b = jt in ("right outer", "full outer")

        def fn(res, left_b, right_b):
            pairs = res["pairs"]
            keep = [res["passed"]]
            n_l = len(left_b.schema.names)
            cols_v, cols_m = [], []
            for name in list(lnames) + list(rnames):
                is_left = len(cols_v) < len(lnames)
                src_b = left_b if is_left else right_b
                idx = src_b.schema.get_field_index(name)
                pc_ = pairs.columns[idx if is_left else n_l + idx]
                segs_v = [pc_.values]
                segs_m = [pc_.validity if pc_.validity is not None
                          else jnp.ones(pair_cap, jnp.bool_)]
                if include_p:  # probe-unmatched rows: left vals, right null
                    src = src_b.columns[idx]
                    if is_left:
                        segs_v.append(src.values)
                        segs_m.append(src.validity if src.validity
                                      is not None
                                      else jnp.ones(src.capacity,
                                                    jnp.bool_))
                    else:
                        v, m = _null_like(src, left_b.capacity)
                        segs_v.append(v)
                        segs_m.append(m)
                if include_b:  # build-unmatched rows: right vals, left null
                    src = src_b.columns[idx]
                    if is_left:
                        v, m = _null_like(src, right_b.capacity)
                        segs_v.append(v)
                        segs_m.append(m)
                    else:
                        segs_v.append(src.values)
                        segs_m.append(src.validity if src.validity
                                      is not None
                                      else jnp.ones(src.capacity,
                                                    jnp.bool_))
                cols_v.append(jnp.concatenate(segs_v))
                cols_m.append(jnp.concatenate(segs_m))
            if include_p:
                keep.append(res["probe_unmatched"])
            if include_b:
                keep.append(res["build_unmatched"])
            keep_all = jnp.concatenate(keep)
            from ..compute.move import compact_by_mask
            outs, count = compact_by_mask(keep_all, cols_v + cols_m)
            n_cols = len(cols_v)

            def fit(a, fill):
                if a.shape[0] >= out_cap:
                    return a[:out_cap]
                pad = jnp.full((out_cap - a.shape[0],) + a.shape[1:],
                               fill, a.dtype)
                return jnp.concatenate([a, pad])

            out_cols = []
            for i, f in enumerate(out_schema.fields):
                src_b = left_b if i < len(lnames) else right_b
                idx = src_b.schema.get_field_index(
                    (list(lnames) + list(rnames))[i])
                dic = src_b.columns[idx].dictionary
                out_cols.append(DeviceColumn(fit(outs[i], 0),
                                             fit(outs[n_cols + i], False),
                                             f.type, dic))
            return out_cols, count.astype(jnp.int32)
        return fn

    out_cols, n_out = _cached_jit(b_key, make_mat)(res, left, right)
    return DeviceBatch(out_schema, out_cols, n_out)


def _barrier_batch(batch: DeviceBatch) -> DeviceBatch:
    leaves, treedef = jax.tree_util.tree_flatten(batch)
    leaves = jax.lax.optimization_barrier(leaves)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def compile_chain(decls: Sequence[Declaration]) -> Callable:
    """Compose a sequence of chainable node declarations (filter/project/
    aggregate/order_by/fetch) into ONE jitted DeviceBatch -> DeviceBatch
    program (per-node programs under ARROW_TPU_FUSE=off). Applies the same
    filter-into-aggregate fusion as the plan executor. Used by benchmarks
    and the multi-chip driver to time pure device execution with a
    pre-uploaded batch."""
    decls = list(decls)
    for d in decls:
        if d.factory_name not in _CHAINABLE:
            raise ArrowInvalid(f"{d.factory_name!r} is not chainable")
    node_fns = _segment_fns(decls)

    if _fuse_mode() != "off":
        def whole(batch, fns=tuple(node_fns)):
            for f in fns:
                batch = f(batch)
            return batch
        return jax.jit(whole)

    jitted = [jax.jit(f) for f in node_fns]

    def staged(batch):
        for f in jitted:
            batch = f(batch)
        return batch

    return staged


def _execute_asof_join(options, left: DeviceBatch,
                       right: DeviceBatch) -> DeviceBatch:
    """Vectorized as-of join: map by-keys to shared ids, rank right `on`
    values, pack (gid, on_rank) into one u64 word, one searchsorted finds
    each probe row's most recent match (the MemoStore of
    asof_join_node.cc:225 collapses into a sort + binary search)."""
    from ..compute.join import _side_gids
    from ..compute.keys import stable_sort_indices

    lon = left.column(options.left_on)
    ron = right.column(options.right_on)
    lby = [left.column(k) for k in options.left_by]
    rby = [right.column(k) for k in options.right_by]
    for i, (lk, rk) in enumerate(zip(lby, rby)):
        if lk.dictionary is not None or rk.dictionary is not None:
            lk2, rk2 = unify_dictionaries([lk, rk])
            lby[i], rby[i] = lk2, rk2
    tol = options.tolerance

    key = ("asof", tuple(options.left_by), tuple(options.right_by),
           options.left_on, options.right_on, tol,
           _dict_ids(left), _dict_ids(right))

    def make():
        def fn(left, right, lon, ron, lby, rby):
            l_cap, r_cap = left.capacity, right.capacity
            lmask = left.row_mask()
            rmask = right.row_mask()
            if rby:
                gb, gp = _side_gids(rby, lby, rmask, lmask)
            else:
                gb = jnp.zeros(r_cap, jnp.int64)
                gp = jnp.zeros(l_cap, jnp.int64)
                gb = jnp.where(rmask, gb, -(jnp.arange(r_cap,
                                                       dtype=jnp.int64) + 2))
                gp = jnp.where(lmask, gp, -1)

            lv = lon.values.astype(jnp.int64)
            rv = ron.values.astype(jnp.int64)
            # sorted right on-values with padding pushed to +inf so ranks
            # of real values are unaffected
            rv_sorted = jnp.sort(
                jnp.where(rmask, rv, jnp.asarray(2**62, jnp.int64)))
            # probe rank: number of right values <= lv  (tolerance<=0
            # means "most recent at or before")
            lrank = jnp.searchsorted(rv_sorted, lv, side="right")
            rrank = jnp.searchsorted(rv_sorted, rv, side="right")

            SHIFT = jnp.uint64(32)
            def pack(g, r):
                gg = jnp.where(g >= 0, g, 0).astype(jnp.uint64)
                return (gg << SHIFT) | r.astype(jnp.uint64)

            rkey = pack(gb, rrank)
            rkey = jnp.where(jnp.logical_and(rmask, gb >= 0), rkey,
                             jnp.uint64(0xFFFFFFFFFFFFFFFF))
            rs_order = stable_sort_indices([rkey], r_cap)
            rkey_sorted = rkey[rs_order]
            lkey = pack(gp, lrank)
            pos = jnp.searchsorted(rkey_sorted, lkey, side="right") - 1
            safe_pos = jnp.clip(pos, 0, r_cap - 1)
            from ..compute.move import gather_rows
            (cand,) = gather_rows([rs_order], safe_pos)
            cand_g, cand_v = gather_rows([gb, rv], cand)
            ok = (pos >= 0) & (cand_g == gp) & (gp >= 0) & lmask
            if tol <= 0:
                ok = jnp.logical_and(ok, cand_v >= lv + tol)
                ok = jnp.logical_and(ok, cand_v <= lv)
            else:
                ok = jnp.logical_and(ok, cand_v <= lv + tol)
            safe_cand = jnp.where(ok, cand, 0)

            out_cols = list(left.columns)
            rnames = [n for n in right.schema.names
                      if n not in (options.right_on, *options.right_by)]
            # ONE shared sort-based gather for every right payload column
            # (plain element gathers lower quadratically on TPU — move.py)
            from ..compute.selection import gather_columns
            rcols = [right.column(n) for n in rnames]
            gathered = gather_columns(rcols, safe_cand)
            extra = []
            for gc in gathered:
                validity = ok
                if gc.validity is not None:
                    validity = jnp.logical_and(ok, gc.validity)
                extra.append(DeviceColumn(gc.values, validity, gc.type,
                                          gc.dictionary))
            return out_cols + extra, rnames
        return fn

    fn_impl = make()
    jitted = _JIT_CACHE.get(key)
    if jitted is None:
        jitted = _JIT_CACHE[key] = jax.jit(
            lambda l, r, lo, ro, lb, rb: fn_impl(l, r, lo, ro, lb, rb)[0])
    cols = jitted(left, right, lon, ron, lby, rby)
    rnames = [n for n in right.schema.names
              if n not in (options.right_on, *options.right_by)]
    fields = list(left.schema.fields) + \
        [right.schema.field(n) for n in rnames]
    return DeviceBatch(Schema(fields), cols, left.row_count)


def _execute_sorted_merge(options, batches: List[DeviceBatch]
                          ) -> DeviceBatch:
    merged = _execute_union(batches)
    fn, _ = _node_order_by(OrderByNodeOptions(options.sort_keys,
                                              options.null_placement),
                           None)
    return jax.jit(fn)(merged)
