"""Distributed Declaration execution — any supported plan over a mesh.

The reference's only distribution mechanism is Flight RPC at the edge
(SURVEY §2.9 P8); within a node it parallelizes aggregation by merging
per-thread grouper states into state 0
(groupby_aggregate_node.cc:255). The TPU-native redesign makes the
SAME Declaration tree run across a ``jax.sharding.Mesh``:

* Source rows are contiguously range-partitioned over the mesh axis.
* The scan -> filter -> project -> aggregate-consume spine runs as ONE
  SPMD program under ``shard_map`` — each device consumes its partition
  into a bounded partial-state batch (the chunked engine's
  consume/merge/finalize states, acero/chunked.py).
* Per-device states are then merged in partition order (preserving
  first-appearance group order), finalized, and post-aggregation ops
  (order_by/fetch tails, e.g. TPC-H Q1) run on the small result.

Plan shapes outside the SPMD spine (middle joins, sort terminals) fall
back to partition-chunked execution: identical partitioning semantics
with the partitions executed as chunks on the local stream. On real
multi-chip hardware those paths ride the bespoke exchange kernels in
``parallel/distributed.py`` (all_to_all hash repartitioning).

Entry: ``Declaration.to_table(distributed=True)`` or ``mesh=Mesh``.

Float caveat: distributed sums reassociate float addition at partition
boundaries (same caveat as chunked/distributed everywhere).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..device.column import DeviceBatch, DeviceColumn
from ..table import Table
from .chunked import (_ALL_JOIN_TYPES, _ChunkedGroupBy, _ChunkSource,
                      _linearize, _norm_aggs, maybe_execute_chunked,
                      state_rows_env)


# Exchange-coverage accounting (round-4 verdict item 6): which plans
# actually exercised a mesh exchange vs fell back to chunked-local
# execution. Tests assert on these so fallback cannot silently absorb
# regressions; dryrun_multichip prints them.
EXCHANGE_COUNTS = {"join_exchange": 0, "join_fused_pre": 0,
                   "sort_exchange": 0, "spmd_aggregate": 0,
                   "chunked_fallback": 0}


def reset_exchange_counts() -> None:
    for k in EXCHANGE_COUNTS:
        EXCHANGE_COUNTS[k] = 0


def _count(kind: str) -> None:
    EXCHANGE_COUNTS[kind] += 1


def maybe_execute_distributed(decl, mesh: Optional[Mesh] = None
                              ) -> Optional[Table]:
    """Execute the Declaration across the mesh; None = unsupported shape
    (caller falls back to single-device execution)."""
    from ..parallel.distributed import make_mesh
    if mesh is None:
        mesh = make_mesh()
    ndev = int(mesh.devices.size)
    lin = _linearize(decl, join_types=_ALL_JOIN_TYPES)
    if lin is None:
        return None
    n = lin.table.num_rows
    if n == 0 or ndev <= 1 or n < ndev:
        # fewer rows than devices (e.g. post-aggregate tails re-entering
        # distributed): empty shards buy nothing — run locally
        return None
    part_rows = -(-n // ndev)

    term = lin.terminal
    has_join = any(d.factory_name == "hashjoin" for d in lin.middle)
    if (not has_join and term is not None
            and term.factory_name == "aggregate"):
        aggs = _norm_aggs(term.options)
        if aggs is not None:
            out = _spmd_aggregate(lin, aggs, mesh, part_rows)
            if out is not None:
                _count("spmd_aggregate")
                return out
    if has_join:
        out = _distributed_join_plan(lin, mesh)
        if out is not None:
            return out
    if (not has_join and term is not None
            and term.factory_name == "order_by"):
        out = _distributed_sort_plan(lin, mesh)
        if out is not None:
            _count("sort_exchange")
            return out
    # remaining shapes: partition-sequential schedule (same contiguous
    # partitioning, partitions run as chunks locally)
    _count("chunked_fallback")
    return maybe_execute_chunked(decl, part_rows)


_ROWID_L, _ROWID_R = "__dist_rid_l__", "__dist_rid_r__"


def _fused_probe_prep(lin, mids):
    """Prepare the SPMD-fused probe side: append the hidden _ROWID_L to
    the SOURCE, rewrite every pre-join project to pass it through, and
    lower the middles to jittable per-shard DeviceBatch fns
    (exec.py _segment_fns). Returns (rid-augmented source, fns,
    post-chain probe column names), or None when fusion is disabled
    (ARROW_TPU_DIST_FUSED_PRE=off)."""
    import os
    if os.environ.get("ARROW_TPU_DIST_FUSED_PRE", "on") == "off":
        return None
    import arrow_tpu as at
    from .exec import Declaration, _segment_fns
    from .expression import Expression
    from .options import ProjectNodeOptions

    n = lin.table.num_rows
    src2 = Table.from_arrays(
        [lin.table.column(i).combine_chunks()
         for i in range(len(lin.table.schema.names))]
        + [at.array(np.arange(n, dtype=np.int64))],
        list(lin.table.schema.names) + [_ROWID_L])
    post_names = list(lin.table.schema.names)
    rewritten = []
    for d in mids:
        if d.factory_name == "project":
            o = d.options
            names = list(o.names) if o.names is not None else [
                repr(e) if e.kind != Expression.KIND_FIELD else e.name
                for e in o.expressions]
            rewritten.append(Declaration("project", ProjectNodeOptions(
                list(o.expressions) + [Expression.field(_ROWID_L)],
                names + [_ROWID_L])))
            post_names = names
        else:
            rewritten.append(d)
    fns = _segment_fns(rewritten) if rewritten else []
    return src2, fns, post_names


def _contains_aggregate(decl) -> bool:
    if decl.factory_name == "aggregate":
        return True
    return any(_contains_aggregate(d) for d in (decl.inputs or []))


def _distributed_join_plan(lin, mesh: Mesh) -> Optional[Table]:
    """Execute a plan whose middle contains hashjoin(s) with the REAL
    mesh exchange (parallel/distributed.py all_to_all hash
    repartitioning — SURVEY §2.9 P4, swiss_join.cc:1103-1210 partitioned
    build without the merge phase), preserving the single-device plan's
    output exactly:

    * probe side = source + pre-join middles (materialized locally —
      elementwise work), build side = the join's inputs[1] subtree;
    * both sides carry hidden row-id columns through the exchange; the
      joined rows are restored to (probe_rowid, build_rowid) order,
      which is the local sort-based join's emission order, so results
      are value- AND order-identical to single-device execution;
    * output columns follow the node's naming rules
      (left_output/right_output + collision suffixes, exec.py
      _join_output_schema);
    * everything downstream of the first join re-enters
      to_table(distributed=True), so later joins exchange again and a
      terminal aggregate runs the SPMD spine."""
    from .exec import Declaration
    from .options import TableSourceNodeOptions
    from ..parallel.distributed import distributed_join_tables

    j = next(i for i, d in enumerate(lin.middle)
             if d.factory_name == "hashjoin")
    join_decl = lin.middle[j]
    opts = join_decl.options
    jt = opts.join_type
    probe_only = jt in ("left semi", "left anti")
    build_only = jt in ("right semi", "right anti")

    import arrow_tpu as at
    # A build subtree CONTAINING AGGREGATION runs distributed: beyond
    # sharding the work, this keeps float-sum reassociation identical
    # on every aggregation path (q15-style plans equality-join two
    # aggregations of the same subtree — a locally-computed build would
    # reassociate differently and the equality would miss). Plain
    # builds (table sources, filters) run locally — nothing to shard.
    if _contains_aggregate(join_decl.inputs[1]):
        build = join_decl.inputs[1].to_table(distributed=True, mesh=mesh)
    else:
        build = join_decl.inputs[1].to_table()
    if build.num_rows == 0 or lin.table.num_rows == 0:
        return None  # degenerate; local path handles it
    bn = build.num_rows
    build2 = Table.from_arrays(
        [build.column(i).combine_chunks()
         for i in range(len(build.schema.names))]
        + [at.array(np.arange(bn, dtype=np.int64))],
        list(build.schema.names) + [_ROWID_R])

    mids = list(lin.middle[:j])
    joined = None
    # ---- fused path (round-4 verdict item 5): the pre-join middles
    # run per-shard INSIDE the exchange program. The hidden probe row
    # id is a SOURCE row id threaded through rewritten projects;
    # filters preserve relative order, so source-id order equals the
    # materialized probe's row order and the same restoration sort
    # applies below.
    fused = _fused_probe_prep(lin, mids)
    if fused is not None:
        src2, pre_fns, post_lnames = fused
        try:
            joined = distributed_join_tables(
                mesh, src2, build2, list(opts.left_keys),
                list(opts.right_keys), jt, left_pre_fns=pre_fns)
            probe_names = post_lnames
            sentinel = lin.table.num_rows
            if pre_fns:
                _count("join_fused_pre")
        except NotImplementedError:
            joined = None
    if joined is None:
        # ---- fallback: materialize the probe locally, then exchange
        # (dictionary join keys, or fusion disabled via config) ----
        probe_decl = Declaration("table_source",
                                 TableSourceNodeOptions(lin.table))
        for d in mids:
            probe_decl = Declaration(d.factory_name, d.options,
                                     inputs=[probe_decl])
        probe = probe_decl.to_table()
        if probe.num_rows == 0:
            return None
        pn = probe.num_rows
        probe2 = Table.from_arrays(
            [probe.column(i).combine_chunks()
             for i in range(len(probe.schema.names))]
            + [at.array(np.arange(pn, dtype=np.int64))],
            list(probe.schema.names) + [_ROWID_L])
        try:
            joined = distributed_join_tables(
                mesh, probe2, build2, list(opts.left_keys),
                list(opts.right_keys), jt)
        except NotImplementedError:
            return None
        probe_names = list(probe.schema.names)
        sentinel = pn
    _count("join_exchange")

    # ---- restore the local join's emission order via hidden row ids --
    # (distributed_join_tables suffixes collided names with _l/_r; the
    # hidden names are unique so they survive verbatim). Local emission
    # order (exec.py _join_materialize): probe-major (probe_rowid,
    # build_rowid); right/full outer append unmatched build rows AFTER,
    # in build-row order; right semi/anti emit build rows in build-row
    # order; left semi/anti emit probe rows in probe-row order.
    if build_only:
        rid_r = np.asarray(joined.column(_ROWID_R).to_pylist(),
                           dtype=np.int64)
        perm = np.argsort(rid_r, kind="stable")
        pick = [n for n in build.schema.names]
        outnames = list(pick)
    elif probe_only:
        rid_l = np.asarray(joined.column(_ROWID_L).to_pylist(),
                           dtype=np.int64)
        perm = np.argsort(rid_l, kind="stable")
        lnames = list(opts.left_output) if opts.left_output is not None \
            else list(probe_names)
        pick = list(lnames)
        outnames = list(lnames)
    else:
        rid_l_raw = joined.column(_ROWID_L).to_pylist()
        rid_l = np.asarray(
            [sentinel if v is None else v for v in rid_l_raw],
            dtype=np.int64)  # right/full-outer null rows
        rid_r_raw = joined.column(_ROWID_R).to_pylist()
        rid_r = np.asarray([-1 if v is None else v for v in rid_r_raw],
                           dtype=np.int64)  # left-outer null rows
        perm = np.lexsort((rid_r, rid_l))

        # ---- output naming = _join_output_schema rules ----
        lnames = list(opts.left_output) if opts.left_output is not None \
            else list(probe_names)
        rnames = list(opts.right_output) if opts.right_output is not None \
            else list(build.schema.names)
        probe_all = set(probe_names) | {_ROWID_L}
        pick, outnames = [], []
        for n in lnames:
            jn = n + ("_l" if n in build2.schema.names else "")
            pick.append(jn)
            outnames.append(n + (opts.output_suffix_for_left
                                 if n in rnames else ""))
        for n in rnames:
            jn = n + ("_r" if n in probe_all else "")
            pick.append(jn)
            outnames.append(n + (opts.output_suffix_for_right
                                 if n in lnames else ""))
    idx = at.array(perm.astype(np.int64))
    cols = [joined.column(n).take(idx).combine_chunks()
            for n in pick]
    result = Table.from_arrays(cols, outnames)

    # ---- downstream of the join: recurse distributed ----
    rest = lin.middle[j + 1:]
    tail: List = list(rest)
    if lin.terminal is not None:
        tail.append(lin.terminal)
    tail += list(lin.post_ops)
    cur = Declaration("table_source", TableSourceNodeOptions(result))
    for d in tail:
        # downstream hashjoins keep their ORIGINAL build-side subtree;
        # only the probe side is replaced by the exchanged result
        ins = [cur] + list((d.inputs or [])[1:])
        cur = Declaration(d.factory_name, d.options, inputs=ins)
    if lin.post_fetch is not None:
        cur = Declaration("fetch", lin.post_fetch, inputs=[cur])
    if not tail and lin.post_fetch is None:
        return result
    return cur.to_table(distributed=True, mesh=mesh)


def _distributed_sort_plan(lin, mesh: Mesh) -> Optional[Table]:
    """order_by terminal: local sort + splitter sampling + range
    exchange + merge (parallel/distributed.py, SURVEY §7 stage 5). A
    hidden row-id ascending tiebreaker key reproduces the local stable
    sort's tie order exactly, so output matches single-device
    execution bit-for-bit."""
    from .exec import Declaration
    from .options import TableSourceNodeOptions
    from ..parallel.distributed import distributed_sort_table

    upstream = Declaration("table_source",
                           TableSourceNodeOptions(lin.table))
    for d in lin.middle:
        upstream = Declaration(d.factory_name, d.options,
                               inputs=[upstream])
    t = upstream.to_table() if lin.middle else lin.table
    if t.num_rows == 0:
        return None

    import arrow_tpu as at
    from .. import types as T
    opts = lin.terminal.options
    rid = "__dist_rid__"
    cols = [t.column(i).combine_chunks()
            for i in range(len(t.schema.names))]
    names = list(t.schema.names)
    # dictionary-typed sort keys order by VALUE rank, not code (local
    # order_by routes them through exec._rank_col); pre-rank them into
    # hidden int64 key columns before the range exchange
    sort_keys = []
    _RANKED = (T.TypeId.DICTIONARY, T.TypeId.STRING,
               T.TypeId.LARGE_STRING, T.TypeId.BINARY,
               T.TypeId.LARGE_BINARY)
    for k, (name, order) in enumerate(opts.sort_keys):
        arr = t.column(name).combine()
        if arr.type.id in _RANKED:
            vals = arr.to_pylist()
            nulls = [v is None for v in vals]
            fill = b"" if isinstance(
                next((v for v in vals if v is not None), ""), bytes) \
                else ""
            filled = np.array([fill if v is None else v for v in vals],
                              dtype=object)
            _, inv = np.unique(filled, return_inverse=True)
            pl = [None if m else int(r) for m, r in zip(nulls, inv)]
            hidden = f"__dist_rank_{k}__"
            cols.append(at.array(pl, T.int64()))
            names.append(hidden)
            sort_keys.append((hidden, order))
        else:
            sort_keys.append((name, order))
    t2 = Table.from_arrays(
        cols + [at.array(np.arange(t.num_rows, dtype=np.int64))],
        names + [rid])
    try:
        out = distributed_sort_table(
            mesh, t2, sort_keys + [(rid, "ascending")],
            null_placement=opts.null_placement)
    except NotImplementedError:
        return None
    out = out.select(list(t.schema.names))
    if lin.post_fetch is not None:
        from .options import FetchNodeOptions
        cur = Declaration("table_source", TableSourceNodeOptions(out))
        cur = Declaration("fetch", lin.post_fetch, inputs=[cur])
        out = cur.to_table()
    return out


def _spmd_aggregate(lin, aggs, mesh: Mesh, part_rows: int
                    ) -> Optional[Table]:
    """scan+filter+project+consume as one shard_map program; per-device
    states merged in partition order; finalize + post ops on the host
    stream."""
    try:
        source = _ChunkSource(lin.table, part_rows)
    except NotImplementedError:
        return None
    cap = source.capacity
    n = lin.table.num_rows

    from ..compute.registry import ArrowInvalid
    from ..device.column import capacity_class

    # state-capacity ladder: the common few-groups capacity first; on
    # group-state overflow retry once with a capacity covering every
    # row (groups <= rows, so the second rung cannot overflow). Mirrors
    # the reference grouper's resize-on-demand (grouper.cc:555) under
    # static-shape constraints.
    ladder = [state_rows_env(cap)]
    full = capacity_class(n)
    if full > ladder[0]:
        ladder.append(full)
    last_exc = None
    for S in ladder:
        try:
            return _spmd_aggregate_at(lin, aggs, mesh, part_rows, S)
        except ArrowInvalid as e:
            if "group-state capacity" not in str(e):
                raise
            last_exc = e
    raise last_exc


def _spmd_aggregate_at(lin, aggs, mesh: Mesh, part_rows: int,
                       S: int) -> Optional[Table]:
    from .exec import _segment_fns
    ndev = int(mesh.devices.size)
    axis = mesh.axis_names[0]
    source = _ChunkSource(lin.table, part_rows)
    cap = source.capacity
    ncols = len(source.hosts)

    counts = np.zeros(ndev, np.int32)
    for p in range(source.n_chunks):
        counts[p] = min(part_rows, source.n - p * part_rows)

    # Per-SHARD staging (round-4 verdict item 5): each device's padded
    # partition is built inside the sharding callback — no (ndev, cap)
    # whole-dataset host copy, and in jax.distributed runs each process
    # materializes ONLY its own addressable shards.
    sharding = NamedSharding(mesh, P(axis))

    def stage(host, dtype):
        def cb(idx):
            d = idx[0].start or 0
            start = d * part_rows
            ln = min(max(source.n - start, 0), part_rows)
            shard = np.zeros((1, cap), dtype=dtype)
            if ln > 0:
                shard[0, :ln] = host[start:start + ln]
            return shard
        return jax.make_array_from_callback((ndev, cap), sharding, cb)

    dev_vals = [stage(h.values, h.values.dtype) for h in source.hosts]
    dev_masks = {i: stage(h.mask, np.bool_)
                 for i, h in enumerate(source.hosts)
                 if h.mask is not None}
    from ..parallel.distributed import put_sharded
    dev_counts = put_sharded(counts, sharding)

    mid_fns = _segment_fns(lin.middle) if lin.middle else []
    types = [h.type for h in source.hosts]
    dicts = [h.dictionary for h in source.hosts]
    schema = source.schema

    gb = _ChunkedGroupBy(lin.terminal.options, aggs, S)
    step = gb._make_step()

    def local_batch(v_list: List[jax.Array], m_dict, cnt) -> DeviceBatch:
        cols = []
        for i in range(ncols):
            m = m_dict[i][0] if i in m_dict else None
            cols.append(DeviceColumn(v_list[i][0], m, types[i], dicts[i]))
        b = DeviceBatch(schema, cols, cnt[0])
        for f in mid_fns:
            b = f(b)
        return b

    # value-column metadata (output type + post-recode dictionary) from
    # an abstract trace — no real compute
    from .chunked import _prep_value_col
    probe = jax.eval_shape(
        lambda v, m, c: {a.j: _prep_value_col(a, local_batch(v, m, c))
                         for a in aggs},
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                     dev_vals),
        jax.tree.map(lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
                     dev_masks),
        jax.ShapeDtypeStruct(dev_counts.shape, dev_counts.dtype))
    gb._vmeta = {j: (col.type, col.dictionary) for j, col in probe.items()}

    def spmd(v_list, m_dict, cnt):
        state = step(None, local_batch(v_list, m_dict, cnt))
        return jax.tree.map(lambda a: a[None], state)

    fn = jax.jit(shard_map(spmd, mesh=mesh,
                           in_specs=(P(axis), P(axis), P(axis)),
                           out_specs=P(axis)))
    stacked = fn(dev_vals, dev_masks, dev_counts)

    # ---- merge per-device states in partition order ----
    # gather to host first: in jax.distributed runs other processes'
    # state shards are not locally addressable
    from ..parallel.distributed import gather_host
    stacked = jax.tree.map(gather_host, stacked)
    merge = jax.jit(step.merge_states)
    state = jax.tree.map(lambda a: jnp.asarray(a[0]), stacked)
    for p in range(1, source.n_chunks):
        state = merge(state, jax.tree.map(
            lambda a, p=p: jnp.asarray(a[p]), stacked))
    gb.state = state

    from ..device.column import download_table
    out = download_table(gb.finalize())
    if lin.post_ops:
        from .exec import Declaration
        from .options import TableSourceNodeOptions
        cur = Declaration("table_source", TableSourceNodeOptions(out))
        for d in lin.post_ops:
            # post-op hashjoins keep their ORIGINAL build subtree
            ins = [cur] + list((d.inputs or [])[1:])
            cur = Declaration(d.factory_name, d.options, inputs=ins)
        # distributed recursion keeps aggregation reassociation
        # consistent across every subtree (see _distributed_join_plan)
        out = cur.to_table(distributed=True, mesh=mesh)
    return out
