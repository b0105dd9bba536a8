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
from .chunked import (_ChunkedGroupBy, _ChunkSource, _linearize,
                      _norm_aggs, maybe_execute_chunked, state_rows_env)


def maybe_execute_distributed(decl, mesh: Optional[Mesh] = None
                              ) -> Optional[Table]:
    """Execute the Declaration across the mesh; None = unsupported shape
    (caller falls back to single-device execution)."""
    from ..parallel.distributed import make_mesh
    if mesh is None:
        mesh = make_mesh()
    ndev = int(mesh.devices.size)
    lin = _linearize(decl)
    if lin is None:
        return None
    n = lin.table.num_rows
    if n == 0 or ndev <= 1:
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
                return out
    # joins / sort terminals / passthrough: partition-sequential schedule
    # (same contiguous partitioning, partitions run as chunks locally;
    # exchange-partitioned variants live in parallel/distributed.py)
    return maybe_execute_chunked(decl, part_rows)


def _spmd_aggregate(lin, aggs, mesh: Mesh, part_rows: int
                    ) -> Optional[Table]:
    """scan+filter+project+consume as one shard_map program; per-device
    states merged in partition order; finalize + post ops on the host
    stream."""
    from .exec import _segment_fns
    ndev = int(mesh.devices.size)
    axis = mesh.axis_names[0]
    try:
        source = _ChunkSource(lin.table, part_rows)
    except NotImplementedError:
        return None
    cap = source.capacity
    ncols = len(source.hosts)

    # ---- stacked (ndev, cap) host buffers, contiguous partitions ----
    counts = np.zeros(ndev, np.int32)
    vals = [np.zeros((ndev, cap), dtype=h.values.dtype)
            for h in source.hosts]
    masks: Dict[int, np.ndarray] = {
        i: np.zeros((ndev, cap), np.bool_)
        for i, h in enumerate(source.hosts) if h.mask is not None}
    for p in range(source.n_chunks):
        start = p * part_rows
        ln = min(part_rows, source.n - start)
        counts[p] = ln
        for i, h in enumerate(source.hosts):
            vals[i][p, :ln] = h.values[start:start + ln]
            if i in masks:
                masks[i][p, :ln] = h.mask[start:start + ln]

    from ..parallel.distributed import put_sharded
    sharding = NamedSharding(mesh, P(axis))
    dev_vals = [put_sharded(v, sharding) for v in vals]
    dev_masks = {i: put_sharded(m, sharding) for i, m in masks.items()}
    dev_counts = put_sharded(counts, sharding)

    mid_fns = _segment_fns(lin.middle) if lin.middle else []
    types = [h.type for h in source.hosts]
    dicts = [h.dictionary for h in source.hosts]
    schema = source.schema

    S = state_rows_env(cap)
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
    merge = jax.jit(step.merge_states)
    state = jax.tree.map(lambda a: a[0], stacked)
    for p in range(1, source.n_chunks):
        state = merge(state, jax.tree.map(lambda a, p=p: a[p], stacked))
    gb.state = state

    from ..device.column import download_table
    out = download_table(gb.finalize())
    if lin.post_ops:
        from .exec import Declaration
        from .options import TableSourceNodeOptions
        cur = Declaration("table_source", TableSourceNodeOptions(out))
        for d in lin.post_ops:
            cur = Declaration(d.factory_name, d.options, inputs=[cur])
        out = cur.to_table()
    return out
