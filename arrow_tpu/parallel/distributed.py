"""Distributed execution over a device mesh.

The TPU-native replacement for the reference's distribution story (SURVEY
§2.9 P4/P7/P8): instead of Flight gRPC + per-thread merge phases, rows are
sharded over a 1-D mesh axis and repartitioned with ``all_to_all`` over ICI
under ``shard_map``:

* distributed group-by = local partial aggregate -> hash-partition groups
  -> all_to_all -> final aggregate (beats the reference's merge-into-
  thread-0, groupby_aggregate_node.cc:255, which serializes)
* distributed join = hash-partition both sides' rows by key -> all_to_all
  -> independent local joins (partitioning replaces SwissTableMerge)

Every step is a single SPMD program; XLA overlaps the exchange with
compute where profitable.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..compute.grouper import group_ids
from ..compute.keys import equality_word
from ..compute.registry import ExecContext
from ..device.column import (DeviceBatch, DeviceColumn, round_up,
                             upload_table)
from ..table import Table
from .. import types as T
from ..types import Field
from .. import types as T


def put_sharded(x, sharding: NamedSharding) -> jax.Array:
    """Host/local array -> globally sharded array. Works in BOTH
    single-process and multi-process (jax.distributed) runs: the callback
    materializes only this process's addressable shards, whereas a plain
    device_put of a host array requires every device to be addressable
    (SURVEY §4: archery's process-pair pattern maps to one jax process
    per 'host')."""
    host = np.asarray(x)
    return jax.make_array_from_callback(host.shape, sharding,
                                        lambda idx: host[idx])


def gather_host(x) -> np.ndarray:
    """Sharded global array -> full host ndarray on EVERY process."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def make_mesh(n_devices: Optional[int] = None, axis: str = "d") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _mix64(h: jax.Array) -> jax.Array:
    """splitmix64 finalizer — deterministic partitioning hash."""
    h = h.astype(jnp.uint64)
    h = (h ^ (h >> 30)) * jnp.uint64(0xBF58476D1CE4E5B9)
    h = (h ^ (h >> 27)) * jnp.uint64(0x94D049BB133111EB)
    return h ^ (h >> 31)


def partition_ids(key_words: Sequence[jax.Array], n_parts: int) -> jax.Array:
    h = jnp.zeros_like(key_words[0], dtype=jnp.uint64)
    for w in key_words:
        h = _mix64(h ^ _mix64(w))
    return (h % jnp.uint64(n_parts)).astype(jnp.int32)


def _partition_scatter(rows_valid: jax.Array, pid: jax.Array,
                       n_parts: int, arrays: Sequence[jax.Array]):
    """Scatter rows into (n_parts, cap) send buffers by partition id.
    Returns (buffers..., slot_valid). Routed through the TPU-safe spread
    (compute/move.py) so 64-bit payloads stay linear."""
    from ..compute.move import spread_rows
    cap = pid.shape[0]
    pid = jnp.where(rows_valid, pid, n_parts)
    one_hot = (pid[:, None] == jnp.arange(n_parts, dtype=jnp.int32)[None, :])
    slot = jnp.cumsum(one_hot.astype(jnp.int32), axis=0) - 1
    slot_of_row = jnp.take_along_axis(
        slot, jnp.minimum(pid, n_parts - 1)[:, None], axis=1)[:, 0]
    dest = pid * cap + slot_of_row
    outs, slot_valid = spread_rows(dest, rows_valid, arrays,
                                   n_parts * cap)
    outs = [o.reshape((n_parts, cap) + o.shape[1:]) for o in outs]
    return outs, slot_valid.reshape(n_parts, cap)


class DistAggSpec(NamedTuple):
    column: str          # value column name
    fn: str              # sum | count | min | max | mean
    out_name: str


def distributed_groupby(mesh: Mesh, batch: DeviceBatch,
                        key_names: Sequence[str],
                        aggs: Sequence[DistAggSpec],
                        axis: str = "d"):
    """batch: global DeviceBatch whose arrays are shardable along rows into
    mesh.devices.size equal chunks; row_counts: per-shard live-row counts
    carried in batch.row_count as an (ndev,) array.

    Returns host Table of grouped results (small)."""
    ndev = mesh.devices.size
    cap = batch.capacity
    assert cap % ndev == 0, "global capacity must divide evenly"
    local_cap = cap // ndev

    key_cols = [batch.column(k) for k in key_names]
    agg_cols = [batch.column(a.column) for a in aggs]
    key_types = [c.type for c in key_cols]
    key_dicts = [c.dictionary for c in key_cols]

    ones = put_sharded(np.ones(cap, np.bool_), NamedSharding(mesh, P(axis)))
    vals_in = {f"k{i}": c.values for i, c in enumerate(key_cols)}
    vals_in.update({f"kv{i}": (c.validity if c.validity is not None
                               else ones)
                    for i, c in enumerate(key_cols)})
    vals_in.update({f"a{i}": c.values for i, c in enumerate(agg_cols)})
    vals_in.update({f"av{i}": (c.validity if c.validity is not None
                               else ones)
                    for i, c in enumerate(agg_cols)})
    counts = batch.row_count  # (ndev,) int32
    nk, na = len(key_cols), len(agg_cols)
    fns = [a.fn for a in aggs]

    def spmd(data: Dict[str, jax.Array], cnt: jax.Array):
        # --- phase 1: local partial aggregation --------------------------
        kcols = [DeviceColumn(data[f"k{i}"], data[f"kv{i}"], key_types[i])
                 for i in range(nk)]
        ctx = ExecContext(local_cap, cnt[0])
        g = group_ids(ctx, kcols)
        seg = jnp.minimum(g.group_ids, local_cap - 1)
        live_row = g.group_ids < local_cap

        partials = {}
        for i, fn in enumerate(fns):
            av = data[f"a{i}"]
            alive = jnp.logical_and(live_row, data[f"av{i}"])
            cnt_i = jax.ops.segment_sum(
                jnp.where(alive, 1, 0).astype(jnp.int64), seg,
                num_segments=local_cap)
            if fn in ("sum", "mean"):
                s = jax.ops.segment_sum(
                    jnp.where(alive, av.astype(jnp.float64), 0.0), seg,
                    num_segments=local_cap)
                partials[f"s{i}"] = s
            elif fn == "min":
                partials[f"s{i}"] = jax.ops.segment_min(
                    jnp.where(alive, av.astype(jnp.float64), jnp.inf),
                    seg, num_segments=local_cap)
            elif fn == "max":
                partials[f"s{i}"] = jax.ops.segment_max(
                    jnp.where(alive, av.astype(jnp.float64), -jnp.inf),
                    seg, num_segments=local_cap)
            elif fn == "count":
                partials[f"s{i}"] = cnt_i.astype(jnp.float64)
            partials[f"c{i}"] = cnt_i

        # group-representative keys
        safe_rep = jnp.where(
            jnp.arange(local_cap, dtype=jnp.int64) < g.num_groups,
            g.rep_indices, 0)
        grp_valid = jnp.arange(local_cap, dtype=jnp.int64) < g.num_groups
        gkeys = [data[f"k{i}"][safe_rep] for i in range(nk)]
        gkeyv = [data[f"kv{i}"][safe_rep] for i in range(nk)]

        # --- phase 2: hash-partition groups + all_to_all ------------------
        kwords = []
        for i in range(nk):
            kc = DeviceColumn(gkeys[i], None, key_types[i])
            w = equality_word(kc)
            w = jnp.where(gkeyv[i], w, jnp.uint64(0x517CC1B727220A95))
            kwords.append(w)
        pid = partition_ids(kwords, ndev)
        payload = gkeys + [v.astype(jnp.uint64) for v in gkeyv] + \
            [partials[f"s{i}"] for i in range(na)] + \
            [partials[f"c{i}"] for i in range(na)]
        bufs, slot_valid = _partition_scatter(grp_valid, pid, ndev, payload)
        exchanged = [jax.lax.all_to_all(b, axis, 0, 0, tiled=False)
                     for b in bufs]
        slot_valid_x = jax.lax.all_to_all(slot_valid, axis, 0, 0,
                                          tiled=False)

        # --- phase 3: final aggregation over received groups --------------
        rcap = ndev * local_cap
        flat = [e.reshape((rcap,) + e.shape[2:]) for e in exchanged]
        fvalid = slot_valid_x.reshape(rcap)
        rkeys = flat[:nk]
        rkeyv = [v.astype(jnp.bool_) for v in flat[nk:2 * nk]]
        rsums = flat[2 * nk:2 * nk + na]
        rcounts = flat[2 * nk + na:]

        kcols2 = [DeviceColumn(rkeys[i],
                               jnp.logical_and(rkeyv[i], fvalid),
                               key_types[i]) for i in range(nk)]
        # treat received-invalid rows as padding: give ctx a full mask
        ctx2 = ExecContext(rcap, jnp.asarray(rcap, jnp.int32))
        # mask out dead slots by pushing them into a dedicated key class:
        # set validity via fvalid handled above; dead rows share key but we
        # drop them via counts=0 contributions
        g2 = group_ids(ctx2, kcols2 + [DeviceColumn(
            fvalid.astype(jnp.int8), None, T.int8())])
        seg2 = jnp.minimum(g2.group_ids, rcap - 1)
        out = {}
        for i, fn in enumerate(fns):
            c_i = jnp.where(fvalid, rcounts[i], 0)
            s_i = jnp.where(fvalid, rsums[i],
                            jnp.inf if fn == "min" else
                            (-jnp.inf if fn == "max" else 0.0))
            csum = jax.ops.segment_sum(c_i, seg2, num_segments=rcap)
            if fn in ("sum", "count"):
                out[f"s{i}"] = jax.ops.segment_sum(
                    jnp.where(fvalid, rsums[i], 0.0), seg2,
                    num_segments=rcap)
            elif fn == "mean":
                ssum = jax.ops.segment_sum(
                    jnp.where(fvalid, rsums[i], 0.0), seg2,
                    num_segments=rcap)
                out[f"s{i}"] = ssum / jnp.maximum(csum, 1).astype(
                    jnp.float64)
            elif fn == "min":
                out[f"s{i}"] = jax.ops.segment_min(s_i, seg2,
                                                   num_segments=rcap)
            elif fn == "max":
                out[f"s{i}"] = jax.ops.segment_max(s_i, seg2,
                                                   num_segments=rcap)
            out[f"c{i}"] = csum

        safe2 = jnp.where(
            jnp.arange(rcap, dtype=jnp.int64) < g2.num_groups,
            g2.rep_indices, 0)
        # drop the pure-padding group (fvalid False)
        rep_live = fvalid[safe2]
        n_groups_live = jnp.sum(
            jnp.logical_and(
                jnp.arange(rcap, dtype=jnp.int64) < g2.num_groups,
                rep_live), dtype=jnp.int32)
        out_keys = [rkeys[i][safe2] for i in range(nk)]
        out_keyv = [rkeyv[i][safe2] for i in range(nk)]
        res = {"n": n_groups_live[None],
               "live": jnp.logical_and(
                   jnp.arange(rcap, dtype=jnp.int64) < g2.num_groups,
                   rep_live)}
        for i in range(nk):
            res[f"key{i}"] = out_keys[i]
            res[f"keyv{i}"] = out_keyv[i]
        for i in range(na):
            res[f"agg{i}"] = out[f"s{i}"][safe2]
            res[f"aggc{i}"] = out[f"c{i}"][safe2]
        return res

    in_specs = ({k: P(axis) for k in vals_in}, P(axis))
    out_specs = {k: P(axis) for k in
                 ["n", "live"] + [f"key{i}" for i in range(nk)]
                 + [f"keyv{i}" for i in range(nk)]
                 + [f"agg{i}" for i in range(na)]
                 + [f"aggc{i}" for i in range(na)]}

    fn = jax.jit(shard_map(spmd, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs))
    res = fn(vals_in, counts)
    return _collect_groupby(res, key_names, key_types, key_dicts, aggs,
                            ndev)


def _collect_groupby(res, key_names, key_types, key_dicts, aggs, ndev):
    """Gather per-device disjoint group results into one host Table."""
    from ..device.column import download_column
    live = gather_host(res["live"])
    idx = np.nonzero(live)[0]
    cols = {}
    fields = []
    for i, (nm, t) in enumerate(zip(key_names, key_types)):
        vals = gather_host(res[f"key{i}"])[idx]
        keyv = gather_host(res[f"keyv{i}"])[idx]
        col = DeviceColumn(jnp.asarray(vals), jnp.asarray(keyv), t,
                           key_dicts[i])
        cols[nm] = download_column(col, len(idx))
        fields.append(Field(nm, t))
    for i, a in enumerate(aggs):
        vals = gather_host(res[f"agg{i}"])[idx]
        cnts = gather_host(res[f"aggc{i}"])[idx]
        if a.fn == "count":
            arr_vals = vals.astype(np.int64)
            col = DeviceColumn(jnp.asarray(arr_vals), None, T.int64())
        else:
            valid = cnts > 0
            col = DeviceColumn(jnp.asarray(vals),
                               jnp.asarray(valid), T.float64())
        cols[a.out_name] = download_column(col, len(idx))
    return Table.from_pydict(cols)


def shard_table(mesh: Mesh, table: Table, axis: str = "d") -> DeviceBatch:
    """Upload a table row-sharded across the mesh: rows are split evenly,
    each shard padded to a common local capacity; per-shard live counts
    ride in row_count as an (ndev,) array."""
    ndev = mesh.devices.size
    n = table.num_rows
    per = -(-n // ndev)
    local_cap = round_up(per)
    batches = []
    counts = []
    combined = [c.combine() for c in table.columns]
    from ..table import RecordBatch
    parts = []
    for d in range(ndev):
        start = min(d * per, n)
        ln = min(per, n - start)
        counts.append(ln)
        parts.append(RecordBatch(table.schema,
                                 [c.slice(start, ln) for c in combined]))
    # upload each shard at local_cap then stack on host ordering; rely on
    # jax.device_put with NamedSharding for placement
    from ..device.column import upload_batch
    shard_batches = [upload_batch(p, local_cap) for p in parts]
    # unify dictionaries across shards per column
    cols = []
    for i, f in enumerate(table.schema.fields):
        per_dev = [sb.columns[i] for sb in shard_batches]
        if any(c.dictionary is not None for c in per_dev):
            from ..acero.exec import unify_dictionaries
            per_dev = unify_dictionaries(per_dev)
        values = jnp.concatenate([c.values for c in per_dev])
        if any(c.validity is not None for c in per_dev):
            validity = jnp.concatenate(
                [c.validity if c.validity is not None
                 else jnp.ones(local_cap, jnp.bool_) for c in per_dev])
        else:
            validity = None
        sharding = NamedSharding(mesh, P(axis))
        values = put_sharded(values, sharding)
        if validity is not None:
            validity = put_sharded(validity, sharding)
        cols.append(DeviceColumn(values, validity, f.type,
                                 per_dev[0].dictionary))
    counts_arr = put_sharded(jnp.asarray(counts, jnp.int32),
                             NamedSharding(mesh, P(axis)))
    return DeviceBatch(table.schema, cols, counts_arr)


def distributed_join_tables(mesh: Mesh, left: Table, right: Table,
                            left_keys: Sequence[str],
                            right_keys: Sequence[str],
                            join_type: str = "inner",
                            out_cap_per_device: Optional[int] = None,
                            axis: str = "d",
                            left_pre_fns: Sequence = ()) -> Table:
    """Distributed equi-join: hash-partition both sides' rows across the
    mesh by key, exchange via all_to_all, then run independent local joins
    per device (SURVEY §2.9 P4: partitioning replaces the reference's
    RowArrayMerge/SwissTableMerge phase).

    out_cap_per_device bounds each device's output (static shape); defaults
    to the received probe capacity (sufficient for unique build keys).

    All 8 Acero join types are supported (hash_join_node.cc:707 matrix):
    hash partitioning puts every row of a key on ONE device, so each
    device's local semi/anti/outer decision is globally correct.
    Output sides mirror the local node: probe columns only for left
    semi/anti, build columns only for right semi/anti, probe-major rows
    plus appended unmatched build rows for right/full outer.

    left_pre_fns: jittable DeviceBatch -> DeviceBatch functions
    (filter/project middles, exec.py _segment_fns) applied to each
    device's PROBE partition inside the SPMD program, BEFORE the
    all_to_all — the pre-join work itself is sharded, not just the
    exchange (round-4 verdict item 5; reference contrast:
    swiss_join.cc:1103-1210 partitions the build work)."""
    from ..compute import join as J
    from ..acero.exec import unify_dictionaries
    from ..device.column import download_column

    if join_type not in ("inner", "left outer", "left semi", "left anti",
                         "right semi", "right anti", "right outer",
                         "full outer"):
        raise NotImplementedError(
            f"distributed join type {join_type!r} (use single-device plan)")
    probe_only = join_type in ("left semi", "left anti")
    build_only = join_type in ("right semi", "right anti")
    append_unmatched = join_type in ("right outer", "full outer")
    pre = tuple(left_pre_fns or ())

    ndev = mesh.devices.size
    lb = shard_table(mesh, left, axis)
    rb = shard_table(mesh, right, axis)
    l_cap = lb.capacity // ndev
    r_cap = rb.capacity // ndev

    in_l_types = [c.type for c in lb.columns]
    in_l_dicts = [c.dictionary for c in lb.columns]
    n_in_l = len(lb.columns)
    in_l_schema = lb.schema

    def local_probe_batch(data, cnt):
        cols = [DeviceColumn(data[f"l{i}"], data[f"lv{i}"],
                             in_l_types[i], in_l_dicts[i])
                for i in range(n_in_l)]
        b = DeviceBatch(in_l_schema, cols, cnt[0])
        for f in pre:
            b = f(b)
        return b

    if pre:
        # probe-side metadata AFTER the fused pre-chain (abstract trace;
        # DeviceColumn type/dictionary aux rides through eval_shape)
        spec_data = {}
        for i, c in enumerate(lb.columns):
            spec_data[f"l{i}"] = jax.ShapeDtypeStruct(
                (l_cap,) + c.values.shape[1:], c.values.dtype)
            spec_data[f"lv{i}"] = jax.ShapeDtypeStruct((l_cap,),
                                                       jnp.bool_)
        lmeta = jax.eval_shape(local_probe_batch, spec_data,
                               jax.ShapeDtypeStruct((1,), jnp.int32))
        if lmeta.capacity != l_cap:
            raise NotImplementedError(
                "probe pre-chain changed the partition capacity")
        l_fields = list(lmeta.schema.fields)
        l_types = [c.type for c in lmeta.columns]
        l_dicts = [c.dictionary for c in lmeta.columns]
        lk_idx = [lmeta.schema.get_field_index(k) for k in left_keys]
    else:
        l_fields = list(left.schema.fields)
        l_types = [c.type for c in lb.columns]
        l_dicts = [c.dictionary for c in lb.columns]
        lk_idx = [lb.schema.get_field_index(k) for k in left_keys]
    r_fields = list(right.schema.fields)
    r_types = [c.type for c in rb.columns]
    r_dicts = [c.dictionary for c in rb.columns]
    rk_idx = [rb.schema.get_field_index(k) for k in right_keys]
    nl, nr = len(l_types), len(r_types)

    # unify key dictionaries ACROSS sides (host metadata step). With a
    # fused pre-chain the post-chain key columns exist only inside the
    # trace, so dictionary keys fall back to the unfused path.
    for i, (lk, rk) in enumerate(zip(left_keys, right_keys)):
        ld, rd = l_dicts[lk_idx[i]], r_dicts[rk_idx[i]]
        if ld is None and rd is None:
            continue
        if pre:
            raise NotImplementedError(
                "dictionary join keys with a fused probe pre-chain")
        lc, rc = lb.column(lk), rb.column(rk)
        lc2, rc2 = unify_dictionaries([lc, rc])
        lb.columns[lb.schema.get_field_index(lk)] = lc2
        rb.columns[rb.schema.get_field_index(rk)] = rc2
        l_dicts[lk_idx[i]] = lc2.dictionary
        r_dicts[rk_idx[i]] = rc2.dictionary

    out_cap = out_cap_per_device or (ndev * l_cap)

    def pack(batch, prefix, cap):
        d = {}
        for i, c in enumerate(batch.columns):
            d[f"{prefix}{i}"] = c.values
            d[f"{prefix}v{i}"] = (c.validity if c.validity is not None
                                  else jnp.ones(batch.capacity, jnp.bool_))
        return d

    data = {**pack(lb, "l", l_cap), **pack(rb, "r", r_cap)}

    def exchange_cols(cols, cap, key_idx, count):
        """Hash-partition one side's shard-local columns and all_to_all
        them; returns (received columns compacted to the front, count)."""
        rows_valid = jnp.arange(cap, dtype=jnp.int32) < count
        kwords = []
        for ki in key_idx:
            c = cols[ki]
            valid = (c.validity if c.validity is not None
                     else jnp.ones(cap, jnp.bool_))
            w = equality_word(c)
            kwords.append(jnp.where(valid, w,
                                    jnp.uint64(0x9E3779B97F4A7C15)))
        pid = partition_ids(kwords, ndev)
        payload = [c.values for c in cols] + \
            [(c.validity if c.validity is not None
              else jnp.ones(cap, jnp.bool_)).astype(jnp.uint8)
             for c in cols]
        bufs, slot_valid = _partition_scatter(rows_valid, pid, ndev,
                                              payload)
        ex = [jax.lax.all_to_all(b, axis, 0, 0, tiled=False) for b in bufs]
        sv = jax.lax.all_to_all(slot_valid, axis, 0, 0, tiled=False)
        rcap = ndev * cap
        n_cols = len(cols)
        flat = [e.reshape((rcap,) + e.shape[2:]) for e in ex]
        fvalid = sv.reshape(rcap)
        out = []
        for i in range(n_cols):
            validity = jnp.logical_and(flat[n_cols + i].astype(jnp.bool_),
                                       fvalid)
            out.append(DeviceColumn(flat[i], validity, cols[i].type,
                                    cols[i].dictionary))
        # received rows are scattered (not compacted); row_mask must come
        # from fvalid, so compact them to the front
        from ..compute.selection import compact_column, compaction_indices
        positions, count = compaction_indices(fvalid)
        out = [compact_column(c, positions) for c in out]
        return out, count

    def spmd(data, lcnt, rcnt):
        pb = local_probe_batch(data, lcnt)  # applies the fused pre-chain
        lcols, lcount = exchange_cols(pb.columns, l_cap, lk_idx,
                                      pb.row_count)
        rcols_in = [DeviceColumn(data[f"r{i}"], data[f"rv{i}"],
                                 r_types[i], r_dicts[i])
                    for i in range(nr)]
        rcols, rcount = exchange_cols(rcols_in, r_cap, rk_idx, rcnt[0])
        plan = J.build_join_plan([rcols[i] for i in rk_idx],
                                 [lcols[i] for i in lk_idx],
                                 rcount, lcount, join_type)
        out = {}
        if build_only:
            # pure build-row filter (exec.py right semi/anti): emit the
            # received build rows with a per-row keep mask
            unmatched, matched = J.unmatched_build_plan(plan, rcount)
            keep = matched if join_type == "right semi" else unmatched
            for i in range(nr):
                out[f"r{i}"] = rcols[i].values
                out[f"rv{i}"] = (rcols[i].validity
                                 if rcols[i].validity is not None
                                 else jnp.ones(ndev * r_cap, jnp.bool_))
            out["live"] = keep
            out["n"] = jnp.sum(keep, dtype=jnp.int32)[None]
            return out
        probe_idx, build_idx, build_valid, row_live = \
            J.join_gather_indices(plan, out_cap, join_type)
        safe_p = jnp.clip(probe_idx, 0, ndev * l_cap - 1)
        safe_b = jnp.clip(build_idx, 0, ndev * r_cap - 1)
        for i in range(nl):
            out[f"l{i}"] = lcols[i].values[safe_p]
            lv = (lcols[i].validity[safe_p]
                  if lcols[i].validity is not None
                  else jnp.ones(out_cap, jnp.bool_))
            out[f"lv{i}"] = jnp.logical_and(lv, row_live)
        if not probe_only:
            for i in range(nr):
                out[f"r{i}"] = rcols[i].values[safe_b]
                rv = (rcols[i].validity[safe_b]
                      if rcols[i].validity is not None
                      else jnp.ones(out_cap, jnp.bool_))
                if join_type in ("left outer", "full outer"):
                    rv = jnp.logical_and(rv, build_valid)
                out[f"rv{i}"] = jnp.logical_and(rv, row_live)
        if append_unmatched:
            unmatched, _ = J.unmatched_build_plan(plan, rcount)
            for i in range(nr):
                out[f"u{i}"] = rcols[i].values
                out[f"uv{i}"] = (rcols[i].validity
                                 if rcols[i].validity is not None
                                 else jnp.ones(ndev * r_cap, jnp.bool_))
            out["ulive"] = unmatched
        out["n"] = plan.total.astype(jnp.int32)[None]
        out["live"] = row_live
        return out

    in_specs = ({k: P(axis) for k in data}, P(axis), P(axis))
    if build_only:
        out_names = [f"r{i}" for i in range(nr)] + \
            [f"rv{i}" for i in range(nr)] + ["n", "live"]
    else:
        out_names = [f"l{i}" for i in range(nl)] + \
            [f"lv{i}" for i in range(nl)] + ["n", "live"]
        if not probe_only:
            out_names += [f"r{i}" for i in range(nr)] + \
                [f"rv{i}" for i in range(nr)]
        if append_unmatched:
            out_names += [f"u{i}" for i in range(nr)] + \
                [f"uv{i}" for i in range(nr)] + ["ulive"]
    out_specs = {k: P(axis) for k in out_names}
    fn = jax.jit(shard_map(spmd, mesh=mesh, in_specs=in_specs,
                           out_specs=out_specs))
    res = fn(data, lb.row_count, rb.row_count)

    # host collection of live rows across shards
    from ..device.column import download_column
    live = gather_host(res["live"])
    idx = np.nonzero(live)[0]

    def collect(prefix, i, idx, typ, dic):
        # gather_host (not np.asarray): shards on other PROCESSES are
        # not addressable locally in jax.distributed runs
        col = DeviceColumn(
            jnp.asarray(gather_host(res[f"{prefix}{i}"])[idx]),
            jnp.asarray(gather_host(res[f"{prefix}v{i}"])[idx]),
            typ, dic)
        return download_column(col, len(idx))

    if build_only:
        # right semi/anti: build-side schema verbatim (exec.py parity)
        cols = [collect("r", i, idx, r_types[i], r_dicts[i])
                for i in range(nr)]
        return Table.from_arrays(cols, list(right.schema.names))
    cols, names = [], []
    rnames = set(f.name for f in r_fields)
    for i, f in enumerate(l_fields):
        cols.append(collect("l", i, idx, l_types[i], l_dicts[i]))
        names.append(f.name + ("_l" if not probe_only
                               and f.name in rnames else ""))
    if probe_only:
        # left semi/anti: probe-side schema verbatim, no suffixes
        return Table.from_arrays(cols, names)
    lnames = set(f.name for f in l_fields)
    for i, f in enumerate(r_fields):
        cols.append(collect("r", i, idx, r_types[i], r_dicts[i]))
        names.append(f.name + ("_r" if f.name in lnames else ""))
    main = Table.from_arrays(cols, names)
    if not append_unmatched:
        return main
    # right/full outer: append unmatched build rows with a null probe
    # side (exec.py _join_materialize appends them after the probe-major
    # block, in build-row order — here: shard-major received order; the
    # caller restores exact order via hidden row ids)
    uidx = np.nonzero(gather_host(res["ulive"]))[0]
    ucols = []
    for i, f in enumerate(r_fields):
        ucols.append(collect("u", i, uidx, r_types[i], r_dicts[i]))
    nu = len(uidx)
    import arrow_tpu as at
    null_left = [at.nulls(nu, f.type) for f in l_fields]
    extra = Table.from_arrays(null_left + ucols, names)
    return at.concat_tables([main, extra]).combine_chunks()


def distributed_sort_table(mesh: Mesh, table: Table,
                           sort_keys, null_placement: str = "at_end",
                           axis: str = "d") -> Table:
    """Distributed sort: local sort + splitter sampling + range exchange +
    local merge (SURVEY §7 stage 5). Each device ends with a contiguous,
    globally-ordered range; ranges concatenate on the host in device
    order."""
    from ..compute.keys import sort_key_arrays
    from ..compute.move import sort_with_payload
    from ..compute.registry import ExecContext

    ndev = mesh.devices.size
    sort_keys = [(k, "ascending") if isinstance(k, str) else (k[0], k[1])
                 for k in sort_keys]
    sb = shard_table(mesh, table, axis)
    local_cap = sb.capacity // ndev
    key_idx = [sb.schema.get_field_index(k) for k, _ in sort_keys]
    orders = [o for _, o in sort_keys]
    types = [c.type for c in sb.columns]
    dicts = [c.dictionary for c in sb.columns]
    ncols = len(types)

    # rank-transform dictionary sort keys once (host)
    for ki in key_idx:
        c = sb.columns[ki]
        if c.dictionary is not None:
            from ..acero.exec import _rank_col
            # apply rank transform globally (outside shard_map; elementwise)
            rc = _rank_col(c)
            sb.columns[ki] = DeviceColumn(rc.values.astype(jnp.int64),
                                          c.validity, rc.type, None)
            types[ki] = rc.type

    data = {}
    for i, c in enumerate(sb.columns):
        data[f"c{i}"] = c.values
        data[f"v{i}"] = (c.validity if c.validity is not None
                         else jnp.ones(sb.capacity, jnp.bool_))

    def spmd(data, cnt):
        ctx = ExecContext(local_cap, cnt[0])
        kcols = [DeviceColumn(data[f"c{i}"], data[f"v{i}"], types[i])
                 for i in key_idx]
        keys = sort_key_arrays(kcols, orders, null_placement,
                               ctx.row_mask())
        # sample splitters from the FIRST key word: every device
        # contributes evenly-spaced samples, all_gather, global splitters
        word = keys[1]
        cls = keys[0]
        combined = (cls.astype(jnp.uint64) << jnp.uint64(62)) | \
            (word >> jnp.uint64(2))
        samples = jax.lax.sort(combined)[:: max(local_cap // 32, 1)][:32]
        all_samples = jax.lax.all_gather(samples, axis).reshape(-1)
        ssorted = jax.lax.sort(all_samples)
        n_s = ssorted.shape[0]
        splitters = ssorted[jnp.arange(1, ndev, dtype=jnp.int32)
                            * (n_s // ndev)]
        pid = jnp.searchsorted(splitters, combined).astype(jnp.int32)
        pid = jnp.clip(pid, 0, ndev - 1)
        rows_valid = ctx.row_mask()
        payload = [data[f"c{i}"] for i in range(ncols)] + \
            [data[f"v{i}"].astype(jnp.uint8) for i in range(ncols)]
        bufs, slot_valid = _partition_scatter(rows_valid, pid, ndev,
                                              payload)
        ex = [jax.lax.all_to_all(b, axis, 0, 0, tiled=False)
              for b in bufs]
        sv = jax.lax.all_to_all(slot_valid, axis, 0, 0, tiled=False)
        rcap = ndev * local_cap
        flat = [e.reshape((rcap,) + e.shape[2:]) for e in ex]
        fvalid = sv.reshape(rcap)
        # local sort of the received range (payload carry)
        ctx2 = ExecContext(rcap, jnp.sum(fvalid, dtype=jnp.int32))
        kcols2 = [DeviceColumn(
            flat[i], jnp.logical_and(flat[ncols + i].astype(jnp.bool_),
                                     fvalid), types[i])
            for i in key_idx]
        # dead slots must sort last: row_mask from fvalid
        keys2 = sort_key_arrays(kcols2, orders, null_placement, fvalid)
        outs = sort_with_payload(
            keys2, flat[:ncols] + [f.astype(jnp.bool_) for f in
                                   flat[ncols:]] + [fvalid])
        res = {"live": outs[-1],
               "n": jnp.sum(fvalid, dtype=jnp.int32)[None]}
        for i in range(ncols):
            res[f"c{i}"] = outs[i]
            res[f"v{i}"] = outs[ncols + i]
        return res

    in_specs = ({k: P(axis) for k in data}, P(axis))
    out_names = [f"c{i}" for i in range(ncols)] + \
        [f"v{i}" for i in range(ncols)] + ["live", "n"]
    fn = jax.jit(shard_map(spmd, mesh=mesh, in_specs=in_specs,
                           out_specs={k: P(axis) for k in out_names}))
    res = fn(data, sb.row_count)

    from ..device.column import download_column
    live = gather_host(res["live"])
    idx = np.nonzero(live)[0]  # device-major order == global sort order
    cols, names = [], []
    for i, f in enumerate(table.schema.fields):
        col = DeviceColumn(jnp.asarray(gather_host(res[f"c{i}"])[idx]),
                           jnp.asarray(gather_host(res[f"v{i}"])[idx]),
                           table.schema.fields[i].type, dicts[i])
        cols.append(download_column(col, len(idx)))
        names.append(f.name)
    return Table.from_arrays(cols, names)


def broadcast_join_tables(mesh: Mesh, left: Table, right: Table,
                          left_keys: Sequence[str],
                          right_keys: Sequence[str],
                          join_type: str = "inner",
                          axis: str = "d") -> Table:
    """Skew-immune join for small build sides (BASELINE config 5): the
    right table is replicated to every device, the left stays row-sharded,
    NO exchange happens at all — each device joins its shard locally."""
    from ..compute import join as J
    from ..acero.exec import unify_dictionaries
    from ..device.column import download_column, round_up, upload_table

    if join_type not in ("inner", "left outer"):
        raise NotImplementedError(join_type)
    ndev = mesh.devices.size
    lb = shard_table(mesh, left, axis)
    rb = upload_table(right)  # replicated (default sharding broadcasts)
    for lk, rk in zip(left_keys, right_keys):
        lc, rc = lb.column(lk), rb.column(rk)
        if lc.dictionary is not None or rc.dictionary is not None:
            lc2, rc2 = unify_dictionaries([lc, rc])
            lb.columns[lb.schema.get_field_index(lk)] = lc2
            rb.columns[rb.schema.get_field_index(rk)] = rc2

    l_cap = lb.capacity // ndev
    r_cap = rb.capacity
    out_cap = l_cap  # unique-key build assumption; caller sizes otherwise
    l_types = [c.type for c in lb.columns]
    r_types = [c.type for c in rb.columns]
    lk_idx = [lb.schema.get_field_index(k) for k in left_keys]
    rk_idx = [rb.schema.get_field_index(k) for k in right_keys]
    nl, nr = len(l_types), len(r_types)

    data = {}
    for i, c in enumerate(lb.columns):
        data[f"l{i}"] = c.values
        data[f"lv{i}"] = (c.validity if c.validity is not None
                          else jnp.ones(lb.capacity, jnp.bool_))
    rdata = {}
    for i, c in enumerate(rb.columns):
        rdata[f"r{i}"] = c.values
        rdata[f"rv{i}"] = (c.validity if c.validity is not None
                           else jnp.ones(r_cap, jnp.bool_))

    def spmd(data, rdata, lcnt, rcnt):
        lcols = [DeviceColumn(data[f"l{i}"], data[f"lv{i}"], l_types[i])
                 for i in range(nl)]
        rcols = [DeviceColumn(rdata[f"r{i}"], rdata[f"rv{i}"], r_types[i])
                 for i in range(nr)]
        plan = J.build_join_plan([rcols[i] for i in rk_idx],
                                 [lcols[i] for i in lk_idx],
                                 rcnt[0], lcnt[0], join_type)
        probe_idx, build_idx, build_valid, row_live = \
            J.join_gather_indices(plan, out_cap, join_type)
        out = {}
        safe_p = jnp.clip(probe_idx, 0, l_cap - 1)
        safe_b = jnp.clip(build_idx, 0, r_cap - 1)
        for i in range(nl):
            out[f"l{i}"] = lcols[i].values[safe_p]
            out[f"lv{i}"] = jnp.logical_and(
                lcols[i].validity[safe_p], row_live)
        for i in range(nr):
            rv = rcols[i].validity[safe_b]
            if join_type == "left outer":
                rv = jnp.logical_and(rv, build_valid)
            out[f"r{i}"] = rcols[i].values[safe_b]
            out[f"rv{i}"] = jnp.logical_and(rv, row_live)
        out["live"] = row_live
        return out

    in_specs = ({k: P(axis) for k in data},
                {k: P() for k in rdata}, P(axis), P())
    out_names = [f"l{i}" for i in range(nl)] + \
        [f"lv{i}" for i in range(nl)] + \
        [f"r{i}" for i in range(nr)] + [f"rv{i}" for i in range(nr)] + \
        ["live"]
    rcnt = jnp.asarray([right.num_rows], jnp.int32)
    fn = jax.jit(shard_map(spmd, mesh=mesh,
                           in_specs=in_specs,
                           out_specs={k: P(axis) for k in out_names}))
    res = fn(data, rdata, lb.row_count, rcnt)

    from ..device.column import download_column
    live = gather_host(res["live"])
    idx = np.nonzero(live)[0]
    cols, names = [], []
    rnames = set(right.schema.names)
    lnames = set(left.schema.names)
    l_dicts = [c.dictionary for c in lb.columns]
    r_dicts = [c.dictionary for c in rb.columns]
    for i, f in enumerate(left.schema.fields):
        col = DeviceColumn(jnp.asarray(np.asarray(res[f"l{i}"])[idx]),
                           jnp.asarray(np.asarray(res[f"lv{i}"])[idx]),
                           l_types[i], l_dicts[i])
        cols.append(download_column(col, len(idx)))
        names.append(f.name + ("_l" if f.name in rnames else ""))
    for i, f in enumerate(right.schema.fields):
        col = DeviceColumn(jnp.asarray(np.asarray(res[f"r{i}"])[idx]),
                           jnp.asarray(np.asarray(res[f"rv{i}"])[idx]),
                           r_types[i], r_dicts[i])
        cols.append(download_column(col, len(idx)))
        names.append(f.name + ("_r" if f.name in lnames else ""))
    return Table.from_arrays(cols, names)


def distributed_q1(mesh: Mesh, lineitem: Table,
                   cutoff_days: int = 10471,
                   axis: str = "d") -> Table:
    """Distributed TPC-H Q1: the filter+project stage folds into column
    validity (elementwise ops shard trivially along rows), then the
    grouped aggregation runs through the partial-agg -> all_to_all ->
    final-agg pipeline (SURVEY §2.9 P7). Bit-matches the single-chip Q1
    plan output up to float summation order."""
    db = shard_table(mesh, lineitem, axis)
    price = db.column("l_extendedprice")
    disc = db.column("l_discount")
    tax = db.column("l_tax")
    qty = db.column("l_quantity")
    ship = db.column("l_shipdate")

    keep = ship.values.astype(jnp.int64) <= cutoff_days
    disc_price = price.values * (1.0 - disc.values)
    charge = disc_price * (1.0 + tax.values)

    def masked(col_vals, src):
        validity = src.validity if src.validity is not None else \
            jnp.ones(db.capacity, jnp.bool_)
        return DeviceColumn(col_vals, jnp.logical_and(validity, keep),
                            T.float64())

    cols = list(db.columns)
    schema_fields = list(db.schema)
    from ..types import Field as _F
    for name, vals, src in [("disc_price", disc_price, price),
                            ("charge", charge, price),
                            ("qty_m", qty.values, qty),
                            ("price_m", price.values, price),
                            ("disc_m", disc.values, disc)]:
        cols.append(masked(vals, src))
        schema_fields.append(_F(name, T.float64()))
    from ..types import Schema as _S
    db2 = DeviceBatch(_S(schema_fields), cols, db.row_count)

    out = distributed_groupby(mesh, db2,
                              ["l_returnflag", "l_linestatus"], [
        DistAggSpec("qty_m", "sum", "sum_qty"),
        DistAggSpec("price_m", "sum", "sum_base_price"),
        DistAggSpec("disc_price", "sum", "sum_disc_price"),
        DistAggSpec("charge", "sum", "sum_charge"),
        DistAggSpec("qty_m", "mean", "avg_qty"),
        DistAggSpec("price_m", "mean", "avg_price"),
        DistAggSpec("disc_m", "mean", "avg_disc"),
        DistAggSpec("qty_m", "count", "count_order"),
    ], axis)
    return out.sort_by([("l_returnflag", "ascending"),
                        ("l_linestatus", "ascending")])


def salted_join_tables(mesh: Mesh, left: Table, right: Table,
                       left_keys: Sequence[str],
                       right_keys: Sequence[str],
                       join_type: str = "inner",
                       hot_threshold: Optional[int] = None,
                       n_salts: Optional[int] = None,
                       out_cap_per_device: Optional[int] = None,
                       axis: str = "d") -> Table:
    """Skew-resistant distributed join (BASELINE config 5): hot probe-side
    keys are detected from the key histogram, then salted — hot probe rows
    get a salt in [0, S) spreading them across S partitions, and the
    matching build rows are replicated once per salt. The extended
    (key..., salt) join then rides the standard partitioned exchange
    (`distributed_join_tables`), so no single device receives a hot key's
    full row mass (the reference has no distributed analogue; its
    single-node parallel build partitions by hash prefix,
    swiss_join.cc:1103).

    hot_threshold defaults to 4x the expected per-device probe share;
    n_salts defaults to the device count."""
    import numpy as np

    from ..array.array import array as make_array

    ndev = mesh.devices.size
    n_salts = int(n_salts or ndev)
    hot_threshold = int(hot_threshold or
                        max(4 * left.num_rows // max(ndev, 1), 64))

    # host-side histogram of the probe-side key tuple
    lcols = [left.column(k).to_pylist() for k in left_keys]
    keys = list(zip(*lcols)) if len(lcols) > 1 else [
        (v,) for v in lcols[0]]
    from collections import Counter
    counts = Counter(keys)
    hot = {k for k, c in counts.items() if c > hot_threshold}

    if not hot or n_salts <= 1:
        return distributed_join_tables(
            mesh, left, right, left_keys, right_keys, join_type,
            out_cap_per_device, axis)

    # probe side: hot rows take salt = i mod S, cold rows salt 0
    lhot = np.fromiter((k in hot for k in keys), bool, len(keys))
    lsalt = np.zeros(len(keys), np.int64)
    lsalt[lhot] = np.arange(int(lhot.sum())) % n_salts
    left_s = left.append_column("__salt__", make_array(lsalt))

    # build side: hot-key rows replicated once per salt, others salt 0
    rcols = [right.column(k).to_pylist() for k in right_keys]
    rkeys = list(zip(*rcols)) if len(rcols) > 1 else [
        (v,) for v in rcols[0]]
    rhot = np.fromiter((k in hot for k in rkeys), bool, len(rkeys))
    base = np.arange(len(rkeys), dtype=np.int64)
    rep_idx = np.concatenate([base] + [base[rhot]] * (n_salts - 1))
    rep_salt = np.concatenate(
        [np.zeros(len(rkeys), np.int64)]
        + [np.full(int(rhot.sum()), s, np.int64)
           for s in range(1, n_salts)])
    right_rep = right.take(make_array(rep_idx)).combine_chunks()
    right_s = right_rep.append_column("__salt__", make_array(rep_salt))

    out = distributed_join_tables(
        mesh, left_s, right_s, list(left_keys) + ["__salt__"],
        list(right_keys) + ["__salt__"], join_type,
        out_cap_per_device, axis)
    return out.drop_columns(["__salt__"]) if "__salt__" in \
        out.column_names else out
