"""Host-tier grouped aggregations: list / distinct / pivot_wider.

Reference analogues: compute/kernels/hash_aggregate.cc GroupedListImpl,
GroupedDistinctImpl; compute/kernels/pivot_internal.h + hash_aggregate
GroupedPivotImpl. These aggregations produce variable-length (list) or
struct outputs that have no fixed-width device representation, and in the
reference they are memory-bound row scans too — so they run on the host.

Group ordering is FIRST APPEARANCE, matching the device grouper, so host
and device aggregation columns computed for the same plan zip positionally.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from .. import types as T
from ..array.array import Array, array as make_array
from ..table import Table

HOST_AGGS = {"list", "distinct", "pivot_wider",
             "hash_list", "hash_distinct", "hash_pivot_wider"}


def _base(fn: str) -> str:
    return fn[5:] if fn.startswith("hash_") else fn


def _value_type(col_type) -> "T.DataType":
    if col_type.id == T.TypeId.DICTIONARY:
        return col_type.value_type
    return col_type


def maybe_host_aggregate(decl) -> Optional[Table]:
    """Intercept an aggregate plan root whose aggregations include host-tier
    functions. Returns the result Table, or None when not applicable."""
    if decl.factory_name != "aggregate":
        return None
    options = decl.options
    aggs = options.aggregates
    if not any(_base(a[1]) in HOST_AGGS for a in aggs):
        return None

    from .exec import Declaration, execute_declaration
    from ..device.column import download_table
    from .options import AggregateNodeOptions, TableSourceNodeOptions

    seg_keys = list(getattr(options, "segment_keys", ()) or ())
    keys = seg_keys + list(options.keys)

    src = decl.inputs[0]
    if src.factory_name in ("table_source", "named_table", "source",
                            "record_batch_source"):
        tbl = src.options.table
        if hasattr(tbl, "to_table"):  # RecordBatch
            tbl = Table.from_batches([tbl])
    else:
        tbl = download_table(execute_declaration(src, _root=False))

    host = [a for a in aggs if _base(a[1]) in HOST_AGGS]
    dev = [a for a in aggs if _base(a[1]) not in HOST_AGGS]

    host_cols, host_keys = _host_group_aggs(tbl, keys, host)

    named = dict(host_cols)
    if dev:
        dev_decl = Declaration("aggregate",
                               AggregateNodeOptions(dev, keys=keys),
                               [Declaration("table_source",
                                            TableSourceNodeOptions(tbl))])
        dev_tbl = dev_decl.to_table()
        key_arrays = [dev_tbl.column(i).combine()
                      for i in range(len(keys))]
        for i in range(len(keys), dev_tbl.num_columns):
            named[dev_tbl.column_names[i]] = dev_tbl.column(i).combine()
    else:
        key_arrays = host_keys

    arrays = list(key_arrays)
    names = list(keys)
    for target, fn, opts, out_name in aggs:
        arrays.append(named[out_name])
        names.append(out_name)
    out = Table.from_arrays(arrays, names)
    if seg_keys:
        out = out.sort_by([(k, "ascending") for k in seg_keys])
    return out


def _host_group_aggs(tbl: Table, keys: List[str],
                     aggs) -> Tuple[dict, List[Array]]:
    """Compute host-tier aggs; returns ({out_name: Array}, key Arrays in
    first-appearance group order)."""
    from ..compute.registry import ArrowInvalid

    n = tbl.num_rows
    if keys:
        key_lists = [tbl.column(k).combine().to_pylist() for k in keys]
        gmap: dict = {}
        gids = []
        key_rows: List[tuple] = []
        for i in range(n):
            kt = tuple(kl[i] for kl in key_lists)
            g = gmap.get(kt)
            if g is None:
                g = len(gmap)
                gmap[kt] = g
                key_rows.append(kt)
            gids.append(g)
        ngroups = len(gmap)
        key_arrays = [
            make_array([kr[j] for kr in key_rows],
                       _value_type(tbl.column(k).type))
            for j, k in enumerate(keys)]
    else:
        gids = [0] * n
        ngroups = 1
        key_arrays = []

    out: dict = {}
    for target, fn, opts, out_name in aggs:
        base = _base(fn)
        opts = dict(opts or {})
        if base in ("list", "distinct"):
            col = tbl.column(target if isinstance(target, str)
                             else target[0]).combine()
            vals = col.to_pylist()
            buckets: List[list] = [[] for _ in range(ngroups)]
            for g, v in zip(gids, vals):
                buckets[g].append(v)
            if base == "distinct":
                mode = opts.get("mode", "only_valid")
                buckets = [
                    list(dict.fromkeys(
                        b if mode == "all"
                        else [v for v in b if v is not None]))
                    for b in buckets]
            vt = _value_type(col.type)
            out[out_name] = make_array(buckets, T.list_(vt))
        elif base == "pivot_wider":
            if isinstance(target, str) or len(target) != 2:
                raise ArrowInvalid(
                    "pivot_wider requires [key, value] target columns")
            key_names = list(opts.get("key_names") or ())
            behavior = opts.get("unexpected_key_behavior", "ignore")
            kcol = tbl.column(target[0]).combine().to_pylist()
            vcol = tbl.column(target[1]).combine()
            vvals = vcol.to_pylist()
            rows: List[dict] = [dict.fromkeys(key_names)
                                for _ in range(ngroups)]
            known = set(key_names)
            for g, k, v in zip(gids, kcol, vvals):
                if k not in known:
                    if behavior == "raise":
                        raise ArrowInvalid(f"Unexpected pivot key: {k}")
                    continue
                if v is None:
                    continue
                if rows[g][k] is not None:
                    raise ArrowInvalid(
                        "Encountered more than one non-null value for "
                        "the same grouped pivot key")
                rows[g][k] = v
            vt = _value_type(vcol.type)
            st = T.struct([(kn, vt) for kn in key_names])
            out[out_name] = make_array(rows, st)
        else:  # pragma: no cover
            raise ArrowInvalid(f"not a host aggregation: {fn}")
    return out, key_arrays
