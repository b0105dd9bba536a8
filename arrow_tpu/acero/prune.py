"""Column-pruning plan rewrite (projection pushdown).

Reference analogue: Acero relies on the user (or the dataset scanner's
projection, dataset/scan_node.cc) to narrow columns before a join; the
hash join itself carries an output projection in HashJoinNodeOptions
(acero/options.h `left_output`/`right_output`). This pass derives those
projections automatically: it walks the Declaration tree computing the
set of column names each node's OUTPUT must provide, then

* narrows `hashjoin` nodes' left_output/right_output to the required
  columns (the join materialize program then carries only those buffers
  through the sort-based gather — on the tunneled TPU this is the
  difference between a compilable program and a wedged remote compile:
  TPC-H Q3's lineitem side drops from 16 payload columns to 3),
* narrows `table_source` nodes to the required columns (fewer columns
  uploaded to the device),
* drops `project` expressions whose outputs nothing consumes.

The rewrite is applied once per plan root and cached on the root
Declaration (to_table caches the uploaded batch on the *pruned* source
options, so repeated executions reuse device buffers + jit caches).
ARROW_TPU_PRUNE=off disables it.
"""

from __future__ import annotations

import os
from typing import List, Optional, Set

_SOURCE_FACTORIES = ("table_source", "named_table", "source",
                     "record_batch_source", "exec_batch_source",
                     "array_vector_source", "scan")


def prune_enabled() -> bool:
    return os.environ.get("ARROW_TPU_PRUNE", "on") != "off"


def _source_names(decl) -> Optional[List[str]]:
    tbl = getattr(decl.options, "table", None)
    if tbl is None:
        return None
    try:
        return list(tbl.schema.names)
    except Exception:  # noqa: BLE001 - schema-less source
        return None


def output_names(decl) -> Optional[List[str]]:
    """Names of the columns `decl` produces, or None if unknown (nodes
    whose output schema is data-dependent stop the analysis)."""
    f = decl.factory_name
    if f in _SOURCE_FACTORIES:
        return _source_names(decl)
    if f in ("filter", "fetch", "order_by"):
        return output_names(decl.inputs[0])
    if f == "project":
        o = decl.options
        if o.names is not None:
            return list(o.names)
        from .expression import Expression
        names = []
        for e in o.expressions:
            if e.kind != Expression.KIND_FIELD:
                names.append(repr(e))
            else:
                names.append(e.name)
        return names
    if f == "aggregate":
        o = decl.options
        names = list(getattr(o, "segment_keys", ())) + list(o.keys)
        for (_t, fname, _opts, out_name) in o.aggregates:
            base = fname[5:] if fname.startswith("hash_") else fname
            if base == "min_max":
                names += [f"{out_name}_min", f"{out_name}_max"]
            else:
                # struct-producing aggregates other than min_max keep the
                # analysis conservative: emit the base name; a consumer
                # asking for "{name}_sub" simply won't match and the
                # subtree stays unpruned via required=None at that level.
                names.append(out_name)
        return names
    if f == "hashjoin":
        o = decl.options
        if o.join_type in ("left semi", "left anti"):
            ln = o.left_output if o.left_output is not None \
                else output_names(decl.inputs[0])
            return None if ln is None else list(ln)
        if o.join_type in ("right semi", "right anti"):
            return output_names(decl.inputs[1])
        ln = o.left_output if o.left_output is not None \
            else output_names(decl.inputs[0])
        rn = o.right_output if o.right_output is not None \
            else output_names(decl.inputs[1])
        if ln is None or rn is None:
            return None
        out = []
        for n in ln:
            out.append(n + o.output_suffix_for_left if n in rn else n)
        for n in rn:
            out.append(n + o.output_suffix_for_right if n in ln else n)
        return out
    return None


def _expr_fields(expr) -> List[str]:
    try:
        return expr.field_names()
    except Exception:  # noqa: BLE001
        return []


def prune_plan(root):
    """Return an equivalent Declaration tree with narrowed hashjoin
    outputs / sources / projects. The root's own output is never
    narrowed (required=None at the top)."""
    return _prune(root, None)


def _clone(decl, options, inputs):
    from .exec import Declaration
    return Declaration(decl.factory_name, options, list(inputs))


def _prune(decl, required: Optional[Set[str]]):
    f = decl.factory_name

    if f in _SOURCE_FACTORIES:
        names = _source_names(decl)
        if (required is None or names is None
                or f not in ("table_source", "named_table")):
            return decl
        keep = [n for n in names if n in required]
        if len(keep) == len(names) or not keep:
            return decl
        from .options import TableSourceNodeOptions
        new_opts = TableSourceNodeOptions(
            decl.options.table.select(keep))
        return _clone(decl, new_opts, [])

    if f == "filter":
        need = None
        if required is not None:
            refs = _expr_fields(decl.options.filter_expression)
            need = set(required) | set(refs)
        return _clone(decl, decl.options,
                      [_prune(decl.inputs[0], need)])

    if f == "fetch":
        return _clone(decl, decl.options,
                      [_prune(decl.inputs[0], required)])

    if f == "order_by":
        need = None
        if required is not None:
            need = set(required) | {k for k, _ in decl.options.sort_keys}
        return _clone(decl, decl.options,
                      [_prune(decl.inputs[0], need)])

    if f == "project":
        o = decl.options
        names = output_names(decl)
        exprs = o.expressions
        if required is not None and names is not None:
            keep_idx = [i for i, n in enumerate(names) if n in required]
            if keep_idx and len(keep_idx) < len(names):
                exprs = [o.expressions[i] for i in keep_idx]
                names = [names[i] for i in keep_idx]
                from .options import ProjectNodeOptions
                o = ProjectNodeOptions(exprs, names)
        need = set()
        for e in exprs:
            need.update(_expr_fields(e))
        return _clone(decl, o, [_prune(decl.inputs[0], need)])

    if f == "aggregate":
        o = decl.options
        need = set(getattr(o, "segment_keys", ())) | set(o.keys)
        for (target, _fn, _opts, _out) in o.aggregates:
            if isinstance(target, str):
                need.add(target)
            elif target:
                need.update(t for t in target if isinstance(t, str))
        return _clone(decl, o, [_prune(decl.inputs[0], need)])

    if f == "hashjoin":
        o = decl.options
        ln_all = o.left_output if o.left_output is not None \
            else output_names(decl.inputs[0])
        rn_all = o.right_output if o.right_output is not None \
            else output_names(decl.inputs[1])
        new_o = o
        probe_only = o.join_type in ("left semi", "left anti")
        build_only = o.join_type in ("right semi", "right anti")
        if (required is not None and not build_only
                and ln_all is not None
                and (probe_only or rn_all is not None)):
            rn_all = rn_all or []
            both = set(ln_all) & set(rn_all)
            lkeep = [n for n in ln_all
                     if n in required
                     or (n in both
                         and n + o.output_suffix_for_left in required)]
            rkeep = [] if probe_only else \
                [n for n in rn_all
                 if n in required
                 or (n in both
                     and n + o.output_suffix_for_right in required)]
            # keep collision partners so suffix application is unchanged
            lkeep2 = lkeep + [n for n in ln_all
                              if n in both and n in rkeep
                              and n not in lkeep]
            rkeep2 = rkeep + [n for n in rn_all
                              if n in both and n in lkeep
                              and n not in rkeep]
            lkeep = [n for n in ln_all if n in lkeep2]
            rkeep = [n for n in rn_all if n in rkeep2]
            if (len(lkeep) < len(ln_all)
                    or (not probe_only and len(rkeep) < len(rn_all))):
                import copy
                new_o = copy.copy(o)
                new_o.left_output = lkeep
                if not probe_only:
                    new_o.right_output = rkeep
        # residual filter fields may live on either side
        res_fields: Set[str] = set()
        fexpr = getattr(o, "filter_expression", None)
        if fexpr is not None:
            res_fields = set(_expr_fields(fexpr))
        l_need = None
        r_need = None
        if ln_all is not None:
            sel = new_o.left_output if new_o.left_output is not None \
                else ln_all
            l_need = set(sel) | set(o.left_keys) | res_fields
        if build_only:
            r_need = None
        elif rn_all is not None:
            sel = new_o.right_output if new_o.right_output is not None \
                else rn_all
            r_need = set(sel) | set(o.right_keys) | res_fields
        elif probe_only:
            r_need = set(o.right_keys) | res_fields
        return _clone(decl, new_o, [_prune(decl.inputs[0], l_need),
                                    _prune(decl.inputs[1], r_need)])

    # unknown node (union, asofjoin, pivot, sinks, ...): children must
    # keep every column
    return _clone(decl, decl.options,
                  [_prune(i, None) for i in decl.inputs])
