"""Device-side TPC-H lineitem generation for at-scale benchmarking.

The tunnel's chronic wedge points are (a) the SF1 host->device upload
(~770 MB; stalled every SF1 attempt across rounds 1-4) and (b) heavy
first compiles when the compile service degrades (docs/TUNNEL.md
round-4 findings). This generator avoids BOTH: columns are produced by
a splitmix64 hash of iota — pure elementwise u64 arithmetic, the same
program class as a streaming copy — in ONE small fused program, with
NO host->device transfer at all (dictionaries are host-side
DeviceColumn aux; schema/types are built directly).

The reference's tpch_benchmark generates data in-process too
(acero/tpch_node.cc). Distributions mirror io/tpch.py lineitem_table
column-for-column (uniform ints/cents over identical ranges), so the
Q1 plan sees the same filter selectivity, the same 6 group keys and
the same bytes-per-row; rows/s is comparable. Q1 plan correctness is
pinned separately by the SF0.01/SF0.1 differential tests against
pyarrow Acero (tests/test_tpch.py)."""

from __future__ import annotations

import numpy as np

from .. import types as T
from ..array.array import array as make_array
from .tpch import (_EPOCH_1992, _EPOCH_1998, LINESTATUS, RETURNFLAGS,
                   SHIPINSTRUCT, SHIPMODES)


# ONE jitted program PER COLUMN (not one fused 15-output program):
# TUNNEL.md's measured behavior is that small programs execute
# instantly even while a big program sits in the once-per-session
# stall — a ~740 MB-output fused generator is exactly the stall-prone
# shape; sixteen ~64 MB single-output programs are not. Module-level
# with static (cap, column) so every q1_device_batch call at the same
# scale (Q1 rung, sort rung) reuses the compiled programs.
def _gen_column_impl(cap, i, kind, lo, hi, dtype_name, seed_v):
    import jax.numpy as jnp
    iota = jnp.arange(cap, dtype=jnp.uint64)

    def mix(h):
        h = (h ^ (h >> jnp.uint64(30))) * jnp.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> jnp.uint64(27))) * jnp.uint64(0x94D049BB133111EB)
        return h ^ (h >> jnp.uint64(31))

    h = mix(iota ^ mix(jnp.uint64(i + 1) * jnp.uint64(
        0x9E3779B97F4A7C15) + seed_v.astype(jnp.uint64)))
    # multiply-shift range mapping, NOT modulo: u64 division is
    # software-expanded by XLA on TPU into a program large enough to
    # wedge a degraded compile service (ranges fit u32, so
    # (h32 * R) >> 32 is uniform to within 2^-32 bias)
    h32 = h >> jnp.uint64(32)
    u = ((h32 * jnp.uint64(hi - lo)) >> jnp.uint64(32)) \
        .astype(jnp.int64) + lo
    if kind == "cents":
        return u.astype(jnp.float64) * 0.01
    if kind == "float_int":
        return u.astype(jnp.float64)
    return u.astype(dtype_name)


_gen_column = None


def _ensure_gen():
    global _gen_column
    if _gen_column is None:
        import jax
        _gen_column = jax.jit(_gen_column_impl,
                              static_argnums=(0, 1, 2, 3, 4, 5))
    return _gen_column


def q1_device_batch(scale_factor: float, seed: int = 0):
    """A full 16-column lineitem DeviceBatch of SF rows generated on
    the device, one small elementwise program per column. Returns
    (batch, n)."""
    import jax
    import jax.numpy as jnp

    from ..device.column import DeviceBatch, DeviceColumn, round_up
    from ..table import Schema

    n = int(6_001_215 * scale_factor)
    cap = round_up(n)
    sf = scale_factor
    n_orders = max(int(1_500_000 * sf), 2)

    dicts = {
        "l_returnflag": make_array(RETURNFLAGS, T.string()),
        "l_linestatus": make_array(LINESTATUS, T.string()),
        "l_shipinstruct": make_array(SHIPINSTRUCT, T.string()),
        "l_shipmode": make_array(SHIPMODES, T.string()),
    }
    dict_t = T.dictionary(T.int32(), T.string())
    spec = [
        # (name, kind, lo, hi, type, device dtype)
        ("l_orderkey", "int", 1, n_orders + 1, T.int64(), jnp.int64),
        ("l_partkey", "int", 1, max(int(200_000 * sf), 2), T.int64(),
         jnp.int64),
        ("l_suppkey", "int", 1, max(int(10_000 * sf), 2), T.int64(),
         jnp.int64),
        ("l_linenumber", "int", 1, 8, T.int64(), jnp.int64),
        ("l_quantity", "float_int", 1, 51, T.float64(), jnp.float64),
        ("l_extendedprice", "cents", 90_000, 10_500_000, T.float64(),
         jnp.float64),
        ("l_discount", "cents", 0, 11, T.float64(), jnp.float64),
        ("l_tax", "cents", 0, 9, T.float64(), jnp.float64),
        ("l_returnflag", "dict", 0, len(RETURNFLAGS), dict_t,
         jnp.int32),
        ("l_linestatus", "dict", 0, len(LINESTATUS), dict_t, jnp.int32),
        ("l_shipdate", "int", _EPOCH_1992, _EPOCH_1998, T.date32(),
         jnp.int32),
        ("l_commitdate", "int", _EPOCH_1992 - 30, _EPOCH_1998 + 30,
         T.date32(), jnp.int32),
        ("l_receiptdate", "int", _EPOCH_1992 + 1, _EPOCH_1998 + 31,
         T.date32(), jnp.int32),
        ("l_shipinstruct", "dict", 0, len(SHIPINSTRUCT), dict_t,
         jnp.int32),
        ("l_shipmode", "dict", 0, len(SHIPMODES), dict_t, jnp.int32),
    ]

    gen = _ensure_gen()
    seed_dev = jnp.asarray(seed, jnp.uint64)
    arrays = [gen(cap, i, kind, lo, hi, np.dtype(dd).name,
                  seed_dev)
              for i, (name, kind, lo, hi, _t, dd) in enumerate(spec)]
    fields = [T.field(name, t) for (name, _k, _lo, _hi, t, _d) in spec]
    schema = Schema(fields)
    cols = [DeviceColumn(v, None, s[4], dicts.get(s[0]))
            for v, s in zip(arrays, spec)]
    import jax.numpy as _jnp
    return DeviceBatch(schema, cols,
                       _jnp.asarray(n, dtype=_jnp.int32)), n


def _device_batch(spec, n, dicts, seed):
    """Build a DeviceBatch from a column spec, one small program per
    column (same program discipline as q1_device_batch). Spec rows:
    (name, kind, lo, hi, arrow type, device dtype); kind 'iota' emits
    1..n sequential keys (o_orderkey / c_custkey)."""
    import jax.numpy as jnp

    from ..device.column import DeviceBatch, DeviceColumn, round_up
    from ..table import Schema

    cap = round_up(n)
    gen = _ensure_gen()
    seed_dev = jnp.asarray(seed, jnp.uint64)
    cols = []
    for i, (name, kind, lo, hi, t, dd) in enumerate(spec):
        if kind == "iota":
            v = (jnp.arange(cap, dtype=jnp.int64) + 1)
        elif kind == "zeros":
            v = jnp.zeros(cap, dd)
        else:
            v = gen(cap, i, kind, lo, hi, np.dtype(dd).name, seed_dev)
        cols.append(DeviceColumn(v, None, t, dicts.get(name)))
    schema = Schema([T.field(name, t) for (name, _k, _lo, _hi, t, _d)
                     in spec])
    return DeviceBatch(schema, cols, jnp.asarray(n, jnp.int32)), n


def q3_device_plan(scale_factor: float, seed: int = 0, limit: int = 10):
    """TPC-H Q3 Declaration whose three sources are DEVICE-GENERATED
    batches (planted via the table_source upload cache), pre-narrowed to
    the columns Q3 consumes, so no at-scale host->device upload crosses
    the tunnel. Distributions mirror io/tpch.py column-for-column
    (same selectivities and key ranges); Q3 value-correctness is pinned
    separately by the host-table differential tests (tests/test_tpch.py
    vs pyarrow Acero). Returns (plan, lineitem_rows)."""
    import jax.numpy as jnp

    from .. import acero
    from ..acero import Declaration
    from ..acero.expression import field
    from ..table import Table
    from .tpch import MKTSEGMENTS
    from .tpch_queries import DATE_1995_03_15

    sf = scale_factor
    n_li = int(6_001_215 * sf)
    n_ord = max(int(1_500_000 * sf), 2)
    n_cust = max(int(150_000 * sf), 2)
    dict_t = T.dictionary(T.int32(), T.string())
    seg_dict = make_array(MKTSEGMENTS, T.string())

    cust, _ = _device_batch([
        ("c_custkey", "iota", 0, 0, T.int64(), jnp.int64),
        ("c_mktsegment", "int", 0, len(MKTSEGMENTS), dict_t, jnp.int32),
    ], n_cust, {"c_mktsegment": seg_dict}, seed + 11)
    orders, _ = _device_batch([
        ("o_orderkey", "iota", 0, 0, T.int64(), jnp.int64),
        ("o_custkey", "int", 1, n_cust, T.int64(), jnp.int64),
        ("o_orderdate", "int", _EPOCH_1992,
         _EPOCH_1998 - 151, T.date32(), jnp.int32),
        ("o_shippriority", "zeros", 0, 0, T.int64(), jnp.int64),
    ], n_ord, {}, seed + 23)
    lineitem, _ = _device_batch([
        ("l_orderkey", "int", 1, n_ord + 1, T.int64(), jnp.int64),
        ("l_extendedprice", "cents", 90_000, 10_500_000, T.float64(),
         jnp.float64),
        ("l_discount", "cents", 0, 11, T.float64(), jnp.float64),
        ("l_shipdate", "int", _EPOCH_1992, _EPOCH_1998, T.date32(),
         jnp.int32),
    ], n_li, {}, seed + 37)

    def _source(batch):
        # 8-row host template supplies schema/names; the device batch is
        # planted in the table_source upload cache so _execute_node
        # returns it directly (no host->device transfer)
        tmpl = {}
        for f, c in zip(batch.schema.fields, batch.columns):
            if c.dictionary is not None:
                vals = c.dictionary.to_pylist()
                tmpl[f.name] = make_array([vals[0]] * 8, T.string())
            elif f.type.id == T.TypeId.DATE32:
                import datetime
                tmpl[f.name] = make_array(
                    [datetime.date(1995, 1, 1)] * 8, f.type)
            elif f.type.id == T.TypeId.DOUBLE:
                tmpl[f.name] = make_array([0.0] * 8, f.type)
            else:
                tmpl[f.name] = make_array([0] * 8, f.type)
        opts = acero.TableSourceNodeOptions(Table.from_pydict(tmpl))
        opts._device_batch = batch
        return Declaration("table_source", opts)

    co = Declaration("hashjoin", acero.HashJoinNodeOptions(
        "inner", left_keys=["o_custkey"], right_keys=["c_custkey"],
        right_output=[]), inputs=[
            Declaration.from_sequence([
                _source(orders),
                Declaration("filter", acero.FilterNodeOptions(
                    field("o_orderdate") < DATE_1995_03_15))]),
            Declaration.from_sequence([
                _source(cust),
                Declaration("filter", acero.FilterNodeOptions(
                    field("c_mktsegment") == "BUILDING"))])])
    col = Declaration("hashjoin", acero.HashJoinNodeOptions(
        "inner", left_keys=["l_orderkey"], right_keys=["o_orderkey"],
        right_output=["o_orderdate", "o_shippriority"]), inputs=[
            Declaration.from_sequence([
                _source(lineitem),
                Declaration("filter", acero.FilterNodeOptions(
                    field("l_shipdate") > DATE_1995_03_15))]),
            co])
    plan = Declaration.from_sequence([
        col,
        Declaration("project", acero.ProjectNodeOptions(
            [field("l_orderkey"),
             field("l_extendedprice") * (1.0 - field("l_discount")),
             field("o_orderdate"), field("o_shippriority")],
            ["l_orderkey", "volume", "o_orderdate", "o_shippriority"])),
        Declaration("aggregate", acero.AggregateNodeOptions(
            [("volume", "sum", None, "revenue")],
            keys=["l_orderkey", "o_orderdate", "o_shippriority"])),
        Declaration("order_by", acero.OrderByNodeOptions(
            [("revenue", "descending"), ("o_orderdate", "ascending")])),
        Declaration("fetch", acero.FetchNodeOptions(0, limit)),
    ])
    return plan, n_li
