"""Device-side TPC-H lineitem generation for at-scale benchmarking.

The tunnel's chronic wedge point is the SF1 host->device upload
(~770 MB over a flaky link; docs/TUNNEL.md — every SF1 attempt across
rounds 1-4 stalled there). The reference's tpch_benchmark generates
data in-process too (acero/tpch_node.cc); the TPU-native equivalent
generates the batch DIRECTLY IN HBM with jax.random, so the only bytes
crossing the tunnel are the compiled program and a tiny template
(schema + dictionaries learned from a 3k-row host sample).

Distributions mirror io/tpch.py lineitem_table column-for-column; the
values differ (threefry vs PCG streams) but the statistics the Q1 plan
sees — selectivity of the shipdate filter, 6 group keys, uniform
quantities/prices — are identical, so rows/s is comparable.
Correctness of the Q1 plan itself is pinned separately by the
SF0.01/SF0.1 differential tests against pyarrow Acero (test_tpch.py).
"""

from __future__ import annotations

from .tpch import _EPOCH_1992, _EPOCH_1998, lineitem_table


def q1_device_batch(scale_factor: float, seed: int = 0,
                    template_sf: float = 0.0005):
    """A full 16-column lineitem DeviceBatch of SF rows generated on
    the device. Schema/types/dictionaries come from a tiny uploaded
    host template so the Q1 program compiled against this batch is
    IDENTICAL to one compiled against an uploaded table."""
    import jax
    import jax.numpy as jnp

    from ..device.column import (DeviceBatch, DeviceColumn, round_up,
                                 upload_table)

    template = lineitem_table(template_sf, seed=seed)
    tb = upload_table(template)

    n = int(6_001_215 * scale_factor)
    cap = round_up(n)
    sf = scale_factor
    keys = jax.random.split(jax.random.PRNGKey(seed), 16)
    kmap = {name: keys[i] for i, name in enumerate(tb.schema.names)}

    def ints(name, lo, hi, dtype):
        v = jax.random.randint(kmap[name], (cap,), lo, hi,
                               dtype=jnp.int32)
        return v if dtype is None else v.astype(dtype)

    def cents(name, lo_cents, hi_cents):
        c = jax.random.randint(kmap[name], (cap,), lo_cents, hi_cents,
                               dtype=jnp.int32)
        return c.astype(jnp.float64) * 0.01

    n_orders = max(int(1_500_000 * sf), 2)
    span = _EPOCH_1998 - _EPOCH_1992
    gen = {
        "l_orderkey": lambda nm: ints(nm, 1, n_orders + 1, jnp.int64),
        "l_partkey": lambda nm: ints(
            nm, 1, max(int(200_000 * sf), 2), jnp.int64),
        "l_suppkey": lambda nm: ints(
            nm, 1, max(int(10_000 * sf), 2), jnp.int64),
        "l_linenumber": lambda nm: ints(nm, 1, 8, jnp.int64),
        "l_quantity": lambda nm: ints(nm, 1, 51, jnp.float64),
        "l_extendedprice": lambda nm: cents(nm, 90_000, 10_500_000),
        "l_discount": lambda nm: cents(nm, 0, 11),
        "l_tax": lambda nm: cents(nm, 0, 9),
        "l_shipdate": lambda nm: ints(nm, _EPOCH_1992, _EPOCH_1998,
                                      None),
        "l_commitdate": lambda nm: ints(nm, _EPOCH_1992 - 30,
                                        _EPOCH_1998 + 30, None),
        "l_receiptdate": lambda nm: ints(nm, _EPOCH_1992 + 1,
                                         _EPOCH_1998 + 31, None),
    }
    cols = []
    for name, tcol in zip(tb.schema.names, tb.columns):
        tmpl_dtype = tcol.values.dtype
        if tcol.dictionary is not None:
            d = len(tcol.dictionary)
            vals = jax.random.randint(kmap[name], (cap,), 0, d,
                                      dtype=jnp.int32).astype(tmpl_dtype)
        else:
            maker = gen[name]
            vals = maker(name)
            if vals.dtype != tmpl_dtype:
                vals = vals.astype(tmpl_dtype)
        cols.append(DeviceColumn(vals, None, tcol.type,
                                 tcol.dictionary))
    return DeviceBatch(tb.schema, cols,
                       jnp.asarray(n, dtype=jnp.int32)), n
