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
    n_orders = max(int(1_500_000 * sf), 2)

    # ONE fused generator program (remote compiles on the tunnel can
    # cost 100+ s each when the service is degraded — 16 separate
    # randint dispatches would each pay it)
    names = list(tb.schema.names)
    tmpl_dtypes = [c.values.dtype for c in tb.columns]
    dict_sizes = [len(c.dictionary) if c.dictionary is not None
                  else 0 for c in tb.columns]

    def gen_all(key):
        keys = jax.random.split(key, len(names))

        def ints(k, lo, hi):
            return jax.random.randint(k, (cap,), lo, hi,
                                      dtype=jnp.int32)

        bounds = {
            "l_orderkey": (1, n_orders + 1),
            "l_partkey": (1, max(int(200_000 * sf), 2)),
            "l_suppkey": (1, max(int(10_000 * sf), 2)),
            "l_linenumber": (1, 8),
            "l_quantity": (1, 51),
            "l_extendedprice": (90_000, 10_500_000),
            "l_discount": (0, 11),
            "l_tax": (0, 9),
            "l_shipdate": (_EPOCH_1992, _EPOCH_1998),
            "l_commitdate": (_EPOCH_1992 - 30, _EPOCH_1998 + 30),
            "l_receiptdate": (_EPOCH_1992 + 1, _EPOCH_1998 + 31),
        }
        cents = ("l_extendedprice", "l_discount", "l_tax")
        out = []
        for i, nm in enumerate(names):
            k = keys[i]
            if dict_sizes[i]:
                v = ints(k, 0, dict_sizes[i])
            else:
                lo, hi = bounds[nm]
                v = ints(k, lo, hi)
                if nm in cents:
                    v = v.astype(jnp.float64) * 0.01
            if v.dtype != tmpl_dtypes[i]:
                v = v.astype(tmpl_dtypes[i])
            out.append(v)
        return tuple(out)

    arrays = jax.jit(gen_all)(jax.random.PRNGKey(seed))
    cols = [DeviceColumn(v, None, tcol.type, tcol.dictionary)
            for v, tcol in zip(arrays, tb.columns)]
    return DeviceBatch(tb.schema, cols,
                       jnp.asarray(n, dtype=jnp.int32)), n
