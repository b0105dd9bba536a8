"""Device-side TPC-H generation (io/tpch_device.py): schema parity
with the host generator, distribution sanity (the Q1 plan must see the
same selectivity/group structure as uploaded data), seed independence,
and compiled-program reuse across calls."""

import numpy as np

import arrow_tpu as at
from arrow_tpu.device.column import download_table, upload_table
from arrow_tpu.io import tpch
from arrow_tpu.io.tpch_device import q1_device_batch


def test_schema_matches_host_upload():
    dev, n = q1_device_batch(0.001)
    host = upload_table(tpch.lineitem_table(0.001))
    assert dev.schema.names == host.schema.names
    for dc, hc in zip(dev.columns, host.columns):
        assert str(dc.values.dtype) == str(hc.values.dtype), dc
        assert dc.type.id == hc.type.id
        assert (dc.dictionary is None) == (hc.dictionary is None)
        if dc.dictionary is not None:
            assert set(dc.dictionary.to_pylist()) == \
                set(hc.dictionary.to_pylist())


def test_distribution_sanity():
    dev, n = q1_device_batch(0.002)
    q = np.asarray(dev.column("l_quantity").values[:n])
    assert 1.0 <= q.min() and q.max() <= 50.0
    assert 23.0 < q.mean() < 28.0
    d = np.asarray(dev.column("l_discount").values[:n])
    assert 0.0 <= d.min() and d.max() <= 0.10 + 1e-9
    ship = np.asarray(dev.column("l_shipdate").values[:n])
    from arrow_tpu.io.tpch import _EPOCH_1992, _EPOCH_1998
    assert _EPOCH_1992 <= ship.min() and ship.max() < _EPOCH_1998
    rf = np.asarray(dev.column("l_returnflag").values[:n])
    assert set(np.unique(rf)) == {0, 1, 2}


def test_q1_plan_runs_on_device_batch():
    import sys
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from __graft_entry__ import _q1_chain_decls
    from arrow_tpu.acero.exec import compile_chain
    dev, n = q1_device_batch(0.002)
    out = download_table(compile_chain(_q1_chain_decls())(dev))
    assert out.num_rows == 6
    assert sum(out.column("count_order").to_pylist()) <= n
    # ~96% of rows pass the shipdate filter on the real distribution
    assert sum(out.column("count_order").to_pylist()) > 0.9 * n


def test_seeds_differ_and_programs_cached():
    a, _ = q1_device_batch(0.001, seed=1)
    b, _ = q1_device_batch(0.001, seed=2)
    va = np.asarray(a.column("l_quantity").values[:100])
    vb = np.asarray(b.column("l_quantity").values[:100])
    assert not np.array_equal(va, vb)
