"""Multi-device tests on the virtual 8-device CPU mesh (SURVEY §4: fake
mesh via xla_force_host_platform_device_count)."""

import numpy as np
import pytest

import arrow_tpu as at
from arrow_tpu.parallel import (DistAggSpec, distributed_groupby,
                                distributed_join_tables, make_mesh,
                                shard_table)


@pytest.fixture(scope="module")
def mesh():
    import jax
    assert len(jax.devices()) >= 8, "conftest should provide 8 cpu devices"
    return make_mesh(8)


def test_shard_table_roundtrip(mesh):
    t = at.table({"x": list(range(100)), "s": [f"v{i % 7}"
                                               for i in range(100)]})
    db = shard_table(mesh, t)
    assert db.capacity % 8 == 0
    counts = np.asarray(db.row_count)
    assert counts.sum() == 100


def test_distributed_groupby_matches_local(mesh):
    rng = np.random.default_rng(0)
    n = 5000
    t = at.table({
        "k": [f"g{int(v)}" for v in rng.integers(0, 37, n)],
        "v": [None if m else float(v) for m, v in
              zip(rng.random(n) < 0.1, rng.normal(size=n))],
    })
    db = shard_table(mesh, t)
    out = distributed_groupby(mesh, db, ["k"], [
        DistAggSpec("v", "sum", "v_sum"),
        DistAggSpec("v", "mean", "v_mean"),
        DistAggSpec("v", "count", "v_count"),
        DistAggSpec("v", "min", "v_min"),
        DistAggSpec("v", "max", "v_max"),
    ])
    ref = t.group_by("k").aggregate([
        ("v", "sum"), ("v", "mean"), ("v", "count"), ("v", "min"),
        ("v", "max")])
    o = {r["k"]: r for r in out.to_pylist()}
    r = {row["k"]: row for row in ref.to_pylist()}
    assert set(o) == set(r)
    for k in r:
        assert o[k]["v_count"] == r[k]["v_count"]
        assert o[k]["v_sum"] == pytest.approx(r[k]["v_sum"], rel=1e-9)
        assert o[k]["v_mean"] == pytest.approx(r[k]["v_mean"], rel=1e-9)
        assert o[k]["v_min"] == r[k]["v_min"]
        assert o[k]["v_max"] == r[k]["v_max"]


def test_distributed_groupby_multikey_with_nulls(mesh):
    rng = np.random.default_rng(1)
    n = 2000
    t = at.table({
        "a": [None if m else int(v) for m, v in
              zip(rng.random(n) < 0.05, rng.integers(0, 5, n))],
        "b": [f"s{int(v)}" for v in rng.integers(0, 4, n)],
        "v": [float(v) for v in rng.normal(size=n)],
    })
    db = shard_table(mesh, t)
    out = distributed_groupby(mesh, db, ["a", "b"], [
        DistAggSpec("v", "count", "n")])
    ref = t.group_by(["a", "b"]).aggregate([("v", "count")])
    def key(r):
        return (r["a"] if r["a"] is not None else -999, r["b"])
    o = {key(r): r["n"] for r in out.to_pylist()}
    rr = {key(r): r["v_count"] for r in ref.to_pylist()}
    assert o == rr


def test_distributed_join_matches_local(mesh):
    rng = np.random.default_rng(5)
    left = at.table({"key": [int(v) for v in rng.integers(0, 50, 900)],
                     "lv": [float(i) for i in range(900)]})
    right = at.table({"key": list(range(60)),
                      "rv": [float(-i) for i in range(60)]})
    out = distributed_join_tables(mesh, left, right, ["key"], ["key"],
                                  "inner")
    ref = left.join(right, keys="key", join_type="inner",
                    coalesce_keys=False, left_suffix="_l",
                    right_suffix="_r")
    def srt(t):
        return sorted(tuple(r.values()) for r in t.to_pylist())
    assert srt(out) == srt(ref)


def test_distributed_join_string_keys(mesh):
    left = at.table({"k": [f"x{i % 11}" for i in range(300)],
                     "lv": list(range(300))})
    right = at.table({"k": [f"x{i}" for i in range(11)],
                      "rv": list(range(11))})
    out = distributed_join_tables(mesh, left, right, ["k"], ["k"], "inner")
    assert out.num_rows == 300
    for row in out.to_pylist()[:20]:
        assert row["k_l"] == row["k_r"]


def test_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_distributed_sort(mesh):
    rng = np.random.default_rng(3)
    t = at.table({"x": [int(v) for v in rng.integers(0, 10000, 3000)],
                  "tag": [f"t{i % 5}" for i in range(3000)]})
    from arrow_tpu.parallel import distributed_sort_table
    s = distributed_sort_table(mesh, t, [("x", "ascending")])
    assert s.num_rows == 3000
    xs = s.column("x").to_pylist()
    assert xs == sorted(xs)
    # payload stays aligned with its key
    ref = dict(zip(t.column("x").to_pylist(), t.column("tag").to_pylist()))
    for x, tag in zip(xs[:50], s.column("tag").to_pylist()[:50]):
        assert ref[x][0] == "t"


def test_broadcast_join(mesh):
    from arrow_tpu.parallel import broadcast_join_tables
    rng = np.random.default_rng(4)
    # skewed keys: 90% of rows share one key
    keys = [7 if v < 90 else int(v) for v in rng.integers(0, 100, 1500)]
    left = at.table({"key": keys, "lv": list(range(1500))})
    right = at.table({"key": list(range(100)),
                      "rv": [i * 10 for i in range(100)]})
    out = broadcast_join_tables(mesh, left, right, ["key"], ["key"],
                                "inner")
    ref = left.join(right, keys="key", join_type="inner",
                    coalesce_keys=False, left_suffix="_l",
                    right_suffix="_r")
    def srt(t):
        return sorted(tuple(r.values()) for r in t.to_pylist())
    assert srt(out) == srt(ref)


def test_distributed_q1_matches_single_node(mesh):
    """Full TPC-H Q1 on the mesh: elementwise filter/project shard
    trivially; grouped aggregation goes through partial-agg ->
    all_to_all -> final-agg (SURVEY §2.9 P7)."""
    from arrow_tpu.io import tpch, tpch_queries
    from arrow_tpu.parallel.distributed import distributed_q1
    li = tpch.lineitem_table(0.002)
    dist = distributed_q1(mesh, li)
    single = tpch_queries.q1_plan(li).to_table()
    o, s = dist.to_pydict(), single.to_pydict()
    assert o["l_returnflag"] == s["l_returnflag"]
    assert o["l_linestatus"] == s["l_linestatus"]
    for c in ("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge",
              "avg_qty", "avg_price", "avg_disc", "count_order"):
        np.testing.assert_allclose(o[c], s[c], rtol=1e-12)


def test_salted_join_matches_plain_join():
    """Skewed-key join: one key holds ~half the probe rows; the salted
    path must produce exactly the rows of the unsalted distributed join
    (BASELINE config 5)."""
    import numpy as np

    import arrow_tpu as at
    from arrow_tpu.parallel import (distributed_join_tables, make_mesh,
                                    salted_join_tables)

    rng = np.random.default_rng(3)
    n = 2000
    keys = np.where(rng.random(n) < 0.5, 7, rng.integers(0, 100, n))
    left = at.table({"k": at.array(keys.astype(np.int64)),
                     "v": at.array(np.arange(n, dtype=np.int64))})
    right = at.table({"k": at.array(np.arange(100, dtype=np.int64)),
                      "w": at.array(np.arange(100, dtype=np.float64))})
    mesh = make_mesh(8)
    plain = distributed_join_tables(mesh, left, right, ["k"], ["k"])
    salted = salted_join_tables(mesh, left, right, ["k"], ["k"],
                                hot_threshold=200, n_salts=8)
    assert salted.num_rows == plain.num_rows == n

    def kcol(t):
        name = next(c for c in t.column_names if c.startswith("k"))
        return t.column(name).to_pylist()

    ps = sorted(zip(plain.column("v").to_pylist(), kcol(plain),
                    plain.column("w").to_pylist()))
    ss = sorted(zip(salted.column("v").to_pylist(), kcol(salted),
                    salted.column("w").to_pylist()))
    assert ps == ss
    # oracle: w == float(k)
    for v, k, w in ss[:50]:
        assert w == float(k)
