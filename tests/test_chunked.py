"""Chunked (streaming) device execution vs whole-table execution.

The reference streams <=32Ki-row morsels through the plan
(acero/exec_plan.h:57, source_node.cc:122); arrow_tpu's analogue pumps
fixed-capacity DeviceBatch chunks through one jitted per-chunk program
with device-resident carry state (arrow_tpu/acero/chunked.py). These
tests assert the chunked result matches the unchunked result (exactly
for integer/key/order paths; to float tolerance for float sums, which
reassociate at chunk boundaries)."""

import numpy as np
import pytest

import arrow_tpu as at
from arrow_tpu import acero
from arrow_tpu.acero import Declaration, field
from arrow_tpu.acero.chunked import maybe_execute_chunked


def run_both(plan, chunk_rows):
    """(chunked, unchunked) tables; asserts the chunked path actually ran
    (did not fall back to whole-table execution)."""
    chunked = maybe_execute_chunked(plan, chunk_rows)
    assert chunked is not None, "chunked execution unexpectedly fell back"
    return chunked, plan.to_table()


def make_table(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    return at.table({
        "k": [f"k{int(v)}" for v in rng.integers(0, 37, n)],
        "g": [int(v) for v in rng.integers(0, 11, n)],
        "i": [None if m else int(v) for m, v in
              zip(rng.random(n) < 0.08, rng.integers(-1000, 1000, n))],
        "f": [None if m else float(v) for m, v in
              zip(rng.random(n) < 0.08, rng.normal(size=n))],
        "b": [bool(v) for v in rng.random(n) < 0.5],
    })


def source(t):
    return Declaration("table_source", acero.TableSourceNodeOptions(t))


def assert_tables_equal(a, b, float_cols=(), rtol=1e-9):
    assert a.column_names == b.column_names
    assert a.num_rows == b.num_rows
    da, db = a.to_pydict(), b.to_pydict()
    for name in a.column_names:
        if name in float_cols:
            va = [x for x in da[name]]
            vb = [x for x in db[name]]
            assert [x is None for x in va] == [x is None for x in vb], name
            np.testing.assert_allclose(
                [0.0 if x is None else x for x in va],
                [0.0 if x is None else x for x in vb], rtol=rtol,
                atol=1e-12, err_msg=name)
        else:
            assert da[name] == db[name], name


def test_grouped_agg_exact_ints():
    t = make_table()
    plan = Declaration.from_sequence([
        source(t),
        Declaration("aggregate", acero.AggregateNodeOptions(
            [("i", "hash_sum", None, "s"),
             ("i", "hash_min", None, "mn"),
             ("i", "hash_max", None, "mx"),
             ("i", "hash_count", None, "c"),
             (None, "hash_count_all", None, "ca"),
             ("b", "hash_any", None, "any_b"),
             ("b", "hash_all", None, "all_b")], keys=["k"])),
    ])
    chunked, whole = run_both(plan, 700)
    assert_tables_equal(chunked, whole)


def test_grouped_agg_floats_and_stats():
    t = make_table()
    plan = Declaration.from_sequence([
        source(t),
        Declaration("aggregate", acero.AggregateNodeOptions(
            [("f", "hash_sum", None, "s"),
             ("f", "hash_mean", None, "m"),
             ("f", "hash_variance", None, "v"),
             ("f", "hash_stddev", None, "sd")], keys=["k"])),
    ])
    chunked, whole = run_both(plan, 700)
    assert_tables_equal(chunked, whole,
                        float_cols=("s", "m", "v", "sd"), rtol=1e-6)


def test_grouped_first_last_one_min_max():
    t = make_table()
    plan = Declaration.from_sequence([
        source(t),
        Declaration("aggregate", acero.AggregateNodeOptions(
            [("i", "hash_first", None, "fst"),
             ("i", "hash_last", None, "lst"),
             ("k", "hash_min_max", None, "k_mm"),
             ("k", "hash_first", None, "k_first")], keys=["g"])),
    ])
    chunked, whole = run_both(plan, 600)
    assert_tables_equal(chunked, whole)


def test_two_key_groupby():
    t = make_table()
    plan = Declaration.from_sequence([
        source(t),
        Declaration("aggregate", acero.AggregateNodeOptions(
            [("i", "hash_sum", None, "s"),
             ("i", "hash_product", None, "p")], keys=["k", "g"])),
    ])
    chunked, whole = run_both(plan, 900)
    assert_tables_equal(chunked, whole)


def test_scalar_agg_no_keys():
    t = make_table()
    plan = Declaration.from_sequence([
        source(t),
        Declaration("aggregate", acero.AggregateNodeOptions(
            [("i", "sum", None, "s"),
             ("i", "min", None, "mn"),
             ("i", "max", None, "mx"),
             ("i", "count", None, "c"),
             (None, "count_all", None, "ca")])),
    ])
    chunked, whole = run_both(plan, 512)
    assert_tables_equal(chunked, whole)


def test_filter_project_before_aggregate():
    t = make_table()
    plan = Declaration.from_sequence([
        source(t),
        Declaration("filter", acero.FilterNodeOptions(field("g") > 3)),
        Declaration("project", acero.ProjectNodeOptions(
            [field("k"), field("i"), field("i") * 2], ["k", "i", "i2"])),
        Declaration("aggregate", acero.AggregateNodeOptions(
            [("i2", "hash_sum", None, "s"),
             ("i", "hash_count", None, "c")], keys=["k"])),
    ])
    chunked, whole = run_both(plan, 800)
    assert_tables_equal(chunked, whole)


def test_order_by_exact():
    t = make_table()
    plan = Declaration.from_sequence([
        source(t),
        Declaration("order_by", acero.OrderByNodeOptions(
            [("g", "ascending"), ("i", "descending")])),
    ])
    chunked, whole = run_both(plan, 777)
    assert_tables_equal(chunked, whole)


def test_order_by_with_nulls_at_start():
    t = make_table()
    plan = Declaration.from_sequence([
        source(t),
        Declaration("order_by", acero.OrderByNodeOptions(
            [("i", "ascending")], null_placement="at_start")),
    ])
    chunked, whole = run_both(plan, 640)
    assert_tables_equal(chunked, whole)


def test_topk_device_resident():
    t = make_table()
    plan = Declaration.from_sequence([
        source(t),
        Declaration("order_by", acero.OrderByNodeOptions(
            [("i", "descending"), ("g", "ascending")])),
        Declaration("fetch", acero.FetchNodeOptions(0, 25)),
    ])
    chunked, whole = run_both(plan, 1000)
    assert_tables_equal(chunked, whole)


def test_topk_with_offset():
    t = make_table()
    plan = Declaration.from_sequence([
        source(t),
        Declaration("order_by", acero.OrderByNodeOptions(
            [("f", "ascending")])),
        Declaration("fetch", acero.FetchNodeOptions(10, 40)),
    ])
    chunked, whole = run_both(plan, 1000)
    assert_tables_equal(chunked, whole)


def test_fetch_only():
    t = make_table()
    plan = Declaration.from_sequence([
        source(t),
        Declaration("filter", acero.FilterNodeOptions(field("g") >= 2)),
        Declaration("fetch", acero.FetchNodeOptions(100, 500)),
    ])
    chunked, whole = run_both(plan, 600)
    assert_tables_equal(chunked, whole)


def test_passthrough_filter_project():
    t = make_table()
    plan = Declaration.from_sequence([
        source(t),
        Declaration("filter", acero.FilterNodeOptions(field("i") > 0)),
        Declaration("project", acero.ProjectNodeOptions(
            [field("k"), field("i") + field("g")], ["k", "ig"])),
    ])
    chunked, whole = run_both(plan, 450)
    assert_tables_equal(chunked, whole)


@pytest.mark.parametrize("join_type", ["inner", "left outer", "left semi",
                                       "left anti"])
def test_streamed_probe_join(join_type):
    rng = np.random.default_rng(3)
    n = 4000
    left = at.table({
        "key": [int(v) for v in rng.integers(0, 300, n)],
        "lv": [float(v) for v in rng.normal(size=n)],
    })
    right = at.table({
        "key": [int(v) for v in rng.integers(0, 200, 350)],
        "rv": [int(v) for v in rng.integers(0, 9, 350)],
    })
    plan = Declaration("hashjoin", acero.HashJoinNodeOptions(
        join_type, left_keys=["key"], right_keys=["key"]),
        inputs=[source(left), source(right)])
    # join output order is chunk-major; compare as sorted row sets
    chunked = maybe_execute_chunked(plan, 512)
    assert chunked is not None
    whole = plan.to_table()
    assert chunked.column_names == whole.column_names
    assert chunked.num_rows == whole.num_rows

    def rows(t):
        return sorted(
            tuple((v is None, v if v is not None else 0) for v in r.values())
            for r in t.to_pylist())
    assert rows(chunked) == rows(whole)


def test_join_then_aggregate():
    rng = np.random.default_rng(4)
    n = 3000
    left = at.table({
        "key": [int(v) for v in rng.integers(0, 50, n)],
        "q": [int(v) for v in rng.integers(1, 100, n)],
    })
    right = at.table({
        "key": list(range(50)),
        "grp": [f"g{i % 7}" for i in range(50)],
    })
    plan = Declaration.from_sequence([
        Declaration("hashjoin", acero.HashJoinNodeOptions(
            "inner", left_keys=["key"], right_keys=["key"]),
            inputs=[source(left), source(right)]),
        Declaration("aggregate", acero.AggregateNodeOptions(
            [("q", "hash_sum", None, "s"),
             (None, "hash_count_all", None, "n")], keys=["grp"])),
    ])
    chunked, whole = run_both(plan, 640)
    assert_tables_equal(chunked, whole)


def test_state_overflow_raises():
    n = 3000
    t = at.table({"k": list(range(n)), "v": [1] * n})  # all-distinct keys
    plan = Declaration.from_sequence([
        source(t),
        Declaration("aggregate", acero.AggregateNodeOptions(
            [("v", "hash_sum", None, "s")], keys=["k"])),
    ])
    import os
    os.environ["ARROW_TPU_STATE_ROWS"] = "256"
    try:
        with pytest.raises(Exception, match="state capacity"):
            maybe_execute_chunked(plan, 500)
    finally:
        del os.environ["ARROW_TPU_STATE_ROWS"]


def test_large_state_many_groups():
    # more groups than one chunk holds, but within the state bound
    n = 6000
    rng = np.random.default_rng(7)
    keys = [int(v) for v in rng.integers(0, 1500, n)]
    t = at.table({"k": keys, "v": [int(v) for v in
                                   rng.integers(0, 10, n)]})
    plan = Declaration.from_sequence([
        source(t),
        Declaration("aggregate", acero.AggregateNodeOptions(
            [("v", "hash_sum", None, "s")], keys=["k"])),
    ])
    import os
    os.environ["ARROW_TPU_STATE_ROWS"] = "2048"
    try:
        chunked, whole = run_both(plan, 512)
    finally:
        del os.environ["ARROW_TPU_STATE_ROWS"]
    assert_tables_equal(chunked, whole)


def test_env_var_enables_chunking(monkeypatch):
    t = make_table(1200)
    monkeypatch.setenv("ARROW_TPU_CHUNK_ROWS", "300")
    plan = Declaration.from_sequence([
        source(t),
        Declaration("aggregate", acero.AggregateNodeOptions(
            [("i", "hash_sum", None, "s")], keys=["g"])),
    ])
    via_env = plan.to_table()
    monkeypatch.delenv("ARROW_TPU_CHUNK_ROWS")
    whole = plan.to_table()
    assert_tables_equal(via_env, whole)


def test_single_chunk_falls_back():
    t = make_table(100)
    plan = Declaration.from_sequence([
        source(t),
        Declaration("aggregate", acero.AggregateNodeOptions(
            [("i", "hash_sum", None, "s")], keys=["g"])),
    ])
    assert maybe_execute_chunked(plan, 1000) is None


# --- TPC-H shapes (the BASELINE configs that motivated chunking) -------------

def test_q1_chunked_matches_whole():
    from arrow_tpu.io import tpch, tpch_queries
    li = tpch.lineitem_table(0.01)
    plan = tpch_queries.q1_plan(li)
    chunked = maybe_execute_chunked(plan, 8192)
    assert chunked is not None
    whole = plan.to_table()
    assert_tables_equal(
        chunked, whole,
        float_cols=("sum_qty", "sum_base_price", "sum_disc_price",
                    "sum_charge", "avg_qty", "avg_price", "avg_disc"),
        rtol=1e-9)


def test_q3_chunked_matches_whole():
    from arrow_tpu.io import tpch, tpch_queries
    cust = tpch.customer_table(0.01)
    orders = tpch.orders_table(0.01)
    li = tpch.lineitem_table(0.01)
    plan = tpch_queries.q3_plan(cust, orders, li)
    chunked = maybe_execute_chunked(plan, 8192)
    assert chunked is not None
    whole = plan.to_table()
    assert_tables_equal(chunked, whole, float_cols=("revenue",),
                        rtol=1e-9)


def test_q6_chunked_matches_whole():
    from arrow_tpu.io import tpch, tpch_queries
    li = tpch.lineitem_table(0.01)
    plan = tpch_queries.q6_plan(li)
    chunked = maybe_execute_chunked(plan, 8192)
    assert chunked is not None
    whole = plan.to_table()
    assert_tables_equal(chunked, whole, float_cols=("revenue",),
                        rtol=1e-9)


class TestStreamingReader:
    """Declaration.to_reader streams per-chunk batches for terminal-free
    plans (reference: DeclarationToReader — results flow before the
    plan finishes)."""

    def test_streams_incrementally(self):
        import numpy as np

        import arrow_tpu as at
        from arrow_tpu import acero
        from arrow_tpu.acero import Declaration, field
        rng = np.random.default_rng(0)
        n = 300_000
        t = at.table({"x": [int(v) for v in rng.integers(0, 1000, n)],
                      "y": rng.standard_normal(n)})
        plan = Declaration.from_sequence([
            Declaration("table_source", acero.TableSourceNodeOptions(t)),
            Declaration("filter", acero.FilterNodeOptions(
                field("x") < 500)),
            Declaration("project", acero.ProjectNodeOptions(
                [field("x"), field("y") * 2.0], ["x", "y2"])),
        ])
        batches = []
        reader = plan.to_reader(chunk_rows=65536)
        for rb in reader:
            batches.append(rb)
        assert len(batches) > 1  # actually chunked
        got = at.Table.from_batches(batches, batches[0].schema)
        want = plan.to_table()
        assert got.num_rows == want.num_rows
        assert got.to_pydict() == want.to_pydict()

    def test_terminal_plans_fall_back(self):
        import arrow_tpu as at
        from arrow_tpu import acero
        from arrow_tpu.acero import Declaration
        t = at.table({"k": [1, 2, 1], "v": [1.0, 2.0, 3.0]})
        plan = Declaration.from_sequence([
            Declaration("table_source", acero.TableSourceNodeOptions(t)),
            Declaration("aggregate", acero.AggregateNodeOptions(
                [("v", "hash_sum", None, "s")], keys=["k"])),
        ])
        out = list(plan.to_reader())
        assert sum(b.num_rows for b in out) == 2
