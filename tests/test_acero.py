"""Plan-level differential tests vs pyarrow.acero (reference engine),
mirroring the reference's engine-test strategy (SURVEY §4:
hash_join_node_test.cc runs joins against a naive reference join)."""

import numpy as np
import pyarrow as pa
import pyarrow.acero as pacero
import pyarrow.compute as ppc
import pytest

import arrow_tpu as at
from arrow_tpu import acero
from arrow_tpu.acero import Declaration, field
from arrow_tpu.array.array import pylist_equal


def to_pa(t: at.Table) -> pa.Table:
    return pa.table(t.to_pydict())


def sorted_rows(t) -> list:
    rows = (t.to_pylist() if isinstance(t, pa.Table) else t.to_pylist())
    def key(r):
        return tuple((v is None, str(type(v)), v if v is not None else 0)
                     for v in r.values())
    return sorted(rows, key=key)


def make_tables():
    rng = np.random.default_rng(0)
    n = 500
    ours = at.table({
        "k": [f"k{int(v)}" for v in rng.integers(0, 20, n)],
        "v": [None if m else float(v) for m, v in
              zip(rng.random(n) < 0.1, rng.normal(size=n))],
        "q": [int(v) for v in rng.integers(0, 100, n)],
    })
    theirs = to_pa(ours)
    return ours, theirs


def test_filter_project_aggregate_orderby():
    ours_t, pa_t = make_tables()
    plan = Declaration.from_sequence([
        Declaration("table_source", acero.TableSourceNodeOptions(ours_t)),
        Declaration("filter", acero.FilterNodeOptions(field("q") > 30)),
        Declaration("project", acero.ProjectNodeOptions(
            [field("k"), field("v"), field("v") * 2.0], ["k", "v", "v2"])),
        Declaration("aggregate", acero.AggregateNodeOptions(
            [("v", "sum", None, "v_sum"), ("v2", "mean", None, "v2_mean"),
             ("v", "count", None, "n")], keys=["k"])),
        Declaration("order_by", acero.OrderByNodeOptions([("k",
                                                           "ascending")])),
    ])
    ours = plan.to_table()

    pa_plan = pacero.Declaration.from_sequence([
        pacero.Declaration("table_source",
                           pacero.TableSourceNodeOptions(pa_t)),
        pacero.Declaration("filter", pacero.FilterNodeOptions(
            ppc.field("q") > 30)),
        pacero.Declaration("project", pacero.ProjectNodeOptions(
            [ppc.field("k"), ppc.field("v"),
             ppc.multiply(ppc.field("v"), 2.0)], ["k", "v", "v2"])),
        pacero.Declaration("aggregate", pacero.AggregateNodeOptions(
            [("v", "hash_sum", None, "v_sum"),
             ("v2", "hash_mean", None, "v2_mean"),
             ("v", "hash_count", None, "n")], keys=["k"])),
        pacero.Declaration("order_by", pacero.OrderByNodeOptions(
            [("k", "ascending")])),
    ])
    theirs = pa_plan.to_table()
    assert ours.column_names == theirs.column_names
    o, t = ours.to_pydict(), theirs.to_pydict()
    assert o["k"] == t["k"]
    assert o["n"] == t["n"]
    np.testing.assert_allclose(o["v_sum"], t["v_sum"], rtol=1e-9)
    np.testing.assert_allclose(o["v2_mean"], t["v2_mean"], rtol=1e-9)


def make_join_tables(n_left=300, n_right=80, nulls=True):
    rng = np.random.default_rng(3)
    lk = [None if (nulls and m) else int(v) for m, v in
          zip(rng.random(n_left) < 0.05, rng.integers(0, 60, n_left))]
    rk = [None if (nulls and m) else int(v) for m, v in
          zip(rng.random(n_right) < 0.05,
              rng.integers(0, 100, n_right))]
    ours_l = at.table({"key": lk,
                       "lv": [float(i) for i in range(n_left)]})
    ours_r = at.table({"key": rk,
                       "rv": [float(-i) for i in range(n_right)]})
    return ours_l, ours_r, to_pa(ours_l), to_pa(ours_r)


JOIN_TYPES = ["inner", "left outer", "right outer", "full outer",
              "left semi", "left anti", "right semi", "right anti"]


@pytest.mark.parametrize("jt", JOIN_TYPES)
def test_hashjoin_vs_reference(jt):
    ol, orr, pl, pr = make_join_tables()
    ours = Declaration("hashjoin", acero.HashJoinNodeOptions(
        jt, left_keys=["key"], right_keys=["key"],
        output_suffix_for_left="_l", output_suffix_for_right="_r"),
        inputs=[
            Declaration("table_source", acero.TableSourceNodeOptions(ol)),
            Declaration("table_source", acero.TableSourceNodeOptions(orr)),
        ]).to_table()
    theirs = pacero.Declaration("hashjoin", pacero.HashJoinNodeOptions(
        jt, left_keys=["key"], right_keys=["key"],
        output_suffix_for_left="_l", output_suffix_for_right="_r"),
        inputs=[
            pacero.Declaration("table_source",
                               pacero.TableSourceNodeOptions(pl)),
            pacero.Declaration("table_source",
                               pacero.TableSourceNodeOptions(pr)),
        ]).to_table()
    assert ours.num_rows == theirs.num_rows
    assert sorted_rows(ours) == sorted_rows(theirs)


def test_join_multikey_and_strings():
    ol = at.table({"a": [1, 1, 2, 2, None], "s": ["x", "y", "x", "y", "x"],
                   "lv": [1, 2, 3, 4, 5]})
    orr = at.table({"a": [1, 2, 2, 3], "s": ["y", "x", "zz", "y"],
                    "rv": [10, 20, 30, 40]})
    ours = Declaration("hashjoin", acero.HashJoinNodeOptions(
        "inner", left_keys=["a", "s"], right_keys=["a", "s"],
        output_suffix_for_left="_l", output_suffix_for_right="_r"),
        inputs=[
            Declaration("table_source", acero.TableSourceNodeOptions(ol)),
            Declaration("table_source", acero.TableSourceNodeOptions(orr)),
        ]).to_table()
    theirs = pacero.Declaration("hashjoin", pacero.HashJoinNodeOptions(
        "inner", left_keys=["a", "s"], right_keys=["a", "s"],
        output_suffix_for_left="_l", output_suffix_for_right="_r"),
        inputs=[
            pacero.Declaration("table_source",
                               pacero.TableSourceNodeOptions(to_pa(ol))),
            pacero.Declaration("table_source",
                               pacero.TableSourceNodeOptions(to_pa(orr))),
        ]).to_table()
    assert sorted_rows(ours) == sorted_rows(theirs)


def test_fetch_and_union():
    t = at.table({"x": list(range(10))})
    plan = Declaration.from_sequence([
        Declaration("table_source", acero.TableSourceNodeOptions(t)),
        Declaration("fetch", acero.FetchNodeOptions(3, 4)),
    ])
    assert plan.to_table().to_pydict() == {"x": [3, 4, 5, 6]}

    u = Declaration("union", acero.UnionNodeOptions(), inputs=[
        Declaration("table_source", acero.TableSourceNodeOptions(
            at.table({"x": [1, 2], "s": ["a", "b"]}))),
        Declaration("table_source", acero.TableSourceNodeOptions(
            at.table({"x": [3], "s": ["c"]}))),
    ])
    assert u.to_table().to_pydict() == {"x": [1, 2, 3],
                                        "s": ["a", "b", "c"]}


def test_scalar_aggregate_node():
    t = at.table({"v": [1.0, 2.0, None, 4.0]})
    plan = Declaration.from_sequence([
        Declaration("table_source", acero.TableSourceNodeOptions(t)),
        Declaration("aggregate", acero.AggregateNodeOptions(
            [("v", "sum", None, "total"), ("v", "mean", None, "avg"),
             ("v", "min_max", None, "mm")])),
    ])
    out = plan.to_table()
    assert out.num_rows == 1
    d = out.to_pydict()
    assert d["total"] == [7.0]
    assert d["avg"] == [pytest.approx(7 / 3)]
    assert d["mm_min"] == [1.0] and d["mm_max"] == [4.0]


def test_table_convenience_api():
    t = at.table({"k": ["a", "b", "a"], "v": [1, 2, 3]})
    g = t.group_by("k").aggregate([("v", "sum")])
    pa_g = to_pa(t).group_by("k").aggregate([("v", "sum")])
    assert g.column_names == pa_g.column_names
    assert sorted_rows(g) == sorted_rows(pa_g)

    s = t.sort_by([("v", "descending")])
    assert s.to_pydict()["v"] == [3, 2, 1]

    j = t.join(at.table({"k": ["a"], "w": [9]}), keys="k",
               join_type="inner")
    pa_j = to_pa(t).join(pa.table({"k": ["a"], "w": [9]}), keys="k",
                         join_type="inner")
    assert sorted_rows(j) == sorted_rows(pa_j)

    f = t.filter(field("v") > 1)
    assert f.to_pydict()["v"] == [2, 3]


def test_simplify_with_guarantee():
    from arrow_tpu.acero.expression import simplify_with_guarantee
    e = (field("part") == "x") & (field("v") > 3)
    g = field("part") == "x"
    s = simplify_with_guarantee(e, g)
    # the partition predicate folds away, leaving the data predicate
    assert "part" not in s.field_names()
    e2 = (field("part") == "y") & (field("v") > 3)
    s2 = simplify_with_guarantee(e2, g)
    assert repr(s2) == "False"


def test_segmented_aggregation():
    t = at.table({"seg": [1, 1, 2, 2, 2], "k": ["a", "b", "a", "a", "b"],
                  "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    out = Declaration.from_sequence([
        Declaration("table_source", acero.TableSourceNodeOptions(t)),
        Declaration("aggregate", acero.AggregateNodeOptions(
            [("v", "sum", None, "s")], keys=["k"], segment_keys=["seg"])),
    ]).to_table()
    d = out.to_pydict()
    assert d["seg"] == [1, 1, 2, 2]
    assert d["s"] == [1.0, 2.0, 7.0, 5.0]


def test_record_batch_reader_source():
    """record_batch_reader_source factory (source_node.cc:582)."""
    import io
    from arrow_tpu import ipc
    t = at.table({"x": [1, 2, 3, 4]})
    buf = io.BytesIO()
    with ipc.new_stream(buf, t.schema) as w:
        w.write_table(t)
    buf.seek(0)
    reader = ipc.open_stream(buf)
    d = Declaration("filter",
                    acero.FilterNodeOptions(acero.field("x") > 1),
                    inputs=[Declaration(
                        "record_batch_reader_source",
                        acero.RecordBatchReaderSourceNodeOptions(reader))])
    assert d.to_table().to_pydict() == {"x": [2, 3, 4]}


def test_scan_node_options(tmp_path):
    """'scan' source node (dataset/scan_node.cc:123 analogue) with
    partition pruning through ScanNodeOptions.filter."""
    from arrow_tpu import dataset as ds
    t = at.table({"year": [2020, 2021, 2021], "v": [1.0, 2.0, 3.0]})
    root = str(tmp_path / "scan_ds")
    ds.write_dataset(t, root, partitioning=["year"],
                     partitioning_flavor="hive")
    data = ds.dataset(root, partitioning=ds.partitioning(flavor="hive"))
    plan = Declaration.from_sequence([
        Declaration("scan", acero.ScanNodeOptions(
            data, filter=field("year") == 2021)),
        Declaration("project", acero.ProjectNodeOptions(
            [field("v") * 2.0], ["v2"])),
    ])
    assert sorted(plan.to_table().column("v2").to_pylist()) == [4.0, 6.0]


def test_derived_dictionary_duplicate_values():
    """Kernels that derive new dictionaries (slice/case transforms) can
    produce duplicate dictionary values; value-level comparison semantics
    must hold for every slot (regression: is_in/==/< matched only the
    first slot holding a value)."""
    import arrow_tpu as at
    from arrow_tpu import acero
    from arrow_tpu.acero import Declaration, Expression, field

    t = at.table({"phone": ["13-a", "13-b", "25-c", "31-d", "31-e",
                            "07-f"],
                  "v": [1, 2, 3, 4, 5, 6]})
    pre = [
        Declaration("table_source", acero.TableSourceNodeOptions(t)),
        Declaration("project", acero.ProjectNodeOptions(
            [Expression.call("utf8_slice_codeunits", field("phone"),
                             start=0, stop=2), field("v")],
            ["code", "v"])),
    ]

    def run(cond):
        return Declaration.from_sequence(
            pre + [Declaration("filter", acero.FilterNodeOptions(cond))]
        ).to_table().column("v").to_pylist()

    assert run(Expression.call("is_in", field("code"),
                               value_set=["13", "31"])) == [1, 2, 4, 5]
    assert run(field("code") == "31") == [4, 5]
    assert run(field("code") != "13") == [3, 4, 5, 6]
    assert run(field("code") < "25") == [1, 2, 6]
    assert run(field("code") <= "25") == [1, 2, 3, 6]
    assert run(field("code") > "13") == [3, 4, 5]
    assert run(field("code") >= "13") == [1, 2, 3, 4, 5]
    # literal absent from the dictionary
    assert run(field("code") > "20") == [3, 4, 5]
    assert run(field("code") < "99") == [1, 2, 3, 4, 5, 6]


def test_derived_dictionary_group_join_unique():
    """Group-by / join / unique on a derived (many-to-one transformed)
    string column must key on VALUES, not dictionary codes (regression:
    _map_to_new_dictionary kept duplicate slots)."""
    import arrow_tpu as at
    import arrow_tpu.compute as pc
    from arrow_tpu import acero
    from arrow_tpu.acero import Declaration, Expression, field

    ot = at.table({"phone": ["13-555", "13-666", "25-1", "31-9", "31-8",
                             "07-2"],
                   "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]})
    proj = [
        Declaration("table_source", acero.TableSourceNodeOptions(ot)),
        Declaration("project", acero.ProjectNodeOptions(
            [Expression.call("utf8_slice_codeunits", field("phone"),
                             start=0, stop=2), field("v")],
            ["code", "v"])),
    ]
    grouped = Declaration.from_sequence(proj + [
        Declaration("aggregate", acero.AggregateNodeOptions(
            [("v", "sum", None, "sv")], keys=["code"])),
        Declaration("order_by", acero.OrderByNodeOptions(
            [("code", "ascending")])),
    ]).to_table()
    assert grouped.to_pydict() == {"code": ["07", "13", "25", "31"],
                                   "sv": [6.0, 3.0, 3.0, 9.0]}

    other = at.table({"k": ["13", "31"], "w": [100.0, 200.0]})
    j = Declaration("hashjoin", acero.HashJoinNodeOptions(
        "inner", left_keys=["code"], right_keys=["k"],
        right_output=["w"]),
        inputs=[Declaration.from_sequence(proj),
                Declaration("table_source",
                            acero.TableSourceNodeOptions(other))]
    ).to_table()
    assert j.column("w").to_pylist() == [100.0, 100.0, 200.0, 200.0]

    codes = Declaration.from_sequence(proj).to_table().column("code")
    assert sorted(pc.unique(codes).to_pylist()) == ["07", "13", "25", "31"]


def test_sink_node_family():
    """sink / table_sink / consuming_sink / order_by_sink /
    select_k_sink factories (reference: sink_node.cc:557-561)."""
    import arrow_tpu as at
    from arrow_tpu import acero
    from arrow_tpu.acero import Declaration

    t = at.table({"k": [3, 1, 2, 5, 4], "v": [1., 2., 3., 4., 5.]})
    src = Declaration("table_source", acero.TableSourceNodeOptions(t))

    for name in ("sink", "table_sink"):
        out = Declaration.from_sequence(
            [src, Declaration(name, acero.SinkNodeOptions())]).to_table()
        assert out.num_rows == 5

    out = Declaration.from_sequence(
        [src, Declaration("order_by_sink", acero.OrderBySinkNodeOptions(
            [("k", "descending")]))]).to_table()
    assert out.column("k").combine().to_pylist() == [5, 4, 3, 2, 1]

    out = Declaration.from_sequence(
        [src, Declaration("select_k_sink", acero.SelectKSinkNodeOptions(
            3, [("k", "ascending")]))]).to_table()
    assert out.column("k").combine().to_pylist() == [1, 2, 3]

    seen = []

    class Consumer:
        def __call__(self, rb):
            seen.append(rb.num_rows)

        def finish(self):
            seen.append("finished")

    Declaration.from_sequence(
        [src, Declaration("consuming_sink",
                          acero.ConsumingSinkNodeOptions(Consumer()))]
    ).to_table()
    assert sum(x for x in seen if x != "finished") == 5
    assert seen[-1] == "finished"


class TestQueryContext:
    """Per-query resource management (reference: acero/query_context.h:36
    + QueryOptions exec_plan.h:510): byte accounting, budget enforcement,
    per-node metrics."""

    def _plan(self, n=5000):
        import numpy as np

        import arrow_tpu as at
        from arrow_tpu import acero
        from arrow_tpu.acero import Declaration, field
        rng = np.random.default_rng(0)
        t = at.table({"k": [int(v) for v in rng.integers(0, 7, n)],
                      "v": rng.standard_normal(n)})
        return Declaration.from_sequence([
            Declaration("table_source", acero.TableSourceNodeOptions(t)),
            Declaration("filter", acero.FilterNodeOptions(field("v") > 0)),
            Declaration("aggregate", acero.AggregateNodeOptions(
                [("v", "hash_sum", None, "s")], keys=["k"])),
        ])

    def test_accounting_and_metrics(self):
        from arrow_tpu.acero.query_context import QueryOptions
        plan = self._plan()
        out = plan.to_table(query_options=QueryOptions())
        assert out.num_rows == 7
        qc = plan.last_query_context
        assert qc.bytes_materialized > 0
        factories = [f for f, _, _ in qc.node_metrics]
        # filter fuses into the aggregate's linear segment; the fused
        # terminal and the source both report
        assert "aggregate" in factories and len(factories) >= 2
        assert "materialized bytes" in qc.to_string()

    def test_memory_limit_enforced(self):
        import pytest

        from arrow_tpu.acero.query_context import (ArrowMemoryError,
                                                   QueryOptions)
        plan = self._plan()
        with pytest.raises(ArrowMemoryError):
            plan.to_table(query_options=QueryOptions(memory_limit=128))

    def test_no_context_unaffected(self):
        plan = self._plan()
        assert plan.to_table().num_rows == 7


def test_host_group_by_keeps_null_and_nan_keys_distinct():
    """ADVICE r3: pandas factorize folds None and float NaN into one NA
    code; reference group-by keys them separately."""
    import math
    import arrow_tpu as at
    from arrow_tpu import acero
    t = at.Table.from_arrays(
        [at.array([None, float("nan"), None, float("nan"), 1.0]),
         at.array([1, 2, 3, 4, 5])], names=["k", "v"])
    decl = acero.Declaration.from_sequence([
        acero.Declaration("table_source",
                          acero.TableSourceNodeOptions(t)),
        acero.Declaration("aggregate", acero.AggregateNodeOptions(
            [("v", "hash_list", None, "s")], keys=["k"])),
    ])
    out = decl.to_table()
    rows = {(("nan" if isinstance(k, float) and math.isnan(k) else k)): s
            for k, s in zip(out.column("k").combine().to_pylist(),
                            out.column("s").combine().to_pylist())}
    assert rows.get(None) == [1, 3]
    assert rows.get("nan") == [2, 4]
    assert rows.get(1.0) == [5]


def test_order_by_fetch_topk_rewrite():
    """order_by + fetch(k<=1024) fuses into the TOP-K program (one
    index-payload sort + k-row direct gathers) and must match the
    full-sort path exactly, including offsets and ties."""
    import numpy as np
    rng = np.random.default_rng(5)
    n = 5000
    t = at.table({
        "a": at.array([int(v) for v in rng.integers(0, 40, n)]),
        "b": at.array([float(v) for v in rng.normal(size=n)]),
        "s": at.array([f"x{int(v)}" for v in rng.integers(0, 9, n)]),
    })
    for offset, k in ((0, 50), (7, 25), (0, 1)):
        decl = Declaration.from_sequence([
            Declaration("table_source", acero.TableSourceNodeOptions(t)),
            Declaration("order_by", acero.OrderByNodeOptions(
                [("a", "ascending"), ("b", "descending")])),
            Declaration("fetch", acero.FetchNodeOptions(offset, k)),
        ])
        got = decl.to_table()
        order = np.lexsort((-np.asarray(t.column("b").to_pylist()),
                            np.asarray(t.column("a").to_pylist())))
        sel = order[offset:offset + k]
        assert got.num_rows == k
        assert got.column("a").to_pylist() == \
            [t.column("a").to_pylist()[i] for i in sel]
        np.testing.assert_allclose(
            got.column("b").to_pylist(),
            [t.column("b").to_pylist()[i] for i in sel], rtol=0)
        assert got.column("s").to_pylist() == \
            [t.column("s").to_pylist()[i] for i in sel]
