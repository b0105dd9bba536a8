"""Residual (non-equi) hash-join filters across all 8 join types.

Reference: HashJoinNodeOptions::filter + JoinResidualFilter
(acero/options.h, swiss_join_internal.h:882) — the filter is evaluated
on each equi-matched row pair BEFORE join-type semantics, so
outer/semi/anti decisions use post-filter match counts. The oracle here
is an exact nested-loop join in Python over the same inputs.
"""

import pytest

import arrow_tpu as at
from arrow_tpu.acero import Declaration
from arrow_tpu.acero.expression import field
from arrow_tpu.acero.options import (HashJoinNodeOptions,
                                     TableSourceNodeOptions)

LEFT = {
    "k": [1, 1, 2, 3, 4, None, 2],
    "lx": [5, 15, 10, 9, 1, 3, 30],
    "ln": ["a", "b", "c", "d", "e", "f", "g"],
}
RIGHT = {
    "k": [1, 2, 2, 5, None],
    "rx": [10, 20, 5, 7, 8],
    "rn": ["p", "q", "r", "s", "t"],
}


def _oracle(jt, pred):
    """Nested-loop join with residual predicate; returns a multiset of
    output rows (left cols + right cols, None for outer-null sides)."""
    nl, nr = len(LEFT["k"]), len(RIGHT["k"])
    lrows = [tuple(LEFT[c][i] for c in ("k", "lx", "ln"))
             for i in range(nl)]
    rrows = [tuple(RIGHT[c][j] for c in ("k", "rx", "rn"))
             for j in range(nr)]
    pairs = [(i, j) for i in range(nl) for j in range(nr)
             if lrows[i][0] is not None and lrows[i][0] == rrows[j][0]
             and pred(lrows[i], rrows[j])]
    l_matched = {i for i, _ in pairs}
    r_matched = {j for _, j in pairs}
    out = []
    if jt == "inner":
        out = [lrows[i] + rrows[j] for i, j in pairs]
    elif jt == "left outer":
        out = [lrows[i] + rrows[j] for i, j in pairs]
        out += [lrows[i] + (None,) * 3 for i in range(nl)
                if i not in l_matched]
    elif jt == "right outer":
        out = [lrows[i] + rrows[j] for i, j in pairs]
        out += [(None,) * 3 + rrows[j] for j in range(nr)
                if j not in r_matched]
    elif jt == "full outer":
        out = [lrows[i] + rrows[j] for i, j in pairs]
        out += [lrows[i] + (None,) * 3 for i in range(nl)
                if i not in l_matched]
        out += [(None,) * 3 + rrows[j] for j in range(nr)
                if j not in r_matched]
    elif jt == "left semi":
        out = [lrows[i] for i in range(nl) if i in l_matched]
    elif jt == "left anti":
        out = [lrows[i] for i in range(nl) if i not in l_matched]
    elif jt == "right semi":
        out = [rrows[j] for j in range(nr) if j in r_matched]
    elif jt == "right anti":
        out = [rrows[j] for j in range(nr) if j not in r_matched]
    return sorted(out, key=repr)


def _run(jt, expr):
    left = at.table(LEFT)
    right = at.table(RIGHT)
    plan = Declaration(
        "hashjoin",
        HashJoinNodeOptions(
            jt, left_keys=["k"], right_keys=["k"],
            output_suffix_for_left="_l", output_suffix_for_right="_r",
            filter=expr),
        inputs=[Declaration("table_source", TableSourceNodeOptions(left)),
                Declaration("table_source",
                            TableSourceNodeOptions(right))])
    t = plan.to_table()
    d = t.to_pydict()
    names = t.schema.names
    return sorted([tuple(d[n][i] for n in names)
                   for i in range(t.num_rows)], key=repr)


ALL_TYPES = ("inner", "left outer", "right outer", "full outer",
             "left semi", "left anti", "right semi", "right anti")


@pytest.mark.parametrize("jt", ALL_TYPES)
def test_residual_lt_all_types(jt):
    got = _run(jt, field("lx") < field("rx"))
    want = _oracle(jt, lambda lr, rr: lr[1] < rr[1])
    assert got == want, (jt, got, want)


@pytest.mark.parametrize("jt", ALL_TYPES)
def test_residual_sum_predicate(jt):
    got = _run(jt, (field("lx") + field("rx")) >= 25)
    want = _oracle(jt, lambda lr, rr: lr[1] + rr[1] >= 25)
    assert got == want, (jt, got, want)


def test_residual_always_false():
    got = _run("left outer", field("lx") < -1000)
    want = _oracle("left outer", lambda lr, rr: False)
    assert got == want


def test_residual_always_true_matches_plain_join():
    got = _run("inner", field("lx") < 10**9)
    plain = _run_plain("inner")
    assert got == plain


def _run_plain(jt):
    left = at.table(LEFT)
    right = at.table(RIGHT)
    plan = Declaration(
        "hashjoin",
        HashJoinNodeOptions(
            jt, left_keys=["k"], right_keys=["k"],
            output_suffix_for_left="_l", output_suffix_for_right="_r"),
        inputs=[Declaration("table_source", TableSourceNodeOptions(left)),
                Declaration("table_source",
                            TableSourceNodeOptions(right))])
    t = plan.to_table()
    d = t.to_pydict()
    return sorted([tuple(d[n][i] for n in t.schema.names)
                   for i in range(t.num_rows)], key=repr)


def test_residual_with_downstream_project_and_pruning():
    # exercises the prune pass keeping residual-filter fields alive
    left = at.table(LEFT)
    right = at.table(RIGHT)
    plan = Declaration.from_sequence([
        Declaration(
            "hashjoin",
            HashJoinNodeOptions(
                "inner", left_keys=["k"], right_keys=["k"],
                output_suffix_for_left="_l",
                output_suffix_for_right="_r",
                filter=field("lx") < field("rx")),
            inputs=[Declaration("table_source",
                                TableSourceNodeOptions(left)),
                    Declaration("table_source",
                                TableSourceNodeOptions(right))]),
        Declaration("project", __import__(
            "arrow_tpu.acero.options", fromlist=["ProjectNodeOptions"]
        ).ProjectNodeOptions([field("ln")], ["ln"])),
    ])
    got = sorted(plan.to_table().to_pydict()["ln"])
    want = sorted(r[2] for r in _oracle("inner",
                                        lambda lr, rr: lr[1] < rr[1]))
    assert got == want


def test_residual_null_predicate_rejects():
    # lx vs a column with nulls: null comparisons must reject the pair
    left = at.table({"k": [1, 1], "lx": [1, 2]})
    right = at.table({"k": [1], "rx": [None]})
    plan = Declaration(
        "hashjoin",
        HashJoinNodeOptions("left outer", left_keys=["k"],
                            right_keys=["k"],
                            filter=field("lx") < field("rx")),
        inputs=[Declaration("table_source", TableSourceNodeOptions(left)),
                Declaration("table_source",
                            TableSourceNodeOptions(right))])
    t = plan.to_table()
    # both probe rows survive as outer rows with null right side
    assert t.num_rows == 2
    assert t.to_pydict()["rx"] == [None, None]
