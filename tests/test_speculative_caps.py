"""Speculative capacity classes (ARROW_TPU_SPECULATIVE_CAPS=on):
repeat executions skip the mid-plan match-count sync and verify at the
end-of-plan sync; an exceeded class re-executes with fresh counts."""
import numpy as np
import pytest

import arrow_tpu as at
from arrow_tpu import acero
from arrow_tpu.acero import Declaration, HashJoinNodeOptions
from arrow_tpu.acero.options import TableSourceNodeOptions


@pytest.fixture()
def spec_on(monkeypatch):
    monkeypatch.setenv("ARROW_TPU_SPECULATIVE_CAPS", "on")
    from arrow_tpu.acero import exec as ex
    ex._SPEC["caps"].clear()
    yield
    ex._SPEC["caps"].clear()


def _join_decl(lt, rt, jt="inner"):
    return Declaration("hashjoin", HashJoinNodeOptions(
        join_type=jt, left_keys=["k"], right_keys=["k"]),
        inputs=[Declaration("table_source", TableSourceNodeOptions(lt)),
                Declaration("table_source", TableSourceNodeOptions(rt))])


def test_repeat_execution_uses_cached_cap(spec_on):
    from arrow_tpu.acero import exec as ex
    lt = at.table({"k": list(range(200)), "a": list(range(200))})
    rt = at.table({"k": [i % 50 for i in range(100)],
                   "b": list(range(100))})
    decl = _join_decl(lt, rt)
    first = decl.to_table().to_pydict()
    assert len(ex._SPEC["caps"]) >= 1      # class remembered
    second = decl.to_table().to_pydict()   # speculated execution
    assert first == second
    # deterministic join content
    assert sorted(first["k"]) == sorted(
        [i % 50 for i in range(100)])


def test_exceeded_cap_reexecutes_correctly(spec_on):
    """Warm the cache with a low-match execution, then swap in a
    high-match build side THROUGH THE SAME OPTIONS NODE: the stale
    class truncates, verification catches it, the re-execution is
    exact."""
    from arrow_tpu.acero import exec as ex
    lt = at.table({"k": list(range(4096)), "a": list(range(4096))})
    # low-match build side at the SAME capacity class as the fat one
    # (4000 rows -> same class) so the speculation key matches
    rt_small = at.table({"k": [999999] * 3999 + [0],
                         "b": list(range(4000))})
    opts = HashJoinNodeOptions(join_type="inner", left_keys=["k"],
                               right_keys=["k"])
    src_l = Declaration("table_source", TableSourceNodeOptions(lt))

    d1 = Declaration("hashjoin", opts, inputs=[
        src_l, Declaration("table_source",
                           TableSourceNodeOptions(rt_small))])
    out1 = d1.to_table()
    assert out1.num_rows == 1          # cap class ~ BLOCK (1024)
    d1.to_table()                          # speculated warm pass

    # same options object, fatter build side at the SAME capacity class
    rt_big = at.table({"k": [i % 16 for i in range(4000)],
                       "b": list(range(4000))})
    # expected matches: each left k in 0..15 matches 250 rows = 4000
    d2 = Declaration("hashjoin", opts, inputs=[
        src_l, Declaration("table_source",
                           TableSourceNodeOptions(rt_big))])
    with pytest.warns(UserWarning, match="speculative capacity"):
        out2 = d2.to_table()
    assert out2.num_rows == 4000
    got = sorted(zip(out2.to_pydict()["k"], out2.to_pydict()["b"]))
    exp = sorted((i % 16, i) for i in range(4000))
    assert got == exp


def test_outer_join_speculation_exact(spec_on):
    lt = at.table({"k": [1, 2, 3], "a": [10, 20, 30]})
    rt = at.table({"k": [2, 3, 4], "b": [200, 300, 400]})
    decl = _join_decl(lt, rt, "full outer")
    first = decl.to_table()
    second = decl.to_table()
    a = {k: sorted(map(repr, v)) for k, v in first.to_pydict().items()}
    b = {k: sorted(map(repr, v)) for k, v in second.to_pydict().items()}
    assert a == b
    assert first.num_rows == 4
