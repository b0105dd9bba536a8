"""Round-5 planner/API rewrites: column pruning through hashjoins,
positional pc.cast forms, and chunked-fallback visibility.

Reference parity targets: hashjoin output projections
(acero/options.h HashJoinNodeOptions left_output/right_output),
pyarrow's cast wrapper (python/pyarrow/compute.py:298), and explicit
fallback surfacing for the morsel executor.
"""

import warnings

import pytest

import arrow_tpu as at
import arrow_tpu.compute as pc
from arrow_tpu.acero import Declaration
from arrow_tpu.acero.expression import field
from arrow_tpu.acero.options import (AggregateNodeOptions,
                                     FilterNodeOptions,
                                     HashJoinNodeOptions,
                                     ProjectNodeOptions,
                                     TableSourceNodeOptions,
                                     UnionNodeOptions)
from arrow_tpu.acero.prune import output_names, prune_plan


def _src(t):
    return Declaration("table_source", TableSourceNodeOptions(t))


def _join_plan(jt="inner", suffix=False, left_output=None,
               right_output=None):
    left = at.table({"k": [1, 2, 3, 4], "a": [10, 20, 30, 40],
                     "b": [1.0, 2.0, 3.0, 4.0]})
    right = at.table({"k": [2, 3, 5], "c": [200, 300, 500],
                      "b": [9.0, 8.0, 7.0]})
    opts = HashJoinNodeOptions(
        jt, left_keys=["k"], right_keys=["k"],
        left_output=left_output, right_output=right_output,
        output_suffix_for_left="_l" if suffix else "",
        output_suffix_for_right="_r" if suffix else "")
    return Declaration("hashjoin", opts, inputs=[_src(left), _src(right)])


class TestColumnPruning:
    def test_q3_style_join_outputs_narrowed(self):
        join = _join_plan()
        plan = Declaration.from_sequence([
            join,
            Declaration("project", ProjectNodeOptions(
                [field("a") + field("c")], ["s"])),
        ])
        p = prune_plan(plan)
        j = p.inputs[0]
        assert j.factory_name == "hashjoin"
        assert j.options.left_output == ["a"]
        assert j.options.right_output == ["c"]
        # sources narrowed to key + needed columns
        assert output_names(j.inputs[0]) == ["k", "a"]
        assert output_names(j.inputs[1]) == ["k", "c"]
        # values identical with pruning on and off
        assert p.to_table().equals(plan.to_table())

    def test_prune_values_match_across_join_types(self):
        for jt in ("inner", "left outer", "full outer", "left semi",
                   "left anti"):
            join = _join_plan(jt, suffix=True)
            plan = Declaration.from_sequence([
                join,
                Declaration("aggregate", AggregateNodeOptions(
                    [("a", "sum", None, "sa")], keys=[])),
            ])
            pruned_tbl = prune_plan(plan).to_table()
            import os
            os.environ["ARROW_TPU_PRUNE"] = "off"
            try:
                plain = plan.to_table()
            finally:
                os.environ.pop("ARROW_TPU_PRUNE", None)
            assert pruned_tbl.equals(plain), jt

    def test_collision_partner_kept_for_suffix_stability(self):
        # 'b' exists on both sides; requiring only b_l must keep right
        # 'b' too, so the suffix application (and thus the name b_l)
        # is unchanged
        join = _join_plan(suffix=True)
        plan = Declaration.from_sequence([
            join,
            Declaration("project", ProjectNodeOptions(
                [field("b_l")], ["v"])),
        ])
        p = prune_plan(plan)
        j = p.inputs[0]
        assert "b" in j.options.left_output
        assert "b" in j.options.right_output
        assert p.to_table().equals(plan.to_table())

    def test_to_table_caches_pruned_plan(self):
        join = _join_plan()
        plan = Declaration.from_sequence([
            join,
            Declaration("project", ProjectNodeOptions(
                [field("a")], ["a"])),
        ])
        out1 = plan.to_table()
        cached = plan._pruned_plan
        assert cached is not None
        out2 = plan.to_table()
        assert plan._pruned_plan is cached
        assert out1.equals(out2)

    def test_project_dropped_expressions(self):
        t = at.table({"x": [1, 2, 3], "y": [4, 5, 6]})
        plan = Declaration.from_sequence([
            _src(t),
            # a join above makes the root eligible for pruning; use a
            # pure project chain through prune_plan directly instead
            Declaration("project", ProjectNodeOptions(
                [field("x") * 2, field("y") * 3], ["x2", "y3"])),
            Declaration("project", ProjectNodeOptions(
                [field("x2")], ["x2"])),
        ])
        p = prune_plan(plan)
        mid = p.inputs[0]
        assert [repr(e) for e in mid.options.expressions] == \
            [repr(plan.inputs[0].options.expressions[0])]
        assert p.to_table().equals(plan.to_table())


class TestPositionalCast:
    def test_positional_datatype(self):
        a = at.array([1, 2, 3], at.int64())
        assert pc.cast(a, at.string()).to_pylist() == ["1", "2", "3"]
        assert pc.cast(a, at.float64()).to_pylist() == [1.0, 2.0, 3.0]

    def test_positional_alias_string(self):
        a = at.array([1, 2, 3], at.int64())
        assert pc.cast(a, "string").to_pylist() == ["1", "2", "3"]
        assert pc.cast(a, "float32").to_pylist() == [1.0, 2.0, 3.0]

    def test_positional_with_safe_kwarg(self):
        a = at.array([1.5, 2.0], at.float64())
        with pytest.raises(Exception):
            pc.cast(a, "int32")  # unsafe: 1.5 truncates
        assert pc.cast(a, "int32", safe=False).to_pylist() == [1, 2]

    def test_options_instance_positional(self):
        a = at.array([1, 2], at.int64())
        out = pc.call_function(
            "cast", [a, pc.CastOptions(target_type=at.string())])
        assert out.to_pylist() == ["1", "2"]

    def test_matches_pyarrow(self):
        pa = pytest.importorskip("pyarrow")
        import pyarrow.compute as ppc
        a = at.array([1, 2, 3], at.int64())
        pa_a = pa.array([1, 2, 3], pa.int64())
        assert pc.cast(a, at.string()).to_pylist() == \
            ppc.cast(pa_a, pa.string()).to_pylist()

    def test_other_functions_reject_positional_datatype(self):
        a = at.array([1, 2], at.int64())
        with pytest.raises(pc.ArrowInvalid, match="via options"):
            pc.call_function("add", [a, at.int32()])


class TestChunkedFallbackVisibility:
    def _union_plan(self, n=100_000):
        t = at.table({"x": list(range(n))})
        return Declaration("union", UnionNodeOptions(),
                           inputs=[_src(t), _src(t)])

    def test_warning_names_node_and_rows(self):
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            self._union_plan().to_table(chunk_rows=10_000)
        msgs = [str(x.message) for x in w
                if "chunked execution unavailable" in str(x.message)]
        assert msgs, [str(x.message) for x in w]
        assert "union" in msgs[0] and "200000 rows" in msgs[0]

    def test_supported_shape_no_warning(self):
        t = at.table({"x": list(range(100_000))})
        plan = Declaration.from_sequence([
            _src(t),
            Declaration("filter", FilterNodeOptions(field("x") > 5)),
        ])
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            plan.to_table(chunk_rows=10_000)
        assert not [x for x in w
                    if "chunked execution" in str(x.message)]

    def test_require_chunked_raises(self, monkeypatch):
        monkeypatch.setenv("ARROW_TPU_REQUIRE_CHUNKED", "1")
        with pytest.raises(pc.ArrowInvalid,
                           match="chunked execution unavailable"):
            self._union_plan().to_table(chunk_rows=10_000)
