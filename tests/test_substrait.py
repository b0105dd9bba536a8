"""Substrait producer/consumer (arrow_tpu/substrait.py vs
engine/substrait/serde.h). The oracle is pyarrow's own Substrait
consumer executing OUR plan bytes — wire-format compatibility is the
whole point of the component."""
import pyarrow as pa
import pyarrow.substrait as ps
import pytest

import arrow_tpu as at
from arrow_tpu import acero
import arrow_tpu.substrait as sub


def _tables():
    data = {"a": [1, 2, 3, 4, 5], "b": [1.5, 2.5, 3.5, 4.5, 5.5],
            "s": ["x", "y", "x", "z", "y"]}
    return at.table(data), pa.table(data)


def _run_both(decl, t, pt, output_names=None):
    blob = sub.serialize_plan(decl, output_names=output_names)
    ours = sub.run_query(blob, lambda n, s: t).to_pydict()
    theirs = ps.run_query(
        pa.py_buffer(blob),
        table_provider=lambda n, s=None: pt).read_all().to_pydict()
    return ours, theirs


def _src(t):
    return acero.Declaration("table_source",
                             acero.TableSourceNodeOptions(t))


def test_read_roundtrip():
    t, pt = _tables()
    ours, theirs = _run_both(_src(t), t, pt)
    assert ours == theirs


def test_filter():
    t, pt = _tables()
    d = acero.Declaration(
        "filter", acero.FilterNodeOptions(acero.field("a") > 2),
        inputs=[_src(t)])
    ours, theirs = _run_both(d, t, pt)
    assert ours == theirs
    assert ours["a"] == [3, 4, 5]


def test_project_expressions():
    t, pt = _tables()
    d = acero.Declaration("project", acero.ProjectNodeOptions(
        [acero.field("a") + acero.field("a"),
         acero.field("b") * acero.Expression.literal(2.0)],
        names=["a2", "b2"]), inputs=[_src(t)])
    ours, theirs = _run_both(d, t, pt)
    assert ours == theirs
    assert ours["a2"] == [2, 4, 6, 8, 10]


def test_sort_fetch():
    t, pt = _tables()
    d = acero.Declaration("fetch", acero.FetchNodeOptions(1, 3), inputs=[
        acero.Declaration("order_by",
                          acero.OrderByNodeOptions([("a", "descending")]),
                          inputs=[_src(t)])])
    ours, theirs = _run_both(d, t, pt)
    assert ours == theirs
    assert ours["a"] == [4, 3, 2]


def test_aggregate():
    t, pt = _tables()
    d = acero.Declaration("aggregate", acero.AggregateNodeOptions(
        [("a", "sum", None, "a_sum"), ("b", "mean", None, "b_mean"),
         ("a", "max", None, "a_max")], keys=["s"]), inputs=[_src(t)])
    ours, theirs = _run_both(d, t, pt)
    okeys = sorted(zip(ours["s"], ours["a_sum"], ours["b_mean"],
                       ours["a_max"]))
    tkeys = sorted(zip(theirs["s"], theirs["a_sum"], theirs["b_mean"],
                       theirs["a_max"]))
    assert okeys == tkeys


def test_join():
    lt = at.table({"k": [1, 2, 3, 4], "lv": [10, 20, 30, 40]})
    rt = at.table({"k": [2, 3], "rv": [200, 300]})
    plt = pa.table({"k": [1, 2, 3, 4], "lv": [10, 20, 30, 40]})
    prt = pa.table({"k": [2, 3], "rv": [200, 300]})
    ls, rs = _src(lt), _src(rt)
    ls.options.substrait_name = "left"
    rs.options.substrait_name = "right"
    d = acero.Declaration("hashjoin", acero.HashJoinNodeOptions(
        join_type="inner", left_keys=["k"], right_keys=["k"]),
        inputs=[ls, rs])
    blob = sub.serialize_plan(d, output_names=["k", "lv", "k2", "rv"])
    ours = sub.run_query(
        blob, lambda n, s: lt if n == ["left"] else rt).to_pydict()
    theirs = ps.run_query(
        pa.py_buffer(blob),
        table_provider=lambda n, s=None: plt if list(n) == ["left"]
        else prt).read_all().to_pydict()
    assert ours == theirs


def test_unsupported_rel_raises():
    from arrow_tpu.compute.registry import ArrowInvalid
    with pytest.raises(ArrowInvalid):
        sub.run_query(b"\x1a\x04\x12\x02\x4a\x00", lambda n, s: None)


def test_garbage_bytes_raise():
    with pytest.raises(Exception):
        sub.run_query(b"\xff\xff\xff\xff\x01", lambda n, s: None)


class TestExpressionInterchange:
    """serialize/deserialize_expressions + schema (pyarrow.substrait)."""

    def test_schema_roundtrip_and_interop(self):
        import pyarrow as pa
        import pyarrow.substrait as psub

        import arrow_tpu as at
        import arrow_tpu.substrait as asub
        sch = at.schema([at.field("a", at.int64()),
                         at.field("s", at.string())])
        s = asub.serialize_schema(sch)
        assert asub.deserialize_schema(s.schema).names == ["a", "s"]
        assert psub.deserialize_schema(s.schema).names == ["a", "s"]
        theirs = psub.serialize_schema(
            pa.schema([("x", pa.float64())])).schema
        assert asub.deserialize_schema(theirs).names == ["x"]

    def test_expressions_both_directions(self):
        import pyarrow as pa
        import pyarrow.compute as ppc
        import pyarrow.substrait as psub

        import arrow_tpu as at
        import arrow_tpu.substrait as asub
        from arrow_tpu.acero import field
        sch = at.schema([at.field("a", at.int64())])
        buf = asub.serialize_expressions(
            [field("a") > 1, field("a") + 2], ["gt", "plus"], sch)
        be = psub.deserialize_expressions(buf)
        assert set(be.expressions) == {"gt", "plus"}
        pbuf = psub.serialize_expressions(
            [ppc.field("a") > 1], ["gt"], pa.schema([("a", pa.int64())]))
        ours = asub.deserialize_expressions(bytes(pbuf))
        assert list(ours.expressions) == ["gt"]
        # the decoded expression evaluates correctly in our engine
        t = at.table({"a": [0, 2, 5]})
        got = t.filter(ours.expressions["gt"])
        assert got.column("a").to_pylist() == [2, 5]

    def test_get_supported_functions(self):
        import arrow_tpu.substrait as asub
        fns = asub.get_supported_functions()
        assert len(fns) > 20
        assert all(f.startswith("https://") and "#" in f for f in fns)


def test_set_union_all_roundtrip():
    """SetRel UNION_ALL both directions; byte-interop with pyarrow's
    consumer (reference: engine/substrait/relation_internal.cc Set)."""
    import arrow_tpu as at
    from arrow_tpu import substrait as sub
    from arrow_tpu.acero import Declaration
    from arrow_tpu.acero.options import TableSourceNodeOptions

    t1 = at.table({"x": [1, 2, 3], "y": [1.0, 2.0, 3.0]})
    t2 = at.table({"x": [4, 5], "y": [4.0, 5.0]})
    o1, o2 = TableSourceNodeOptions(t1), TableSourceNodeOptions(t2)
    o1.substrait_name, o2.substrait_name = "t0", "t1"
    plan = Declaration("union", None, inputs=[
        Declaration("table_source", o1),
        Declaration("table_source", o2),
    ])
    # our producer -> our consumer
    buf = sub.serialize_plan(plan)

    def provider(names, schema):
        return t1 if names[-1].endswith("0") else t2

    # serialize uses named tables table0/table1? fall back: run the
    # original plan for expectation
    expect = plan.to_table().to_pydict()

    out = sub.run_query(buf, lambda names, schema:
                        t1 if names[-1] == "t0" else t2)
    assert sorted(out.to_pydict()["x"]) == sorted(expect["x"])

    # pyarrow consumer executes our plan identically
    import pyarrow as pa
    import pyarrow.substrait as pasub
    pt1 = pa.table({"x": [1, 2, 3], "y": [1.0, 2.0, 3.0]})
    pt2 = pa.table({"x": [4, 5], "y": [4.0, 5.0]})

    def pa_provider(names, schema=None):
        return pt1 if names[-1] == "t0" else pt2

    res = pasub.run_query(pa.py_buffer(buf), table_provider=pa_provider)
    got = res.read_all().to_pydict()
    assert sorted(got["x"]) == sorted(expect["x"])


class TestFunctionMappingBreadth:
    """Round-5 registry breadth (reference extension_set.cc:1066-1258):
    overflow option, trig/log families, kleene booleans, extract enum,
    round mode, string option-lifting, variance distribution."""

    def test_checked_arith_overflow_option(self):
        import arrow_tpu as at
        import arrow_tpu.substrait as asub
        from arrow_tpu.acero import Expression
        sch = at.schema([at.field("a", at.int64())])
        buf = asub.serialize_expressions(
            [Expression.call("add_checked", Expression.field("a"),
                             Expression.literal(1))], ["x"], sch)
        got = asub.deserialize_expressions(buf).expressions["x"]
        assert got.fn == "add_checked"
        # pyarrow's consumer also maps overflow=ERROR -> add_checked
        import pyarrow.substrait as psub
        be = psub.deserialize_expressions(buf)
        assert "checked" in str(be.expressions["x"])

    def test_pyarrow_overflow_option_decodes(self):
        """pyarrow's `+` operator is add_checked -> overflow=ERROR on the
        wire; our consumer must map it back to the checked variant."""
        import pyarrow as pa
        import pyarrow.compute as ppc
        import pyarrow.substrait as psub

        import arrow_tpu.substrait as asub
        pbuf = psub.serialize_expressions(
            [ppc.field("a") + ppc.field("a")], ["x"],
            pa.schema([("a", pa.int64())]))
        ours = asub.deserialize_expressions(bytes(pbuf))
        assert ours.expressions["x"].fn == "add_checked"

    def test_trig_log_plan_pyarrow_interop(self):
        t, pt = _tables()
        decl = acero.Declaration(
            "project", acero.ProjectNodeOptions(
                [acero.Expression.call("sin", acero.field("b")),
                 acero.Expression.call("ln", acero.field("b"))],
                ["sin_b", "ln_b"]), inputs=[_src(t)])
        ours, theirs = _run_both(decl, t, pt)
        import numpy as np
        np.testing.assert_allclose(ours["sin_b"], theirs["sin_b"])
        np.testing.assert_allclose(ours["ln_b"], theirs["ln_b"])

    def test_kleene_and_plan_pyarrow_interop(self):
        t, pt = _tables()
        cond = acero.Expression.call(
            "and_kleene", acero.field("a") > 1, acero.field("b") < 5.0)
        decl = acero.Declaration("filter", acero.FilterNodeOptions(cond),
                                 inputs=[_src(t)])
        ours, theirs = _run_both(decl, t, pt)
        assert ours == theirs

    def test_extract_year_roundtrip(self):
        import arrow_tpu as at
        import arrow_tpu.substrait as asub
        from arrow_tpu.acero import Expression
        sch = at.schema([at.field("ts", at.timestamp("us"))])
        buf = asub.serialize_expressions(
            [Expression.call("year", Expression.field("ts"))], ["y"], sch)
        got = asub.deserialize_expressions(buf).expressions["y"]
        assert got.fn == "year"

    def test_round_mode_decode(self):
        import arrow_tpu.substrait as asub
        from arrow_tpu.acero import Expression
        e = asub._decode_scalar_call(
            "round", [Expression.field("a")], [], {"rounding": ["FLOOR"]})
        assert e.fn == "round" and e.options["round_mode"] == "down"
        e2 = asub._decode_scalar_call(
            "round", [Expression.field("a"), Expression.literal(2)],
            [], {})
        assert e2.options["ndigits"] == 2

    def test_string_option_lifting(self):
        import arrow_tpu.substrait as asub
        from arrow_tpu.acero import Expression
        f = Expression.field("s")
        e = asub._decode_scalar_call(
            "substring", [f, Expression.literal(2),
                          Expression.literal(3)], [], {})
        assert e.fn == "utf8_slice_codeunits"
        assert e.options == {"start": 1, "stop": 4}
        e = asub._decode_scalar_call(
            "contains", [f, Expression.literal("ab")], [], {})
        assert e.fn == "match_substring" and e.options["pattern"] == "ab"
        e = asub._decode_scalar_call(
            "replace", [f, Expression.literal("a"),
                        Expression.literal("b")], [], {})
        assert e.fn == "replace_substring"
        e = asub._decode_scalar_call("trim", [f], [], {})
        assert e.fn == "utf8_trim_whitespace"
        e = asub._decode_scalar_call(
            "trim", [f, Expression.literal("xy")], [], {})
        assert e.fn == "utf8_trim" and e.options["characters"] == "xy"

    def test_string_plan_self_roundtrip(self):
        """lower/upper/char_length through serialize -> run_query."""
        t, _ = _tables()
        decl = acero.Declaration(
            "project", acero.ProjectNodeOptions(
                [acero.Expression.call("utf8_upper", acero.field("s"))],
                ["u"]), inputs=[_src(t)])
        blob = sub.serialize_plan(decl)
        ours = sub.run_query(blob, lambda n, s: t).to_pydict()
        assert ours["u"] == ["X", "Y", "X", "Z", "Y"]

    def test_if_then_decode(self):
        """Hand-built IfThen message (algebra.proto field 4) decodes to
        nested if_else and evaluates."""
        import arrow_tpu as at
        from arrow_tpu.substrait import PB, fm, fv, _dec_expr
        from arrow_tpu.substrait import _enc_field_ref, _enc_literal
        sch = at.schema([at.field("a", at.int64())])
        cond = fm(3, fv(1, 1) +
                  fm(4, fm(3, _enc_field_ref(0))) +
                  fm(4, fm(3, _enc_literal(2))))
        clause = fm(1, cond) + fm(2, _enc_literal(10))
        ifthen = fm(4, fm(1, clause) + fm(2, _enc_literal(20)))
        expr = _dec_expr(PB(ifthen), sch, {1: "gt"})
        assert expr.fn == "if_else"
        t = at.table({"a": [1, 5]})
        from arrow_tpu.acero import Declaration, ProjectNodeOptions
        out = Declaration(
            "project", ProjectNodeOptions([expr], ["r"]),
            inputs=[Declaration(
                "table_source",
                acero.TableSourceNodeOptions(t))]).to_table()
        assert out.column("r").to_pylist() == [20, 10]

    def test_singular_or_list_decode(self):
        import arrow_tpu as at
        from arrow_tpu.substrait import PB, fm, _dec_expr
        from arrow_tpu.substrait import _enc_field_ref, _enc_literal
        sch = at.schema([at.field("a", at.int64())])
        sol = fm(7, fm(1, _enc_field_ref(0)) +
                 fm(2, _enc_literal(2)) + fm(2, _enc_literal(4)))
        expr = _dec_expr(PB(sol), sch, {})
        t = at.table({"a": [1, 2, 3, 4]})
        out = t.filter(expr)
        assert out.column("a").to_pylist() == [2, 4]

    def test_variance_distribution_interop(self):
        """distribution option rides the wire per the substrait spec
        (SAMPLE -> ddof=1). NOTE: the reference's consumer inverts the
        mapping (extension_set.cc DecodeBasicAggregate maps
        POPULATION->ddof=1), so only wire acceptance — not the value —
        is compared against pyarrow."""
        t, pt = _tables()
        decl = acero.Declaration(
            "aggregate", acero.AggregateNodeOptions(
                [("b", "variance", {"ddof": 1}, "v")], keys=[]),
            inputs=[_src(t)])
        ours, theirs = _run_both(decl, t, pt)
        import numpy as np
        np.testing.assert_allclose(ours["v"], [2.5])   # sample variance
        assert len(theirs["v"]) == 1   # pyarrow consumed our option

    def test_supported_functions_breadth(self):
        fns = sub.get_supported_functions()
        names = {f.split("#")[1] for f in fns}
        for want in ("sin", "atan2", "log2", "extract", "round",
                     "substring", "bitwise_and", "coalesce", "is_nan",
                     "variance", "first", "last"):
            assert want in names, want
        assert len(fns) > 70
