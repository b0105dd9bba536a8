"""Differential tests for the long-tail compute functions
(extra_kernels.py) against pyarrow where semantics align."""
import datetime as dt
import math

import pyarrow as pa
import pyarrow.compute as ppc
import pytest

import arrow_tpu as at
import arrow_tpu.compute as pc


def _eq(ours, theirs, approx=False):
    o = ours.to_pylist() if hasattr(ours, "to_pylist") else ours
    t = theirs.to_pylist() if hasattr(theirs, "to_pylist") else theirs
    if approx:
        assert len(o) == len(t)
        for x, y in zip(o, t):
            if x is None or y is None:
                assert x == y
            else:
                assert x == pytest.approx(y, rel=1e-12), (o, t)
    else:
        assert o == t, (o, t)


def test_hypot():
    a = at.array([3.0, 5.0, None])
    b = at.array([4.0, 12.0, 1.0])
    out = pc.hypot(a, b)
    assert out.to_pylist()[:2] == [5.0, 13.0]
    assert out.to_pylist()[2] is None


def test_round_binary():
    a = at.array([1.234, 5.678, 2.5])
    nd = at.array([2, 1, 0])
    ours = pc.round_binary(a, nd)
    theirs = ppc.round_binary(pa.array([1.234, 5.678, 2.5]),
                              pa.array([2, 1, 0]))
    _eq(ours, theirs, approx=True)


def test_indices_nonzero():
    a = at.array([0, 3, 0, 5, None, 7])
    ours = pc.call_function("indices_nonzero", [a])
    theirs = ppc.indices_nonzero(pa.array([0, 3, 0, 5, None, 7]))
    _eq(ours, theirs)


def test_rank_quantile_and_normal():
    vals = [10, 20, 20, 40, None]
    ours = pc.call_function("rank_quantile", [at.array(vals)])
    theirs = ppc.rank_quantile(pa.array(vals))
    _eq(ours, theirs, approx=True)
    on = pc.call_function("rank_normal", [at.array(vals)])
    tn = ppc.rank_normal(pa.array(vals))
    _eq(on, tn, approx=True)


def test_winsorize():
    vals = list(range(1, 21))
    ours = pc.call_function("winsorize", [at.array([float(v) for v in vals])],
                            {"lower_limit": 0.1, "upper_limit": 0.9})
    theirs = ppc.winsorize(pa.array([float(v) for v in vals]),
                           lower_limit=0.1, upper_limit=0.9)
    _eq(ours, theirs, approx=True)


def test_tdigest_median():
    a = at.array([1.0, 2.0, 3.0, 4.0, 100.0])
    out = pc.call_function("tdigest", [a])
    assert out.as_py() == 3.0


def test_temporal_rounding():
    ts = [dt.datetime(2023, 5, 17, 14, 35, 41, 123456),
          dt.datetime(2020, 1, 1), None]
    a = at.array(ts, at.timestamp("us"))
    p = pa.array(ts, pa.timestamp("us"))
    for name in ("floor_temporal", "ceil_temporal", "round_temporal"):
        for unit in ("second", "minute", "hour", "day", "month", "year"):
            ours = pc.call_function(name, [a], {"unit": unit})
            theirs = getattr(ppc, name)(p, unit=unit)
            _eq(ours, theirs)


def test_between_family():
    x = [dt.datetime(2020, 1, 1, 10, 30), dt.datetime(2023, 7, 4), None]
    y = [dt.datetime(2020, 3, 1, 12, 00), dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 1)]
    a, b = at.array(x, at.timestamp("us")), at.array(y, at.timestamp("us"))
    pa_a, pa_b = pa.array(x, pa.timestamp("us")), pa.array(y, pa.timestamp("us"))
    for name in ("seconds_between", "minutes_between",
                 "milliseconds_between", "microseconds_between",
                 "nanoseconds_between", "quarters_between",
                 "weeks_between"):
        ours = pc.call_function(name, [a, b])
        theirs = getattr(ppc, name)(pa_a, pa_b)
        _eq(ours, theirs)


def test_month_interval_between():
    x = [dt.date(2020, 1, 15), dt.date(2021, 12, 1)]
    y = [dt.date(2020, 4, 10), dt.date(2022, 1, 1)]
    ours = pc.call_function("month_interval_between",
                            [at.array(x, at.date32()),
                             at.array(y, at.date32())])
    # (pyarrow's MonthInterval scalars cannot to_pylist in v25 — compare
    # against hand-computed month differences)
    assert ours.to_pylist() == [3, 1]


def test_iso_calendar_year_month_day():
    ts = [dt.datetime(2023, 1, 1), dt.datetime(2020, 12, 31), None]
    a = at.array(ts, at.timestamp("us"))
    p = pa.array(ts, pa.timestamp("us"))
    _eq(pc.call_function("iso_calendar", [a]), ppc.iso_calendar(p))
    _eq(pc.call_function("year_month_day", [a]), ppc.year_month_day(p))


def test_week_and_subsecond():
    ts = [dt.datetime(2023, 1, 2), dt.datetime(2023, 12, 31),
          dt.datetime(2021, 6, 15, 1, 2, 3, 250000)]
    a = at.array(ts, at.timestamp("us"))
    p = pa.array(ts, pa.timestamp("us"))
    _eq(pc.call_function("week", [a]), ppc.week(p))
    _eq(pc.call_function("subsecond", [a]), ppc.subsecond(p),
        approx=True)


def test_ascii_aliases_and_slices():
    vals = ["  Hello World ", "FOO", None, "x"]
    a = at.array(vals)
    p = pa.array(vals)
    _eq(pc.call_function("ascii_trim_whitespace", [a]),
        ppc.ascii_trim_whitespace(p))
    _eq(pc.call_function("ascii_is_title", [a]), ppc.ascii_is_title(p))
    _eq(pc.call_function("binary_slice", [at.array([b"abcdef", None])],
                         {"start": 1, "stop": 4}),
        ppc.binary_slice(pa.array([b"abcdef", None]), start=1, stop=4))
    _eq(pc.call_function("utf8_replace_slice", [a],
                         {"start": 0, "stop": 2, "replacement": "Z"}),
        ppc.utf8_replace_slice(p, start=0, stop=2, replacement="Z"))


def test_zero_fill_and_normalize():
    vals = ["5", "-7", "123", None]
    ours = pc.call_function("utf8_zero_fill", [at.array(vals)],
                            {"width": 5})
    theirs = ppc.utf8_zero_fill(pa.array(vals), width=5)
    _eq(ours, theirs)
    # NFC composes e+combining-accent into one codepoint. (pyarrow 25
    # returns the decomposed form here even with form="NFC"; we follow
    # unicodedata's actual NFC.)
    import unicodedata
    comp = ["e\u0301", "abc"]
    on = pc.call_function("utf8_normalize", [at.array(comp)],
                          {"form": "NFC"})
    assert on.to_pylist() == ["\xe9", "abc"]
    assert all(unicodedata.is_normalized("NFC", v)
               for v in on.to_pylist())


def test_regex_kernels():
    vals = ["aXbXc", "nope", None, "XX"]
    a, p = at.array(vals), pa.array(vals)
    _eq(pc.call_function("count_substring_regex", [a], {"pattern": "X"}),
        ppc.count_substring_regex(p, pattern="X"))
    _eq(pc.call_function("find_substring_regex", [a], {"pattern": "X+"}),
        ppc.find_substring_regex(p, pattern="X+"))
    ours = pc.call_function("split_pattern_regex", [a.combine() if hasattr(a, "combine") else a],
                            {"pattern": "X+"})
    theirs = ppc.split_pattern_regex(p, pattern="X+")
    _eq(ours, theirs)
    oe = pc.call_function("extract_regex", [a],
                          {"pattern": r"(?P<l>[a-z])X(?P<r>[a-z])"})
    te = ppc.extract_regex(p, pattern=r"(?P<l>[a-z])X(?P<r>[a-z])")
    _eq(oe, te)


def test_list_slice_and_dictionary_decode():
    lv = [[1, 2, 3], None, [4]]
    ours = pc.call_function("list_slice", [at.array(lv, at.list_(at.int64()))],
                            {"start": 0, "stop": 2})
    theirs = ppc.list_slice(pa.array(lv, pa.list_(pa.int64())),
                            start=0, stop=2)
    _eq(ours, theirs)
    d = at.array(["a", "b", "a"], at.dictionary(at.int32(), at.string()))
    out = pc.call_function("dictionary_decode", [d])
    assert out.to_pylist() == ["a", "b", "a"]
    assert out.type == at.string()


def test_pivot_wider_scalar():
    keys = at.array(["height", "width"])
    vals = at.array([10, 20])
    out = pc.call_function("pivot_wider", [keys, vals])
    assert out.to_pylist() == [{"height": 10, "width": 20}]


def test_grouped_skew_kurtosis_first_last_median():
    data = {"k": ["a", "a", "a", "a", "b", "b", "b", "b"],
            "v": [1.0, 2.0, 3.0, 10.0, 5.0, 5.0, 6.0, 8.0]}
    ours = at.table(data).group_by("k").aggregate(
        [("v", "skew"), ("v", "kurtosis"), ("v", "approximate_median"),
         ("v", "first"), ("v", "last")])
    theirs = pa.table(data).group_by("k", use_threads=False).aggregate(
        [("v", "skew"), ("v", "kurtosis"), ("v", "approximate_median"),
         ("v", "first"), ("v", "last")])
    orows = sorted(zip(*(ours.column(c).to_pylist()
                         for c in ours.schema.names)))
    trows = sorted(zip(*(theirs.column(c).to_pylist()
                         for c in theirs.column_names)))
    assert len(orows) == len(trows) == 2
    for orow, trow in zip(orows, trows):
        for x, y in zip(orow, trow):
            if isinstance(x, float):
                assert x == pytest.approx(y, rel=1e-6), (orows, trows)
            else:
                assert x == y


def test_checked_aliases_exist():
    for n in ("acosh_checked", "atanh_checked", "cumulative_sum_checked",
              "cumulative_prod_checked", "is_in_meta_binary",
              "index_in_meta_binary"):
        assert pc.get_function(n) is not None


def test_run_end_encode_returns_ree_array():
    """run_end_encode yields a RunEndEncodedArray like the reference
    (vector_run_end_encode.cc), round-tripping through decode."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import arrow_tpu as at
    import arrow_tpu.compute as ac
    vals = [1, 1, 2, 2, 2, None, 7]
    ree = ac.run_end_encode(at.array(vals))
    assert ree.type.id == at.TypeId.RUN_END_ENCODED
    pree = pc.run_end_encode(pa.array(vals))
    assert ree.to_pylist() == pree.to_pylist() == vals
    assert ac.run_end_decode(ree).to_pylist() == vals


def test_mode_matches_pyarrow_semantics():
    """ties -> smallest value; n option; min_count/skip_nulls
    (aggregate_mode.cc ModeOptions)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    import arrow_tpu as at
    import arrow_tpu.compute as ac
    for vals, opts in [([2, 2, 1, 1], {}),
                       ([1, 1, 2, 2, 3], {"n": 2}),
                       ([None, None, 5], {}),
                       ([4], {"min_count": 2})]:
        ours = ac.mode(at.array(vals), **opts).to_pylist()
        theirs = pc.mode(pa.array(vals), **opts).to_pylist()
        assert ours == theirs, (vals, opts, ours, theirs)
