"""String + temporal kernel differential tests vs pyarrow.compute."""

import datetime

import numpy as np
import pyarrow as pa
import pyarrow.compute as ppc
import pytest

import arrow_tpu as at
import arrow_tpu.compute as pc
from arrow_tpu.array.array import pylist_equal

STR_DATA = ["Hello World", "", None, "  pad  ", "ÉCOLE", "abc123",
            "UPPER", "lower", "MiXeD"]


def pa_str():
    return pa.array(STR_DATA, type=pa.string())


STR_TO_STR = ["utf8_upper", "utf8_lower", "utf8_swapcase",
              "utf8_capitalize", "utf8_reverse", "utf8_trim_whitespace",
              "utf8_ltrim_whitespace", "utf8_rtrim_whitespace"]


@pytest.mark.parametrize("fname", STR_TO_STR)
def test_str_to_str(fname):
    a = at.array(STR_DATA)
    ours = getattr(pc, fname)(a).to_pylist()
    theirs = getattr(ppc, fname)(pa_str()).to_pylist()
    assert ours == theirs


STR_PREDICATES = ["utf8_is_alnum", "utf8_is_alpha", "utf8_is_digit",
                  "utf8_is_lower", "utf8_is_upper", "utf8_is_space",
                  "string_is_ascii"]


@pytest.mark.parametrize("fname", STR_PREDICATES)
def test_str_predicates(fname):
    a = at.array(STR_DATA)
    ours = getattr(pc, fname)(a).to_pylist()
    theirs = getattr(ppc, fname)(pa_str()).to_pylist()
    assert ours == theirs


def test_str_length_and_match():
    a = at.array(STR_DATA)
    assert pc.utf8_length(a).to_pylist() == \
        ppc.utf8_length(pa_str()).to_pylist()
    assert pc.match_substring(a, pattern="lo").to_pylist() == \
        ppc.match_substring(pa_str(), "lo").to_pylist()
    assert pc.starts_with(a, pattern="He").to_pylist() == \
        ppc.starts_with(pa_str(), "He").to_pylist()
    assert pc.ends_with(a, pattern="d").to_pylist() == \
        ppc.ends_with(pa_str(), "d").to_pylist()
    assert pc.match_like(a, pattern="H%d").to_pylist() == \
        ppc.match_like(pa_str(), "H%d").to_pylist()
    assert pc.count_substring(a, pattern="l").to_pylist() == \
        ppc.count_substring(pa_str(), "l").to_pylist()
    assert pc.find_substring(a, pattern="o").to_pylist() == \
        ppc.find_substring(pa_str(), "o").to_pylist()


def test_str_transform_options():
    a = at.array(STR_DATA)
    assert pc.utf8_slice_codeunits(a, start=1, stop=4).to_pylist() == \
        ppc.utf8_slice_codeunits(pa_str(), 1, 4).to_pylist()
    assert pc.replace_substring(a, pattern="l", replacement="L").to_pylist() \
        == ppc.replace_substring(pa_str(), pattern="l",
                                 replacement="L").to_pylist()
    assert pc.utf8_lpad(a, width=12, padding="*").to_pylist() == \
        ppc.utf8_lpad(pa_str(), 12, "*").to_pylist()
    assert pc.utf8_trim(a, characters=" d").to_pylist() == \
        ppc.utf8_trim(pa_str(), " d").to_pylist()


DATES = [datetime.date(1970, 1, 1), datetime.date(2000, 2, 29),
         datetime.date(1999, 12, 31), None, datetime.date(2024, 7, 4),
         datetime.date(1969, 3, 15), datetime.date(1900, 1, 1)]
TIMESTAMPS = [datetime.datetime(2021, 3, 14, 15, 9, 26, 535898),
              datetime.datetime(1970, 1, 1), None,
              datetime.datetime(1965, 6, 30, 23, 59, 59),
              datetime.datetime(2000, 1, 1, 12, 0, 0)]

TEMPORAL_FNS = ["year", "month", "day", "quarter", "day_of_year",
                "is_leap_year", "iso_week", "iso_year"]


@pytest.mark.parametrize("fname", TEMPORAL_FNS)
def test_temporal_on_dates(fname):
    a = at.array(DATES, at.date32())
    p = pa.array(DATES, type=pa.date32())
    ours = getattr(pc, fname)(a).to_pylist()
    theirs = getattr(ppc, fname)(p).to_pylist()
    assert ours == theirs, fname


@pytest.mark.parametrize("fname", ["year", "month", "day", "hour",
                                   "minute", "second", "millisecond",
                                   "microsecond"])
def test_temporal_on_timestamps(fname):
    a = at.array(TIMESTAMPS, at.timestamp("us"))
    p = pa.array(TIMESTAMPS, type=pa.timestamp("us"))
    ours = getattr(pc, fname)(a).to_pylist()
    theirs = getattr(ppc, fname)(p).to_pylist()
    assert ours == theirs, fname


def test_day_of_week():
    a = at.array(DATES, at.date32())
    p = pa.array(DATES, type=pa.date32())
    assert pc.day_of_week(a).to_pylist() == \
        ppc.day_of_week(p).to_pylist()
    assert pc.day_of_week(a, count_from_zero=False,
                          week_start=7).to_pylist() == \
        ppc.day_of_week(p, count_from_zero=False,
                        week_start=7).to_pylist()


def test_temporal_between():
    a = at.array(DATES[:3], at.date32())
    b = at.array([datetime.date(2001, 1, 1)] * 3, at.date32())
    pa_a = pa.array(DATES[:3], type=pa.date32())
    pa_b = pa.array([datetime.date(2001, 1, 1)] * 3, type=pa.date32())
    assert pc.days_between(a, b).to_pylist() == \
        ppc.days_between(pa_a, pa_b).to_pylist()
    assert pc.years_between(a, b).to_pylist() == \
        ppc.years_between(pa_a, pa_b).to_pylist()
