"""Vectorized strftime/strptime (round-4 verdict item 9): the numpy
component-assembly strftime and the pandas-C strptime must match the
per-row Python datetime fallback exactly, across directives, nulls,
units and error modes. Reference: scalar_temporal_unary.cc
StrftimeTimestamp / ParseTimestampStrptime."""

import datetime

import numpy as np
import pytest

import arrow_tpu as at
import arrow_tpu.compute as pc
from arrow_tpu.compute.host_kernels import _strftime_vectorized


def _ts_array(n=500, unit="us", with_nulls=True, seed=0):
    rng = np.random.default_rng(seed)
    base = datetime.datetime(1999, 12, 28, 21, 58, 3, 123456)
    vals = []
    for i in range(n):
        if with_nulls and i % 17 == 0:
            vals.append(None)
        else:
            vals.append(base + datetime.timedelta(
                seconds=int(rng.integers(-10**9, 10**9)),
                microseconds=int(rng.integers(0, 10**6))))
    return at.array(vals, at.timestamp(unit))


@pytest.mark.parametrize("fmt", [
    "%Y-%m-%dT%H:%M:%S",
    "%Y-%m-%d",
    "%d/%m/%y %H:%M",
    "%Y-%m-%d %H:%M:%S.%f",
    "%a %b %d %Y",
    "%A, %B %d — day %j",
    "%I:%M %p",
    "100%% done at %H:%M",
])
@pytest.mark.parametrize("unit", ["s", "ms", "us"])
def test_strftime_matches_python(fmt, unit):
    arr = _ts_array(unit=unit)
    got = pc.strftime(arr, format=fmt).to_pylist()
    want = [None if v is None else v.strftime(fmt)
            for v in arr.to_pylist()]
    assert got == want


def test_strftime_vectorized_path_is_used():
    arr = _ts_array(50, with_nulls=False)
    assert _strftime_vectorized(arr, "%Y-%m-%d %H:%M:%S") is not None
    # unsupported directive -> fallback signalled by None
    assert _strftime_vectorized(arr, "%Y %Z") is None


def test_strftime_extreme_years_fall_back():
    arr = at.array([datetime.datetime(1, 1, 1),
                    datetime.datetime(9999, 12, 31, 23, 59, 59)],
                   at.timestamp("us"))
    got = pc.strftime(arr, format="%Y-%m-%d").to_pylist()
    assert got == ["0001-01-01", "9999-12-31"]


@pytest.mark.parametrize("fmt,unit", [
    ("%Y-%m-%dT%H:%M:%S", "us"),
    ("%Y-%m-%d %H:%M:%S", "ms"),
    ("%d/%m/%Y", "s"),
])
def test_strptime_roundtrip(fmt, unit):
    arr = _ts_array(300, unit="s")
    s = pc.strftime(arr, format=fmt)
    parsed = pc.strptime(s, format=fmt, unit=unit).to_pylist()
    want = []
    for v in arr.to_pylist():
        if v is None:
            want.append(None)
        else:
            want.append(datetime.datetime.strptime(v.strftime(fmt), fmt))
    assert parsed == want


def test_strptime_error_modes():
    s = at.array(["2001-02-03", "not a date", None, "1999-11-30"])
    out = pc.strptime(s, format="%Y-%m-%d", unit="us",
                      error_is_null=True).to_pylist()
    assert out == [datetime.datetime(2001, 2, 3), None, None,
                   datetime.datetime(1999, 11, 30)]
    with pytest.raises(Exception):
        pc.strptime(s, format="%Y-%m-%d", unit="us")


def test_strftime_scale_budget():
    """1M-row strftime must stay under 1 s (verdict item 9 done bar)."""
    import time
    n = 1_000_000
    vals = (np.arange(n, dtype=np.int64) * 1_001_001
            + 946_684_800_000_000)
    from arrow_tpu.array.data import ArrayData
    from arrow_tpu.buffer import Buffer
    arr = at.Array(ArrayData(at.timestamp("us"), n,
                             [None, Buffer(vals)], null_count=0))
    t0 = time.time()
    out = pc.strftime(arr, format="%Y-%m-%dT%H:%M:%S")
    dt = time.time() - t0
    assert len(out) == n
    assert out.to_pylist()[0] == datetime.datetime.fromtimestamp(
        946_684_800, datetime.timezone.utc).strftime("%Y-%m-%dT%H:%M:%S")
    assert dt < 1.0, f"strftime 1M took {dt:.2f}s"
