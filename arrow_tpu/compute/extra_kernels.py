"""Long-tail compute functions closing the registry gap with the
reference's ~314 documented names (docs/source/cpp/compute.rst:214 ff).

Families here: checked/alias variants, hypot/round_binary math,
rank_quantile/rank_normal (vector_rank.cc), indices_nonzero/winsorize
(vector_statistics.cc), temporal rounding (scalar_temporal_unary.cc
ceil/floor/round_temporal), the *_between family (scalar_temporal_binary.cc),
ascii_* string aliases + regex kernels (scalar_string_ascii.cc, RE2 paths),
slice/normalize/zero_fill, grouped skew/kurtosis/first_last/quantile-based
aggs (hash_aggregate.cc), tdigest/pivot_wider (aggregate_tdigest.cc,
aggregate_pivot.cc).
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import types as T
from ..array.array import Array, array as make_array
from ..device.column import DeviceColumn
from ..types import TypeId
from .aggregate import _dec_factor
from .registry import (ArrowInvalid, register, register_alias,
                       register_host)
from .selection import Compacted
from .strings import (_dict_values, _map_to_lookup, _map_to_new_dictionary,
                      _require_string, _str_to_bool, _str_to_str)
from .temporal import (_civil_from_days, _days_from_civil, _iso_year_week,
                       _to_days_and_us)

# --- checked aliases (same lowering; domain errors surface as NaN like the
# unchecked forms — divergence documented) ---------------------------------
register_alias("acosh_checked", "acosh")
register_alias("atanh_checked", "atanh")
register_alias("cumulative_sum_checked", "cumulative_sum")
register_alias("cumulative_prod_checked", "cumulative_prod")
register_alias("is_in_meta_binary", "is_in")
register_alias("index_in_meta_binary", "index_in")


# --- math ------------------------------------------------------------------

@register("hypot", "elementwise", "sqrt(a^2 + b^2)")
def _hypot(ctx, a, b):
    from .elementwise import _and_validity, _as_values, _col
    av, avd = _as_values(a)
    bv, bvd = _as_values(b)
    av = av.astype(jnp.float64) if jnp.issubdtype(
        jnp.asarray(av).dtype, jnp.integer) else av
    return _col(jnp.hypot(av, bv), _and_validity(avd, bvd), None)


@register("round_binary", "elementwise",
          "round a to b decimal digits (b per-row)")
def _round_binary(ctx, a, b, round_mode: str = "half_to_even"):
    from .elementwise import _and_validity, _as_values, _col
    av, avd = _as_values(a)
    bv, bvd = _as_values(b)
    scale = jnp.power(10.0, jnp.asarray(bv, jnp.float64))
    x = jnp.asarray(av, jnp.float64) * scale
    if round_mode == "half_to_even":
        r = jnp.round(x)
    elif round_mode == "down":
        r = jnp.floor(x)
    elif round_mode == "up":
        r = jnp.ceil(x)
    elif round_mode == "towards_zero":
        r = jnp.trunc(x)
    else:  # half_away_from_zero and friends
        r = jnp.trunc(x + jnp.sign(x) * 0.5)
    return _col(r / scale, _and_validity(avd, bvd), T.float64())


@register("indices_nonzero", "vector",
          "indices of non-zero, valid elements (vector_statistics)")
def _indices_nonzero(ctx, col):
    live = col.valid_mask(ctx.row_mask())
    nz = jnp.logical_and(live, col.values != 0)
    from .move import compact_by_mask
    idx = jnp.arange(ctx.capacity, dtype=jnp.int64)
    (out,), count = compact_by_mask(nz, [idx])
    return Compacted(DeviceColumn(out.astype(jnp.uint64), None,
                                  T.uint64()), count)


def _quantile_of_live(values, live, q, mode="linear"):
    """Linear-interpolated quantile over live lanes (device)."""
    v = jnp.where(live, values.astype(jnp.float64), jnp.inf)
    sv = jnp.sort(v)
    n = jnp.sum(live, dtype=jnp.int64)
    nf = jnp.maximum(n, 1).astype(jnp.float64)
    pos = q * (nf - 1.0)
    if mode == "higher":
        idx = jnp.ceil(pos).astype(jnp.int64)
        return sv[jnp.clip(idx, 0, values.shape[0] - 1)]
    if mode == "lower":
        idx = jnp.floor(pos).astype(jnp.int64)
        return sv[jnp.clip(idx, 0, values.shape[0] - 1)]
    lo = jnp.floor(pos).astype(jnp.int64)
    hi = jnp.ceil(pos).astype(jnp.int64)
    frac = pos - lo.astype(jnp.float64)
    vlo = sv[jnp.clip(lo, 0, values.shape[0] - 1)]
    vhi = sv[jnp.clip(hi, 0, values.shape[0] - 1)]
    return vlo + (vhi - vlo) * frac


@register("winsorize", "vector",
          "clip values at the given lower/upper quantiles")
def _winsorize(ctx, col, lower_limit: float = 0.0,
               upper_limit: float = 1.0):
    live = col.valid_mask(ctx.row_mask())
    f = _dec_factor(col.type)
    vals = col.values
    lo = _quantile_of_live(vals, live, float(lower_limit), "higher")
    hi = _quantile_of_live(vals, live, float(upper_limit), "lower")
    out = jnp.clip(vals.astype(jnp.float64), lo, hi).astype(
        vals.dtype if jnp.issubdtype(vals.dtype, jnp.floating)
        else jnp.float64)
    out_t = col.type if jnp.issubdtype(vals.dtype, jnp.floating) and \
        f is None else (col.type if f is not None else T.float64())
    out = out.astype(vals.dtype) if f is not None else out
    return DeviceColumn(out, col.validity, out_t)


def _avg_rank(ctx, col, null_placement):
    """Average rank of ties ((min+max)/2), 1-based, float64."""
    from .registry import get_function
    rmin = get_function("rank").impl(
        ctx, col, sort_keys="ascending", null_placement=null_placement,
        tiebreaker="min").column.values.astype(jnp.float64)
    rmax = get_function("rank").impl(
        ctx, col, sort_keys="ascending", null_placement=null_placement,
        tiebreaker="max").column.values.astype(jnp.float64)
    return (rmin + rmax) * 0.5


@register("rank_quantile", "vector",
          "quantile rank in (0,1]: (avg_rank - 0.5) / n (vector_rank.cc)")
def _rank_quantile(ctx, col, sort_keys="ascending",
                   null_placement: str = "at_end"):
    r = _avg_rank(ctx, col, null_placement)
    n = jnp.sum(ctx.row_mask(), dtype=jnp.int64).astype(jnp.float64)
    q = (r - 0.5) / jnp.maximum(n, 1.0)
    return Compacted(DeviceColumn(q, None, T.float64()), ctx.row_count)


@register("rank_normal", "vector",
          "normal (probit) rank transform (vector_rank.cc)")
def _rank_normal(ctx, col, sort_keys="ascending",
                 null_placement: str = "at_end"):
    from jax.scipy.special import ndtri
    r = _avg_rank(ctx, col, null_placement)
    n = jnp.sum(ctx.row_mask(), dtype=jnp.int64).astype(jnp.float64)
    q = (r - 0.5) / jnp.maximum(n, 1.0)
    return Compacted(DeviceColumn(ndtri(q), None, T.float64()),
                     ctx.row_count)


@register("tdigest", "aggregate",
          "approximate quantiles (exact here; aggregate_tdigest.cc)")
def _tdigest(ctx, a, q=0.5, delta: int = 100, buffer_size: int = 500,
             skip_nulls: bool = True, min_count: int = 0):
    from .registry import get_function
    return get_function("quantile").impl(
        ctx, a, q=q, interpolation="linear", skip_nulls=skip_nulls,
        min_count=min_count)


# --- temporal: subsecond + rounding ---------------------------------------

@register("subsecond", "elementwise")
def _subsecond(ctx, col):
    _, us = _to_days_and_us(col)
    return DeviceColumn(us.astype(jnp.float64) % 1e6 / 1e6, col.validity,
                        T.float64())


@register("local_timestamp", "elementwise")
def _local_timestamp(ctx, col):
    """Strip the timezone (values are stored as UTC microphysical
    instants; fixed-offset zones shift, named zones treated as UTC —
    documented divergence without tzdata on device)."""
    if col.type.id != TypeId.TIMESTAMP:
        raise ArrowInvalid("local_timestamp needs a timestamp")
    tz = col.type.tz
    shift = 0
    if tz and (tz[0] in "+-") and ":" in tz:
        sign = 1 if tz[0] == "+" else -1
        hh, mm = tz[1:].split(":")
        shift = sign * (int(hh) * 3600 + int(mm) * 60)
    unit = col.type.unit
    per_s = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
    out = col.values + jnp.asarray(shift * per_s, col.values.dtype)
    return DeviceColumn(out, col.validity, T.timestamp(unit))


_UNIT_US = {"microsecond": 1, "millisecond": 1_000, "second": 1_000_000,
            "minute": 60_000_000, "hour": 3_600_000_000,
            "day": 86_400_000_000, "week": 7 * 86_400_000_000}


def _temporal_round(ctx, col, mode, multiple, unit, week_starts_monday):
    t = col.type
    if t.id not in (TypeId.TIMESTAMP, TypeId.DATE32, TypeId.DATE64,
                    TypeId.TIME32, TypeId.TIME64):
        raise ArrowInvalid(f"cannot round {t!r}")
    days, us_in_day = _to_days_and_us(col)
    total_us = days * 86_400_000_000 + us_in_day
    if unit in _UNIT_US:
        step = _UNIT_US[unit] * int(multiple)
        if unit == "week":
            # anchor weeks on the configured start day (1970-01-01 = Thu)
            anchor = 4 if week_starts_monday else 3
            total_us = total_us + anchor * 86_400_000_000
        q = jnp.floor_divide(total_us, step)
        lo = q * step
        if mode == "floor":
            out_us = lo
        elif mode == "ceil":
            out_us = jnp.where(total_us == lo, lo, lo + step)
        else:
            out_us = jnp.where(total_us - lo < lo + step - total_us,
                               lo, lo + step)
        if unit == "week":
            anchor = 4 if week_starts_monday else 3
            out_us = out_us - anchor * 86_400_000_000
    elif unit in ("month", "quarter", "year"):
        y, m, _, _ = _civil_from_days(days)
        per = {"month": 1, "quarter": 3, "year": 12}[unit] * int(multiple)
        midx = y * 12 + (m - 1)
        lo_idx = jnp.floor_divide(midx, per) * per
        lo_days = _days_from_civil(lo_idx // 12, lo_idx % 12 + 1, 1)
        hi_idx = lo_idx + per
        hi_days = _days_from_civil(hi_idx // 12, hi_idx % 12 + 1, 1)
        lo_us = lo_days * 86_400_000_000
        hi_us = hi_days * 86_400_000_000
        if mode == "floor":
            out_us = lo_us
        elif mode == "ceil":
            out_us = hi_us
        else:
            out_us = jnp.where(total_us - lo_us < hi_us - total_us,
                               lo_us, hi_us)
    else:
        raise ArrowInvalid(f"bad round unit {unit!r}")
    # back to the column's own unit
    if t.id == TypeId.DATE32:
        out = out_us // 86_400_000_000
    elif t.id == TypeId.DATE64:
        out = out_us // 1000
    else:
        per = {"s": 1_000_000, "ms": 1000, "us": 1}.get(t.unit)
        out = out_us * 1000 if t.unit == "ns" else out_us // per
    return DeviceColumn(out.astype(col.values.dtype), col.validity, t)


def _mk_round(name, mode):
    @register(name, "elementwise")
    def _impl(ctx, col, multiple: int = 1, unit: str = "day",
              week_starts_monday: bool = True,
              ceil_is_strictly_greater: bool = False,
              calendar_based_origin: bool = False):
        return _temporal_round(ctx, col, mode, multiple, unit,
                               week_starts_monday)
    return _impl


_mk_round("floor_temporal", "floor")
_mk_round("ceil_temporal", "ceil")
_mk_round("round_temporal", "round")


@register("week", "elementwise")
def _week(ctx, col, week_starts_monday: bool = True,
          count_from_zero: bool = False,
          first_week_is_fully_in_year: bool = False):
    days, _ = _to_days_and_us(col)
    shift = 0 if week_starts_monday else 1
    iso_y, wk = _iso_year_week(days + shift)
    if first_week_is_fully_in_year:
        # week 1 starts at the first FULL week: ISO week 1 may start in
        # the prior year, shifting everything down by one
        jan1 = _days_from_civil(_civil_from_days(days)[0], 1, 1)
        dow_jan1 = (jan1 + 3 + shift) % 7
        wk = jnp.where(dow_jan1 != 0, wk - 1, wk)
    if count_from_zero:
        wk = wk - 1
    return DeviceColumn(wk, col.validity, T.int64())


@register("us_year", "elementwise")
def _us_year(ctx, col):
    days, _ = _to_days_and_us(col)
    return DeviceColumn(_iso_year_week(days + 1)[0], col.validity,
                        T.int64())


# --- temporal: *_between ---------------------------------------------------

def _between(name, fn, out_type=None):
    @register(name, "elementwise")
    def _impl(ctx, a, b):
        from .elementwise import _and_validity
        da, ua = _to_days_and_us(a)
        db, ub = _to_days_and_us(b)
        out = fn(da, ua, db, ub)
        return DeviceColumn(out, _and_validity(a.validity, b.validity),
                            out_type or T.int64())
    return _impl


_US_DAY = 86_400_000_000
_between("seconds_between",
         lambda da, ua, db, ub: ((db - da) * _US_DAY + ub - ua)
         // 1_000_000)
_between("minutes_between",
         lambda da, ua, db, ub: ((db - da) * _US_DAY + ub - ua)
         // 60_000_000)
_between("milliseconds_between",
         lambda da, ua, db, ub: ((db - da) * _US_DAY + ub - ua) // 1000)
_between("microseconds_between",
         lambda da, ua, db, ub: (db - da) * _US_DAY + ub - ua)
_between("nanoseconds_between",
         lambda da, ua, db, ub: ((db - da) * _US_DAY + ub - ua) * 1000)


@register("weeks_between", "elementwise")
def _weeks_between(ctx, a, b, count_from_zero: bool = True,
                   week_start: int = 1):
    from .elementwise import _and_validity
    da, _ = _to_days_and_us(a)
    db, _ = _to_days_and_us(b)
    ws = week_start - 1
    wa = jnp.floor_divide(da + 3 - ws, 7)
    wb = jnp.floor_divide(db + 3 - ws, 7)
    return DeviceColumn(wb - wa, _and_validity(a.validity, b.validity),
                        T.int64())


@register("quarters_between", "elementwise")
def _quarters_between(ctx, a, b):
    from .elementwise import _and_validity
    da, _ = _to_days_and_us(a)
    db, _ = _to_days_and_us(b)
    ya, ma = _civil_from_days(da)[0], _civil_from_days(da)[1]
    yb, mb = _civil_from_days(db)[0], _civil_from_days(db)[1]
    qa = ya * 4 + (ma - 1) // 3
    qb = yb * 4 + (mb - 1) // 3
    return DeviceColumn(qb - qa, _and_validity(a.validity, b.validity),
                        T.int64())


@register("month_interval_between", "elementwise")
def _month_interval_between(ctx, a, b):
    from .elementwise import _and_validity
    da, _ = _to_days_and_us(a)
    db, _ = _to_days_and_us(b)
    ya, ma = _civil_from_days(da)[0], _civil_from_days(da)[1]
    yb, mb = _civil_from_days(db)[0], _civil_from_days(db)[1]
    out = ((yb * 12 + mb) - (ya * 12 + ma)).astype(jnp.int32)
    return DeviceColumn(out, _and_validity(a.validity, b.validity),
                        T.month_interval())


@register_host("day_time_interval_between")
def _day_time_interval_between(a: Array, b: Array) -> Array:
    av, bv = a.to_pylist(), b.to_pylist()
    out = []
    for x, y in zip(av, bv):
        if x is None or y is None:
            out.append(None)
            continue
        import datetime as _dt
        if isinstance(x, _dt.date) and not isinstance(x, _dt.datetime):
            x = _dt.datetime(x.year, x.month, x.day)
        if isinstance(y, _dt.date) and not isinstance(y, _dt.datetime):
            y = _dt.datetime(y.year, y.month, y.day)
        delta = y - x
        ms = (delta.seconds * 1000 + delta.microseconds // 1000)
        out.append((delta.days, ms))
    return make_array(out, T.day_time_interval())


@register_host("month_day_nano_interval_between")
def _mdn_between(a: Array, b: Array) -> Array:
    av, bv = a.to_pylist(), b.to_pylist()
    out = []
    for x, y in zip(av, bv):
        if x is None or y is None:
            out.append(None)
            continue
        import datetime as _dt
        dx = x.date() if isinstance(x, _dt.datetime) else x
        dy = y.date() if isinstance(y, _dt.datetime) else y
        months = (dy.year - dx.year) * 12 + (dy.month - dx.month)
        days = dy.day - dx.day
        tx = x.time() if isinstance(x, _dt.datetime) else _dt.time()
        ty = y.time() if isinstance(y, _dt.datetime) else _dt.time()
        nanos = ((ty.hour - tx.hour) * 3600 + (ty.minute - tx.minute) * 60
                 + (ty.second - tx.second)) * 10**9 \
            + (ty.microsecond - tx.microsecond) * 1000
        out.append((months, days, nanos))
    return make_array(out, T.month_day_nano_interval())


@register_host("iso_calendar")
def _iso_calendar(arr: Array) -> Array:
    out = []
    for v in arr.to_pylist():
        if v is None:
            out.append(None)
        else:
            iso = v.isocalendar()
            out.append({"iso_year": iso[0], "iso_week": iso[1],
                        "iso_day_of_week": iso[2]})
    return make_array(out, T.struct([("iso_year", T.int64()),
                                     ("iso_week", T.int64()),
                                     ("iso_day_of_week", T.int64())]))


@register_host("year_month_day")
def _year_month_day(arr: Array) -> Array:
    out = []
    for v in arr.to_pylist():
        if v is None:
            out.append(None)
        else:
            out.append({"year": v.year, "month": v.month, "day": v.day})
    return make_array(out, T.struct([("year", T.int64()),
                                     ("month", T.int64()),
                                     ("day", T.int64())]))


# --- strings: ascii aliases + slices + regex -------------------------------

for _a, _u in [("ascii_ltrim", "utf8_ltrim"), ("ascii_rtrim", "utf8_rtrim"),
               ("ascii_trim", "utf8_trim"),
               ("ascii_ltrim_whitespace", "utf8_ltrim_whitespace"),
               ("ascii_rtrim_whitespace", "utf8_rtrim_whitespace"),
               ("ascii_trim_whitespace", "utf8_trim_whitespace"),
               ("ascii_center", "utf8_center"),
               ("ascii_split_whitespace", "utf8_split_whitespace")]:
    register_alias(_a, _u)

_str_to_bool("ascii_is_printable", str.isprintable)
_str_to_bool("ascii_is_title", str.istitle)
_str_to_str("utf8_zero_fill", lambda v, width=0, padding="0":
            v.rjust(width, padding) if v and v[0] not in "+-" else
            (v[0] + v[1:].rjust(width - 1, padding) if v else v))


@register("utf8_normalize", "elementwise")
def _utf8_normalize(ctx, col, form: str = "NFC"):
    import unicodedata
    _require_string("utf8_normalize", col)
    return _map_to_new_dictionary(
        col, [unicodedata.normalize(form, v) if v is not None else v
              for v in _dict_values(col)])


def _py_slice(v, start, stop, step):
    return v[slice(start, stop, step)]


@register("binary_slice", "elementwise")
def _binary_slice(ctx, col, start: int = 0, stop: Optional[int] = None,
                  step: int = 1):
    _require_string("binary_slice", col)
    return _map_to_new_dictionary(
        col, [_py_slice(v, start, stop, step) if v is not None else v
              for v in _dict_values(col)])


def _replace_slice(v, start, stop, replacement):
    return v[:start] + replacement + (v[stop:] if stop is not None else
                                      type(v)())


@register("utf8_replace_slice", "elementwise")
def _utf8_replace_slice(ctx, col, start: int = 0,
                        stop: Optional[int] = None,
                        replacement: str = ""):
    _require_string("utf8_replace_slice", col)
    return _map_to_new_dictionary(
        col, [_replace_slice(v, start, stop, replacement)
              if v is not None else v for v in _dict_values(col)])


@register("binary_replace_slice", "elementwise")
def _binary_replace_slice(ctx, col, start: int = 0,
                          stop: Optional[int] = None,
                          replacement=b""):
    _require_string("binary_replace_slice", col)
    rep = replacement
    return _map_to_new_dictionary(
        col, [_replace_slice(v, start, stop,
                             rep.decode() if isinstance(v, str) and
                             isinstance(rep, bytes) else rep)
              if v is not None else v for v in _dict_values(col)])


@register("count_substring_regex", "elementwise")
def _count_substring_regex(ctx, col, pattern: str = "",
                           ignore_case: bool = False):
    _require_string("count_substring_regex", col)
    rx = re.compile(pattern, re.IGNORECASE if ignore_case else 0)
    table = np.array([len(rx.findall(v)) if v is not None else 0
                      for v in _dict_values(col)], dtype=np.int64)
    return _map_to_lookup(col, table, T.int32())


@register("find_substring_regex", "elementwise")
def _find_substring_regex(ctx, col, pattern: str = "",
                          ignore_case: bool = False):
    _require_string("find_substring_regex", col)
    rx = re.compile(pattern, re.IGNORECASE if ignore_case else 0)

    def find(v):
        m = rx.search(v)
        return m.start() if m else -1
    table = np.array([find(v) if v is not None else -1
                      for v in _dict_values(col)], dtype=np.int64)
    return _map_to_lookup(col, table, T.int32())


@register_host("extract_regex")
def _extract_regex(arr: Array, pattern: str = "") -> Array:
    rx = re.compile(pattern)
    names = list(rx.groupindex)
    if not names:
        raise ArrowInvalid("extract_regex needs named capture groups")
    out = []
    for v in arr.to_pylist():
        m = rx.search(v) if v is not None else None
        out.append({n: m.group(n) for n in names} if m else None)
    return make_array(out, T.struct([(n, T.string()) for n in names]))


@register_host("extract_regex_span")
def _extract_regex_span(arr: Array, pattern: str = "") -> Array:
    rx = re.compile(pattern)
    names = list(rx.groupindex)
    if not names:
        raise ArrowInvalid("extract_regex_span needs named capture groups")
    out = []
    for v in arr.to_pylist():
        m = rx.search(v) if v is not None else None
        out.append({n: [m.start(n), m.end(n) - m.start(n)] for n in names}
                   if m else None)
    return make_array(
        out, T.struct([(n, T.fixed_size_list(T.int32(), 2))
                       for n in names]))


@register_host("split_pattern_regex")
def _split_pattern_regex(arr: Array, pattern: str = "",
                         max_splits: Optional[int] = None,
                         reverse: bool = False) -> Array:
    rx = re.compile(pattern)
    n = 0 if max_splits is None else max_splits
    out = [None if v is None else rx.split(v, maxsplit=n)
           for v in arr.to_pylist()]
    return make_array(out, T.list_(T.string()))


@register_host("list_slice")
def _list_slice(arr: Array, start: int = 0, stop: Optional[int] = None,
                step: int = 1, return_fixed_size_list=None) -> Array:
    out = [None if v is None else v[slice(start, stop, step)]
           for v in arr.to_pylist()]
    return make_array(out, arr.type)


@register_host("dictionary_decode")
def _dictionary_decode(arr: Array) -> Array:
    if arr.type.id != TypeId.DICTIONARY:
        return arr
    return make_array(arr.to_pylist(), arr.type.value_type)


@register_host("pivot_wider")
def _pivot_wider(keys: Array, values: Array, key_names=None,
                 unexpected_key_behavior: str = "ignore") -> Array:
    """Scalar pivot: (key, value) rows -> one struct row
    (aggregate_pivot.cc)."""
    ks = keys.to_pylist()
    vs = values.to_pylist()
    names = list(key_names) if key_names is not None else \
        sorted({k for k in ks if k is not None})
    row = {n: None for n in names}
    for k, v in zip(ks, vs):
        if k is None:
            continue
        if k not in row:
            if unexpected_key_behavior == "raise":
                raise ArrowInvalid(f"unexpected pivot key {k!r}")
            continue
        if row[k] is not None:
            raise ArrowInvalid(f"duplicate pivot key {k!r}")
        row[k] = v
    vt = values.type
    return make_array([row], T.struct([(n, vt) for n in names]))


# --- grouped aggregates ----------------------------------------------------

@register("hash_first_last", "hash_aggregate")
def _hash_first_last(ctx, values, gids, num_groups,
                     skip_nulls: bool = True, min_count: int = 0,
                     num_segments=None):
    from .hash_agg import grouped_first, grouped_last
    return {"first": grouped_first(ctx, values, gids, num_groups,
                                   skip_nulls, min_count),
            "last": grouped_last(ctx, values, gids, num_groups,
                                 skip_nulls, min_count)}


def _grouped_moments(ctx, values, gids, num_groups):
    from .hash_agg import _group_valid_counts, _prep
    cap, live, seg = _prep(ctx, values, gids)
    f = _dec_factor(values.type)
    fv = values.values.astype(jnp.float64)
    if f is not None:
        fv = fv * f
    v = jnp.where(live, fv, 0.0)
    counts = _group_valid_counts(cap, live, seg)
    sums = jax.ops.segment_sum(v, seg, num_segments=cap)
    means = sums / jnp.maximum(counts, 1).astype(jnp.float64)
    c = jnp.where(live, v - means[seg], 0.0)
    m2 = jax.ops.segment_sum(c * c, seg, num_segments=cap)
    m3 = jax.ops.segment_sum(c * c * c, seg, num_segments=cap)
    m4 = jax.ops.segment_sum(c * c * c * c, seg, num_segments=cap)
    return counts.astype(jnp.float64), m2, m3, m4


@register("hash_skew", "hash_aggregate")
def _hash_skew(ctx, values, gids, num_groups, skip_nulls: bool = True,
               biased: bool = True, min_count: int = 0,
               num_segments=None):
    n, m2, m3, _ = _grouped_moments(ctx, values, gids, num_groups)
    sk = jnp.sqrt(jnp.maximum(n, 1.0)) * m3 / \
        jnp.maximum(m2, 1e-300) ** 1.5
    validity = n >= jnp.maximum(min_count, 1)
    return Compacted(DeviceColumn(sk, validity, T.float64()),
                     num_groups.astype(jnp.int32))


@register("hash_kurtosis", "hash_aggregate")
def _hash_kurtosis(ctx, values, gids, num_groups, skip_nulls: bool = True,
                   biased: bool = True, min_count: int = 0,
                   num_segments=None):
    n, m2, _, m4 = _grouped_moments(ctx, values, gids, num_groups)
    kt = jnp.maximum(n, 1.0) * m4 / jnp.maximum(m2 * m2, 1e-300) - 3.0
    validity = n >= jnp.maximum(min_count, 1)
    return Compacted(DeviceColumn(kt, validity, T.float64()),
                     num_groups.astype(jnp.int32))


def _grouped_quantile(ctx, values, gids, num_groups, q: float):
    """Per-group linear-interpolated quantile: sort (gid, value), compute
    group offsets, gather at the interpolation positions."""
    from .move import gather_rows, sort_with_payload
    cap = ctx.capacity
    live = values.valid_mask(ctx.row_mask())
    live = jnp.logical_and(live, gids < cap)
    f = _dec_factor(values.type)
    fv = values.values.astype(jnp.float64)
    if f is not None:
        fv = fv * f
    gkey = jnp.where(live, gids, cap).astype(jnp.int64)
    from .keys import order_word

    class _S:
        pass
    s = _S()
    s.values = jnp.where(live, fv, jnp.inf)
    word = order_word(s)
    sv_g, sv_v = sort_with_payload([gkey.astype(jnp.uint64), word],
                                   [gkey, jnp.where(live, fv, jnp.inf)])
    counts = jax.ops.segment_sum(live.astype(jnp.int64),
                                 jnp.where(live, gids, cap - 1),
                                 num_segments=cap)
    offsets = jnp.concatenate([jnp.zeros(1, jnp.int64),
                               jnp.cumsum(counts)[:-1]])
    nf = jnp.maximum(counts, 1).astype(jnp.float64)
    pos = q * (nf - 1.0)
    lo = jnp.floor(pos).astype(jnp.int64)
    hi = jnp.ceil(pos).astype(jnp.int64)
    frac = pos - lo.astype(jnp.float64)
    (vlo,) = gather_rows([sv_v], (offsets + lo).astype(jnp.int32))
    (vhi,) = gather_rows([sv_v], (offsets + hi).astype(jnp.int32))
    out = vlo + (vhi - vlo) * frac
    validity = counts > 0
    return out, validity


@register("hash_approximate_median", "hash_aggregate")
def _hash_approx_median(ctx, values, gids, num_groups,
                        skip_nulls: bool = True, min_count: int = 0,
                        num_segments=None):
    out, validity = _grouped_quantile(ctx, values, gids, num_groups, 0.5)
    return Compacted(DeviceColumn(out, validity, T.float64()),
                     num_groups.astype(jnp.int32))


@register("hash_tdigest", "hash_aggregate")
def _hash_tdigest(ctx, values, gids, num_groups, q=0.5, delta: int = 100,
                  buffer_size: int = 500, skip_nulls: bool = True,
                  min_count: int = 0, num_segments=None):
    qq = q if not isinstance(q, (list, tuple)) else q[0]
    out, validity = _grouped_quantile(ctx, values, gids, num_groups,
                                      float(qq))
    return Compacted(DeviceColumn(out, validity, T.float64()),
                     num_groups.astype(jnp.int32))


def _host_only_grouped(name):
    @register(name, "hash_aggregate",
              "host-tier grouped aggregate; executed by the aggregate "
              "node's host path (acero/host_agg.py)")
    def _impl(ctx, values, gids, num_groups, **options):
        raise ArrowInvalid(
            f"{name} runs via Table.group_by / the aggregate node "
            "(host-tier variable-length output)")
    return _impl


_host_only_grouped("hash_list")
_host_only_grouped("hash_distinct")
_host_only_grouped("hash_pivot_wider")
