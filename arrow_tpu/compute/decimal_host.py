"""Host-tier exact compute for decimals wider than the device's int64
representation (precision > 18).

Reference analogues: util/basic_decimal.h (128/256-bit limb arithmetic)
and the decimal paths of kernels/aggregate_basic.cc,
scalar_arithmetic.cc. On device these columns ride as dictionary codes
(see device/column.py); the exact values live host-side, so sums, means
and arithmetic run here on python integers — arbitrary precision, bit
exact, matching pyarrow's observed semantics (mean/product round half
away from zero at the input scale; add/sub widen precision by one;
results past the 38/76-digit ceiling raise)."""

from __future__ import annotations

import decimal as _dec
from typing import List, Optional, Sequence

from .. import types as T
from ..array.array import Array, array as make_array
from ..table import ChunkedArray
from ..types import DataType, TypeId

_DEC_IDS = (TypeId.DECIMAL128, TypeId.DECIMAL256, TypeId.DECIMAL32,
            TypeId.DECIMAL64)


def is_wide_decimal(t: DataType) -> bool:
    return t.id in _DEC_IDS and t.precision > 18


def _max_precision(t: DataType) -> int:
    return 76 if t.id == TypeId.DECIMAL256 else 38


def _mk(t: DataType, precision: int, scale: int) -> DataType:
    if t.id == TypeId.DECIMAL256 or precision > 38:
        return T.decimal256(min(precision, 76), scale)
    return T.decimal128(precision, scale)


def _quant(scale: int) -> _dec.Decimal:
    return _dec.Decimal(1).scaleb(-scale)


def _round_half_away(v: _dec.Decimal, scale: int) -> _dec.Decimal:
    return v.quantize(_quant(scale), rounding=_dec.ROUND_HALF_UP)


_AGG_NAMES = {"sum", "mean", "product", "min", "max", "min_max",
              "variance", "stddev", "quantile", "approximate_median"}
_ARITH_NAMES = {"add", "add_checked", "subtract", "subtract_checked",
                "multiply", "multiply_checked", "negate", "negate_checked",
                "abs", "abs_checked", "sign"}
_PARITY_RAISE = {"first", "last", "first_last", "skew", "kurtosis",
                 "divide", "divide_checked", "power", "power_checked",
                 "sqrt", "sqrt_checked", "exp", "ln", "cumulative_sum",
                 "cumulative_prod", "cumulative_mean", "tdigest", "mode"}


def maybe_wide_decimal_call(name: str, args: Sequence, options):
    """Intercept a compute call when an argument is a wide decimal.
    Returns the result, or None when not applicable."""
    from .registry import ArrowInvalid, Scalar

    norm: List = [a.combine() if isinstance(a, ChunkedArray) else a
                  for a in args]
    wide = [a for a in norm
            if isinstance(a, Array) and is_wide_decimal(a.type)]
    if not wide:
        return None
    if name in _PARITY_RAISE:
        # reference parity: these kernels have no decimal>18 path either
        # (e.g. pyarrow: "first_last has no kernel matching decimal128(38)")
        raise ArrowInvalid(
            f"{name} has no kernel for {wide[0].type!r}; cast first")
    if name in _AGG_NAMES:
        return _agg(name, norm[0], dict(options or {}))
    if name in _ARITH_NAMES:
        return _arith(name, norm, dict(options or {}))
    return None  # comparisons/selection/etc. ride the dictionary codes


def _valid_values(arr: Array) -> List[_dec.Decimal]:
    return [v for v in arr.to_pylist() if v is not None]


def _agg(name: str, arr: Array, opts):
    from .registry import ArrowInvalid, Scalar
    t = arr.type
    vals = _valid_values(arr)
    skip_nulls = opts.get("skip_nulls", True)
    min_count = opts.get("min_count", 1)
    n_null = len(arr) - len(vals)
    ok = len(vals) >= min_count and (skip_nulls or n_null == 0)
    wide_t = _mk(t, _max_precision(t), t.scale)

    if name == "sum":
        if not ok:
            return Scalar(None, wide_t)
        return Scalar(sum(vals, _dec.Decimal(0)).quantize(_quant(t.scale)),
                      wide_t)
    if name == "product":
        p = _dec.Decimal(1)
        for v in vals:
            p *= v
        return Scalar(_round_half_away(p, t.scale) if ok else None, wide_t)
    if name == "mean":
        if not vals or not ok:
            return Scalar(None, wide_t)
        with _dec.localcontext() as cctx:
            cctx.prec = 80
            m = sum(vals, _dec.Decimal(0)) / len(vals)
        return Scalar(_round_half_away(m, t.scale), wide_t)
    if name in ("min", "max"):
        ok = ok and bool(vals)
        v = (min(vals) if name == "min" else max(vals)) if vals else None
        return Scalar(v if ok else None, t)
    if name == "min_max":
        ok = ok and bool(vals)
        st = T.struct([("min", t), ("max", t)])
        if not ok:
            return Scalar({"min": None, "max": None}, st)
        return Scalar({"min": min(vals), "max": max(vals)}, st)
    if name in ("variance", "stddev"):
        ddof = opts.get("ddof", 0)
        fv = [float(v) for v in vals]
        n = len(fv)
        if n - ddof <= 0 or not ok:
            return Scalar(None, T.float64())
        mu = sum(fv) / n
        var = sum((x - mu) ** 2 for x in fv) / (n - ddof)
        return Scalar(var if name == "variance" else var ** 0.5,
                      T.float64())
    if name in ("quantile", "approximate_median"):
        # reference converts decimals to double for these
        import numpy as np
        if not vals or not ok:
            return Scalar(None, T.float64())
        q = opts.get("q", 0.5) if name == "quantile" else 0.5
        interp = opts.get("interpolation", "linear")
        kw = {"method": interp} if interp in (
            "linear", "lower", "higher", "nearest", "midpoint") else {}
        r = float(np.quantile(np.array([float(v) for v in vals]), q, **kw))
        if name == "quantile":
            return make_array([r], T.float64())
        return Scalar(r, T.float64())
    raise ArrowInvalid(f"unhandled wide-decimal aggregate {name}")


def _binary_vals(norm, n: int):
    """Yield (a_i, b_i) pairs of python Decimals/None, broadcasting
    scalars."""
    a, b = norm[0], norm[1]
    av = a.to_pylist() if isinstance(a, Array) else [a] * n
    bv = b.to_pylist() if isinstance(b, Array) else [b] * n
    return av, bv


def _arith(name: str, norm, opts):
    from .registry import ArrowInvalid
    base = name.replace("_checked", "")
    arrs = [a for a in norm if isinstance(a, Array)]
    t0 = arrs[0].type
    n = len(arrs[0])

    if base in ("negate", "abs", "sign"):
        vals = arrs[0].to_pylist()
        if base == "negate":
            return make_array([None if v is None else -v for v in vals], t0)
        if base == "abs":
            return make_array([None if v is None else abs(v)
                               for v in vals], t0)
        return make_array(
            [None if v is None else (0 if v == 0 else (1 if v > 0 else -1))
             for v in vals], T.int64())

    types = []
    for a in norm:
        if isinstance(a, Array):
            if a.type.id not in _DEC_IDS:
                raise ArrowInvalid(
                    f"decimal {base} requires decimal operands")
            types.append(a.type)
        elif isinstance(a, _dec.Decimal):
            exp = max(-a.as_tuple().exponent, 0)
            types.append(_mk(t0, len(a.as_tuple().digits), exp))
        elif isinstance(a, int):
            types.append(_mk(t0, len(str(abs(a))) or 1, 0))
        else:
            raise ArrowInvalid(
                f"decimal {base} with {type(a)} not supported; cast first")
    p1, s1 = types[0].precision, types[0].scale
    p2, s2 = types[1].precision, types[1].scale
    ceiling = max(_max_precision(types[0]), _max_precision(types[1]))
    if base in ("add", "subtract"):
        # reference promotion (scalar_arithmetic.cc): scale = max(s1,s2),
        # precision = max(p1-s1, p2-s2) + scale + 1
        s = max(s1, s2)
        p = max(p1 - s1, p2 - s2) + s + 1
    else:  # multiply
        s = s1 + s2
        p = p1 + p2 + 1
    if p > ceiling:
        raise ArrowInvalid(
            f"Decimal precision out of range [1, {ceiling}]: {p}")
    out_t = _mk(types[0] if types[0].id == TypeId.DECIMAL256 else types[1],
                p, s)
    av, bv = _binary_vals(norm, n)
    q = _quant(s)
    out = []
    for x, y in zip(av, bv):
        if x is None or y is None:
            out.append(None)
            continue
        x = _dec.Decimal(x) if not isinstance(x, _dec.Decimal) else x
        y = _dec.Decimal(y) if not isinstance(y, _dec.Decimal) else y
        with _dec.localcontext() as cctx:
            cctx.prec = 160
            if base == "add":
                r = x + y
            elif base == "subtract":
                r = x - y
            else:
                r = x * y
        out.append(r.quantize(q))
    return make_array(out, out_t)
