"""Element-wise ("scalar") kernels.

Reference analogues: compute/kernels/scalar_arithmetic.cc, scalar_compare.cc,
scalar_boolean.cc, scalar_if_else.cc, scalar_validity.cc, scalar_round.cc.

Null handling follows the reference's INTERSECTION policy (null if any input
null; compute/exec.cc:1222 PropagateNullsSpans) except Kleene boolean ops.
All kernels are traced by XLA; value lanes at null positions hold zeros so
downstream reductions are deterministic.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import types as T
from ..device.column import DeviceColumn, jnp_dtype_for
from ..types import DataType, TypeId
from .registry import ArrowInvalid, register, register_alias


# --- helpers ---------------------------------------------------------------

@jax.tree_util.register_pytree_node_class
class ErrGuard:
    """Wraps a kernel result with a deferred error flag, raised when the
    result is materialized on host (checked arithmetic semantics)."""

    __slots__ = ("result", "flag", "msg")

    def __init__(self, result, flag, msg: str):
        self.result = result
        self.flag = flag
        self.msg = msg

    def tree_flatten(self):
        return (self.result, self.flag), self.msg

    @classmethod
    def tree_unflatten(cls, msg, children):
        return cls(children[0], children[1], msg)


def _require_numeric(name, *args):
    """Trace-time type check: dictionary-coded (string) columns must not
    flow into numeric kernels — codes are not values."""
    for x in args:
        if isinstance(x, DeviceColumn) and (
                x.dictionary is not None or x.type.id in (
                    TypeId.STRING, TypeId.BINARY, TypeId.LARGE_STRING,
                    TypeId.LARGE_BINARY, TypeId.DICTIONARY)):
            from .registry import ArrowNotImplementedError
            raise ArrowNotImplementedError(
                f"{name}: not supported for {x.type!r} columns")


def _as_values(x, dtype=None):
    """DeviceColumn | python scalar -> (values array/scalar, validity)."""
    if isinstance(x, DeviceColumn):
        return x.values, x.validity
    v = jnp.asarray(x, dtype=dtype) if dtype is not None else jnp.asarray(x)
    return v, None


def _and_validity(*vs):
    out = None
    for v in vs:
        if v is None:
            continue
        out = v if out is None else jnp.logical_and(out, v)
    return out


def _numeric_type_of(*args) -> DataType:
    from ..types import from_numpy_dtype
    dts = []
    for a in args:
        if isinstance(a, DeviceColumn):
            dts.append(np.dtype(a.values.dtype))
        else:
            dts.append(np.result_type(a))
    rt = np.result_type(*dts)
    return from_numpy_dtype(rt)


def _col(values, validity, type: Optional[DataType] = None,
         dictionary=None) -> DeviceColumn:
    if type is None:
        from ..types import from_numpy_dtype
        type = from_numpy_dtype(np.dtype(values.dtype))
    # zero out null lanes for deterministic downstream math
    if validity is not None and jnp.issubdtype(values.dtype, jnp.number):
        values = jnp.where(validity, values, jnp.zeros((), values.dtype))
    return DeviceColumn(values, validity, type, dictionary)


def _shared_dictionary(*args):
    """The dictionary to attach to a value-selecting kernel's output;
    valid because dispatch.unify_device_dicts gives all dictionary-coded
    inputs one shared dictionary before the kernel runs."""
    return next((x.dictionary for x in args
                 if isinstance(x, DeviceColumn)
                 and x.dictionary is not None), None)


def _arith_type(a, b=None, op: str = "add") -> Optional[DataType]:
    args = [x for x in (a, b) if x is not None]
    cols = [x for x in args if isinstance(x, DeviceColumn)]
    if not cols:
        return None
    dec = [c for c in cols
           if c.type.id in (TypeId.DECIMAL128, TypeId.DECIMAL256, TypeId.DECIMAL32, TypeId.DECIMAL64)]
    if dec:
        if len(dec) != len(cols):
            return dec[0].type  # decimal op plain-int scalar keeps scale
        # decimal result rules (reference: compute/kernels
        # /scalar_arithmetic.cc decimal promotion, simplified to the
        # device's 18-digit unscaled-int64 range)
        import arrow_tpu.types as _T
        s = [c.type.scale for c in dec]
        p = [c.type.precision for c in dec]
        if op in ("add", "subtract"):
            if len(dec) == 2 and s[0] != s[1]:
                raise ArrowInvalid(
                    f"decimal {op} requires equal scales, got {s}")
            return _T.decimal128(min(max(p) + 1, 18), s[0])
        if op == "multiply":
            ss = sum(s) if len(dec) == 2 else s[0]
            pp = sum(p) + 1 if len(dec) == 2 else p[0]
            if ss > 18:
                raise ArrowInvalid(
                    "decimal multiply result scale exceeds device limit "
                    "18; cast to float64 first")
            # precision clamps to the device's unscaled-int64 range;
            # products beyond 18 digits wrap (use _checked to detect)
            return _T.decimal128(min(pp, 18), ss)
        raise ArrowInvalid(
            f"decimal {op} not supported on device; cast to float64")
    if all(c.type.is_temporal for c in cols):
        return cols[0].type
    return None


# --- arithmetic ------------------------------------------------------------

def _binary_arith(name: str, op, checked_overflow=None, doc=""):
    @register(name, "elementwise", doc)
    def _fn(ctx, a, b):
        _require_numeric(name, a, b)
        av, avd = _as_values(a)
        bv, bvd = _as_values(b)
        validity = _and_validity(avd, bvd)
        out = op(av, bv)
        return _col(out, validity, _arith_type(a, b, name))

    if checked_overflow is not None:
        @register(name + "_checked", "elementwise", doc + " (checked)")
        def _fn_checked(ctx, a, b):
            av, avd = _as_values(a)
            bv, bvd = _as_values(b)
            validity = _and_validity(avd, bvd)
            out = op(av, bv)
            bad = checked_overflow(av, bv, out)
            live = validity if validity is not None else True
            bad = jnp.logical_and(bad, jnp.logical_and(live, ctx.row_mask()))
            flag = jnp.any(bad)
            return ErrGuard(_col(out, validity, _arith_type(a, b, name)),
                            flag,
                            f"overflow / domain error in {name}_checked")
        return _fn, _fn_checked
    return _fn


def _is_int(v):
    return jnp.issubdtype(jnp.asarray(v).dtype, jnp.integer)


def _add_overflow(a, b, out):
    if not _is_int(out):
        return jnp.zeros(jnp.shape(out), jnp.bool_)
    return ((b > 0) & (out < a)) | ((b < 0) & (out > a))


def _sub_overflow(a, b, out):
    if not _is_int(out):
        return jnp.zeros(jnp.shape(out), jnp.bool_)
    return ((b < 0) & (out < a)) | ((b > 0) & (out > a))


def _mul_overflow(a, b, out):
    if not _is_int(out):
        return jnp.zeros(jnp.shape(out), jnp.bool_)
    ok = (a == 0) | ((out // jnp.where(a == 0, 1, a)) == b)
    return ~ok


_binary_arith("add", jnp.add, _add_overflow, "element-wise addition")
_binary_arith("subtract", jnp.subtract, _sub_overflow)
_binary_arith("multiply", jnp.multiply, _mul_overflow)


@register("divide", "elementwise", "element-wise division")
def _divide(ctx, a, b):
    _require_numeric("divide", a, b)
    for x in (a, b):
        if isinstance(x, DeviceColumn) and x.type.id in (
                TypeId.DECIMAL128, TypeId.DECIMAL256, TypeId.DECIMAL32, TypeId.DECIMAL64):
            raise ArrowInvalid(
                "decimal divide not supported on device; cast to float64")
    av, avd = _as_values(a)
    bv, bvd = _as_values(b)
    validity = _and_validity(avd, bvd)
    if _is_int(av) and _is_int(bv):
        safe_b = jnp.where(bv == 0, 1, bv)
        out = jnp.trunc(av / safe_b).astype(jnp.result_type(av, bv)) \
            if False else (jnp.sign(av) * jnp.sign(safe_b) *
                           (jnp.abs(av) // jnp.abs(safe_b))).astype(
                               jnp.result_type(av, bv))
        live = validity if validity is not None else True
        bad = jnp.logical_and(bv == 0,
                              jnp.logical_and(live, ctx.row_mask()))
        return ErrGuard(_col(out, validity, _arith_type(a, b)),
                        jnp.any(bad), "divide by zero")
    out = av / bv
    return _col(out, validity, _arith_type(a, b))


register_alias("divide_checked", "divide")


@register("negate", "elementwise")
def _negate(ctx, a):
    av, avd = _as_values(a)
    return _col(jnp.negative(av), avd, _arith_type(a))


register_alias("negate_checked", "negate")


def _unary(name, op, float_only=False, out_type=None, doc=""):
    @register(name, "elementwise", doc)
    def _fn(ctx, a):
        _require_numeric(name, a)
        av, avd = _as_values(a)
        if float_only and _is_int(av):
            av = av.astype(jnp.float64)
        return _col(op(av), avd, out_type)
    return _fn


_unary("abs", jnp.abs)
register_alias("abs_checked", "abs")
_unary("sign", jnp.sign)
_unary("sqrt", jnp.sqrt, float_only=True)
register_alias("sqrt_checked", "sqrt")
_unary("exp", jnp.exp, float_only=True)
_unary("expm1", jnp.expm1, float_only=True)
_unary("ln", jnp.log, float_only=True)
register_alias("ln_checked", "ln")
_unary("log2", jnp.log2, float_only=True)
register_alias("log2_checked", "log2")
_unary("log10", jnp.log10, float_only=True)
register_alias("log10_checked", "log10")
_unary("log1p", jnp.log1p, float_only=True)
register_alias("log1p_checked", "log1p")
_unary("sin", jnp.sin, float_only=True)
register_alias("sin_checked", "sin")
_unary("cos", jnp.cos, float_only=True)
register_alias("cos_checked", "cos")
_unary("tan", jnp.tan, float_only=True)
register_alias("tan_checked", "tan")
_unary("asin", jnp.arcsin, float_only=True)
register_alias("asin_checked", "asin")
_unary("acos", jnp.arccos, float_only=True)
register_alias("acos_checked", "acos")
_unary("atan", jnp.arctan, float_only=True)
_unary("sinh", jnp.sinh, float_only=True)
_unary("cosh", jnp.cosh, float_only=True)
_unary("tanh", jnp.tanh, float_only=True)
_unary("asinh", jnp.arcsinh, float_only=True)
_unary("acosh", jnp.arccosh, float_only=True)
_unary("atanh", jnp.arctanh, float_only=True)


@register("atan2", "elementwise")
def _atan2(ctx, y, x):
    yv, yvd = _as_values(y)
    xv, xvd = _as_values(x)
    if _is_int(yv):
        yv = yv.astype(jnp.float64)
    if _is_int(xv):
        xv = xv.astype(jnp.float64)
    return _col(jnp.arctan2(yv, xv), _and_validity(yvd, xvd))


@register("power", "elementwise")
def _power(ctx, a, b):
    av, avd = _as_values(a)
    bv, bvd = _as_values(b)
    return _col(jnp.power(av, bv), _and_validity(avd, bvd))


register_alias("power_checked", "power")


@register("logb", "elementwise")
def _logb(ctx, a, b):
    av, avd = _as_values(a)
    bv, bvd = _as_values(b)
    if _is_int(av):
        av = av.astype(jnp.float64)
    if _is_int(bv):
        bv = bv.astype(jnp.float64)
    return _col(jnp.log(av) / jnp.log(bv), _and_validity(avd, bvd))


register_alias("logb_checked", "logb")


# bit-wise
_unary("bit_wise_not", jnp.invert)
_binary_arith("bit_wise_and", jnp.bitwise_and)
_binary_arith("bit_wise_or", jnp.bitwise_or)
_binary_arith("bit_wise_xor", jnp.bitwise_xor)
_binary_arith("shift_left", jnp.left_shift)
register_alias("shift_left_checked", "shift_left")
_binary_arith("shift_right", jnp.right_shift)
register_alias("shift_right_checked", "shift_right")


# --- rounding --------------------------------------------------------------

def _round_values(v, mode: str):
    if mode == "half_to_even":
        return jnp.round(v)
    if mode == "down":
        return jnp.floor(v)
    if mode == "up":
        return jnp.ceil(v)
    if mode == "towards_zero":
        return jnp.trunc(v)
    if mode == "towards_infinity":
        return jnp.where(v >= 0, jnp.ceil(v), jnp.floor(v))
    if mode == "half_down":
        return jnp.ceil(v - 0.5)
    if mode == "half_up":
        return jnp.floor(v + 0.5)
    if mode == "half_towards_zero":
        return jnp.where(v >= 0, jnp.ceil(v - 0.5), jnp.floor(v + 0.5))
    if mode == "half_towards_infinity":
        return jnp.where(v >= 0, jnp.floor(v + 0.5), jnp.ceil(v - 0.5))
    if mode == "half_to_odd":
        r = jnp.round(v)
        half = jnp.abs(v - jnp.trunc(v)) == 0.5
        even_adj = jnp.where((r % 2 == 0) & half,
                             r + jnp.where(v >= r, 1.0, -1.0), r)
        return jnp.where(half, jnp.trunc(v) + jnp.where(
            v >= 0, jnp.where(jnp.trunc(v) % 2 == 0, 1.0, 0.0),
            jnp.where(jnp.trunc(v) % 2 == 0, -1.0, 0.0)), r)
    raise ArrowInvalid(f"unknown round mode {mode!r}")


@register("round", "elementwise")
def _round(ctx, a, ndigits: int = 0, round_mode: str = "half_to_even"):
    av, avd = _as_values(a)
    if _is_int(av):
        return _col(av, avd, a.type if isinstance(a, DeviceColumn) else None)
    if ndigits == 0:
        return _col(_round_values(av, round_mode), avd)
    scale = 10.0 ** ndigits
    # barrier keeps XLA from folding /scale into *reciprocal (1-ulp drift
    # vs the reference's true division)
    denom = jax.lax.optimization_barrier(
        jnp.asarray(scale, av.dtype if jnp.issubdtype(av.dtype,
                                                      jnp.floating)
                    else jnp.float64))
    out = _round_values(av * scale, round_mode) / denom
    return _col(out, avd)


@register("round_to_multiple", "elementwise")
def _round_to_multiple(ctx, a, multiple: float = 1.0,
                       round_mode: str = "half_to_even"):
    av, avd = _as_values(a)
    if _is_int(av):
        av = av.astype(jnp.float64)
    out = _round_values(av / multiple, round_mode) * multiple
    return _col(out, avd)


_unary("floor", jnp.floor, float_only=True)
_unary("ceil", jnp.ceil, float_only=True)
_unary("trunc", jnp.trunc, float_only=True)


# --- comparison ------------------------------------------------------------

def _compare(name, op):
    @register(name, "elementwise")
    def _fn(ctx, a, b):
        av, avd = _as_values(a)
        bv, bvd = _as_values(b)
        return _col(op(av, bv), _and_validity(avd, bvd), T.bool_())
    return _fn


_compare("equal", jnp.equal)
_compare("not_equal", jnp.not_equal)
_compare("less", jnp.less)
_compare("less_equal", jnp.less_equal)
_compare("greater", jnp.greater)
_compare("greater_equal", jnp.greater_equal)


@register("between", "elementwise")
def _between(ctx, x, low, high, inclusive: str = "both"):
    xv, xvd = _as_values(x)
    lv, lvd = _as_values(low)
    hv, hvd = _as_values(high)
    lo = jnp.less_equal(lv, xv) if inclusive in ("both", "left") \
        else jnp.less(lv, xv)
    hi = jnp.less_equal(xv, hv) if inclusive in ("both", "right") \
        else jnp.less(xv, hv)
    return _col(jnp.logical_and(lo, hi), _and_validity(xvd, lvd, hvd),
                T.bool_())


def _minmax_elementwise(name, op, pickval):
    @register(name, "elementwise")
    def _fn(ctx, *args, skip_nulls: bool = True):
        vals = [_as_values(a) for a in args]
        out_v, out_d = vals[0]
        for v, d in vals[1:]:
            if skip_nulls:
                both = _and_validity(out_d, d)
                a_ok = out_d if out_d is not None else None
                b_ok = d if d is not None else None
                better = op(v, out_v)
                take_b = better
                if b_ok is not None:
                    take_b = jnp.logical_and(take_b, b_ok)
                if a_ok is not None:
                    take_b = jnp.logical_or(take_b, ~a_ok)
                    if b_ok is not None:
                        take_b = jnp.logical_and(
                            take_b, jnp.logical_or(b_ok, a_ok))
                new_v = jnp.where(take_b, v, out_v)
                new_d = None
                if out_d is not None or d is not None:
                    av = out_d if out_d is not None else jnp.ones_like(take_b)
                    bv2 = d if d is not None else jnp.ones_like(take_b)
                    new_d = jnp.logical_or(av, bv2)
                out_v, out_d = new_v, new_d
            else:
                out_v = jnp.where(op(v, out_v), v, out_v)
                out_d = _and_validity(out_d, d)
        t = next((a.type for a in args if isinstance(a, DeviceColumn)), None)
        d = _shared_dictionary(*args)
        return _col(out_v, out_d,
                    t if t and (t.is_temporal or d is not None) else None, d)
    return _fn


_minmax_elementwise("min_element_wise", jnp.less, min)
_minmax_elementwise("max_element_wise", jnp.greater, max)


# --- boolean ---------------------------------------------------------------

def _bool_args(a, b):
    av, avd = _as_values(a)
    bv, bvd = _as_values(b)
    return av.astype(jnp.bool_), avd, bv.astype(jnp.bool_), bvd


@register("and", "elementwise")
def _and(ctx, a, b):
    av, avd, bv, bvd = _bool_args(a, b)
    return _col(jnp.logical_and(av, bv), _and_validity(avd, bvd), T.bool_())


@register("or", "elementwise")
def _or(ctx, a, b):
    av, avd, bv, bvd = _bool_args(a, b)
    return _col(jnp.logical_or(av, bv), _and_validity(avd, bvd), T.bool_())


@register("xor", "elementwise")
def _xor(ctx, a, b):
    av, avd, bv, bvd = _bool_args(a, b)
    return _col(jnp.logical_xor(av, bv), _and_validity(avd, bvd), T.bool_())


@register("and_not", "elementwise")
def _and_not(ctx, a, b):
    av, avd, bv, bvd = _bool_args(a, b)
    return _col(jnp.logical_and(av, ~bv), _and_validity(avd, bvd), T.bool_())


@register("invert", "elementwise")
def _invert(ctx, a):
    av, avd = _as_values(a)
    return _col(jnp.logical_not(av.astype(jnp.bool_)), avd, T.bool_())


@register("and_kleene", "elementwise")
def _and_kleene(ctx, a, b):
    # false AND null -> false; true AND null -> null
    av, avd, bv, bvd = _bool_args(a, b)
    a_valid = avd if avd is not None else jnp.ones_like(av)
    b_valid = bvd if bvd is not None else jnp.ones_like(bv)
    a_false = jnp.logical_and(a_valid, ~av)
    b_false = jnp.logical_and(b_valid, ~bv)
    out_valid = jnp.logical_or(jnp.logical_or(a_false, b_false),
                               jnp.logical_and(a_valid, b_valid))
    out = jnp.logical_and(jnp.logical_and(av, a_valid) | ~a_valid,
                          jnp.logical_and(bv, b_valid) | ~b_valid)
    out = jnp.logical_and(out, ~jnp.logical_or(a_false, b_false))
    return _col(out, out_valid, T.bool_())


@register("or_kleene", "elementwise")
def _or_kleene(ctx, a, b):
    av, avd, bv, bvd = _bool_args(a, b)
    a_valid = avd if avd is not None else jnp.ones_like(av)
    b_valid = bvd if bvd is not None else jnp.ones_like(bv)
    a_true = jnp.logical_and(a_valid, av)
    b_true = jnp.logical_and(b_valid, bv)
    out_valid = jnp.logical_or(jnp.logical_or(a_true, b_true),
                               jnp.logical_and(a_valid, b_valid))
    out = jnp.logical_or(a_true, b_true)
    return _col(out, out_valid, T.bool_())


@register("and_not_kleene", "elementwise")
def _and_not_kleene(ctx, a, b):
    inverted = _invert(ctx, b)
    return _and_kleene(ctx, a, inverted)


# --- validity --------------------------------------------------------------

@register("is_null", "elementwise")
def _is_null(ctx, a, nan_is_null: bool = False):
    av, avd = _as_values(a)
    out = jnp.zeros(jnp.shape(av), jnp.bool_) if avd is None else ~avd
    if nan_is_null and jnp.issubdtype(av.dtype, jnp.floating):
        out = jnp.logical_or(out, jnp.isnan(av))
    return _col(out, None, T.bool_())


@register("is_valid", "elementwise")
def _is_valid(ctx, a):
    av, avd = _as_values(a)
    out = jnp.ones(jnp.shape(av), jnp.bool_) if avd is None else avd
    return _col(out, None, T.bool_())


@register("is_nan", "elementwise")
def _is_nan(ctx, a):
    av, avd = _as_values(a)
    if not jnp.issubdtype(av.dtype, jnp.floating):
        return _col(jnp.zeros(jnp.shape(av), jnp.bool_), avd, T.bool_())
    return _col(jnp.isnan(av), avd, T.bool_())


@register("is_finite", "elementwise")
def _is_finite(ctx, a):
    av, avd = _as_values(a)
    if not jnp.issubdtype(av.dtype, jnp.floating):
        return _col(jnp.ones(jnp.shape(av), jnp.bool_), avd, T.bool_())
    return _col(jnp.isfinite(av), avd, T.bool_())


@register("is_inf", "elementwise")
def _is_inf(ctx, a):
    av, avd = _as_values(a)
    if not jnp.issubdtype(av.dtype, jnp.floating):
        return _col(jnp.zeros(jnp.shape(av), jnp.bool_), avd, T.bool_())
    return _col(jnp.isinf(av), avd, T.bool_())


@register("true_unless_null", "elementwise")
def _true_unless_null(ctx, a):
    av, avd = _as_values(a)
    return _col(jnp.ones(jnp.shape(av), jnp.bool_), avd, T.bool_())


# --- conditional -----------------------------------------------------------

@register("if_else", "elementwise")
def _if_else(ctx, cond, a, b):
    cv, cvd = _as_values(cond)
    av, avd = _as_values(a)
    bv, bvd = _as_values(b)
    cv = cv.astype(jnp.bool_)
    out = jnp.where(cv, av, bv)
    branch_validity = None
    if avd is not None or bvd is not None:
        at = avd if avd is not None else jnp.ones(jnp.shape(out), jnp.bool_)
        bt = bvd if bvd is not None else jnp.ones(jnp.shape(out), jnp.bool_)
        branch_validity = jnp.where(cv, at, bt)
    validity = _and_validity(cvd, branch_validity)
    t = next((x.type for x in (a, b) if isinstance(x, DeviceColumn)), None)
    return _col(out, validity, t if t and not t.is_numeric else None,
                _shared_dictionary(a, b))


@register("coalesce", "elementwise")
def _coalesce(ctx, *args):
    out_v, out_d = _as_values(args[0])
    if out_d is None:
        return _col(out_v, None)
    for a in args[1:]:
        av, avd = _as_values(a)
        need = ~out_d
        out_v = jnp.where(need, av, out_v)
        filled = avd if avd is not None else jnp.ones_like(out_d)
        out_d = jnp.logical_or(out_d, jnp.logical_and(need, filled))
        # once fully valid we could stop, but tracing keeps it simple
    t = next((x.type for x in args if isinstance(x, DeviceColumn)), None)
    return _col(out_v, out_d, t if t and not t.is_numeric else None,
                _shared_dictionary(*args))


@register("fill_null", "elementwise")
def _fill_null(ctx, a, fill_value):
    return _coalesce(ctx, a, fill_value)


@register("choose", "elementwise")
def _choose(ctx, indices, *cases):
    iv, ivd = _as_values(indices)
    stacked = jnp.stack([_as_values(c)[0] for c in cases])
    out = jnp.take_along_axis(
        stacked, iv[None, :].astype(jnp.int32), axis=0)[0]
    case_valid = [
        _as_values(c)[1] if isinstance(c, DeviceColumn) and
        c.validity is not None else None for c in cases]
    validity = ivd
    if any(v is not None for v in case_valid):
        vm = jnp.stack([v if v is not None
                        else jnp.ones(jnp.shape(out), jnp.bool_)
                        for v in case_valid])
        sel = jnp.take_along_axis(
            vm, iv[None, :].astype(jnp.int32), axis=0)[0]
        validity = _and_validity(validity, sel)
    return _col(out, validity)


# --- cast ------------------------------------------------------------------

@register("cast", "elementwise")
def _cast(ctx, a, to_type: DataType = None, target_type: DataType = None,
          safe: bool = True):
    t = to_type if to_type is not None else target_type
    if t is None:
        raise ArrowInvalid("cast requires to_type")
    if isinstance(t, str):  # pyarrow accepts type aliases, e.g. "float64"
        from ..api import type_for_alias
        t = type_for_alias(t)
    av, avd = _as_values(a)
    src = a.type if isinstance(a, DeviceColumn) else None

    if isinstance(a, DeviceColumn) and a.dictionary is not None and \
            not (t.id in (TypeId.STRING, TypeId.LARGE_STRING,
                          TypeId.DICTIONARY)):
        return _cast_parse_strings(ctx, a, t, safe)

    if src is not None and src.is_temporal and t.is_temporal:
        out = _temporal_rescale(av, src, t)
        return _col(out, avd, t)

    dtype = jnp_dtype_for(t)
    if t.id == TypeId.BOOL:
        out = av.astype(jnp.bool_)
        return _col(out, avd, t)
    out = av.astype(dtype)
    if safe:
        live = ctx.row_mask()
        if avd is not None:
            live = jnp.logical_and(live, avd)
        bad = None
        if jnp.issubdtype(av.dtype, jnp.floating) and \
                jnp.issubdtype(jnp.dtype(dtype), jnp.integer):
            bad = jnp.logical_and(live, av != jnp.trunc(av))
            bad = jnp.logical_or(bad, jnp.logical_and(
                live, out.astype(av.dtype) != jnp.trunc(av)))
        elif jnp.issubdtype(av.dtype, jnp.integer) and \
                jnp.issubdtype(jnp.dtype(dtype), jnp.integer):
            bad = jnp.logical_and(live, out.astype(av.dtype) != av)
        if bad is not None:
            return ErrGuard(_col(out, avd, t), jnp.any(bad),
                            f"cast to {t!r} would lose data "
                            "(use safe=False to allow)")
    return _col(out, avd, t)


def _parse_one(v: str, t: DataType):
    """Parse one string to the python value for target type ``t``
    (reference: compute/kernels/scalar_cast_string.cc parse paths)."""
    import datetime
    s = v.strip()
    if t.id == TypeId.BOOL:
        lv = s.lower()
        if lv in ("true", "1", "t", "yes"):
            return True
        if lv in ("false", "0", "f", "no"):
            return False
        raise ValueError(s)
    if t.is_integer:
        return int(s)
    if t.is_floating:
        return float(s)
    if t.id == TypeId.DATE32:
        return datetime.date.fromisoformat(s).toordinal() - 719163
    if t.id == TypeId.DATE64:
        return (datetime.date.fromisoformat(s).toordinal()
                - 719163) * 86_400_000
    if t.id == TypeId.TIMESTAMP:
        dt = datetime.datetime.fromisoformat(s)
        epoch = datetime.datetime(1970, 1, 1, tzinfo=dt.tzinfo)
        delta = dt - epoch
        us = (delta.days * 86_400 + delta.seconds) * 1_000_000 \
            + delta.microseconds
        return us * _UNIT_US_INV.get(t.unit, 1) // _UNIT_US.get(t.unit, 1)
    raise ValueError(f"cannot parse string as {t!r}")


def _cast_parse_strings(ctx, a: DeviceColumn, t: DataType, safe: bool):
    """String -> numeric/bool/temporal cast. TPU design: parse each
    DISTINCT value once on the host at trace time (the dictionary is tiny),
    then one gather through the int32 codes on device — the reference
    (scalar_cast_string.cc) re-parses every row."""
    vals = a.dictionary.to_pylist()
    parsed, bad = [], []
    for v in vals:
        if v is None:
            parsed.append(0)
            bad.append(False)
            continue
        try:
            p = _parse_one(v, t)
            parsed.append(p)
            bad.append(False)
        except (ValueError, ArithmeticError):
            parsed.append(0)
            bad.append(True)
    dtype = jnp_dtype_for(t)
    table = jnp.asarray(np.asarray(parsed, dtype=dtype))
    badt = jnp.asarray(np.asarray(bad, dtype=np.bool_))
    codes = a.values.astype(jnp.int32)
    out = table[codes]
    badv = badt[codes]
    live = ctx.row_mask()
    if a.validity is not None:
        live = jnp.logical_and(live, a.validity)
    if safe:
        return ErrGuard(_col(out, a.validity, t),
                        jnp.any(jnp.logical_and(live, badv)),
                        f"cast: could not parse string as {t!r}")
    # unsafe: unparseable values become null
    validity = jnp.logical_and(
        a.validity if a.validity is not None
        else jnp.ones_like(badv), ~badv)
    return _col(out, validity, t)


_UNIT_US = {"s": 1_000_000, "ms": 1000, "us": 1, "ns": 1}
_UNIT_US_INV = {"s": 1, "ms": 1, "us": 1, "ns": 1000}


def _unit_of(t: DataType) -> str:
    if t.id == TypeId.DATE32:
        return "day"
    if t.id == TypeId.DATE64:
        return "ms"
    return t.unit


_UNIT_NS = {"day": 86_400_000_000_000, "s": 1_000_000_000, "ms": 1_000_000,
            "us": 1000, "ns": 1}


def _temporal_rescale(v, src: DataType, dst: DataType):
    s, d = _UNIT_NS[_unit_of(src)], _UNIT_NS[_unit_of(dst)]
    v = v.astype(jnp.int64)
    if s == d:
        out = v
    elif s > d:
        out = v * (s // d)
    else:
        out = v // (d // s)
    return out.astype(jnp_dtype_for(dst))
