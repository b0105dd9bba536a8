"""Scalar (whole-column) aggregate kernels.

Reference analogues: compute/kernels/aggregate_basic.cc (sum/count/minmax…),
aggregate_var_std.cc, aggregate_quantile.cc. Null semantics follow
ScalarAggregateOptions{skip_nulls=True, min_count=1}
(compute/api_aggregate.h:48, SURVEY A.6).

TPU design: each aggregate is one masked XLA reduction over the padded
column; there is no consume/merge/finalize state machine — XLA's fused
reduction replaces it. Reduction order is a fixed tree per capacity,
deterministic run-to-run.

Accumulation dtypes match the reference: integer sums accumulate in
int64/uint64, float sums and means in float64.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from .. import types as T
from ..device.column import DeviceColumn
from ..types import DataType, TypeId
from .registry import ArrowInvalid, ExecContext, Scalar, register


@jax.tree_util.register_pytree_node_class
class AggResult:
    """Jit-transparent aggregate result: device value(s) + validity flag.
    ``dictionary`` (aux) marks code-valued results: the scalar value is an
    index into it (min/max/first/last on dictionary-coded columns)."""

    __slots__ = ("value", "valid", "type", "fields", "dictionary")

    def __init__(self, value, valid, type: DataType, fields=None,
                 dictionary=None):
        self.value = value      # jnp scalar, or tuple of jnp scalars
        self.valid = valid      # jnp bool scalar, or tuple
        self.type = type
        self.fields = fields    # names when value is a tuple (struct result)
        self.dictionary = dictionary  # host Array for code-valued results

    def tree_flatten(self):
        from ..device.column import _HostRef
        return (self.value, self.valid), (self.type, self.fields,
                                          _HostRef(self.dictionary))

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux[0], aux[1], aux[2].obj)

    def _decode(self, v, t):
        if self.dictionary is not None:
            return self.dictionary.to_pylist()[int(np.asarray(v))]
        return _py_typed(v, t)

    def to_scalar(self):
        if self.fields is not None:
            vals = {}
            ftypes = getattr(self.type, "fields", None)
            for i, (name, v, ok) in enumerate(zip(self.fields, self.value,
                                                  self.valid)):
                ft = ftypes[i].type if ftypes is not None else None
                vals[name] = self._decode(v, ft) if bool(ok) else None
            return Scalar(vals, self.type)
        if not bool(self.valid):
            return Scalar(None, self.type)
        return Scalar(self._decode(self.value, self.type), self.type)


def rank_recode(col: DeviceColumn) -> DeviceColumn:
    """Re-encode a dictionary-coded column so codes are value-ordered
    ranks, attaching the value-sorted dictionary. Trace-time host work on
    the dictionary only (the per-row remap is a device gather) — the same
    pattern as the string kernels. Needed because upload dictionaries for
    strings are first-appearance-ordered (pyarrow dictionary_encode
    parity), so raw codes are not comparable."""
    if col.dictionary is None:
        return col
    vals = col.dictionary.to_pylist()
    order = sorted(range(len(vals)),
                   key=lambda i: (vals[i] is None, vals[i]))
    if order == list(range(len(vals))):
        return col  # already value-sorted (FSB / wide-decimal uploads)
    from ..array.array import array as make_array
    rank = np.empty(len(vals), dtype=np.int64)
    rank[np.asarray(order)] = np.arange(len(vals))
    new_codes = jnp.asarray(rank)[col.values.astype(jnp.int64)] \
        .astype(jnp.int32)
    sorted_dict = make_array([vals[i] for i in order], col.dictionary.type)
    return DeviceColumn(new_codes, col.validity, col.type, sorted_dict)


_NUMERIC_DICT_IDS = (
    TypeId.INT8, TypeId.INT16, TypeId.INT32, TypeId.INT64,
    TypeId.UINT8, TypeId.UINT16, TypeId.UINT32, TypeId.UINT64,
    TypeId.HALF_FLOAT, TypeId.FLOAT, TypeId.DOUBLE, TypeId.BOOL)


def decode_numeric_dict(col: DeviceColumn) -> DeviceColumn:
    """Dictionary decay for numeric kernels (reference:
    scalar_cast_dictionary.cc): a dictionary-coded column whose values are
    numeric decodes to plain values at trace time (host reads the
    dictionary, the per-row remap is a device gather). Code-valued columns
    that numeric kernels must NOT touch (strings, fixed-size binary,
    decimals wider than 18 digits, nested passthrough) raise — the planner
    routes those to the host tier."""
    if col.dictionary is None:
        return col
    dt = col.dictionary.type
    if dt.id not in _NUMERIC_DICT_IDS:
        raise ArrowInvalid(
            f"numeric aggregate on code-valued column of type {col.type!r}"
            " is not supported on device; it runs on the host tier")
    dvals = col.dictionary.data.values()
    dmask = col.dictionary.data.validity_mask()
    if dmask is not None:
        dvals = np.where(dmask, dvals, 0)
    codes = col.values.astype(jnp.int64)
    vals = jnp.asarray(np.ascontiguousarray(dvals))[codes]
    validity = col.validity
    if dmask is not None:
        slot_ok = jnp.asarray(dmask)[codes]
        validity = slot_ok if validity is None \
            else jnp.logical_and(validity, slot_ok)
    out_type = col.type.value_type if col.type.id == TypeId.DICTIONARY \
        else col.type
    return DeviceColumn(vals, validity, out_type)


def _dec_factor(t: DataType):
    """10^-scale for decimal types (None otherwise): float-domain
    aggregates must descale the device's unscaled-int64 representation."""
    if t.id in (TypeId.DECIMAL128, TypeId.DECIMAL256, TypeId.DECIMAL32, TypeId.DECIMAL64):
        return 10.0 ** (-t.scale)
    return None


def _py(v):
    x = np.asarray(v)
    if x.dtype == np.bool_:
        return bool(x)
    return x.item()


def _py_typed(v, t):
    """_py plus decimal decode: unscaled int -> decimal.Decimal."""
    x = _py(v)
    if t is not None and t.id in (TypeId.DECIMAL128, TypeId.DECIMAL256, TypeId.DECIMAL32, TypeId.DECIMAL64):
        import decimal as _d
        return _d.Decimal(int(x)).scaleb(-t.scale)
    return x


def _masked(ctx: ExecContext, col: DeviceColumn, identity):
    """Returns (masked values, live bool mask, live count)."""
    live = col.valid_mask(ctx.row_mask())
    v = jnp.where(live, col.values, jnp.asarray(identity, col.values.dtype))
    return v, live, jnp.sum(live, dtype=jnp.int64)


def _sum_dtype(dt):
    if jnp.issubdtype(dt, jnp.unsignedinteger):
        return jnp.uint64
    if jnp.issubdtype(dt, jnp.integer) or dt == jnp.bool_:
        return jnp.int64
    return jnp.float64


def _sum_type(t: DataType) -> DataType:
    if t.id in (TypeId.DECIMAL128, TypeId.DECIMAL256, TypeId.DECIMAL32, TypeId.DECIMAL64):
        # reference: sum of decimal keeps the scale, precision widens to
        # the type's maximum (kernels/aggregate_basic.cc decimal sum)
        if t.id == TypeId.DECIMAL256:
            return T.decimal256(76, t.scale)
        return T.decimal128(38, t.scale)
    if t.id == TypeId.BOOL:
        return T.uint64()
    if t.is_unsigned_integer:
        return T.uint64()
    if t.is_integer:
        return T.int64()
    return T.float64()


@register("sum", "aggregate")
def _sum(ctx, a, skip_nulls: bool = True, min_count: int = 1):
    a = decode_numeric_dict(a)
    v, live, n = _masked(ctx, a, 0)
    acc = _sum_dtype(v.dtype)
    total = jnp.sum(v.astype(acc))
    valid = _agg_valid(ctx, a, n, skip_nulls, min_count)
    return AggResult(total, valid, _sum_type(a.type))


@register("product", "aggregate")
def _product(ctx, a, skip_nulls: bool = True, min_count: int = 1):
    a = decode_numeric_dict(a)
    if _dec_factor(a.type) is not None:
        from .registry import ArrowInvalid
        raise ArrowInvalid("product of decimal not supported; cast first")
    live = a.valid_mask(ctx.row_mask())
    acc = _sum_dtype(a.values.dtype)
    v = jnp.where(live, a.values.astype(acc), jnp.asarray(1, acc))
    total = jnp.prod(v)
    n = jnp.sum(live, dtype=jnp.int64)
    valid = _agg_valid(ctx, a, n, skip_nulls, min_count)
    return AggResult(total, valid, _sum_type(a.type))


def _agg_valid(ctx, a, n, skip_nulls, min_count):
    ok = n >= jnp.asarray(max(min_count, 0), jnp.int64)
    if not skip_nulls:
        has_null = _has_null(ctx, a)
        ok = jnp.logical_and(ok, ~has_null)
    return ok


def _has_null(ctx, a):
    if a.validity is None:
        return jnp.asarray(False)
    return jnp.any(jnp.logical_and(~a.validity, ctx.row_mask()))


@register("mean", "aggregate")
def _mean(ctx, a, skip_nulls: bool = True, min_count: int = 1):
    a = decode_numeric_dict(a)
    v, live, n = _masked(ctx, a, 0)
    valid = _agg_valid(ctx, a, n, skip_nulls, min_count)
    if _dec_factor(a.type) is not None:
        # decimal mean stays decimal at the INPUT type, rounded half away
        # from zero (reference: aggregate_basic.cc decimal MeanImpl);
        # exact in int64: |m| = (2|s| + c) // (2c)
        s = jnp.sum(v.astype(jnp.int64))
        c = jnp.maximum(n, 1)
        mag = (2 * jnp.abs(s) + c) // (2 * c)
        m = jnp.where(s < 0, -mag, mag)
        return AggResult(m, valid, a.type)
    total = jnp.sum(v.astype(jnp.float64))
    # 0/0 -> NaN matches the reference: mean of zero values with
    # min_count=0 is a VALID NaN (aggregate_basic.cc MeanImpl)
    mean = total / n.astype(jnp.float64)
    return AggResult(mean, valid, T.float64())


def _minmax_identity(dt, is_min: bool):
    if jnp.issubdtype(dt, jnp.floating):
        return jnp.inf if is_min else -jnp.inf
    if dt == jnp.bool_:
        return True if is_min else False
    info = jnp.iinfo(dt)
    return info.max if is_min else info.min


@register("min", "aggregate")
def _min(ctx, a, skip_nulls: bool = True, min_count: int = 1):
    a = rank_recode(a)
    v, live, n = _masked(ctx, a, _minmax_identity(a.values.dtype, True))
    out = jnp.min(v)
    # min/max of zero values is null regardless of min_count
    valid = jnp.logical_and(
        _agg_valid(ctx, a, n, skip_nulls, min_count), n > 0)
    return AggResult(out, valid, a.type, dictionary=a.dictionary)


@register("max", "aggregate")
def _max(ctx, a, skip_nulls: bool = True, min_count: int = 1):
    a = rank_recode(a)
    v, live, n = _masked(ctx, a, _minmax_identity(a.values.dtype, False))
    out = jnp.max(v)
    valid = jnp.logical_and(
        _agg_valid(ctx, a, n, skip_nulls, min_count), n > 0)
    return AggResult(out, valid, a.type, dictionary=a.dictionary)


@register("min_max", "aggregate")
def _min_max(ctx, a, skip_nulls: bool = True, min_count: int = 1):
    lo = _min(ctx, a, skip_nulls, min_count)
    hi = _max(ctx, a, skip_nulls, min_count)
    return AggResult((lo.value, hi.value), (lo.valid, hi.valid),
                     T.struct([("min", a.type), ("max", a.type)]),
                     fields=("min", "max"), dictionary=lo.dictionary)


@register("count", "aggregate")
def _count(ctx, a, mode: str = "only_valid"):
    live = a.valid_mask(ctx.row_mask())
    if mode == "only_valid":
        n = jnp.sum(live, dtype=jnp.int64)
    elif mode == "only_null":
        n = jnp.sum(jnp.logical_and(~a.valid_mask(None), ctx.row_mask()),
                    dtype=jnp.int64)
    elif mode == "all":
        # row_mask-based so planner-fused filter masks count correctly
        n = jnp.sum(ctx.row_mask(), dtype=jnp.int64)
    else:
        raise ArrowInvalid(f"bad count mode {mode!r}")
    return AggResult(n, jnp.asarray(True), T.int64())


@register("count_all", "aggregate")
def _count_all(ctx, a):
    return AggResult(jnp.sum(ctx.row_mask(), dtype=jnp.int64),
                     jnp.asarray(True), T.int64())


@register("any", "aggregate")
def _any(ctx, a, skip_nulls: bool = True, min_count: int = 1):
    live = a.valid_mask(ctx.row_mask())
    vt = jnp.logical_and(a.values.astype(jnp.bool_), live)
    out = jnp.any(vt)
    n = jnp.sum(live, dtype=jnp.int64)
    ok = n >= jnp.asarray(max(min_count, 0), jnp.int64)
    if not skip_nulls:
        # Kleene: null poisons unless a true was seen
        ok = jnp.logical_and(jnp.logical_or(out, ~_has_null(ctx, a)), ok)
    return AggResult(out, ok, T.bool_())


@register("all", "aggregate")
def _all(ctx, a, skip_nulls: bool = True, min_count: int = 1):
    live = a.valid_mask(ctx.row_mask())
    vf = jnp.logical_and(~a.values.astype(jnp.bool_), live)
    any_false = jnp.any(vf)
    out = ~any_false
    n = jnp.sum(live, dtype=jnp.int64)
    ok = n >= jnp.asarray(max(min_count, 0), jnp.int64)
    if not skip_nulls:
        ok = jnp.logical_and(jnp.logical_or(any_false, ~_has_null(ctx, a)),
                             ok)
    return AggResult(out, ok, T.bool_())


@register("first", "aggregate")
def _first(ctx, a, skip_nulls: bool = True, min_count: int = 1):
    live = a.valid_mask(ctx.row_mask()) if skip_nulls else ctx.row_mask()
    idx = jnp.argmax(live)  # first True
    has = jnp.any(live)
    val = a.values[idx]
    valid = has
    if not skip_nulls and a.validity is not None:
        valid = jnp.logical_and(has, a.validity[idx])
    return AggResult(val, valid, a.type, dictionary=a.dictionary)


@register("last", "aggregate")
def _last(ctx, a, skip_nulls: bool = True, min_count: int = 1):
    live = a.valid_mask(ctx.row_mask()) if skip_nulls else ctx.row_mask()
    n = live.shape[0]
    rev = live[::-1]
    idx = n - 1 - jnp.argmax(rev)
    has = jnp.any(live)
    val = a.values[idx]
    valid = has
    if not skip_nulls and a.validity is not None:
        valid = jnp.logical_and(has, a.validity[idx])
    return AggResult(val, valid, a.type, dictionary=a.dictionary)


@register("first_last", "aggregate")
def _first_last(ctx, a, skip_nulls: bool = True, min_count: int = 1):
    f = _first(ctx, a, skip_nulls, min_count)
    l = _last(ctx, a, skip_nulls, min_count)
    return AggResult((f.value, l.value), (f.valid, l.valid),
                     T.struct([("first", a.type), ("last", a.type)]),
                     fields=("first", "last"), dictionary=a.dictionary)


@register("index", "aggregate")
def _index(ctx, a, value=None):
    if value is None:
        raise ArrowInvalid("index requires a value option")
    live = a.valid_mask(ctx.row_mask())
    hit = jnp.logical_and(live, a.values == jnp.asarray(
        value, a.values.dtype))
    found = jnp.any(hit)
    idx = jnp.where(found, jnp.argmax(hit).astype(jnp.int64),
                    jnp.asarray(-1, jnp.int64))
    return AggResult(idx, jnp.asarray(True), T.int64())


def _moments(ctx, a):
    a = decode_numeric_dict(a)
    v, live, n = _masked(ctx, a, 0)
    vf = v.astype(jnp.float64)
    f = _dec_factor(a.type)
    if f is not None:
        vf = vf * f
    nf = jnp.maximum(n, 1).astype(jnp.float64)
    mean = jnp.sum(vf) / nf
    centered = jnp.where(live, vf - mean, 0.0)
    m2 = jnp.sum(centered * centered)
    m3 = jnp.sum(centered ** 3)
    m4 = jnp.sum(centered ** 4)
    return n, mean, m2, m3, m4


@register("variance", "aggregate")
def _variance(ctx, a, ddof: int = 0, skip_nulls: bool = True,
              min_count: int = 0):
    n, mean, m2, _, _ = _moments(ctx, a)
    denom = n.astype(jnp.float64) - ddof
    var = m2 / jnp.maximum(denom, 1.0)
    ok = jnp.logical_and(n > jnp.asarray(ddof, jnp.int64),
                         _agg_valid(ctx, a, n, skip_nulls, min_count))
    return AggResult(var, ok, T.float64())


@register("stddev", "aggregate")
def _stddev(ctx, a, ddof: int = 0, skip_nulls: bool = True,
            min_count: int = 0):
    r = _variance(ctx, a, ddof, skip_nulls, min_count)
    return AggResult(jnp.sqrt(r.value), r.valid, T.float64())


@register("skew", "aggregate")
def _skew(ctx, a, skip_nulls: bool = True, biased: bool = True,
          min_count: int = 0):
    n, mean, m2, m3, _ = _moments(ctx, a)
    nf = n.astype(jnp.float64)
    var = m2 / jnp.maximum(nf, 1.0)
    sk = (m3 / jnp.maximum(nf, 1.0)) / jnp.maximum(var, 1e-300) ** 1.5
    if not biased:
        sk = sk * jnp.sqrt(nf * (nf - 1.0)) / jnp.maximum(nf - 2.0, 1.0)
    ok = _agg_valid(ctx, a, n, skip_nulls, max(min_count, 1))
    return AggResult(sk, ok, T.float64())


@register("kurtosis", "aggregate")
def _kurtosis(ctx, a, skip_nulls: bool = True, biased: bool = True,
              min_count: int = 0):
    n, mean, m2, _, m4 = _moments(ctx, a)
    nf = n.astype(jnp.float64)
    var = m2 / jnp.maximum(nf, 1.0)
    kt = (m4 / jnp.maximum(nf, 1.0)) / jnp.maximum(var, 1e-300) ** 2 - 3.0
    if not biased:
        kt = ((nf - 1.0) / jnp.maximum((nf - 2.0) * (nf - 3.0), 1.0)
              * ((nf + 1.0) * kt + 6.0))
    ok = _agg_valid(ctx, a, n, skip_nulls, max(min_count, 1))
    return AggResult(kt, ok, T.float64())


def _quantile_values(ctx, a, qs, interpolation: str):
    """Masked quantile via sort: nulls/padding sort to +inf and are excluded
    by indexing below the live count."""
    live = a.valid_mask(ctx.row_mask())
    n = jnp.sum(live, dtype=jnp.int64)
    av = a.values.astype(jnp.float64)
    f = _dec_factor(a.type)
    if f is not None:
        av = av * f
    v = jnp.where(live, av, jnp.inf)
    sv = jnp.sort(v)
    nf = jnp.maximum(n, 1)
    outs = []
    for q in qs:
        pos = q * (nf.astype(jnp.float64) - 1.0)
        lo = jnp.floor(pos).astype(jnp.int64)
        hi = jnp.ceil(pos).astype(jnp.int64)
        frac = pos - lo.astype(jnp.float64)
        vlo, vhi = sv[lo], sv[hi]
        if interpolation == "linear":
            out = vlo + (vhi - vlo) * frac
        elif interpolation == "lower":
            out = vlo
        elif interpolation == "higher":
            out = vhi
        elif interpolation == "nearest":
            out = jnp.where(frac <= 0.5, vlo, vhi)
        elif interpolation == "midpoint":
            out = (vlo + vhi) * 0.5
        else:
            raise ArrowInvalid(f"bad interpolation {interpolation!r}")
        outs.append(out)
    return outs, n


@register("quantile", "aggregate")
def _quantile(ctx, a, q=0.5, interpolation: str = "linear",
              skip_nulls: bool = True, min_count: int = 0):
    qs = list(q) if isinstance(q, (list, tuple)) else [q]
    outs, n = _quantile_values(ctx, a, qs, interpolation)
    ok = _agg_valid(ctx, a, n, skip_nulls, max(min_count, 1))
    if len(outs) == 1:
        return AggResult(outs[0], ok, T.float64())
    return AggResult(tuple(outs), tuple(ok for _ in outs),
                     T.list_(T.float64()),
                     fields=tuple(f"q{i}" for i in range(len(outs))))


@register("median", "aggregate")
def _median(ctx, a, skip_nulls: bool = True, min_count: int = 0):
    return _quantile(ctx, a, 0.5, "linear", skip_nulls, min_count)


@register("approximate_median", "aggregate")
def _approx_median(ctx, a, skip_nulls: bool = True, min_count: int = 0):
    # exact median (the reference uses a t-digest sketch; exact is a strict
    # refinement and fits in one XLA sort)
    return _median(ctx, a, skip_nulls, min_count)


@register("count_distinct", "aggregate")
def _count_distinct(ctx, a, mode: str = "only_valid"):
    live = a.valid_mask(ctx.row_mask())
    # sentinel that sorts AFTER all live values (min-reduction identity)
    big = jnp.asarray(_minmax_identity(a.values.dtype, True),
                      a.values.dtype)
    v = jnp.where(live, a.values, big)
    sv = jnp.sort(v)
    n_live = jnp.sum(live, dtype=jnp.int64)
    # distinct among live values: boundaries in the sorted prefix
    idx = jnp.arange(sv.shape[0], dtype=jnp.int64)
    is_new = jnp.where(idx == 0, True, sv != jnp.roll(sv, 1))
    distinct = jnp.sum(jnp.logical_and(is_new, idx < n_live),
                      dtype=jnp.int64)
    if mode == "only_valid":
        out = distinct
    elif mode == "only_null":
        has_null = _has_null(ctx, a)
        out = has_null.astype(jnp.int64)
    else:  # all
        has_null = _has_null(ctx, a)
        out = distinct + has_null.astype(jnp.int64)
    return AggResult(out, jnp.asarray(True), T.int64())
