"""Implicit-cast dispatch (reference: DispatchBest,
compute/function.cc:298, and the common-type resolution used by it).

The reference resolves a concrete kernel by inserting implicit casts
(common numeric type, common temporal unit, dictionary decay, string
width widening). Here numeric promotion is delegated to XLA's dtype
lattice (which matches Arrow's for the supported combinations), and
this module supplies the parts XLA cannot see:

- temporal arguments with different units/ids -> common timestamp /
  duration / time type (finest unit), cast before upload;
- python string/bytes/datetime scalars against columns -> broadcast
  to a constant column so the device kernel sees uniform operands;
- numeric-valued dictionary columns mixed with plain columns ->
  decoded (dictionary decay, scalar_cast_dictionary.cc analogue);
- two or more dictionary-coded device columns (all strings/binary are
  dictionary-coded on device) -> re-encoded against their SORTED union
  dictionary, so code order == value order and every comparison
  (equal/less/min_element_wise/...) is correct on codes. The reference
  precedent is hash_join_dict.cc's unification; sorting additionally
  makes ordinal comparisons valid, which Arrow gets by comparing the
  decoded values instead.
"""

from __future__ import annotations

import datetime as _dt
from typing import List, Sequence

import numpy as np

from ..array.array import Array, array as make_array
from ..table import ChunkedArray
from ..types import DataType, TypeId
from .. import types as T

_TS_IDS = (TypeId.TIMESTAMP, TypeId.DATE32, TypeId.DATE64)
_UNIT_RANK = {"s": 0, "ms": 1, "us": 2, "ns": 3}
_STRING_KIND = (TypeId.STRING, TypeId.LARGE_STRING, TypeId.STRING_VIEW)
_BINARY_KIND = (TypeId.BINARY, TypeId.LARGE_BINARY, TypeId.BINARY_VIEW)


def _is_temporal_mixable(t: DataType) -> bool:
    return t.id in _TS_IDS


def _common_timestamp(types: Sequence[DataType]) -> DataType:
    unit = "s"
    tz = None
    any_ts = False
    for t in types:
        if t.id == TypeId.TIMESTAMP:
            any_ts = True
            if _UNIT_RANK[t.unit] > _UNIT_RANK[unit]:
                unit = t.unit
            tz = tz or t.tz
        elif t.id == TypeId.DATE64:
            if _UNIT_RANK["ms"] > _UNIT_RANK[unit]:
                unit = "ms"
    if not any_ts and all(t.id == TypeId.DATE32 for t in types):
        return T.date32()
    return T.timestamp(unit, tz)


def unify_inputs(name: str, args: Sequence, options) -> List:
    """Array-level implicit casts, applied before device upload."""
    out = list(args)
    arr_idx = [i for i, a in enumerate(out)
               if isinstance(a, (Array, ChunkedArray))]
    if not arr_idx:
        return out
    for i in arr_idx:
        if isinstance(out[i], ChunkedArray):
            out[i] = out[i].combine()
    types = [out[i].type for i in arr_idx]
    n = len(out[arr_idx[0]])

    # dictionary decay for numeric/temporal-valued dictionaries when the
    # kernel will mix them with plain columns or scalars
    for i in arr_idx:
        t = out[i].type
        if t.id == TypeId.DICTIONARY and t.value_type.id not in \
                _STRING_KIND + _BINARY_KIND:
            out[i] = out[i].cast(t.value_type)
    types = [out[i].type for i in arr_idx]

    # temporal unit unification
    temporal = [t for t in types if _is_temporal_mixable(t)]
    if len({(t.id, getattr(t, "unit", None), getattr(t, "tz", None))
            for t in temporal}) > 1:
        target = _common_timestamp(temporal)
        for i in arr_idx:
            if _is_temporal_mixable(out[i].type) and out[i].type != target:
                out[i] = out[i].cast(target)
    durations = [t for t in types if t.id == TypeId.DURATION]
    if len({t.unit for t in durations}) > 1:
        unit = max((t.unit for t in durations), key=_UNIT_RANK.get)
        for i in arr_idx:
            if out[i].type.id == TypeId.DURATION and \
                    out[i].type.unit != unit:
                out[i] = out[i].cast(T.duration(unit))

    # broadcast python str/bytes/datetime/Decimal scalars to constant
    # columns so the device kernel sees uniform dictionary-coded operands
    import decimal as _decimal
    str_kind_present = any(
        t.id in _STRING_KIND + _BINARY_KIND or
        (t.id == TypeId.DICTIONARY and
         t.value_type.id in _STRING_KIND + _BINARY_KIND)
        for t in (out[i].type for i in arr_idx))
    fsb_types = [out[i].type for i in arr_idx
                 if out[i].type.id == TypeId.FIXED_SIZE_BINARY]
    dec_types = [out[i].type for i in arr_idx
                 if out[i].type.id in (TypeId.DECIMAL128, TypeId.DECIMAL256,
                                       TypeId.DECIMAL32, TypeId.DECIMAL64)]
    for i, a in enumerate(out):
        if i in arr_idx:
            continue
        if isinstance(a, str) and str_kind_present:
            out[i] = make_array([a] * n, T.string())
        elif isinstance(a, bytes) and str_kind_present:
            out[i] = make_array([a] * n, T.binary())
        elif isinstance(a, bytes) and fsb_types:
            out[i] = make_array([a] * n, T.fixed_size_binary(len(a)))
        elif isinstance(a, _decimal.Decimal) and dec_types:
            t0 = dec_types[0]
            exp = -a.as_tuple().exponent
            if t0.precision <= 18:
                # plain-int64 device path: the literal must be exactly
                # representable at the column's scale or unscaled-value
                # comparisons would be wrong
                if exp > t0.scale:
                    from .registry import ArrowInvalid
                    raise ArrowInvalid(
                        f"decimal literal {a} has more fractional digits "
                        f"than {t0!r}; rescale the literal or cast")
                out[i] = make_array([a] * n, t0)
            else:
                # dictionary-coded path: codes unify by python Decimal
                # value, so the literal keeps its own exact scale
                scale = max(exp, 0)
                digits = len(a.as_tuple().digits)
                prec = max(t0.precision, digits, 19)
                mk = T.decimal256 if (t0.id == TypeId.DECIMAL256
                                      or prec > 38) else T.decimal128
                out[i] = make_array([a] * n, mk(min(prec, 76), scale))
        elif isinstance(a, (_dt.datetime, _dt.date)):
            temporal_types = [out[j].type for j in arr_idx
                              if _is_temporal_mixable(out[j].type)]
            if temporal_types:
                out[i] = make_array([a] * n, temporal_types[0])
    return out


def unify_device_dicts(prepared: List) -> List:
    """Re-encode >=2 dictionary-coded device columns against their
    sorted union dictionary (codes become order-preserving ranks)."""
    from ..device.column import DeviceColumn
    import jax.numpy as jnp

    dict_pos = [i for i, p in enumerate(prepared)
                if isinstance(p, DeviceColumn) and p.dictionary is not None]
    if len(dict_pos) < 2:
        return prepared
    dicts = [prepared[i].dictionary for i in dict_pos]
    first = dicts[0]
    if all(d is first for d in dicts[1:]):
        return prepared  # already shared
    union = sorted({v for d in dicts for v in d.to_pylist()
                    if v is not None})
    rank = {v: r for r, v in enumerate(union)}
    union_type = first.type
    if union_type.id in (TypeId.DECIMAL128, TypeId.DECIMAL256,
                         TypeId.DECIMAL32, TypeId.DECIMAL64):
        # dictionaries may mix scales (e.g. a literal broadcast at its own
        # exact scale); the union must hold every value exactly
        scale = max(getattr(d.type, "scale", 0) for d in dicts)
        mk = T.decimal256 if union_type.id == TypeId.DECIMAL256 \
            else T.decimal128
        union_type = mk(76 if union_type.id == TypeId.DECIMAL256 else 38,
                        scale)
    union_arr = make_array(union, union_type)
    out = list(prepared)
    for i in dict_pos:
        col = prepared[i]
        vals = col.dictionary.to_pylist()
        mapping = np.asarray([rank.get(v, 0) for v in vals], np.int32)
        codes = jnp.asarray(mapping)[col.values.astype(jnp.int32)]
        out[i] = DeviceColumn(codes, col.validity, col.type, union_arr)
    return out
