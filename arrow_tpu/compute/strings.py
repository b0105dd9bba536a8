"""String kernels.

Reference analogues: compute/kernels/scalar_string_ascii.cc,
scalar_string_utf8.cc. TPU design: device strings are dictionary codes, so
every string transform runs ONCE per distinct value on the host at trace
time (the dictionary is tiny relative to the column), and the device work
is a single gather through the codes — asymptotically cheaper than the
reference's per-row byte loops whenever values repeat.

str->str functions produce a new dictionary with unchanged codes;
str->scalar functions become a lookup-table gather.
"""

from __future__ import annotations

import re
from typing import Callable, List, Optional

import jax.numpy as jnp
import numpy as np

from .. import types as T
from ..array.array import array as make_array
from ..device.column import DeviceColumn
from .registry import ArrowInvalid, ArrowNotImplementedError, register


def _require_string(name, col):
    if not isinstance(col, DeviceColumn) or col.dictionary is None:
        raise ArrowNotImplementedError(
            f"{name}: requires a string column")


def _dict_values(col) -> List[str]:
    return col.dictionary.to_pylist()


def _map_to_new_dictionary(col: DeviceColumn, vals: List[str],
                           type=None) -> DeviceColumn:
    """Attach a transformed dictionary, canonicalizing duplicate values.

    String transforms are many-to-one (slice, casefold, trim, replace):
    two distinct input values can map to the same output. Downstream
    group-by / join / sort / unique key on dictionary CODES, which is
    only value-correct when each value owns exactly one slot — so dedupe
    the values and remap the codes (one small-table gather)."""
    first = {}
    for v in vals:
        if v not in first:
            first[v] = len(first)
    if len(first) < len(vals):
        uniq = list(first)
        remap = np.array([first[v] for v in vals], dtype=np.int32)
        codes = jnp.asarray(remap)[col.values.astype(jnp.int64)]
        new_dict = make_array(uniq, type or col.dictionary.type)
        return DeviceColumn(codes, col.validity, col.type, new_dict)
    new_dict = make_array(vals, type or col.dictionary.type)
    return DeviceColumn(col.values, col.validity, col.type, new_dict)


def _map_to_lookup(col: DeviceColumn, table: np.ndarray,
                   out_type) -> DeviceColumn:
    dev_table = jnp.asarray(table)
    out = dev_table[col.values.astype(jnp.int64)]
    return DeviceColumn(out, col.validity, out_type)


def _pool_lookup(name: str, col: DeviceColumn, out_type, host_table,
                 pattern: str = "",
                 ignore_case: bool = False) -> DeviceColumn:
    """Device byte-pool tier for string predicates (device_strings.py):
    when the dictionary is large, compute the per-distinct table as 2-D
    byte ops over the cached device byte pool instead of host Python
    calls; `host_table` is the lazy host fallback (a thunk returning
    the numpy table)."""
    from .device_strings import pool_predicate
    table = pool_predicate(name, col, pattern, ignore_case)
    if table is not None:
        out = table[col.values.astype(jnp.int64)]
        return DeviceColumn(out, col.validity, out_type)
    return _map_to_lookup(col, host_table(), out_type)


def _try_pool_transform(col: DeviceColumn, kernel: str,
                        options=None) -> Optional[DeviceColumn]:
    """Device byte-pool str->str tier (device_strings.pool_transform):
    for large ASCII dictionaries the transform is a jitted 2-D byte op
    over the pool instead of O(distinct) host python calls. Returns
    None when ineligible (small/non-ASCII dictionary, exotic options).

    EAGER ONLY: the transform ends with a device->host pull that
    rebuilds (and dedupes) the host dictionary, which cannot run under
    a trace — it is wired in through Function.pre (registry.py), so the
    eager pyarrow-style compute API gets the device tier while fused
    plan programs keep the per-distinct host tier."""
    from .device_strings import pool_transform
    res = pool_transform(kernel, col, options)
    if res is None:
        return None
    new_dict, remap = res
    if remap is not None:
        codes = jnp.asarray(remap)[col.values.astype(jnp.int64)]
    else:
        codes = col.values
    return DeviceColumn(codes, col.validity, col.type, new_dict)


def _set_transform_pre(name: str, kernel: str, opt_fn=None):
    """Attach the eager device-tier pre-hook for a str->str kernel.
    opt_fn maps the call's options dict to pool_transform options, or
    returns None to decline (unsupported option combination)."""
    from .registry import get_function

    def pre(cols, scalars, options):
        col = cols[0] if cols else None
        if not isinstance(col, DeviceColumn) or col.dictionary is None:
            return None
        opts = opt_fn(options) if opt_fn else (
            {} if not options else None)
        if opts is None:
            return None
        return _try_pool_transform(col, kernel, opts)

    get_function(name).pre = pre


def _str_to_str(name: str, fn: Callable[[str], str], doc: str = "",
                device_kernel: Optional[str] = None):
    @register(name, "elementwise", doc)
    def _impl(ctx, col, **options):
        _require_string(name, col)
        vals = [fn(v if v is not None else "", **options) if True else v
                for v in _dict_values(col)]
        return _map_to_new_dictionary(col, vals)
    if device_kernel is not None:
        _set_transform_pre(name, device_kernel)
    return _impl


def _str_to_str_opt(name: str, fn: Callable, doc: str = ""):
    """Like _str_to_str but fn receives options explicitly."""
    @register(name, "elementwise", doc)
    def _impl(ctx, col, **options):
        _require_string(name, col)
        vals = [fn(v if v is not None else "", options)
                for v in _dict_values(col)]
        return _map_to_new_dictionary(col, vals)
    return _impl


def _str_to_bool(name: str, fn: Callable[[str], bool], doc: str = ""):
    @register(name, "elementwise", doc)
    def _impl(ctx, col, **options):
        _require_string(name, col)

        def host():
            return np.array(
                [bool(fn(v if v is not None else "", **options))
                 for v in _dict_values(col)], dtype=np.bool_)
        if name == "string_is_ascii" and not options:
            return _pool_lookup(name, col, T.bool_(), host)
        return _map_to_lookup(col, host(), T.bool_())
    return _impl


def _str_to_int(name: str, fn: Callable[[str], int], out_type=None,
                doc: str = ""):
    @register(name, "elementwise", doc)
    def _impl(ctx, col, **options):
        _require_string(name, col)
        t = out_type if out_type else T.int64()

        def host():
            return np.array([fn(v if v is not None else "", **options)
                             for v in _dict_values(col)], dtype=np.int64)
        if name in ("utf8_length", "binary_length") and not options:
            return _pool_lookup(name, col, t, host)
        return _map_to_lookup(col, host(), t)
    return _impl


# --- case conversion -------------------------------------------------------
_str_to_str("utf8_upper", str.upper, device_kernel="upper")
_str_to_str("utf8_lower", str.lower, device_kernel="lower")
_str_to_str("utf8_swapcase", str.swapcase, device_kernel="swapcase")
_str_to_str("utf8_capitalize", str.capitalize,
            device_kernel="capitalize")
_str_to_str("utf8_title", str.title, device_kernel="title")
_str_to_str("ascii_upper", str.upper, device_kernel="upper")
_str_to_str("ascii_lower", str.lower, device_kernel="lower")
_str_to_str("ascii_swapcase", str.swapcase, device_kernel="swapcase")
_str_to_str("ascii_capitalize", str.capitalize,
            device_kernel="capitalize")
_str_to_str("ascii_title", str.title, device_kernel="title")
_str_to_str("utf8_reverse", lambda s: s[::-1], device_kernel="reverse")
_str_to_str("ascii_reverse", lambda s: s[::-1],
            device_kernel="reverse")

# --- predicates ------------------------------------------------------------
_str_to_bool("utf8_is_alnum", str.isalnum)
_str_to_bool("utf8_is_alpha", str.isalpha)
_str_to_bool("utf8_is_decimal", str.isdecimal)
_str_to_bool("utf8_is_digit", str.isdigit)
_str_to_bool("utf8_is_numeric", str.isnumeric)
_str_to_bool("utf8_is_lower", str.islower)
_str_to_bool("utf8_is_upper", str.isupper)
_str_to_bool("utf8_is_space", str.isspace)
_str_to_bool("utf8_is_title", str.istitle)
_str_to_bool("utf8_is_printable", str.isprintable)
_str_to_bool("ascii_is_alnum", lambda s: s.isascii() and s.isalnum())
_str_to_bool("ascii_is_alpha", lambda s: s.isascii() and s.isalpha())
_str_to_bool("ascii_is_decimal", lambda s: s.isascii() and s.isdecimal())
_str_to_bool("ascii_is_lower", lambda s: s.isascii() and s.islower())
_str_to_bool("ascii_is_upper", lambda s: s.isascii() and s.isupper())
_str_to_bool("ascii_is_space", lambda s: s.isascii() and s.isspace())
_str_to_bool("string_is_ascii", str.isascii)

# --- length ----------------------------------------------------------------
_str_to_int("utf8_length", len, T.int32())
_str_to_int("binary_length", lambda s: len(s.encode()
                                           if isinstance(s, str) else s),
            T.int32())


# --- trim / pad ------------------------------------------------------------

def _trim_impl(name: str, kernel: str, method: str, ws: bool):
    @register(name, "elementwise")
    def _impl(ctx, col, characters: str = ""):
        _require_string(name, col)
        arg = () if ws else (characters,)
        return _map_to_new_dictionary(
            col, [getattr(v, method)(*arg) if v else v
                  for v in _dict_values(col)])
    if ws:
        _set_transform_pre(name, kernel,
                           lambda o: {"whitespace": True} if not o
                           else None)
    else:
        _set_transform_pre(
            name, kernel,
            lambda o: {"characters": o.get("characters", "")})
    return _impl


_trim_impl("utf8_trim_whitespace", "trim", "strip", ws=True)
_trim_impl("utf8_ltrim_whitespace", "ltrim", "lstrip", ws=True)
_trim_impl("utf8_rtrim_whitespace", "rtrim", "rstrip", ws=True)
_trim_impl("utf8_trim", "trim", "strip", ws=False)
_trim_impl("utf8_ltrim", "ltrim", "lstrip", ws=False)
_trim_impl("utf8_rtrim", "rtrim", "rstrip", ws=False)


def _pad_opts(o):
    return {"width": o.get("width", 0), "padding": o.get("padding", " ")}


for _name, _mname, _kern in [("utf8_lpad", "rjust", "lpad"),
                             ("utf8_rpad", "ljust", "rpad"),
                             ("ascii_lpad", "rjust", "lpad"),
                             ("ascii_rpad", "ljust", "rpad")]:
    def _mk(mname):
        def fn(ctx, col, width: int = 0, padding: str = " ",
               lean_left_on_odd_padding: bool = True):
            _require_string("pad", col)
            return _map_to_new_dictionary(
                col, [getattr(v, mname)(width, padding) if v is not None
                      else v for v in _dict_values(col)])
        return fn
    register(_name, "elementwise")(_mk(_mname))
    _set_transform_pre(_name, _kern, _pad_opts)


@register("utf8_center", "elementwise")
def _center(ctx, col, width: int = 0, padding: str = " ",
            lean_left_on_odd_padding: bool = True):
    _require_string("utf8_center", col)
    return _map_to_new_dictionary(
        col, [v.center(width, padding) if v is not None else v
              for v in _dict_values(col)])


_set_transform_pre("utf8_center", "center", _pad_opts)


# --- slice / repeat --------------------------------------------------------

@register("utf8_slice_codeunits", "elementwise")
def _slice(ctx, col, start: int = 0, stop: Optional[int] = None,
           step: int = 1):
    _require_string("utf8_slice_codeunits", col)
    return _map_to_new_dictionary(
        col, [v[start:stop:step] if v is not None else v
              for v in _dict_values(col)])


_set_transform_pre("utf8_slice_codeunits", "slice",
                   lambda o: {"start": o.get("start", 0),
                              "stop": o.get("stop"),
                              "step": o.get("step", 1)})


@register("binary_repeat", "elementwise")
def _repeat(ctx, col, num_repeats: int = 1):
    _require_string("binary_repeat", col)
    return _map_to_new_dictionary(
        col, [v * num_repeats if v is not None else v
              for v in _dict_values(col)])


@register("binary_reverse", "elementwise")
def _brev(ctx, col):
    _require_string("binary_reverse", col)
    return _map_to_new_dictionary(col, [v[::-1] if v is not None else v
                                        for v in _dict_values(col)])


# --- match / find ----------------------------------------------------------

def _maybe_ci(pattern, ignore_case):
    return re.compile(re.escape(pattern),
                      re.IGNORECASE if ignore_case else 0)


@register("match_substring", "elementwise")
def _match_substring(ctx, col, pattern: str = "",
                     ignore_case: bool = False):
    _require_string("match_substring", col)

    def host():
        rx = _maybe_ci(pattern, ignore_case)
        return np.array([bool(rx.search(v)) if v is not None else False
                         for v in _dict_values(col)], dtype=np.bool_)
    return _pool_lookup("match_substring", col, T.bool_(), host,
                        pattern, ignore_case)


@register("match_substring_regex", "elementwise")
def _match_substring_regex(ctx, col, pattern: str = "",
                           ignore_case: bool = False):
    _require_string("match_substring_regex", col)
    rx = re.compile(pattern, re.IGNORECASE if ignore_case else 0)
    table = np.array([bool(rx.search(v)) if v is not None else False
                      for v in _dict_values(col)], dtype=np.bool_)
    return _map_to_lookup(col, table, T.bool_())


@register("starts_with", "elementwise")
def _starts_with(ctx, col, pattern: str = "", ignore_case: bool = False):
    _require_string("starts_with", col)

    def host():
        p = pattern.lower() if ignore_case else pattern
        return np.array(
            [(v.lower() if ignore_case else v).startswith(p)
             if v is not None else False for v in _dict_values(col)],
            dtype=np.bool_)
    return _pool_lookup("starts_with", col, T.bool_(), host,
                        pattern, ignore_case)


@register("ends_with", "elementwise")
def _ends_with(ctx, col, pattern: str = "", ignore_case: bool = False):
    _require_string("ends_with", col)

    def host():
        p = pattern.lower() if ignore_case else pattern
        return np.array(
            [(v.lower() if ignore_case else v).endswith(p)
             if v is not None else False for v in _dict_values(col)],
            dtype=np.bool_)
    return _pool_lookup("ends_with", col, T.bool_(), host,
                        pattern, ignore_case)


def _like_to_regex(pattern: str) -> str:
    out = []
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\" and i + 1 < len(pattern):
            out.append(re.escape(pattern[i + 1]))
            i += 2
            continue
        if c == "%":
            out.append(".*")
        elif c == "_":
            out.append(".")
        else:
            out.append(re.escape(c))
        i += 1
    return "^" + "".join(out) + "$"


@register("match_like", "elementwise")
def _match_like(ctx, col, pattern: str = "", ignore_case: bool = False):
    """SQL LIKE (reference: scalar_string_ascii.cc MatchLike).

    Wildcard-free bodies with % only at the ends decompose onto the
    device byte-pool predicates (the reference makes the same
    plain-substring reduction before reaching for RE2)."""
    _require_string("match_like", col)
    body = pattern.strip("%")
    simple = ("_" not in body and "%" not in body and "\\" not in body
              and len(pattern) - len(body) ==
              pattern.startswith("%") + pattern.endswith("%"))
    if simple:
        lead, trail = pattern.startswith("%"), pattern.endswith("%")
        sub = ("match_substring" if lead and trail else
               "ends_with" if lead else
               "starts_with" if trail else "equal_string")

        def host():
            rx = re.compile(_like_to_regex(pattern),
                            re.IGNORECASE if ignore_case else 0)
            return np.array([bool(rx.match(v)) if v is not None
                             else False for v in _dict_values(col)],
                            dtype=np.bool_)
        return _pool_lookup(sub, col, T.bool_(), host, body,
                            ignore_case)
    rx = re.compile(_like_to_regex(pattern),
                    re.IGNORECASE if ignore_case else 0)
    table = np.array([bool(rx.match(v)) if v is not None else False
                      for v in _dict_values(col)], dtype=np.bool_)
    return _map_to_lookup(col, table, T.bool_())


@register("count_substring", "elementwise")
def _count_substring(ctx, col, pattern: str = "",
                     ignore_case: bool = False):
    _require_string("count_substring", col)

    def host():
        return np.array(
            [(v.lower() if ignore_case else v).count(
                pattern.lower() if ignore_case else pattern)
             if v is not None else 0 for v in _dict_values(col)],
            dtype=np.int64)
    return _pool_lookup("count_substring", col, T.int32(), host,
                        pattern, ignore_case)


@register("find_substring", "elementwise")
def _find_substring(ctx, col, pattern: str = "",
                    ignore_case: bool = False):
    _require_string("find_substring", col)

    def host():
        return np.array(
            [(v.lower() if ignore_case else v).find(
                pattern.lower() if ignore_case else pattern)
             if v is not None else -1 for v in _dict_values(col)],
            dtype=np.int64)
    return _pool_lookup("find_substring", col, T.int32(), host,
                        pattern, ignore_case)


# --- replace ---------------------------------------------------------------

@register("replace_substring", "elementwise")
def _replace_substring(ctx, col, pattern: str = "",
                       replacement: str = "",
                       max_replacements: Optional[int] = None):
    _require_string("replace_substring", col)
    n = -1 if max_replacements is None else max_replacements
    return _map_to_new_dictionary(
        col, [v.replace(pattern, replacement, n) if v is not None else v
              for v in _dict_values(col)])


@register("replace_substring_regex", "elementwise")
def _replace_substring_regex(ctx, col, pattern: str = "",
                             replacement: str = "",
                             max_replacements: Optional[int] = None):
    _require_string("replace_substring_regex", col)
    rx = re.compile(pattern)
    n = 0 if max_replacements is None else max_replacements
    return _map_to_new_dictionary(
        col, [rx.sub(replacement, v, count=n) if v is not None else v
              for v in _dict_values(col)])


# --- concatenation ---------------------------------------------------------

@register("binary_join_element_wise", "elementwise")
def _join_elementwise(ctx, *cols, null_handling: str = "emit_null"):
    """Concatenate string columns row-wise. Builds the product dictionary of
    the inputs' code pairs — practical when inputs are low-cardinality."""
    scols = [c for c in cols if isinstance(c, DeviceColumn)]
    for c in scols:
        _require_string("binary_join_element_wise", c)
    if len(scols) < 2:
        raise ArrowInvalid("need at least 2 columns + separator")
    sep_col = scols[-1]
    parts = scols[:-1]
    # combined code = mixed radix over the parts' dictionaries
    sizes = [len(_dict_values(c)) for c in parts] + \
        [len(_dict_values(sep_col))]
    total = 1
    for s in sizes:
        total *= s
    if total > 1 << 20:
        raise ArrowNotImplementedError(
            "binary_join_element_wise dictionary product too large")
    combined = jnp.zeros(parts[0].capacity, jnp.int64)
    for c, s in zip(parts + [sep_col], sizes):
        combined = combined * s + c.values.astype(jnp.int64)
    import itertools
    vals = []
    dicts = [_dict_values(c) for c in parts] + [_dict_values(sep_col)]
    for combo in itertools.product(*dicts):
        *ps, sep = combo
        vals.append((sep or "").join(p or "" for p in ps))
    validity = None
    for c in scols:
        if c.validity is not None:
            validity = c.validity if validity is None else \
                jnp.logical_and(validity, c.validity)
    new_dict = make_array(vals, T.string())
    return DeviceColumn(combined.astype(jnp.int32), validity,
                        parts[0].type, new_dict)
