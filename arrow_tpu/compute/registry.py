"""Compute function model + registry.

Reference analogues: compute/registry.h:46 (FunctionRegistry),
compute/function.h (Function kinds), compute/exec.cc:1362 (CallFunction).

TPU-native redesign: a kernel is a Python callable over DeviceColumns that
traces to XLA. There is no per-span chunking executor — XLA fuses whole
columns — and no preallocation policy: functional arrays replace both.
Host Arrays passed to ``call_function`` are transparently uploaded, run
through a cached jitted wrapper, and downloaded.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..array.array import Array
from ..table import ChunkedArray
from ..types import DataType


class ArrowInvalid(ValueError):
    pass


class ArrowNotImplementedError(NotImplementedError):
    pass


class Scalar:
    """A typed single value (reference: scalar.h:54). ``value`` is a python
    value or None (null)."""

    __slots__ = ("value", "type")

    def __init__(self, value, type: DataType):
        self.value = value
        self.type = type

    @property
    def is_valid(self) -> bool:
        return self.value is not None

    def as_py(self):
        return self.value

    def __repr__(self):
        return f"Scalar({self.value!r}, {self.type!r})"

    def __eq__(self, other):
        if isinstance(other, Scalar):
            return self.value == other.value and self.type == other.type
        return self.value == other


class ExecContext:
    """Per-call execution state handed to kernels."""

    __slots__ = ("capacity", "row_count", "row_mask_")

    def __init__(self, capacity: int, row_count):
        self.capacity = capacity
        self.row_count = row_count
        self.row_mask_ = None

    def row_mask(self):
        if self.row_mask_ is None:
            self.row_mask_ = (jnp.arange(self.capacity, dtype=jnp.int32)
                              < self.row_count)
        return self.row_mask_


class Function:
    """kind: 'elementwise' (N rows -> N rows), 'aggregate'
    (N rows -> scalar(s)), 'vector' (N rows -> M rows or indices).
    ctx_arg: which array argument defines the execution context
    (capacity/row count) — e.g. take() keys off its indices argument."""

    __slots__ = ("name", "kind", "impl", "doc", "ctx_arg", "pre")

    def __init__(self, name: str, kind: str, impl: Callable, doc: str = "",
                 ctx_arg: int = 0):
        self.name = name
        self.kind = kind
        self.impl = impl
        self.doc = doc
        self.ctx_arg = ctx_arg
        # optional EAGER pre-hook: pre(cols, scalars, options) ->
        # Optional[result], called by call_function OUTSIDE the jitted
        # runner with concrete DeviceColumns. Used by kernels whose fast
        # tier needs eager device execution + a host readback (device
        # string transforms rebuild the host dictionary from a device
        # byte pool — impossible inside a trace). Returning None falls
        # through to the normal jitted impl.
        self.pre = None


_REGISTRY: Dict[str, Function] = {}


def register(name: str, kind: str, doc: str = "", ctx_arg: int = 0):
    def deco(fn):
        _REGISTRY[name] = Function(name, kind, fn, doc, ctx_arg)
        return fn
    return deco


def register_alias(alias: str, name: str):
    _REGISTRY[alias] = _REGISTRY[name]


def register_host(name: str, doc: str = ""):
    """Host-tier kernel: runs on host Arrays directly (variable-length
    outputs, text formatting — memory-bound CPU work in the reference
    too)."""
    def deco(fn):
        _REGISTRY[name] = Function(name, "host", fn, doc)
        return fn
    return deco


def get_function(name: str) -> Function:
    f = _REGISTRY.get(name)
    if f is None:
        raise KeyError(f"no compute function registered named {name!r}")
    return f


def list_functions() -> List[str]:
    return sorted(_REGISTRY)


def function_registry() -> Dict[str, Function]:
    return _REGISTRY


# --- host-facing execution -------------------------------------------------

def _cast_to_string_host(args, options):
    """Value -> string casts format on the host (variable-length output;
    reference: scalar_cast_string.cc numeric/temporal formatters). Returns
    None when this isn't a to-string cast of a host Array."""
    from ..types import TypeId
    t = (options or {}).get("to_type") or (options or {}).get("target_type")
    if t is None or t.id not in (TypeId.STRING, TypeId.LARGE_STRING):
        return None
    a = args[0]
    if isinstance(a, ChunkedArray):
        a = a.combine()
    if not isinstance(a, Array):
        return None
    sid = a.type.id
    if sid in (TypeId.STRING, TypeId.LARGE_STRING):
        return a if a.type.id == t.id else _remake_string(a, t)
    import numpy as np
    from ..array.array import array as make_array

    def fmt(v):
        if v is None:
            return None
        if isinstance(v, bool) or sid == TypeId.BOOL:
            return "true" if v else "false"
        if isinstance(v, float):
            return np.format_float_positional(v, trim="-")
        if hasattr(v, "isoformat"):
            if not hasattr(v, "hour"):
                return v.isoformat()
            s = v.strftime("%Y-%m-%d %H:%M:%S")
            unit = getattr(a.type, "unit", "s")
            digits = {"s": 0, "ms": 3, "us": 6, "ns": 9}.get(unit, 0)
            if digits:
                s += f".{v.microsecond:06d}"[:1 + digits].ljust(
                    digits + 1, "0")
            return s
        return str(v)

    return make_array([fmt(v) for v in a.to_pylist()], t)


def _remake_string(a, t):
    from ..array.array import array as make_array
    return make_array(a.to_pylist(), t)

def _options_key(options: Optional[dict]) -> tuple:
    if not options:
        return ()
    def freeze(v):
        # tagged so _thaw is unambiguous (a plain tuple of (str, x) pairs
        # is NOT necessarily a dict: e.g. sort_keys=[("col","ascending")])
        if isinstance(v, dict):
            return ("__d__", tuple(sorted((k, freeze(x))
                                          for k, x in v.items())))
        if isinstance(v, (list, tuple)):
            return ("__s__", tuple(freeze(x) for x in v))
        return v
    return tuple(sorted((k, freeze(v)) for k, v in options.items()))


@functools.lru_cache(maxsize=None)
def _jitted(name: str, okey: tuple, sig: tuple):
    fn = get_function(name)
    options = dict((k, _thaw(v)) for k, v in okey)

    def run(cols, row_count, scalars):
        ctx_col = min(fn.ctx_arg, len(cols) - 1)
        ctx = ExecContext(cols[ctx_col].capacity if cols else 0, row_count)
        args: list = []
        ci = si = 0
        for kind in sig:
            if kind == "c":
                args.append(cols[ci]); ci += 1
            else:
                args.append(scalars[si]); si += 1
        return fn.impl(ctx, *args, **options)

    return jax.jit(run)


def _thaw(v):
    if isinstance(v, tuple) and len(v) == 2 and v[0] == "__d__":
        return {k: _thaw(x) for k, x in v[1]}
    if isinstance(v, tuple) and len(v) == 2 and v[0] == "__s__":
        return tuple(_thaw(x) for x in v[1])
    return v


def call_function(name: str, args: Sequence, options=None,
                  memory_pool=None):
    """pyarrow.compute-style entry point: accepts Arrays / ChunkedArrays /
    python scalars, runs the device kernel, returns Array or Scalar.
    `options` may be a dict or a FunctionOptions instance."""
    from ..device.column import (DeviceColumn, download_column, round_up,
                                 upload_column)
    from .options import FunctionOptions

    if isinstance(options, FunctionOptions):
        options = options.to_kwargs()
    if options:
        # Array-valued options (is_in/index_in value_set à la pyarrow)
        # become plain lists: hashable for the jit cache key, and the
        # kernels' list paths already handle them
        options = {k: (v.combine().to_pylist()
                       if isinstance(v, ChunkedArray)
                       else v.to_pylist() if isinstance(v, Array)
                       else v)
                   for k, v in options.items()}
    # Positional DataType / FunctionOptions arguments route to options
    # and never into the jitted kernel (a DataType fed to jit as an
    # operand crashes tracing). pyarrow's wrappers do the same mapping
    # (python/pyarrow/compute.py:298): pc.cast(arr, pa.string()) and
    # pc.cast(arr, "string") are its most common cast forms.
    from ..types import DataType
    norm_args: List = []
    for a in args:
        if isinstance(a, FunctionOptions):
            options = {**(options or {}), **a.to_kwargs()}
            continue
        norm_args.append(a)
    args = norm_args
    if name == "cast" and len(args) >= 2 and \
            isinstance(args[1], (DataType, str)):
        t = args[1]
        if isinstance(t, str):  # alias, e.g. "string" / "float64"
            from ..api import type_for_alias
            t = type_for_alias(t)
        options = dict(options or {})
        options.setdefault("to_type", t)
        args = list(args[:1]) + list(args[2:])
    else:
        for a in args:
            if isinstance(a, DataType):
                raise ArrowInvalid(
                    f"{name}: pass DataType arguments via options, "
                    "not positionally")
    fn = get_function(name)
    from .decimal_host import maybe_wide_decimal_call
    hit = maybe_wide_decimal_call(name, args, options)
    if hit is not None:
        return hit
    if name == "cast":
        from .cast_host import try_cast_host
        hit = try_cast_host(args, options)
        if hit is not None:
            return hit
        hit = _cast_to_string_host(args, options)
        if hit is not None:
            return hit
    if fn.kind == "host":
        host_args = [a.combine() if isinstance(a, ChunkedArray) else a
                     for a in args]
        return fn.impl(*host_args, **(options or {}))
    if fn.kind == "elementwise" and name != "cast":
        from .dispatch import unify_inputs
        args = unify_inputs(name, args, options)
    arrays: List[Tuple[int, Array]] = []
    prepared: List = []
    for i, a in enumerate(args):
        if isinstance(a, ChunkedArray):
            a = a.combine()
        if isinstance(a, Array):
            arrays.append((i, a))
            prepared.append(a)
        elif isinstance(a, DeviceColumn):
            prepared.append(a)
        elif isinstance(a, Scalar):
            prepared.append(a.value)
        else:
            prepared.append(a)

    if arrays:
        if fn.kind == "elementwise":
            n = len(arrays[0][1])
            for _, a in arrays[1:]:
                if len(a) != n:
                    raise ArrowInvalid(
                        "array arguments must have equal length")
            cap = round_up(n)
            for i, a in arrays:
                prepared[i] = upload_column(a, cap)
        else:
            # vector/aggregate: each arg keeps its own capacity; the
            # context row count comes from fn.ctx_arg
            ctx_pos = min(fn.ctx_arg, len(arrays) - 1)
            n = len(arrays[ctx_pos][1])
            for i, a in arrays:
                prepared[i] = upload_column(a, round_up(len(a)))
    else:
        n = None

    if fn.kind == "elementwise" and name != "cast":
        from .dispatch import unify_device_dicts
        prepared = unify_device_dicts(prepared)
    cols = [p for p in prepared if isinstance(p, DeviceColumn)]
    scalars = [p for p in prepared
               if not isinstance(p, DeviceColumn)]
    sig = tuple("c" if isinstance(p, DeviceColumn) else "s"
                for p in prepared)
    if not cols:
        raise ArrowInvalid(f"{name}: need at least one array argument")
    if n is None:
        n = cols[0].capacity
    row_count = jnp.asarray(n, dtype=jnp.int32)

    if fn.pre is not None:
        hit = fn.pre(cols, scalars, dict(options or {}))
        if hit is not None:
            return materialize(hit, n)

    okey = _options_key(options)
    # scalars that are arrays/tracers must be traced, not baked in; for
    # simplicity python numbers are baked via closure in options when static
    runner = _jitted(name, okey, sig)
    result = runner(cols, row_count, scalars)
    out = materialize(result, n)
    if name == "run_end_encode" and isinstance(out, dict):
        # assemble the REE array (reference returns a
        # RunEndEncodedArray, vector_run_end_encode.cc)
        from .. import types as _T
        from ..array.array import Array as _Array
        from ..array.data import ArrayData as _ArrayData
        re_arr, val_arr = out["run_ends"], out["values"]
        t = _T.run_end_encoded(re_arr.type, val_arr.type)
        length = int(re_arr.to_pylist()[-1]) if len(re_arr) else 0
        return _Array(_ArrayData(t, length, [],
                                 children=[re_arr.data, val_arr.data],
                                 null_count=0))
    return out


def materialize(result, n: int):
    """Convert a kernel result (DeviceColumn / AggResult / Compacted /
    ErrGuard / tuple) to host Array / Scalar, raising deferred errors."""
    from ..device.column import DeviceColumn, download_column
    from .aggregate import AggResult
    from .elementwise import ErrGuard
    from .selection import Compacted

    if isinstance(result, ErrGuard):
        if bool(result.flag):
            raise ArrowInvalid(result.msg)
        return materialize(result.result, n)
    if isinstance(result, Compacted):
        return materialize(result.column, int(result.count))
    if isinstance(result, DeviceColumn):
        return download_column(result, n)
    if isinstance(result, AggResult):
        return result.to_scalar()
    if isinstance(result, tuple):
        return tuple(materialize(r, n) for r in result)
    if isinstance(result, dict):
        return {k: materialize(v, n) for k, v in result.items()}
    raise TypeError(f"unexpected kernel result {type(result)}")


def _scalar_cast(self, target_type, safe=True, options=None):
    """Cast via a 1-element array round trip (scalar.h CastTo)."""
    from ..array.array import array as _make
    a = _make([self.value], self.type)
    out = a.cast(target_type)
    return Scalar(out.to_pylist()[0], target_type)


def _scalar_equals(self, other) -> bool:
    return (isinstance(other, Scalar) and self.type == other.type
            and self.value == other.value)


def _scalar_validate(self, *, full: bool = False):
    return None


Scalar.cast = _scalar_cast
Scalar.equals = _scalar_equals
Scalar.validate = _scalar_validate
