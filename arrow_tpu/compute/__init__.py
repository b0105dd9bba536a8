"""Public compute API.

Mirrors pyarrow.compute's surface (reference: python/pyarrow/compute.py:244 —
wrappers auto-generated from the registry); array-valued functions accept
host Arrays / ChunkedArrays / python scalars and run the device kernels
under jit.
"""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

from ..array.array import array as make_array
from ..table import ChunkedArray, RecordBatch, Table
from ..types import TypeId
from . import aggregate as _aggregate  # noqa: F401  (registers kernels)
from . import elementwise as _elementwise  # noqa: F401
from . import grouper as _grouper  # noqa: F401
from . import hash_agg as _hash_agg  # noqa: F401
from . import selection as _selection  # noqa: F401
from . import strings as _strings  # noqa: F401
from . import temporal as _temporal  # noqa: F401
from . import vector_misc as _vector_misc  # noqa: F401
from . import host_kernels as _host_kernels  # noqa: F401
from . import hashing as _hashing  # noqa: F401
from . import vector_sort as _vector_sort  # noqa: F401
from . import extra_kernels as _extra_kernels  # noqa: F401
from .options import *  # noqa: F401,F403  (FunctionOptions classes)
from .options import FunctionOptions  # noqa: F401
from ..acero.expression import field, scalar  # noqa: F401  (pyarrow.compute
# exposes Expression builders from the compute namespace too)
from .registry import (ArrowInvalid, ArrowNotImplementedError,  # noqa: F401
                       ExecContext, Scalar, call_function,
                       function_registry, get_function, list_functions)

__all__ = [
    "call_function", "list_functions", "get_function", "Scalar",
    "ArrowInvalid", "ArrowNotImplementedError",
    "filter", "take", "drop_null", "sort_indices", "array_sort_indices",
    "select_k_unstable", "unique", "value_counts", "dictionary_encode",
]


def _combine(a):
    if isinstance(a, ChunkedArray):
        return a.combine()
    return a


def _string_rank_transform(dev_col):
    """For order-sensitive kernels on dictionary-coded string columns:
    replace codes with lexicographic ranks of the dictionary values."""
    from ..device.column import DeviceColumn
    if dev_col.dictionary is None:
        return dev_col
    d = dev_col.dictionary
    vals = d.to_pylist()
    order = np.argsort(np.array(vals, dtype=object), kind="stable")
    ranks = np.empty(len(vals), dtype=np.int64)
    ranks[order] = np.arange(len(vals))
    rank_arr = jnp.asarray(ranks)
    new_vals = rank_arr[dev_col.values.astype(jnp.int64)]
    from .. import types as T
    return DeviceColumn(new_vals, dev_col.validity, T.int64())


def _upload_for_sort(arrays):
    from ..device.column import round_up, upload_column
    n = len(arrays[0])
    cap = round_up(n)
    cols = []
    for a in arrays:
        c = upload_column(a, cap)
        if c.dictionary is not None:
            c = _string_rank_transform(c)
        cols.append(c)
    return cols, n, cap


def _materialize_vector(result, n_hint=None):
    from .registry import materialize
    return materialize(result, n_hint if n_hint is not None else 0)


# --- explicit vector wrappers ---------------------------------------------

def filter(values, mask, null_selection_behavior: str = "drop"):
    if isinstance(values, (Table, RecordBatch)):
        return _filter_table(values, mask, null_selection_behavior)
    return call_function("filter", [_combine(values), _combine(mask)],
                         {"null_selection_behavior": null_selection_behavior})


def _filter_table(tbl, mask, null_selection_behavior):
    from ..device.column import download_batch, upload_batch, upload_column
    from .selection import filter_batch
    import jax
    is_table = isinstance(tbl, Table)
    rb = tbl.to_batches()[0] if is_table and tbl.num_rows else (
        tbl if not is_table else RecordBatch(
            tbl.schema, [c.combine() for c in tbl.columns]))
    if is_table:
        rb = RecordBatch(tbl.schema, [c.combine() for c in tbl.columns])
    db = upload_batch(rb)
    mask_col = upload_column(_combine(mask), db.capacity)
    out = jax.jit(filter_batch, static_argnames="null_selection")(
        db, mask_col, null_selection=null_selection_behavior)
    out_rb = download_batch(out)
    return Table.from_batches([out_rb]) if is_table else out_rb


def take(values, indices, boundscheck: bool = True):
    if isinstance(values, (Table, RecordBatch)):
        return _take_table(values, indices)
    v = _combine(values)
    return call_function("take", [v, _combine(indices), len(v)],
                         {"boundscheck": boundscheck})


def _take_table(tbl, indices):
    is_table = isinstance(tbl, Table)
    cols = (tbl.columns if not is_table
            else [c.combine() for c in tbl.columns])
    taken = [take(_combine(c), _combine(indices)) for c in cols]
    if is_table:
        return Table.from_arrays(taken, tbl.schema.names)
    return RecordBatch.from_arrays(taken, tbl.schema.names)


def drop_null(values):
    if isinstance(values, (Table, RecordBatch)):
        mask_np = None
        cols = (values.columns if isinstance(values, RecordBatch)
                else [c.combine() for c in values.columns])
        m = np.ones(values.num_rows, dtype=bool)
        for c in cols:
            m &= c.is_valid_mask()
        return filter(values, make_array(m))
    return call_function("drop_null", [_combine(values)])


def _norm_sort_keys(sort_keys):
    out = []
    for sk in sort_keys:
        if isinstance(sk, str):
            out.append((sk, "ascending"))
        else:
            out.append((sk[0], sk[1]))
    return out


def sort_indices(data, sort_keys=None, null_placement: str = "at_end",
                 order: str = "ascending"):
    import jax
    from .keys import sort_key_arrays, stable_sort_indices as _sort
    from .registry import ExecContext
    from .. import types as T

    if isinstance(data, (Table, RecordBatch)):
        sort_keys = _norm_sort_keys(sort_keys or
                                    [(n, "ascending")
                                     for n in data.schema.names[:1]])
        arrays = [_combine(data.column(name)) for name, _ in sort_keys]
        orders = [o for _, o in sort_keys]
    else:
        arrays = [_combine(data)]
        orders = [order]
    cols, n, cap = _upload_for_sort(arrays)

    @jax.jit
    def run(cols, row_count):
        ctx = ExecContext(cap, row_count)
        keys = sort_key_arrays(cols, orders, null_placement, ctx.row_mask())
        return _sort(keys, cap)

    perm = run(cols, jnp.asarray(n, jnp.int32))
    return make_array(np.asarray(perm[:n]).astype(np.uint64), T.uint64())


def array_sort_indices(values, order: str = "ascending",
                       null_placement: str = "at_end"):
    return sort_indices(values, order=order, null_placement=null_placement)


def select_k_unstable(data, k: int, sort_keys=None):
    idx = sort_indices(data, sort_keys=sort_keys)
    return idx.slice(0, k)


def rank(values, sort_keys="ascending", null_placement: str = "at_end",
         tiebreaker: str = "first"):
    return call_function("rank", [_combine(values)],
                         {"sort_keys": sort_keys,
                          "null_placement": null_placement,
                          "tiebreaker": tiebreaker})


def unique(values):
    a = _combine(values)
    if a.type.id in (TypeId.STRING, TypeId.LARGE_STRING, TypeId.BINARY,
                     TypeId.LARGE_BINARY, TypeId.DICTIONARY):
        return _unique_strings(a)
    return call_function("unique", [a])


def _unique_strings(a):
    out = call_function("unique", [a])
    return out


def value_counts(values):
    """StructArray<values, counts> like pyarrow (vector_hash.cc)."""
    res = call_function("value_counts", [_combine(values)])
    from .. import types as T
    from ..array.array import Array
    from ..array.data import ArrayData
    vals, counts = res["values"], res["counts"]
    st = T.struct([("values", vals.type), ("counts", T.int64())])
    return Array(ArrayData(st, len(vals), [None],
                           children=[vals.data, counts.data],
                           null_count=0))


def dictionary_encode(values):
    """Dictionary-coded array with first-appearance value order
    (vector_hash.cc DictionaryEncode): dictionary = unique non-null
    values, codes via index_in, nulls stay null in the indices."""
    from .. import types as T
    from ..array.array import Array
    from ..array.data import ArrayData
    a = _combine(values)
    if a.type.id == T.TypeId.DICTIONARY:
        return a
    uniq = call_function("unique", [a])
    if uniq.null_count:
        uniq = call_function("drop_null", [uniq])
    codes = call_function("index_in", [a],
                          {"value_set": tuple(uniq.to_pylist())})
    d = codes.data
    return Array(ArrayData(T.dictionary(T.int32(), a.type), d.length,
                           list(d.buffers), null_count=d._null_count,
                           offset=d.offset, dictionary=uniq.data))


def partition_nth_indices(values, pivot: int):
    return call_function("partition_nth_indices", [_combine(values)],
                         {"pivot": pivot})


# --- generated wrappers ----------------------------------------------------

_EXPLICIT = set(__all__)


def _make_wrapper(name):
    def wrapper(*args, **kwargs):
        options = kwargs.pop("options", None)
        if isinstance(options, FunctionOptions):
            options = options.to_kwargs()
        options = dict(options or {})
        options.update(kwargs)
        return call_function(name, list(args), options or None)
    wrapper.__name__ = name
    wrapper.__qualname__ = name
    fn = get_function(name)
    wrapper.__doc__ = fn.doc or f"compute function {name!r}"
    return wrapper


_mod = sys.modules[__name__]
for _name in list_functions():
    if _name in _EXPLICIT or _name.startswith("hash_"):
        continue
    if not hasattr(_mod, _name):
        setattr(_mod, _name, _make_wrapper(_name))
        __all__.append(_name)

# python keywords need trailing-underscore aliases (pyarrow convention)
and_ = getattr(_mod, "and")
or_ = getattr(_mod, "or")


def __getattr__(name):
    if name == "Expression":
        from ..acero.expression import Expression
        return Expression
    raise AttributeError(name)


def register_scalar_function(func, function_name, function_doc, in_types,
                             out_type):
    """Register a python UDF (pyarrow.compute.register_scalar_function).
    ``func(ctx, *arrays) -> Array``; runs host-tier (python UDFs cannot
    trace into XLA; the reference's UDFs are likewise interpreted)."""
    from ..array.array import Array
    from .registry import Function, _REGISTRY

    class _UdfCtx:
        def __init__(self):
            from ..memory import default_memory_pool
            self.memory_pool = default_memory_pool()

    def impl(*args, **options):
        prepared = []
        for a in args:
            if isinstance(a, ChunkedArray):
                a = a.combine()
            prepared.append(a)
        out = func(_UdfCtx(), *prepared)
        if not isinstance(out, (Array, ChunkedArray)) and \
                out_type is not None and not hasattr(out, "type"):
            out = make_array(out, out_type)
        return out

    doc = function_doc.get("summary", "") if isinstance(function_doc,
                                                        dict) else \
        str(function_doc)
    _REGISTRY[function_name] = Function(function_name, "host", impl, doc)
    setattr(_mod, function_name, _make_wrapper(function_name))


# --- remaining pyarrow.compute module-level names ---------------------------

def top_k_unstable(values, k, sort_keys=None, *, memory_pool=None):
    """Indices of the k largest elements (api_vector.h SelectKOptions)."""
    target = _combine(values)
    if sort_keys is None:
        keys = [("dummy", "descending")]
        return call_function("select_k_unstable", [target],
                             {"k": k, "sort_keys": keys})
    keys = [(n, "descending") for n in sort_keys]
    return call_function("select_k_unstable", [target],
                         {"k": k, "sort_keys": keys})


def bottom_k_unstable(values, k, sort_keys=None, *, memory_pool=None):
    """Indices of the k smallest elements."""
    target = _combine(values)
    if sort_keys is None:
        keys = [("dummy", "ascending")]
    else:
        keys = [(n, "ascending") for n in sort_keys]
    return call_function("select_k_unstable", [target],
                         {"k": k, "sort_keys": keys})


def utf8_zfill(strings, width=None, padding="0", *, options=None,
               memory_pool=None):
    """Alias of utf8_zero_fill (pyarrow.compute.utf8_zfill)."""
    opts = {"width": width, "padding": padding} if options is None else \
        (options.to_kwargs() if hasattr(options, "to_kwargs")
         else dict(options))
    return call_function("utf8_zero_fill", [_combine(strings)], opts)


class UdfContext:
    """Passed as first argument to python UDFs
    (pyarrow.compute.UdfContext)."""

    def __init__(self, batch_length: int = 0):
        from ..memory import default_memory_pool
        self.memory_pool = default_memory_pool()
        self.batch_length = batch_length


def register_aggregate_function(func, function_name, function_doc,
                                in_types, out_type):
    """Python UDAF: func(ctx, *arrays) -> scalar value
    (pyarrow.compute.register_aggregate_function)."""
    from .registry import Function, _REGISTRY, Scalar

    def impl(*args, **options):
        prepared = [a.combine() if isinstance(a, ChunkedArray) else a
                    for a in args]
        out = func(UdfContext(len(prepared[0]) if prepared else 0),
                   *prepared)
        if isinstance(out, Scalar):
            return out
        return Scalar(out, out_type)

    doc = function_doc.get("summary", "") if isinstance(function_doc,
                                                        dict) else \
        str(function_doc)
    _REGISTRY[function_name] = Function(function_name, "host", impl, doc)
    setattr(_mod, function_name, _make_wrapper(function_name))


def register_vector_function(func, function_name, function_doc, in_types,
                             out_type):
    """Python vector UDF (whole-array in, array out)."""
    return register_scalar_function(func, function_name, function_doc,
                                    in_types, out_type)


_TABULAR_FUNCS: dict = {}


def register_tabular_function(func, function_name, function_doc, in_types,
                              out_type):
    """Table-producing UDF: func(ctx) -> RecordBatchReader / Table
    (pyarrow.compute.register_tabular_function)."""
    _TABULAR_FUNCS[function_name] = func


def call_tabular_function(function_name, args=None, func_registry=None):
    from ..table import RecordBatchReader, Table
    fn = _TABULAR_FUNCS.get(function_name)
    if fn is None:
        raise KeyError(f"no tabular function {function_name!r}")
    out = fn(UdfContext(), *(args or ()))
    if isinstance(out, Table):
        return out.to_reader()
    if isinstance(out, RecordBatchReader):
        return out
    return out


def _expression_cls():
    from ..acero.expression import Expression as _E
    return _E


from ..acero.expression import Expression  # noqa: F401,E402
from .registry import Function  # noqa: F401,E402


class Kernel:
    """Opaque kernel descriptor (compute/kernel.h). Our kernels are
    jitted callables; this class exists for API parity."""


class ScalarKernel(Kernel):
    pass


class VectorKernel(Kernel):
    pass


class ScalarAggregateKernel(Kernel):
    pass


class HashAggregateKernel(Kernel):
    pass


class ScalarFunction(Function):
    pass


class VectorFunction(Function):
    pass


class ScalarAggregateFunction(Function):
    pass


class HashAggregateFunction(Function):
    pass


class FunctionRegistry:
    """Name -> Function registry view (compute/registry.h:46)."""

    def list_functions(self):
        from .registry import _REGISTRY
        return sorted(_REGISTRY)

    def get_function(self, name):
        from .registry import get_function
        return get_function(name)


def function_registry() -> FunctionRegistry:
    return FunctionRegistry()
