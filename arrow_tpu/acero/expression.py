"""Expression trees: literal / field_ref / call.

Reference analogue: compute/expression.h:45 (Expression, Bind,
ExecuteScalarExpression, FoldConstants, SimplifyWithGuarantee). TPU
redesign: an expression binds against a DeviceBatch schema and traces
directly into the enclosing node's jitted stage — there is no interpreter
loop at runtime, XLA sees the whole tree.

String handling: device strings are dictionary codes, so string literals are
translated to codes (equality) or ranks (ordering) against the column's
host-side dictionary before tracing — the jitted graph only ever sees ints.
"""

from __future__ import annotations

from typing import List, Optional

import jax.numpy as jnp
import numpy as np

from .. import types as T
from ..compute.registry import ArrowInvalid, ExecContext, get_function
from ..device.column import DeviceBatch, DeviceColumn


class Expression:
    KIND_LITERAL = "literal"
    KIND_FIELD = "field_ref"
    KIND_CALL = "call"

    __slots__ = ("kind", "value", "name", "fn", "args", "options")

    def __init__(self, kind, value=None, name=None, fn=None, args=(),
                 options=None):
        self.kind = kind
        self.value = value
        self.name = name
        self.fn = fn
        self.args = list(args)
        self.options = options or {}

    # --- constructors ----------------------------------------------------
    @staticmethod
    def literal(v) -> "Expression":
        return Expression(Expression.KIND_LITERAL, value=v)

    @staticmethod
    def field(name) -> "Expression":
        return Expression(Expression.KIND_FIELD, name=name)

    @staticmethod
    def call(fn: str, *args, **options) -> "Expression":
        args = [a if isinstance(a, Expression) else Expression.literal(a)
                for a in args]
        return Expression(Expression.KIND_CALL, fn=fn, args=args,
                          options=options)

    # --- operators (pyarrow.dataset.field()-style sugar) ------------------
    def _bin(self, fn, other, swap=False):
        other = other if isinstance(other, Expression) \
            else Expression.literal(other)
        a, b = (other, self) if swap else (self, other)
        return Expression.call(fn, a, b)

    def __eq__(self, o): return self._bin("equal", o)          # noqa: E704
    def __ne__(self, o): return self._bin("not_equal", o)      # noqa: E704
    def __lt__(self, o): return self._bin("less", o)           # noqa: E704
    def __le__(self, o): return self._bin("less_equal", o)     # noqa: E704
    def __gt__(self, o): return self._bin("greater", o)        # noqa: E704
    def __ge__(self, o): return self._bin("greater_equal", o)  # noqa: E704
    def __add__(self, o): return self._bin("add", o)           # noqa: E704
    def __radd__(self, o): return self._bin("add", o, True)    # noqa: E704
    def __sub__(self, o): return self._bin("subtract", o)      # noqa: E704
    def __rsub__(self, o): return self._bin("subtract", o, True)  # noqa: E704
    def __mul__(self, o): return self._bin("multiply", o)      # noqa: E704
    def __rmul__(self, o): return self._bin("multiply", o, True)  # noqa: E704
    def __truediv__(self, o): return self._bin("divide", o)    # noqa: E704
    def __and__(self, o): return self._bin("and_kleene", o)    # noqa: E704
    def __or__(self, o): return self._bin("or_kleene", o)      # noqa: E704
    def __invert__(self): return Expression.call("invert", self)  # noqa: E704

    def isin(self, values) -> "Expression":
        return Expression.call("is_in", self, value_set=list(values))

    def is_valid(self) -> "Expression":
        return Expression.call("is_valid", self)

    def is_null(self, nan_is_null: bool = False) -> "Expression":
        return Expression.call("is_null", self,
                               nan_is_null=nan_is_null)

    def is_nan(self) -> "Expression":
        return Expression.call("is_nan", self)

    def cast(self, target_type, safe: bool = True,
             options=None) -> "Expression":
        return Expression.call("cast", self, to_type=target_type,
                               safe=safe)

    def to_substrait(self, schema, allow_arrow_extensions: bool = False):
        """Serialize as a single-expression Substrait
        ExtendedExpression (pyarrow Expression.to_substrait)."""
        from ..substrait import serialize_expressions
        from ..buffer import Buffer
        return Buffer(serialize_expressions([self], ["expression"],
                                            schema))

    @staticmethod
    def from_substrait(message) -> "Expression":
        """Deserialize a single-expression ExtendedExpression."""
        from ..substrait import deserialize_expressions
        buf = message if isinstance(message, (bytes, bytearray)) else (
            message.to_pybytes() if hasattr(message, "to_pybytes")
            else message.SerializeToString())
        bound = deserialize_expressions(bytes(buf))
        if len(bound.expressions) != 1:
            raise ValueError(
                "expected exactly one expression, got "
                f"{len(bound.expressions)}")
        return next(iter(bound.expressions.values()))

    def __hash__(self):
        return hash(repr(self))

    def __repr__(self):
        if self.kind == self.KIND_LITERAL:
            return repr(self.value)
        if self.kind == self.KIND_FIELD:
            return f"field({self.name})"
        return f"{self.fn}({', '.join(map(repr, self.args))})"

    # --- analysis --------------------------------------------------------
    def field_names(self) -> List[str]:
        if self.kind == self.KIND_FIELD:
            return [self.name]
        out = []
        for a in self.args:
            out.extend(a.field_names())
        return out

    def equals(self, other: "Expression") -> bool:
        return repr(self) == repr(other)

    # --- execution (traced) ----------------------------------------------
    def evaluate(self, batch: DeviceBatch,
                 ctx: Optional[ExecContext] = None):
        """Trace this expression over a DeviceBatch -> DeviceColumn (or a
        python literal for pure-literal expressions)."""
        if ctx is None:
            ctx = ExecContext(batch.capacity, batch.row_count)
        return _evaluate(self, batch, ctx)


def _evaluate(expr: Expression, batch: DeviceBatch, ctx: ExecContext):
    if expr.kind == Expression.KIND_LITERAL:
        return expr.value
    if expr.kind == Expression.KIND_FIELD:
        return batch.column(expr.name)

    args = [_evaluate(a, batch, ctx) for a in expr.args]

    # string-literal translation against dictionary-coded columns
    if expr.fn in ("equal", "not_equal", "less", "less_equal", "greater",
                   "greater_equal"):
        args = _translate_string_compare(expr.fn, args)
    if expr.fn == "is_in":
        return _eval_is_in(ctx, args[0], expr.options.get("value_set", []))
    if expr.fn == "match_substring":
        return _eval_match_substring(ctx, args[0],
                                     expr.options.get("pattern", ""))

    fn = get_function(expr.fn)
    out = fn.impl(ctx, *args, **expr.options)
    from ..compute.elementwise import ErrGuard
    if isinstance(out, ErrGuard):
        # inside a traced plan stage there is no host sync point to raise
        # deferred checked-arithmetic errors; plans keep the value lanes
        # (call_function still raises for direct kernel calls)
        out = out.result
    return out


def _is_string_col(c) -> bool:
    return isinstance(c, DeviceColumn) and c.dictionary is not None


def _rank_transform(col: DeviceColumn):
    """Dense value ranks: equal dictionary values share one rank, so
    derived dictionaries with duplicate slots (e.g. a sliced phone
    column) compare correctly."""
    vals = col.dictionary.to_pylist()
    uniq = sorted(set(vals))
    rank_of = {v: i for i, v in enumerate(uniq)}
    ranks = np.array([rank_of[v] for v in vals], dtype=np.int64)
    new_vals = jnp.asarray(ranks)[col.values.astype(jnp.int64)]
    return DeviceColumn(new_vals, col.validity, T.int64()), vals, ranks


def _translate_string_compare(fn, args):
    """Comparisons against dictionary-coded columns (strings, fixed-size
    binary, wide decimals, nested passthrough) translate to host work on
    the dictionary values + a device code compare."""
    import decimal as _decimal
    a, b = args
    a_str, b_str = _is_string_col(a), _is_string_col(b)
    if not a_str and not b_str:
        return args
    if a_str and b_str:
        # column-vs-column: re-encode both against the sorted union
        # dictionary, then compare the (order-preserving) codes directly
        from ..compute.dispatch import unify_device_dicts
        ua, ub = unify_device_dicts([a, b])
        if ua.dictionary is not ub.dictionary:
            raise ArrowInvalid(
                "dictionary comparison requires unifiable dictionaries")
        return [DeviceColumn(ua.values.astype(jnp.int64), ua.validity,
                             T.int64()),
                DeviceColumn(ub.values.astype(jnp.int64), ub.validity,
                             T.int64())]
    col, lit, col_first = (a, b, True) if a_str else (b, a, False)
    if not isinstance(lit, (str, bytes, int, float, _decimal.Decimal)) or \
            isinstance(lit, bool):
        raise ArrowInvalid(
            f"cannot compare dictionary-coded values with {type(lit)}")
    if fn in ("equal", "not_equal"):
        # value-level equality: every dictionary slot holding the literal
        # matches (derived dictionaries may hold duplicate values), so
        # translate to a per-slot 0/1 table compared against 1.
        vals = col.dictionary.to_pylist()
        hits = np.array([v == lit for v in vals], dtype=np.int64)
        eq = jnp.asarray(hits)[col.values.astype(jnp.int64)]
        new = (DeviceColumn(eq, col.validity, T.int64()), 1)
    else:
        # ordering: rank-transform column, rank of literal = how many
        # dictionary values sort strictly before it
        rcol, vals, ranks = _rank_transform(col)
        import bisect
        uniq = sorted(set(vals))
        if lit in uniq:
            new = (rcol, int(ranks[vals.index(lit)]))
        else:
            # occupy a half-step below the insertion point so > / >= and
            # < / <= all resolve correctly against dense ranks
            new = (rcol, bisect.bisect_left(uniq, lit) - 0.5)
    return list(new) if col_first else list(reversed(list(new)))


def _eval_is_in(ctx, col, value_set):
    """Set membership (reference: kernels/scalar_set_lookup.cc is_in)."""
    from ..compute.elementwise import _col
    if _is_string_col(col):
        # Per-slot membership table: derived dictionaries (e.g. a sliced
        # phone column) hold duplicate values, so every slot whose value
        # is in the set must match — not just the first code per value.
        vals = col.dictionary.to_pylist()
        sset = {v for v in value_set if v is not None}
        hits = np.array([v in sset for v in vals], dtype=np.bool_)
        out = jnp.asarray(hits)[col.values.astype(jnp.int64)]
    else:
        out = jnp.zeros(col.capacity, jnp.bool_)
        for v in value_set:
            if v is None:
                continue
            out = jnp.logical_or(
                out, col.values == jnp.asarray(v, col.values.dtype))
    return _col(out, col.validity, T.bool_())


def _eval_match_substring(ctx, col, pattern):
    """Substring match on dictionary-coded strings: evaluated per
    dictionary value on host, broadcast through codes on device."""
    from ..compute.elementwise import _col
    if not _is_string_col(col):
        raise ArrowInvalid("match_substring needs a string column")
    vals = col.dictionary.to_pylist()
    hits = np.array([pattern in (v or "") for v in vals], dtype=np.bool_)
    table = jnp.asarray(hits)
    out = table[col.values.astype(jnp.int64)]
    return _col(out, col.validity, T.bool_())


# --- simplification --------------------------------------------------------

def fold_constants(expr: Expression) -> Expression:
    """Pre-evaluate pure-literal subtrees (reference:
    compute/expression.h:214 FoldConstants)."""
    if expr.kind != Expression.KIND_CALL:
        return expr
    args = [fold_constants(a) for a in expr.args]
    if all(a.kind == Expression.KIND_LITERAL for a in args) and \
            expr.fn in _PY_FOLDS:
        try:
            v = _PY_FOLDS[expr.fn](*[a.value for a in args])
            return Expression.literal(v)
        except Exception:
            pass
    # boolean short-circuits (guarantee pruning relies on these)
    if expr.fn in ("and_kleene", "and") and len(args) == 2:
        for i, a in enumerate(args):
            if a.kind == Expression.KIND_LITERAL:
                if a.value is False:
                    return Expression.literal(False)
                if a.value is True:
                    return args[1 - i]
    if expr.fn in ("or_kleene", "or") and len(args) == 2:
        for i, a in enumerate(args):
            if a.kind == Expression.KIND_LITERAL:
                if a.value is True:
                    return Expression.literal(True)
                if a.value is False:
                    return args[1 - i]
    out = Expression(Expression.KIND_CALL, fn=expr.fn, args=args,
                     options=expr.options)
    return out


_PY_FOLDS = {
    "add": lambda a, b: a + b,
    "subtract": lambda a, b: a - b,
    "multiply": lambda a, b: a * b,
    "equal": lambda a, b: a == b,
    "not_equal": lambda a, b: a != b,
    "less": lambda a, b: a < b,
    "less_equal": lambda a, b: a <= b,
    "greater": lambda a, b: a > b,
    "greater_equal": lambda a, b: a >= b,
    "and_kleene": lambda a, b: a and b,
    "or_kleene": lambda a, b: a or b,
    "invert": lambda a: not a,
}


def simplify_with_guarantee(expr: Expression,
                            guarantee: Optional[Expression]) -> Expression:
    """Partition-pruning workhorse (reference: expression.h:224): replace
    fields pinned by an equality guarantee with literals, then fold."""
    if guarantee is None:
        return fold_constants(expr)
    pinned = {}
    _collect_pins(guarantee, pinned)
    return fold_constants(_substitute(expr, pinned))


def _collect_pins(g: Expression, out: dict):
    if g.kind == Expression.KIND_CALL:
        if g.fn == "equal" and len(g.args) == 2:
            a, b = g.args
            if a.kind == Expression.KIND_FIELD and \
                    b.kind == Expression.KIND_LITERAL:
                out[a.name] = b.value
            elif b.kind == Expression.KIND_FIELD and \
                    a.kind == Expression.KIND_LITERAL:
                out[b.name] = a.value
        elif g.fn == "and_kleene":
            for a in g.args:
                _collect_pins(a, out)


def _substitute(e: Expression, pins: dict) -> Expression:
    if e.kind == Expression.KIND_FIELD and e.name in pins:
        return Expression.literal(pins[e.name])
    if e.kind == Expression.KIND_CALL:
        return Expression(Expression.KIND_CALL, fn=e.fn,
                          args=[_substitute(a, pins) for a in e.args],
                          options=e.options)
    return e


# convenience API matching pyarrow.compute.field / scalar
def field(name) -> Expression:
    return Expression.field(name)


def scalar(v) -> Expression:
    return Expression.literal(v)
