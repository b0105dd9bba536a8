"""Expression JIT compilation (Gandiva equivalent).

Reference analogue: cpp/src/gandiva/ — an LLVM-IR JIT that compiles
projection/filter expression trees once (`Projector` projector.h:41,
`Filter` filter.h:41, `LLVMGenerator` llvm_generator.h:49) and then
evaluates them over many record batches, with a projector/filter cache
(gandiva/cache.h) and selection vectors (selection_vector.h).

The TPU-native equivalent needs no LLVM: expressions bind against the
schema and trace through the plan executor's fused-segment compiler
(acero/exec.py compile_chain), and XLA *is* the JIT. What this module
adds over "just run a plan" is exactly what Gandiva adds over "just
call kernels":

* compile ONCE at make_projector/make_filter time — evaluate() reuses
  the jitted executable for every batch of the same capacity class
  (XLA executables are cached per capacity bucket, the static-shape
  analogue of Gandiva's per-schema module cache);
* a process-wide projector/filter cache keyed on
  (schema fingerprint, expression tree) mirroring gandiva/cache.h, so
  re-making the same projector is free;
* SelectionVector in/out: Filter.evaluate returns one, and
  Projector.evaluate accepts one to materialize only selected rows
  (selection_vector.h semantics).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from .acero import Declaration, ProjectNodeOptions
from .acero.expression import Expression, field, scalar
from .table import RecordBatch
from .types import Schema


class TreeExprBuilder:
    """Reference: gandiva/tree_expr_builder.h — kept for API parity;
    Expression composition is the native way."""

    @staticmethod
    def make_field(f) -> Expression:
        return field(f if isinstance(f, str) else f.name)

    @staticmethod
    def make_literal(v) -> Expression:
        return scalar(v)

    @staticmethod
    def make_function(name: str, args: Sequence[Expression],
                      return_type=None) -> Expression:
        return Expression.call(name, *args)

    @staticmethod
    def make_expression(expr: Expression, result_field) -> Tuple:
        name = result_field if isinstance(result_field, str) \
            else result_field.name
        return (expr, name)

    @staticmethod
    def make_condition(expr: Expression) -> Expression:
        return expr

    @staticmethod
    def make_and(exprs: Sequence[Expression]) -> Expression:
        out = exprs[0]
        for e in exprs[1:]:
            out = Expression.call("and_kleene", out, e)
        return out

    @staticmethod
    def make_or(exprs: Sequence[Expression]) -> Expression:
        out = exprs[0]
        for e in exprs[1:]:
            out = Expression.call("or_kleene", out, e)
        return out

    @staticmethod
    def make_in_expression(expr: Expression, values) -> Expression:
        return expr.isin(values)


class SelectionVector:
    """Selected row indices (reference: gandiva/selection_vector.h).
    Backed by a uint32 numpy array; `to_array()` yields an Arrow
    array like SelectionVector::ToArray."""

    def __init__(self, indices):
        import numpy as np
        self.indices = np.asarray(indices, dtype=np.uint32)

    def __len__(self) -> int:
        return len(self.indices)

    def to_array(self):
        from .array.array import array as make_array
        return make_array(self.indices)


def _batch_of(batch) -> RecordBatch:
    if isinstance(batch, RecordBatch):
        return batch
    # Table input: single-chunk view
    from .table import Table
    if isinstance(batch, Table):
        return batch.combine_chunks().to_batches()[0]
    raise TypeError(f"cannot evaluate over {type(batch)!r}")


class Projector:
    """Compiled projection: the expression list traces into ONE fused
    device program at construction (LLVMGenerator::Build analogue);
    evaluate() runs the cached executable per batch."""

    def __init__(self, schema: Schema,
                 exprs: List[Tuple[Expression, str]]):
        from .acero.exec import compile_chain
        self.schema = schema
        self.exprs = list(exprs)
        self._names = [n for _, n in self.exprs]
        self._fn = compile_chain([
            Declaration("project", ProjectNodeOptions(
                [e for e, _ in self.exprs], self._names)),
        ])

    def evaluate(self, batch,
                 selection: Optional[SelectionVector] = None) -> List:
        """Returns one Array per expression. With a selection vector,
        only the selected rows are materialized (reference:
        Projector::Evaluate(batch, selection_vector, ...))."""
        rb = _batch_of(batch)
        if selection is not None:
            rb = rb.take(selection.to_array())
        from .device.column import download_batch, upload_batch
        out = self._fn(upload_batch(rb))
        host = download_batch(out)
        return [host.column(n) for n in self._names]


class Filter:
    """Compiled filter condition; evaluate() returns the
    SelectionVector of matching row positions."""

    def __init__(self, schema: Schema, condition: Expression):
        from .acero.exec import compile_chain
        self.schema = schema
        self.condition = condition
        # the fused segment computes the boolean + compacts row ids on
        # device; only the selected positions come back to the host
        self._fn = compile_chain([
            Declaration("project", ProjectNodeOptions(
                [condition], ["__cond__"])),
        ])

    def evaluate(self, batch) -> SelectionVector:
        import numpy as np

        from .device.column import download_batch, upload_batch
        rb = _batch_of(batch)
        out = self._fn(upload_batch(rb))
        host = download_batch(out)
        vals = host.column("__cond__").to_pylist()
        mask = np.fromiter((bool(v) if v is not None else False
                            for v in vals), np.bool_, len(vals))
        return SelectionVector(np.nonzero(mask)[0])


# --- projector/filter cache (gandiva/cache.h analogue) ---------------------

_CACHE: Dict[tuple, object] = {}


def _schema_key(schema: Schema) -> tuple:
    try:
        return tuple((f.name, str(f.type)) for f in schema.fields)
    except AttributeError:
        return (repr(schema),)


def make_projector(schema: Schema,
                   exprs: List[Tuple[Expression, str]]) -> Projector:
    key = ("proj", _schema_key(schema),
           tuple((repr(e), n) for e, n in exprs))
    hit = _CACHE.get(key)
    if hit is None:
        hit = _CACHE[key] = Projector(schema, exprs)
    return hit


def make_filter(schema: Schema, condition: Expression) -> Filter:
    key = ("filt", _schema_key(schema), repr(condition))
    hit = _CACHE.get(key)
    if hit is None:
        hit = _CACHE[key] = Filter(schema, condition)
    return hit


def get_registered_function_signatures() -> List[str]:
    """Names evaluable inside projector/filter expressions (reference:
    gandiva GetRegisteredFunctionSignatures)."""
    from .compute import registry
    return sorted(registry.list_functions())
