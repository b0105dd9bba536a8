"""Expression JIT compilation.

Reference analogue: cpp/src/gandiva/ (LLVM-IR JIT for projection/filter
expressions: Projector projector.h:41, Filter filter.h:41). The TPU-native
equivalent needs no LLVM: expressions trace through JAX and XLA *is* the
JIT. This module provides the Gandiva-shaped API (make_projector /
make_filter) on top of the plan executor so Gandiva users have a direct
mapping.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from .acero import Declaration, ProjectNodeOptions, TableSourceNodeOptions
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


class Projector:
    def __init__(self, schema: Schema, exprs: List[Tuple[Expression, str]]):
        self.schema = schema
        self.exprs = exprs

    def evaluate(self, batch: RecordBatch) -> List:
        tbl = Declaration.from_sequence([
            Declaration("table_source", TableSourceNodeOptions(batch)),
            Declaration("project", ProjectNodeOptions(
                [e for e, _ in self.exprs],
                [n for _, n in self.exprs])),
        ]).to_table()
        return [tbl.column(n).combine() for _, n in self.exprs]


class Filter:
    def __init__(self, schema: Schema, condition: Expression):
        self.schema = schema
        self.condition = condition

    def evaluate(self, batch: RecordBatch):
        """Returns the selection indices (reference: SelectionVector)."""
        import numpy as np

        tbl = Declaration.from_sequence([
            Declaration("table_source", TableSourceNodeOptions(batch)),
            Declaration("project", ProjectNodeOptions(
                [self.condition], ["__cond__"])),
        ]).to_table()
        mask = np.array([bool(v) if v is not None else False
                         for v in tbl.column("__cond__").to_pylist()])
        from .array.array import array as make_array
        return make_array(np.nonzero(mask)[0].astype(np.uint32))


def make_projector(schema: Schema,
                   exprs: List[Tuple[Expression, str]]) -> Projector:
    return Projector(schema, exprs)


def make_filter(schema: Schema, condition: Expression) -> Filter:
    return Filter(schema, condition)
