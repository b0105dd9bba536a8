"""Minimal SQL frontend over the plan layer.

The reference routes SQL through Substrait (engine/substrait/serde.h) from
external frontends; this module provides a self-contained translator for
the analytic subset the engine executes natively:

  SELECT <exprs> FROM <table> [JOIN <table> ON a = b]...
  [WHERE <pred>] [GROUP BY <cols>] [ORDER BY <col> [ASC|DESC], ...]
  [LIMIT n [OFFSET m]]

Aggregates: sum/min/max/avg/mean/count(*)/count(x)/count(distinct x).
Expressions: arithmetic, comparison, AND/OR/NOT, IN (...), BETWEEN,
LIKE, IS [NOT] NULL, literals (numbers, 'strings', DATE 'YYYY-MM-DD').
"""

from __future__ import annotations

import datetime
import re
from typing import Dict, List, Tuple

from . import acero
from .acero import Declaration, Expression, field
from .table import Table

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>\d+\.\d+|\d+)|(?P<str>'(?:[^']|'')*')"
    r"|(?P<id>[A-Za-z_][A-Za-z_0-9\.]*)"
    r"|(?P<op><=|>=|<>|!=|=|<|>|\(|\)|,|\*|\+|-|/|%))")

_KEYWORDS = {"select", "from", "where", "group", "by", "order", "limit",
             "offset", "as", "and", "or", "not", "in", "between", "like",
             "is", "null", "asc", "desc", "join", "inner", "left", "right",
             "full", "outer", "on", "distinct", "having", "date"}


class _Tokens:
    def __init__(self, sql: str):
        self.toks: List[Tuple[str, str]] = []
        pos = 0
        while pos < len(sql):
            m = _TOKEN_RE.match(sql, pos)
            if not m:
                if sql[pos:].strip() == "":
                    break
                raise ValueError(f"SQL tokenize error at: {sql[pos:pos+20]!r}")
            pos = m.end()
            if m.group("num"):
                self.toks.append(("num", m.group("num")))
            elif m.group("str"):
                self.toks.append(("str",
                                  m.group("str")[1:-1].replace("''", "'")))
            elif m.group("id"):
                word = m.group("id")
                if word.lower() in _KEYWORDS:
                    self.toks.append(("kw", word.lower()))
                else:
                    self.toks.append(("id", word))
            else:
                self.toks.append(("op", m.group("op")))
        self.i = 0

    def peek(self, k=0):
        return self.toks[self.i + k] if self.i + k < len(self.toks) \
            else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def accept(self, kind, value=None):
        t = self.peek()
        if t[0] == kind and (value is None or t[1] == value):
            self.i += 1
            return t
        return None

    def expect(self, kind, value=None):
        t = self.accept(kind, value)
        if t is None:
            raise ValueError(f"SQL parse error: expected {value or kind}, "
                             f"got {self.peek()}")
        return t


_AGG_FNS = {"sum": "sum", "min": "min", "max": "max", "avg": "mean",
            "mean": "mean", "count": "count", "variance": "variance",
            "stddev": "stddev"}


class _Parser:
    def __init__(self, sql: str):
        self.t = _Tokens(sql)
        self.aggregates: List[tuple] = []

    # --- expressions (precedence climbing) -----------------------------
    def parse_expr(self):
        return self._or()

    def _or(self):
        left = self._and()
        while self.t.accept("kw", "or"):
            left = Expression.call("or_kleene", left, self._and())
        return left

    def _and(self):
        left = self._not()
        while self.t.accept("kw", "and"):
            left = Expression.call("and_kleene", left, self._not())
        return left

    def _not(self):
        if self.t.accept("kw", "not"):
            return Expression.call("invert", self._not())
        return self._comparison()

    def _comparison(self):
        left = self._additive()
        t = self.t.peek()
        if t[0] == "op" and t[1] in ("=", "<>", "!=", "<", "<=", ">", ">="):
            self.t.next()
            right = self._additive()
            fn = {"=": "equal", "<>": "not_equal", "!=": "not_equal",
                  "<": "less", "<=": "less_equal", ">": "greater",
                  ">=": "greater_equal"}[t[1]]
            return Expression.call(fn, left, right)
        if self.t.accept("kw", "between"):
            lo = self._additive()
            self.t.expect("kw", "and")
            hi = self._additive()
            return Expression.call("and_kleene",
                                   Expression.call("greater_equal", left, lo),
                                   Expression.call("less_equal", left, hi))
        if self.t.accept("kw", "like"):
            pat = self.t.expect("str")[1]
            return Expression.call("match_like", left, pattern=pat)
        if self.t.accept("kw", "in"):
            self.t.expect("op", "(")
            vals = [self._literal_value()]
            while self.t.accept("op", ","):
                vals.append(self._literal_value())
            self.t.expect("op", ")")
            return left.isin(vals)
        if self.t.accept("kw", "is"):
            negate = bool(self.t.accept("kw", "not"))
            self.t.expect("kw", "null")
            e = left.is_null()
            return Expression.call("invert", e) if negate else e
        return left

    def _additive(self):
        left = self._mult()
        while True:
            t = self.t.peek()
            if t == ("op", "+"):
                self.t.next()
                left = Expression.call("add", left, self._mult())
            elif t == ("op", "-"):
                self.t.next()
                left = Expression.call("subtract", left, self._mult())
            else:
                return left

    def _mult(self):
        left = self._unary()
        while True:
            t = self.t.peek()
            if t == ("op", "*"):
                self.t.next()
                left = Expression.call("multiply", left, self._unary())
            elif t == ("op", "/"):
                self.t.next()
                left = Expression.call("divide", left, self._unary())
            else:
                return left

    def _unary(self):
        if self.t.accept("op", "-"):
            return Expression.call("negate", self._unary())
        return self._primary()

    def _literal_value(self):
        t = self.t.next()
        if t[0] == "num":
            return float(t[1]) if "." in t[1] else int(t[1])
        if t[0] == "str":
            return t[1]
        raise ValueError(f"expected literal, got {t}")

    def _primary(self):
        t = self.t.peek()
        if t == ("op", "("):
            self.t.next()
            e = self.parse_expr()
            self.t.expect("op", ")")
            return e
        if t[0] == "num" or t[0] == "str":
            return Expression.literal(self._literal_value())
        if t == ("kw", "date"):
            self.t.next()
            s = self.t.expect("str")[1]
            d = datetime.date.fromisoformat(s)
            return Expression.literal(
                (d - datetime.date(1970, 1, 1)).days)
        if t[0] == "id":
            name = self.t.next()[1]
            if self.t.peek() == ("op", "("):  # function call
                self.t.next()
                fname = name.lower()
                if fname in _AGG_FNS or fname == "count":
                    return self._aggregate_call(fname)
                args = []
                if self.t.peek() != ("op", ")"):
                    args.append(self.parse_expr())
                    while self.t.accept("op", ","):
                        args.append(self.parse_expr())
                self.t.expect("op", ")")
                return Expression.call(fname, *args)
            return field(name.split(".")[-1])
        raise ValueError(f"SQL parse error at {t}")

    def _aggregate_call(self, fname):
        distinct = bool(self.t.accept("kw", "distinct"))
        if self.t.accept("op", "*"):
            self.t.expect("op", ")")
            tag = f"__agg{len(self.aggregates)}__"
            self.aggregates.append((None, "count_all", {}, tag))
            return field(tag)
        inner = self.parse_expr()
        self.t.expect("op", ")")
        if inner.kind != Expression.KIND_FIELD:
            raise ValueError("aggregate arguments must be plain columns "
                             "(project first)")
        fn = _AGG_FNS[fname]
        if fname == "count" and distinct:
            fn = "count_distinct"
        tag = f"__agg{len(self.aggregates)}__"
        self.aggregates.append((inner.name, fn, {}, tag))
        return field(tag)


def _parse_select_list(p: _Parser):
    items = []
    while True:
        if p.t.accept("op", "*"):
            items.append(("*", None))
        else:
            e = p.parse_expr()
            name = None
            if p.t.accept("kw", "as"):
                name = p.t.next()[1]
            items.append((name, e))
        if not p.t.accept("op", ","):
            return items


def query(sql: str, tables: Dict[str, Table]) -> Table:
    """Execute a SQL query against named tables."""
    p = _Parser(sql)
    p.t.expect("kw", "select")
    select_items = _parse_select_list(p)
    p.t.expect("kw", "from")
    base_name = p.t.expect("id")[1]
    if base_name not in tables:
        raise KeyError(f"unknown table {base_name!r}")
    plan = Declaration("table_source",
                       acero.TableSourceNodeOptions(tables[base_name]))

    # joins
    while True:
        jt = None
        if p.t.accept("kw", "join") or (
                p.t.accept("kw", "inner") and p.t.expect("kw", "join")):
            jt = "inner"
        elif p.t.peek() == ("kw", "left"):
            p.t.next()
            p.t.accept("kw", "outer")
            p.t.expect("kw", "join")
            jt = "left outer"
        elif p.t.peek() == ("kw", "right"):
            p.t.next()
            p.t.accept("kw", "outer")
            p.t.expect("kw", "join")
            jt = "right outer"
        elif p.t.peek() == ("kw", "full"):
            p.t.next()
            p.t.accept("kw", "outer")
            p.t.expect("kw", "join")
            jt = "full outer"
        else:
            break
        rname = p.t.expect("id")[1]
        p.t.expect("kw", "on")
        lk = p.t.expect("id")[1].split(".")[-1]
        p.t.expect("op", "=")
        rk = p.t.expect("id")[1].split(".")[-1]
        right_tbl = tables[rname]
        right_output = [n for n in right_tbl.schema.names if n != rk]
        plan = Declaration("hashjoin", acero.HashJoinNodeOptions(
            jt, left_keys=[lk], right_keys=[rk],
            right_output=right_output),
            inputs=[plan, Declaration(
                "table_source", acero.TableSourceNodeOptions(right_tbl))])

    where_expr = None
    if p.t.accept("kw", "where"):
        where_expr = p.parse_expr()
    group_cols: List[str] = []
    if p.t.accept("kw", "group"):
        p.t.expect("kw", "by")
        group_cols.append(p.t.expect("id")[1].split(".")[-1])
        while p.t.accept("op", ","):
            group_cols.append(p.t.expect("id")[1].split(".")[-1])
    order_keys = []
    if p.t.accept("kw", "order"):
        p.t.expect("kw", "by")
        while True:
            col = p.t.expect("id")[1].split(".")[-1]
            direction = "ascending"
            if p.t.accept("kw", "desc"):
                direction = "descending"
            else:
                p.t.accept("kw", "asc")
            order_keys.append((col, direction))
            if not p.t.accept("op", ","):
                break
    limit = offset = None
    if p.t.accept("kw", "limit"):
        limit = int(p.t.expect("num")[1])
        if p.t.accept("kw", "offset"):
            offset = int(p.t.expect("num")[1])

    decls = [plan]
    if where_expr is not None:
        decls.append(Declaration("filter",
                                 acero.FilterNodeOptions(where_expr)))

    project_decl = None
    projected_names: List[str] = []
    if p.aggregates or group_cols:
        # pre-project aggregate input expressions are plain columns by
        # construction; run the aggregate then rename/project outputs
        decls.append(Declaration("aggregate", acero.AggregateNodeOptions(
            [(t, f, o or None, out) for (t, f, o, out) in p.aggregates],
            keys=group_cols)))
        projections, names = [], []
        for i, (alias, e) in enumerate(select_items):
            if alias == "*":
                raise ValueError("SELECT * with GROUP BY not supported")
            projections.append(e)
            names.append(alias or _default_name(e, i))
        project_decl = Declaration("project", acero.ProjectNodeOptions(
            projections, names))
        projected_names = names
    elif not (len(select_items) == 1 and select_items[0][0] == "*"):
        projections, names = [], []
        for i, (alias, e) in enumerate(select_items):
            if alias == "*":
                raise ValueError("mixing * with expressions unsupported")
            projections.append(e)
            names.append(alias or _default_name(e, i))
        project_decl = Declaration("project", acero.ProjectNodeOptions(
            projections, names))
        projected_names = names

    # ORDER BY may reference select aliases (sort after projection) or
    # source columns the projection drops (sort before it)
    order_decl = (Declaration("order_by",
                              acero.OrderByNodeOptions(order_keys))
                  if order_keys else None)
    if order_decl is not None and project_decl is not None and             not all(k in projected_names for k, _ in order_keys):
        decls.append(order_decl)
        decls.append(project_decl)
    else:
        if project_decl is not None:
            decls.append(project_decl)
        if order_decl is not None:
            decls.append(order_decl)
    if limit is not None or offset is not None:
        decls.append(Declaration("fetch", acero.FetchNodeOptions(
            offset or 0, limit if limit is not None else -1)))

    return Declaration.from_sequence(decls).to_table()


def _default_name(e: Expression, i: int) -> str:
    if e.kind == Expression.KIND_FIELD:
        return e.name
    return f"col{i}"
