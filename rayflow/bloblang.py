"""Bloblang text-syntax front-end.

The reference's mapping language is written as assignment programs
(``⟨upstream: internal/bloblang/parser/⟩``, ~5k LoC of Go parser)::

    root.rev   = this.price * (1 - this.discount)
    root.label = this.status.uppercase()
    root.k     = this.props.json_get("k") | "missing"
    root.tmp   = deleted()

This module parses that surface (the subset meaningful over columnar
batches) into the existing vectorized :class:`rayflow.expr.Expr` tree —
so a user coming from the reference can paste their mapping block into
a ``mapping:`` step instead of rewriting it as s-expressions.

Grammar (precedence low → high):

    pipe        expr | expr          (null/error fallback → coalesce)
    or/and      ``||`` ``&&``
    equality    ``==`` ``!=``
    comparison  ``<`` ``<=`` ``>`` ``>=``
    additive    ``+`` ``-``
    multiplic.  ``*`` ``/`` ``%``
    unary       ``!`` ``-``
    postfix     ``.method(args…)`` chains; ``this.field`` column refs
    primary     literals, ``this.x``, ``fn(args…)``, parentheses

Statements are ``root.<name> = <expr>`` lines (``#`` comments allowed);
``root.<name> = deleted()`` drops the column.  Method names resolve via
a Bloblang-alias table, then the scalar-function registry.
"""

from __future__ import annotations

import re
from typing import Any

from rayflow import expr as E

def _error_col() -> "E.Expr":
    """The ``_error`` column, or all-null when no upstream op ever set
    one — clean pipelines never materialize the column, and ``error()``/
    ``errored()`` must read as null/false there, not raise."""
    import pyarrow as _pa

    def fn(t):
        if "_error" in t.column_names:
            return t.column("_error")
        return _pa.nulls(t.num_rows, _pa.string())

    return E.Expr(fn, "error")


#: sentinel for ``root.x = deleted()``
DELETED = object()

_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+)
  | (?P<comment>\#[^\n]*)
  | (?P<float>\d+\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+)
  | (?P<int>\d+)
  | (?P<str>"(?:[^"\\]|\\.)*"|'(?:[^'\\]|\\.)*')
  | (?P<op>\|\||&&|==|!=|<=|>=|[|<>=+\-*/%!().,@])
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
""", re.VERBOSE)


def _tokenize(src: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise SyntaxError(f"bloblang: bad character {src[pos]!r} at {pos}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        out.append((kind, m.group()))
    out.append(("eof", ""))
    return out


#: Bloblang method name → (registry fn, extra-arg transform).  Methods not
#: listed fall through to the scalar-function registry under their own name.
_METHOD_ALIASES: dict[str, str] = {
    "number": "float64",
    "ceiling": "ceil",
    "re_find_all_matches": "re_match",
    "json": "json_get",
    "json_int": "json_get_int",
    "parse_timestamp": "ts_parse",
    "format_timestamp": "ts_format",
    "ts_unix_seconds": "ts_unix",
    "parse_int": "int64",
    "parse_float": "float64",
    "merge": "struct_merge",
    "without": "struct_without",
    "with": "struct_with",
    "get": "struct_get",
    # array methods under their Bloblang names (receiver = the list)
    "join": "list_join",
    "sum": "list_sum",
    "unique": "list_unique",
    "sort": "list_sort",
    "append": "list_append",
    "any": "list_any",
    "all": "list_all",
    "flatten": "list_flatten",
    "zip": "list_zip",
    "map_each": "list_map",
    "filter": "list_filter",
    "enumerated": "list_enumerated",
    "collapse": "struct_collapse",
    "sort_by": "list_sort_by",
    "find": "list_find",
    "find_all": "list_find_all",
    "exists": "struct_exists",
    "squash": "struct_squash",
}


class _Parser:
    def __init__(self, toks: list[tuple[str, str]]):
        self.toks = toks
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, val: str) -> None:
        kind, v = self.next()
        if v != val:
            raise SyntaxError(f"bloblang: expected {val!r}, got {v!r}")

    # -- precedence climbing ----------------------------------------------
    def expr(self) -> E.Expr:
        return self.pipe()

    def pipe(self) -> E.Expr:
        left = self.or_()
        while self.peek()[1] == "|":
            self.next()
            right = self.or_()
            left = E.F("coalesce", left, right)
        return left

    def or_(self) -> E.Expr:
        left = self.and_()
        while self.peek()[1] == "||":
            self.next()
            left = left | self.and_()
        return left

    def and_(self) -> E.Expr:
        left = self.equality()
        while self.peek()[1] == "&&":
            self.next()
            left = left & self.equality()
        return left

    def equality(self) -> E.Expr:
        left = self.comparison()
        while self.peek()[1] in ("==", "!="):
            op = self.next()[1]
            right = self.comparison()
            left = (left == right) if op == "==" else (left != right)
        return left

    def comparison(self) -> E.Expr:
        left = self.additive()
        while self.peek()[1] in ("<", "<=", ">", ">="):
            op = self.next()[1]
            right = self.additive()
            left = {"<": left.__lt__, "<=": left.__le__,
                    ">": left.__gt__, ">=": left.__ge__}[op](right)
        return left

    def additive(self) -> E.Expr:
        left = self.multiplicative()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            right = self.multiplicative()
            left = left + right if op == "+" else left - right
        return left

    def multiplicative(self) -> E.Expr:
        left = self.unary()
        while self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            right = self.unary()
            left = {"*": left.__mul__, "/": left.__truediv__,
                    "%": left.__mod__}[op](right)
        return left

    def unary(self) -> E.Expr:
        if self.peek()[1] == "!":
            self.next()
            return ~self.unary()
        if self.peek()[1] == "-":
            self.next()
            return E.F("negate", self.unary())
        return self.postfix()

    def postfix(self) -> E.Expr:
        node = self.primary()
        while self.peek()[1] == ".":
            self.next()
            kind, name = self.next()
            if kind != "ident":
                raise SyntaxError(f"bloblang: expected method name, got {name!r}")
            if self.peek()[1] == "(":
                args = self.call_args()
                node = self._method(name, node, args)
            else:
                raise SyntaxError(
                    f"bloblang: bare field access .{name} is only valid on "
                    "'this' (columns are flat; use .json(path) for nested)")
        return node

    def call_args(self) -> list[E.Expr]:
        self.expect("(")
        args: list[E.Expr] = []
        if self.peek()[1] != ")":
            args.append(self.expr())
            while self.peek()[1] == ",":
                self.next()
                args.append(self.expr())
        self.expect(")")
        return args

    @staticmethod
    def _method(name: str, recv: E.Expr, args: list[E.Expr]) -> E.Expr:
        if name == "catch" or name == "or":
            return E.F("coalesce", recv, *args)
        fname = _METHOD_ALIASES.get(name, name)
        if fname not in E._REGISTRY:
            raise SyntaxError(f"bloblang: unknown method .{name}()")
        return E.F(fname, recv, *args)

    def primary(self) -> E.Expr:
        kind, val = self.next()
        if val == "(":
            node = self.expr()
            self.expect(")")
            return node
        if val == "@":
            # metadata read: ``@key`` — metadata lives in ``_meta_*``
            # columns (the columnar analogue of per-message metadata)
            k2, field = self.next()
            if k2 != "ident":
                raise SyntaxError("bloblang: expected key after '@'")
            return E.col(f"_meta_{field}")
        if kind == "int":
            return E.lit(int(val))
        if kind == "float":
            return E.lit(float(val))
        if kind == "str":
            body = val[1:-1]
            return E.lit(re.sub(r"\\(.)", r"\1", body))
        if kind == "ident":
            if val == "this":
                self.expect(".")
                k2, field = self.next()
                if k2 != "ident":
                    raise SyntaxError("bloblang: expected field after 'this.'")
                return E.col(field)
            if val in ("true", "false"):
                return E.lit(val == "true")
            if val == "null":
                return E.lit(None)
            if self.peek()[1] == "(":
                if val == "meta":
                    # meta("key") → the _meta_key column (read side)
                    self.expect("(")
                    k2, s = self.next()
                    if k2 != "str":
                        raise SyntaxError('bloblang: meta("key") takes a '
                                          'string literal')
                    self.expect(")")
                    return E.col(f"_meta_{s[1:-1]}")
                args = self.call_args()
                if val == "error":
                    return _error_col()
                if val == "errored":
                    return E.F("not_null", _error_col())
                if val == "if":
                    if len(args) != 3:
                        raise SyntaxError("bloblang: if(cond, then, else)")
                    return E.when(args[0], args[1], args[2])
                if val == "deleted":
                    return DELETED  # type: ignore[return-value]
                if val in E._REGISTRY:
                    return E.F(val, *args)
                raise SyntaxError(f"bloblang: unknown function {val}()")
            raise SyntaxError(f"bloblang: unexpected identifier {val!r}")
        raise SyntaxError(f"bloblang: unexpected token {val!r}")


def parse_expr(src: str) -> E.Expr:
    """Parse a single Bloblang expression string into an Expr."""
    p = _Parser(_tokenize(src))
    node = p.expr()
    if p.peek()[0] != "eof":
        raise SyntaxError(f"bloblang: trailing input at token {p.peek()[1]!r}")
    return node


_ASSIGN_RE = re.compile(r"^\s*root\.([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.+)$")
_META_ASSIGN_RE = re.compile(r"^\s*meta\s+([A-Za-z_][A-Za-z0-9_]*)\s*=\s*(.+)$")


def parse_program(src: str) -> dict[str, Any]:
    """Parse a mapping program: one ``root.<name> = <expr>`` or
    ``meta <key> = <expr>`` per line (metadata assignments target the
    ``_meta_<key>`` column — read back with ``@key`` / ``meta("key")``).

    Returns an ordered ``{column: Expr | DELETED}`` dict (DELETED marks
    ``deleted()`` assignments — the column is dropped)."""
    out: dict[str, Any] = {}
    for lineno, raw in enumerate(src.splitlines(), 1):
        line = raw.strip()
        if not line or line.startswith("#"):
            continue
        m = _ASSIGN_RE.match(line)
        if not m:
            mm = _META_ASSIGN_RE.match(line)
            if mm:
                name, rhs = f"_meta_{mm.group(1)}", mm.group(2)
                out[name] = parse_expr(rhs)
                continue
            raise SyntaxError(
                f"bloblang line {lineno}: expected 'root.<name> = <expr>', "
                f"got {line!r}")
        name, rhs = m.group(1), m.group(2)
        node = parse_expr(rhs)
        out[name] = DELETED if node is DELETED else node
    return out
