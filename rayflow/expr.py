"""Scalar expression layer — the Bloblang analogue, vectorized.

The reference's per-record expression language (Bloblang: ``⟨upstream:
internal/bloblang/query/⟩`` ~25 functions + ~180 methods over JSON
message trees) is rebuilt as a thin, composable expression tree over
Arrow *columns*: every function is a vectorized kernel
(``pyarrow.compute`` first, numpy/pandas where Arrow lacks one, per-row
Python only for genuinely row-wise ops like cryptographic hashes).

Two entry styles:

- **Python-native**: ``col("a") * 2 + col("b")``, ``col("s").upper()``,
  ``when(col("x") > 3, lit("hi"), lit("lo"))`` — used by library code.
- **Config-native** (the YAML/dict pipeline surface, like a Benthos
  mapping block): s-expressions ``["add", ["col","a"], ["lit",2]]``
  parsed by :func:`parse` — used by :mod:`rayflow.pipeline`.

Evaluation: ``expr.eval(batch)`` with ``batch: pa.Table`` returns a
``pa.ChunkedArray``/``pa.Array`` (or scalar for literals).
"""

from __future__ import annotations

import json
from typing import Any, Callable

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# --------------------------------------------------------------------------
# expression tree
# --------------------------------------------------------------------------


class Expr:
    """A lazily-evaluated column expression."""

    def __init__(self, fn: Callable[[pa.Table], Any], name: str = "expr"):
        self._fn = fn
        self._name = name

    def eval(self, batch: pa.Table):
        return self._fn(batch)

    def __repr__(self):
        return f"<Expr {self._name}>"

    # -- operator sugar ----------------------------------------------------
    def _bin(self, other, kernel, name):
        other = _wrap(other)
        return Expr(lambda t: kernel(_arr(self.eval(t)), _arr(other.eval(t))), name)

    def __add__(self, o):
        # Bloblang `+` concatenates when either side is a string
        # (⟨upstream: internal/bloblang/query/arithmetic.go⟩); numeric
        # add otherwise — dispatched on the evaluated Arrow types
        def add_or_concat(a, b):
            def _is_str(x):
                t = x.type if hasattr(x, "type") else None
                return t is not None and (pa.types.is_string(t)
                                          or pa.types.is_large_string(t))

            if _is_str(a) or _is_str(b):
                def _as_str(x):
                    t = x.type if hasattr(x, "type") else None
                    if t is not None and not (pa.types.is_string(t) or
                                              pa.types.is_large_string(t)):
                        return pc.cast(x, pa.string())
                    return x
                return pc.binary_join_element_wise(_as_str(a), _as_str(b),
                                                   "")
            return pc.add(a, b)

        return self._bin(o, add_or_concat, "add")

    def __sub__(self, o):
        return self._bin(o, pc.subtract, "sub")

    def __mul__(self, o):
        return self._bin(o, pc.multiply, "mul")

    def __truediv__(self, o):
        return self._bin(o, pc.divide, "div")

    def __mod__(self, o):
        # floor-modulo (Python semantics).  Integer inputs use an exact
        # integer path — the float64 floor-division fallback loses
        # precision above 2^53 (large LSNs / ids at 10^10-event scale).
        def _mod(t):
            a, b = _arr(self.eval(t)), _arr(_wrap(o).eval(t))
            ta = a.type if hasattr(a, "type") else None
            tb = b.type if hasattr(b, "type") else None
            if ta is not None and tb is not None and \
                    pa.types.is_integer(ta) and pa.types.is_integer(tb):
                q = pc.divide(a, b)  # integer divide truncates toward zero
                r = pc.subtract(a, pc.multiply(q, b))
                # fix sign so result matches floor semantics: r and b must
                # share sign (or r == 0)
                needs = pc.and_(
                    pc.not_equal(r, 0),
                    pc.not_equal(pc.less(r, 0), pc.less(b, 0)),
                )
                return pc.if_else(needs, pc.add(r, b), r)
            return pc.subtract(a, pc.multiply(_floor_div(a, b), b))

        return Expr(_mod, "mod")

    def __eq__(self, o):  # noqa: A003 - intentional expression semantics
        return self._bin(o, pc.equal, "eq")

    def __ne__(self, o):
        return self._bin(o, pc.not_equal, "ne")

    def __lt__(self, o):
        return self._bin(o, pc.less, "lt")

    def __le__(self, o):
        return self._bin(o, pc.less_equal, "le")

    def __gt__(self, o):
        return self._bin(o, pc.greater, "gt")

    def __ge__(self, o):
        return self._bin(o, pc.greater_equal, "ge")

    def __and__(self, o):
        return self._bin(o, pc.and_kleene, "and")

    def __or__(self, o):
        return self._bin(o, pc.or_kleene, "or")

    def __invert__(self):
        return Expr(lambda t: pc.invert(_arr(self.eval(t))), "not")

    def __hash__(self):
        return id(self)

    # -- method sugar (thin wrappers over the F registry) ------------------
    def method(self, fname: str, *args) -> "Expr":
        return F(fname, self, *args)


def _floor_div(a, b):
    return pc.floor(pc.divide(pc.cast(a, pa.float64()), pc.cast(b, pa.float64())))


def _arr(v):
    """Normalize eval results: leave arrays/chunked arrays/scalars as-is."""
    return v


def col(name: str) -> Expr:
    return Expr(lambda t, n=name: t.column(n), f"col:{name}")


def lit(value: Any) -> Expr:
    return Expr(lambda t, v=value: pa.scalar(v), f"lit:{value!r}")


def _wrap(v) -> Expr:
    return v if isinstance(v, Expr) else lit(v)


def when(cond: Expr, then, otherwise) -> Expr:
    then, otherwise = _wrap(then), _wrap(otherwise)
    return Expr(
        lambda t: pc.if_else(cond.eval(t), then.eval(t), otherwise.eval(t)), "when"
    )


# --------------------------------------------------------------------------
# function registry (the scalar-function surface, SURVEY.md §2.7)
# --------------------------------------------------------------------------

_REGISTRY: dict[str, Callable] = {}


def register_fn(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def F(name: str, *args) -> Expr:
    """Build an expression calling registered function ``name``."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown scalar function: {name!r}")
    fn = _REGISTRY[name]
    exprs = [_wrap(a) for a in args]
    return Expr(lambda t: fn(*[e.eval(t) for e in exprs]), name)


def functions() -> list[str]:
    return sorted(_REGISTRY)


def _np_str(a) -> np.ndarray:
    """Arrow string column → numpy object array (for Python fallbacks)."""
    if isinstance(a, (pa.ChunkedArray, pa.Array)):
        return a.to_numpy(zero_copy_only=False)
    return np.asarray(a)


def _pyfall(fn):
    """Vectorize a per-row Python function over a string column.
    A scalar input (a literal-only expression) maps to a scalar out."""

    def wrapper(a, *rest):
        rest_py = [r.as_py() if isinstance(r, pa.Scalar) else r for r in rest]
        if isinstance(a, pa.Scalar):
            v = a.as_py()
            return pa.scalar(None if v is None else fn(v, *rest_py))
        vals = _np_str(a)
        return pa.array(
            [None if v is None else fn(v, *rest_py) for v in vals]
        )

    return wrapper


# -- string ----------------------------------------------------------------
register_fn("uppercase")(pc.utf8_upper)
register_fn("lowercase")(pc.utf8_lower)
register_fn("capitalize")(pc.utf8_capitalize)
register_fn("title")(pc.utf8_title)
register_fn("trim")(pc.utf8_trim_whitespace)
register_fn("ltrim")(pc.utf8_ltrim_whitespace)
register_fn("rtrim")(pc.utf8_rtrim_whitespace)
register_fn("reverse")(pc.utf8_reverse)
register_fn("length")(pc.utf8_length)


@register_fn("contains")
def _contains(a, pat):
    return pc.match_substring(a, pat.as_py() if isinstance(pat, pa.Scalar) else pat)


@register_fn("has_prefix")
def _has_prefix(a, pat):
    return pc.starts_with(a, pat.as_py() if isinstance(pat, pa.Scalar) else pat)


@register_fn("has_suffix")
def _has_suffix(a, pat):
    return pc.ends_with(a, pat.as_py() if isinstance(pat, pa.Scalar) else pat)


@register_fn("index_of")
def _index_of(a, pat):
    return pc.find_substring(a, pat.as_py() if isinstance(pat, pa.Scalar) else pat)


@register_fn("re_match")
def _re_match(a, pat):
    return pc.match_substring_regex(a, pat.as_py() if isinstance(pat, pa.Scalar) else pat)


@register_fn("re_replace_all")
def _re_replace(a, pat, rep):
    return pc.replace_substring_regex(
        a,
        pat.as_py() if isinstance(pat, pa.Scalar) else pat,
        replacement=rep.as_py() if isinstance(rep, pa.Scalar) else rep,
    )


@register_fn("replace_all")
def _replace_all(a, pat, rep):
    return pc.replace_substring(
        a,
        pat.as_py() if isinstance(pat, pa.Scalar) else pat,
        replacement=rep.as_py() if isinstance(rep, pa.Scalar) else rep,
    )


@register_fn("split")
def _split(a, sep):
    return pc.split_pattern(a, sep.as_py() if isinstance(sep, pa.Scalar) else sep)


@register_fn("slice")
def _slice(a, start, stop):
    s = start.as_py() if isinstance(start, pa.Scalar) else start
    e = stop.as_py() if isinstance(stop, pa.Scalar) else stop
    return pc.utf8_slice_codeunits(a, s, e)


@register_fn("lpad")
def _lpad(a, width, ch):
    return pc.utf8_lpad(a, width.as_py(), padding=ch.as_py())


@register_fn("concat")
def _concat(*arrays):
    return pc.binary_join_element_wise(*arrays, "")


@register_fn("count_substring")
def _count_sub(a, pat):
    return pc.count_substring(a, pat.as_py() if isinstance(pat, pa.Scalar) else pat)


@register_fn("count_substring_regex")
def _count_sub_re(a, pat):
    return pc.count_substring_regex(a, pat.as_py() if isinstance(pat, pa.Scalar) else pat)


# -- number / math ---------------------------------------------------------
register_fn("abs")(pc.abs)
register_fn("ceil")(pc.ceil)
register_fn("floor")(pc.floor)
register_fn("sqrt")(pc.sqrt)
register_fn("exp")(pc.exp)
register_fn("ln")(pc.ln)
register_fn("log10")(pc.log10)
register_fn("negate")(pc.negate)
register_fn("sign")(pc.sign)


@register_fn("round")
def _round(a, nd=None):
    # Bit-exact mirror of SQL round(): scale by 10^n, std::round (half
    # away from zero), divide.  Neither of Arrow's kernels reproduces
    # this — pc.round (any mode) computes via a different scale/divide
    # path and lands one ULP off DuckDB on ~5% of float-sum aggregates,
    # which silently reorders sort-by-value ties in oracle compares.
    n = 0 if nd is None else (nd.as_py() if isinstance(nd, pa.Scalar) else nd)
    arr = a if isinstance(a, (pa.ChunkedArray, pa.Array)) else pa.array(a)
    if pa.types.is_integer(arr.type):
        return arr
    arr64 = pc.cast(arr, pa.float64())
    x = arr64.to_numpy(zero_copy_only=False)  # nulls → NaN
    p = 10.0 ** n
    scaled = x * p
    with np.errstate(invalid="ignore"):
        out = np.where(
            np.abs(scaled) < 2.0 ** 52,
            np.copysign(np.floor(np.abs(scaled) + 0.5), scaled) / p,
            x,  # beyond 2^52 rounding at this precision is identity
        )
    null_mask = pc.is_null(arr64)
    mask_np = null_mask.to_numpy(zero_copy_only=False) if isinstance(
        null_mask, pa.ChunkedArray) else null_mask.to_numpy(zero_copy_only=False)
    return pa.array(out, pa.float64(), mask=mask_np)


@register_fn("min_of")
def _min_of(*arrays):
    return pc.min_element_wise(*arrays)


@register_fn("max_of")
def _max_of(*arrays):
    return pc.max_element_wise(*arrays)


@register_fn("power")
def _power(a, b):
    return pc.power(a, b)


# -- casts / types ---------------------------------------------------------
for _name, _type in [
    ("int64", pa.int64()),
    ("int32", pa.int32()),
    ("float64", pa.float64()),
    ("string", pa.string()),
    ("bool", pa.bool_()),
]:
    # coercion semantics (Bloblang int64()/float64() truncate): unsafe cast
    register_fn(_name)(lambda a, t=_type: pc.cast(a, t, safe=False))

register_fn("is_null")(pc.is_null)
register_fn("not_null")(pc.is_valid)


@register_fn("coalesce")
def _coalesce(*arrays):
    return pc.coalesce(*arrays)


@register_fn("fill_null")
def _fill_null(a, v):
    return pc.fill_null(a, v)


@register_fn("if_else")
def _if_else(c, a, b):
    return pc.if_else(c, a, b)


# -- timestamps ------------------------------------------------------------
register_fn("year")(pc.year)
register_fn("month")(pc.month)
register_fn("day")(pc.day)
register_fn("hour")(pc.hour)
register_fn("minute")(pc.minute)
register_fn("second")(pc.second)
register_fn("day_of_week")(pc.day_of_week)


@register_fn("ts_parse")
def _ts_parse(a, fmt):
    return pc.strptime(a, format=fmt.as_py(), unit="us")


@register_fn("ts_format")
def _ts_format(a, fmt):
    return pc.strftime(a, format=fmt.as_py() if isinstance(fmt, pa.Scalar) else fmt)


@register_fn("ts_unix")
def _ts_unix(a):
    return pc.divide(pc.cast(pc.cast(a, pa.timestamp("us")), pa.int64()), 1_000_000)


@register_fn("ts_unix_micro")
def _ts_unix_micro(a):
    return pc.cast(pc.cast(a, pa.timestamp("us")), pa.int64())


@register_fn("ts_round")
def _ts_round(a, unit):
    u = unit.as_py() if isinstance(unit, pa.Scalar) else unit
    return pc.floor_temporal(a, unit=u)


@register_fn("ts_bucket")
def _ts_bucket(a, seconds):
    """Event-time bucket index: floor(epoch_us / (seconds*1e6)).  The
    window-bucketing primitive (``system_window`` analogue)."""
    s = seconds.as_py() if isinstance(seconds, pa.Scalar) else seconds
    us = pc.cast(pc.cast(a, pa.timestamp("us")), pa.int64())
    return pc.cast(pc.floor(pc.divide(pc.cast(us, pa.float64()), s * 1e6)), pa.int64())


# -- lists -----------------------------------------------------------------
register_fn("list_len")(pc.list_value_length)
register_fn("list_flatten")(pc.list_flatten)


@register_fn("list_join")
def _list_join(a, sep):
    return pc.binary_join(a, sep)


@register_fn("list_get")
def _list_get(a, i):
    return pc.list_element(a, i.as_py() if isinstance(i, pa.Scalar) else i)


# -- encode / hash (per-row Python; used for keys/fingerprints, not hot paths)
import base64 as _b64
import hashlib as _hl
import zlib as _zl

register_fn("hash_md5")(_pyfall(lambda s: _hl.md5(s.encode()).hexdigest()))
register_fn("hash_sha1")(_pyfall(lambda s: _hl.sha1(s.encode()).hexdigest()))
register_fn("hash_sha256")(_pyfall(lambda s: _hl.sha256(s.encode()).hexdigest()))
register_fn("hash_crc32")(_pyfall(lambda s: _zl.crc32(s.encode())))
register_fn("encode_base64")(_pyfall(lambda s: _b64.b64encode(s.encode()).decode()))
register_fn("decode_base64")(_pyfall(lambda s: _b64.b64decode(s).decode()))
register_fn("encode_hex")(_pyfall(lambda s: s.encode().hex()))


# -- parse / format --------------------------------------------------------
@register_fn("json_get")
def _json_get(a, key):
    """Extract one key from a JSON-string column (``jq``/``json(path)``
    analogue).  Per-batch Python over parsed docs; returns strings (or
    null for missing keys / parse failures)."""
    k = key.as_py() if isinstance(key, pa.Scalar) else key
    out = []
    for v in _np_str(a):
        if v is None:
            out.append(None)
            continue
        try:
            d = json.loads(v)
            got = d.get(k) if isinstance(d, dict) else None
            out.append(None if got is None else str(got))
        except (json.JSONDecodeError, TypeError):
            out.append(None)
    return pa.array(out, type=pa.string())


@register_fn("json_get_int")
def _json_get_int(a, key):
    k = key.as_py() if isinstance(key, pa.Scalar) else key
    out = []
    for v in _np_str(a):
        if v is None:
            out.append(None)
            continue
        try:
            d = json.loads(v)
            got = d.get(k) if isinstance(d, dict) else None
            out.append(int(got) if got is not None else None)
        except (json.JSONDecodeError, TypeError, ValueError):
            out.append(None)
    return pa.array(out, type=pa.int64())


@register_fn("format_json")
def _format_json(a):
    return _pyfall(lambda s: json.dumps(s))(a)


def _parse_path(path: str) -> list[str | int]:
    """``a.b[0].c`` → ['a', 'b', 0, 'c'] (dotted keys + [idx] list
    indexing; also accepts bare numeric segments ``a.0.c``)."""
    segs: list[str | int] = []
    for part in path.split("."):
        while part:
            m = _re.match(r"^([^\[\]]+)", part)
            if m:
                key = m.group(1)
                segs.append(int(key) if key.lstrip("-").isdigit() else key)
                part = part[m.end():]
                continue
            m = _re.match(r"^\[(-?\d+)\]", part)
            if m:
                segs.append(int(m.group(1)))
                part = part[m.end():]
                continue
            raise ValueError(f"bad JSON path segment: {part!r}")
    return segs


def _walk(doc, segs):
    for s in segs:
        if doc is None:
            return None
        if isinstance(s, int):
            if not isinstance(doc, list) or not (-len(doc) <= s < len(doc)):
                return None
            doc = doc[s]
        else:
            if not isinstance(doc, dict):
                return None
            doc = doc.get(s)
    return doc


def _json_path_impl(a, path, conv):
    p = path.as_py() if isinstance(path, pa.Scalar) else path
    segs = _parse_path(p)
    out = []
    for v in _np_str(a):
        if v is None:
            out.append(None)
            continue
        try:
            got = _walk(json.loads(v), segs)
        except (json.JSONDecodeError, TypeError):
            got = None
        out.append(None if got is None else conv(got))
    return out


@register_fn("json_path")
def _json_path(a, path):
    """Nested JSON path extraction (``jq``-style ``a.b[0].c``) over a
    JSON-string column; non-scalar results are re-serialized as JSON."""
    def conv(v):
        return v if isinstance(v, str) else (
            json.dumps(v) if isinstance(v, (dict, list)) else str(v))
    return pa.array(_json_path_impl(a, path, conv), type=pa.string())


@register_fn("json_path_int")
def _json_path_int(a, path):
    def conv(v):
        return int(v)
    try:
        return pa.array(_json_path_impl(a, path, conv), type=pa.int64())
    except (ValueError, TypeError):
        return pa.array(_json_path_impl(
            a, path, lambda v: int(v) if not isinstance(v, (dict, list)) else None,
        ), type=pa.int64())


@register_fn("json_path_float")
def _json_path_float(a, path):
    return pa.array(
        _json_path_impl(
            a, path,
            lambda v: float(v) if not isinstance(v, (dict, list)) else None),
        type=pa.float64())


# -- URL / misc parse methods (Bloblang parse_url / parse_query_string) ----


@register_fn("url_host")
def _url_host(a):
    from urllib.parse import urlparse

    return _pyfall(lambda s: urlparse(s).netloc or None)(a)


@register_fn("url_path")
def _url_path(a):
    from urllib.parse import urlparse

    return _pyfall(lambda s: urlparse(s).path or None)(a)


@register_fn("url_scheme")
def _url_scheme(a):
    from urllib.parse import urlparse

    return _pyfall(lambda s: urlparse(s).scheme or None)(a)


@register_fn("url_query_param")
def _url_query_param(a, key):
    from urllib.parse import parse_qs, urlparse

    k = key.as_py() if isinstance(key, pa.Scalar) else key

    def one(s):
        vals = parse_qs(urlparse(s).query).get(k)
        return vals[0] if vals else None

    return _pyfall(one)(a)


@register_fn("uuid_v5")
def _uuid_v5(a, namespace=None):
    """Deterministic name-based UUID (the one UUID variant compatible
    with the engine's determinism rule — v4 is excluded by design)."""
    import uuid as _uuid

    ns = _uuid.NAMESPACE_URL
    if namespace is not None:
        ns_s = namespace.as_py() if isinstance(namespace, pa.Scalar) else namespace
        ns = _uuid.uuid5(_uuid.NAMESPACE_URL, ns_s)
    return _pyfall(lambda s: str(_uuid.uuid5(ns, s)))(a)


# -- struct/map methods (Bloblang object methods over parse_json output) ---


def _as_struct(a) -> pa.StructArray:
    arr = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    if not pa.types.is_struct(arr.type):
        raise TypeError(f"expected struct column, got {arr.type}")
    return arr


@register_fn("struct_get")
def _struct_get(a, name):
    return pc.struct_field(a, name.as_py() if isinstance(name, pa.Scalar) else name)


def _struct_rebuild(arr: pa.StructArray, fields: list[tuple[str, pa.Array]]):
    names = [n for n, _ in fields]
    children = [c for _, c in fields]
    return pa.StructArray.from_arrays(
        children, names=names,
        mask=pc.is_null(arr) if arr.null_count else None)


@register_fn("struct_without")
def _struct_without(a, *keys):
    """Bloblang ``without``: drop the named fields from a struct."""
    arr = _as_struct(a)
    drop = {k.as_py() if isinstance(k, pa.Scalar) else k for k in keys}
    fields = [(f.name, pc.struct_field(arr, f.name))
              for f in arr.type if f.name not in drop]
    return _struct_rebuild(arr, fields)


@register_fn("struct_with")
def _struct_with(a, *keys):
    """Bloblang ``with``: keep only the named fields."""
    arr = _as_struct(a)
    keep = [k.as_py() if isinstance(k, pa.Scalar) else k for k in keys]
    names = {f.name for f in arr.type}
    fields = [(k, pc.struct_field(arr, k)) for k in keep if k in names]
    return _struct_rebuild(arr, fields)


@register_fn("struct_merge")
def _struct_merge(a, b):
    """Bloblang ``merge``: combine two struct columns field-wise; the
    right side wins on name collisions (per-field, vectorized — null
    right rows fall back to the left value via coalesce)."""
    left, right = _as_struct(a), _as_struct(b)
    fields: dict[str, pa.Array] = {
        f.name: pc.struct_field(left, f.name) for f in left.type
    }
    for f in right.type:
        rcol = pc.struct_field(right, f.name)
        if f.name in fields and fields[f.name].type == rcol.type:
            fields[f.name] = pc.coalesce(rcol, fields[f.name])
        else:
            fields[f.name] = rcol
    return _struct_rebuild(left, list(fields.items()))


@register_fn("map_each_key")
def _map_each_key(a, fn_name):
    """Bloblang ``map_each_key``: rename every struct field by applying
    a registered scalar string function (e.g. ``uppercase``) to the key
    names.  Keys are metadata — the transform runs once per field, not
    per row."""
    arr = _as_struct(a)
    f = fn_name.as_py() if isinstance(fn_name, pa.Scalar) else fn_name
    kernel = _REGISTRY[f]
    old = [fld.name for fld in arr.type]
    new = kernel(pa.array(old, pa.string())).to_pylist()
    fields = [(n, pc.struct_field(arr, o)) for o, n in zip(old, new)]
    return _struct_rebuild(arr, fields)


# --------------------------------------------------------------------------
# s-expression parser (config surface)
# --------------------------------------------------------------------------


def parse(sexpr) -> Expr:
    """Parse the config s-expression form into an :class:`Expr`.

    ``["col", "a"]`` · ``["lit", 2]`` · ``["add", X, Y]`` ·
    ``["when", C, A, B]`` · any registered function name with args.
    Bare scalars are literals.
    """
    if not isinstance(sexpr, (list, tuple)):
        return lit(sexpr)
    head, *rest = sexpr
    if head == "col":
        return col(rest[0])
    if head == "lit":
        return lit(rest[0])
    if head == "when":
        return when(parse(rest[0]), parse(rest[1]), parse(rest[2]))
    args = [parse(r) for r in rest]
    binops = {
        "add": Expr.__add__, "sub": Expr.__sub__, "mul": Expr.__mul__,
        "div": Expr.__truediv__, "mod": Expr.__mod__, "eq": Expr.__eq__,
        "ne": Expr.__ne__, "lt": Expr.__lt__, "le": Expr.__le__,
        "gt": Expr.__gt__, "ge": Expr.__ge__, "and": Expr.__and__,
        "or": Expr.__or__,
    }
    if head in binops:
        e = args[0]
        for other in args[1:]:
            e = binops[head](e, other)
        return e
    if head == "not":
        return ~args[0]
    return F(head, *args)


# -- additional Bloblang-name string methods -------------------------------
import re as _re


@register_fn("slug")
def _slug(a):
    def one(s):
        s = _re.sub(r"[^a-z0-9]+", "-", s.lower()).strip("-")
        return s

    return _pyfall(one)(a)


@register_fn("strip_html")
def _strip_html(a):
    return pc.replace_substring_regex(a, "<[^>]*>", replacement="")


@register_fn("quote")
def _quote(a):
    return _pyfall(lambda s: json.dumps(s))(a)


@register_fn("unquote")
def _unquote(a):
    return _pyfall(lambda s: json.loads(s))(a)


@register_fn("repeat_str")
def _repeat_str(a, n):
    nn = n.as_py() if isinstance(n, pa.Scalar) else n
    return _pyfall(lambda s: s * nn)(a)


@register_fn("parse_int")
def _parse_int(a):
    return pc.cast(a, pa.int64(), safe=False)


@register_fn("parse_float")
def _parse_float(a):
    return pc.cast(a, pa.float64(), safe=False)


# -- list aggregation methods (Bloblang array folds: sum/min/max/contains) --
def _list_segments(a):
    arr = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    flat = pc.list_flatten(arr)
    lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
    return arr, flat, lens


def _list_reduce(a, ufunc, empty_val):
    arr, flat, lens = _list_segments(a)
    vals = flat.to_numpy(zero_copy_only=False)
    n = len(arr)
    out = np.full(n, np.nan, dtype=np.float64)
    valid = ~np.isnan(lens.astype(np.float64))
    lens_i = np.nan_to_num(lens.astype(np.float64), nan=0).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(lens_i)))[:-1]
    nonempty = valid & (lens_i > 0)
    if nonempty.any():
        red = ufunc.reduceat(vals.astype(np.float64), offsets[nonempty])
        out[nonempty] = red
    out[valid & (lens_i == 0)] = empty_val
    return pa.array([None if np.isnan(v) else v for v in out], pa.float64())


@register_fn("list_sum")
def _list_sum(a):
    return _list_reduce(a, np.add, 0.0)


@register_fn("list_min")
def _list_min(a):
    return _list_reduce(a, np.minimum, np.nan)


@register_fn("list_max")
def _list_max(a):
    return _list_reduce(a, np.maximum, np.nan)


@register_fn("list_contains")
def _list_contains(a, v):
    val = v.as_py() if isinstance(v, pa.Scalar) else v
    arr = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    return pa.array([None if x is None else (val in x) for x in arr.to_pylist()])


def _list_arr(a) -> pa.ListArray:
    arr = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    return arr


def _rebuild_list(arr: pa.ListArray, flat: pa.Array) -> pa.ListArray:
    """Re-wrap a transformed flat child under the original offsets."""
    offsets = pc.list_value_length(arr)
    lens = pc.fill_null(offsets, 0).to_numpy(zero_copy_only=False)
    offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
    return pa.ListArray.from_arrays(
        pa.array(offs, pa.int32()), flat,
        mask=pc.is_null(arr) if arr.null_count else None)


@register_fn("list_map")
def _list_map(a, fn_name, *extra):
    """Bloblang ``map_each`` with a REGISTERED scalar function as the
    lambda: flatten once, run the vectorized kernel over the flat child,
    re-wrap under the original offsets — no per-row Python."""
    arr = _list_arr(a)
    f = fn_name.as_py() if isinstance(fn_name, pa.Scalar) else fn_name
    flat = pc.list_flatten(arr)
    out = _REGISTRY[f](flat, *extra)
    if isinstance(out, pa.ChunkedArray):
        out = out.combine_chunks()
    return _rebuild_list(arr, out)


@register_fn("list_filter")
def _list_filter(a, fn_name, *extra):
    """Bloblang ``filter`` with a registered boolean scalar function:
    flatten, evaluate the mask vectorized, rebuild with per-row kept
    counts (cumulative-sum offsets)."""
    arr = _list_arr(a)
    f = fn_name.as_py() if isinstance(fn_name, pa.Scalar) else fn_name
    flat = pc.list_flatten(arr)
    mask = _REGISTRY[f](flat, *extra)
    if isinstance(mask, pa.ChunkedArray):
        mask = mask.combine_chunks()
    if not pa.types.is_boolean(mask.type):
        # value-returning predicates (e.g. ``not_empty``): non-null = keep
        mask = pc.is_valid(mask)
    mask = pc.fill_null(mask, False)
    kept = flat.filter(mask)
    # per-row kept counts: segment-sum the mask under the original offsets
    lens = pc.fill_null(pc.list_value_length(arr), 0).to_numpy(zero_copy_only=False)
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    m = mask.to_numpy(zero_copy_only=False).astype(np.int64)
    # reduceat only over non-empty segments: a trailing empty row would put
    # a start offset == len(m), which raises IndexError in np.add.reduceat
    kept_lens = np.zeros(len(lens), np.int64)
    nonempty = lens > 0
    if len(m) and nonempty.any():
        kept_lens[nonempty] = np.add.reduceat(m, starts[nonempty])
    offs = np.concatenate(([0], np.cumsum(kept_lens))).astype(np.int32)
    return pa.ListArray.from_arrays(
        pa.array(offs, pa.int32()), kept,
        mask=pc.is_null(arr) if arr.null_count else None)


@register_fn("list_unique")
def _list_unique(a):
    arr = _list_arr(a)
    out = [None if x is None else sorted(set(x), key=lambda v: (v is None, v))
           for x in arr.to_pylist()]
    return pa.array(out, type=arr.type)


@register_fn("list_sort")
def _list_sort(a, descending=False):
    d = descending.as_py() if isinstance(descending, pa.Scalar) else descending
    arr = _list_arr(a)
    out = [None if x is None else
           sorted((v for v in x if v is not None), reverse=bool(d))
           + [None] * sum(v is None for v in x)
           for x in arr.to_pylist()]
    return pa.array(out, type=arr.type)


@register_fn("list_slice")
def _list_slice(a, start, stop):
    s = start.as_py() if isinstance(start, pa.Scalar) else start
    e = stop.as_py() if isinstance(stop, pa.Scalar) else stop
    return pc.list_slice(a, s, e)


# -- extra hashes / encodings ----------------------------------------------
register_fn("hash_sha512")(_pyfall(lambda s: _hl.sha512(s.encode()).hexdigest()))
register_fn("encode_base64url")(
    _pyfall(lambda s: _b64.urlsafe_b64encode(s.encode()).decode()))
register_fn("decode_base64url")(
    _pyfall(lambda s: _b64.urlsafe_b64decode(s).decode()))


@register_fn("hash_hmac_sha256")
def _hmac_sha256(a, key):
    import hmac as _hmac

    k = (key.as_py() if isinstance(key, pa.Scalar) else key).encode()
    return _pyfall(
        lambda s: _hmac.new(k, s.encode(), _hl.sha256).hexdigest())(a)


@register_fn("escape_url_query")
def _escape_url_query(a):
    from urllib.parse import quote_plus

    return _pyfall(quote_plus)(a)


@register_fn("unescape_url_query")
def _unescape_url_query(a):
    from urllib.parse import unquote_plus

    return _pyfall(unquote_plus)(a)


# -- type/flow helpers ------------------------------------------------------


@register_fn("type_name")
def _type_name(a):
    """Bloblang ``type()``: per-column Arrow type as a constant string
    column (columnar model: every row of a column shares one type)."""
    arr = a if isinstance(a, (pa.ChunkedArray, pa.Array)) else pa.array(a)
    return pa.array([str(arr.type)] * len(arr), pa.string())


@register_fn("not_empty")
def _not_empty(a):
    """Null out empty strings/lists (Bloblang ``not_empty`` feeding a
    ``| fallback`` coalesce)."""
    arr = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        empty = pc.equal(pc.utf8_length(arr), 0)
    elif pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        empty = pc.equal(pc.list_value_length(arr), 0)
    else:
        return arr
    return pc.if_else(pc.fill_null(empty, False), pa.nulls(len(arr), arr.type), arr)


# -- round-2 surface widening: string/encoding/duration/timestamp/list ------
# Bloblang method names follow the reference's public docs (⟨upstream:
# internal/bloblang/query/methods*.go⟩); bodies are Arrow kernels where
# one exists, _pyfall otherwise (matching quote/slug above).


@register_fn("trim_prefix")
def _trim_prefix(a, pre):
    p = pre.as_py() if isinstance(pre, pa.Scalar) else pre
    arr = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    has = pc.starts_with(arr, p)
    cut = pc.utf8_slice_codeunits(arr, len(p), 2**31 - 1)
    return pc.if_else(has, cut, arr)


@register_fn("trim_suffix")
def _trim_suffix(a, suf):
    s = suf.as_py() if isinstance(suf, pa.Scalar) else suf
    arr = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    has = pc.ends_with(arr, s)
    # slice stop must be per-row: reverse, cut len(s) from the front,
    # reverse back
    cut = pc.utf8_reverse(
        pc.utf8_slice_codeunits(pc.utf8_reverse(arr), len(s), 2**31 - 1))
    return pc.if_else(has, cut, arr)


@register_fn("rpad")
def _rpad(a, width, ch):
    return pc.utf8_rpad(a, width.as_py(), padding=ch.as_py())


@register_fn("escape_html")
def _escape_html(a):
    import html as _html

    return _pyfall(lambda s: _html.escape(s))(a)


@register_fn("unescape_html")
def _unescape_html(a):
    import html as _html

    return _pyfall(_html.unescape)(a)


@register_fn("filepath_join")
def _filepath_join(*arrays):
    return pc.binary_join_element_wise(*arrays, "/")


@register_fn("filepath_split")
def _filepath_split(a):
    return pc.split_pattern(a, "/")


register_fn("decode_hex")(_pyfall(lambda s: bytes.fromhex(s).decode()))
register_fn("encode_base32")(
    _pyfall(lambda s: _b64.b32encode(s.encode()).decode()))
register_fn("decode_base32")(
    _pyfall(lambda s: _b64.b32decode(s).decode()))
register_fn("encode_ascii85")(
    _pyfall(lambda s: _b64.a85encode(s.encode()).decode()))
register_fn("decode_ascii85")(
    _pyfall(lambda s: _b64.a85decode(s).decode()))


_DUR_RE = _re.compile(r"(\d+(?:\.\d+)?)(ns|us|µs|ms|s|m|h)")
_DUR_NS = {"ns": 1, "us": 1_000, "µs": 1_000, "ms": 1_000_000,
           "s": 1_000_000_000, "m": 60_000_000_000, "h": 3_600_000_000_000}


@register_fn("parse_duration")
def _parse_duration(a):
    """Go-style duration string ("1h30m10s") → integer nanoseconds,
    the reference's parse_duration contract."""

    def one(s):
        total = 0.0
        matched = False
        for m in _DUR_RE.finditer(s):
            matched = True
            total += float(m.group(1)) * _DUR_NS[m.group(2)]
        if not matched:
            raise ValueError(f"invalid duration {s!r}")
        return int(total)

    if isinstance(a, pa.Scalar):
        v = a.as_py()
        return pa.scalar(None if v is None else one(v), pa.int64())
    arr = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    return pa.array([None if v is None else one(v) for v in arr.to_pylist()],
                    pa.int64())


_ISO_DUR_RE = _re.compile(
    r"^P(?:(\d+)D)?(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?$")


@register_fn("parse_duration_iso8601")
def _parse_duration_iso(a):
    """ISO-8601 duration ("PT1H30M") → integer nanoseconds (days and
    smaller only — months/years are calendar-dependent, as in the
    reference)."""

    def one(s):
        m = _ISO_DUR_RE.match(s)
        if not m or not any(m.groups()):
            raise ValueError(f"invalid ISO-8601 duration {s!r}")
        d, h, mi, sec = (float(g) if g else 0.0 for g in m.groups())
        return int(((d * 24 + h) * 60 + mi) * 60 * 1e9 + sec * 1e9)

    if isinstance(a, pa.Scalar):
        v = a.as_py()
        return pa.scalar(None if v is None else one(v), pa.int64())
    arr = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    return pa.array([None if v is None else one(v) for v in arr.to_pylist()],
                    pa.int64())


# -- timestamp arithmetic (reference: ts_add_iso8601 / ts_sub_iso8601 over
#    durations; here seconds-typed, composing with parse_duration/1e9) -----


@register_fn("ts_add")
def _ts_add(a, seconds):
    s = seconds.as_py() if isinstance(seconds, pa.Scalar) else seconds
    us = pc.cast(pc.cast(a, pa.timestamp("us")), pa.int64())
    return pc.cast(pc.add(us, int(s * 1_000_000)), pa.timestamp("us"))


@register_fn("ts_sub")
def _ts_sub(a, seconds):
    s = seconds.as_py() if isinstance(seconds, pa.Scalar) else seconds
    us = pc.cast(pc.cast(a, pa.timestamp("us")), pa.int64())
    return pc.cast(pc.subtract(us, int(s * 1_000_000)), pa.timestamp("us"))


@register_fn("ts_diff")
def _ts_diff(a, b):
    """Elapsed seconds a - b as float64."""
    ua = pc.cast(pc.cast(a, pa.timestamp("us")), pa.int64())
    ub = pc.cast(pc.cast(b, pa.timestamp("us")), pa.int64())
    return pc.divide(pc.cast(pc.subtract(ua, ub), pa.float64()), 1_000_000.0)


@register_fn("ts_unix_milli")
def _ts_unix_milli(a):
    return pc.divide(pc.cast(pc.cast(a, pa.timestamp("us")), pa.int64()), 1_000)


@register_fn("ts_unix_nano")
def _ts_unix_nano(a):
    return pc.multiply(pc.cast(pc.cast(a, pa.timestamp("us")), pa.int64()), 1_000)


# strftime/strptime are the reference's older aliases of format/parse
register_fn("ts_strftime")(_ts_format)
register_fn("ts_strptime")(_ts_parse)


@register_fn("clamp")
def _clamp(a, lo, hi):
    return pc.min_element_wise(pc.max_element_wise(a, lo), hi)


register_fn("log2")(pc.log2)


@register_fn("format_number")
def _format_number(a, decimals=None):
    """Human formatting: thousands separators + fixed decimals."""
    nd = 0 if decimals is None else (
        decimals.as_py() if isinstance(decimals, pa.Scalar) else decimals)
    arr = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    return pa.array(
        [None if v is None else format(v, f",.{nd}f") for v in arr.to_pylist()],
        pa.string())


# -- more list (array) methods ---------------------------------------------


@register_fn("list_reverse")
def _list_reverse(a):
    """Reverse each list element-wise: one vectorized gather — for row
    segments [start, end), flat index i maps to end-1-(i-start)."""
    arr = _list_arr(a)
    flat = pc.list_flatten(arr)
    lens = pc.fill_null(pc.list_value_length(arr), 0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(lens)))
    pos = np.arange(offs[-1], dtype=np.int64)
    seg_start = np.repeat(offs[:-1], lens)
    seg_end = np.repeat(offs[1:], lens)
    rev = (seg_end - 1) - (pos - seg_start)
    taken = flat.take(pa.array(rev, pa.int64())) if len(rev) else flat
    return _rebuild_list(arr, taken)


def _intra(lens: np.ndarray) -> np.ndarray:
    """0..len-1 within each run: [2,0,3] → [0,1, 0,1,2]."""
    total = int(lens.sum())
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    return np.arange(total, dtype=np.int64) - np.repeat(starts, lens)


@register_fn("list_concat")
def _list_concat(a, b):
    """Element-wise list concatenation (Bloblang ``concat``/``append``):
    one gather each side, interleaved by per-row lengths.  A row where
    EITHER input list is null is null (and contributes no elements —
    null offsets would silently shift neighbors' boundaries)."""
    aa, bb = _list_arr(a), _list_arr(b)
    fa, fb = pc.list_flatten(aa), pc.list_flatten(bb)
    la = pc.fill_null(pc.list_value_length(aa), 0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    lb = pc.fill_null(pc.list_value_length(bb), 0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    null_row = (pc.is_null(aa).to_numpy(zero_copy_only=False)
                | pc.is_null(bb).to_numpy(zero_copy_only=False))
    # fa/fb hold the elements of each side's NON-null rows (la/lb
    # describe that layout); a row nulled by the other side keeps its
    # elements in flat but must contribute none to the output
    la_eff = np.where(null_row, 0, la)
    lb_eff = np.where(null_row, 0, lb)
    oa = np.concatenate(([0], np.cumsum(la)))[:-1]
    ob = np.concatenate(([0], np.cumsum(lb)))[:-1]
    src_a = np.repeat(oa, la_eff) + _intra(la_eff)
    src_b = np.repeat(ob, lb_eff) + _intra(lb_eff) + int(la.sum())
    out_off = np.concatenate(([0], np.cumsum(la_eff + lb_eff)))
    a_dst = np.repeat(out_off[:-1], la_eff) + _intra(la_eff)
    b_dst = np.repeat(out_off[:-1] + la_eff, lb_eff) + _intra(lb_eff)
    order = np.empty(out_off[-1], dtype=np.int64)
    order[a_dst] = src_a
    order[b_dst] = src_b
    flat_all = pa.concat_arrays([
        fa.combine_chunks() if isinstance(fa, pa.ChunkedArray) else fa,
        fb.combine_chunks() if isinstance(fb, pa.ChunkedArray) else fb])
    taken = flat_all.take(pa.array(order, pa.int64()))
    return pa.ListArray.from_arrays(
        pa.array(out_off.astype(np.int32), pa.int32()), taken,
        mask=pa.array(null_row) if null_row.any() else None)


def _list_bool_fold(a, ufunc, empty_val):
    arr = _list_arr(a)
    flat = pc.list_flatten(arr)
    flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
    # null ELEMENTS are skipped (SQL aggregate semantics — the previous
    # numpy cast made nulls type-dependent: NaN→True in float lists,
    # False in bool lists): any() masks them False, all() masks True.
    # truthiness per type: bool as-is, numbers != 0, strings non-empty
    # (a bool CAST would try to parse strings and crash on "abc")
    elem_valid = pc.is_valid(flat).to_numpy(zero_copy_only=False)
    ft = flat.type
    if pa.types.is_boolean(ft):
        truthy = pc.fill_null(flat, False)
    elif pa.types.is_string(ft) or pa.types.is_large_string(ft):
        truthy = pc.greater(pc.fill_null(pc.utf8_length(flat), 0), 0)
    else:
        truthy = pc.fill_null(pc.not_equal(flat, 0), False)
    raw = pc.fill_null(truthy, False) \
        .to_numpy(zero_copy_only=False).astype(bool)
    vals = (raw & elem_valid) if ufunc is np.logical_or \
        else (raw | ~elem_valid)
    lens = pc.list_value_length(arr).to_numpy(zero_copy_only=False)
    valid = ~np.isnan(lens.astype(np.float64))
    lens_i = np.nan_to_num(lens.astype(np.float64), nan=0).astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(lens_i)))[:-1]
    out = np.full(len(arr), empty_val, dtype=bool)
    nonempty = valid & (lens_i > 0)
    if nonempty.any():
        out[nonempty] = ufunc.reduceat(vals, offs[nonempty])
    return pa.array(
        [None if not valid[i] else bool(out[i]) for i in range(len(arr))],
        pa.bool_())


@register_fn("list_any")
def _list_any(a):
    return _list_bool_fold(a, np.logical_or, False)


@register_fn("list_all")
def _list_all(a):
    return _list_bool_fold(a, np.logical_and, True)


@register_fn("list_index_of")
def _list_index_of(a, v):
    """First index of ``v`` in each list, -1 if absent."""
    val = v.as_py() if isinstance(v, pa.Scalar) else v
    arr = _list_arr(a)
    out = []
    for x in arr.to_pylist():
        if x is None:
            out.append(None)
        else:
            out.append(x.index(val) if val in x else -1)
    return pa.array(out, pa.int64())


@register_fn("struct_keys")
def _struct_keys(a):
    """Bloblang ``keys()``: field names of a struct column (constant
    per row — columnar structs share one schema)."""
    arr = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    names = [f.name for f in arr.type]
    return pa.array([names] * len(arr), pa.list_(pa.string()))


@register_fn("struct_values")
def _struct_values(a):
    """Bloblang ``values()``: struct field values as a list column
    (fields cast to string for a uniform element type)."""
    arr = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    cols = [pc.cast(arr.field(i), pa.string(), safe=False)
            for i in range(arr.type.num_fields)]
    n = len(arr)
    vals = [[None if (c[i].as_py() is None) else c[i].as_py() for c in cols]
            for i in range(n)]
    return pa.array(vals, pa.list_(pa.string()))


# -- unicode / text-cleaning methods ---------------------------------------
import unicodedata as _ud


register_fn("normalize_nfc")(_pyfall(lambda s: _ud.normalize("NFC", s)))
register_fn("normalize_nfkc")(_pyfall(lambda s: _ud.normalize("NFKC", s)))
register_fn("normalize_nfd")(_pyfall(lambda s: _ud.normalize("NFD", s)))


@register_fn("remove_control_chars")
def _remove_control_chars(a):
    """Strip C0/C1 control characters except tab/newline/CR (the
    standard corpus-cleaning pass)."""
    return pc.replace_substring_regex(
        a, "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", replacement="")


@register_fn("collapse_whitespace")
def _collapse_whitespace(a):
    """Runs of whitespace → one space, trimmed (C4-style cleanup)."""
    return pc.utf8_trim_whitespace(
        pc.replace_substring_regex(a, r"\s+", replacement=" "))


# -- final parity batch: yaml, list builders, extra casts -------------------


@register_fn("parse_yaml")
def _parse_yaml(a):
    """YAML document string → struct/value column (the reference's
    parse_yaml; PyYAML safe_load per row — YAML has no Arrow kernel)."""
    import yaml as _yaml

    return _pyfall(lambda s: _yaml.safe_load(s))(a)


@register_fn("format_yaml")
def _format_yaml(a):
    import yaml as _yaml

    arr = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    return pa.array(
        [None if v is None else _yaml.safe_dump(v, default_flow_style=True).strip()
         for v in arr.to_pylist()],
        pa.string())


@register_fn("list_append")
def _list_append(a, v):
    """Append a scalar to every list (Bloblang ``append``): reuses the
    element-wise list_concat against a constant one-element list."""
    val = v.as_py() if isinstance(v, pa.Scalar) else v
    arr = _list_arr(a)
    ones = pa.array([[val]] * len(arr), arr.type)
    return _list_concat(arr, ones)


@register_fn("list_zip")
def _list_zip(a, b):
    """Element-wise zip of two list columns → list of 2-field structs
    (pairs truncated to the shorter list, Python-zip semantics)."""
    aa, bb = _list_arr(a), _list_arr(b)
    out = []
    for x, y in zip(aa.to_pylist(), bb.to_pylist()):
        if x is None or y is None:
            out.append(None)
        else:
            out.append([{"left": l, "right": r} for l, r in zip(x, y)])
    return pa.array(out)


for _name, _type in [
    ("int16", pa.int16()),
    ("int8", pa.int8()),
    ("uint8", pa.uint8()),
    ("uint16", pa.uint16()),
    ("uint32", pa.uint32()),
    ("uint64", pa.uint64()),
]:
    register_fn(_name)(lambda a, t=_type: pc.cast(a, t, safe=False))

register_fn("round_down")(pc.floor)
register_fn("round_up")(pc.ceil)


# -- timezone + URL struct --------------------------------------------------


@register_fn("ts_assume_tz")
def _ts_assume_tz(a, tz):
    """Stamp a naive timestamp as being in ``tz`` (reference: ts_tz
    family).  Returns an aware (tz-annotated) timestamp column."""
    z = tz.as_py() if isinstance(tz, pa.Scalar) else tz
    return pc.assume_timezone(a, z)


@register_fn("ts_to_tz")
def _ts_to_tz(a, tz):
    """Convert an aware timestamp to another zone's WALL-CLOCK time,
    returned naive (instant-preserving projection)."""
    z = tz.as_py() if isinstance(tz, pa.Scalar) else tz
    arr = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    if arr.type.tz is None:
        arr = pc.assume_timezone(arr, "UTC")
    shifted = pc.cast(arr, pa.timestamp(arr.type.unit, z))
    return pc.local_timestamp(shifted)


@register_fn("parse_url")
def _parse_url(a):
    """Full URL decomposition → struct {scheme, host, port, path,
    query, fragment} (stdlib urlsplit per row; the single-field
    url_host/url_path/url_scheme/url_query_param fns remain the
    vectorizable fast paths)."""
    from urllib.parse import urlsplit

    def one(s):
        try:
            u = urlsplit(s)
            return {"scheme": u.scheme or None, "host": u.hostname,
                    "port": u.port, "path": u.path or None,
                    "query": u.query or None, "fragment": u.fragment or None}
        except ValueError:
            # malformed URL (bad port / invalid IPv6): null, don't kill
            # the batch — the grok/parse_json convention
            return None

    return _pyfall(one)(a)


# -- polymorphic string/list dispatch ---------------------------------------
# Bloblang's reverse()/length()/contains() work on strings AND arrays;
# re-register them with a type switch so the text syntax matches.


def _is_list_type(a) -> bool:
    t = a.type if isinstance(a, (pa.Array, pa.ChunkedArray)) else None
    return t is not None and (pa.types.is_list(t) or pa.types.is_large_list(t))


_utf8_reverse, _utf8_length = pc.utf8_reverse, pc.utf8_length


@register_fn("reverse")
def _reverse_poly(a):
    return _list_reverse(a) if _is_list_type(a) else _utf8_reverse(a)


@register_fn("length")
def _length_poly(a):
    if _is_list_type(a):
        return pc.cast(pc.list_value_length(a), pa.int64())
    return _utf8_length(a)


@register_fn("contains")
def _contains_poly(a, v):
    if _is_list_type(a):
        return _list_contains(a, v)
    return pc.match_substring(a, v.as_py() if isinstance(v, pa.Scalar) else v)


register_fn("log")(pc.ln)  # Bloblang log() = natural log (log10 separate)


@register_fn("format_string")
def _format_string(fmt, *arrays):
    """printf-style formatting (Bloblang ``format``): the format string
    is a scalar, the %-placeholders fill element-wise."""
    f = fmt.as_py() if isinstance(fmt, pa.Scalar) else fmt
    cols = []          # per arg: ("scalar", value) or ("col", pylist)
    n = None
    for a in arrays:
        if isinstance(a, pa.Scalar):
            cols.append(("scalar", a.as_py()))
        else:
            arr = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
            cols.append(("col", arr.to_pylist()))
            n = len(arr)
    if n is None:
        vals = tuple(v for _, v in cols)
        return pa.scalar(None if any(v is None for v in vals) else f % vals,
                         pa.string())
    out = []
    for i in range(n):
        vals = tuple(v if kind == "scalar" else v[i] for kind, v in cols)
        out.append(None if any(v is None for v in vals) else f % vals)
    return pa.array(out, pa.string())


# -- round-3 long-tail surface (upstream methods.go parity) ----------------


@register_fn("re_find_all")
def _re_find_all(a, pattern):
    """All regex matches per string → ``list<string>`` (Bloblang
    ``re_find_all``).  Fully vectorized: wrap every match in a sentinel
    via one RE2 replace (``\\1`` backref), split on the sentinel, keep
    the odd-index elements of each list — no per-row Python.  Input
    occurrences of the sentinel char (U+001E, record separator) are
    stripped first so alignment can't corrupt."""
    pat = pattern.as_py() if isinstance(pattern, pa.Scalar) else pattern
    scalar_in = isinstance(a, pa.Scalar)
    s = pa.array([a.as_py()], pa.string()) if scalar_in else (
        a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a)
    SEP = "\x1e"
    s2 = pc.replace_substring(s, pattern=SEP, replacement="")
    wrapped = pc.replace_substring_regex(
        s2, pattern=f"({pat})", replacement=f"{SEP}\\1{SEP}")
    parts = pc.split_pattern(wrapped, SEP)
    arr = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) \
        else parts
    lens = pc.fill_null(pc.list_value_length(arr), 0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    pos = np.arange(int(lens.sum())) - np.repeat(starts, lens)
    flat = pc.list_flatten(arr)
    kept = flat.filter(pa.array(pos % 2 == 1))
    offs = np.concatenate(([0], np.cumsum(lens // 2))).astype(np.int32)
    out = pa.ListArray.from_arrays(
        pa.array(offs, pa.int32()), kept,
        mask=pc.is_null(s) if s.null_count else None)
    return out[0] if scalar_in else out


@register_fn("list_enumerated")
def _list_enumerated(a):
    """Bloblang ``enumerated``: each element becomes
    ``{index, value}`` (index within its row's list)."""
    arr = _list_arr(a)
    lens = pc.fill_null(pc.list_value_length(arr), 0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    pos = np.arange(int(lens.sum())) - np.repeat(starts, lens)
    flat = pc.list_flatten(arr)
    struct = pa.StructArray.from_arrays(
        [pa.array(pos, pa.int64()), flat], names=["index", "value"])
    offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
    return pa.ListArray.from_arrays(
        pa.array(offs, pa.int32()), struct,
        mask=pc.is_null(arr) if arr.null_count else None)


@register_fn("list_last")
def _list_last(a):
    """Last element per list (null for empty/null rows) — the
    ``index(-1)`` idiom."""
    arr = _list_arr(a)
    lens = pc.list_value_length(arr)
    # list_element has no negative indexing: gather from the flat child
    ln = pc.fill_null(lens, 0).to_numpy(zero_copy_only=False).astype(np.int64)
    ends = np.cumsum(ln) - 1
    valid = ln > 0
    idx = pa.array(np.where(valid, ends, 0), pa.int64())
    flat = pc.list_flatten(arr)
    if len(flat) == 0:
        return pa.nulls(len(arr), arr.type.value_type)
    taken = flat.take(idx)
    return pc.if_else(pa.array(valid), taken,
                      pa.nulls(len(arr), taken.type))


def _fnv(a, bits):
    """FNV-1a over UTF-8 bytes, vectorized in lockstep across rows
    (one numpy pass per byte position over still-active rows; zero-copy
    off the Arrow binary buffers).  Cost O(max_len) passes — meant for
    keys/ids; prefer hash_md5's block kernel for long documents."""
    if bits == 32:
        dt, prime, basis = np.uint32, np.uint32(0x01000193), np.uint32(0x811C9DC5)
    else:
        dt, prime, basis = (np.uint64, np.uint64(0x100000001B3),
                            np.uint64(0xCBF29CE484222325))
    scalar_in = isinstance(a, pa.Scalar)
    s = pa.array([a.as_py()], pa.string()) if scalar_in else (
        a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a)
    b = pc.cast(s, pa.binary())
    if isinstance(b, pa.ChunkedArray):
        b = b.combine_chunks()
    offs = np.frombuffer(b.buffers()[1], np.int32,
                         count=len(b) + 1, offset=b.offset * 4).astype(np.int64)
    data = np.frombuffer(b.buffers()[2], np.uint8) if b.buffers()[2] \
        else np.empty(0, np.uint8)
    starts, lens = offs[:-1], np.diff(offs)
    h = np.full(len(b), basis, dt)
    max_len = int(lens.max()) if len(lens) else 0
    for j in range(max_len):
        act = lens > j
        if not act.any():
            break
        hv = h[act]
        np.multiply(np.bitwise_xor(hv, data[starts[act] + j].astype(dt)),
                    prime, out=hv, casting="unsafe")
        h[act] = hv
    out_t = pa.uint32() if bits == 32 else pa.uint64()
    out = pa.array(h, out_t,
                   mask=pc.is_null(s).to_numpy(zero_copy_only=False)
                   if s.null_count else None)
    return out[0] if scalar_in else out


register_fn("hash_fnv32a")(lambda a: _fnv(a, 32))
register_fn("hash_fnv64a")(lambda a: _fnv(a, 64))
register_fn("hash_sha384")(_pyfall(lambda s: _hl.sha384(s.encode()).hexdigest()))
register_fn("hash_hmac_sha1")(_pyfall(
    lambda s, key: __import__("hmac").new(
        key.encode(), s.encode(), _hl.sha1).hexdigest()))
register_fn("hash_hmac_sha512")(_pyfall(
    lambda s, key: __import__("hmac").new(
        key.encode(), s.encode(), _hl.sha512).hexdigest()))

# scalar payload codecs (per-value by nature — binary codec work, like
# the ops-level compress/decompress but usable inside a mapping)
register_fn("compress_zlib")(_pyfall(
    lambda s: _zl.compress(s.encode() if isinstance(s, str) else s)))
register_fn("decompress_zlib")(_pyfall(
    lambda s: _zl.decompress(s if isinstance(s, (bytes, bytearray))
                             else s.encode()).decode()))
register_fn("compress_gzip")(_pyfall(
    lambda s: __import__("gzip").compress(
        s.encode() if isinstance(s, str) else s, mtime=0)))
register_fn("decompress_gzip")(_pyfall(
    lambda s: __import__("gzip").decompress(
        s if isinstance(s, (bytes, bytearray)) else s.encode()).decode()))


@register_fn("parse_form_url_encoded")
def _parse_form_url_encoded(a):
    """``k=v&k2=v2`` form bodies → ``list<struct<key,value>>`` (order
    preserved, repeated keys kept — Bloblang's object-with-arrays
    semantics flattened to pairs)."""
    from urllib.parse import parse_qsl

    scalar_in = isinstance(a, pa.Scalar)
    vals = [a.as_py()] if scalar_in else (
        a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    ).to_pylist()
    t = pa.list_(pa.struct([("key", pa.string()), ("value", pa.string())]))
    out = pa.array(
        [None if v is None else
         [{"key": k, "value": w} for k, w in parse_qsl(v,
                                                       keep_blank_values=True)]
         for v in vals], t)
    return out[0] if scalar_in else out


@register_fn("ts_add_iso8601")
def _ts_add_iso8601(a, dur):
    """Timestamp + ISO-8601 duration string (scalar), e.g.
    ``ts_add_iso8601(ts, 'PT1H30M')``."""
    d = dur.as_py() if isinstance(dur, pa.Scalar) else dur
    ns = _parse_duration_iso(pa.scalar(d)).as_py()
    us = pc.cast(pc.cast(a, pa.timestamp("us")), pa.int64())
    return pc.cast(pc.add(us, ns // 1000), pa.timestamp("us"))


@register_fn("ts_sub_iso8601")
def _ts_sub_iso8601(a, dur):
    d = dur.as_py() if isinstance(dur, pa.Scalar) else dur
    ns = _parse_duration_iso(pa.scalar(d)).as_py()
    us = pc.cast(pc.cast(a, pa.timestamp("us")), pa.int64())
    return pc.cast(pc.subtract(us, ns // 1000), pa.timestamp("us"))


@register_fn("struct_collapse")
def _struct_collapse(a):
    """Bloblang ``collapse()``: flatten nested structs into dotted-path
    fields (``{a: {b: 1}} → {"a.b": 1}``).  Pure child-array re-pack —
    no row materialization."""
    arr = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    if not pa.types.is_struct(arr.type):
        raise TypeError(f"struct_collapse needs a struct column, got {arr.type}")

    def walk(prefix, sa):
        cols = []
        for f in sa.type:
            child = sa.field(f.name)
            name = f"{prefix}.{f.name}" if prefix else f.name
            if pa.types.is_struct(child.type):
                cols.extend(walk(name, child))
            else:
                cols.append((name, child))
        return cols

    cols = walk("", arr)
    return pa.StructArray.from_arrays(
        [c for _, c in cols], names=[n for n, _ in cols])


# -- round-3 Bloblang tail: array sort_by/find, object exists/squash --------


@register_fn("list_sort_by")
def _list_sort_by(a, fn_name, descending=False, *extra):
    """Bloblang ``sort_by``: order each row's elements by a registered
    scalar key function.  Vectorized: key the flattened child array
    once, then one stable lexsort keyed (row, key) reorders every
    segment without a per-row Python sort."""
    arr = _list_arr(a)
    f = fn_name.as_py() if isinstance(fn_name, pa.Scalar) else fn_name
    d = descending.as_py() if isinstance(descending, pa.Scalar) else descending
    flat = pc.list_flatten(arr)
    keys = _REGISTRY[f](flat, *extra)
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    lens = pc.fill_null(pc.list_value_length(arr), 0) \
        .to_numpy(zero_copy_only=False)
    row_ids = np.repeat(np.arange(len(lens)), lens)
    kn = keys.to_numpy(zero_copy_only=False)
    if bool(d) or not np.issubdtype(kn.dtype, np.number):
        # rank codes: order-preserving for any dtype (strings, unsigned,
        # timestamps) and safely negatable for descending
        if kn.dtype == object:
            kn = kn.astype(str)
        _, kn = np.unique(kn, return_inverse=True)
        if bool(d):
            kn = -kn
    order = np.lexsort((kn, row_ids))
    offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
    return pa.ListArray.from_arrays(
        pa.array(offs, pa.int32()), flat.take(pa.array(order)),
        mask=pc.is_null(arr) if arr.null_count else None)


@register_fn("list_find")
def _list_find(a, fn_name, *extra):
    """Bloblang ``find``: the first element of each row matching a
    registered predicate, null when none matches.  One vectorized mask
    over the flat child + a segment-min of matching positions."""
    arr = _list_arr(a)
    f = fn_name.as_py() if isinstance(fn_name, pa.Scalar) else fn_name
    flat = pc.list_flatten(arr)
    mask = _REGISTRY[f](flat, *extra)
    if isinstance(mask, pa.ChunkedArray):
        mask = mask.combine_chunks()
    if not pa.types.is_boolean(mask.type):
        mask = pc.is_valid(mask)
    m = pc.fill_null(mask, False).to_numpy(zero_copy_only=False)
    lens = pc.fill_null(pc.list_value_length(arr), 0) \
        .to_numpy(zero_copy_only=False)
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    pos = np.where(m, np.arange(len(m)), len(m))
    first = np.full(len(lens), len(m), np.int64)
    nonempty = lens > 0
    if len(pos) and nonempty.any():
        first[nonempty] = np.minimum.reduceat(pos, starts[nonempty])
    found = first < np.concatenate((starts[1:], [len(m)]))
    found &= first < len(m)
    idx = pa.array(np.where(found, first, 0), pa.int64())
    vals = flat.take(idx) if len(flat) else pa.nulls(len(lens), flat.type)
    return pc.if_else(pa.array(found), vals, pa.nulls(len(lens), flat.type))


@register_fn("list_find_all")
def _list_find_all(a, fn_name, *extra):
    """Bloblang ``find_all``: every matching element, in order — the
    value-form of ``filter`` (kept as its own name for API parity)."""
    return _list_filter(a, fn_name, *extra)


@register_fn("struct_exists")
def _struct_exists(a, key):
    """Bloblang ``exists(path)`` over parsed-JSON struct columns: a key
    "exists" when the struct row is valid and the field is non-null
    (absent JSON keys parse to null fields)."""
    k = key.as_py() if isinstance(key, pa.Scalar) else key
    arr = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    if not pa.types.is_struct(arr.type):
        raise TypeError(f"struct_exists needs a struct column, got {arr.type}")
    if arr.type.get_field_index(k) < 0:
        return pa.array([False] * len(arr), pa.bool_())
    return pc.and_(pc.is_valid(arr), pc.is_valid(arr.field(k)))


@register_fn("struct_squash")
def _struct_squash(a):
    """Bloblang ``squash``: merge each row's array-of-objects into one
    object, later entries winning per key.  Per-row by necessity (the
    result schema is the union of every row's keys)."""
    arr = _list_arr(a)
    rows = arr.to_pylist()
    out = []
    for r in rows:
        if r is None:
            out.append(None)
            continue
        merged: dict = {}
        for item in r:
            if isinstance(item, dict):
                merged.update({k: v for k, v in item.items() if v is not None})
        out.append(merged)
    return pa.array(out)


# -- round-3 Bloblang tail: case conversion, scalar serde, JWT ---------------



def _case_words(s: str) -> list[str]:
    """Split an identifier into words: delimiters (space _ - .) and
    lower→Upper camel boundaries, mirroring the reference's
    snake_case/camel_case family semantics."""
    import re

    parts = re.split(r"[\s_\-.]+", s)
    words: list[str] = []
    for p in parts:
        if not p:
            continue
        # split camelCase / PascalCase / HTTPServer-style boundaries
        words.extend(re.findall(
            r"[A-Z]+(?=[A-Z][a-z0-9])|[A-Z]?[a-z0-9]+|[A-Z]+", p))
    return words


@register_fn("snake_case")
def _snake_case(a):
    """Bloblang ``snake_case`` ⟨upstream: internal/bloblang/query/
    methods_strings.go⟩."""
    return _pyfall(lambda s: "_".join(w.lower() for w in _case_words(s)))(a)


@register_fn("kebab_case")
def _kebab_case(a):
    return _pyfall(lambda s: "-".join(w.lower() for w in _case_words(s)))(a)


@register_fn("camel_case")
def _camel_case(a):
    def conv(s: str) -> str:
        ws = _case_words(s)
        return "".join(
            w.lower() if i == 0 else w[:1].upper() + w[1:].lower()
            for i, w in enumerate(ws))

    return _pyfall(conv)(a)


@register_fn("pascal_case")
def _pascal_case(a):
    return _pyfall(lambda s: "".join(
        w[:1].upper() + w[1:].lower() for w in _case_words(s)))(a)


@register_fn("parse_csv")
def _parse_csv_fn(a, header=None):
    """Bloblang ``parse_csv``: CSV document string → list of row
    objects (header row names the fields) or list of lists when
    ``header=False``.  stdlib csv per row — no Arrow kernel exists."""
    import csv as _csv
    import io as _io

    use_header = True if header is None else (
        header.as_py() if isinstance(header, pa.Scalar) else bool(header))

    def conv(s: str):
        rows = list(_csv.reader(_io.StringIO(s)))
        if not rows:
            return []
        if use_header:
            hdr = rows[0]
            return [dict(zip(hdr, r)) for r in rows[1:]]
        return rows

    return _pyfall(conv)(a)


def _xml_to_value(el):
    """Element → plain value, reference parse_xml shape: attributes
    become ``-attr`` keys, text becomes ``#text`` when attributes or
    children exist, repeated child tags collapse to lists."""
    children: dict = {}
    for c in el:
        v = _xml_to_value(c)
        if c.tag in children:
            prev = children[c.tag]
            if not isinstance(prev, list):
                children[c.tag] = [prev]
            children[c.tag].append(v)
        else:
            children[c.tag] = v
    attrs = {f"-{k}": v for k, v in el.attrib.items()}
    text = (el.text or "").strip()
    if not children and not attrs:
        return text
    out = {**attrs, **children}
    if text:
        out["#text"] = text
    return out


@register_fn("parse_xml")
def _parse_xml_fn(a):
    """Bloblang ``parse_xml`` ⟨upstream: internal/impl/pure/
    processor_parse_xml.go semantics⟩: stdlib ElementTree, root tag as
    the single top-level key."""
    from xml.etree import ElementTree as _ET

    def conv(s: str):
        root = _ET.fromstring(s)
        return {root.tag: _xml_to_value(root)}

    return _pyfall(conv)(a)


@register_fn("parse_msgpack")
def _parse_msgpack_fn(a):
    """MessagePack binary → value, via the repo's pure-stdlib wire
    codec (rayflow/ops/serde.py)."""
    from rayflow.ops.serde import msgpack_decode

    arr = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    if isinstance(arr, pa.Scalar):
        v = arr.as_py()
        return pa.scalar(None if v is None else msgpack_decode(v))
    return pa.array([None if v is None else msgpack_decode(v)
                     for v in arr.to_pylist()])


@register_fn("format_msgpack")
def _format_msgpack_fn(a):
    from rayflow.ops.serde import msgpack_encode

    arr = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    if isinstance(arr, pa.Scalar):
        v = arr.as_py()
        return pa.scalar(None if v is None else msgpack_encode(v),
                         pa.binary())
    return pa.array([None if v is None else msgpack_encode(v)
                     for v in arr.to_pylist()], pa.binary())


def _b64url_encode(raw: bytes) -> str:
    import base64

    return base64.urlsafe_b64encode(raw).rstrip(b"=").decode()


def _b64url_decode(s: str) -> bytes:
    import base64

    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


@register_fn("sign_jwt_hs256")
def _sign_jwt_hs256(a, secret):
    """Bloblang ``sign_jwt_hs256`` ⟨upstream: internal/bloblang/query/
    methods_jwt.go⟩: object → compact JWS, HMAC-SHA256.  Deterministic
    (sorted-key JSON, no iat injection — the caller supplies claims)."""
    import hashlib
    import hmac as _hmac
    import json as _json

    sec = (secret.as_py() if isinstance(secret, pa.Scalar) else secret)
    sec_b = sec.encode() if isinstance(sec, str) else sec
    header = _b64url_encode(
        _json.dumps({"alg": "HS256", "typ": "JWT"},
                    separators=(",", ":")).encode())

    def conv(claims) -> str:
        payload = _b64url_encode(_json.dumps(
            claims, separators=(",", ":"), sort_keys=True).encode())
        signing = f"{header}.{payload}".encode()
        sig = _hmac.new(sec_b, signing, hashlib.sha256).digest()
        return f"{header}.{payload}.{_b64url_encode(sig)}"

    arr = a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
    if isinstance(arr, pa.Scalar):
        v = arr.as_py()
        return pa.scalar(None if v is None else conv(v))
    return pa.array([None if v is None else conv(v)
                     for v in arr.to_pylist()], pa.string())


@register_fn("parse_jwt_hs256")
def _parse_jwt_hs256(a, secret):
    """Verify an HS256 JWS and return the claims object; raises on a
    bad signature (matching the reference's error surface — a pipeline
    routes it via try/catch)."""
    import hashlib
    import hmac as _hmac
    import json as _json

    sec = (secret.as_py() if isinstance(secret, pa.Scalar) else secret)
    sec_b = sec.encode() if isinstance(sec, str) else sec

    def conv(tok: str):
        try:
            header, payload, sig = tok.split(".")
        except ValueError:
            raise ValueError("parse_jwt_hs256: not a compact JWS")
        want = _hmac.new(sec_b, f"{header}.{payload}".encode(),
                         hashlib.sha256).digest()
        if not _hmac.compare_digest(want, _b64url_decode(sig)):
            raise ValueError("parse_jwt_hs256: signature mismatch")
        return _json.loads(_b64url_decode(payload))

    return _pyfall(conv)(a)
