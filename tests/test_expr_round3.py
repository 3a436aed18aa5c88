"""Round-3 long-tail scalar functions (upstream
``internal/bloblang/query/methods.go`` parity): re_find_all,
enumerated, FNV hashes, payload codecs, ISO-duration timestamp math,
struct collapse, form decoding."""

from __future__ import annotations

import datetime
import gzip
import hashlib
import hmac as hmac_mod
import re
import zlib

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import rayflow.expr as E

R = E._REGISTRY


# -- re_find_all -----------------------------------------------------------


def test_re_find_all_basic():
    a = pa.array(["a1 b22 c333", "no digits", None, "9", ""])
    got = R["re_find_all"](a, pa.scalar(r"\d+")).to_pylist()
    assert got == [["1", "22", "333"], [], None, ["9"], []]


def test_re_find_all_matches_python_re():
    # NB: Arrow regexes are RE2 (like upstream Go) — \w is ASCII there,
    # so compare against Python re in ASCII mode
    texts = ["foo bar baz", "x,y;z", "", "aaa", "a b  c", "éé çç"]
    pat = r"\w+"
    got = R["re_find_all"](pa.array(texts), pa.scalar(pat)).to_pylist()
    assert got == [re.findall(pat, t, flags=re.ASCII) for t in texts]


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(alphabet="ab1 2\n", max_size=20), max_size=8))
def test_re_find_all_property(texts):
    pat = r"[0-9]+"
    got = R["re_find_all"](pa.array(texts, pa.string()),
                           pa.scalar(pat)).to_pylist()
    assert got == [re.findall(pat, t) for t in texts]


def test_re_find_all_scalar():
    assert R["re_find_all"](pa.scalar("a1b22"),
                            pa.scalar(r"\d+")).as_py() == ["1", "22"]


# -- list helpers ----------------------------------------------------------


def test_list_enumerated():
    l = pa.array([["a", "b"], [], None, ["z"]])
    got = R["list_enumerated"](l).to_pylist()
    assert got == [[{"index": 0, "value": "a"}, {"index": 1, "value": "b"}],
                   [], None, [{"index": 0, "value": "z"}]]


def test_list_last():
    l = pa.array([["a", "b"], [], None, ["z"]])
    assert R["list_last"](l).to_pylist() == ["b", None, None, "z"]


def test_list_last_all_empty():
    l = pa.array([[], []], pa.list_(pa.int64()))
    assert R["list_last"](l).to_pylist() == [None, None]


# -- FNV hashes ------------------------------------------------------------


def _fnv_ref(s: str, bits: int) -> int:
    if bits == 32:
        h, p, m = 0x811C9DC5, 0x01000193, 0xFFFFFFFF
    else:
        h, p, m = 0xCBF29CE484222325, 0x100000001B3, 0xFFFFFFFFFFFFFFFF
    for b in s.encode():
        h = ((h ^ b) * p) & m
    return h


@pytest.mark.parametrize("bits,name", [(32, "hash_fnv32a"),
                                       (64, "hash_fnv64a")])
def test_fnv_matches_reference(bits, name):
    vals = ["hello", "", "chongo was here!\n", None, "a", "é中文",
            "x" * 300]
    got = R[name](pa.array(vals)).to_pylist()
    assert got == [None if v is None else _fnv_ref(v, bits) for v in vals]


def test_fnv_sliced_input():
    vals = ["aa", "bb", "cc", "dd"]
    arr = pa.array(vals).slice(1, 2)
    assert R["hash_fnv64a"](arr).to_pylist() == [
        _fnv_ref(v, 64) for v in vals[1:3]]


@settings(max_examples=30, deadline=None)
@given(st.lists(st.text(max_size=40), max_size=10))
def test_fnv_property(texts):
    got = R["hash_fnv64a"](pa.array(texts, pa.string())).to_pylist()
    assert got == [_fnv_ref(t, 64) for t in texts]


# -- hmac / sha384 ---------------------------------------------------------


def test_hmac_and_sha384():
    assert R["hash_sha384"](pa.array(["x"])).to_pylist() == [
        hashlib.sha384(b"x").hexdigest()]
    assert R["hash_hmac_sha1"](pa.array(["msg"]),
                               pa.scalar("key")).to_pylist() == [
        hmac_mod.new(b"key", b"msg", hashlib.sha1).hexdigest()]
    assert R["hash_hmac_sha512"](pa.array(["msg"]),
                                 pa.scalar("key")).to_pylist() == [
        hmac_mod.new(b"key", b"msg", hashlib.sha512).hexdigest()]


# -- payload codecs --------------------------------------------------------


def test_zlib_gzip_roundtrip():
    texts = pa.array(["hello " * 50, "", None])
    z = R["compress_zlib"](texts)
    assert R["decompress_zlib"](z).to_pylist() == ["hello " * 50, "", None]
    g = R["compress_gzip"](texts)
    assert R["decompress_gzip"](g).to_pylist() == ["hello " * 50, "", None]
    # deterministic bytes (mtime=0) and stdlib-compatible
    assert gzip.decompress(g.to_pylist()[0]) == ("hello " * 50).encode()
    assert zlib.decompress(z.to_pylist()[0]) == ("hello " * 50).encode()
    assert R["compress_gzip"](texts).to_pylist() == g.to_pylist()


# -- form decode -----------------------------------------------------------


def test_parse_form_url_encoded():
    a = pa.array(["a=1&b=two&a=3", "k=", "", None])
    got = R["parse_form_url_encoded"](a).to_pylist()
    assert got[0] == [{"key": "a", "value": "1"},
                      {"key": "b", "value": "two"},
                      {"key": "a", "value": "3"}]
    assert got[1] == [{"key": "k", "value": ""}]
    assert got[2] == []
    assert got[3] is None


# -- ISO-duration timestamp math ------------------------------------------


def test_ts_add_sub_iso8601():
    ts = pa.array([datetime.datetime(2024, 1, 1)], pa.timestamp("us"))
    assert R["ts_add_iso8601"](ts, pa.scalar("PT1H30M")).to_pylist() == [
        datetime.datetime(2024, 1, 1, 1, 30)]
    assert R["ts_sub_iso8601"](ts, pa.scalar("P1DT0.5S")).to_pylist() == [
        datetime.datetime(2023, 12, 30, 23, 59, 59, 500000)]


# -- struct collapse -------------------------------------------------------


def test_struct_collapse():
    st_arr = pa.array([{"a": {"b": 1, "c": "x"}, "d": 2.0},
                       {"a": {"b": None, "c": "y"}, "d": None}])
    got = R["struct_collapse"](st_arr).to_pylist()
    assert got == [{"a.b": 1, "a.c": "x", "d": 2.0},
                   {"a.b": None, "a.c": "y", "d": None}]


def test_struct_collapse_non_struct_raises():
    with pytest.raises(TypeError, match="struct"):
        R["struct_collapse"](pa.array([1, 2]))


# -- bloblang text-syntax access ------------------------------------------


def test_bloblang_methods_resolve():
    from rayflow.bloblang import parse_program

    prog = parse_program('root.nums = this.text.re_find_all("[0-9]+")\n'
                         'root.h = this.text.hash_fnv64a()\n'
                         'root.e = this.tags.enumerated()')
    t = pa.table({"text": ["a1 b2", "zz"], "tags": [["p", "q"], []]})
    assert prog["nums"].eval(t).to_pylist() == [["1", "2"], []]
    assert prog["h"].eval(t).to_pylist() == [_fnv_ref("a1 b2", 64),
                                             _fnv_ref("zz", 64)]
    assert prog["e"].eval(t).to_pylist() == [
        [{"index": 0, "value": "p"}, {"index": 1, "value": "q"}], []]


# -- case conversions --------------------------------------------------------


@pytest.mark.parametrize("fn,inp,want", [
    ("snake_case", "HelloWorld", "hello_world"),
    ("snake_case", "http-server config.Item", "http_server_config_item"),
    ("snake_case", "HTTPServer", "http_server"),
    ("snake_case", "already_snake", "already_snake"),
    ("kebab_case", "HelloWorld", "hello-world"),
    ("kebab_case", "foo_bar baz", "foo-bar-baz"),
    ("camel_case", "hello_world", "helloWorld"),
    ("camel_case", "HTTP server-log", "httpServerLog"),
    ("pascal_case", "hello_world", "HelloWorld"),
    ("pascal_case", "foo-bar", "FooBar"),
])
def test_case_conversions(fn, inp, want):
    out = R[fn](pa.array([inp, None]))
    assert out.to_pylist() == [want, None]


# -- scalar serde parsers -----------------------------------------------------


def test_parse_csv_header_objects():
    doc = "name,age\nalice,30\nbob,41\n"
    out = R["parse_csv"](pa.array([doc, "", None])).to_pylist()
    assert out[0] == [{"name": "alice", "age": "30"},
                      {"name": "bob", "age": "41"}]
    assert out[1] == []
    assert out[2] is None
    rows = R["parse_csv"](pa.array([doc]), pa.scalar(False)).to_pylist()
    assert rows[0] == [["name", "age"], ["alice", "30"], ["bob", "41"]]


def test_parse_xml_shape():
    doc = ('<order id="7"><item qty="2">widget</item>'
           '<item qty="1">bolt</item><note>rush</note></order>')
    (v,) = R["parse_xml"](pa.array([doc])).to_pylist()
    assert v == {"order": {
        "-id": "7",
        "item": [{"-qty": "2", "#text": "widget"},
                 {"-qty": "1", "#text": "bolt"}],
        "note": "rush",
    }}


def test_msgpack_scalar_roundtrip():
    # values must be Arrow-type-consistent across rows (same constraint
    # as parse_yaml/parse_json: the decoded column needs one schema)
    vals = [{"a": 1, "b": ["y", None, "x"], "c": 2.5},
            {"a": -7, "b": [], "c": 0.5}, None]
    enc = R["format_msgpack"](pa.array(vals))
    assert enc.type == pa.binary()
    dec = R["parse_msgpack"](enc).to_pylist()
    assert dec == vals


# -- JWT HS256 ----------------------------------------------------------------


def test_jwt_hs256_roundtrip_and_rfc_shape():
    import base64
    import json

    claims = [{"sub": "u1", "scope": "read"}, None]
    tok = R["sign_jwt_hs256"](pa.array(claims), pa.scalar("s3cret"))
    assert tok.to_pylist()[1] is None
    t0 = tok.to_pylist()[0]
    h, p, s = t0.split(".")
    hdr = json.loads(base64.urlsafe_b64decode(h + "=="))
    assert hdr == {"alg": "HS256", "typ": "JWT"}
    # independent verification with stdlib hmac
    want = hmac_mod.new(b"s3cret", f"{h}.{p}".encode(),
                        hashlib.sha256).digest()
    assert base64.urlsafe_b64decode(s + "==") == want
    back = R["parse_jwt_hs256"](tok, pa.scalar("s3cret")).to_pylist()
    assert back[0] == claims[0]
    with pytest.raises(ValueError, match="signature mismatch"):
        R["parse_jwt_hs256"](pa.array([t0]), pa.scalar("wrong"))
    with pytest.raises(ValueError, match="not a compact JWS"):
        R["parse_jwt_hs256"](pa.array(["garbage"]), pa.scalar("s3cret"))
