"""Spec tests for the second round-2 scalar-function batch (string
trims/pads, encodings, durations, timestamp arithmetic, list methods)."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pytest

from rayflow import expr as E

T = pa.table({
    "s": pa.array(["prefix-body", "body-suffix", "no-match", None]),
    "path": pa.array(["a/b/c.txt", "x", "/root/y", None]),
    "dur": pa.array(["1h30m", "250ms", "2s", None]),
    "iso": pa.array(["PT1H30M", "PT0.5S", "P1D", None]),
    "num": pa.array([1234567.891, -0.5, 0.0, None], pa.float64()),
    "ts": pa.array(
        [datetime.datetime(2024, 3, 5, 14, 30, 17), None,
         datetime.datetime(2020, 1, 1),
         datetime.datetime(1999, 12, 31, 23, 59)],
        pa.timestamp("us"),
    ),
    "lst": pa.array([[1, 2, 3], [], [5], None], pa.list_(pa.int64())),
    "lst2": pa.array([[9], [8, 7], [], None], pa.list_(pa.int64())),
    "bl": pa.array([[True, False], [], [False], None], pa.list_(pa.bool_())),
    "html": pa.array(["a<b>&c", "x&amp;y", "plain", None]),
})


def ev(expr):
    out = expr.eval(T)
    return out.to_pylist() if not isinstance(out, pa.Scalar) else out.as_py()


CASES = [
    (E.F("trim_prefix", E.col("s"), "prefix-"),
     ["body", "body-suffix", "no-match", None]),
    (E.F("trim_suffix", E.col("s"), "-suffix"),
     ["prefix-body", "body", "no-match", None]),
    (E.F("rpad", E.col("path"), 6, "."),
     ["a/b/c.txt", "x.....", "/root/y", None]),
    (E.F("filepath_split", E.col("path")),
     [["a", "b", "c.txt"], ["x"], ["", "root", "y"], None]),
    (E.F("filepath_join", E.lit("base"), E.col("path")),
     ["base/a/b/c.txt", "base/x", "base//root/y", None]),
    (E.F("escape_html", E.col("html")),
     ["a&lt;b&gt;&amp;c", "x&amp;amp;y", "plain", None]),
    (E.F("unescape_html", E.col("html")),
     ["a<b>&c", "x&y", "plain", None]),
    (E.F("parse_duration", E.col("dur")),
     [5_400_000_000_000, 250_000_000, 2_000_000_000, None]),
    (E.F("parse_duration_iso8601", E.col("iso")),
     [5_400_000_000_000, 500_000_000, 86_400_000_000_000, None]),
    (E.F("ts_unix_milli", E.col("ts")),
     [1709649017000, None, 1577836800000, 946684740000]),
    (E.F("ts_unix_nano", E.col("ts")),
     [1709649017000000000, None, 1577836800000000000, 946684740000000000]),
    (E.F("ts_diff", E.col("ts"), E.col("ts")), [0.0, None, 0.0, 0.0]),
    (E.F("clamp", E.col("num"), E.lit(0.0), E.lit(10.0)),
     [10.0, 0.0, 0.0, 0.0]),
    (E.F("format_number", E.col("num"), 2),
     ["1,234,567.89", "-0.50", "0.00", None]),
    (E.F("list_reverse", E.col("lst")), [[3, 2, 1], [], [5], None]),
    (E.F("list_concat", E.col("lst"), E.col("lst2")),
     [[1, 2, 3, 9], [8, 7], [5], None]),
    (E.F("list_any", E.col("bl")), [True, False, False, None]),
    (E.F("list_all", E.col("bl")), [False, True, False, None]),
    (E.F("list_index_of", E.col("lst"), E.lit(5)), [-1, -1, 0, None]),
    (E.F("decode_hex", E.lit("6869")), ["hi"] * 4),
    (E.F("encode_base32", E.lit("hi")), ["NBUQ===="] * 4),
    (E.F("decode_base32", E.lit("NBUQ====")), ["hi"] * 4),
    (E.F("encode_ascii85", E.lit("hi")), ["BP@"]),
    (E.F("decode_ascii85", E.lit("BP@")), ["hi"]),
    (E.F("log2", E.lit(8.0)), [3.0] * 1),
]


@pytest.mark.parametrize("expr,expected", CASES,
                         ids=[str(i) for i in range(len(CASES))])
def test_scalar_spec(expr, expected):
    got = ev(expr)
    if not isinstance(got, list):  # literal-only exprs fold to a scalar
        got = [got]
    assert got == expected[: len(got)]


def test_ts_add_sub_roundtrip():
    added = E.F("ts_add", E.col("ts"), E.lit(3600)).eval(T)
    back = E.F("ts_sub", E.lit(None), E.lit(0))  # placeholder unused
    assert added.to_pylist()[0] == datetime.datetime(2024, 3, 5, 15, 30, 17)
    sub = E.F("ts_sub", E.col("ts"), E.lit(60)).eval(T)
    assert sub.to_pylist()[0] == datetime.datetime(2024, 3, 5, 14, 29, 17)
    diff = E.F("ts_diff",
               E.F("ts_add", E.col("ts"), E.lit(90)), E.col("ts")).eval(T)
    assert diff.to_pylist()[0] == 90.0


def test_strftime_strptime_aliases():
    out = E.F("ts_strftime", E.col("ts"), "%Y-%m-%d").eval(T)
    assert out.to_pylist()[0] == "2024-03-05"
    rt = E.F("ts_strptime", E.lit("2024-03-05"), "%Y-%m-%d").eval(T)
    assert rt.as_py() == datetime.datetime(2024, 3, 5)


def test_struct_keys_values():
    t = pa.table({"st": pa.array([{"a": 1, "b": "x"}, {"a": 2, "b": None}],
                                 pa.struct([("a", pa.int64()),
                                            ("b", pa.string())]))})
    keys = E.F("struct_keys", E.col("st")).eval(t)
    assert keys.to_pylist() == [["a", "b"], ["a", "b"]]
    vals = E.F("struct_values", E.col("st")).eval(t)
    assert vals.to_pylist() == [["1", "x"], ["2", None]]


def test_parse_duration_rejects_garbage():
    with pytest.raises(ValueError):
        E.F("parse_duration", E.lit("not a duration")).eval(T)


def test_parse_yaml_and_list_builders():
    t = pa.table({
        "y": pa.array(["a: 1", "b: [1, 2]"]),
        "l1": pa.array([[1, 2], [3]], pa.list_(pa.int64())),
        "l2": pa.array([[9], [8, 7]], pa.list_(pa.int64())),
    })
    y = E.F("parse_yaml", E.col("y")).eval(t).to_pylist()
    assert y[0]["a"] == 1 and y[1]["b"] == [1, 2]
    ap = E.F("list_append", E.col("l1"), E.lit(7)).eval(t).to_pylist()
    assert ap == [[1, 2, 7], [3, 7]]
    z = E.F("list_zip", E.col("l1"), E.col("l2")).eval(t).to_pylist()
    assert z == [[{"left": 1, "right": 9}], [{"left": 3, "right": 8}]]


def test_extra_casts_and_round_aliases():
    t = pa.table({"f": pa.array([250.9, -1.2], pa.float64())})
    assert E.F("uint8", E.lit(200)).eval(t).as_py() == 200
    assert E.F("int16", E.lit(1000)).eval(t).as_py() == 1000
    assert E.F("round_down", E.col("f")).eval(t).to_pylist() == [250.0, -2.0]
    assert E.F("round_up", E.col("f")).eval(t).to_pylist() == [251.0, -1.0]


def test_list_concat_null_rows_do_not_shift_neighbors():
    """Regression: null offsets shifted neighboring rows' boundaries —
    a row next to a null used to absorb other rows' elements."""
    t = pa.table({
        "a": pa.array([[1, 2], [3], None, [4]], pa.list_(pa.int64())),
        "b": pa.array([[9], None, [7], [8]], pa.list_(pa.int64())),
    })
    got = E.F("list_concat", E.col("a"), E.col("b")).eval(t).to_pylist()
    assert got == [[1, 2, 9], None, None, [4, 8]]
    ap = E.F("list_append", E.col("a"), E.lit(99)).eval(t).to_pylist()
    assert ap == [[1, 2, 99], [3, 99], None, [4, 99]]


def test_list_any_all_skip_null_elements():
    """Null ELEMENTS are skipped (SQL aggregate semantics), identically
    for bool and numeric lists."""
    tb = pa.table({"l": pa.array([[True, None], [None], [False, None]],
                                 pa.list_(pa.bool_()))})
    assert E.F("list_any", E.col("l")).eval(tb).to_pylist() == \
        [True, False, False]
    assert E.F("list_all", E.col("l")).eval(tb).to_pylist() == \
        [True, True, False]
    tn = pa.table({"l": pa.array([[0.0, None], [1.0, None]],
                                 pa.list_(pa.float64()))})
    assert E.F("list_any", E.col("l")).eval(tn).to_pylist() == [False, True]
    assert E.F("list_all", E.col("l")).eval(tn).to_pylist() == [False, True]


def test_timezone_fns():
    t = pa.table({"ts": pa.array([datetime.datetime(2024, 6, 1, 12, 0)],
                                 pa.timestamp("us"))})
    aware = E.F("ts_assume_tz", E.col("ts"), "UTC").eval(t)
    assert str(aware.type) == "timestamp[us, tz=UTC]"
    # noon UTC is 08:00 in New York during DST
    ny = E.F("ts_to_tz", E.F("ts_assume_tz", E.col("ts"), "UTC"),
             "America/New_York").eval(t)
    assert ny.to_pylist()[0] == datetime.datetime(2024, 6, 1, 8, 0)


def test_parse_url_struct():
    t = pa.table({"u": pa.array([
        "https://example.com:8443/a/b?x=1#frag",
        "ftp://files.host/path",
        None,
    ])})
    got = E.F("parse_url", E.col("u")).eval(t).to_pylist()
    assert got[0] == {"scheme": "https", "host": "example.com",
                      "port": 8443, "path": "/a/b", "query": "x=1",
                      "fragment": "frag"}
    assert got[1]["scheme"] == "ftp" and got[1]["port"] is None
    assert got[2] is None


def test_parse_url_malformed_rows_null_not_crash():
    t = pa.table({"u": pa.array([
        "https://host:8a/x",      # non-numeric port
        "http://[::1",            # invalid IPv6
        "https://ok.example/a",
    ])})
    got = E.F("parse_url", E.col("u")).eval(t).to_pylist()
    assert got[0] is None and got[1] is None
    assert got[2]["host"] == "ok.example"


def test_list_any_all_string_truthiness():
    t = pa.table({"l": pa.array([["abc", ""], [""], ["x"]],
                                pa.list_(pa.string()))})
    assert E.F("list_any", E.col("l")).eval(t).to_pylist() == \
        [True, False, True]
    assert E.F("list_all", E.col("l")).eval(t).to_pylist() == \
        [False, False, True]


def test_format_string_and_log_alias():
    t = pa.table({"n": pa.array([3, None], pa.int64()),
                  "s": pa.array(["cats", "dogs"])})
    got = E.F("format_string", E.lit("%d %s found"),
              E.col("n"), E.col("s")).eval(t).to_pylist()
    assert got == ["3 cats found", None]
    import math
    assert abs(E.F("log", E.lit(math.e)).eval(t).as_py() - 1.0) < 1e-12


def test_format_string_null_scalar_folds_to_null():
    t = pa.table({"x": pa.array([1], pa.int64())})
    got = E.F("format_string", E.lit("%d items"), E.lit(None)).eval(t)
    assert got.as_py() is None
