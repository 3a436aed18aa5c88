"""Table-driven scalar-function spec tests — the analogue of the
reference's Bloblang per-method suites (SURVEY.md §5 #2): input column,
expression, expected output."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pytest

from rayflow import expr as E

T = pa.table({
    "s": pa.array(["Hello World", "  pad  ", "abc,def", None]),
    "i": pa.array([1, -2, 3, None], pa.int64()),
    "f": pa.array([1.5, -2.25, 0.0, None], pa.float64()),
    "ts": pa.array(
        [datetime.datetime(2024, 3, 5, 14, 30, 17), None,
         datetime.datetime(2020, 1, 1), datetime.datetime(1999, 12, 31, 23, 59)],
        pa.timestamp("us"),
    ),
    "j": pa.array(['{"k": 7, "name": "x"}', '{"k": -1}', "bad", None]),
    "lst": pa.array([[1, 2, 3], [], [5], None], pa.list_(pa.int64())),
})


def ev(expr):
    out = expr.eval(T)
    return out.to_pylist() if not isinstance(out, pa.Scalar) else out.as_py()


CASES = [
    # strings
    (E.F("uppercase", E.col("s")), ["HELLO WORLD", "  PAD  ", "ABC,DEF", None]),
    (E.F("lowercase", E.col("s")), ["hello world", "  pad  ", "abc,def", None]),
    (E.F("trim", E.col("s")), ["Hello World", "pad", "abc,def", None]),
    (E.F("length", E.col("s")), [11, 7, 7, None]),
    (E.F("reverse", E.col("s")), ["dlroW olleH", "  dap  ", "fed,cba", None]),
    (E.F("contains", E.col("s"), "World"), [True, False, False, None]),
    (E.F("has_prefix", E.col("s"), "He"), [True, False, False, None]),
    (E.F("has_suffix", E.col("s"), "def"), [False, False, True, None]),
    (E.F("index_of", E.col("s"), "World"), [6, -1, -1, None]),
    (E.F("replace_all", E.col("s"), "l", "L"), ["HeLLo WorLd", "  pad  ", "abc,def", None]),
    (E.F("re_match", E.col("s"), r"^[A-Z]"), [True, False, False, None]),
    (E.F("re_replace_all", E.col("s"), r"[aeiou]", "_"), ["H_ll_ W_rld", "  p_d  ", "_bc,d_f", None]),
    (E.F("slice", E.col("s"), 0, 5), ["Hello", "  pad", "abc,d", None]),
    (E.F("capitalize", E.col("s")), ["Hello world", "  pad  ", "Abc,def", None]),
    (E.F("count_substring", E.col("s"), "l"), [3, 0, 0, None]),
    # math / numbers
    (E.F("abs", E.col("i")), [1, 2, 3, None]),
    (E.F("ceil", E.col("f")), [2.0, -2.0, 0.0, None]),
    (E.F("floor", E.col("f")), [1.0, -3.0, 0.0, None]),
    # SQL round: scale, half-away-from-zero, divide (bit-exact vs DuckDB)
    (E.F("round", E.col("f"), 1), [1.5, -2.3, 0.0, None]),
    (E.F("sign", E.col("i")), [1, -1, 1, None]),
    # element-wise extremes skip nulls (Arrow semantics): null -> other arg
    (E.F("max_of", E.col("i"), E.lit(0)), [1, 0, 3, 0]),
    (E.F("min_of", E.col("i"), E.lit(0)), [0, -2, 0, 0]),
    (E.col("i") + 10, [11, 8, 13, None]),
    (E.col("i") * E.col("i"), [1, 4, 9, None]),
    (E.col("f") / 2.0, [0.75, -1.125, 0.0, None]),
    (E.col("i") % 2, [1.0, -0.0, 1.0, None]),
    # casts / flow
    (E.F("string", E.col("i")), ["1", "-2", "3", None]),
    (E.F("int64", E.col("f")), [1, -2, 0, None]),  # coercion truncates like Bloblang int64()
    (E.F("is_null", E.col("i")), [False, False, False, True]),
    (E.F("not_null", E.col("i")), [True, True, True, False]),
    (E.F("fill_null", E.col("i"), E.lit(0)), [1, -2, 3, 0]),
    (E.F("coalesce", E.col("i"), E.lit(99)), [1, -2, 3, 99]),
    (E.when(E.col("i") > 0, E.lit("pos"), E.lit("neg")), ["pos", "neg", "pos", None]),
    # timestamps
    (E.F("year", E.col("ts")), [2024, None, 2020, 1999]),
    (E.F("month", E.col("ts")), [3, None, 1, 12]),
    (E.F("hour", E.col("ts")), [14, None, 0, 23]),
    (E.F("ts_unix", E.col("ts")), [1709649017, None, 1577836800, 946684740]),
    (E.F("ts_format", E.col("ts"), "%Y-%m-%d"), ["2024-03-05", None, "2020-01-01", "1999-12-31"]),
    # json
    (E.F("json_get", E.col("j"), "name"), ["x", None, None, None]),
    (E.F("json_get_int", E.col("j"), "k"), [7, -1, None, None]),
    # lists
    (E.F("list_len", E.col("lst")), [3, 0, 1, None]),
    # hashes / encode (deterministic)
    (E.F("hash_crc32", E.col("s")),
     [__import__("zlib").crc32(b"Hello World"),
      __import__("zlib").crc32(b"  pad  "),
      __import__("zlib").crc32(b"abc,def"), None]),
    (E.F("hash_md5", E.col("s")),
     [__import__("hashlib").md5(b"Hello World").hexdigest(),
      __import__("hashlib").md5(b"  pad  ").hexdigest(),
      __import__("hashlib").md5(b"abc,def").hexdigest(), None]),
    (E.F("encode_base64", E.col("s")),
     ["SGVsbG8gV29ybGQ=", "ICBwYWQgIA==", "YWJjLGRlZg==", None]),
]


@pytest.mark.parametrize("expr,expected", CASES, ids=range(len(CASES)))
def test_scalar_case(expr, expected):
    got = ev(expr)
    if isinstance(expected, list) and any(isinstance(x, float) for x in expected if x is not None):
        for g, e in zip(got, expected):
            if e is None:
                assert g is None
            else:
                assert abs(g - e) < 1e-9, (got, expected)
    else:
        assert got == expected, (got, expected)


def test_sexpr_roundtrip():
    e = E.parse(["when", ["and", ["gt", ["col", "i"], 0], ["not_null", ["col", "i"]]],
                 ["concat", ["string", ["col", "i"]], ["lit", "!"]], "neg"])
    assert ev(e) == ["1!", "neg", "3!", "neg"]  # Kleene and(null, False) = False


def test_unknown_fn_raises():
    with pytest.raises(KeyError):
        E.F("definitely_not_a_fn", E.col("s"))


def test_function_count():
    # scalar surface should stay broad (Bloblang has ~200 members; we
    # target the deterministic, columnar-relevant core)
    assert len(E.functions()) >= 70


def test_list_folds():
    t = pa.table({"lst": pa.array([[1, 2, 3], [], [5], None], pa.list_(pa.int64()))})
    assert E.F("list_sum", E.col("lst")).eval(t).to_pylist() == [6.0, 0.0, 5.0, None]
    assert E.F("list_max", E.col("lst")).eval(t).to_pylist() == [3.0, None, 5.0, None]
    assert E.F("list_min", E.col("lst")).eval(t).to_pylist() == [1.0, None, 5.0, None]
    assert E.F("list_contains", E.col("lst"), 2).eval(t).to_pylist() == [True, False, False, None]
