"""``awk`` processor (rayflow/ops/awk.py): POSIX-awk-subset
interpreter — conformance vs the system awk binary (when present),
classic one-liners, statefulness classification, and the Ray op
surface (parallel stateless stage vs ordered sequential pass)."""

import shutil
import subprocess

import pytest

from rayflow.ops import build_op
from rayflow.ops.awk import _AwkProgram, run_awk

CASES = [
    ('{print $1}', ["a b c", "d e"], ["a", "d"]),
    ('$2 > 10 {print $0}', ["x 5", "y 20", "z 11"], ["y 20", "z 11"]),
    ('/err/ {print $2}', ["err here", "ok fine", "errz two"],
     ["here", "two"]),
    ('{ x = $1 + $2; print x }', ["3 4"], ["7"]),
    ('END {print NR}', ["a", "b", "c"], ["3"]),
    ('!seen[$0]++', ["a", "b", "a", "c", "b"], ["a", "b", "c"]),
    ('BEGIN {OFS="-"} {print $1, $2}', ["p q"], ["p-q"]),
    ('{ c[$1] += $2 } END { print c["a"], c["b"] }',
     ["a 1", "b 2", "a 3"], ["4 2"]),
    ('NF > 2', ["a b c", "x y"], ["a b c"]),
    ('{print toupper($1) "_" length($2)}', ["ab cde"], ["AB_3"]),
    ('{print substr($0, 2, 3)}', ["abcdef"], ["bcd"]),
    ('$1 ~ /^a/ {print "hit"}', ["abc", "bcd"], ["hit"]),
    ('{ if ($1 == "x") print "X"; else print "O" }', ["x", "y"],
     ["X", "O"]),
    ('{ n = gsub(/a/, "b"); print n }', ["banana"], ["3"]),
    ('{ s=$0; gsub(/a/,"o",s); print s }', ["banana"], ["bonono"]),
    ('{ gsub(/a/, "x"); print }', ["banana"], ["bxnxnx"]),
    ('{ print $1 > 2 ? "big" : "small" }', ["5", "1"], ["big", "small"]),
    ('{ print sprintf("%05d", $1) }', ["42"], ["00042"]),
    ('{ n = split($0, p, ","); print n, p["2"] }', ["x,y,z"], ["3 y"]),
    ('{ t += $1 } END { print t / NR }', ["1", "2", "3", "6"], ["3"]),
    ('/a/ && /b/', ["ab", "ac", "bc"], ["ab"]),
    ('$0 !~ /x/ {print NR}', ["q", "x", "r"], ["1", "3"]),
    ('$1 == "a" { next } { print }', ["a 1", "b 2"], ["b 2"]),
    ('{ print $(NF) }', ["a b c"], ["c"]),
    ('{ print length() }', ["hello"], ["5"]),
]


@pytest.mark.parametrize("prog,lines,want",
                         CASES, ids=[c[0][:30] for c in CASES])
def test_awk_one_liners(prog, lines, want):
    assert run_awk(prog, lines) == want


@pytest.mark.skipif(shutil.which("awk") is None,
                    reason="no system awk to compare against")
def test_awk_matches_system_awk():
    """Every supported one-liner produces byte-identical output to the
    system awk on randomized whitespace-tokenized input."""
    import random

    rng = random.Random(11)

    def randline():
        toks = []
        for _ in range(rng.randint(0, 5)):
            if rng.random() < 0.5:
                toks.append(str(rng.randint(-20, 30)))
            else:
                toks.append("".join(
                    rng.choices("abezrx", k=rng.randint(1, 5))))
        return " ".join(toks)

    checked = 0
    for prog, _l, _w in CASES:
        if "print $1 > 2" in prog:
            # real awk parses an unparenthesized `>` after print as
            # FILE REDIRECTION; we don't support redirection, so our
            # `>` is comparison — a documented subset divergence
            continue
        for _ in range(4):
            lines = [randline() for _ in range(rng.randint(0, 10))]
            inp = "\n".join(lines) + ("\n" if lines else "")
            r = subprocess.run(["awk", prog], input=inp,
                               capture_output=True, text=True)
            if r.returncode != 0:        # awk fatal (e.g. div by zero)
                continue
            try:
                got = run_awk(prog, lines)
            except ValueError as e:
                if "division by zero" in str(e):
                    # mawk tolerates /0 (prints nan/inf); POSIX calls
                    # it an error and we fail loud — accepted divergence
                    continue
                raise
            checked += 1
            assert got == r.stdout.splitlines(), (prog, lines)
    assert checked > 50


def test_awk_statefulness_classification():
    assert not _AwkProgram('{print $1}').stateful
    assert not _AwkProgram('/x/ {print $2, NF}').stateful
    assert _AwkProgram('END {print NR}').stateful
    assert _AwkProgram('!seen[$0]++').stateful
    assert _AwkProgram('{ t += $1 } END { print t }').stateful
    assert _AwkProgram('{print NR}').stateful
    # FS/OFS assignment alone stays stateless (per-row config)
    assert not _AwkProgram('{ OFS = ":"; print $1, $2 }').stateful


def test_awk_unsupported_fails_loud():
    with pytest.raises(ValueError, match="not supported"):
        _AwkProgram('{ while (1) print }')
    with pytest.raises(ValueError, match="not supported"):
        _AwkProgram('{ getline x }')


def test_awk_op_stateless_parallel(ray_session):
    import ray.data as rd

    ds = rd.from_items(
        [{"text": f"u{i} {i * 3}"} for i in range(100)]).repartition(8)
    out = build_op({"op": "awk",
                    "program": '$2 >= 150 {print $1}'})(ds).to_pandas()
    assert sorted(out["text"].tolist()) == sorted(
        f"u{i}" for i in range(50, 100))


def test_awk_op_stateful_sequential_ordered(ray_session):
    """NR / END force the ordered single pass: line numbers follow
    dataset order and END aggregates see every row exactly once."""
    import ray.data as rd

    ds = rd.from_items(
        [{"text": f"row {i}"} for i in range(50)]).repartition(4)
    out = build_op({"op": "awk",
                    "program": '{ t += $2 } END { print t, NR }'})(
        ds).to_pandas()
    assert out["text"].tolist() == [f"{sum(range(50))} 50"]

    nr = build_op({"op": "awk", "program": '{print NR ":" $2}'})(
        ds).to_pandas()["text"].tolist()
    assert nr == [f"{i + 1}:{i}" for i in range(50)]


def test_awk_op_custom_fs(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"text": "a|b|c"}, {"text": "d|e"}])
    out = build_op({"op": "awk", "fs": "|",
                    "program": '{print $2}'})(ds).to_pandas()
    assert sorted(out["text"].tolist()) == ["b", "e"]


def test_bloblang_plus_concatenates_strings(ray_session):
    """Bloblang `+` on strings concatenates (upstream arithmetic.go),
    numeric add otherwise — the string path feeds the awk example."""
    import ray.data as rd

    ds = rd.from_items([{"a": "x", "n": 3}])
    out = build_op({"op": "mapping", "text":
                    'root.s = this.a + "_" + this.n.string()\n'
                    'root.m = this.n + 1'})(ds).to_pandas()
    assert out["s"].tolist() == ["x_3"]
    assert out["m"].tolist() == [4]


def test_awk_printf():
    assert run_awk(r'{ printf "%s:%d\n", $1, $2 }',
                   ["a 5", "b 7"]) == ["a:5", "b:7"]
    # fragments join across records until a newline lands
    assert run_awk(r'{ printf "%s", $1 } END { print "" }',
                   ["a", "b", "c"]) == ["abc"]
    assert run_awk(r'{ printf("%05d|%x\n", $1, $1) }',
                   ["255"]) == ["00255|ff"]
    # unterminated tail still flushes at finish
    assert run_awk(r'{ printf "%s-", $1 }', ["x", "y"]) == ["x-y-"]
