"""Edge connectors (rayflow/ops/net.py): stdin / loopback-socket
inputs, socket/stdout outputs — the reference's ``stdin`` /
``socket`` / ``socket_server`` / ``stdout`` io plane, loopback-only."""

import io
import json
import socket
import threading

import pytest

from rayflow.ops import build_op


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_read_stdin_lines_and_json(ray_session, monkeypatch):
    monkeypatch.setattr("sys.stdin", io.StringIO("alpha\nbeta\n\ngamma\n"))
    ds = build_op({"op": "read_stdin"})()
    assert ds.to_pandas()["text"].tolist() == ["alpha", "beta", "gamma"]

    monkeypatch.setattr("sys.stdin", io.StringIO(
        '{"k": 1, "v": "a"}\n{"k": 2, "v": "b"}\n'))
    df = build_op({"op": "read_stdin", "codec": "json"})().to_pandas()
    assert df["k"].tolist() == [1, 2] and df["v"].tolist() == ["a", "b"]


def test_read_stdin_max_rows(ray_session, monkeypatch):
    monkeypatch.setattr("sys.stdin", io.StringIO("a\nb\nc\nd\n"))
    ds = build_op({"op": "read_stdin", "max_rows": 2})()
    assert ds.count() == 2


def test_socket_server_input(ray_session):
    port = _free_port()

    def client():
        for attempt in range(50):
            try:
                c = socket.create_connection(("127.0.0.1", port),
                                             timeout=0.2)
                break
            except OSError:
                import time
                time.sleep(0.1)
        with c:
            c.sendall(b'{"x": 10}\n{"x": 20}\n')

    t = threading.Thread(target=client, daemon=True)
    t.start()
    ds = build_op({"op": "read_socket_server",
                   "address": f"127.0.0.1:{port}",
                   "codec": "json"})()
    t.join()
    assert sorted(ds.to_pandas()["x"].tolist()) == [10, 20]


def test_socket_client_input_and_socket_output_roundtrip(ray_session):
    """write_socket → loopback server → read_socket: a dataset survives
    a full socket round trip."""
    import ray.data as rd

    port = _free_port()
    srv = socket.socket()
    srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv.bind(("127.0.0.1", port))
    srv.listen(2)
    received: list[bytes] = []

    def server():
        conn, _ = srv.accept()
        with conn:
            while True:
                d = conn.recv(1 << 16)
                if not d:
                    break
                received.append(d)

    t = threading.Thread(target=server, daemon=True)
    t.start()
    ds = rd.from_items([{"a": i, "b": f"s{i}"} for i in range(5)])
    build_op({"op": "write_socket",
              "address": f"127.0.0.1:{port}"})(ds)
    t.join(timeout=5)
    srv.close()
    rows = [json.loads(x) for x in b"".join(received).splitlines()]
    assert sorted(r["a"] for r in rows) == list(range(5))

    # client-mode input: a fresh server replays those rows back
    port2 = _free_port()
    srv2 = socket.socket()
    srv2.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    srv2.bind(("127.0.0.1", port2))
    srv2.listen(1)

    def server2():
        conn, _ = srv2.accept()
        with conn:
            conn.sendall(b"".join(
                json.dumps(r).encode() + b"\n" for r in rows))

    t2 = threading.Thread(target=server2, daemon=True)
    t2.start()
    df = build_op({"op": "read_socket",
                   "address": f"127.0.0.1:{port2}",
                   "codec": "json"})().to_pandas()
    t2.join(timeout=5)
    srv2.close()
    assert sorted(df["a"].tolist()) == list(range(5))
    assert set(df.columns) == {"a", "b"}


def test_unix_socket_input(ray_session, tmp_path):
    path = str(tmp_path / "rf.sock")

    srv = socket.socket(socket.AF_UNIX)
    srv.bind(path)
    srv.listen(1)

    def server():
        conn, _ = srv.accept()
        with conn:
            conn.sendall(b"one\ntwo\n")

    t = threading.Thread(target=server, daemon=True)
    t.start()
    ds = build_op({"op": "read_socket",
                   "address": f"unix://{path}"})()
    t.join(timeout=5)
    srv.close()
    assert ds.to_pandas()["text"].tolist() == ["one", "two"]


def test_write_stdout(ray_session, capsys):
    import sys

    import ray.data as rd

    ds = rd.from_items([{"a": 1}, {"a": 2}])
    # capsys replaces sys.stdout with an object whose .buffer may not
    # exist; write through a shim that appends to a list
    chunks: list[bytes] = []

    class _Buf:
        @staticmethod
        def write(b):
            chunks.append(b)

    class _Out:
        buffer = _Buf()

        @staticmethod
        def flush():
            pass

    real = sys.stdout
    sys.stdout = _Out()
    try:
        build_op({"op": "write_stdout"})(ds)
    finally:
        sys.stdout = real
    rows = [json.loads(x) for x in b"".join(chunks).splitlines()]
    assert sorted(r["a"] for r in rows) == [1, 2]


def test_bad_address_fails_loud():
    with pytest.raises(ValueError, match="host:port"):
        build_op({"op": "read_socket", "address": "nonsense"})()
