"""HTTP edge connectors (rayflow/ops/http.py): loopback-only
``http_client`` input/output, ``http_request`` processor (actor-pool
RPC enrichment), ``http_server`` input, and the ``http_server`` +
``sync_response`` request/reply serve loop."""

import json
import socket
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from rayflow.ops import build_op
from rayflow.ops.http import serve_http_sync


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


class _Quiet(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _reply(self, status: int, body: bytes):
        self.send_response(status)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


def _serve(handler_cls, port: int) -> ThreadingHTTPServer:
    srv = ThreadingHTTPServer(("127.0.0.1", port), handler_cls)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv


def test_read_http_client_json_and_lines(ray_session):
    port = _free_port()

    class H(_Quiet):
        def do_GET(self):
            self._reply(200, b'{"k": 1, "v": "a"}\n{"k": 2, "v": "b"}\n')

    srv = _serve(H, port)
    try:
        df = build_op({"op": "read_http_client",
                       "url": f"http://127.0.0.1:{port}/feed"})().to_pandas()
        assert df["k"].tolist() == [1, 2] and df["v"].tolist() == ["a", "b"]

        df = build_op({"op": "read_http_client", "codec": "lines",
                       "url": f"http://127.0.0.1:{port}/feed",
                       "n_polls": 2})().to_pandas()
        assert len(df) == 4 and "text" in df.columns
    finally:
        srv.shutdown()


def test_write_http_client_posts_batches(ray_session):
    import ray.data as rd

    port = _free_port()
    got: list[bytes] = []

    class H(_Quiet):
        def do_POST(self):
            got.append(self.rfile.read(
                int(self.headers.get("Content-Length", 0))))
            self._reply(202, b"")

    srv = _serve(H, port)
    try:
        ds = rd.from_items([{"a": i} for i in range(7)])
        build_op({"op": "write_http_client",
                  "url": f"http://127.0.0.1:{port}/in"})(ds)
    finally:
        srv.shutdown()
    rows = [json.loads(x) for x in b"".join(got).splitlines()]
    assert sorted(r["a"] for r in rows) == list(range(7))


def test_http_request_processor_batch_and_row_modes(ray_session):
    """Enrichment RPC: the endpoint uppercases; batch mode sends one
    JSON-lines request per Arrow batch, row mode one per row — same
    result either way."""
    import ray.data as rd

    port = _free_port()

    class H(_Quiet):
        def do_POST(self):
            body = self.rfile.read(
                int(self.headers.get("Content-Length", 0)))
            out = b"".join(
                json.dumps(json.loads(ln).upper()).encode() + b"\n"
                for ln in body.splitlines() if ln.strip())
            self._reply(200, out)

    srv = _serve(H, port)
    try:
        ds = rd.from_items([{"text": t} for t in ["ab", "cd", "ef"]])
        for mode in ("batch", "row"):
            df = build_op({"op": "http_request", "mode": mode,
                           "url": f"http://127.0.0.1:{port}/up",
                           "column": "text", "out": "up"})(ds).to_pandas()
            assert sorted(df["up"].tolist()) == ["AB", "CD", "EF"], mode
            assert df["_error"].isna().all()
    finally:
        srv.shutdown()


def test_http_request_dead_letters_on_server_error(ray_session):
    import ray.data as rd

    port = _free_port()

    class H(_Quiet):
        def do_POST(self):
            self._reply(500, b"boom")

    srv = _serve(H, port)
    try:
        ds = rd.from_items([{"text": "x"}])
        df = build_op({"op": "http_request",
                       "url": f"http://127.0.0.1:{port}/bad",
                       "column": "text", "out": "up"})(ds).to_pandas()
        assert df["up"].isna().all()
        assert df["_error"].str.contains("http_request").all()
    finally:
        srv.shutdown()


def test_read_http_server_input(ray_session):
    port = _free_port()

    def client():
        import http.client
        import time

        for _ in range(50):
            try:
                c = http.client.HTTPConnection("127.0.0.1", port,
                                               timeout=0.5)
                c.request("POST", "/", body=b'{"x": 10}\n{"x": 20}\n')
                c.getresponse().read()
                c.close()
                return
            except OSError:
                time.sleep(0.1)

    t = threading.Thread(target=client, daemon=True)
    t.start()
    ds = build_op({"op": "read_http_server",
                   "address": f"127.0.0.1:{port}",
                   "codec": "json"})()
    t.join(timeout=5)
    assert sorted(ds.to_pandas()["x"].tolist()) == [10, 20]


def test_serve_http_sync_request_reply(ray_session):
    """http_server + sync_response: the reply is the PROCESSED message
    (a mapping step runs per request)."""
    port = _free_port()
    results: list[bytes] = []

    def client():
        import http.client
        import time

        for _ in range(100):
            try:
                c = http.client.HTTPConnection("127.0.0.1", port,
                                               timeout=30.0)
                c.request("POST", "/", body=b'{"text": "hello"}\n'
                                            b'{"text": "world"}\n')
                r = c.getresponse()
                assert r.status == 200
                results.append(r.read())
                c.close()
                return
            except OSError:
                time.sleep(0.1)

    t = threading.Thread(target=client, daemon=True)
    t.start()
    n = serve_http_sync(
        {"steps": [{"op": "mapping",
                    "text": "root.text = this.text.uppercase()"}]},
        f"127.0.0.1:{port}", max_requests=1)
    t.join(timeout=10)
    assert n == 1
    rows = [json.loads(x) for x in results[0].splitlines()]
    assert sorted(r["text"] for r in rows) == ["HELLO", "WORLD"]


def test_serve_http_sync_pipeline_error_returns_500(ray_session):
    port = _free_port()
    status: list[int] = []

    def client():
        import http.client
        import time

        for _ in range(100):
            try:
                c = http.client.HTTPConnection("127.0.0.1", port,
                                               timeout=30.0)
                c.request("POST", "/", body=b"not json\n")
                r = c.getresponse()
                status.append(r.status)
                r.read()
                c.close()
                return
            except OSError:
                time.sleep(0.1)

    t = threading.Thread(target=client, daemon=True)
    t.start()
    serve_http_sync({"steps": []}, f"127.0.0.1:{port}", max_requests=1,
                    codec="json")
    t.join(timeout=10)
    assert status == [500]


def test_non_loopback_fails_loud():
    with pytest.raises(ValueError, match="loopback"):
        build_op({"op": "read_http_client",
                  "url": "http://example.com/feed"})
    with pytest.raises(ValueError, match="loopback"):
        build_op({"op": "http_request", "url": "http://10.0.0.1:80/x",
                  "column": "a", "out": "b"})
