"""Edge connectors: stdin / loopback-socket inputs and socket/stdout
outputs (reference inventory rows ``stdin``, ``socket``,
``socket_server``, ``stdout`` — ``⟨upstream: internal/impl/io/
input_stdin.go, input_socket.go, input_socket_server.go,
output_stdout.go, output_socket.go⟩``).

Topology note (the honest 100-TB adjudication): these are EDGE
connectors.  A process's stdin or one TCP connection is a single file
descriptor — the upstream reference consumes it with exactly one
connector goroutine too, so the driver owning the fd here is the same
topology, not a Ray-Data compromise.  The driver reads the stream in
bounded chunks and ships each chunk into the object store as it
arrives (``from_arrow`` per chunk → ``union``), so nothing
driver-side ever holds the whole stream; sinks drain with
``iter_batches`` (streaming, backpressured), never ``take_all``.
At data scale the fan-in belongs UPSTREAM of the engine (many source
partitions = many files / broker partitions — the CDC change-log
layout), and these ops exist for CLI composability (`echo ... |
rayflow run -`) and socket-fed micro-pipelines, same as the
reference's.

No external network is used or assumed: sockets are loopback/unix by
default and every test binds 127.0.0.1 or a unix path.
"""

from __future__ import annotations

import json
from typing import Any, Iterable

import pyarrow as pa

from rayflow.ops import register_op

_CHUNK_ROWS = 65536          # rows per object-store block on ingest


def _decode_lines(lines: Iterable[str], codec: str,
                  column: str) -> Iterable[pa.Table]:
    """Chunked decode: yields one Arrow table per _CHUNK_ROWS lines so
    edge ingest streams into the object store instead of accumulating
    driver-side."""
    buf: list[str] = []

    def flush(rows: list[str]) -> pa.Table:
        if codec == "lines":
            return pa.table({column: pa.array(rows, pa.string())})
        if codec == "json":
            return pa.Table.from_pylist([json.loads(r) for r in rows])
        raise ValueError(f"unknown codec {codec!r} (lines|json)")

    for ln in lines:
        ln = ln.rstrip("\n").rstrip("\r")
        if not ln:
            continue
        buf.append(ln)
        if len(buf) >= _CHUNK_ROWS:
            yield flush(buf)
            buf = []
    if buf:
        yield flush(buf)


def _tables_to_dataset(tables: Iterable[pa.Table]):
    import ray.data as rd

    ds = None
    for t in tables:
        part = rd.from_arrow(t)
        ds = part if ds is None else ds.union(part)
    if ds is None:                      # empty stream → empty dataset
        ds = rd.from_arrow(pa.table({}))
    return ds


@register_op("read_stdin")
def build_read_stdin(*, codec: str = "lines", column: str = "text",
                     max_rows: int | None = None):
    """``stdin`` input: consume the process's stdin until EOF (or
    ``max_rows``) — ``lines`` puts each line in ``column``, ``json``
    parses one object per line into columns."""

    def source(_=None):
        import itertools
        import sys

        it: Iterable[str] = sys.stdin
        if max_rows is not None:
            it = itertools.islice(it, max_rows)
        return _tables_to_dataset(_decode_lines(it, codec, column))

    return source


def _parse_address(address: str) -> tuple[str, Any]:
    """``unix:///path`` or ``host:port`` → (family, connect_arg)."""
    import socket as so

    if address.startswith("unix://"):
        return so.AF_UNIX, address[len("unix://"):]
    host, _, port = address.rpartition(":")
    if not host or not port.isdigit():
        raise ValueError(f"socket address {address!r}: want host:port "
                         "or unix:///path")
    return so.AF_INET, (host, int(port))


def _recv_lines(conn, max_rows_left: list[int]) -> Iterable[str]:
    """Yield newline-framed messages from one connection until EOF or
    the shared row budget runs out."""
    tail = b""
    while max_rows_left[0] != 0:
        data = conn.recv(1 << 16)
        if not data:
            break
        tail += data
        *lines, tail = tail.split(b"\n")
        for ln in lines:
            if max_rows_left[0] == 0:
                return
            max_rows_left[0] -= 1
            yield ln.decode("utf-8", errors="replace")
    if tail and max_rows_left[0] != 0:
        max_rows_left[0] -= 1
        yield tail.decode("utf-8", errors="replace")


@register_op("read_socket")
def build_read_socket(*, address: str, codec: str = "lines",
                      column: str = "text", max_rows: int | None = None,
                      connect_timeout_s: float = 10.0):
    """``socket`` input (client mode): connect to ``host:port`` /
    ``unix:///path``, read newline-framed messages until the peer
    closes (or ``max_rows``)."""

    def source(_=None):
        import socket as so

        fam, arg = _parse_address(address)
        conn = so.socket(fam, so.SOCK_STREAM)
        conn.settimeout(connect_timeout_s)
        conn.connect(arg)
        conn.settimeout(None)
        budget = [max_rows if max_rows is not None else -1]
        try:
            return _tables_to_dataset(
                _decode_lines(_recv_lines(conn, budget), codec, column))
        finally:
            conn.close()

    return source


@register_op("read_socket_server")
def build_read_socket_server(*, address: str, codec: str = "lines",
                             column: str = "text",
                             max_conns: int = 1,
                             max_rows: int | None = None,
                             accept_timeout_s: float = 10.0):
    """``socket_server`` input: bind, accept ``max_conns`` connections
    sequentially (each drained to EOF), then return the dataset.
    Bounded by construction — a batch Dataset needs a finite input;
    the unbounded analogue is the CDC ``tail`` daemon."""

    def source(_=None):
        import socket as so

        fam, arg = _parse_address(address)
        srv = so.socket(fam, so.SOCK_STREAM)
        srv.setsockopt(so.SOL_SOCKET, so.SO_REUSEADDR, 1)
        srv.bind(arg)
        srv.listen(max_conns)
        srv.settimeout(accept_timeout_s)
        budget = [max_rows if max_rows is not None else -1]

        def all_lines():
            for _i in range(max_conns):
                if budget[0] == 0:
                    return
                try:
                    conn, _peer = srv.accept()
                except TimeoutError:
                    return
                with conn:
                    yield from _recv_lines(conn, budget)

        try:
            return _tables_to_dataset(
                _decode_lines(all_lines(), codec, column))
        finally:
            srv.close()

    return source


def _encode_batch(t: pa.Table, codec: str, column: str | None) -> bytes:
    if codec == "json":
        return b"".join(
            json.dumps(r, default=str).encode() + b"\n"
            for r in t.to_pylist())
    if codec == "lines":
        col = column or t.column_names[0]
        return b"".join(
            str(v).encode() + b"\n"
            for v in t.column(col).to_pylist())
    raise ValueError(f"unknown codec {codec!r} (lines|json)")


@register_op("write_stdout")
def build_write_stdout(*, codec: str = "json", column: str | None = None):
    """``stdout`` output: stream the dataset to stdout as JSON lines
    (or one ``column`` per line) — `iter_batches`, never `take_all`."""

    def sink(ds):
        import sys

        for t in ds.iter_batches(batch_format="pyarrow",
                                 batch_size=4096):
            sys.stdout.buffer.write(_encode_batch(t, codec, column))
        sys.stdout.flush()
        return None

    return sink


@register_op("write_socket")
def build_write_socket(*, address: str, codec: str = "json",
                       column: str | None = None,
                       connect_timeout_s: float = 10.0):
    """``socket`` output: stream newline-framed messages to a
    loopback/unix socket (backpressure = TCP flow control)."""

    def sink(ds):
        import socket as so

        fam, arg = _parse_address(address)
        conn = so.socket(fam, so.SOCK_STREAM)
        conn.settimeout(connect_timeout_s)
        conn.connect(arg)
        conn.settimeout(None)
        try:
            for t in ds.iter_batches(batch_format="pyarrow",
                                     batch_size=4096):
                conn.sendall(_encode_batch(t, codec, column))
        finally:
            conn.close()
        return None

    return sink
