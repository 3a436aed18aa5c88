"""Pure-stdlib binary serde: MessagePack, Avro, Protobuf wire formats.

The reference ships ``msgpack``, ``avro`` and ``protobuf`` processors
(``⟨upstream: internal/impl/msgpack/processor.go⟩``, ``⟨upstream:
internal/impl/avro/processor.go⟩``, ``⟨upstream:
internal/impl/protobuf/processor.go⟩``) backed by third-party codec
libraries.  None of those libraries exist in this container, but all
three WIRE FORMATS are small public specifications — so the codecs here
are implemented from the specs directly with ``struct``/``zlib``:

- MessagePack: https://github.com/msgpack/msgpack/blob/master/spec.md
- Avro binary encoding + object container file:
  https://avro.apache.org/docs/current/specification/
- Protobuf wire format: https://protobuf.dev/programming-guides/encoding/

Decode/encode is intrinsically per-datum (each row carries one opaque
payload — same shape as ``parse_xml``); the per-row loop lives at the
serde boundary only, never in an analytic hot path.  Protobuf needs a
field spec (the wire format does not carry names/types); Avro needs its
writer schema, except for object-container payloads which embed it.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

import pyarrow as pa

from rayflow.ops import register_op

# ---------------------------------------------------------------------------
# MessagePack
# ---------------------------------------------------------------------------


def msgpack_encode(obj) -> bytes:
    """Serialise a JSON-shaped value to MessagePack bytes."""
    out = io.BytesIO()
    _mp_write(out, obj)
    return out.getvalue()


def _mp_write(out: io.BytesIO, o) -> None:
    w = out.write
    if o is None:
        w(b"\xc0")
    elif o is True:
        w(b"\xc3")
    elif o is False:
        w(b"\xc2")
    elif isinstance(o, int):
        if 0 <= o <= 0x7F:
            w(struct.pack("B", o))
        elif -32 <= o < 0:
            w(struct.pack("b", o))
        elif 0 <= o <= 0xFF:
            w(b"\xcc" + struct.pack("B", o))
        elif 0 <= o <= 0xFFFF:
            w(b"\xcd" + struct.pack(">H", o))
        elif 0 <= o <= 0xFFFFFFFF:
            w(b"\xce" + struct.pack(">I", o))
        elif 0 <= o <= 0xFFFFFFFFFFFFFFFF:
            w(b"\xcf" + struct.pack(">Q", o))
        elif -0x80 <= o < 0:
            w(b"\xd0" + struct.pack("b", o))
        elif -0x8000 <= o < 0:
            w(b"\xd1" + struct.pack(">h", o))
        elif -0x80000000 <= o < 0:
            w(b"\xd2" + struct.pack(">i", o))
        elif -0x8000000000000000 <= o < 0:
            w(b"\xd3" + struct.pack(">q", o))
        else:
            raise OverflowError(f"msgpack: int out of 64-bit range: {o}")
    elif isinstance(o, float):
        w(b"\xcb" + struct.pack(">d", o))
    elif isinstance(o, str):
        b = o.encode("utf-8")
        n = len(b)
        if n <= 31:
            w(struct.pack("B", 0xA0 | n))
        elif n <= 0xFF:
            w(b"\xd9" + struct.pack("B", n))
        elif n <= 0xFFFF:
            w(b"\xda" + struct.pack(">H", n))
        else:
            w(b"\xdb" + struct.pack(">I", n))
        w(b)
    elif isinstance(o, (bytes, bytearray)):
        n = len(o)
        if n <= 0xFF:
            w(b"\xc4" + struct.pack("B", n))
        elif n <= 0xFFFF:
            w(b"\xc5" + struct.pack(">H", n))
        else:
            w(b"\xc6" + struct.pack(">I", n))
        w(bytes(o))
    elif isinstance(o, (list, tuple)):
        n = len(o)
        if n <= 15:
            w(struct.pack("B", 0x90 | n))
        elif n <= 0xFFFF:
            w(b"\xdc" + struct.pack(">H", n))
        else:
            w(b"\xdd" + struct.pack(">I", n))
        for v in o:
            _mp_write(out, v)
    elif isinstance(o, dict):
        n = len(o)
        if n <= 15:
            w(struct.pack("B", 0x80 | n))
        elif n <= 0xFFFF:
            w(b"\xde" + struct.pack(">H", n))
        else:
            w(b"\xdf" + struct.pack(">I", n))
        for k, v in o.items():
            _mp_write(out, k)
            _mp_write(out, v)
    else:
        raise TypeError(f"msgpack: cannot encode {type(o).__name__}")


def msgpack_decode(data: bytes):
    """Parse MessagePack bytes into the equivalent Python value."""
    val, pos = _mp_read(data, 0)
    if pos != len(data):
        raise ValueError(
            f"msgpack: {len(data) - pos} trailing bytes after document")
    return val


def msgpack_decode_stream(data: bytes) -> list:
    """Parse a concatenated stream of MessagePack documents."""
    vals, pos = [], 0
    while pos < len(data):
        v, pos = _mp_read(data, pos)
        vals.append(v)
    return vals


def _mp_read(b: bytes, p: int):
    t = b[p]
    p += 1
    if t <= 0x7F:                                   # positive fixint
        return t, p
    if t >= 0xE0:                                   # negative fixint
        return t - 0x100, p
    if 0x80 <= t <= 0x8F:                           # fixmap
        return _mp_read_map(b, p, t & 0x0F)
    if 0x90 <= t <= 0x9F:                           # fixarray
        return _mp_read_arr(b, p, t & 0x0F)
    if 0xA0 <= t <= 0xBF:                           # fixstr
        n = t & 0x1F
        return b[p:p + n].decode("utf-8"), p + n
    if t == 0xC0:
        return None, p
    if t == 0xC2:
        return False, p
    if t == 0xC3:
        return True, p
    if t == 0xC4 or t == 0xC5 or t == 0xC6:         # bin 8/16/32
        n, p = _mp_len(b, p, t - 0xC4)
        return b[p:p + n], p + n
    if t == 0xCA:
        return struct.unpack_from(">f", b, p)[0], p + 4
    if t == 0xCB:
        return struct.unpack_from(">d", b, p)[0], p + 8
    if 0xCC <= t <= 0xCF:                           # uint 8/16/32/64
        fmt, sz = ((">B", 1), (">H", 2), (">I", 4), (">Q", 8))[t - 0xCC]
        return struct.unpack_from(fmt, b, p)[0], p + sz
    if 0xD0 <= t <= 0xD3:                           # int 8/16/32/64
        fmt, sz = ((">b", 1), (">h", 2), (">i", 4), (">q", 8))[t - 0xD0]
        return struct.unpack_from(fmt, b, p)[0], p + sz
    if t == 0xD9 or t == 0xDA or t == 0xDB:         # str 8/16/32
        n, p = _mp_len(b, p, t - 0xD9)
        return b[p:p + n].decode("utf-8"), p + n
    if t == 0xDC or t == 0xDD:                      # array 16/32
        n, p = _mp_len(b, p, 1 + (t - 0xDC))
        return _mp_read_arr(b, p, n)
    if t == 0xDE or t == 0xDF:                      # map 16/32
        n, p = _mp_len(b, p, 1 + (t - 0xDE))
        return _mp_read_map(b, p, n)
    raise ValueError(f"msgpack: unsupported type byte 0x{t:02x} "
                     f"(ext types are out of scope)")


def _mp_len(b: bytes, p: int, size_class: int):
    fmt, sz = ((">B", 1), (">H", 2), (">I", 4))[size_class]
    return struct.unpack_from(fmt, b, p)[0], p + sz


def _mp_read_arr(b: bytes, p: int, n: int):
    out = []
    for _ in range(n):
        v, p = _mp_read(b, p)
        out.append(v)
    return out, p


def _mp_read_map(b: bytes, p: int, n: int):
    out = {}
    for _ in range(n):
        k, p = _mp_read(b, p)
        v, p = _mp_read(b, p)
        out[k] = v
    return out, p


# ---------------------------------------------------------------------------
# Avro binary encoding (+ object container files)
# ---------------------------------------------------------------------------


def _zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        byte = z & 0x7F
        z >>= 7
        if z:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


def _zigzag_read(b: bytes, p: int):
    shift = z = 0
    while True:
        byte = b[p]
        p += 1
        z |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (z >> 1) ^ -(z & 1), p


def _avro_named(schema):
    """Resolve the schema's type name (str shorthand or dict form)."""
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def avro_encode(obj, schema) -> bytes:
    if isinstance(schema, str) and schema.lstrip().startswith(("{", "[")):
        schema = json.loads(schema)
    out = io.BytesIO()
    _avro_write(out, obj, schema)
    return out.getvalue()


def _avro_write(out: io.BytesIO, o, schema) -> None:
    t = _avro_named(schema)
    w = out.write
    if t == "null":
        if o is not None:
            raise TypeError("avro: non-null value for null schema")
    elif t == "boolean":
        w(b"\x01" if o else b"\x00")
    elif t in ("int", "long"):
        w(_zigzag_encode(int(o)))
    elif t == "float":
        w(struct.pack("<f", o))
    elif t == "double":
        w(struct.pack("<d", o))
    elif t == "bytes":
        w(_zigzag_encode(len(o)))
        w(bytes(o))
    elif t == "string":
        b = o.encode("utf-8")
        w(_zigzag_encode(len(b)))
        w(b)
    elif t == "fixed":
        if len(o) != schema["size"]:
            raise ValueError("avro: fixed size mismatch")
        w(bytes(o))
    elif t == "enum":
        w(_zigzag_encode(schema["symbols"].index(o)))
    elif t == "array":
        if o:
            w(_zigzag_encode(len(o)))
            for v in o:
                _avro_write(out, v, schema["items"])
        w(b"\x00")
    elif t == "map":
        if o:
            w(_zigzag_encode(len(o)))
            for k, v in o.items():
                _avro_write(out, k, "string")
                _avro_write(out, v, schema["values"])
        w(b"\x00")
    elif t == "record":
        for f in schema["fields"]:
            _avro_write(out, o.get(f["name"]), f["type"])
    elif t == "union":
        for i, branch in enumerate(schema):
            if _avro_matches(o, branch):
                w(_zigzag_encode(i))
                _avro_write(out, o, branch)
                return
        raise TypeError(f"avro: no union branch matches {type(o).__name__}")
    else:
        raise ValueError(f"avro: unsupported schema type {t!r}")


def _avro_matches(o, branch) -> bool:
    t = _avro_named(branch)
    return (
        (t == "null" and o is None)
        or (t == "boolean" and isinstance(o, bool))
        or (t in ("int", "long") and isinstance(o, int)
            and not isinstance(o, bool))
        or (t in ("float", "double") and isinstance(o, float))
        or (t == "string" and isinstance(o, str))
        or (t in ("bytes", "fixed") and isinstance(o, (bytes, bytearray)))
        or (t in ("record", "map") and isinstance(o, dict))
        or (t == "array" and isinstance(o, list))
        or (t == "enum" and isinstance(o, str))
    )


def avro_decode(data: bytes, schema):
    if isinstance(schema, str) and schema.lstrip().startswith(("{", "[")):
        schema = json.loads(schema)
    val, pos = _avro_read(data, 0, schema)
    if pos != len(data):
        raise ValueError(
            f"avro: {len(data) - pos} trailing bytes after datum")
    return val


def _avro_read(b: bytes, p: int, schema):
    t = _avro_named(schema)
    if t == "null":
        return None, p
    if t == "boolean":
        return b[p] != 0, p + 1
    if t in ("int", "long"):
        return _zigzag_read(b, p)
    if t == "float":
        return struct.unpack_from("<f", b, p)[0], p + 4
    if t == "double":
        return struct.unpack_from("<d", b, p)[0], p + 8
    if t == "bytes":
        n, p = _zigzag_read(b, p)
        return b[p:p + n], p + n
    if t == "string":
        n, p = _zigzag_read(b, p)
        return b[p:p + n].decode("utf-8"), p + n
    if t == "fixed":
        n = schema["size"]
        return b[p:p + n], p + n
    if t == "enum":
        i, p = _zigzag_read(b, p)
        return schema["symbols"][i], p
    if t == "array":
        out = []
        while True:
            n, p = _zigzag_read(b, p)
            if n == 0:
                return out, p
            if n < 0:                       # block with byte-size prefix
                n = -n
                _, p = _zigzag_read(b, p)
            for _ in range(n):
                v, p = _avro_read(b, p, schema["items"])
                out.append(v)
    if t == "map":
        out = {}
        while True:
            n, p = _zigzag_read(b, p)
            if n == 0:
                return out, p
            if n < 0:
                n = -n
                _, p = _zigzag_read(b, p)
            for _ in range(n):
                k, p = _avro_read(b, p, "string")
                v, p = _avro_read(b, p, schema["values"])
                out[k] = v
    if t == "record":
        out = {}
        for f in schema["fields"]:
            out[f["name"]], p = _avro_read(b, p, f["type"])
        return out, p
    if t == "union":
        i, p = _zigzag_read(b, p)
        return _avro_read(b, p, schema[i])
    raise ValueError(f"avro: unsupported schema type {t!r}")


_AVRO_MAGIC = b"Obj\x01"

_OCF_META = {"type": "map", "values": "bytes"}


def avro_ocf_decode(data: bytes) -> list:
    """Parse an Avro OBJECT CONTAINER FILE (self-describing: embeds its
    writer schema in the header).  Supports the ``null`` and ``deflate``
    codecs — the two the spec requires/recommends without extra libs."""
    if data[:4] != _AVRO_MAGIC:
        raise ValueError("avro: not an object container file (bad magic)")
    meta, p = _avro_read(data, 4, _OCF_META)
    sync = data[p:p + 16]
    p += 16
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    out = []
    while p < len(data):
        count, p = _zigzag_read(data, p)
        nbytes, p = _zigzag_read(data, p)
        block = data[p:p + nbytes]
        p += nbytes
        if data[p:p + 16] != sync:
            raise ValueError("avro: sync marker mismatch (corrupt block)")
        p += 16
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        elif codec != "null":
            raise ValueError(f"avro: unsupported codec {codec!r}")
        q = 0
        for _ in range(count):
            v, q = _avro_read(block, q, schema)
            out.append(v)
    return out


def avro_ocf_encode(records: list, schema, *, codec: str = "null",
                    sync: bytes = b"\x00" * 16) -> bytes:
    """Build an Avro object container file around ``records``."""
    if isinstance(schema, str) and schema.lstrip().startswith(("{", "[")):
        schema_obj = json.loads(schema)
        schema_json = schema
    else:
        schema_obj = schema
        schema_json = json.dumps(schema)
    body = io.BytesIO()
    for r in records:
        _avro_write(body, r, schema_obj)
    block = body.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        block = comp.compress(block) + comp.flush()
    elif codec != "null":
        raise ValueError(f"avro: unsupported codec {codec!r}")
    out = io.BytesIO()
    out.write(_AVRO_MAGIC)
    meta = {"avro.schema": schema_json.encode(), "avro.codec": codec.encode()}
    _avro_write(out, meta, _OCF_META)
    out.write(sync)
    out.write(_zigzag_encode(len(records)))
    out.write(_zigzag_encode(len(block)))
    out.write(block)
    out.write(sync)
    return out.getvalue()


# ---------------------------------------------------------------------------
# Protobuf wire format
# ---------------------------------------------------------------------------
#
# The wire format carries only (field number, wire type); names and
# semantic types come from a SPEC the caller provides — the same role a
# compiled descriptor plays for the reference's processor:
#
#     spec = {1: ("user_id", "uint64"), 2: ("name", "string"),
#             3: ("score", "double"), 4: ("tags", "repeated string"),
#             5: ("address", ("message", ADDRESS_SPEC))}
#
# Types: int32/int64/uint32/uint64/bool/enum (varint), sint32/sint64
# (zigzag varint), fixed64/sfixed64/double, fixed32/sfixed32/float,
# string/bytes (len-delimited), ("message", subspec) for nesting; prefix
# "repeated " for repeated fields (scalars accept packed encoding).


def _pb_varint_encode(n: int) -> bytes:
    if n < 0:
        n &= (1 << 64) - 1          # two's-complement 64-bit, per spec
    out = bytearray()
    while True:
        byte = n & 0x7F
        n >>= 7
        if n:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


def _pb_varint_read(b: bytes, p: int):
    shift = n = 0
    while True:
        byte = b[p]
        p += 1
        n |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return n, p
        shift += 7
        if shift > 63:
            raise ValueError("protobuf: varint longer than 64 bits")


_PB_SCALARS = {
    "int32", "int64", "uint32", "uint64", "bool", "enum",
    "sint32", "sint64", "fixed64", "sfixed64", "double",
    "fixed32", "sfixed32", "float", "string", "bytes",
}

_PB_VARINTS = {"int32", "int64", "uint32", "uint64", "bool", "enum",
               "sint32", "sint64"}
_PB_F64 = {"fixed64", "sfixed64", "double"}
_PB_F32 = {"fixed32", "sfixed32", "float"}


def _pb_field_type(t):
    """Normalise a spec entry type → (base, repeated, subspec)."""
    repeated = False
    if isinstance(t, str) and t.startswith("repeated "):
        repeated, t = True, t[len("repeated "):]
    if isinstance(t, tuple):
        base, sub = t
        if base == "repeated":
            if not (isinstance(sub, tuple) and sub[0] == "message"):
                raise ValueError(f"protobuf: bad repeated spec {t!r}")
            return "message", True, sub[1]
        if base != "message":
            raise ValueError(f"protobuf: bad spec tuple {t!r}")
        return "message", repeated, sub
    if t not in _PB_SCALARS:
        raise ValueError(f"protobuf: unknown type {t!r}")
    return t, repeated, None


def _pb_wire_type(base: str) -> int:
    if base in _PB_VARINTS:
        return 0
    if base in _PB_F64:
        return 1
    if base in _PB_F32:
        return 5
    return 2                                    # len-delimited


def _pb_encode_scalar(base: str, v, sub) -> bytes:
    if base in ("sint32", "sint64"):
        return _pb_varint_encode((v << 1) ^ (v >> 63) if v < 0 else v << 1)
    if base in _PB_VARINTS:
        return _pb_varint_encode(int(v))
    if base == "double":
        return struct.pack("<d", v)
    if base in ("fixed64", "sfixed64"):
        return struct.pack("<q" if base == "sfixed64" else "<Q", v)
    if base == "float":
        return struct.pack("<f", v)
    if base in ("fixed32", "sfixed32"):
        return struct.pack("<i" if base == "sfixed32" else "<I", v)
    if base == "string":
        b = v.encode("utf-8")
        return _pb_varint_encode(len(b)) + b
    if base == "bytes":
        return _pb_varint_encode(len(v)) + bytes(v)
    if base == "message":
        b = proto_encode(v, sub)
        return _pb_varint_encode(len(b)) + b
    raise AssertionError(base)


def proto_encode(obj: dict, spec: dict) -> bytes:
    """Serialise ``obj`` with the field spec (proto3 semantics: absent
    and None fields are simply omitted)."""
    out = bytearray()
    for num, (name, t) in sorted(spec.items()):
        base, repeated, sub = _pb_field_type(t)
        v = obj.get(name)
        if v is None:
            continue
        wt = _pb_wire_type(base)
        key = _pb_varint_encode((num << 3) | wt)
        if repeated:
            if wt in (0, 1, 5) and base != "message":
                # packed encoding (proto3 default for scalars)
                payload = b"".join(
                    _pb_encode_scalar(base, x, sub) for x in v)
                out += _pb_varint_encode((num << 3) | 2)
                out += _pb_varint_encode(len(payload))
                out += payload
            else:
                for x in v:
                    out += key + _pb_encode_scalar(base, x, sub)
        else:
            out += key + _pb_encode_scalar(base, v, sub)
    return bytes(out)


def _pb_from_varint(base: str, n: int):
    if base in ("sint32", "sint64"):
        return (n >> 1) ^ -(n & 1)
    if base == "bool":
        return bool(n)
    if base in ("int32", "int64"):
        if n >= 1 << 63:
            return n - (1 << 64)
        return n
    return n


def proto_decode(data: bytes, spec: dict) -> dict:
    """Parse protobuf wire bytes with the field spec.  Unknown fields
    are skipped by wire type (forward compatible, per spec); repeated
    scalars accept both packed and unpacked encodings."""
    out: dict = {}
    p = 0
    while p < len(data):
        key, p = _pb_varint_read(data, p)
        num, wt = key >> 3, key & 0x07
        ent = spec.get(num)
        if ent is None:                         # skip unknown field
            if wt == 0:
                _, p = _pb_varint_read(data, p)
            elif wt == 1:
                p += 8
            elif wt == 5:
                p += 4
            elif wt == 2:
                n, p = _pb_varint_read(data, p)
                p += n
            else:
                raise ValueError(f"protobuf: unsupported wire type {wt}")
            continue
        name, t = ent
        base, repeated, sub = _pb_field_type(t)
        if wt == 0:
            n, p = _pb_varint_read(data, p)
            v = _pb_from_varint(base, n)
        elif wt == 1:
            fmt = {"double": "<d", "sfixed64": "<q"}.get(base, "<Q")
            v = struct.unpack_from(fmt, data, p)[0]
            p += 8
        elif wt == 5:
            fmt = {"float": "<f", "sfixed32": "<i"}.get(base, "<I")
            v = struct.unpack_from(fmt, data, p)[0]
            p += 4
        elif wt == 2:
            n, p = _pb_varint_read(data, p)
            chunk = data[p:p + n]
            p += n
            if base == "string":
                v = chunk.decode("utf-8")
            elif base == "bytes":
                v = chunk
            elif base == "message":
                v = proto_decode(chunk, sub)
            elif repeated:                      # packed scalars
                q, vals = 0, []
                while q < len(chunk):
                    if base in _PB_VARINTS:
                        n2, q = _pb_varint_read(chunk, q)
                        vals.append(_pb_from_varint(base, n2))
                    elif base in _PB_F64:
                        fmt = {"double": "<d", "sfixed64": "<q"}.get(
                            base, "<Q")
                        vals.append(struct.unpack_from(fmt, chunk, q)[0])
                        q += 8
                    else:
                        fmt = {"float": "<f", "sfixed32": "<i"}.get(
                            base, "<I")
                        vals.append(struct.unpack_from(fmt, chunk, q)[0])
                        q += 4
                out.setdefault(name, []).extend(vals)
                continue
            else:
                raise ValueError(
                    f"protobuf: field {name!r} ({base}) cannot be "
                    f"len-delimited")
            v = v
        else:
            raise ValueError(f"protobuf: unsupported wire type {wt}")
        if repeated:
            out.setdefault(name, []).append(v)
        else:
            out[name] = v
    return out


# ---------------------------------------------------------------------------
# Ops
# ---------------------------------------------------------------------------


def _json_cell(v) -> str:
    """Decoded value → a string cell (scalars bare, containers JSON)."""
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (dict, list)):
        return json.dumps(_jsonable(v), sort_keys=True)
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _jsonable(v):
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, dict):
        return {k: _jsonable(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_jsonable(x) for x in v]
    return v


def _explode_records(t: pa.Table, column: str, records_of, *,
                     drop_source: bool) -> pa.Table:
    """Shared parse-op body: per row decode → records, flatten top-level
    keys to string columns (nested values as JSON), `_error` on failure,
    parent columns replicated onto exploded rows."""
    rows: list[dict] = []
    errs: list[str | None] = []
    parent_idx: list[int] = []
    for i, payload in enumerate(t.column(column).to_pylist()):
        if payload is None:
            continue
        try:
            recs = records_of(payload)
            for r in recs:
                rows.append(
                    {k: _json_cell(v) if v is not None else None
                     for k, v in r.items()}
                    if isinstance(r, dict) else {"value": _json_cell(r)})
                errs.append(None)
                parent_idx.append(i)
        except Exception as e:                  # noqa: BLE001 — dead-letter
            rows.append({})
            errs.append(f"{type(e).__name__}: {e}")
            parent_idx.append(i)
    parents = [c for c in t.column_names if c != column] if drop_source \
        else list(t.column_names)
    out = t.select(parents).take(pa.array(parent_idx, pa.int64())) \
        if parents else pa.table({"_idx": pa.array(parent_idx, pa.int64())})
    if not parents:
        out = out.drop_columns(["_idx"])
    keys = sorted({k for r in rows for k in r})
    for k in keys:
        out = out.append_column(
            k, pa.array([r.get(k) for r in rows], pa.string()))
    return out.append_column("_error", pa.array(errs, pa.string()))


@register_op("parse_msgpack")
def build_parse_msgpack(*, column: str = "payload",
                        drop_source: bool = True,
                        stream: bool = False):
    """MessagePack document(s) → rows (``msgpack`` processor ``to_json``
    operator, ``⟨upstream: internal/impl/msgpack/processor.go⟩``) using
    the pure-spec codec above.  ``stream=True`` parses a concatenated
    document stream per cell (one output row each)."""
    def apply(ds):
        def records_of(payload):
            if isinstance(payload, str):
                payload = bytes.fromhex(payload)
            if stream:
                return msgpack_decode_stream(payload)
            return [msgpack_decode(payload)]

        def fn(t: pa.Table) -> pa.Table:
            return _explode_records(
                t, column, records_of, drop_source=drop_source)

        return ds.map_batches(fn, batch_format="pyarrow")

    return apply


@register_op("parse_avro")
def build_parse_avro(*, column: str = "payload",
                     schema: dict | str | None = None,
                     drop_source: bool = True):
    """Avro payload → rows (``avro`` processor, ``⟨upstream:
    internal/impl/avro/processor.go⟩``).  Object-container payloads
    (magic ``Obj\\x01``) are self-describing; raw datum payloads need
    ``schema`` (the writer schema, dict or JSON string)."""
    schema_obj = json.loads(schema) if isinstance(schema, str) and \
        schema.lstrip().startswith(("{", "[")) else schema

    def apply(ds):
        def records_of(payload):
            if isinstance(payload, str):
                payload = bytes.fromhex(payload)
            if payload[:4] == _AVRO_MAGIC:
                return avro_ocf_decode(payload)
            if schema_obj is None:
                raise ValueError(
                    "parse_avro: raw datum payload needs schema=")
            return [avro_decode(payload, schema_obj)]

        def fn(t: pa.Table) -> pa.Table:
            return _explode_records(
                t, column, records_of, drop_source=drop_source)

        return ds.map_batches(fn, batch_format="pyarrow")

    return apply


@register_op("parse_protobuf")
def build_parse_protobuf(*, column: str = "payload", spec: dict,
                         drop_source: bool = True):
    """Protobuf message → row (``protobuf`` processor ``to_json``
    operator, ``⟨upstream: internal/impl/protobuf/processor.go⟩``).
    ``spec`` plays the compiled descriptor's role: ``{field_number:
    (name, type)}`` — see the wire-format section above for types."""
    spec = {int(k): tuple(v) for k, v in spec.items()}

    def apply(ds):
        def records_of(payload):
            if isinstance(payload, str):
                payload = bytes.fromhex(payload)
            return [proto_decode(payload, spec)]

        def fn(t: pa.Table) -> pa.Table:
            return _explode_records(
                t, column, records_of, drop_source=drop_source)

        return ds.map_batches(fn, batch_format="pyarrow")

    return apply


def _format_op(op_name: str, encode_cell):
    """Shared encode-op body: rows → one binary payload column."""
    def build(*, target: str = "payload", columns: list[str] | None = None):
        def apply(ds):
            def fn(t: pa.Table) -> pa.Table:
                cols = columns if columns is not None else [
                    c for c in t.column_names]
                sub = t.select(cols)
                payloads = [encode_cell(r) for r in sub.to_pylist()]
                return t.append_column(
                    target, pa.array(payloads, pa.binary()))

            return ds.map_batches(fn, batch_format="pyarrow")

        return apply

    return register_op(op_name)(build)


_format_op("format_msgpack", msgpack_encode)


@register_op("format_avro")
def build_format_avro(*, schema: dict | str, target: str = "payload",
                      columns: list[str] | None = None,
                      container: bool = False, codec: str = "null"):
    """Rows → Avro payload column (``avro`` processor ``from_json``
    direction).  ``container=True`` wraps each row in a one-record
    object container file (self-describing output); otherwise raw
    binary datums against ``schema``."""
    schema_obj = json.loads(schema) if isinstance(schema, str) and \
        schema.lstrip().startswith(("{", "[")) else schema

    def apply(ds):
        def fn(t: pa.Table) -> pa.Table:
            cols = columns if columns is not None else list(t.column_names)
            payloads = [
                avro_ocf_encode([r], schema_obj, codec=codec)
                if container else avro_encode(r, schema_obj)
                for r in t.select(cols).to_pylist()
            ]
            return t.append_column(target, pa.array(payloads, pa.binary()))

        return ds.map_batches(fn, batch_format="pyarrow")

    return apply


@register_op("format_protobuf")
def build_format_protobuf(*, spec: dict, target: str = "payload",
                          columns: list[str] | None = None):
    """Rows → protobuf wire-format payload column (``protobuf``
    processor ``from_json`` direction), against the same field spec
    ``parse_protobuf`` takes."""
    spec = {int(k): tuple(v) for k, v in spec.items()}

    def apply(ds):
        def fn(t: pa.Table) -> pa.Table:
            cols = columns if columns is not None else list(t.column_names)
            payloads = [proto_encode(r, spec)
                        for r in t.select(cols).to_pylist()]
            return t.append_column(target, pa.array(payloads, pa.binary()))

        return ds.map_batches(fn, batch_format="pyarrow")

    return apply


@register_op("format_parquet")
def build_format_parquet(*, target: str = "payload",
                         columns: list[str] | None = None,
                         compression: str = "zstd"):
    """Batch → ONE Parquet-file payload row (``parquet_encode``
    processor, ``⟨upstream: internal/impl/parquet/processor_encode.go⟩``).
    Unlike the JSON-shaped codecs this one is Arrow-native: the batch
    table is written straight into an in-memory Parquet file, no row
    materialization."""
    import pyarrow.parquet as pq

    def apply(ds):
        def fn(t: pa.Table) -> pa.Table:
            sub = t.select(columns) if columns is not None else t
            buf = io.BytesIO()
            pq.write_table(sub, buf, compression=compression)
            return pa.table({
                target: pa.array([buf.getvalue()], pa.binary()),
                "n_rows": pa.array([t.num_rows], pa.int64()),
            })

        return ds.map_batches(fn, batch_format="pyarrow")

    return apply


@register_op("parse_parquet")
def build_parse_parquet(*, column: str = "payload",
                        drop_source: bool = True):
    """Parquet-file payload → its rows (``parquet_decode`` processor,
    ``⟨upstream: internal/impl/parquet/processor_decode.go⟩``).
    Arrow-native and typed: each payload is read zero-copy from its
    buffer; parent columns are replicated onto the exploded rows."""
    import pyarrow.parquet as pq

    def apply(ds):
        def fn(t: pa.Table) -> pa.Table:
            parts: list[pa.Table] = []
            parents = [c for c in t.column_names if c != column] \
                if drop_source else list(t.column_names)
            for i, payload in enumerate(t.column(column).to_pylist()):
                if payload is None:
                    continue
                if isinstance(payload, str):
                    payload = bytes.fromhex(payload)
                inner = pq.read_table(pa.BufferReader(payload))
                for p in parents:
                    inner = inner.append_column(
                        p, pa.array([t.column(p)[i].as_py()] *
                                    inner.num_rows,
                                    t.schema.field(p).type))
                parts.append(inner)
            if not parts:
                return pa.table({})
            return pa.concat_tables(parts, promote_options="default")

        return ds.map_batches(fn, batch_format="pyarrow")

    return apply
