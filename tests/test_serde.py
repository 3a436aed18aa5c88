"""Pure-stdlib serde codecs: spec byte vectors, round-trips, Ray ops."""

import json
import math

import pyarrow as pa
import pytest

from rayflow.ops.serde import (
    avro_decode,
    avro_encode,
    avro_ocf_decode,
    avro_ocf_encode,
    msgpack_decode,
    msgpack_decode_stream,
    msgpack_encode,
    proto_decode,
    proto_encode,
)

# ---------------------------------------------------------------------------
# MessagePack — known encodings computed from the public spec tables
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("obj,encoded", [
    (None, b"\xc0"),
    (False, b"\xc2"),
    (True, b"\xc3"),
    (0, b"\x00"),
    (127, b"\x7f"),
    (-1, b"\xff"),
    (-32, b"\xe0"),
    (128, b"\xcc\x80"),
    (256, b"\xcd\x01\x00"),
    (65536, b"\xce\x00\x01\x00\x00"),
    (-33, b"\xd0\xdf"),
    (-129, b"\xd1\xff\x7f"),
    (1.5, b"\xcb\x3f\xf8\x00\x00\x00\x00\x00\x00"),
    ("", b"\xa0"),
    ("abc", b"\xa3abc"),
    (b"\x01\x02", b"\xc4\x02\x01\x02"),
    ([], b"\x90"),
    ([1, 2], b"\x92\x01\x02"),
    ({}, b"\x80"),
    ({"a": 1}, b"\x81\xa1a\x01"),
])
def test_msgpack_spec_vectors(obj, encoded):
    assert msgpack_encode(obj) == encoded
    assert msgpack_decode(encoded) == obj


def test_msgpack_compact_example():
    # the spec's front-page example: {"compact":true,"schema":0} is 18 bytes
    doc = {"compact": True, "schema": 0}
    b = msgpack_encode(doc)
    assert len(b) == 18
    assert b == bytes.fromhex("82a7636f6d70616374c3a6736368656d6100")
    assert msgpack_decode(b) == doc


def test_msgpack_roundtrip_nested():
    doc = {
        "id": 2**53, "neg": -(2**40), "pi": math.pi,
        "s": "héllo ✓", "b": b"\x00\xff", "n": None,
        "arr": [1, [2, {"k": "v"}], None, True],
        "big_str": "x" * 300, "big_arr": list(range(20)),
        "big_map": {str(i): i for i in range(20)},
    }
    assert msgpack_decode(msgpack_encode(doc)) == doc


def test_msgpack_stream_and_trailing():
    stream = msgpack_encode(1) + msgpack_encode({"a": "b"}) + msgpack_encode([2])
    assert msgpack_decode_stream(stream) == [1, {"a": "b"}, [2]]
    with pytest.raises(ValueError, match="trailing"):
        msgpack_decode(stream)


def test_msgpack_rejects_ext():
    with pytest.raises(ValueError, match="0xd4"):
        msgpack_decode(b"\xd4\x01\x00")  # fixext1


# ---------------------------------------------------------------------------
# Avro
# ---------------------------------------------------------------------------

RECORD_SCHEMA = {
    "type": "record", "name": "Event",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": "string"},
        {"name": "score", "type": "double"},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "props", "type": {"type": "map", "values": "long"}},
        {"name": "note", "type": ["null", "string"]},
        {"name": "kind", "type": {"type": "enum", "name": "Kind",
                                  "symbols": ["A", "B", "C"]}},
        {"name": "raw", "type": "bytes"},
    ],
}


def test_avro_zigzag_spec_vectors():
    # the spec's varint zig-zag examples: 0→00, -1→01, 1→02, -2→03, 2→04
    for n, b in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"),
                 (-2, b"\x03"), (2, b"\x04"), (-64, b"\x7f"),
                 (64, b"\x80\x01")]:
        assert avro_encode(n, "long") == b
        assert avro_decode(b, "long") == n


def test_avro_string_encoding():
    # len (zigzag) then utf-8 bytes: "foo" → 06 66 6f 6f
    assert avro_encode("foo", "string") == b"\x06foo"


def test_avro_record_roundtrip():
    rec = {"id": 7, "name": "alpha", "score": 2.5,
           "tags": ["x", "y"], "props": {"n": 3},
           "note": None, "kind": "B", "raw": b"\x00\x01"}
    b = avro_encode(rec, RECORD_SCHEMA)
    assert avro_decode(b, RECORD_SCHEMA) == rec
    rec2 = dict(rec, note="present")
    assert avro_decode(avro_encode(rec2, RECORD_SCHEMA),
                       RECORD_SCHEMA) == rec2


def test_avro_ocf_roundtrip_both_codecs():
    recs = [{"id": i, "name": f"n{i}", "score": i / 4, "tags": [],
             "props": {}, "note": None, "kind": "A", "raw": b""}
            for i in range(10)]
    for codec in ("null", "deflate"):
        blob = avro_ocf_encode(recs, RECORD_SCHEMA, codec=codec)
        assert blob[:4] == b"Obj\x01"
        assert avro_ocf_decode(blob) == recs


def test_avro_fixed_and_float():
    sch = {"type": "fixed", "name": "F", "size": 4}
    assert avro_decode(avro_encode(b"abcd", sch), sch) == b"abcd"
    assert avro_decode(avro_encode(1.5, "float"), "float") == 1.5


# ---------------------------------------------------------------------------
# Protobuf
# ---------------------------------------------------------------------------

ADDR_SPEC = {1: ("city", "string"), 2: ("zip", "uint32")}
SPEC = {
    1: ("user_id", "uint64"),
    2: ("name", "string"),
    3: ("score", "double"),
    4: ("tags", "repeated string"),
    5: ("address", ("message", ADDR_SPEC)),
    6: ("flags", "repeated int32"),
    7: ("delta", "sint64"),
    8: ("ratio", "float"),
    9: ("active", "bool"),
    10: ("blob", "bytes"),
}


def test_proto_spec_vectors():
    # protobuf.dev encoding guide: field 1 varint 150 → 08 96 01
    assert proto_encode({"user_id": 150}, SPEC) == b"\x08\x96\x01"
    # field 2 string "testing" → 12 07 74 65 73 74 69 6e 67
    assert proto_encode({"name": "testing"}, SPEC) == b"\x12\x07testing"
    assert proto_decode(b"\x08\x96\x01", SPEC) == {"user_id": 150}


def test_proto_sint_zigzag():
    # sint64 -2 zig-zags to 3
    assert proto_encode({"delta": -2}, SPEC) == b"\x38\x03"
    assert proto_decode(b"\x38\x03", SPEC) == {"delta": -2}


def test_proto_roundtrip_full():
    msg = {"user_id": 2**40, "name": "Ava", "score": -0.25,
           "tags": ["a", "b", "c"], "address": {"city": "x", "zip": 90210},
           "flags": [1, -1, 7], "delta": -(2**33), "ratio": 0.5,
           "active": True, "blob": b"\xde\xad"}
    assert proto_decode(proto_encode(msg, SPEC), SPEC) == msg


def test_proto_none_fields_omitted():
    assert proto_encode({"name": None}, SPEC) == b""
    assert proto_decode(b"", SPEC) == {}


def test_proto_unknown_fields_skipped():
    # field 99 (varint) + field 98 (len-delimited) prepended → ignored
    extra = b"\x98\x06\x05" + b"\x92\x06\x02hi" + b"\x08\x01"
    assert proto_decode(extra, SPEC) == {"user_id": 1}


def test_proto_unpacked_repeated_scalars_accepted():
    # proto2-style unpacked encoding of flags: two separate tag 6 varints
    data = b"\x30\x01\x30\x02"
    assert proto_decode(data, SPEC) == {"flags": [1, 2]}


def test_proto_int32_negative_two_complement():
    enc = proto_encode({"flags": [-1]}, SPEC)
    assert proto_decode(enc, SPEC) == {"flags": [-1]}


# ---------------------------------------------------------------------------
# Ray ops
# ---------------------------------------------------------------------------


def test_parse_msgpack_op(ray_session):
    import ray.data as rd

    from rayflow.ops import build_op

    payloads = [msgpack_encode({"a": i, "b": f"s{i}"}) for i in range(4)]
    payloads.append(b"\xd4\x00\x00")        # ext type → _error row
    ds = rd.from_items([{"src": i, "payload": p}
                        for i, p in enumerate(payloads)])
    out = build_op({"op": "parse_msgpack"})(ds).to_pandas()
    out = out.sort_values("src").reset_index(drop=True)
    good = out[out["_error"].isna()]
    assert list(good["a"]) == ["0", "1", "2", "3"]
    assert list(good["b"]) == ["s0", "s1", "s2", "s3"]
    assert out["_error"].notna().sum() == 1


def test_parse_avro_op_container(ray_session):
    import ray.data as rd

    from rayflow.ops import build_op

    recs = [{"id": i, "name": f"n{i}", "score": float(i), "tags": ["t"],
             "props": {}, "note": None, "kind": "A", "raw": b""}
            for i in range(3)]
    blob = avro_ocf_encode(recs, RECORD_SCHEMA, codec="deflate")
    ds = rd.from_items([{"payload": blob}])
    out = build_op({"op": "parse_avro"})(ds).to_pandas()
    assert len(out) == 3                    # container exploded to rows
    assert sorted(out["id"]) == ["0", "1", "2"]


def test_parse_protobuf_op_roundtrip(ray_session):
    import ray.data as rd

    from rayflow.ops import build_op

    spec = {1: ("uid", "uint64"), 2: ("txt", "string")}
    ds = rd.from_items([
        {"payload": proto_encode({"uid": i, "txt": f"m{i}"}, spec)}
        for i in range(5)
    ])
    # spec keys arrive as strings when declared in YAML/JSON configs
    conf_spec = {str(k): list(v) for k, v in spec.items()}
    out = build_op({"op": "parse_protobuf", "spec": conf_spec})(ds).to_pandas()
    assert sorted(int(u) for u in out["uid"]) == [0, 1, 2, 3, 4]


def test_format_then_parse_pipeline(ray_session):
    import ray.data as rd

    from rayflow.ops import build_op

    ds = rd.from_items([{"k": i, "v": f"row{i}"} for i in range(6)])
    enc = build_op({"op": "format_msgpack"})(ds).select_columns(["payload"])
    dec = build_op({"op": "parse_msgpack"})(enc)
    out = dec.to_pandas()
    assert sorted(out["k"]) == [str(i) for i in range(6)]
    assert sorted(out["v"]) == [f"row{i}" for i in range(6)]
