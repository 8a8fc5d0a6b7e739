"""Unit tests for the vendored protobuf wire-format shim
(garden_net_backend_spark/_vendor/protoshim).

The shim's integration proof is the TWS streaming test (the JVM parses
our bytes and we parse the JVM's); these tests pin the wire format
itself against HAND-DERIVED golden bytes from the public encoding spec
(https://protobuf.dev/programming-guides/encoding/) so a regression
shows up as a byte diff, not as an opaque JVM stream failure.

Skipped when the REAL protobuf package provides google.protobuf (the
shim only activates in its absence)."""

import pytest

from garden_net_backend_spark._vendor import ensure_protobuf_shim

pytestmark = pytest.mark.skipif(
    not ensure_protobuf_shim(),
    reason="real protobuf installed; shim inactive",
)


from garden_net_backend_spark._vendor.protoshim.google.protobuf.internal import (  # noqa: E402
    wire as w,
)


def test_varint_golden():
    # spec examples: 1 → 01, 150 → 9601, 300 → ac02
    assert w.encode_varint(1) == bytes.fromhex("01")
    assert w.encode_varint(150) == bytes.fromhex("9601")
    assert w.encode_varint(300) == bytes.fromhex("ac02")
    # max uint64 → ten 0xff..01 bytes
    assert w.encode_varint((1 << 64) - 1) == b"\xff" * 9 + b"\x01"
    for v in (0, 1, 127, 128, 300, 1 << 32, (1 << 64) - 1):
        dec, i = w.decode_varint(w.encode_varint(v), 0)
        assert dec == v and i == len(w.encode_varint(v))


def test_negative_int_two_complement():
    # spec: negative int32/int64 encode as 10-byte two's complement
    enc = w.encode_varint(-2)
    assert enc == bytes.fromhex("feffffffffffffffff01")
    dec, _ = w.decode_varint(enc, 0)
    assert w.decode_scalar(w.T_INT64, dec) == -2
    assert w.decode_scalar(w.T_INT32, dec) == -2


def test_zigzag_golden():
    # spec table: 0→0, -1→1, 1→2, -2→3, 2→4
    for orig, enc in [(0, 0), (-1, 1), (1, 2), (-2, 3), (2, 4)]:
        assert w.zigzag_encode(orig) == enc
        assert w.zigzag_decode(enc) == orig


def test_string_field_golden():
    # spec example: field 2 (string) = "testing" →
    # 12 07 74 65 73 74 69 6e 67
    tag = w.encode_tag(2, w.WIRE_LEN)
    payload = w.encode_scalar(w.T_STRING, "testing")
    assert (tag + payload).hex() == "120774657374696e67"


def test_message_roundtrip_via_pb2():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    # nested construction exactly as the TWS client does it
    cmd = sm.StateCallCommand()
    cmd.stateName = "s"
    cmd.schema = "a int"
    cmd.ttl.durationMs = 1234  # attach-on-write submessage
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(getValueState=cmd)
    )
    data = req.SerializeToString()
    back = sm.StateRequest()
    back.ParseFromString(data)
    got = back.statefulProcessorCall.getValueState
    assert got.stateName == "s"
    assert got.schema == "a int"
    assert got.ttl.durationMs == 1234

    # field-number order on the wire: stateName(1) then schema(2)
    assert data.index(b"\x0a\x01s") < data.index(b"\x12\x05a int")


def test_submessage_read_does_not_mark_present():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    cmd = sm.StateCallCommand()
    cmd.stateName = "x"
    _ = cmd.ttl.durationMs  # bare READ of the submessage chain
    assert not cmd.HasField("ttl")
    assert b"\x22" not in cmd.SerializeToString()  # no ttl tag (4<<3|2)
    cmd.ttl.durationMs = 1  # write attaches
    assert cmd.HasField("ttl")


def test_empty_message_oneof_presence():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    # an empty oneof arm must still serialize (presence IS the signal)
    req = sm.ImplicitGroupingKeyRequest(removeImplicitKey=sm.RemoveImplicitKey())
    assert req.SerializeToString() == b"\x12\x00"  # field 2, len 0


def test_enum_constants_and_defaults():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    assert sm.PRE_INIT == 0 and sm.CLOSED == 5
    assert sm.HandleState.Value("INITIALIZED") == 2
    assert sm.HandleState.Name(3) == "DATA_PROCESSED"
    resp = sm.StateResponse()
    # proto3 defaults on unset fields
    assert resp.statusCode == 0 and resp.errorMessage == "" and resp.value == b""


def test_repeated_message_and_unknown_field_skip():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    kv1 = sm.KeyAndValuePair(key=b"k1", value=b"v1").SerializeToString()
    kv2 = sm.KeyAndValuePair(key=b"k2", value=b"v2").SerializeToString()
    payload = (
        b"\x08\x02"  # statusCode = 2
        + b"\x1a" + bytes([len(kv1)]) + kv1  # kvPair #1
        + b"\x1a" + bytes([len(kv2)]) + kv2  # kvPair #2
        + b"\xfa\x01\x03abc"  # unknown field 31 (len-delimited) → skipped
        + b"\x20\x01"  # requireNextFetch = true
    )
    resp = sm.StateResponseWithMapIterator()
    resp.ParseFromString(payload)
    assert resp.statusCode == 2
    assert [(p.key, p.value) for p in resp.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b"v2"),
    ]
    assert resp.requireNextFetch is True


def test_repeated_scalar_bytes():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    put = sm.ListStatePut()
    put.value.append(b"\x00\x01")
    put.value.append(b"\x02")
    put.fetchWithArrow = True
    data = put.SerializeToString()
    back = sm.ListStatePut()
    back.ParseFromString(data)
    assert list(back.value) == [b"\x00\x01", b"\x02"]
    assert back.fetchWithArrow is True


def test_int64_negative_roundtrip():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    t = sm.RegisterTimer(expiryTimestampMs=-7)
    back = sm.RegisterTimer()
    back.ParseFromString(t.SerializeToString())
    assert back.expiryTimestampMs == -7


def _make_message_class(fields):
    """Concrete Message subclass over a hand-built descriptor (the same
    wiring the builder does), for wire shapes StateMessage lacks."""
    from garden_net_backend_spark._vendor.protoshim.google.protobuf import (
        descriptor as d,
    )
    from garden_net_backend_spark._vendor.protoshim.google.protobuf.message import (
        Message,
    )

    oneofs = [d.OneofDescriptor("alt", "T.alt")] if any(
        f.oneof_index is not None for f in fields
    ) else []
    desc = d.Descriptor("T", "T", fields, oneofs=oneofs)
    cls = type("T", (Message,), {"DESCRIPTOR": desc})
    desc._concrete_class = cls
    return cls


def test_packed_fixed_width_decode():
    """Packed repeated float/double/sfixed32 payloads step fixed-width
    elements, not varints (spec: packed element encoding follows the
    field's scalar wire type)."""
    import struct

    from garden_net_backend_spark._vendor.protoshim.google.protobuf import (
        descriptor as d,
    )

    FD = d.FieldDescriptor
    cls = _make_message_class(
        [
            FD("f", 1, FD.TYPE_FLOAT, FD.LABEL_REPEATED),
            FD("dbl", 2, FD.TYPE_DOUBLE, FD.LABEL_REPEATED),
            FD("sf", 3, FD.TYPE_SFIXED32, FD.LABEL_REPEATED),
            FD("iv", 4, FD.TYPE_INT64, FD.LABEL_REPEATED),
        ]
    )
    fpay = struct.pack("<ff", 1.5, -2.25)
    dpay = struct.pack("<d", 3.75)
    spay = struct.pack("<i", -9)
    ipay = w.encode_varint(300) + w.encode_varint(1)
    data = (
        w.encode_tag(1, w.WIRE_LEN) + w.encode_varint(len(fpay)) + fpay
        + w.encode_tag(2, w.WIRE_LEN) + w.encode_varint(len(dpay)) + dpay
        + w.encode_tag(3, w.WIRE_LEN) + w.encode_varint(len(spay)) + spay
        + w.encode_tag(4, w.WIRE_LEN) + w.encode_varint(len(ipay)) + ipay
    )
    m = cls()
    m.ParseFromString(data)
    assert list(m.f) == [1.5, -2.25]
    assert list(m.dbl) == [3.75]
    assert list(m.sf) == [-9]
    assert list(m.iv) == [300, 1]


def test_packed_fixed_truncated_raises():
    from garden_net_backend_spark._vendor.protoshim.google.protobuf import (
        descriptor as d,
    )
    from garden_net_backend_spark._vendor.protoshim.google.protobuf.message import (
        DecodeError,
    )

    FD = d.FieldDescriptor
    cls = _make_message_class([FD("f", 1, FD.TYPE_FLOAT, FD.LABEL_REPEATED)])
    # 3 bytes cannot hold a 4-byte float element
    data = w.encode_tag(1, w.WIRE_LEN) + w.encode_varint(3) + b"\x00\x01\x02"
    with pytest.raises(DecodeError):
        cls().ParseFromString(data)


def test_whichoneof_scoped_to_named_oneof():
    """WhichOneof must ignore non-oneof fields and honor last-set-wins
    within the oneof (public API semantics)."""
    from garden_net_backend_spark._vendor.protoshim.google.protobuf import (
        descriptor as d,
    )

    FD = d.FieldDescriptor
    cls = _make_message_class(
        [
            FD("flag", 1, FD.TYPE_BOOL, FD.LABEL_OPTIONAL),
            FD("a", 2, FD.TYPE_INT64, FD.LABEL_OPTIONAL, oneof_index=0),
            FD("b", 3, FD.TYPE_STRING, FD.LABEL_OPTIONAL, oneof_index=0),
        ]
    )
    m = cls()
    m.flag = True  # non-oneof field set FIRST (dict insertion order trap)
    assert m.WhichOneof("alt") is None
    m.a = 5
    assert m.WhichOneof("alt") == "a"
    m.b = "x"  # setting a sibling clears the other member
    assert m.WhichOneof("alt") == "b"
    assert not m.HasField("a")
    assert m.flag is True  # non-oneof field untouched
    with pytest.raises(ValueError):
        m.WhichOneof("nope")


def test_whichoneof_on_state_request():
    import pyspark.sql.streaming.proto.StateMessage_pb2 as sm

    req = sm.StateRequest(version=2, statefulProcessorCall=sm.StatefulProcessorCall())
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    # version (a non-oneof field, set first) must not shadow the arm
    assert back.WhichOneof("method") == "statefulProcessorCall"
