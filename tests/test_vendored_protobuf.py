"""Unit tests for the vendored minimal google.protobuf runtime
(datafusion_loki_spark/_vendor) against PySpark's checked-in
StateMessage_pb2 gencode plus a synthetic descriptor.

The end-to-end oracle is the JVM: tests/test_streaming.py's
transformWithState tests drive this runtime against Spark's state
server, which parses with real protobuf-java — any wire divergence
fails there. These tests pin the byte-level contract locally (golden
bytes hand-derived from https://protobuf.dev/programming-guides/encoding/)
so a regression points at the exact primitive.

They run with the real wheel too (ensure_protobuf returns "system"):
every assertion below is also true of the reference runtime.
"""

from __future__ import annotations

import pytest

from datafusion_loki_spark._vendor import ensure_protobuf

ensure_protobuf()

# "ensure" is idempotent: once the shim is importable a second call
# reports "system", so detect which implementation actually loaded by
# module path.
import google.protobuf as _gp  # noqa: E402

IS_VENDORED = "_vendor" in (_gp.__file__ or "")

sm = pytest.importorskip("pyspark.sql.streaming.proto.StateMessage_pb2")


def test_golden_nested_oneof_request():
    # SetHandleState.state=CREATED(1) -> 08 01; wrapped twice as field 1
    # then field 2 length-delimited; version=1 -> 08 01 at the top.
    m = sm.StateRequest(
        version=1,
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        ),
    )
    assert m.SerializeToString() == b"\x08\x01\x12\x04\n\x02\x08\x01"


def test_empty_oneof_message_member_serializes_tag_len0():
    # the JVM dispatches on getMethodCase(), so an EMPTY oneof member
    # must still hit the wire (tag + length 0)
    r = sm.ImplicitGroupingKeyRequest(removeImplicitKey=sm.RemoveImplicitKey())
    assert r.SerializeToString() == b"\x12\x00"


def test_negative_int64_is_ten_byte_twos_complement():
    d = sm.DeleteTimer(expiryTimestampMs=-1)
    assert d.SerializeToString() == b"\x08" + b"\xff" * 9 + b"\x01"
    d2 = sm.DeleteTimer()
    d2.ParseFromString(d.SerializeToString())
    assert d2.expiryTimestampMs == -1


def test_submessage_attaches_on_write_not_on_read():
    c = sm.StateCallCommand()
    c.stateName = "s1"
    _ = c.ttl.durationMs  # bare read: no attach
    assert c.SerializeToString() == b"\n\x02s1"
    c.ttl.durationMs = 0  # write (even to default): attaches ttl
    assert c.SerializeToString() == b"\n\x02s1\x22\x00"


def test_oneof_last_writer_wins_on_parse_and_assign():
    req = sm.StateRequest(statefulProcessorCall=sm.StatefulProcessorCall())
    assert req.WhichOneof("method") == "statefulProcessorCall"
    other = sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest()
    )
    req.ParseFromString(other.SerializeToString())
    assert req.WhichOneof("method") == "implicitGroupingKeyRequest"
    assert not req.HasField("statefulProcessorCall")


def test_proto3_optional_presence_on_timer_info():
    t = sm.TimerInfo(timestampMs=5)
    assert t.SerializeToString() == b"\x10\x05"
    assert not t.HasField("key")
    t2 = sm.TimerInfo(key=b"")  # explicitly-set empty optional: present
    assert t2.SerializeToString() == b"\n\x00"
    assert t2.HasField("key")


def test_repeated_message_and_scalar_roundtrip():
    resp = sm.StateResponseWithTimer(
        statusCode=0, errorMessage="", requireNextFetch=True
    )
    resp.timer.add(timestampMs=123)
    resp.timer.add(key=b"k", timestampMs=-5)
    out = sm.StateResponseWithTimer()
    out.ParseFromString(resp.SerializeToString())
    assert [t.timestampMs for t in out.timer] == [123, -5]
    assert out.timer[1].key == b"k"
    assert out.requireNextFetch is True

    lg = sm.StateResponseWithListGet(
        statusCode=3, errorMessage="bad", value=[b"a", b"bb"]
    )
    lg2 = sm.StateResponseWithListGet()
    lg2.ParseFromString(lg.SerializeToString())
    assert (lg2.statusCode, lg2.errorMessage, list(lg2.value)) == (
        3,
        "bad",
        [b"a", b"bb"],
    )


def test_unknown_fields_are_skipped():
    # field 99 varint + field 98 length-delimited, then a known field
    payload = b"\x98\x06\x2a" + b"\x92\x06\x03abc" + b"\x08\x07"
    msg = sm.StateResponse()
    msg.ParseFromString(payload)
    assert msg.statusCode == 7


def test_utf8_string_roundtrip():
    m = sm.StateResponseWithStringTypeVal(statusCode=1, value="héllo ∆")
    m2 = sm.StateResponseWithStringTypeVal()
    m2.ParseFromString(m.SerializeToString())
    assert m2.value == "héllo ∆"


def test_copy_from_and_clear():
    a = sm.StateCallCommand(stateName="x")
    a.ttl.durationMs = 9
    b = sm.StateCallCommand()
    b.CopyFrom(a)
    assert b.stateName == "x" and b.ttl.durationMs == 9
    assert b.SerializeToString() == a.SerializeToString()
    b.Clear()
    assert b.SerializeToString() == b""


def test_int_assignment_range_checked():
    # the reference runtime rejects out-of-range ints AT ASSIGNMENT;
    # before the round-9 fix an oversized int32 serialized as a 64-bit
    # varint that protobuf-java silently truncates (statusCode is int32,
    # DeleteTimer.expiryTimestampMs is int64).
    with pytest.raises(ValueError):
        sm.StateResponse(statusCode=2**31)
    with pytest.raises(ValueError):
        sm.StateResponse(statusCode=-(2**31) - 1)
    with pytest.raises(ValueError):
        sm.DeleteTimer(expiryTimestampMs=2**63)
    # boundary values are fine and roundtrip
    m = sm.DeleteTimer(expiryTimestampMs=-(2**63))
    out = sm.DeleteTimer()
    out.ParseFromString(m.SerializeToString())
    assert out.expiryTimestampMs == -(2**63)


def test_cleared_submessage_detaches_from_parent():
    # Clear()/ClearField/oneof eviction must detach a held child ref:
    # before the round-9 fix a later mutation through the old reference
    # re-marked presence on the parent, so HasField said True while
    # serialization emitted nothing (inconsistent presence state).
    c = sm.StateCallCommand(stateName="x")
    c.ttl.durationMs = 5
    held = c.ttl
    c.Clear()
    held.durationMs = 7  # standalone mutation — must not re-attach
    assert not c.HasField("ttl")
    assert c.SerializeToString() == b""
    assert held.durationMs == 7  # the detached child keeps working

    c2 = sm.StateCallCommand(stateName="y")
    c2.ttl.durationMs = 1
    held2 = c2.ttl
    c2.ClearField("ttl")
    held2.durationMs = 2
    assert not c2.HasField("ttl")
    assert c2.SerializeToString() == b"\n\x01y"

    # oneof sibling eviction detaches the loser
    req = sm.StateRequest()
    loser = req.statefulProcessorCall
    loser.setHandleState.state = sm.CREATED
    assert req.WhichOneof("method") == "statefulProcessorCall"
    req.implicitGroupingKeyRequest.setImplicitKey.key = b"k"
    assert req.WhichOneof("method") == "implicitGroupingKeyRequest"
    loser.setHandleState.state = sm.CLOSED  # detached — must not flip back
    assert req.WhichOneof("method") == "implicitGroupingKeyRequest"


@pytest.mark.skipif(not IS_VENDORED, reason="shim-internal surface")
def test_overlong_varint_masks_to_64_bits():
    # a 10-byte varint can carry 70 payload bits; the reference runtime
    # truncates to 64 (round-9 fix: unmasked, to_signed64/uint64 fields
    # returned Python ints >= 2**64)
    from google.protobuf.internal import wire

    overlong = b"\xff" * 9 + b"\x7f"  # all 70 bits set
    v, pos = wire.decode_varint(overlong, 0)
    assert pos == 10
    assert v == (1 << 64) - 1
    assert wire.to_signed64(v) == -1


@pytest.mark.skipif(not IS_VENDORED, reason="shim-internal surface")
def test_packed_repeated_primitives_via_synthetic_descriptor():
    # StateMessage.proto has no packed fields; pin the proto3 packed
    # default with a hand-assembled FileDescriptorProto: message P with
    # repeated int32 xs = 1 and repeated sint64 zs = 2.
    from google.protobuf import descriptor_pool
    from google.protobuf.internal import builder, wire

    def ld(field_number: int, payload: bytes) -> bytes:
        return (
            wire.encode_tag(field_number, wire.WT_LEN)
            + wire.encode_varint(len(payload))
            + payload
        )

    def vi(field_number: int, v: int) -> bytes:
        return wire.encode_tag(field_number, wire.WT_VARINT) + wire.encode_varint(v)

    def field(name: bytes, number: int, ftype: int) -> bytes:
        return ld(2, ld(1, name) + vi(3, number) + vi(4, 3) + vi(5, ftype))

    msg_p = ld(1, b"P") + field(b"xs", 1, 5) + field(b"zs", 2, 18)
    file_proto = ld(1, b"synthetic_packed.proto") + ld(2, b"tv") + ld(4, msg_p)

    fd = descriptor_pool.Default().AddSerializedFile(file_proto)
    g: dict = {}
    builder.BuildMessageAndEnumDescriptors(fd, g)
    builder.BuildTopDescriptorsAndMessages(fd, "tv_synth", g)
    P = g["P"]

    m = P(xs=[1, 300, 0], zs=[-2, 3])
    data = m.SerializeToString()
    # packed: one length-delimited record per field
    assert data == (
        b"\x0a\x04\x01\xac\x02\x00"  # xs: 1, 300, 0
        + b"\x12\x02\x03\x06"  # zs zigzag: -2 -> 3, 3 -> 6
    )
    m2 = P()
    m2.ParseFromString(data)
    assert list(m2.xs) == [1, 300, 0] and list(m2.zs) == [-2, 3]
    # unpacked encoding of the same fields must also parse
    unpacked = vi(1, 1) + vi(1, 300) + vi(1, 0)
    m3 = P()
    m3.ParseFromString(unpacked)
    assert list(m3.xs) == [1, 300, 0]


# --- property: serialize/parse roundtrip over random messages -------------

from hypothesis import given, settings, strategies as hst  # noqa: E402

_TEXT = hst.text(max_size=40)
_BYTES = hst.binary(max_size=40)
_I64 = hst.integers(min_value=-(2**63), max_value=2**63 - 1)
_I32 = hst.integers(min_value=-(2**31), max_value=2**31 - 1)


@settings(max_examples=300, deadline=None)
@given(
    status=_I32,
    err=_TEXT,
    fetch=hst.booleans(),
    timers=hst.lists(
        hst.tuples(hst.none() | _BYTES, _I64), max_size=6
    ),
)
def test_timer_response_roundtrip_stable(status, err, fetch, timers):
    # random int32 (incl. negative -> 10-byte varints), unicode strings,
    # optional-bytes presence, repeated messages: parse(serialize(m))
    # must equal m, and re-serialization must be byte-stable
    m = sm.StateResponseWithTimer(
        statusCode=status, errorMessage=err, requireNextFetch=fetch
    )
    for key, ts in timers:
        if key is None:
            m.timer.add(timestampMs=ts)
        else:
            m.timer.add(key=key, timestampMs=ts)
    data = m.SerializeToString()
    m2 = sm.StateResponseWithTimer()
    m2.ParseFromString(data)
    assert m2 == m
    assert m2.SerializeToString() == data
    assert m2.statusCode == status and m2.errorMessage == err
    assert [t.timestampMs for t in m2.timer] == [ts for _k, ts in timers]
    for parsed_t, (key, _ts) in zip(m2.timer, timers):
        assert parsed_t.HasField("key") == (key is not None)
        if key is not None:
            assert parsed_t.key == key


@settings(max_examples=300, deadline=None)
@given(
    choice=hst.sampled_from(
        ["setHandleState", "getValueState", "getListState", "timer"]
    ),
    name=_TEXT,
    ttl=hst.none() | _I64.filter(lambda v: v >= 0),
    expiry=_I64,
    state=hst.integers(min_value=0, max_value=5),
)
def test_state_request_oneof_roundtrip(choice, name, ttl, expiry, state):
    # the request side: every oneof choice roundtrips with its payload
    # and WhichOneof agrees before and after the wire
    if choice == "setHandleState":
        call = sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=state)
        )
    elif choice == "timer":
        call = sm.StatefulProcessorCall(
            timerStateCall=sm.TimerStateCallCommand(
                register=sm.RegisterTimer(expiryTimestampMs=expiry)
            )
        )
    else:
        cmd = sm.StateCallCommand()
        cmd.stateName = name
        if ttl is not None:
            cmd.ttl.durationMs = ttl
        call = sm.StatefulProcessorCall(**{choice: cmd})
    req = sm.StateRequest(version=2, statefulProcessorCall=call)
    out = sm.StateRequest()
    out.ParseFromString(req.SerializeToString())
    assert out == req
    assert out.WhichOneof("method") == "statefulProcessorCall"
    inner = out.statefulProcessorCall
    assert inner.WhichOneof("method") == (
        "timerStateCall" if choice == "timer" else choice
    )
    if choice in ("getValueState", "getListState"):
        got = getattr(inner, choice)
        assert got.stateName == name
        assert got.HasField("ttl") == (ttl is not None)
        if ttl is not None:
            assert got.ttl.durationMs == ttl
