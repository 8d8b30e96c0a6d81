"""operators/miniproto.py — the protobuf wire-format runtime behind the
transformWithStateInPandas shim. Every encode assertion here is pinned
against HAND-COMPUTED wire bytes derived from the public encoding spec
(tag = field_number << 3 | wire_type; varints little-endian base-128;
length-delimited strings/bytes/messages), so the shim is proven against
the format itself, not against its own decoder. The JVM-side round trip
is exercised by tests/test_transform_with_state.py and the st29 driver
row."""

from __future__ import annotations

import pytest

from real_time_genai_embeddings_for_rag_with_apache_flink_spark.operators.miniproto import (
    _extract_serialized_descriptor,
    build_namespace,
    install_state_message_shim,
    parse_file_descriptor,
)


@pytest.fixture(scope="module")
def sm():
    return install_state_message_shim()


def test_descriptor_parses_the_installed_pyspark_schema():
    pkg, messages, enums = parse_file_descriptor(
        _extract_serialized_descriptor()
    )
    names = {m.name for m in messages}
    # the message set the state clients construct/parse
    for required in (
        "StateRequest", "StateResponse", "StatefulProcessorCall",
        "StateCallCommand", "SetHandleState", "SetImplicitKey",
        "RemoveImplicitKey", "ImplicitGroupingKeyRequest",
        "ValueStateCall", "ListStateCall", "MapStateCall",
        "AppendList", "StateResponseWithTimer", "TimerInfo",
        "RegisterTimer", "ListTimers", "ParseStringSchema",
    ):
        assert required in names, required
    assert any(e[1] == "HandleState" for e in enums)


def test_handle_state_request_bytes_match_the_spec(sm):
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        )
    )
    # StateRequest.statefulProcessorCall = field 2 message -> tag 0x12;
    # StatefulProcessorCall.setHandleState = field 1 -> 0x0a;
    # SetHandleState.state = field 1 varint, CREATED = 1 -> 08 01
    assert req.SerializeToString() == bytes.fromhex("12040a020801")
    # enum default (PRE_INIT = 0) is proto3-implicit: empty payload
    assert sm.SetHandleState(state=sm.PRE_INIT).SerializeToString() == b""


def test_scalar_defaults_are_skipped_and_strings_encoded(sm):
    cmd = sm.StateCallCommand()
    cmd.stateName = "extremes"
    cmd.schema = "s"
    # field1 "extremes": 0a 08 <utf8>; field2 "s": 12 01 73; no ttl
    assert cmd.SerializeToString() == bytes.fromhex(
        "0a0865787472656d6573120173"
    )


def test_message_field_is_absent_until_mutated(sm):
    cmd = sm.StateCallCommand()
    cmd.stateName = "x"
    before = cmd.SerializeToString()
    _ = cmd.ttl  # reading auto-vivifies but must NOT mark presence
    assert cmd.SerializeToString() == before
    cmd.ttl.durationMs = 5  # the client's exact mutation pattern
    after = cmd.SerializeToString()
    # ttl = field 4 message -> tag 0x22, len 2; durationMs field 1
    # varint 5 -> 08 05
    assert after == before + bytes.fromhex("22020805")


def test_oneof_last_set_wins(sm):
    call = sm.StatefulProcessorCall(
        getValueState=sm.StateCallCommand(stateName="a")
    )
    call.deleteIfExists = sm.StateCallCommand(stateName="b")
    data = call.SerializeToString()
    # only deleteIfExists (field 6 -> tag 0x32) may remain
    assert data[0] == 0x32 and b"a" not in data


def test_repeated_bytes_roundtrip(sm):
    msg = sm.AppendList(value=[b"aa", b"bb"], fetchWithArrow=False)
    data = msg.SerializeToString()
    assert data == bytes([0x0A, 2, 97, 97, 0x0A, 2, 98, 98])
    back = sm.AppendList()
    back.ParseFromString(data)
    assert list(back.value) == [b"aa", b"bb"]
    assert back.fetchWithArrow is False


def test_response_parse_with_repeated_messages_and_unknowns(sm):
    # handcrafted StateResponseWithTimer: two TimerInfo, a trailing
    # bool, plus an UNKNOWN field (15, varint) that must be skipped
    t1 = bytes.fromhex("1064")  # timestampMs=100
    t2 = bytes([0x0A, 1, ord("k"), 0x10, 7])  # key=b'k', timestampMs=7
    raw = (
        bytes([0x1A, len(t1)]) + t1
        + bytes([0x1A, len(t2)]) + t2
        + bytes([0x20, 1])
        + bytes([(15 << 3) | 0, 42])
    )
    resp = sm.StateResponseWithTimer()
    resp.ParseFromString(raw)
    assert resp.statusCode == 0 and resp.errorMessage == ""
    assert [t.timestampMs for t in resp.timer] == [100, 7]
    assert resp.timer[1].key == b"k"
    assert resp.requireNextFetch is True


def test_negative_int64_uses_ten_byte_varint(sm):
    msg = sm.RegisterTimer(expiryTimestampMs=-1)
    data = msg.SerializeToString()
    # field 1 varint of -1 = 10 bytes of two's complement
    assert data == bytes([0x08]) + b"\xff" * 9 + b"\x01"
    back = sm.RegisterTimer()
    back.ParseFromString(data)
    assert back.expiryTimestampMs == -1


def test_empty_message_oneof_member_still_serializes(sm):
    req = sm.ImplicitGroupingKeyRequest(removeImplicitKey=sm.RemoveImplicitKey())
    # the empty message must appear on the wire (field 2, len 0) or the
    # JVM can't tell WHICH oneof member was set
    assert req.SerializeToString() == bytes([0x12, 0])


def test_unknown_field_name_raises(sm):
    with pytest.raises(AttributeError):
        sm.StateCallCommand(nope=1)
    with pytest.raises(AttributeError):
        sm.StateCallCommand().nope


def test_namespace_builder_exposes_enum_values():
    ns = build_namespace(_extract_serialized_descriptor())
    assert ns["PRE_INIT"] == 0 and ns["CLOSED"] == 5
    assert ns["HandleState"].CREATED == 1


def test_lazy_submessage_reads_alias_one_placeholder(sm):
    """Real protobuf returns the SAME placeholder on every read of an
    absent submessage; two reads each carrying an armed mutate-hook
    would let the later mutation overwrite the earlier child in the
    parent, silently dropping fields from the wire bytes."""
    call = sm.StateCallCommand(stateName="s")
    a = call.ttl
    b = call.ttl
    assert a is b
    a.durationMs = 7
    assert call.ttl.durationMs == 7
    data = call.SerializeToString()
    fresh = sm.StateCallCommand()
    fresh.ParseFromString(data)
    assert fresh.ttl.durationMs == 7


def test_oneof_clear_drops_stale_placeholder_cache(sm):
    """Switching a oneof away from a message member must reset that
    member: re-reading it gives a default placeholder, not the old
    mutated child resurrected from the lazy cache."""
    call = sm.StatefulProcessorCall()
    call.getValueState.stateName = "old"
    call.deleteIfExists = sm.StateCallCommand(stateName="new")
    assert call.getValueState.stateName == ""  # default, not "old"
    data = call.SerializeToString()
    assert b"old" not in data and b"new" in data
