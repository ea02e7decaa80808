"""Unit coverage for the vendored pure-Python protobuf runtime
(daily_journal_dataflow_qc_spark/_vendor): descriptor parsing of the REAL
generated StateMessage_pb2 module, wire-format round trips for every shape
the TWS state clients build, and the presence semantics the state server
depends on. The full integration proof is the live
transformWithStateInPandas query in test_streaming.py::test_tws_backend_matches_batch."""

import pytest

import daily_journal_dataflow_qc_spark as pkg

sm = pytest.importorskip("pyspark.sql.streaming.proto.StateMessage_pb2")


def test_runtime_activated():
    assert pkg.PROTOBUF_RUNTIME in ("real", "vendored")
    import google.protobuf  # noqa: F401


def test_descriptor_parse_of_generated_module():
    if pkg.PROTOBUF_RUNTIME != "vendored":
        pytest.skip("shim-specific descriptor attributes (real protobuf present)")
    d = sm.StateRequest.DESCRIPTOR
    assert d.fields_by_name["version"].number == 1
    assert d.fields_by_name["statefulProcessorCall"].type_name.endswith(
        "StatefulProcessorCall"
    )
    # the oneof groups every request variant
    assert {f.name for f in d.oneofs[0].fields} >= {
        "statefulProcessorCall",
        "stateVariableRequest",
        "implicitGroupingKeyRequest",
        "timerRequest",
    }
    assert sm.HandleState.Value("CREATED") == sm.CREATED == 1
    assert sm.HandleState.Name(sm.TIMER_PROCESSED) == "TIMER_PROCESSED"


def test_request_round_trip_nested_oneof():
    cmd = sm.StateCallCommand()
    cmd.stateName = "agg"
    cmd.schema = "start_us BIGINT"
    req = sm.StateRequest(
        version=2, statefulProcessorCall=sm.StatefulProcessorCall(getListState=cmd)
    )
    data = req.SerializeToString()
    back = sm.StateRequest()
    back.ParseFromString(data)
    assert back.version == 2
    assert back.WhichOneof("method") == "statefulProcessorCall"
    assert back.statefulProcessorCall.getListState.stateName == "agg"
    assert back.statefulProcessorCall.getListState.schema == "start_us BIGINT"
    assert back.SerializeToString() == data


def test_ttl_auto_vivification_presence():
    # reading a submessage must NOT mark it present...
    c = sm.StateCallCommand(stateName="s")
    _ = c.ttl
    assert not c.HasField("ttl")
    base = c.SerializeToString()
    # ...but assigning THROUGH it must (the client writes cmd.ttl.durationMs)
    c.ttl.durationMs = 5000
    assert c.HasField("ttl")
    assert c.SerializeToString() != base
    rt = sm.StateCallCommand()
    rt.ParseFromString(c.SerializeToString())
    assert rt.ttl.durationMs == 5000


def test_repeated_bytes_and_messages():
    r = sm.StateResponseWithListGet(statusCode=0, requireNextFetch=True)
    r.value.append(b"\x00\x01")
    r.value.append(b"")
    rt = sm.StateResponseWithListGet()
    rt.ParseFromString(r.SerializeToString())
    assert list(rt.value) == [b"\x00\x01", b""]
    assert rt.requireNextFetch is True

    it = sm.StateResponseWithMapIterator()
    it.kvPair.append(sm.KeyAndValuePair(key=b"k", value=b"v"))
    it.kvPair.append(sm.KeyAndValuePair(key=b"k2"))
    rt2 = sm.StateResponseWithMapIterator()
    rt2.ParseFromString(it.SerializeToString())
    assert [(p.key, p.value) for p in rt2.kvPair] == [(b"k", b"v"), (b"k2", b"")]


def test_proto3_optional_and_negative_ints():
    t = sm.TimerInfo(timestampMs=-1)
    assert not t.HasField("key")
    t2 = sm.TimerInfo(key=b"", timestampMs=2**40)
    assert t2.HasField("key")  # explicitly-set empty bytes stays present
    rt = sm.TimerInfo()
    rt.ParseFromString(t2.SerializeToString())
    assert rt.HasField("key") and rt.key == b"" and rt.timestampMs == 2**40

    r = sm.StateResponseWithLongTypeVal(statusCode=-7, value=-(2**62))
    rt3 = sm.StateResponseWithLongTypeVal()
    rt3.ParseFromString(r.SerializeToString())
    assert rt3.statusCode == -7 and rt3.value == -(2**62)


def test_unknown_fields_skipped():
    # a response with an extra field (forward compatibility): encode a
    # StateResponse plus an unknown varint field 15 and length field 16
    from daily_journal_dataflow_qc_spark._vendor.google.protobuf.internal import (
        wire_format as W,
    )

    base = sm.StateResponse(statusCode=3, errorMessage="x").SerializeToString()
    extra = bytearray(base)
    W.encode_tag(extra, 15, W.WIRETYPE_VARINT)
    W.encode_varint(extra, 99)
    W.encode_tag(extra, 16, W.WIRETYPE_LENGTH_DELIMITED)
    W.encode_varint(extra, 3)
    extra.extend(b"abc")
    r = sm.StateResponse()
    r.ParseFromString(bytes(extra))
    assert r.statusCode == 3 and r.errorMessage == "x"

def test_deep_auto_vivification_presence_recursive():
    """ADVICE r04: presence must recurse — after a two-level auto-vivified
    chained assignment (req.statefulProcessorCall.setHandleState.state = N),
    the INTERMEDIATE hop is untouched but must still serialize; same for a
    repeated field reached through an auto-vivified submessage."""
    req = sm.StateRequest(version=1)
    base = req.SerializeToString()
    req.statefulProcessorCall.setHandleState.state = 2
    assert req.HasField("statefulProcessorCall")
    wire = req.SerializeToString()
    assert wire != base
    rt = sm.StateRequest()
    rt.ParseFromString(wire)
    assert rt.HasField("statefulProcessorCall")
    assert rt.statefulProcessorCall.setHandleState.state == 2

    # repeated field appended through an auto-vivified hop also serializes
    it = sm.StateResponseWithMapIterator()
    _ = it.kvPair  # vivify the list without touching the parent
    it.kvPair.append(sm.KeyAndValuePair(key=b"k", value=b"v"))
    rt2 = sm.StateResponseWithMapIterator()
    rt2.ParseFromString(it.SerializeToString())
    assert [(p.key, p.value) for p in rt2.kvPair] == [(b"k", b"v")]

    # pure READ chains still leave everything absent
    probe = sm.StateRequest()
    _ = probe.statefulProcessorCall.setHandleState
    assert not probe.HasField("statefulProcessorCall")
    assert probe.SerializeToString() == b""
