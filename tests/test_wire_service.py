"""Wire-format round-trips (reference taiga_api.rs:69-160, transaction.rs
borsh round-trip in test_halo2_transaction) and the Erlang-Port interop
service (the NIF equivalent, reference transaction.rs:161-205)."""

import io
import random
import struct

import pytest

from taiga_tpu import service
from taiga_tpu.apps.trivial import TrivialResourceLogicCircuit
from taiga_tpu.circuits.bytecode import ApplicationByteCode
from taiga_tpu.core import api
from taiga_tpu.core import wire
from taiga_tpu.core.compliance import ComplianceInfo
from taiga_tpu.core.merkle import MerklePath
from taiga_tpu.core.proving import Proof, ResourceLogicVerifyingInfo, params_override
from taiga_tpu.core.ptx import (
    ComplianceVerifyingInfo,
    ResourceLogicVerifyingInfoSet,
    ShieldedPartialTransaction,
    TransparentPartialTransaction,
)
from taiga_tpu.core.resource import Resource
from taiga_tpu.core.resource_tree import ResourceMerkleTreeLeaves
from taiga_tpu.crypto.fields import Fp, Fq

@pytest.fixture(autouse=True, scope="module")
def _params():
    with params_override(compliance=13, rl=12):
        yield

rng = random.Random(0xA11CE)


def _balanced_compliance():
    inp = Resource.random(rng)
    out = Resource.random(rng)
    out.kind = inp.kind
    out.quantity = inp.quantity
    path = MerklePath.random(rng, 32)
    return ComplianceInfo(inp, path, None, out), inp, out


def _transparent_ptx():
    c1, in1, out1 = _balanced_compliance()
    c2, in2, out2 = _balanced_compliance()
    tree = ResourceMerkleTreeLeaves(
        [in1.get_nf().inner(), out1.commitment().inner(),
         in2.get_nf().inner(), out2.commitment().inner()]
    )

    def app(res, leaf):
        path = tree.generate_path(leaf)
        circ = TrivialResourceLogicCircuit.from_resource_path(res, path)
        return ApplicationByteCode(circ.to_bytecode(), [])

    return TransparentPartialTransaction(
        [c1, c2],
        [app(in1, in1.get_nf().inner()), app(in2, in2.get_nf().inner())],
        [app(out1, out1.commitment().inner()), app(out2, out2.commitment().inner())],
    )


def _fake_shielded_ptx():
    """Structural shielded ptx with opaque proof bytes — exercises the wire
    layout without the prover (proof validity round-trips as raw bytes)."""
    c, _, _ = _balanced_compliance()
    pub, _ = c.build()
    cinfo = ComplianceVerifyingInfo(Proof(b"\x01\x02\x03" * 11), pub)
    rl = ResourceLogicVerifyingInfo(
        "taiga_tpu.rl.TrivialResourceLogicCircuit",
        Proof(b"\x09" * 7),
        [Fp.random() for _ in range(22)],
        b"TVK1-opaque-test-bytes",
    )
    s = ResourceLogicVerifyingInfoSet(rl, [rl])
    return ShieldedPartialTransaction([cinfo], [s], [s], Fq(1234), b"hints!")


# --- wire round trips ---------------------------------------------------------


def test_transparent_ptx_roundtrip():
    ptx = _transparent_ptx()
    data = wire.transparent_ptx_serialize(ptx)
    back = wire.transparent_ptx_deserialize(data)
    assert wire.transparent_ptx_serialize(back) == data
    back.execute()  # still a valid ptx after the round trip


def test_shielded_ptx_roundtrip_structural():
    ptx = _fake_shielded_ptx()
    data = wire.shielded_ptx_serialize(ptx)
    back = wire.shielded_ptx_deserialize(data)
    assert wire.shielded_ptx_serialize(back) == data
    assert back.binding_sig_r == ptx.binding_sig_r
    assert back.hints == b"hints!"
    assert back.compliances[0].compliance_instance.serialize() == \
        ptx.compliances[0].compliance_instance.serialize()


def test_transaction_roundtrip_and_reexecute():
    tx = api.create_transaction([], [_transparent_ptx()])
    data = api.transaction_serialize(tx)
    back = api.transaction_deserialize(data)
    assert api.transaction_serialize(back) == data
    result = api.verify_transaction(back)  # re-executes after round trip
    assert len(result.nullifiers) == 2


def test_truncated_transaction_rejected():
    tx = api.create_transaction([], [_transparent_ptx()])
    data = api.transaction_serialize(tx)
    with pytest.raises(Exception):
        api.transaction_deserialize(data[: len(data) // 2])


def test_partial_transaction_tagged_roundtrip():
    ptx = _transparent_ptx()
    data = api.partial_transaction_serialize(ptx)
    back = api.partial_transaction_deserialize(data)
    assert isinstance(back, TransparentPartialTransaction)
    data2 = api.partial_transaction_serialize(_fake_shielded_ptx())
    assert isinstance(
        api.partial_transaction_deserialize(data2), ShieldedPartialTransaction
    )


# --- port service ---------------------------------------------------------------


def _roundtrip_packets(packets: list[bytes]) -> list[bytes]:
    """Drive service.serve() through in-memory {packet,4} framed pipes."""
    fin = io.BytesIO()
    for p in packets:
        fin.write(struct.pack(">I", len(p)))
        fin.write(p)
    fin.seek(0)
    fout = io.BytesIO()
    service.serve(stdin=fin, stdout=fout)
    fout.seek(0)
    out = []
    while True:
        hdr = fout.read(4)
        if len(hdr) < 4:
            break
        (n,) = struct.unpack(">I", hdr)
        out.append(fout.read(n))
    return out


def test_service_ping_and_resource_roundtrip():
    res = Resource.random(rng)
    replies = _roundtrip_packets(
        [
            bytes([service.OP_PING]) + b"hello",
            bytes([service.OP_RESOURCE_ROUNDTRIP]) + res.serialize(),
            bytes([0x7F]),  # unknown opcode -> error packet, loop continues
        ]
    )
    assert replies[0] == bytes([service.STATUS_OK]) + b"hello"
    assert replies[1] == bytes([service.STATUS_OK]) + res.serialize()
    assert replies[2][0] == service.STATUS_ERROR


def test_service_create_and_verify_transaction():
    ptx_bytes = api.partial_transaction_serialize(_transparent_ptx())
    create = (
        bytes([service.OP_CREATE_TRANSACTION])
        + struct.pack("<I", 1)
        + struct.pack("<I", len(ptx_bytes))
        + ptx_bytes
    )
    (reply,) = _roundtrip_packets([create])
    assert reply[0] == service.STATUS_OK
    tx_bytes = reply[1:]
    (verify_reply,) = _roundtrip_packets(
        [bytes([service.OP_VERIFY_TRANSACTION]) + tx_bytes]
    )
    assert verify_reply[0] == service.STATUS_OK
    # result payload: 3 groups of 32-byte items (anchors, nfs, cms)
    r = io.BytesIO(verify_reply[1:])
    counts = []
    for _ in range(3):
        (n,) = struct.unpack("<I", r.read(4))
        r.read(32 * n)
        counts.append(n)
    assert counts == [2, 2, 2]
    assert not r.read()
    # tampering the tx bytes must fail verification
    bad = bytearray(tx_bytes)
    bad[-1] ^= 1  # flip a binding-signature bit
    (bad_reply,) = _roundtrip_packets(
        [bytes([service.OP_VERIFY_TRANSACTION]) + bytes(bad)]
    )
    assert bad_reply[0] == service.STATUS_ERROR


def test_cascade_intent_declared_enum_roundtrip():
    """CascadeIntent parity (reference resource_logic_bytecode.rs:44): the
    representation is DECLARED — it wire-round-trips like any enum arm — but
    no circuit backs it, so decode errors exactly like the reference's
    catch-all Err(InvalidResourceLogicRepresentation) arm (rs:116-117)."""
    from taiga_tpu.circuits.bytecode import (
        DECLARED_REPRESENTATIONS,
        ResourceLogicByteCode,
        registered_names,
    )
    from taiga_tpu.core.error import InvalidResourceLogicRepresentation

    # every implemented circuit name is a declared arm
    for name in registered_names():
        assert name in DECLARED_REPRESENTATIONS
    assert "CascadeIntent" in DECLARED_REPRESENTATIONS

    bc = ResourceLogicByteCode("CascadeIntent", b"\x01\x02\x03")
    buf = io.BytesIO()
    wire.write_bytecode(buf, bc)
    back = wire.read_bytecode(io.BytesIO(buf.getvalue()))
    assert back.name == "CascadeIntent" and back.inputs == b"\x01\x02\x03"
    with pytest.raises(InvalidResourceLogicRepresentation):
        back.decode()
