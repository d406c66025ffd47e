"""Transparent partial-transaction + full Transaction end-to-end.

Mirrors the reference's create_transparent_ptx fixture
(transparent_ptx.rs:111-205) and test_halo2_transaction (transaction.rs:350+,
transparent part): 2-in/2-out, balanced kinds/quantities, trivial logics,
MockProver-equivalent checks, binding signature over zero rcv.
"""

import random

import pytest

from taiga_tpu.apps.trivial import TrivialResourceLogicCircuit
from taiga_tpu.circuits.bytecode import ApplicationByteCode
from taiga_tpu.core.api import create_transaction, verify_transaction
from taiga_tpu.core.compliance import ComplianceInfo
from taiga_tpu.core.error import TransactionError
from taiga_tpu.core.merkle import MerklePath
from taiga_tpu.core.proving import params_override
from taiga_tpu.core.ptx import TransparentPartialTransaction
from taiga_tpu.core.resource import Resource
from taiga_tpu.core.resource_tree import ResourceMerkleTreeLeaves

@pytest.fixture(autouse=True, scope="module")
def _params():
    with params_override(compliance=13, rl=12):
        yield

rng = random.Random(0x7123)


def _balanced_compliance():
    inp = Resource.random(rng)
    out = Resource.random(rng)
    out.kind = inp.kind
    out.quantity = inp.quantity
    path = MerklePath.random(rng, 32)
    return ComplianceInfo(inp, path, None, out), inp, out


def create_transparent_ptx():
    c1, in1, out1 = _balanced_compliance()
    c2, in2, out2 = _balanced_compliance()
    nf1 = in1.get_nf().inner()
    cm1 = out1.commitment().inner()
    nf2 = in2.get_nf().inner()
    cm2 = out2.commitment().inner()
    tree = ResourceMerkleTreeLeaves([nf1, cm1, nf2, cm2])

    def app(res, leaf):
        path = tree.generate_path(leaf)
        circ = TrivialResourceLogicCircuit.from_resource_path(res, path)
        return ApplicationByteCode(circ.to_bytecode(), [])

    return TransparentPartialTransaction(
        [c1, c2],
        [app(in1, nf1), app(in2, nf2)],
        [app(out1, cm1), app(out2, cm2)],
    )


@pytest.fixture(scope="module")
def ptx():
    return create_transparent_ptx()


def test_transparent_ptx_executes(ptx):
    ptx.execute()


def test_transparent_deltas_balance(ptx):
    from taiga_tpu.crypto.curves import PallasPoint

    total = PallasPoint.identity()
    for d in ptx.get_delta_commitments():
        total = total + d.inner()
    assert total.is_identity()  # balanced kinds/quantities, rcv = 0


def test_full_transaction_build_execute(ptx):
    tx = create_transaction([], [ptx])
    result = verify_transaction(tx)
    assert len(result.nullifiers) == 2
    assert len(result.output_cms) == 2
    assert len(result.anchors) == 2
    # nullifiers match the compliance info
    assert result.nullifiers[0] == ptx.compliances[0].get_input_resource_nullifier()


def test_transaction_rejects_tampered_signature(ptx):
    tx = create_transaction([], [ptx])
    sig = bytearray(tx.signature.to_bytes())
    sig[5] ^= 1
    from taiga_tpu.crypto.reddsa import BindingSignature

    tx.signature = BindingSignature.from_bytes(bytes(sig))
    with pytest.raises(TransactionError):
        verify_transaction(tx)


def test_transparent_ptx_rejects_wrong_logic_binding():
    """A resource logic proving membership of a *different* resource than the
    compliance unit's must be rejected (self-resource-id check)."""
    c1, in1, out1 = _balanced_compliance()
    nf1 = in1.get_nf().inner()
    cm1 = out1.commitment().inner()
    tree = ResourceMerkleTreeLeaves([nf1, cm1])
    # bind the *output* resource witness where the input's is expected
    wrong_path = tree.generate_path(cm1)
    circ_wrong = TrivialResourceLogicCircuit.from_resource_path(out1, wrong_path)
    path_ok = tree.generate_path(cm1)
    circ_ok = TrivialResourceLogicCircuit.from_resource_path(out1, path_ok)
    ptx = TransparentPartialTransaction(
        [c1],
        [ApplicationByteCode(circ_wrong.to_bytecode(), [])],
        [ApplicationByteCode(circ_ok.to_bytecode(), [])],
    )
    with pytest.raises(TransactionError):
        ptx.execute()
