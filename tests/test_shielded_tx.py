"""SLOW TIER: full shielded transaction with REAL proofs at production domain
sizes — the port of the reference's `test_halo2_transaction`
(taiga_halo2/src/transaction.rs:350-374) and `create_shielded_ptx`
(shielded_ptx.rs:432-619): a 2-in/2-out shielded ptx (2 compliance proofs +
4 trivial resource-logic proofs), Transaction.build -> wire round-trip ->
execute, plus negative cases (tampered RL proof, mismatched self-resource id).

Run with: pytest tests/ -m slow
"""

import random

import pytest

from taiga_tpu.apps.trivial import TrivialResourceLogicCircuit
from taiga_tpu.core.api import (
    create_transaction,
    transaction_deserialize,
    transaction_serialize,
    verify_transaction,
)
from taiga_tpu.core.compliance import ComplianceInfo
from taiga_tpu.core.error import TransactionError
from taiga_tpu.core.merkle import MerklePath
from taiga_tpu.core.proving import Proof, params_override
from taiga_tpu.core.ptx import ShieldedPartialTransaction
from taiga_tpu.core.resource import Resource
from taiga_tpu.core.resource_logics import ResourceLogics
from taiga_tpu.core.resource_tree import ResourceMerkleTreeLeaves

pytestmark = pytest.mark.slow

rng = random.Random(0x51E1)


@pytest.fixture(autouse=True, scope="module")
def _params():
    # PRODUCTION domain sizes — this is the tier that proves the real thing
    with params_override():
        yield


def _balanced_compliance():
    inp = Resource.random(rng)
    out = Resource.random(rng)
    out.kind = inp.kind
    out.quantity = inp.quantity
    path = MerklePath.random(rng, 32)
    return ComplianceInfo(inp, path, None, out), inp, out


def create_shielded_ptx() -> ShieldedPartialTransaction:
    """2-in/2-out with trivial logics (shielded_ptx.rs:432-619 fixture)."""
    c1, in1, out1 = _balanced_compliance()
    c2, in2, out2 = _balanced_compliance()
    # interleaved resource tree [nf1, cm1, nf2, cm2]
    nf1, cm1 = in1.get_nf().inner(), out1.commitment().inner()
    nf2, cm2 = in2.get_nf().inner(), out2.commitment().inner()
    tree = ResourceMerkleTreeLeaves([nf1, cm1, nf2, cm2])

    def logics(res, leaf):
        path = tree.generate_path(leaf)
        return ResourceLogics(TrivialResourceLogicCircuit.from_resource_path(res, path))

    return ShieldedPartialTransaction.build(
        [c1, c2],
        [logics(in1, nf1), logics(in2, nf2)],
        [logics(out1, cm1), logics(out2, cm2)],
    )


@pytest.fixture(scope="module")
def ptx():
    return create_shielded_ptx()


def test_shielded_ptx_executes(ptx):
    ptx.execute()  # raises on any proof/consistency failure


def test_shielded_transaction_roundtrip(ptx):
    tx = create_transaction([ptx], [])
    result = verify_transaction(tx)
    assert len(result.nullifiers) == 2
    assert len(result.output_cms) == 2
    # wire round-trip, then re-execute (the reference serializes and
    # re-executes the same tx, transaction.rs:363-373)
    blob = transaction_serialize(tx)
    tx2 = transaction_deserialize(blob)
    result2 = verify_transaction(tx2)
    assert [n.inner() for n in result2.nullifiers] == [
        n.inner() for n in result.nullifiers
    ]


def test_shielded_rejects_tampered_rl_proof(ptx):
    import copy

    bad = copy.deepcopy(ptx)
    info = bad.inputs[0].app_resource_logic_verifying_info
    data = bytearray(info.proof.data)
    data[50] ^= 1
    info.proof = Proof(bytes(data))
    with pytest.raises(TransactionError):
        bad.execute()


def test_shielded_rejects_mismatched_self_resource_id(ptx):
    import copy

    from taiga_tpu.crypto.fields import Fp

    bad = copy.deepcopy(ptx)
    info = bad.inputs[0].app_resource_logic_verifying_info
    # claim a different self-resource id: breaks the nf consistency check
    # (and the proof, but the id check must catch it even structurally)
    pubs = list(info.public_inputs)
    pubs[1] = pubs[1] + Fp.one()
    info.public_inputs = pubs
    with pytest.raises(TransactionError):
        bad.execute()


def test_shielded_rejects_tampered_compliance_proof(ptx):
    import copy

    bad = copy.deepcopy(ptx)
    cinfo = bad.compliances[0]
    data = bytearray(cinfo.compliance_proof.data)
    data[50] ^= 1
    cinfo.compliance_proof = Proof(bytes(data))
    with pytest.raises(TransactionError):
        bad.execute()
