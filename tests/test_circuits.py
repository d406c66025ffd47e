"""Circuit-layer tests: compliance + resource-logic mock verification, and the
transparent transaction end-to-end flow (reference test strategy tier 1:
MockProver differential checks, SURVEY.md §4)."""

import random

import pytest

from taiga_tpu.circuits.compliance import ComplianceCircuit
from taiga_tpu.core.compliance import ComplianceInfo
from taiga_tpu.core.merkle import MerklePath
from taiga_tpu.core.proving import params_override
from taiga_tpu.core.resource import Resource
from taiga_tpu.core.resource_tree import ResourceMerkleTreeLeaves
from taiga_tpu.crypto.fields import Fp
from taiga_tpu.plonk.circuit import CircuitBuilder
from taiga_tpu.plonk.mock import MockProver

K = 15


@pytest.fixture(autouse=True, scope="module")
def _params():
    # rl tests stay small; compliance needs 2^15 rows (in-circuit Blake2s).
    # Scoped so the override can't leak into other test modules.
    with params_override(compliance=K, rl=12):
        yield

rng = random.Random(0xC14C)


@pytest.fixture(scope="module")
def compliance_fixture():
    info = ComplianceInfo.random(rng)
    pub, circuit = info.build()
    return info, pub, circuit


def test_compliance_mock_satisfied(compliance_fixture):
    _, pub, circuit = compliance_fixture
    mp = MockProver.run(K, circuit, pub.to_instance())
    assert mp.verify() == []


def test_compliance_rows_fit(compliance_fixture):
    _, pub, circuit = compliance_fixture
    cs, config = ComplianceCircuit.build_cs()
    b = CircuitBuilder(cs, K, "prove")
    circuit.synthesize(b, config)
    assert b.rows_used() < (1 << K) - 16


def test_compliance_mock_rejects_wrong_instance(compliance_fixture):
    _, pub, circuit = compliance_fixture
    inst = pub.to_instance()
    inst[0] = inst[0] + Fp.one()  # wrong nullifier
    mp = MockProver.run(K, circuit, inst)
    assert mp.verify() != []


def test_compliance_nonce_rule():
    # output nonce must equal the input nullifier
    info = ComplianceInfo.random(rng)
    assert info.output_resource.nonce == info.input_resource.get_nf()


def test_trivial_rl_mock():
    from taiga_tpu.apps.trivial import TrivialResourceLogicCircuit

    input_res = Resource.random(rng)
    output_res = Resource.random(rng)
    nf = input_res.get_nf().inner()
    cm = output_res.commitment().inner()
    tree = ResourceMerkleTreeLeaves([nf, cm])
    for leaf in (nf, cm):
        path = tree.generate_path(leaf)
        res = input_res if leaf == nf else output_res
        circ = TrivialResourceLogicCircuit.from_resource_path(res, path)
        mp = MockProver.run(12, circ, circ.get_public_inputs())
        assert mp.verify() == []
        # public input 0 is the tree root; 1 is the identity
        assert circ.get_public_inputs()[0] == tree.root()
        assert circ.get_public_inputs()[1].v == leaf.v


def test_rl_bytecode_roundtrip():
    from taiga_tpu.apps.trivial import TrivialResourceLogicCircuit

    res = Resource.random(rng)
    tree = ResourceMerkleTreeLeaves([res.get_nf().inner()])
    path = tree.generate_path(res.get_nf().inner())
    circ = TrivialResourceLogicCircuit.from_resource_path(res, path)
    bc = circ.to_bytecode()
    circ2 = bc.decode()
    assert circ2.self_resource.get_resource() == res
    assert circ2.self_resource.get_identity() == circ.self_resource.get_identity()
