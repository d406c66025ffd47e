"""Real verifying-key commitment (reference resource_logic_vk.rs:33-51):
a resource's `logic` field is the Blake2b compression of the circuit's real
vk, proofs carry the vk and verify against it — so an UNREGISTERED circuit
class round-trips prove -> serialize -> verify with no registry, and
changing one gate changes the resource's logic field.
"""

import random

import pytest

from taiga_tpu.apps.trivial import TrivialResourceLogicCircuit
from taiga_tpu.circuits.resource_logic import ResourceLogicCircuit
from taiga_tpu.core.proving import (
    ResourceLogicVerifyingInfo,
    get_proving_key,
    params_override,
    prove_resource_logic,
)
from taiga_tpu.core.resource import Resource
from taiga_tpu.core.resource_tree import ResourceExistenceWitness, ResourceMerkleTreeLeaves
import io

from taiga_tpu.core.wire import read_rl_verifying_info, write_rl_verifying_info
from taiga_tpu.crypto.fields import Fp
from taiga_tpu.plonk.keygen import VerifyingKey

rng = random.Random(0x5C0)
K = 11


@pytest.fixture(autouse=True, scope="module")
def _params():
    with params_override(rl=K):
        yield


class UnregisteredCustomLogic(ResourceLogicCircuit):
    """NOT in the bytecode registry; adds a custom gate-level constraint
    (quantity < 2^64) on top of the basic constraints."""

    def custom_constraints(self, b, basic):
        from taiga_tpu.circuits import gadgets as G

        G.decompose_bits(b, basic.quantity, 64)


def _witness(resource, is_input=True):
    ident = resource.get_nf().inner() if is_input else resource.commitment().inner()
    leaves = [ident if i == (0 if is_input else 1) else Fp.random(rng) for i in range(4)]
    tree = ResourceMerkleTreeLeaves(leaves)
    return ResourceExistenceWitness(resource, tree.generate_path(ident))


def test_compressed_vk_is_real_and_gate_sensitive():
    base = TrivialResourceLogicCircuit.compressed_vk()
    custom = UnregisteredCustomLogic.compressed_vk()
    assert base != custom  # one extra constraint changes the logic field
    # and it matches the keygen output's compression exactly
    vk = get_proving_key(TrivialResourceLogicCircuit, K).vk
    assert base == vk.compressed()


def test_vk_serialization_roundtrip():
    vk = get_proving_key(TrivialResourceLogicCircuit, K).vk
    vk2 = VerifyingKey.from_bytes(vk.to_bytes())
    assert vk2.digest == vk.digest
    assert vk2.compressed() == vk.compressed()
    assert len(vk2.cs.gates) == len(vk.cs.gates)
    assert len(vk2.cs.lookups) == len(vk.cs.lookups)


def test_unregistered_circuit_proves_and_verifies():
    r = Resource.random(rng)
    circ = UnregisteredCustomLogic(_witness(r))
    info = prove_resource_logic(circ)
    # wire round-trip, then verify purely from carried bytes — no registry
    w = io.BytesIO()
    write_rl_verifying_info(w, info)
    info2 = read_rl_verifying_info(io.BytesIO(w.getvalue()))
    info2.verify()  # raises on failure
    # tampered proof rejected
    bad = bytearray(info2.proof.data)
    bad[33] ^= 1
    info_bad = ResourceLogicVerifyingInfo(
        info2.circuit_id, type(info2.proof)(bytes(bad)),
        info2.public_inputs, info2.vk_bytes,
    )
    with pytest.raises(Exception):
        info_bad.verify()
    # proof under a DIFFERENT circuit's vk rejected (vk binds constraints)
    other_vk = get_proving_key(TrivialResourceLogicCircuit, K).vk
    info_wrong_vk = ResourceLogicVerifyingInfo(
        info2.circuit_id, info2.proof, info2.public_inputs, other_vk.to_bytes()
    )
    with pytest.raises(Exception):
        info_wrong_vk.verify()
    # malformed vk fails closed
    info_junk = ResourceLogicVerifyingInfo(
        info2.circuit_id, info2.proof, info2.public_inputs, b"garbage"
    )
    with pytest.raises(Exception):
        info_junk.verify()
