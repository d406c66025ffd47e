import random

from taiga_tpu.core.constants import (
    PRF_EXPAND_INPUT_RESOURCE_LOGIC_CM_R,
    TAIGA_RESOURCE_TREE_DEPTH,
    resource_commitment_r_generator,
)
from taiga_tpu.core.delta import DeltaCommitment
from taiga_tpu.core.encryption import ResourceCiphertext, ResourcePlaintext, SecretKey
from taiga_tpu.core.merkle import LR, Anchor, MerklePath, Node
from taiga_tpu.core.nullifier import Nullifier, NullifierKeyContainer
from taiga_tpu.core.resource import RandomSeed, Resource, ResourceKind
from taiga_tpu.core.resource_tree import ResourceExistenceWitness, ResourceMerkleTreeLeaves
from taiga_tpu.core.rl_commitment import ResourceLogicCommitment
from taiga_tpu.crypto.curves import PallasPoint
from taiga_tpu.crypto.fields import Fp, Fq
from taiga_tpu.crypto.poseidon import poseidon_hash, poseidon_hash_n
from taiga_tpu.crypto.reddsa import BindingSigningKey

rng = random.Random(0x7A16A)


def _random_resource():
    return Resource(
        ResourceKind(Fp.random(rng), Fp.random(rng)),
        Fp.random(rng),
        rng.getrandbits(64),
        NullifierKeyContainer.random_key(rng),
        Nullifier.random(rng),
        False,
        Fp.random(rng),
    )


def test_npk_is_prf_of_nk():
    nk = Fp.random(rng)
    c = NullifierKeyContainer.from_key(nk)
    assert c.get_npk() == poseidon_hash(nk, Fp.zero())
    assert c.to_commitment().get_npk() == c.get_npk()
    assert NullifierKeyContainer.from_npk(c.get_npk()).get_nk() is None


def test_nullifier_derivation():
    r = _random_resource()
    nf = r.get_nf()
    expected = poseidon_hash_n(
        [r.get_nk(), r.nonce.inner(), r.get_psi(), r.commitment().inner()]
    )
    assert nf.inner() == expected
    # output resources (npk only) cannot derive a nullifier
    out = Resource(
        r.kind, r.value, r.quantity, r.nk_container.to_commitment(), r.nonce, False, r.rseed
    )
    assert out.get_nf() is None


def test_commitment_composition_ephemeral_bit():
    r = _random_resource()
    r2 = Resource(r.kind, r.value, r.quantity, r.nk_container, r.nonce, True, r.rseed)
    assert r.commitment() != r2.commitment()


def test_merkle_path_root():
    leaf = Node(Fp.random(rng))
    path = MerklePath.random(rng, TAIGA_RESOURCE_TREE_DEPTH)
    root = path.root(leaf)
    # manual fold
    node = leaf
    for sib, lr in path.path:
        node = Node.combine(node, sib) if lr is LR.R else Node.combine(sib, node)
    assert Anchor(node.inner()) == root


def test_resource_tree_path_and_root():
    # mirrors reference resource_tree.rs test_resource_merkle_leave
    target = Fp.one()
    tree = ResourceMerkleTreeLeaves([Fp.zero(), target])
    path = tree.generate_path(target)
    assert path is not None
    root = tree.root()
    computed = MerklePath.from_pairs(path).root(Node(target))
    assert computed.inner() == root
    # witness is_input: leaf position 1 (odd) => sibling L => output
    w = ResourceExistenceWitness(_random_resource(), path)
    assert not w.is_input()


def test_delta_commitment_homomorphism():
    """Balanced quantities: sum of deltas == (sum rcv) * R."""
    kind_a = ResourceKind(Fp.random(rng), Fp.random(rng))
    kind_b = ResourceKind(Fp.random(rng), Fp.random(rng))
    r1_in = Resource(kind_a, Fp.zero(), 10, NullifierKeyContainer.random_key(rng), Nullifier.random(rng), False, Fp.zero())
    r1_out = Resource(kind_b, Fp.zero(), 7, NullifierKeyContainer.random_key(rng), Nullifier.random(rng), False, Fp.zero())
    r2_in = Resource(kind_b, Fp.zero(), 7, NullifierKeyContainer.random_key(rng), Nullifier.random(rng), False, Fp.zero())
    r2_out = Resource(kind_a, Fp.zero(), 10, NullifierKeyContainer.random_key(rng), Nullifier.random(rng), False, Fp.zero())
    rcv1, rcv2 = Fq.random(rng), Fq.random(rng)
    d1 = DeltaCommitment.commit(r1_in, r1_out, rcv1)
    d2 = DeltaCommitment.commit(r2_in, r2_out, rcv2)
    total = d1.inner() + d2.inner()
    assert total == resource_commitment_r_generator() * (rcv1 + rcv2)


def test_binding_signature_over_balanced_deltas():
    rcv1, rcv2 = Fq.random(rng), Fq.random(rng)
    basepoint = resource_commitment_r_generator()
    sk = BindingSigningKey(rcv1 + rcv2, basepoint)
    vk = sk.get_vk()
    # vk must equal the sum of the rcv-only delta points
    assert vk.point == basepoint * rcv1 + basepoint * rcv2
    msg = b"taiga binding sig test"
    sig = sk.sign(msg, rng_bytes=bytes(80))
    assert vk.verify(basepoint, msg, sig)
    assert not vk.verify(basepoint, b"other msg", sig)
    # serialization round trip
    sig2 = type(sig).from_bytes(sig.to_bytes())
    assert vk.verify(basepoint, msg, sig2)


def test_resource_encryption_roundtrip():
    sk = Fq.random(rng)
    pk = PallasPoint.random(rng)
    key = SecretKey.from_dh_exchange(pk, sk)
    msg = [Fp.one(), Fp(2), Fp(3)]
    pt = ResourcePlaintext.padding(msg)
    nonce = Fp(23333)
    ct = ResourceCiphertext.encrypt(pt, key, nonce)
    assert len(ct.inner()) == 12
    dec = ct.decrypt(key)
    assert dec == pt.to_vec()
    # wrong key fails MAC
    other = SecretKey.from_dh_exchange(pk, Fq.random(rng))
    assert ct.decrypt(other) is None


def test_rl_commitment_roundtrip():
    cm = ResourceLogicCommitment.commit(Fp.random(rng), Fp.random(rng))
    pub = cm.to_public_inputs()
    assert ResourceLogicCommitment.from_public_inputs(pub) == cm
    assert cm != ResourceLogicCommitment.default()


def test_random_seed_expansion():
    seed = RandomSeed(bytes(range(32)))
    pad = seed.get_random_padding(3)
    assert len(pad) == 3 and len({p.v for p in pad}) == 3
    rcv = seed.get_rcv()
    assert isinstance(rcv, Fq)
    r1 = seed.get_resource_logic_cm_r(PRF_EXPAND_INPUT_RESOURCE_LOGIC_CM_R)
    r2 = seed.get_resource_logic_cm_r(PRF_EXPAND_INPUT_RESOURCE_LOGIC_CM_R + 1)
    assert r1 != r2
    # determinism
    assert RandomSeed(bytes(range(32))).get_rcv() == rcv


def test_resource_borsh_roundtrip_202_bytes():
    r = _random_resource()
    b = r.serialize()
    assert len(b) == 202
    assert Resource.deserialize(b) == r
    r.nk_container = r.nk_container.to_commitment()
    b2 = r.serialize()
    assert Resource.deserialize(b2) == r
