"""App-layer resource logics: MockProver differential checks (reference test
strategy tier 1 — each example RL is mock-verified over a real witness)."""

import random

import pytest

from taiga_tpu.apps import (
    FieldAdditionResourceLogicCircuit,
    OrRelationIntentResourceLogicCircuit,
    PartialFulfillmentIntentResourceLogicCircuit,
    ReceiverResourceLogicCircuit,
    SchnorrSignature,
    SignatureVerificationResourceLogicCircuit,
    Swap,
    Token,
    TokenAuthorization,
    TokenResourceLogicCircuit,
)
from taiga_tpu.apps.receiver import compressed_receiver_vk
from taiga_tpu.apps.signature_verification import compressed_token_auth_vk
from taiga_tpu.apps.token import compressed_token_vk
from taiga_tpu.core.encryption import ResourceCiphertext, SecretKey
from taiga_tpu.core.resource import RandomSeed, Resource
from taiga_tpu.core.resource_tree import ResourceExistenceWitness, ResourceMerkleTreeLeaves
from taiga_tpu.crypto.fields import Fp, Fq, mod_r_p
from taiga_tpu.plonk.mock import MockProver

rng = random.Random(0xA995)

K = 14


def _witness_for(resource, is_input=True):
    """Place the resource in a tiny resource tree and return its witness."""
    ident = resource.get_nf().inner() if is_input else resource.commitment().inner()
    leaves = [ident if (i == (0 if is_input else 1)) else Fp.random(rng) for i in range(4)]
    tree = ResourceMerkleTreeLeaves(leaves)
    path = tree.generate_path(ident)
    return ResourceExistenceWitness(resource, path), tree.root()


def _mock_ok(circuit):
    mp = MockProver.run(K, circuit, circuit.get_public_inputs())
    failures = mp.verify()
    assert failures == [], failures


def test_token_rl_mock():
    auth, sk = TokenAuthorization.random(rng)
    token = Token("BTC", 5)
    tr = token.create_random_input_token_resource(rng, Fp.random(rng), auth)
    w, _root = _witness_for(tr.resource, is_input=True)
    circ = TokenResourceLogicCircuit(
        w, token.name, auth, compressed_receiver_vk(), RandomSeed.random(rng)
    )
    _mock_ok(circ)


def test_signature_verification_rl_mock_and_host_verify():
    auth, sk = TokenAuthorization.random(rng)
    token = Token("ETH", 3)
    tr = token.create_random_input_token_resource(rng, Fp.random(rng), auth)
    w, _root = _witness_for(tr.resource, is_input=True)
    circ = SignatureVerificationResourceLogicCircuit.from_sk_and_sign(
        w, auth.vk, sk, compressed_receiver_vk(), rng
    )
    assert circ.signature.verify([w.get_root()])
    _mock_ok(circ)


def test_receiver_rl_mock_and_decrypt():
    auth, sk = TokenAuthorization.random(rng)
    token = Token("DOGE", 7)
    tr = token.create_random_output_token_resource(
        rng, Fp.random(rng), auth
    )
    w, _root = _witness_for(tr.resource, is_input=False)
    circ = ReceiverResourceLogicCircuit(
        w,
        compressed_receiver_vk(),
        Fp.random(rng),
        Fp.random(rng),
        auth.pk,
        compressed_token_auth_vk(),
    )
    _mock_ok(circ)
    # the publicized ciphertext decrypts with the receiver's secret key
    pub = circ.get_public_inputs()
    cipher = ResourceCiphertext(pub[8:20])
    sender_pk_x, sender_pk_y = pub[20], pub[21]
    from taiga_tpu.crypto.curves import PallasPoint

    sender_pk = PallasPoint(sender_pk_x, sender_pk_y)
    key = SecretKey.from_dh_exchange(sender_pk, sk)
    msg = cipher.decrypt(key)
    assert msg is not None
    assert msg[0] == tr.resource.get_logic()
    assert msg[3] == Fp(tr.resource.quantity)


def test_or_relation_intent_rl_mock():
    auth, _sk = TokenAuthorization.random(rng)
    t1, t2 = Token("DOLPHIN", 1), Token("Monkey", 2)
    receiver_npk = Fp.random(rng)
    receiver_value = auth.to_value()
    from taiga_tpu.apps.or_relation_intent import create_intent_resource

    nk = Fp.random(rng)
    intent = create_intent_resource(rng, t1, t2, receiver_npk, receiver_value, nk)
    # desired resource: satisfies condition 2, output position
    desired = Resource.new_output_resource(
        compressed_token_vk(), t2.encode_name(), receiver_value, 2,
        receiver_npk, False, Fp.random(rng),
    )
    desired.set_nonce(intent)
    nf = intent.get_nf().inner()
    cm = desired.commitment().inner()
    tree = ResourceMerkleTreeLeaves([nf, cm, Fp.random(rng), Fp.random(rng)])
    w_intent = ResourceExistenceWitness(intent, tree.generate_path(nf))
    w_desired = ResourceExistenceWitness(desired, tree.generate_path(cm))
    circ = OrRelationIntentResourceLogicCircuit(
        w_intent, w_desired, t1, t2, receiver_npk, receiver_value
    )
    _mock_ok(circ)


def test_partial_fulfillment_intent_rl_mock():
    auth, _sk = TokenAuthorization.random(rng)
    sell, buy = Token("BTC", 2), Token("ETH", 10)
    swap = Swap.random(rng, sell, buy, auth)
    intent = swap.create_intent_resource(rng)
    offer_token = Token("ETH", 5)  # partial: 5 of 10 => 1 BTC sold, 1 returned
    offer, returned = swap.fill(rng, offer_token)
    offer.set_nonce(intent)
    returned.set_nonce(intent)
    nf = intent.get_nf().inner()
    cm_offer = offer.commitment().inner()
    cm_ret = returned.commitment().inner()
    tree = ResourceMerkleTreeLeaves([nf, cm_offer, Fp.random(rng), cm_ret])
    w_intent = ResourceExistenceWitness(intent, tree.generate_path(nf))
    w_sell = ResourceExistenceWitness(swap.sell.resource, tree.generate_path(nf))
    w_offer = ResourceExistenceWitness(offer, tree.generate_path(cm_offer))
    w_ret = ResourceExistenceWitness(returned, tree.generate_path(cm_ret))
    circ = PartialFulfillmentIntentResourceLogicCircuit(
        w_intent, w_sell, w_offer, w_ret, swap
    )
    _mock_ok(circ)


def test_field_addition_rl_mock():
    res = Resource.random(rng)
    w, _root = _witness_for(res, is_input=True)
    circ = FieldAdditionResourceLogicCircuit(w, Fp(3), Fp(39))
    pub = circ.get_public_inputs()
    assert pub[6] == Fp(42)
    _mock_ok(circ)


def test_app_bytecode_roundtrips():
    auth, sk = TokenAuthorization.random(rng)
    token = Token("RT", 9)
    tr = token.create_random_input_token_resource(rng, Fp.random(rng), auth)
    w, _root = _witness_for(tr.resource, is_input=True)
    circ = TokenResourceLogicCircuit(
        w, token.name, auth, compressed_receiver_vk(), RandomSeed.random(rng)
    )
    bc = circ.to_bytecode()
    back = bc.decode()
    assert back.get_public_inputs()[1] == circ.get_public_inputs()[1]
