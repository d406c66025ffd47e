"""SLOW TIER: the three reference end-to-end flows with REAL proofs.

The reference's `examples/tx_examples` binary (main.rs:5-17) builds three
full multi-party transactions with `Proof::create`-backed shielded partial
transactions: the 3-party cyclic swap (token_swap_without_intent.rs), the
intent-matched swap (token_swap_with_intent.rs), and the partial-fulfillment
limit order (partial_fulfillment_token_swap.rs). This is the first
real-prover coverage for the token, signature-verification (Schnorr auth),
receiver (encryption), or-relation-intent and partial-fulfillment-intent
circuits — everywhere else they run under the MockProver-equivalent only.

Each flow: prove + execute, wire round-trip + re-execute, and reject one
tampered resource-logic proof.

Run with: pytest tests/ -m slow  (budget: ~2-4 min per flow on 4 cores)
"""

import copy
import random

import pytest

from taiga_tpu.core.api import (
    transaction_deserialize,
    transaction_serialize,
    verify_transaction,
)
from taiga_tpu.core.error import TransactionError
from taiga_tpu.core.proving import Proof, params_override
from taiga_tpu.examples import (
    create_partial_fulfillment_transaction,
    create_token_swap_intent_transaction,
    create_token_swap_transaction,
)

pytestmark = pytest.mark.slow

rng = random.Random(0x5E2E)


@pytest.fixture(autouse=True, scope="module")
def _params():
    # production domain sizes (compliance k=13, rl k=12)
    with params_override():
        yield


def _roundtrip_and_tamper(tx, n_nf: int):
    result = verify_transaction(tx)
    assert len(result.nullifiers) == n_nf

    # wire round-trip, then re-execute (transaction.rs:363-373 does the same)
    tx2 = transaction_deserialize(transaction_serialize(tx))
    result2 = verify_transaction(tx2)
    assert [n.inner() for n in result2.nullifiers] == [
        n.inner() for n in result.nullifiers
    ]

    # flip one byte of the first ptx's app resource-logic proof: the
    # transaction must be rejected (error.rs Proof arm)
    bad = copy.deepcopy(tx)
    info = bad.shielded_ptx_bundle.partial_txs[0].inputs[0].app_resource_logic_verifying_info
    data = bytearray(info.proof.data)
    data[64] ^= 1
    info.proof = Proof(bytes(data))
    with pytest.raises(TransactionError):
        verify_transaction(bad)


def test_shielded_three_party_cyclic_swap():
    """Alice 5 BTC -> 10 ETH, Bob 10 ETH -> 15 XAN, Carol 15 XAN -> 5 BTC —
    3 ptxs x (1 compliance + token/auth input logics + token/receiver output
    logics), all real proofs (token_swap_without_intent.rs:17-74)."""
    tx = create_token_swap_transaction(rng, mode="shielded")
    _roundtrip_and_tamper(tx, n_nf=3)


def test_shielded_intent_matched_swap():
    """Alice's "1 DOLPHIN or 2 MONKEY for 5 BTC" or-relation intent, Bob's
    leg, and the solver consuming the intent (token_swap_with_intent.rs)."""
    tx = create_token_swap_intent_transaction(rng, mode="shielded")
    _roundtrip_and_tamper(tx, n_nf=3)


def test_shielded_partial_fulfillment_swap():
    """Alice sells 2 BTC for 10 ETH, the solver fills half (5 ETH + 1 BTC
    change via an ephemeral padding pair) — 4 compliance units
    (partial_fulfillment_token_swap.rs:233-272)."""
    tx = create_partial_fulfillment_transaction(rng, mode="shielded")
    _roundtrip_and_tamper(tx, n_nf=4)
