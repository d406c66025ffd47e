"""End-to-end example flows through the transparent execution path (reference
examples/tx_examples; the shielded variants drive the full prover and run in
the benchmark tier instead of the unit suite)."""

import random

import pytest

from taiga_tpu.core.proving import params_override
from taiga_tpu.examples import (
    create_partial_fulfillment_transaction,
    create_token_swap_intent_transaction,
    create_token_swap_transaction,
)


@pytest.fixture(autouse=True, scope="module")
def _params():
    # production domain sizes (compliance k=13, rl k=12) — every circuit
    # fits since the spread-lookup/packed-gadget rewrite
    with params_override():
        yield

rng = random.Random(0xE2E)


def test_three_party_cyclic_swap():
    tx = create_token_swap_transaction(rng, mode="transparent")
    result = tx.execute()
    assert len(result.nullifiers) == 3
    assert len(result.output_cms) == 3


def test_intent_matched_swap():
    tx = create_token_swap_intent_transaction(rng, mode="transparent")
    result = tx.execute()
    assert len(result.nullifiers) == 3


def test_partial_fulfillment_swap():
    tx = create_partial_fulfillment_transaction(rng, mode="transparent")
    result = tx.execute()
    # alice(1) + bob(1) + solver(2 compliance units)
    assert len(result.nullifiers) == 4
