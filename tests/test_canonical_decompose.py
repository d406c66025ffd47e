"""Canonical 255-bit decomposition: a (v+p)-bit-pattern witness for the same
cell must be rejected (VERDICT round-1 weak #4 — delta-gadget malleability:
two decompositions of one witnessed rcv cell would yield two different delta
commitments). decompose_canonical_255 is what the compliance circuit now uses
for rcv (circuits/compliance.py delta section).
"""

import random

import pytest

from taiga_tpu.circuits import gadgets as G
from taiga_tpu.circuits.ec_gadgets import decompose_canonical_255
from taiga_tpu.crypto.fields import Fp
from taiga_tpu.plonk.circuit import Circuit, CircuitBuilder, ConstraintSystem
from taiga_tpu.plonk.mock import MockProver

rng = random.Random(0xCA70)
K = 11
P = Fp.MODULUS


class CanonCircuit(Circuit):
    NUM_FIXED = G.NUM_FIXED
    NUM_ADVICE = G.NUM_ADVICE
    NUM_INSTANCE = 1

    def __init__(self, x=None, forced=None):
        self.x = x
        self.forced = forced

    @classmethod
    def configure(cls, cs: ConstraintSystem):
        G.configure_standard(cs)
        return None

    def synthesize(self, b: CircuitBuilder, config):
        cell = G.witness_cell(b, self.x)
        bits = decompose_canonical_255(b, cell, _witness_value=self.forced)
        assert len(bits) == 255
        b.constrain_instance(cell, 0)


def test_canonical_decompose_accepts_canonical():
    x = rng.randrange(1 << 120)  # small enough that x+p is representable
    MockProver.run(K, CanonCircuit(x, forced=x), [Fp(x)]).assert_satisfied()


def test_canonical_decompose_rejects_v_plus_p():
    x = rng.randrange(1 << 120)
    # the (x+p) bit pattern recomposes to the same field element x — the old
    # non-canonical gadget accepted it; the canonical one must not
    rejected = False
    try:
        mp = MockProver.run(K, CanonCircuit(x, forced=x + P), [Fp(x)])
        rejected = bool(mp.verify())
    except AssertionError:
        rejected = True  # witness generation itself cannot satisfy the chain
    assert rejected, "(v+p) decomposition must be rejected"


def test_canonical_decompose_random_roundtrip():
    x = Fp.random(rng).v
    mp = MockProver.run(K, CanonCircuit(x, forced=x), [Fp(x)])
    mp.assert_satisfied()
