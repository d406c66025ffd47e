"""Lookup-argument tests (halo2-style permuted pairs + grand product).

The reference compliance config carries a 2^10 lookup table used for range
checks (taiga_halo2/src/circuit/compliance_circuit.rs:38-50, halo2
LookupRangeCheckConfig). These tests exercise our protocol-level lookup:
MockProver detection, real prove+verify, prover failure on an out-of-table
witness, and tamper rejection.
"""

import pytest

from taiga_tpu.crypto.fields import Fp
from taiga_tpu.plonk.circuit import Circuit, CircuitBuilder, ConstraintSystem
from taiga_tpu.plonk.keygen import keygen
from taiga_tpu.plonk.mock import MockProver
from taiga_tpu.plonk.prover import create_proof
from taiga_tpu.plonk.verifier import verify_proof

K = 9  # 512 rows: fits the 256-entry byte table + witnesses + blinding


class ByteRangeCircuit(Circuit):
    """Each gated advice value must be a byte (0..255), enforced purely by a
    lookup into a fixed table column. A second lookup checks value pairs
    (v, 2v mod 256) against a two-column table to exercise theta compression.
    Public input: sum of the witnessed bytes."""

    NUM_FIXED = 4  # q (selector), t_byte, t_double_lo, t_double_hi
    NUM_ADVICE = 3  # v, v2 = 2v mod 256, running sum
    NUM_INSTANCE = 1
    NUM_VALUES = 8  # static layout: row count never depends on the witness

    def __init__(self, values=None):
        assert values is None or len(values) == self.NUM_VALUES
        self.values = values

    @classmethod
    def configure(cls, cs: ConstraintSystem):
        q = cs.fixed(0)
        t_byte = cs.fixed(1)
        t_lo = cs.fixed(2)
        t_hi = cs.fixed(3)
        v = cs.advice(0)
        v2 = cs.advice(1)
        s = cs.advice(2)
        cs.lookup("byte", [(q * v, t_byte)])
        cs.lookup("double", [(q * v, t_lo), (q * v2, t_hi)])
        # running sum: s' = s + v on gated rows
        cs.create_gate("sum", q * (s.at(1) - s - v))
        return None

    def synthesize(self, builder: CircuitBuilder, config):
        # table: rows 0..255 hold (i, i, 2i mod 256)
        for i in range(256):
            builder.assign_fixed(1, i, i)
            builder.assign_fixed(2, i, i)
            builder.assign_fixed(3, i, (2 * i) % 256)
        vals = self.values if self.values is not None else [None] * self.NUM_VALUES
        base = builder.alloc_rows(max(256, self.NUM_VALUES + 1))
        assert base == 0
        acc = 0 if self.values is not None else None
        first = builder.assign_advice(2, 0, acc)
        s_cell = first
        for r, val in enumerate(vals):
            builder.assign_fixed(0, r, 1)
            builder.assign_advice(0, r, val)
            builder.assign_advice(1, r, None if val is None else (2 * val) % 256)
            if acc is not None and val is not None:
                acc = (acc + val) % Fp.MODULUS
            s_cell = builder.assign_advice(2, r + 1, acc)
        builder.constrain_instance(first, 0)
        builder.constrain_instance(s_cell, 1)


VALUES = [0, 1, 7, 255, 128, 42, 42, 200]
INST = [Fp(0), Fp(sum(VALUES))]


@pytest.fixture(scope="module")
def pk():
    return keygen(ByteRangeCircuit(), K)


def test_mock_lookup_satisfied():
    MockProver.run(K, ByteRangeCircuit(VALUES), INST).assert_satisfied()


BAD = [0, 1, 300, 255, 0, 0, 0, 0]


def test_mock_lookup_catches_out_of_range():
    mp = MockProver.run(K, ByteRangeCircuit(BAD), [Fp(0), Fp(sum(BAD))])
    fails = mp.verify()
    assert any("lookup 'byte'" in f for f in fails), fails


def test_mock_lookup_catches_pair_mismatch():
    # v=3 is a byte, but v2=7 != 2*3 — only the pair lookup catches it
    class BadPair(ByteRangeCircuit):
        def synthesize(self, builder, config):
            super().synthesize(builder, config)
            builder.advice[1][1] = 7  # corrupt v2 on row 1 (v=1 -> v2 must be 2)

    mp = MockProver.run(K, BadPair(VALUES), INST)
    fails = mp.verify()
    assert any("lookup 'double'" in f for f in fails), fails


def test_lookup_prove_and_verify(pk):
    proof = create_proof(pk, ByteRangeCircuit(VALUES), INST)
    assert verify_proof(pk.vk, INST, proof)


def test_lookup_prover_rejects_out_of_table(pk):
    with pytest.raises(ValueError, match="lookup failure"):
        create_proof(pk, ByteRangeCircuit(BAD), [Fp(0), Fp(sum(BAD))])


def test_lookup_verify_rejects_tamper(pk):
    proof = bytearray(create_proof(pk, ByteRangeCircuit(VALUES), INST))
    proof[40] ^= 1
    assert not verify_proof(pk.vk, INST, bytes(proof))


def test_lookup_verify_rejects_wrong_instance(pk):
    proof = create_proof(pk, ByteRangeCircuit(VALUES), INST)
    assert not verify_proof(pk.vk, [Fp(0), Fp(sum(VALUES) + 1)], proof)
