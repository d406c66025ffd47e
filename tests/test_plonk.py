"""End-to-end proving system tests on a small vanilla-PLONK circuit (k=5)."""

import pytest

from taiga_tpu.crypto.fields import Fp
from taiga_tpu.plonk.circuit import Circuit, CircuitBuilder, ConstraintSystem
from taiga_tpu.plonk.keygen import keygen
from taiga_tpu.plonk.mock import MockProver
from taiga_tpu.plonk.prover import create_proof
from taiga_tpu.plonk.verifier import verify_proof

K = 5


class FibCircuit(Circuit):
    """Proves knowledge of a Fibonacci-like chain: given public (a0, a1, out),
    a_{i+1} = a_i * a_{i-1} + a_{i-1} for N steps ends at `out`. Exercises the
    vanilla gate (q_l, q_r, q_m, q_o, q_c), copies, and instance binding."""

    NUM_FIXED = 5  # q_l q_r q_m q_o q_c
    NUM_ADVICE = 3
    NUM_INSTANCE = 1
    STEPS = 6

    def __init__(self, a0=None, a1=None):
        self.a0, self.a1 = a0, a1

    @classmethod
    def configure(cls, cs: ConstraintSystem):
        ql, qr, qm, qo, qc = (cs.fixed(i) for i in range(5))
        a, b, c = (cs.advice(i) for i in range(3))
        cs.create_gate("vanilla", ql * a + qr * b + qm * a * b + qo * c + qc)
        return None

    def synthesize(self, builder: CircuitBuilder, config):
        def mul_add(x_cell, y_cell):
            # c = x*y + y  ->  q_m=1, q_r=1, q_o=-1
            row = builder.alloc_rows(1)
            builder.assign_fixed(1, row, 1)
            builder.assign_fixed(2, row, 1)
            builder.assign_fixed(3, row, Fp(-1))
            xa = builder.assign_advice(0, row, x_cell.value)
            ya = builder.assign_advice(1, row, y_cell.value)
            builder.copy(xa, x_cell)
            builder.copy(ya, y_cell)
            val = None
            if builder.known(xa, ya):
                val = Fp(xa.value) * Fp(ya.value) + Fp(ya.value)
            return builder.assign_advice(2, row, val)

        row = builder.alloc_rows(1)
        x = builder.assign_advice(0, row, self.a0)
        y = builder.assign_advice(1, row, self.a1)
        builder.constrain_instance(x, 0)
        builder.constrain_instance(y, 1)
        for _ in range(self.STEPS):
            x, y = y, mul_add(x, y)
        builder.constrain_instance(y, 2)


def _expected_out(a0, a1):
    x, y = Fp(a0), Fp(a1)
    for _ in range(FibCircuit.STEPS):
        x, y = y, x * y + y
    return y


@pytest.fixture(scope="module")
def pk():
    return keygen(FibCircuit(), K)


def test_mock_satisfied():
    out = _expected_out(3, 4)
    MockProver.run(K, FibCircuit(3, 4), [Fp(3), Fp(4), out]).assert_satisfied()


def test_mock_catches_bad_instance():
    out = _expected_out(3, 4)
    mp = MockProver.run(K, FibCircuit(3, 4), [Fp(3), Fp(4), out + Fp.one()])
    assert mp.verify(), "should report copy mismatch"


def test_prove_and_verify(pk):
    out = _expected_out(3, 4)
    inst = [Fp(3), Fp(4), out]
    proof = create_proof(pk, FibCircuit(3, 4), inst)
    assert verify_proof(pk.vk, inst, proof)


def test_verify_rejects_wrong_instance(pk):
    out = _expected_out(3, 4)
    proof = create_proof(pk, FibCircuit(3, 4), [Fp(3), Fp(4), out])
    assert not verify_proof(pk.vk, [Fp(3), Fp(4), out + Fp.one()], proof)
    assert not verify_proof(pk.vk, [Fp(3), Fp(5), out], proof)


def test_verify_rejects_tampered_proof(pk):
    out = _expected_out(3, 4)
    inst = [Fp(3), Fp(4), out]
    proof = bytearray(create_proof(pk, FibCircuit(3, 4), inst))
    proof[40] ^= 1
    assert not verify_proof(pk.vk, inst, bytes(proof))
    assert not verify_proof(pk.vk, inst, bytes(proof[:-32]))


def test_batch_verifier(pk):
    from taiga_tpu.plonk.verifier import BatchVerifier

    out = _expected_out(3, 4)
    inst = [Fp(3), Fp(4), out]
    p1 = create_proof(pk, FibCircuit(3, 4), inst)
    p2 = create_proof(pk, FibCircuit(3, 4), inst)
    bv = BatchVerifier()
    bv.add(pk.vk, inst, p1)
    bv.add(pk.vk, inst, p2)
    assert bv.finalize()
    # a wrong-instance proof poisons the batch
    bv = BatchVerifier()
    bv.add(pk.vk, inst, p1)
    bv.add(pk.vk, [Fp(3), Fp(4), out + Fp.one()], p2)
    assert not bv.finalize()
    # finalize resets state
    bv.add(pk.vk, inst, p1)
    assert bv.finalize()


def test_proofs_are_randomized(pk):
    out = _expected_out(3, 4)
    inst = [Fp(3), Fp(4), out]
    p1 = create_proof(pk, FibCircuit(3, 4), inst)
    p2 = create_proof(pk, FibCircuit(3, 4), inst)
    assert p1 != p2  # hiding commitments/blinding
    assert verify_proof(pk.vk, inst, p1) and verify_proof(pk.vk, inst, p2)
