"""Vamp-IR circuit path: parse, constrain, prove (reference
resource_logic_circuit.rs:617-764 + vamp_ir_utils.rs; sample program
vamp_ir_circuits/pyth.pir)."""

import pytest

from taiga_tpu.circuits.vamp_ir import (
    MissingAssignment,
    SourceParsingError,
    VampIRResourceLogicCircuit,
    compile_module,
)
from taiga_tpu.crypto.fields import Fp
from taiga_tpu.plonk.keygen import keygen
from taiga_tpu.plonk.mock import MockProver
from taiga_tpu.plonk.prover import create_proof
from taiga_tpu.plonk.verifier import verify_proof

K = 7


def _rejected(circuit) -> bool:
    """A bad witness is rejected either fail-fast at synthesis (the builder
    asserts on violated copy constraints in prove mode) or by MockProver."""
    try:
        mp = MockProver.run(K, circuit, circuit.get_public_inputs())
    except AssertionError:
        return True
    return mp.verify() != []

PYTH = """
// declare R to be public
pub R;

// define the Pythagorean relation we are checking
def pyth a b c = {
  a^2 + b^2 = c^2
};

// appends constraint x^2 + y^2 = R^2 to the circuit
pyth x y R;
"""


def test_parse_pyth_module():
    m = compile_module(PYTH)
    assert m.pubs == ["R"]
    assert sorted(m.variables) == ["R", "x", "y"]
    assert len(m.constraints) == 1
    assert m.eval_host(m.constraints[0][0], {"x": 3, "y": 4}) == 25
    assert m.eval_host(m.constraints[0][1], {"R": 5}) == 25


def test_pyth_mock_prover_ok_and_bad():
    cls = VampIRResourceLogicCircuit.for_source(PYTH)
    good = cls({"x": 15, "y": 20, "R": 25})
    mp = MockProver.run(K, good, good.get_public_inputs())
    assert mp.verify() == []

    assert _rejected(cls({"x": 1, "y": 20, "R": 25}))


def test_missing_assignment_rejected():
    cls = VampIRResourceLogicCircuit.for_source(PYTH)
    with pytest.raises(MissingAssignment):
        cls({"x": 15, "y": 20})


def test_malformed_source_rejected():
    with pytest.raises(SourceParsingError):
        compile_module("def broken = ;")
    with pytest.raises(SourceParsingError):
        compile_module("undefined_fn x y;")


def test_arithmetic_subset():
    src = """
    pub out;
    def double x = 2 * x;
    def dec x = x - 1;
    out = double (dec a) + b / c;
    """
    m = compile_module(src)
    # a=4, b=9, c=3 -> 2*(4-1) + 3 = 9
    cls = VampIRResourceLogicCircuit.for_source(src)
    circ = cls({"a": 4, "b": 9, "c": 3, "out": 9})
    mp = MockProver.run(K, circ, circ.get_public_inputs())
    assert mp.verify() == []
    # wrong out fails
    assert _rejected(cls({"a": 4, "b": 9, "c": 3, "out": 8}))
    # division by zero denominator is rejected at witness time
    with pytest.raises(Exception):
        wit = cls({"a": 4, "b": 9, "c": 0, "out": 9})
        MockProver.run(K, wit, wit.get_public_inputs())


def test_pyth_real_prove_verify():
    cls = VampIRResourceLogicCircuit.for_source(PYTH)
    circ = cls({"x": 15, "y": 20, "R": 25})
    pk = keygen(cls(), K)
    inst = circ.get_public_inputs()
    proof = create_proof(pk, circ, inst)
    assert verify_proof(pk.vk, inst, proof)
    # tampered public input fails
    bad = list(inst)
    bad[0] = Fp(bad[0].v + 1)
    assert not verify_proof(pk.vk, bad, proof)


def test_bytecode_roundtrip():
    cls = VampIRResourceLogicCircuit.for_source(PYTH)
    circ = cls({"x": 15, "y": 20, "R": 25})
    data = circ.to_bytes()
    back = VampIRResourceLogicCircuit.from_bytes(data)
    assert type(back).MODULE.digest == type(circ).MODULE.digest
    assert back.assignments == circ.assignments
    assert back.get_public_inputs()[0] == Fp(25)
