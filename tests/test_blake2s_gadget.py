"""In-circuit Blake2s-256 vs hashlib (differential, MockProver tier)."""

import hashlib
import random

from taiga_tpu.circuits import blake2s as B2
from taiga_tpu.circuits import gadgets as G
from taiga_tpu.core.rl_commitment import ResourceLogicCommitment
from taiga_tpu.crypto.fields import Fp
from taiga_tpu.plonk.circuit import Circuit, CircuitBuilder, ConstraintSystem
from taiga_tpu.plonk.mock import MockProver

rng = random.Random(0xB1A4E)


class _RlCmCircuit(Circuit):
    NUM_FIXED = G.NUM_FIXED
    NUM_ADVICE = G.NUM_ADVICE
    NUM_INSTANCE = 1

    def __init__(self, logic=None, rcm=None):
        self.logic = logic
        self.rcm = rcm

    @classmethod
    def configure(cls, cs: ConstraintSystem):
        G.configure_standard(cs)
        return None

    def synthesize(self, b: CircuitBuilder, config):
        one = G.constant_cell(b, 1)
        logic = G.witness_cell(b, None if self.logic is None else self.logic.v)
        rcm = G.witness_cell(b, None if self.rcm is None else self.rcm.v)
        lo, hi = B2.resource_logic_commitment_gadget(b, logic, rcm, one)
        b.constrain_instance(lo, 0)
        b.constrain_instance(hi, 1)


def test_rl_commitment_gadget_matches_host():
    logic, rcm = Fp.random(rng), Fp.random(rng)
    expect = ResourceLogicCommitment.commit(logic, rcm).to_public_inputs()
    circ = _RlCmCircuit(logic, rcm)
    mp = MockProver.run(14, circ, expect)
    mp.assert_satisfied()


def test_rl_commitment_gadget_rejects_wrong_output():
    logic, rcm = Fp.random(rng), Fp.random(rng)
    wrong = [Fp(1), Fp(2)]
    circ = _RlCmCircuit(logic, rcm)
    mp = MockProver.run(14, circ, wrong)
    assert mp.verify(), "wrong claimed commitment must produce failures"


def test_host_blake2s_personal_param_matches_hashlib():
    # sanity for the init-words derivation used by the gadget
    person = b"VPCommit"
    msg = bytes(range(64))
    h = hashlib.blake2s(msg, digest_size=32, person=person).digest()
    # pure-python compression using the gadget's constants
    hw = [w.const for w in B2.blake2s_init_words(person)]
    m = [int.from_bytes(msg[4 * i : 4 * i + 4], "little") for i in range(16)]

    def ror(x, n):
        return ((x >> n) | (x << (32 - n))) & B2.MASK32

    v = hw + list(B2.IV)
    v[12] ^= 64
    v[14] ^= B2.MASK32

    def g(a, b, c, d, x, y):
        v[a] = (v[a] + v[b] + x) & B2.MASK32
        v[d] = ror(v[d] ^ v[a], 16)
        v[c] = (v[c] + v[d]) & B2.MASK32
        v[b] = ror(v[b] ^ v[c], 12)
        v[a] = (v[a] + v[b] + y) & B2.MASK32
        v[d] = ror(v[d] ^ v[a], 8)
        v[c] = (v[c] + v[d]) & B2.MASK32
        v[b] = ror(v[b] ^ v[c], 7)

    for r in range(10):
        s = B2.SIGMA[r]
        g(0, 4, 8, 12, m[s[0]], m[s[1]])
        g(1, 5, 9, 13, m[s[2]], m[s[3]])
        g(2, 6, 10, 14, m[s[4]], m[s[5]])
        g(3, 7, 11, 15, m[s[6]], m[s[7]])
        g(0, 5, 10, 15, m[s[8]], m[s[9]])
        g(1, 6, 11, 12, m[s[10]], m[s[11]])
        g(2, 7, 8, 13, m[s[12]], m[s[13]])
        g(3, 4, 9, 14, m[s[14]], m[s[15]])
    out = b"".join(
        ((hw[i] ^ v[i] ^ v[i + 8]) & B2.MASK32).to_bytes(4, "little") for i in range(8)
    )
    assert out == h
