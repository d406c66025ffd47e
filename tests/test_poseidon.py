import random

from taiga_tpu.crypto.fields import Fp
from taiga_tpu.crypto.poseidon import (
    FULL_ROUNDS,
    MDS,
    MDS_INV,
    PARTIAL_ROUNDS,
    ROUND_CONSTANTS,
    PoseidonSponge,
    permute,
    poseidon_hash,
    poseidon_hash_n,
)

rng = random.Random(0x90551D07)


def test_constant_shapes():
    assert len(ROUND_CONSTANTS) == FULL_ROUNDS + PARTIAL_ROUNDS == 64
    assert all(len(r) == 3 for r in ROUND_CONSTANTS)
    assert len(MDS) == 3 and all(len(r) == 3 for r in MDS)


def test_known_grain_constant():
    """0x360d7470... is a round constant of halo2_gadgets' P128Pow5T3 over Fp
    (recalled independently from halo2_gadgets poseidon/primitives/fp.rs); its
    exact appearance in our Grain stream validates the generation procedure."""
    known = 0x360D7470611E473D353F628F76D110F34E71162F31003B7057538C2596426303
    flat = [c for row in ROUND_CONSTANTS[:2] for c in row]
    assert known in flat


def test_mds_is_cauchy_invertible():
    p = Fp.MODULUS
    # MDS * MDS_INV == I
    for i in range(3):
        for j in range(3):
            s = sum(MDS[i][k] * MDS_INV[k][j] for k in range(3)) % p
            assert s == (1 if i == j else 0)


def test_permute_changes_and_deterministic():
    s = [Fp.random(rng) for _ in range(3)]
    out1 = permute(list(s))
    out2 = permute(list(s))
    assert out1 == out2
    assert out1 != s


def test_hash_basic():
    a, b = Fp.random(rng), Fp.random(rng)
    h1 = poseidon_hash(a, b)
    assert h1 == poseidon_hash(a, b)
    assert h1 != poseidon_hash(b, a) or a == b
    # ConstantLength domain separation: L=2 vs L=3 with zero pad differ
    assert poseidon_hash_n([a, b]) == h1
    assert poseidon_hash_n([a, b, Fp.zero()]) != h1


def test_hash_n_lengths():
    msgs = [Fp(i) for i in range(8)]
    for L in (2, 3, 4, 7, 8):
        h = poseidon_hash_n(msgs[:L])
        assert isinstance(h, Fp)
        assert h == poseidon_hash_n(msgs[:L])


def test_sponge_permute_matches_permutation():
    init = [Fp(1), Fp(2), Fp(3)]
    sp = PoseidonSponge(list(init))
    sp.permute()
    assert sp.state_fp() == permute(init)
