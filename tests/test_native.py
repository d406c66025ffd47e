"""Native C++ host crypto engine vs the pure-Python reference."""

import random

import pytest

from taiga_tpu import native
from taiga_tpu.crypto import poseidon as hp
from taiga_tpu.crypto.fields import Fp

rng = random.Random(0x8A7)

pytestmark = pytest.mark.skipif(native.lib() is None, reason="no C++ toolchain")


def test_poseidon_permute_matches_python():
    for _ in range(10):
        st = [rng.randrange(Fp.MODULUS) for _ in range(3)]
        # call python reference path directly
        got = native.poseidon_permute_ints(list(st))
        p = Fp.MODULUS
        s = list(st)
        half = hp.FULL_ROUNDS // 2
        r = 0
        for rnd in range(hp.FULL_ROUNDS + hp.PARTIAL_ROUNDS):
            rc = hp.ROUND_CONSTANTS[rnd]
            s = [(x + c) % p for x, c in zip(s, rc)]
            if rnd < half or rnd >= half + hp.PARTIAL_ROUNDS:
                s = [pow(x, 5, p) for x in s]
            else:
                s[0] = pow(s[0], 5, p)
            s = [sum(hp.MDS[i][j] * s[j] for j in range(3)) % p for i in range(3)]
        assert got == s


def test_merkle_fold_matches_python():
    from taiga_tpu.core.merkle import MerklePath, Node

    path = MerklePath.random(rng, 32)
    leaf = Fp.random(rng)
    exp = path.root(Node(leaf)).inner().v
    sib = [pnode.inner().v for pnode, _ in path.path]
    flags = [lr.is_left() for _, lr in path.path]
    assert native.merkle_fold(leaf.v, sib, flags) == exp


def test_mont_mul_batch():
    so = native.lib()
    a = [rng.randrange(Fp.MODULUS) for _ in range(32)]
    b = [rng.randrange(Fp.MODULUS) for _ in range(32)]
    import ctypes

    out = (ctypes.c_uint64 * (4 * 32))()
    so.taiga_mont_mul_batch(
        native.FIELD_FP, out, native._ints_to_u64(a), native._ints_to_u64(b), 32
    )
    got = native._u64_to_ints(out, 32)
    assert got == [x * y % Fp.MODULUS for x, y in zip(a, b)]
