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


def test_native_ec_scalar_mul_matches_python():
    """Native C++ double-and-add vs the pure-Python chain (both curves)."""
    import random

    from taiga_tpu.crypto.curves import CurvePoint, PallasPoint, VestaPoint

    if native.lib() is None:
        pytest.skip("native engine unavailable")
    rng = random.Random(11)
    for curve in (VestaPoint, PallasPoint):
        g = curve.generator() * rng.getrandbits(100)
        for _ in range(5):
            s = rng.getrandbits(256) % curve.SCALAR.MODULUS
            fast = g * s
            acc, add, k = curve.identity(), g, s
            while k:  # pure-Python oracle (bypasses the native fast path)
                if k & 1:
                    acc = CurvePoint.__add__(acc, add)
                add = CurvePoint.__add__(add, add)
                k >>= 1
            assert fast == acc
        assert (g * 0).is_identity()
        assert (curve.identity() * 777).is_identity()
        assert g * curve.SCALAR.MODULUS == curve.identity()


def test_native_ec_msm_matches_host():
    import random

    from taiga_tpu.crypto.curves import VestaPoint

    if native.lib() is None:
        pytest.skip("native engine unavailable")
    rng = random.Random(13)
    pts = [VestaPoint.generator() * (i + 3) for i in range(20)]
    ss = [rng.getrandbits(255) % VestaPoint.SCALAR.MODULUS for _ in range(20)]
    ss[7] = 0
    got = native.ec_msm(
        native.FIELD_FQ,
        [(p.x.v, p.y.v, p.infinity) for p in pts],
        ss,
    )
    exp = VestaPoint.identity()
    for p, s in zip(pts, ss):
        exp = exp + p * s
    assert got == (exp.x.v, exp.y.v, exp.infinity)
