import random

import numpy as np
import pytest

from taiga_tpu.crypto.fields import Fp, Fq
from taiga_tpu.ops import limbs as L

rng = random.Random(0x11BB5)


@pytest.mark.parametrize("spec,F", [(L.FP, Fp), (L.FQ, Fq)])
def test_limb_roundtrip(spec, F):
    vals = [0, 1, F.MODULUS - 1] + [F.random(rng).v for _ in range(5)]
    arr = L.ints_to_limbs(vals)
    assert L.limbs_to_ints(arr) == vals


@pytest.mark.parametrize("field,spec,F", [("fp", L.FP, Fp), ("fq", L.FQ, Fq)])
def test_add_sub_against_host(field, spec, F):
    n = 64
    av = [F.random(rng).v for _ in range(n)]
    bv = [F.random(rng).v for _ in range(n)]
    # include edge cases
    av[0], bv[0] = F.MODULUS - 1, F.MODULUS - 1
    av[1], bv[1] = 0, 0
    av[2], bv[2] = F.MODULUS - 1, 1
    a, b = L.ints_to_limbs(av), L.ints_to_limbs(bv)
    got_add = L.limbs_to_ints(L.batch_op("add", a, b, field))
    got_sub = L.limbs_to_ints(L.batch_op("sub", a, b, field))
    exp_add = [(x + y) % F.MODULUS for x, y in zip(av, bv)]
    exp_sub = [(x - y) % F.MODULUS for x, y in zip(av, bv)]
    assert got_add == exp_add
    assert got_sub == exp_sub


@pytest.mark.parametrize("field,spec,F", [("fp", L.FP, Fp), ("fq", L.FQ, Fq)])
def test_mont_mul_against_host(field, spec, F):
    n = 64
    av = [F.random(rng).v for _ in range(n)]
    bv = [F.random(rng).v for _ in range(n)]
    av[0], bv[0] = F.MODULUS - 1, F.MODULUS - 1
    av[1], bv[1] = 0, 12345
    av[2], bv[2] = 1, 1
    a = np.asarray(spec.array_to_mont(av))
    b = np.asarray(spec.array_to_mont(bv))
    got = spec.array_from_mont(L.batch_op("mul", a, b, field))
    exp = [(x * y) % F.MODULUS for x, y in zip(av, bv)]
    assert got == exp


def test_to_from_mont():
    import jax.numpy as jnp

    vals = [Fp.random(rng).v for _ in range(8)]
    plain = L.ints_to_limbs(vals)
    m = L.to_mont(jnp.asarray(plain), L.FP)
    back = L.from_mont(m, L.FP)
    assert L.limbs_to_ints(back) == vals
    # to_mont output matches host conversion
    assert L.limbs_to_ints(m) == [(v * L.FP.r) % Fp.MODULUS for v in vals]


def test_mont_pow_and_inv():
    import jax.numpy as jnp

    vals = [Fp.random(rng).v for _ in range(4)]
    a = jnp.asarray(L.FP.array_to_mont(vals))
    sq = L.mont_pow(a, 2, L.FP)
    assert L.FP.array_from_mont(sq) == [v * v % Fp.MODULUS for v in vals]
    cube = L.mont_pow(a, 3, L.FP)
    assert L.FP.array_from_mont(cube) == [pow(v, 3, Fp.MODULUS) for v in vals]


def test_neg_and_is_zero():
    import jax.numpy as jnp

    vals = [0, 1, Fp.MODULUS - 1]
    a = jnp.asarray(L.ints_to_limbs(vals))
    n = L.neg(a, L.FP)
    assert L.limbs_to_ints(n) == [(-v) % Fp.MODULUS for v in vals]
    assert list(np.asarray(L.is_zero(a))) == [True, False, False]
