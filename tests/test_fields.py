import random

import pytest

from taiga_tpu.crypto.fields import Fp, Fq, P, Q, mod_r_p, to_field_elements

rng = random.Random(0xF1E1D5)


@pytest.mark.parametrize("F", [Fp, Fq])
def test_field_axioms(F):
    for _ in range(20):
        a, b, c = F.random(rng), F.random(rng), F.random(rng)
        assert (a + b) + c == a + (b + c)
        assert a + b == b + a
        assert a * (b + c) == a * b + a * c
        assert a - a == F.zero()
        assert a * F.one() == a
        if not a.is_zero():
            assert a * a.invert() == F.one()
        assert (a * b) * c == a * (b * c)
        assert -(-a) == a
        assert a.square() == a * a


@pytest.mark.parametrize("F", [Fp, Fq])
def test_repr_roundtrip(F):
    for _ in range(10):
        a = F.random(rng)
        assert F.from_repr(a.to_repr()) == a
    # out-of-range repr rejected
    assert F.from_repr((F.MODULUS).to_bytes(32, "little")) is None
    assert F.from_repr(((1 << 256) - 1).to_bytes(32, "little")) is None


@pytest.mark.parametrize("F", [Fp, Fq])
def test_sqrt(F):
    for _ in range(20):
        a = F.random(rng)
        sq = a.square()
        r = sq.sqrt()
        assert r is not None and r.square() == sq
    # non-residue count sanity: exactly one of (x, g*x) is a QR for x != 0
    g = F(F.GENERATOR)
    a = F.random(rng).square() * g
    assert a.sqrt() is None


@pytest.mark.parametrize("F", [Fp, Fq])
def test_root_of_unity(F):
    w = F.root_of_unity()
    assert w ** (1 << 32) == F.one()
    assert w ** (1 << 31) != F.one()


def test_moduli():
    assert P < Q  # pallas base < pallas scalar => mod_r_p needs no reduction
    assert P % (1 << 32) == 1 and Q % (1 << 32) == 1
    a = Fp.random(rng)
    assert mod_r_p(a).v == a.v


def test_to_field_elements():
    # 31 bytes per element, little-endian (utils.rs:88-98)
    els = to_field_elements(b"Taiga_ExpandSeed")
    assert len(els) == 1
    assert els[0].v == int.from_bytes(b"Taiga_ExpandSeed", "little")
    els2 = to_field_elements(bytes(range(40)))
    assert len(els2) == 2
    assert els2[1].v == int.from_bytes(bytes(range(31, 40)), "little")


@pytest.mark.parametrize("F", [Fp, Fq])
def test_from_uniform_bytes(F):
    b = bytes(range(64))
    assert F.from_uniform_bytes(b).v == int.from_bytes(b, "little") % F.MODULUS
