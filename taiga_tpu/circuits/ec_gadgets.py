"""In-circuit Pallas elliptic-curve gadgets (shared by the compliance circuit
and the resource-logic examples).

Mirrors the used surface of halo2_gadgets' EccChip (reference
taiga_halo2/src/circuit/integrity.rs:546-630 delta commitment,
resource_logic_examples/signature_verification.rs Schnorr verification,
resource_encryption_circuit.rs DH): witnessed non-identity points with an
on-curve check, one-row incomplete add/double gates, and blinded double-and-
add scalar multiplication over little-endian bit cells.
"""

from __future__ import annotations

from ..crypto.curves import PallasPoint
from ..crypto.fields import Fp
from ..plonk.circuit import CircuitBuilder
from . import gadgets as G

P = Fp.MODULUS


class PointCells:
    """An affine Pallas point as two advice cells."""

    __slots__ = ("x", "y")

    def __init__(self, x, y):
        self.x = x
        self.y = y


def witness_point(b: CircuitBuilder, point: PallasPoint | None) -> PointCells:
    """Witness a non-identity affine point with the on-curve constraint
    y^2 = x^3 + 5 (the reference's NonIdentityPoint::new)."""
    xv = None if point is None else point.x.v
    yv = None if point is None else point.y.v
    x = G.witness_cell(b, xv)
    y = G.witness_cell(b, yv)
    x2 = G.mul_cells(b, x, x)
    x3 = G.mul_cells(b, x2, x)
    y2 = G.mul_cells(b, y, y)
    d = G.sub_cells(b, y2, x3)
    G.assert_equal_constant(b, d, 5)
    return PointCells(x, y)


def constant_point(b: CircuitBuilder, point: PallasPoint) -> PointCells:
    return PointCells(
        G.constant_cell(b, point.x.v), G.constant_cell(b, point.y.v)
    )


def ec_add_gadget(b: CircuitBuilder, p1: PointCells, p2: PointCells) -> PointCells:
    """Incomplete affine addition (one row). Caller must ensure x1 != x2."""
    row = b.alloc_rows(1)
    b.assign_fixed(G.Q_EC_ADD, row, 1)
    known = p1.x.value is not None and p2.x.value is not None
    if known:
        x1, y1, x2, y2 = p1.x.value, p1.y.value, p2.x.value, p2.y.value
        assert x1 != x2, "incomplete add degeneracy"
        lam = (y2 - y1) * pow(x2 - x1, -1, P) % P
        x3 = (lam * lam - x1 - x2) % P
        y3 = (lam * (x1 - x3) - y1) % P
    else:
        lam = x3 = y3 = None
    cx1 = b.assign_advice(0, row, p1.x.value)
    cy1 = b.assign_advice(1, row, p1.y.value)
    cx2 = b.assign_advice(2, row, p2.x.value)
    cy2 = b.assign_advice(3, row, p2.y.value)
    b.assign_advice(4, row, lam)
    cx3 = b.assign_advice(5, row, x3)
    cy3 = b.assign_advice(6, row, y3)
    b.copy(cx1, p1.x)
    b.copy(cy1, p1.y)
    b.copy(cx2, p2.x)
    b.copy(cy2, p2.y)
    return PointCells(cx3, cy3)


def ec_dbl_gadget(b: CircuitBuilder, p: PointCells) -> PointCells:
    row = b.alloc_rows(1)
    b.assign_fixed(G.Q_EC_DBL, row, 1)
    if p.x.value is not None:
        x1, y1 = p.x.value, p.y.value
        lam = 3 * x1 * x1 % P * pow(2 * y1 % P, -1, P) % P
        x3 = (lam * lam - 2 * x1) % P
        y3 = (lam * (x1 - x3) - y1) % P
    else:
        lam = x3 = y3 = None
    cx1 = b.assign_advice(0, row, p.x.value)
    cy1 = b.assign_advice(1, row, p.y.value)
    b.assign_advice(2, row, lam)
    cx3 = b.assign_advice(3, row, x3)
    cy3 = b.assign_advice(4, row, y3)
    b.copy(cx1, p.x)
    b.copy(cy1, p.y)
    return PointCells(cx3, cy3)


def ec_select_gadget(b: CircuitBuilder, flag, p: PointCells, q: PointCells) -> PointCells:
    return PointCells(
        G.select_cell(b, flag, p.x, q.x), G.select_cell(b, flag, p.y, q.y)
    )


def ec_scalar_mul_gadget(
    b: CircuitBuilder, point: PointCells, scalar_bits, blind: PallasPoint
) -> PointCells:
    """[s]P for s given as little-endian boolean cells. Accumulator starts at
    the blinding base T and ends subtracting [2^len]T, so every intermediate
    add is between (w.h.p.) unrelated points — incomplete adds are safe."""
    t = blind
    acc = constant_point(b, t)
    # MSB-first double-and-add: acc = 2*acc + bit*P
    for bit in reversed(scalar_bits):
        acc = ec_dbl_gadget(b, acc)
        added = ec_add_gadget(b, acc, point)
        acc = ec_select_gadget(b, bit, added, acc)
    # subtract [2^len] T: acc + (-[2^len] T)
    corr = -(t * (1 << len(scalar_bits)))
    return ec_add_gadget(b, acc, constant_point(b, corr))


def blind_base(tag: bytes = b"acc") -> PallasPoint:
    """Deterministic accumulator-blinding point (no known discrete log)."""
    from ..crypto.curves import pallas_hash_to_curve

    return pallas_hash_to_curve("taiga-tpu-ec-blind", tag)


def decompose_canonical_255(b: CircuitBuilder, cell, one_cell):
    """Canonical (< p) 255-bit little-endian decomposition of a field cell.
    Reuses the Blake2s word-decomposition region (circuits/blake2s.py) —
    this is the sound counterpart of halo2's ScalarVar::from_base."""
    from .blake2s import field_to_words

    words = field_to_words(b, cell, one_cell)
    bits = [bit for w in words for bit in w.bits]
    return bits[:255]  # bit 255 is constrained to zero
