"""Batched elliptic-curve arithmetic over the Pasta curves as limb tensors.

Points are Jacobian (X, Y, Z) triples of (..., 16) uint32 Montgomery limbs
(Z = 0 encodes the identity). Both Pallas (coords in Fp) and Vesta (coords in
Fq) are a = 0, b = 5 curves, so the same formulas apply with the coordinate
FieldSpec passed in.

Complete addition is branch-free: the add and double paths are both computed
and the correct result selected lane-wise (TPU-friendly; no data-dependent
control flow). Used by the Pippenger MSM in ops/msm.py and differentially
tested against `taiga_tpu.crypto.curves` (tests/test_ec.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..crypto.curves import CurvePoint, PallasPoint, VestaPoint
from ..crypto.fields import Fp, Fq
from . import limbs as L


def spec_for(curve: type[CurvePoint]) -> L.FieldSpec:
    return L.FP if curve.FIELD is Fp else L.FQ


# --- host <-> device conversion --------------------------------------------


def points_to_device(points: list[CurvePoint]) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Affine host points -> Jacobian Montgomery limb arrays (z = 1 or 0)."""
    curve = type(points[0])
    spec = spec_for(curve)
    xs, ys, zs = [], [], []
    for pt in points:
        if pt.is_identity():
            xs.append(0)
            ys.append(1)
            zs.append(0)
        else:
            xs.append(pt.x.v)
            ys.append(pt.y.v)
            zs.append(1)
    return (
        np.asarray(spec.array_to_mont(xs)),
        np.asarray(spec.array_to_mont(ys)),
        np.asarray(spec.array_to_mont(zs)),
    )


def points_from_device(xyz, curve: type[CurvePoint]) -> list[CurvePoint]:
    """Jacobian Montgomery limb arrays -> affine host points (exact)."""
    spec = spec_for(curve)
    F = curve.FIELD
    x_i = spec.array_from_mont(xyz[0])
    y_i = spec.array_from_mont(xyz[1])
    z_i = spec.array_from_mont(xyz[2])
    out = []
    for xv, yv, zv in zip(x_i, y_i, z_i):
        if zv == 0:
            out.append(curve.identity())
        else:
            zinv = pow(zv, -1, F.MODULUS)
            zi2 = zinv * zinv % F.MODULUS
            out.append(
                curve(F(xv * zi2 % F.MODULUS), F(yv * zi2 % F.MODULUS * zinv % F.MODULUS))
            )
    return out


# --- group law --------------------------------------------------------------


def ec_double(p, spec: L.FieldSpec):
    """Jacobian doubling for a = 0 (dbl-2009-l). Identity-safe (Z3 = 2YZ = 0);
    also maps 2-torsion (Y = 0) to Z3 = 0 correctly."""
    x, y, z = p
    a = L.mont_mul(x, x, spec)  # A = X^2
    b = L.mont_mul(y, y, spec)  # B = Y^2
    c = L.mont_mul(b, b, spec)  # C = B^2
    xb = L.add(x, b, spec)
    d = L.sub(L.sub(L.mont_mul(xb, xb, spec), a, spec), c, spec)
    d = L.add(d, d, spec)  # D = 2((X+B)^2 - A - C)
    e = L.add(L.add(a, a, spec), a, spec)  # E = 3A
    f = L.mont_mul(e, e, spec)  # F = E^2
    x3 = L.sub(f, L.add(d, d, spec), spec)
    c8 = L.add(L.add(c, c, spec), L.add(c, c, spec), spec)
    c8 = L.add(c8, c8, spec)  # 8C
    y3 = L.sub(L.mont_mul(e, L.sub(d, x3, spec), spec), c8, spec)
    yz = L.mont_mul(y, z, spec)
    z3 = L.add(yz, yz, spec)
    return x3, y3, z3


def ec_add(p, q, spec: L.FieldSpec):
    """Complete Jacobian addition via compute-both-and-select."""
    x1, y1, z1 = p
    x2, y2, z2 = q
    z1z1 = L.mont_mul(z1, z1, spec)
    z2z2 = L.mont_mul(z2, z2, spec)
    u1 = L.mont_mul(x1, z2z2, spec)
    u2 = L.mont_mul(x2, z1z1, spec)
    s1 = L.mont_mul(y1, L.mont_mul(z2, z2z2, spec), spec)
    s2 = L.mont_mul(y2, L.mont_mul(z1, z1z1, spec), spec)
    h = L.sub(u2, u1, spec)
    r = L.sub(s2, s1, spec)
    hh = L.mont_mul(h, h, spec)
    hhh = L.mont_mul(h, hh, spec)
    v = L.mont_mul(u1, hh, spec)
    r2 = L.mont_mul(r, r, spec)
    x3 = L.sub(L.sub(r2, hhh, spec), L.add(v, v, spec), spec)
    y3 = L.sub(
        L.mont_mul(r, L.sub(v, x3, spec), spec), L.mont_mul(s1, hhh, spec), spec
    )
    z3 = L.mont_mul(L.mont_mul(z1, z2, spec), h, spec)

    dx, dy, dz = ec_double(p, spec)

    p_inf = L.is_zero(z1)
    q_inf = L.is_zero(z2)
    h_zero = L.is_zero(h)
    r_zero = L.is_zero(r)
    both = (~p_inf) & (~q_inf)
    is_double = both & h_zero & r_zero
    is_cancel = both & h_zero & (~r_zero)  # P = -Q -> identity

    x_out = jnp.where(is_double[..., None], dx, x3)
    y_out = jnp.where(is_double[..., None], dy, y3)
    z_out = jnp.where(is_double[..., None], dz, z3)
    z_out = jnp.where(is_cancel[..., None], jnp.zeros_like(z_out), z_out)
    # identity operands
    x_out = jnp.where(p_inf[..., None], x2, jnp.where(q_inf[..., None], x1, x_out))
    y_out = jnp.where(p_inf[..., None], y2, jnp.where(q_inf[..., None], y1, y_out))
    z_out = jnp.where(p_inf[..., None], z2, jnp.where(q_inf[..., None], z1, z_out))
    return x_out, y_out, z_out


def ec_select(cond, p, q):
    """cond ? p : q lane-wise (cond: (...,) bool)."""
    return tuple(jnp.where(cond[..., None], a, b) for a, b in zip(p, q))


def ec_scalar_mul_shared(p, scalar_limbs, spec: L.FieldSpec, bits: int = 255):
    """[s] P lane-wise where all lanes share ONE scalar (plain 16-bit limbs,
    shape (16,)). Double-and-add, LSB first, select on the shared bit —
    used by the IPA generator fold (G' = G_lo + [u^-1] G_hi)."""
    import jax

    def body(i, carry):
        acc, base = carry
        limb = jax.lax.dynamic_index_in_dim(scalar_limbs, i // 16, keepdims=False)
        bit = (limb >> (i % 16)) & 1
        added = ec_add(acc, base, spec)
        acc = ec_select(jnp.broadcast_to(bit > 0, acc[0].shape[:-1]), added, acc)
        base = ec_double(base, spec)
        return acc, base

    zero = tuple(t & jnp.uint32(0) for t in p)
    acc, _ = jax.lax.fori_loop(0, bits, body, (zero, p))
    return acc


def ec_identity_like(p):
    spec_one = jnp.zeros_like(p[0])
    return jnp.zeros_like(p[0]), jnp.zeros_like(p[1]), jnp.zeros_like(p[2])


def ec_neg(p, spec: L.FieldSpec):
    x, y, z = p
    return x, L.neg(y, spec), z
