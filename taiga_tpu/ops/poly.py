"""Device polynomial primitives: powers, dot products, cumulative products,
suffix sums, and batched evaluation — the building blocks that keep the
prover's multiopen/IPA/permutation math off the host.

All values are (..., 16) uint32 Montgomery limb tensors over Fp (Pallas base
field = Vesta scalar field, the polynomial coefficient field of the IPA
commitment scheme).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import limbs as L


def _spec(field: str) -> L.FieldSpec:
    return L.FP if field == "fp" else L.FQ


def mont_cumprod(a, field: str = "fp"):
    """Inclusive cumulative product along axis 0 (associative scan:
    log2(n) rounds of batched Montgomery muls)."""
    spec = _spec(field)
    return jax.lax.associative_scan(lambda x, y: L.mont_mul(x, y, spec), a, axis=0)


def mod_cumsum(a, field: str = "fp"):
    """Inclusive cumulative sum along axis 0 (mod p)."""
    spec = _spec(field)
    return jax.lax.associative_scan(lambda x, y: L.add(x, y, spec), a, axis=0)


@partial(jax.jit, static_argnames=("n", "field"))
def powers(x_mont, n: int, field: str = "fp"):
    """[1, x, x^2, ..., x^(n-1)] as (n, 16) Montgomery limbs."""
    spec = _spec(field)
    tiled = jnp.broadcast_to(x_mont, (n - 1, L.NLIMBS))
    pows = mont_cumprod(tiled, field)
    one = jnp.broadcast_to(jnp.asarray(spec.one_mont, jnp.uint32), (1, L.NLIMBS))
    return jnp.concatenate([one, pows], axis=0)


def tree_sum(a, axis: int, field: str = "fp"):
    """Modular sum reduction along `axis` (log2 rounds of halving adds)."""
    spec = _spec(field)
    a = jnp.moveaxis(a, axis, 0)
    n = a.shape[0]
    while n > 1:
        if n % 2:
            a = jnp.concatenate([a, jnp.zeros_like(a[:1])], axis=0)
            n += 1
        a = L.add(a[: n // 2], a[n // 2 :], spec)
        n = a.shape[0]
    return a[0]


def mont_dot(a, b, field: str = "fp"):
    """<a, b> over the last-but-one axis: a,b (..., n, 16) -> (..., 16)."""
    return tree_sum(L.mont_mul(a, b, _spec(field)), axis=-2, field=field)


@partial(jax.jit, static_argnames=("field",))
def eval_polys_at_points(coeffs, points, field: str = "fp"):
    """Evaluate C polynomials at Q points: coeffs (C, n, 16), points (Q, 16)
    Montgomery -> (Q, C, 16) Montgomery values."""
    n = coeffs.shape[-2]
    pw = jax.vmap(lambda x: powers(x, n, field))(points)  # (Q, n, 16)
    # (Q, 1, n, 16) * (1, C, n, 16) -> sum over n
    prod = L.mont_mul(pw[:, None], coeffs[None], _spec(field))
    return tree_sum(prod, axis=-2, field=field)


@partial(jax.jit, static_argnames=("field",))
def synthetic_div(coeffs, point, point_inv, field: str = "fp"):
    """q(X) = (A(X) - A(p)) / (X - p) for coeffs (..., n, 16) and a single
    point (16,) with its inverse: q_i = p^{-(i+1)} * sum_{j>i} a_j p^j."""
    n = coeffs.shape[-2]
    pw = powers(point, n + 1, field)  # 1..p^n
    t = L.mont_mul(coeffs, pw[:n], _spec(field))  # a_j p^j
    # suffix sums S_i = sum_{j>i} t_j  (reverse-cumsum exclusive)
    rev = jnp.flip(t, axis=-2)
    cs = mod_cumsum(jnp.moveaxis(rev, -2, 0), field)
    cs = jnp.moveaxis(cs, 0, -2)
    incl = jnp.flip(cs, axis=-2)  # S_i inclusive: sum_{j>=i}
    excl = L.sub(incl, t, _spec(field))  # sum_{j>i}
    ipw = powers(point_inv, n + 1, field)
    return L.mont_mul(excl, ipw[1 : n + 1], _spec(field))


@partial(jax.jit, static_argnames=("field",))
def mont_linear_combo(coeffs_stack, weights, field: str = "fp"):
    """sum_c weights[c] * coeffs_stack[c]: (C, n, 16) x (C, 16) -> (n, 16)."""
    prod = L.mont_mul(coeffs_stack, weights[:, None], _spec(field))
    return tree_sum(prod, axis=0, field=field)
