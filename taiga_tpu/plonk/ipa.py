"""Inner-product-argument polynomial commitment: open / verify.

BCMS/halo2-style IPA over Vesta with hiding (cf. halo2's
`poly::commitment::create_proof`; the reference drives it through
`plonk::create_proof`, taiga_halo2/src/proof.rs:25-42).

Protocol (coefficient basis; C = <a, G> + [blind] W claimed to open to
v = a(x) with b = (1, x, ..., x^{n-1})):
  1. prover samples s(X) random with s(x) = 0, commits S; challenge xi mixes
     a <- a + xi*s (value at x unchanged) for zero-knowledge;
  2. challenge z mixes the value claim into the commitment: U' = [z] U,
     P = C + xi*S + [v] U';
  3. k rounds: L_j = <a_hi, G_lo> + [lb_j] W + [<a_hi, b_lo>] U'
               R_j = <a_lo, G_hi> + [rb_j] W + [<a_lo, b_hi>] U'
     challenge u_j;  a <- a_lo + u_j a_hi;  b <- b_lo + u_j^{-1} b_hi;
     G <- G_lo + [u_j^{-1}] G_hi  (device batched fold);
  4. prover reveals a_0 and the synthetic blind f; verifier checks
     P + sum(u_j L_j + u_j^{-1} R_j) == [a_0] G_0 + [a_0 b_0] U' + [f] W
     with G_0 = <s, G> (one device MSM) and b_0 = prod(1 + u_j^{-1} x^{n/2^j}).

MSMs and generator folds run on device; scalar folds are host ints.
"""

from __future__ import annotations

import secrets

import jax
import jax.numpy as jnp

from ..crypto.curves import VestaPoint
from ..crypto.fields import Fp
from ..ops import ec, limbs as L, msm as msm_mod
from .srs import Params, srs_device
from .transcript import ProofReader, ProofWriter

P = Fp.MODULUS


def _rand() -> int:
    return secrets.randbits(300) % P


def _eval_poly(coeffs: list[int], x: int) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % P
    return acc


def _msm_device(g_dev, scalars: list[int]) -> VestaPoint:
    sl = jnp.asarray(msm_mod.scalars_to_limbs([s % P for s in scalars]))
    out = msm_mod.msm(g_dev[0], g_dev[1], g_dev[2], sl, field="fq")
    return ec.points_from_device((out[0][None], out[1][None], out[2][None]), VestaPoint)[0]


def ipa_open_device(params: Params, coeffs_mont, blind: int, x: int,
                    transcript: ProofWriter):
    """Device-resident IPA open: coeffs as (n, 16) Montgomery limbs; the
    a/b/G folds, inner products, and L/R MSMs all run on device — the
    transcript and the challenge scalars stay host-side."""
    import numpy as np

    from ..ops import poly

    n, k = params.n, params.k
    spec = L.FP

    def mont(v: int):
        return jnp.asarray(L.int_to_limbs(v * spec.r % P))

    # 1. randomizer s(X) = t(X) * (X - x), s(x) = 0
    t = [_rand() for _ in range(n - 1)]
    s = [0] * n
    for i, ti in enumerate(t):
        s[i + 1] = (s[i + 1] + ti) % P
        s[i] = (s[i] - ti * x) % P
    s_blind = _rand()
    s_mont = jnp.asarray(L.FP.array_to_mont(s))
    c_s = _commit_mont(params, s_mont, s_blind)
    transcript.write_point(c_s)
    xi = transcript.challenge(b"ipa-xi").v
    from .prover import _axpy_jit

    a = _axpy_jit(coeffs_mont, s_mont, mont(xi))
    blind = (blind + xi * s_blind) % P

    # 2. value mix
    z = transcript.challenge(b"ipa-z").v
    u_prime = params.u * z

    # 3. rounds, on limb-major PROJECTIVE generators (the SRS is affine, so
    # the initial coordinates coincide). To bound the number of compiled MSM
    # shapes, rounds below n//16 run padded (identity points + zero scalars
    # contribute nothing): ~3-4 shapes compile per domain size.
    b = poly.powers(mont(x), n, "fp")
    g_dev = tuple(jnp.asarray(t_).T for t_ in srs_device(params.k))  # (16, n)
    buckets = sorted({max(n // 2, 1), max(n // 4, 1), max(n // 16, 16)}, reverse=True)

    def bucket_of(sz):
        for bk in buckets:
            if sz >= bk:
                return bk
        return buckets[-1]

    f = blind
    for _ in range(k):
        half = a.shape[0] // 2
        a_lo, a_hi = a[:half], a[half:]
        b_lo, b_hi = b[:half], b[half:]
        g_lo = tuple(t_[:, :half] for t_ in g_dev)
        g_hi = tuple(t_[:, half:] for t_ in g_dev)
        lb, rb = _rand(), _rand()
        ips = np.asarray(jax.device_get(_ipa_dots(a_lo, a_hi, b_lo, b_hi)))
        ip_l = L.limbs_to_int(ips[0])
        ip_r = L.limbs_to_int(ips[1])
        # ONE batched 2-column MSM over the shared (full-width) generator set:
        #   L = <a_hi, G_lo>  -> col 0 scalars [a_hi | 0]
        #   R = <a_lo, G_hi>  -> col 1 scalars [0 | a_lo]
        pad = max(0, 2 * bucket_of(half) - 2 * half)
        l_pt, r_pt = _lr_msm(g_dev, a_lo, a_hi, pad)
        l_pt = l_pt + params.w * lb + u_prime * ip_l
        r_pt = r_pt + params.w * rb + u_prime * ip_r
        transcript.write_point(l_pt)
        transcript.write_point(r_pt)
        u = transcript.challenge(b"ipa-u").v
        u_inv = pow(u, -1, P)
        a, b = _ipa_fold_ab(a_lo, a_hi, b_lo, b_hi, mont(u), mont(u_inv))
        from ..ops import ff_kernels as FK

        g_dev = FK.ec_fold_shared_lm(
            *g_lo, *g_hi, jnp.asarray(L.int_to_limbs(u_inv))[None, :], field="fq"
        )
        f = (f + u * lb + u_inv * rb) % P

    a0 = L.FP.from_mont_host(np.asarray(jax.device_get(a[0])))
    transcript.write_scalar(Fp(a0))
    transcript.write_scalar(Fp(f))


def _pad_rows(arr, pad: int):
    return jnp.pad(arr, [(0, pad), (0, 0)]) if pad else arr


def _pad_pts(pts, pad: int):
    # Z = 0 encodes the identity, so zero-padding adds identity points
    return tuple(jnp.pad(t, [(0, pad), (0, 0)]) for t in pts) if pad else pts


def _pad_pts_lm(pts, pad: int):
    """Pad limb-major projective points with identities (0:1:0). The
    coordinate field of Vesta points is Fq."""
    if not pad:
        return pts
    x, y, z = pts
    x = jnp.pad(x, [(0, 0), (0, pad)])
    one = jnp.broadcast_to(jnp.asarray(L.FQ.one_mont)[:, None], (16, pad))
    y = jnp.concatenate([y, one.astype(jnp.uint32)], axis=1)
    z = jnp.pad(z, [(0, 0), (0, pad)])
    return x, y, z


def _lr_msm(g_dev, a_lo, a_hi, pad: int):
    """The IPA round's L/R commitments as one 2-column shared-point MSM:
    col0 = [a_hi | 0] (pairs with G_lo), col1 = [0 | a_lo] (pairs with G_hi).
    a_* are (half, 16) Montgomery; g_dev is limb-major projective (16, W)."""
    cols = _lr_cols(a_lo, a_hi)
    if pad:
        cols = jnp.pad(cols, [(0, 0), (0, pad), (0, 0)])
    out = msm_mod.msm_multi(*_pad_pts_lm(g_dev, pad), cols, field="fq",
                            in_form="projective")
    pts = ec.points_from_device((out[:, 0], out[:, 1], out[:, 2]), VestaPoint)
    return pts[0], pts[1]


@jax.jit
def _lr_cols(a_lo, a_hi):
    z = jnp.zeros_like(a_lo)
    col0 = jnp.concatenate([a_hi, z], axis=0)
    col1 = jnp.concatenate([z, a_lo], axis=0)
    return L.from_mont(jnp.stack([col0, col1]), L.FP)


def _msm_proj(g_lm, scalars_mont) -> VestaPoint:
    """MSM over limb-major projective points with Montgomery scalars."""
    plain = _from_mont(scalars_mont)
    out = msm_mod.msm(g_lm[0], g_lm[1], g_lm[2], plain, field="fq",
                      in_form="projective")
    return ec.points_from_device((out[0][None], out[1][None], out[2][None]), VestaPoint)[0]


@jax.jit
def _ipa_dots(a_lo, a_hi, b_lo, b_hi):
    from ..ops import poly

    ip_l = poly.mont_dot(a_hi, b_lo, "fp")
    ip_r = poly.mont_dot(a_lo, b_hi, "fp")
    return jnp.stack([L.from_mont(ip_l, L.FP), L.from_mont(ip_r, L.FP)])


@jax.jit
def _ipa_fold_ab(a_lo, a_hi, b_lo, b_hi, u_m, uinv_m):
    a = L.add(a_lo, L.mont_mul(a_hi, u_m, L.FP), L.FP)
    b = L.add(b_lo, L.mont_mul(b_hi, uinv_m, L.FP), L.FP)
    return a, b


@jax.jit
def _ipa_fold_g(g_lo, g_hi, uinv_limbs):
    mult = ec.ec_scalar_mul_shared(g_hi, uinv_limbs, L.FQ)
    return ec.ec_add(g_lo, mult, L.FQ)


@jax.jit
def _from_mont(v):
    return L.from_mont(v, L.FP)


def _msm_mont(g_parts, scalars_mont) -> VestaPoint:
    plain = _from_mont(scalars_mont)
    out = msm_mod.msm(g_parts[0], g_parts[1], g_parts[2], plain, field="fq")
    return ec.points_from_device((out[0][None], out[1][None], out[2][None]), VestaPoint)[0]


def _commit_mont(params: Params, coeffs_mont, blind: int) -> VestaPoint:
    g_dev = tuple(map(jnp.asarray, srs_device(params.k)))
    return _msm_mont(g_dev, coeffs_mont) + params.w * blind


def ipa_open(params: Params, coeffs: list[int], blind: int, x: int, transcript: ProofWriter):
    """Open the polynomial (coefficient list) at x. Writes the IPA proof."""
    n = params.n
    k = params.k
    assert len(coeffs) == n
    v = _eval_poly(coeffs, x)

    # 1. randomizer s(X) = t(X) * (X - x)
    t = [_rand() for _ in range(n - 1)]
    s = [0] * n
    for i, ti in enumerate(t):  # t_i X^i * (X - x)
        s[i + 1] = (s[i + 1] + ti) % P
        s[i] = (s[i] - ti * x) % P
    assert _eval_poly(s, x) == 0
    s_blind = _rand()
    c_s = _commit(params, s, s_blind)
    transcript.write_point(c_s)
    xi = transcript.challenge(b"ipa-xi").v
    a = [(c + xi * sv) % P for c, sv in zip(coeffs, s)]
    blind = (blind + xi * s_blind) % P

    # 2. value mix
    z = transcript.challenge(b"ipa-z").v
    u_prime = params.u * z

    # 3. rounds
    b = [1] * n
    for i in range(1, n):
        b[i] = b[i - 1] * x % P
    g_dev = tuple(map(jnp.asarray, srs_device(params.k)))
    f = blind
    for _ in range(k):
        half = len(a) // 2
        a_lo, a_hi = a[:half], a[half:]
        b_lo, b_hi = b[:half], b[half:]
        g_lo = tuple(t_[:half] for t_ in g_dev)
        g_hi = tuple(t_[half:] for t_ in g_dev)
        lb, rb = _rand(), _rand()
        ip_l = sum(ai * bi for ai, bi in zip(a_hi, b_lo)) % P
        ip_r = sum(ai * bi for ai, bi in zip(a_lo, b_hi)) % P
        l_pt = _msm_device(g_lo, a_hi) + params.w * lb + u_prime * ip_l
        r_pt = _msm_device(g_hi, a_lo) + params.w * rb + u_prime * ip_r
        transcript.write_point(l_pt)
        transcript.write_point(r_pt)
        u = transcript.challenge(b"ipa-u").v
        u_inv = pow(u, -1, P)
        a = [(lo + u * hi) % P for lo, hi in zip(a_lo, a_hi)]
        b = [(lo + u_inv * hi) % P for lo, hi in zip(b_lo, b_hi)]
        # G fold on device: G_lo + [u_inv] G_hi
        ui_limbs = jnp.asarray(L.int_to_limbs(u_inv))
        mult = ec.ec_scalar_mul_shared(g_hi, ui_limbs, L.FQ)
        g_dev = ec.ec_add(g_lo, mult, L.FQ)
        f = (f + u * lb + u_inv * rb) % P

    assert len(a) == 1
    transcript.write_scalar(Fp(a[0]))
    transcript.write_scalar(Fp(f))


def _commit(params: Params, coeffs: list[int], blind: int) -> VestaPoint:
    g_dev = tuple(map(jnp.asarray, srs_device(params.k)))
    return _msm_device(g_dev, coeffs) + params.w * blind


def ipa_verify(
    params: Params,
    terms: list[tuple[VestaPoint, int]],
    x: int,
    v: int,
    transcript: ProofReader,
    claim=None,
) -> bool:
    """Verify an IPA opening to value v at point x of the commitment given as
    a weighted point list `terms` (the multiopen aggregate, kept unevaluated
    so everything lands in ONE MSM). With `claim` (an MSMClaim), the check is
    deferred into the claim (batch verification); otherwise it is evaluated
    immediately — natively when the host engine is available, else via the
    device MSM."""
    n, k = params.n, params.k
    c_s = transcript.read_point()
    xi = transcript.challenge(b"ipa-xi").v
    z = transcript.challenge(b"ipa-z").v
    lr = []
    us = []
    for _ in range(k):
        l_pt = transcript.read_point()
        r_pt = transcript.read_point()
        u = transcript.challenge(b"ipa-u").v
        us.append(u)
        lr.append((l_pt, r_pt))
    a0 = transcript.read_scalar().v
    f = transcript.read_scalar().v

    # b_0 = prod_j (1 + u_j^{-1} x^{n / 2^j})
    b0 = 1
    for j, u in enumerate(us):
        e = pow(x, n >> (j + 1), P)
        b0 = b0 * (1 + pow(u, -1, P) * e) % P

    # Claim: P_acc - RHS == identity, with
    #   P_acc = sum(terms) + xi*C_s + z*v*U + sum_j (u_j L_j + u_j^{-1} R_j)
    #   RHS   = a0*<s, G> + z*(a0 b0)*U + f*W
    from ..native import hostops as H
    from .msm_claim import MSMClaim, s_vec_mont

    if H.available():
        own = claim is None
        if own:
            claim = MSMClaim(k)
            claim.begin_proof(first=True)
        for pt, sc in terms:
            claim.add_term(pt, sc)
        claim.add_term(c_s, xi)
        claim.add_term(params.u, z * (v - a0 * b0) % P)
        claim.add_term(params.w, (-f) % P)
        for (l_pt, r_pt), u in zip(lr, us):
            claim.add_term(l_pt, u)
            claim.add_term(r_pt, pow(u, -1, P))
        claim.add_g_vector_mont(s_vec_mont(us, k), (-a0) % P)
        return claim.check() if own else True

    # no native engine: evaluate everything via python/device point math
    u_prime = params.u * z
    p_acc = VestaPoint.identity()
    for pt, sc in terms:
        p_acc = p_acc + pt * sc
    p_acc = p_acc + c_s * xi + u_prime * v
    for (l_pt, r_pt), u in zip(lr, us):
        p_acc = p_acc + l_pt * u + r_pt * pow(u, -1, P)
    s_vec = [1] * n
    for j, u in enumerate(us):
        u_inv = pow(u, -1, P)
        for i in range(n):
            if (i >> (k - 1 - j)) & 1:
                s_vec[i] = s_vec[i] * u_inv % P
    g_dev = tuple(map(jnp.asarray, srs_device(params.k)))
    g0 = _msm_device(g_dev, s_vec)
    rhs = g0 * a0 + u_prime * (a0 * b0 % P) + params.w * f
    return p_acc == rhs
