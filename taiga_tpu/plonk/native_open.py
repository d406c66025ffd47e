"""Native-engine (C++) multiopen aggregation + IPA open for the prover.

The device multiopen/IPA path compiles a distinct XLA program per (domain
size, round shape) — by far the largest compile in the pipeline (the round-1
probe measured ~18 min of multiopen/IPA compiles at k=15). At taiga's domain
sizes (2^12..2^13 after the lookup-gadget shrink) the threaded C++ engine
(native/src/pasta_host.cpp) runs the same math with ZERO compile cost and
competitive wall-clock: vector field ops, synthetic division, Pippenger MSMs,
and the per-round G folds are all native calls on numpy buffers.

Transcript semantics are IDENTICAL to the device path (plonk/ipa.py
ipa_open_device + prover.multiopen_open_device): proofs produced here verify
under the same verifier.
"""

from __future__ import annotations

import numpy as np

from ..crypto.fields import Fp
from ..native import FIELD_FP, FIELD_FQ, hostops as H
from .msm_claim import srs_host_rows
from .srs import Params, get_params
from .transcript import ProofWriter

P = Fp.MODULUS


def _rand() -> int:
    import secrets

    return secrets.randbits(300) % P


def _mont1(v: int) -> np.ndarray:
    return H.to_mont(FIELD_FP, H.ints_to_u64([v % P]))[0]


def _msm_point(k: int, scalars_plain: np.ndarray, blind: int = 0):
    from ..crypto.curves import VestaPoint

    rows = srs_host_rows(k)[: scalars_plain.shape[0]]
    x, y, inf = H.msm(FIELD_FQ, rows, scalars_plain)
    pt = VestaPoint.identity() if inf else VestaPoint.from_xy(x, y)
    if blind:
        pt = pt + get_params(k).w * blind
    return pt


def _rows_msm(rows9: np.ndarray, scalars_plain: np.ndarray):
    from ..crypto.curves import VestaPoint

    x, y, inf = H.msm(FIELD_FQ, rows9, scalars_plain)
    return VestaPoint.identity() if inf else VestaPoint.from_xy(x, y)


def multiopen_open_native(k: int, coeffs_host: np.ndarray, entries,
                          tr: ProofWriter):
    """Shplonk-style aggregation + IPA open on the native engine.

    coeffs_host: (C, n, 4) u64 Montgomery coefficient rows (index space must
    match entries' `coeff_idx`). entries: [{coeff_idx, blind, point, value}].
    """
    params = get_params(k)
    n = params.n
    v_ch = tr.challenge(b"mo-v").v

    groups: dict[int, list[dict]] = {}
    order: list[int] = []
    for e in entries:
        if e["point"] not in groups:
            groups[e["point"]] = []
            order.append(e["point"])
        groups[e["point"]].append(e)

    agg = []
    for ptv in order:
        coeff = None
        blind = 0
        value = 0
        vp = 1
        for e in groups[ptv]:
            row = coeffs_host[e["coeff_idx"]]
            term = H.vec_mul(FIELD_FP, row, _mont1(vp))
            coeff = term if coeff is None else H.vec_add(FIELD_FP, coeff, term)
            blind = (blind + vp * e["blind"]) % P
            value = (value + vp * e["value"]) % P
            vp = vp * v_ch % P
        agg.append({"point": ptv, "coeffs": coeff, "blind": blind, "value": value})

    u_ch = tr.challenge(b"mo-u").v
    # h = sum u^j (A_j - a_j) / (X - p_j)   (poly_divide == (A - A(p))/(X-p))
    h = None
    up = 1
    for g in agg:
        q = H.poly_divide(FIELD_FP, g["coeffs"], _mont1(g["point"]))
        term = H.vec_mul(FIELD_FP, q, _mont1(up))
        h = term if h is None else H.vec_add(FIELD_FP, h, term)
        up = up * u_ch % P

    h_blind = _rand()
    c_h = _msm_point(k, H.from_mont(FIELD_FP, h), h_blind)
    tr.write_point(c_h)
    x3 = tr.challenge(b"mo-x3").v
    x3_m = _mont1(x3)
    a_dev = H.poly_eval_many(
        FIELD_FP, np.stack([g["coeffs"] for g in agg]), x3_m[None]
    )[0]
    a_vals = H.u64_to_ints(H.from_mont(FIELD_FP, a_dev))
    for av in a_vals:
        tr.write_scalar(Fp(av))
    w_ch = tr.challenge(b"mo-w").v

    f = h
    f_blind = h_blind
    wp = w_ch
    for g in agg:
        f = H.vec_add(FIELD_FP, f, H.vec_mul(FIELD_FP, g["coeffs"], _mont1(wp)))
        f_blind = (f_blind + wp * g["blind"]) % P
        wp = wp * w_ch % P
    ipa_open_native(params, f, f_blind, x3, tr)


def ipa_open_native(params: Params, coeffs_mont: np.ndarray, blind: int,
                    x: int, tr: ProofWriter):
    """Native IPA open; transcript-identical to plonk/ipa.ipa_open_device."""
    n, k = params.n, params.k

    # 1. randomizer s(X) = t(X) * (X - x), s(x) = 0
    t = [_rand() for _ in range(n - 1)]
    s = [0] * n
    for i, ti in enumerate(t):
        s[i + 1] = (s[i + 1] + ti) % P
        s[i] = (s[i] - ti * x) % P
    s_blind = _rand()
    s_mont = H.to_mont(FIELD_FP, H.ints_to_u64(s))
    c_s = _msm_point(k, H.ints_to_u64(s), s_blind)
    tr.write_point(c_s)
    xi = tr.challenge(b"ipa-xi").v
    a = H.vec_add(FIELD_FP, coeffs_mont, H.vec_mul(FIELD_FP, s_mont, _mont1(xi)))
    blind = (blind + xi * s_blind) % P

    # 2. value mix
    z = tr.challenge(b"ipa-z").v
    u_prime = params.u * z

    # 3. rounds
    b = H.powers(FIELD_FP, _mont1(x), n)
    g_rows = srs_host_rows(k).copy()
    f = blind
    for _ in range(k):
        half = a.shape[0] // 2
        a_lo, a_hi = a[:half], a[half:]
        b_lo, b_hi = b[:half], b[half:]
        g_lo, g_hi = g_rows[:half], g_rows[half:]
        lb, rb = _rand(), _rand()
        ip_l = int(
            H.u64_to_ints(
                H.from_mont(
                    FIELD_FP,
                    H.vec_sum(FIELD_FP, H.vec_mul(FIELD_FP, a_hi, b_lo)),
                )
            )[0]
        )
        ip_r = int(
            H.u64_to_ints(
                H.from_mont(
                    FIELD_FP,
                    H.vec_sum(FIELD_FP, H.vec_mul(FIELD_FP, a_lo, b_hi)),
                )
            )[0]
        )
        l_pt = _rows_msm(g_lo, H.from_mont(FIELD_FP, a_hi))
        r_pt = _rows_msm(g_hi, H.from_mont(FIELD_FP, a_lo))
        l_pt = l_pt + params.w * lb + u_prime * ip_l
        r_pt = r_pt + params.w * rb + u_prime * ip_r
        tr.write_point(l_pt)
        tr.write_point(r_pt)
        u = tr.challenge(b"ipa-u").v
        u_inv = pow(u, -1, P)
        um = _mont1(u)
        uim = _mont1(u_inv)
        a = H.vec_add(FIELD_FP, a_lo, H.vec_mul(FIELD_FP, a_hi, um))
        b = H.vec_add(FIELD_FP, b_lo, H.vec_mul(FIELD_FP, b_hi, uim))
        g_rows = H.ec_fold(FIELD_FQ, g_lo, g_hi, u_inv)
        f = (f + u * lb + u_inv * rb) % P

    a0 = H.u64_to_ints(H.from_mont(FIELD_FP, a))[0]
    tr.write_scalar(Fp(a0))
    tr.write_scalar(Fp(f))
