"""Proof creation pipeline.

Mirrors the structure of halo2's `plonk::create_proof` (the hot loop behind
taiga_halo2/src/proof.rs:25-42) with device math:

  synthesize witness (host ints)                      -> advice columns
  commit advice (device iNTT + Pippenger MSM)         -> transcript
  beta, gamma -> permutation grand products (host, batch-inverted), commit
  y -> quotient: evaluate all constraints over the 8n coset domain
       (vectorized expression evaluator), divide by Z_H, split, commit
  x -> open every queried (column, rotation) at x*omega^rot
  multiopen: aggregate per point, quotient-divide, one IPA open.
"""

from __future__ import annotations

import secrets
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..crypto.curves import VestaPoint
from ..crypto.fields import Fp
from ..ops import limbs as L, ntt
from .circuit import BLINDING_ROWS, CircuitBuilder, EXT_FACTOR
from .expression import ADVICE, FIXED, INSTANCE, TableSet, eval_device
from .ipa import _commit, _eval_poly, ipa_open
from .keygen import ProvingKey, commit_column, omega_for
from .protocol import (
    COMMITTED_KINDS,
    L0,
    LBLIND,
    LLAST,
    NUM_H_PIECES,
    QUOTIENT,
    SIGMA,
    XID,
    Z,
    build_constraints,
    collect_queries,
    num_chunks,
)
from .srs import get_params
from .transcript import ProofWriter

P = Fp.MODULUS


def _rand() -> int:
    return secrets.randbits(300) % P


# ---------------------------------------------------------------------------
# cached per-k transparent tables
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _ext_domain_tables(k: int):
    """Returns numpy Montgomery ext-coset tables for xid/l0/llast/lblind and
    the inverse of Z_H on the coset, all shape (8n, 16)."""
    n = 1 << k
    ke = k + 3
    usable = n - BLINDING_ROWS - 1
    g = 5
    p = P
    omega_ext = pow(5, (p - 1) >> ke, p)
    # xid: the coset points themselves
    pts = [1] * (n * EXT_FACTOR)
    for i in range(1, n * EXT_FACTOR):
        pts[i] = pts[i - 1] * omega_ext % p
    xid = [g * v % p for v in pts]
    # Z_H^{-1} on coset: (g^n * omega_8^i - 1)^{-1}, period 8
    gn = pow(g, n, p)
    w8 = pow(omega_ext, n, p)
    zh8 = [(gn * pow(w8, i, p) - 1) % p for i in range(EXT_FACTOR)]
    zh8_inv = [pow(v, -1, p) for v in zh8]
    zh_inv = [zh8_inv[i % EXT_FACTOR] for i in range(n * EXT_FACTOR)]

    def indicator_ext(rows):
        base = [0] * n
        for r in rows:
            base[r] = 1
        return _coeffs_to_ext_np(k, _values_to_coeffs_np(k, base))

    l0 = indicator_ext([0])
    llast = indicator_ext([usable])
    lblind = indicator_ext(range(usable + 1, n))
    return (
        np.asarray(L.FP.array_to_mont(xid)),
        l0,
        llast,
        lblind,
        np.asarray(L.FP.array_to_mont(zh_inv)),
    )


def _values_to_coeffs_np(k: int, values: list[int]) -> np.ndarray:
    arr = jnp.asarray(L.FP.array_to_mont(values))
    return np.asarray(ntt.intt(arr, k, "fp"))


def _coeffs_to_ext_np(k: int, coeffs_mont: np.ndarray) -> np.ndarray:
    n = 1 << k
    padded = np.zeros((n * EXT_FACTOR, L.NLIMBS), np.uint32)
    padded[:n] = coeffs_mont
    return np.asarray(ntt.coset_ntt(jnp.asarray(padded), k + 3, "fp"))


def _coeffs_host(coeffs_mont) -> list[int]:
    return L.FP.array_from_mont(coeffs_mont)


def commit_values(k: int, values: list[int], blind: int):
    """values (Lagrange) -> (commitment, coeffs_mont ndarray)."""
    coeffs_mont = _values_to_coeffs_np(k, values)
    plain = L.from_mont(jnp.asarray(coeffs_mont), L.FP)
    from .ipa import _msm_device
    from .srs import srs_device

    g_dev = tuple(map(jnp.asarray, srs_device(k)))
    pt = _msm_device_limbs(g_dev, plain)
    if blind:
        pt = pt + get_params(k).w * blind
    return pt, coeffs_mont


def _msm_device_limbs(g_dev, scalar_limbs) -> VestaPoint:
    from ..ops import ec, msm as msm_mod

    out = msm_mod.msm(g_dev[0], g_dev[1], g_dev[2], scalar_limbs, field="fq")
    return ec.points_from_device((out[0][None], out[1][None], out[2][None]), VestaPoint)[0]


def commit_coeffs(k: int, coeffs: list[int], blind: int) -> VestaPoint:
    return _commit(get_params(k), coeffs, blind)


# ---------------------------------------------------------------------------
# permutation grand products (host, batch-inverted)
# ---------------------------------------------------------------------------


def _batch_inv(vals: list[int]) -> list[int]:
    prefix = [1] * (len(vals) + 1)
    for i, v in enumerate(vals):
        prefix[i + 1] = prefix[i] * v % P
    inv_all = pow(prefix[-1], -1, P)
    out = [0] * len(vals)
    for i in range(len(vals) - 1, -1, -1):
        out[i] = prefix[i] * inv_all % P
        inv_all = inv_all * vals[i] % P
    return out


def _compute_z_columns(pk: ProvingKey, tables, beta: int, gamma: int) -> list[list[int]]:
    """Grand-product columns, one per chunk of PERM_CHUNK permutation columns."""
    from .circuit import PERM_CHUNK
    from .keygen import DELTA

    vk = pk.vk
    n, u = vk.n, vk.usable_rows
    omega = vk.omega
    omega_pows = [1] * n
    for i in range(1, n):
        omega_pows[i] = omega_pows[i - 1] * omega % P

    perm_cols = vk.perm_cols
    chunks = [perm_cols[i : i + PERM_CHUNK] for i in range(0, len(perm_cols), PERM_CHUNK)]
    z_cols = []
    running = 1
    for c, chunk in enumerate(chunks):
        # ratio(i) = prod_j (v + beta*delta^jg*w^i + gamma) / (v + beta*sigma + gamma)
        nums = [1] * u
        dens = [1] * u
        for j_local, (kind, idx) in enumerate(chunk):
            jg = c * PERM_CHUNK + j_local
            col = tables[(kind, idx)]
            sigma = pk.sigma_cols[jg]
            bd = beta * pow(DELTA, jg, P) % P
            for i in range(u):
                v = col[i]
                nums[i] = nums[i] * ((v + bd * omega_pows[i] + gamma) % P) % P
                dens[i] = dens[i] * ((v + beta * sigma[i] + gamma) % P) % P
        dens_inv = _batch_inv(dens)
        z = [0] * n
        z[0] = running
        for i in range(u):
            z[i + 1] = z[i] * nums[i] % P * dens_inv[i] % P
        running = z[u]
        for i in range(u + 1, n):
            z[i] = _rand()
        z_cols.append(z)
    return z_cols


# ---------------------------------------------------------------------------
# main prover
# ---------------------------------------------------------------------------


def create_proof(pk: ProvingKey, circuit, instance: list[Fp]) -> bytes:
    vk = pk.vk
    k, n, u = vk.k, vk.n, vk.usable_rows
    omega = vk.omega
    inst = [v.v if isinstance(v, Fp) else int(v) % P for v in instance]

    # --- synthesize witness ------------------------------------------
    cs = vk.cs
    builder = CircuitBuilder(cs, k, "prove")
    circuit.synthesize(builder, pk.config)
    advice = builder.advice
    for col in advice:
        for i in range(u, n):
            col[i] = _rand()

    tr = ProofWriter(b"taiga-tpu-plonk")
    tr.absorb_bytes(vk.digest)
    tr.absorb_bytes(len(inst).to_bytes(4, "little"))
    for v in inst:
        tr.absorb_scalar(Fp(v))

    # --- advice commitments ------------------------------------------
    blinds = {}
    coeffs = {}  # (kind, index) -> host coeff list
    for i, col in enumerate(advice):
        b = _rand()
        c_pt, cf = commit_values(k, col, b)
        blinds[(ADVICE, i)] = b
        coeffs[(ADVICE, i)] = _coeffs_host(cf)
        tr.write_point(c_pt)

    beta = tr.challenge(b"beta").v
    gamma = tr.challenge(b"gamma").v

    # --- permutation products ----------------------------------------
    inst_col = inst + [0] * (n - len(inst))
    tables = {(ADVICE, i): advice[i] for i in range(len(advice))}
    tables.update({(FIXED, i): pk.fixed_cols[i] for i in range(len(pk.fixed_cols))})
    tables[(INSTANCE, 0)] = inst_col
    z_cols = _compute_z_columns(pk, tables, beta, gamma)
    for c, zc in enumerate(z_cols):
        b = _rand()
        c_pt, cf = commit_values(k, zc, b)
        blinds[(Z, c)] = b
        coeffs[(Z, c)] = _coeffs_host(cf)
        tr.write_point(c_pt)

    y = tr.challenge(b"y").v

    # --- quotient -----------------------------------------------------
    exprs = build_constraints(cs, vk.perm_cols, beta, gamma, u)
    xid_t, l0_t, llast_t, lblind_t, zh_inv_t = _ext_domain_tables(k)

    def ext_of_values(vals):
        return _coeffs_to_ext_np(k, _values_to_coeffs_np(k, vals))

    fixed_ext = [ext_of_values(col) for col in pk.fixed_cols]
    advice_ext = [ext_of_values(col) for col in advice]
    sigma_ext = [ext_of_values(col) for col in pk.sigma_cols]
    z_ext = [ext_of_values(col) for col in z_cols]
    inst_ext = [ext_of_values(inst_col)]

    ts = TableSet(None, None, None, rot_scale=EXT_FACTOR)
    ts.tables = {
        FIXED: jnp.asarray(np.stack(fixed_ext)) if fixed_ext else None,
        ADVICE: jnp.asarray(np.stack(advice_ext)) if advice_ext else None,
        INSTANCE: jnp.asarray(np.stack(inst_ext)),
        SIGMA: jnp.asarray(np.stack(sigma_ext)) if sigma_ext else None,
        Z: jnp.asarray(np.stack(z_ext)) if z_ext else None,
        XID: jnp.asarray(xid_t)[None],
        L0: jnp.asarray(l0_t)[None],
        LLAST: jnp.asarray(llast_t)[None],
        LBLIND: jnp.asarray(lblind_t)[None],
    }

    y_mont = jnp.asarray(L.int_to_limbs(y * L.FP.r % P))
    acc = None
    for e in exprs:
        val = eval_device(e, ts)
        if acc is None:
            acc = val
        else:
            acc = L.add(L.mont_mul(acc, y_mont, L.FP), val, L.FP)
    acc = L.mont_mul(acc, jnp.asarray(zh_inv_t), L.FP)
    h_coeffs_mont = np.asarray(ntt.coset_intt(acc, k + 3, "fp"))
    h_all = _coeffs_host(h_coeffs_mont)
    assert all(v == 0 for v in h_all[NUM_H_PIECES * n :]), "quotient degree overflow"
    for i in range(NUM_H_PIECES):
        piece = h_all[i * n : (i + 1) * n]
        b = _rand()
        c_pt = commit_coeffs(k, piece, b)
        blinds[(QUOTIENT, i)] = b
        coeffs[(QUOTIENT, i)] = piece
        tr.write_point(c_pt)

    x = tr.challenge(b"x").v

    # --- evaluations --------------------------------------------------
    for i, col in enumerate(pk.fixed_cols):
        coeffs[(FIXED, i)] = _coeffs_host(_values_to_coeffs_np(k, col))
        blinds[(FIXED, i)] = 0
    for i, col in enumerate(pk.sigma_cols):
        coeffs[(SIGMA, i)] = _coeffs_host(_values_to_coeffs_np(k, col))
        blinds[(SIGMA, i)] = 0

    queries = collect_queries(exprs, cs.num_fixed)
    evals = {}
    for kind, idx, rot in queries:
        pt = x * pow(omega, rot % n, P) % P
        v = _eval_poly(coeffs[(kind, idx)], pt)
        evals[(kind, idx, rot)] = v
        tr.write_scalar(Fp(v))

    # --- multiopen ----------------------------------------------------
    entries = []
    for kind, idx, rot in queries:
        pt = x * pow(omega, rot % n, P) % P
        entries.append(
            {
                "coeffs": coeffs[(kind, idx)],
                "blind": blinds[(kind, idx)],
                "point": pt,
                "value": evals[(kind, idx, rot)],
            }
        )
    multiopen_open(k, entries, tr)
    return tr.bytes()


def multiopen_open(k: int, entries: list[dict], tr: ProofWriter):
    """Shplonk-style aggregation then a single IPA open (see plonk/ipa.py)."""
    n = 1 << k
    params = get_params(k)
    v_ch = tr.challenge(b"mo-v").v
    groups: dict[int, list[dict]] = {}
    order = []
    for e in entries:
        if e["point"] not in groups:
            groups[e["point"]] = []
            order.append(e["point"])
        groups[e["point"]].append(e)

    agg = []
    for ptv in order:
        coeff = [0] * n
        blind = 0
        value = 0
        vp = 1
        for e in groups[ptv]:
            for i, c in enumerate(e["coeffs"]):
                coeff[i] = (coeff[i] + vp * c) % P
            blind = (blind + vp * e["blind"]) % P
            value = (value + vp * e["value"]) % P
            vp = vp * v_ch % P
        agg.append({"point": ptv, "coeffs": coeff, "blind": blind, "value": value})

    u_ch = tr.challenge(b"mo-u").v
    h = [0] * n
    up = 1
    for g in agg:
        # q = (A - a) / (X - p): synthetic division, exact when A(p) = a
        rem = 0
        q = [0] * n
        acc = 0
        for i in range(n - 1, -1, -1):
            c = g["coeffs"][i] if i < n else 0
            if i == 0:
                rem = (acc * g["point"] + c - g["value"]) % P
            else:
                q[i - 1] = (acc * g["point"] + c) % P
                acc = q[i - 1]
        assert rem == 0, "multiopen: claimed value mismatch"
        for i in range(n):
            h[i] = (h[i] + up * q[i]) % P
        up = up * u_ch % P

    h_blind = _rand()
    c_h = commit_coeffs(k, h, h_blind)
    tr.write_point(c_h)
    x3 = tr.challenge(b"mo-x3").v
    a_vals = []
    for g in agg:
        av = _eval_poly(g["coeffs"], x3)
        a_vals.append(av)
        tr.write_scalar(Fp(av))
    w_ch = tr.challenge(b"mo-w").v
    f = list(h)
    f_blind = h_blind
    wp = w_ch
    for g in agg:
        for i in range(n):
            f[i] = (f[i] + wp * g["coeffs"][i]) % P
        f_blind = (f_blind + wp * g["blind"]) % P
        wp = wp * w_ch % P
    ipa_open(params, f, f_blind, x3, tr)
