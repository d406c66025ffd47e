"""Full native-engine (C++) prover path — zero XLA compilation.

`create_proof_host` mirrors prover.create_proof stage by stage (same
transcript, same proof bytes semantics — proofs verify under the one
verifier), with every polynomial/EC operation on the threaded C++ engine
(native/src/pasta_host.cpp) over numpy buffers:

  iNTT/coset-NTT         taiga_ntt + coset power scaling
  column commitments     taiga_ec_msm (Pippenger) over the SRS rows
  grand products         taiga_vec_cumprod + taiga_vec_batch_inv
  constraint evaluation  recursive expression eval with taiga_vec_{mul,add,neg}
  multiopen + IPA        plonk/native_open.py

Why it exists: the XLA pipeline compiles a distinct program per (shape,
constraint-system) pair — tens of minutes of one-time compiles per domain
size on CPU hosts. This path has NO compile step at all, making the full
prove+verify test tier and CPU-only deployments practical; the XLA path
remains the high-throughput batched TPU backend.

Selection: core/proving.py routes through here when the native library is
built and JAX's default backend is CPU (or TAIGA_HOST_PROVER=1).
"""

from __future__ import annotations

import secrets

import numpy as np

from ..crypto.curves import VestaPoint
from ..crypto.fields import Fp
from ..native import FIELD_FP, FIELD_FQ, hostops as H
from .circuit import BLINDING_ROWS, EXT_FACTOR, PERM_CHUNK, CircuitBuilder
from .expression import (
    ADVICE,
    FIXED,
    INSTANCE,
    Cell,
    ChallengeVar,
    Constant,
    Negated,
    Product,
    Sum,
)
from .keygen import DELTA, ProvingKey, omega_for
from .msm_claim import srs_host_rows
from .protocol import (
    L0,
    LBLIND,
    LLAST,
    LOOKUP_A,
    LOOKUP_S,
    LOOKUP_Z,
    NUM_H_PIECES,
    QUOTIENT,
    SIGMA,
    XID,
    Z,
    build_constraints,
    collect_queries,
)
from .srs import get_params
from .transcript import ProofWriter

P = Fp.MODULUS
U64 = np.dtype("<u8")


def _rand() -> int:
    return secrets.randbits(300) % P


def _mont1(v: int) -> np.ndarray:
    return H.to_mont(FIELD_FP, H.ints_to_u64([v % P]))[0]


def _mont_col(vals: list[int]) -> np.ndarray:
    return H.to_mont(FIELD_FP, H.ints_to_u64([v % P for v in vals]))


# --- host NTT helpers --------------------------------------------------------


def _intt(rows: np.ndarray, k: int) -> np.ndarray:
    omega_inv = pow(omega_for(k), -1, P)
    return H.ntt(FIELD_FP, rows, k, omega_inv, inverse=True)


_COSET_POWS: dict = {}


def _coset_pows(k: int, inverse: bool) -> np.ndarray:
    key = (k, inverse)
    out = _COSET_POWS.get(key)
    if out is None:
        g = pow(5, -1, P) if inverse else 5
        n = 1 << k
        pows = [1] * n
        for i in range(1, n):
            pows[i] = pows[i - 1] * g % P
        out = _COSET_POWS[key] = _mont_col(pows)
    return out


def _coset_ntt(coeffs: np.ndarray, k: int) -> np.ndarray:
    scaled = H.vec_mul(FIELD_FP, coeffs, _coset_pows(k, False))
    return H.ntt(FIELD_FP, scaled, k, omega_for(k), inverse=False)


def _coset_intt(evals: np.ndarray, k: int) -> np.ndarray:
    coeffs = H.ntt(FIELD_FP, evals, k, pow(omega_for(k), -1, P), inverse=True)
    return H.vec_mul(FIELD_FP, coeffs, _coset_pows(k, True))


def _to_ext(coeffs: np.ndarray, k: int) -> np.ndarray:
    """(…, n, 4) coefficients -> (…, 8n, 4) coset evaluations."""
    n = 1 << k
    shape = coeffs.shape[:-2] + (n * EXT_FACTOR, 4)
    padded = np.zeros(shape, dtype=U64)
    padded[..., :n, :] = coeffs
    return _coset_ntt(padded, k + 3)


# --- commitments --------------------------------------------------------------


def _commit_rows(k: int, coeff_rows: np.ndarray, blinds) -> list[VestaPoint]:
    rows = srs_host_rows(k)
    w = get_params(k).w
    out = []
    plain = H.from_mont(FIELD_FP, coeff_rows)
    pts = H.msm_many(FIELD_FQ, rows, plain)
    for i in range(coeff_rows.shape[0]):
        raw = pts[i].tobytes()
        if pts[i][8]:
            pt = VestaPoint.identity()
        else:
            pt = VestaPoint.from_xy(
                int.from_bytes(raw[:32], "little"),
                int.from_bytes(raw[32:64], "little"),
            )
        b = blinds[i]
        out.append(pt + w * b if b else pt)
    return out


# --- expression evaluation -----------------------------------------------------


def _ev(expr, tables, ch, n, rot_scale):
    """Evaluate an Expression over the whole domain -> (n, 4) or (4,) mont."""
    if isinstance(expr, Constant):
        return _mont1(expr.value)
    if isinstance(expr, ChallengeVar):
        return ch[expr.name]
    if isinstance(expr, Cell):
        col = tables[expr.kind][expr.index]
        if expr.rotation:
            col = np.roll(col, -expr.rotation * rot_scale, axis=0)
        return col
    if isinstance(expr, Sum):
        a = _ev(expr.a, tables, ch, n, rot_scale)
        b = _ev(expr.b, tables, ch, n, rot_scale)
        if a.ndim == 1 and b.ndim == 1:
            return H.vec_add(FIELD_FP, a[None], b)[0]
        if a.ndim == 1:
            a, b = b, a
        return H.vec_add(FIELD_FP, a, b)
    if isinstance(expr, Product):
        a = _ev(expr.a, tables, ch, n, rot_scale)
        b = _ev(expr.b, tables, ch, n, rot_scale)
        if a.ndim == 1 and b.ndim == 1:
            return H.vec_mul(FIELD_FP, a[None], b)[0]
        if a.ndim == 1:
            a, b = b, a
        return H.vec_mul(FIELD_FP, a, b)
    if isinstance(expr, Negated):
        a = _ev(expr.a, tables, ch, n, rot_scale)
        return H.vec_neg(FIELD_FP, a[None])[0] if a.ndim == 1 else H.vec_neg(FIELD_FP, a)
    raise TypeError(type(expr))


# --- grand products -------------------------------------------------------------


def _grand_products(nums: np.ndarray, dens: np.ndarray, u: int, n: int):
    """cps[c][i] = prod_{j<=i} num_c[j]/den_c[j] via one batched inversion."""
    den_inv = H.batch_inv(FIELD_FP, dens.reshape(-1, 4)).reshape(dens.shape)
    ratios = H.vec_mul(FIELD_FP, nums, den_inv)
    return np.stack(
        [H.cumprod(FIELD_FP, ratios[c]) for c in range(ratios.shape[0])]
    )


# --- static per-pk host tables ---------------------------------------------------


_EXT_TABLES: dict = {}


def _ext_domain_tables_host(k: int):
    """Host-native ext-coset tables xid/l0/llast/lblind/Z_H^-1, (8n, 4) mont
    (the native counterpart of prover._ext_domain_tables — no XLA)."""
    out = _EXT_TABLES.get(k)
    if out is not None:
        return out
    n = 1 << k
    ke = k + 3
    usable = n - BLINDING_ROWS - 1
    g = 5
    omega_ext = pow(5, (P - 1) >> ke, P)
    pts = [1] * (n * EXT_FACTOR)
    for i in range(1, n * EXT_FACTOR):
        pts[i] = pts[i - 1] * omega_ext % P
    xid = _mont_col([g * v % P for v in pts])
    gn = pow(g, n, P)
    w8 = pow(omega_ext, n, P)
    zh8_inv = [pow((gn * pow(w8, i, P) - 1) % P, -1, P) for i in range(EXT_FACTOR)]
    zh_inv = _mont_col([zh8_inv[i % EXT_FACTOR] for i in range(n * EXT_FACTOR)])

    def indicator_ext(rows):
        base = [0] * n
        for r in rows:
            base[r] = 1
        coeffs = _intt(_mont_col(base), k)
        return _to_ext(coeffs, k)

    out = (xid, indicator_ext([0]), indicator_ext([usable]),
           indicator_ext(range(usable + 1, n)), zh_inv)
    _EXT_TABLES[k] = out
    return out


def _host_static(pk: ProvingKey):
    st = getattr(pk, "_host_static", None)
    if st is not None:
        return st
    vk = pk.vk
    k, n = vk.k, vk.n
    xid, l0, llast, lblind, zh_inv = _ext_domain_tables_host(k)
    fixed_v = (
        np.stack([_mont_col(c) for c in pk.fixed_cols])
        if pk.fixed_cols
        else np.zeros((0, n, 4), U64)
    )
    sigma_v = (
        np.stack([_mont_col(c) for c in pk.sigma_cols])
        if pk.sigma_cols
        else np.zeros((0, n, 4), U64)
    )
    fixed_c = _intt(fixed_v, k) if fixed_v.shape[0] else fixed_v
    sigma_c = _intt(sigma_v, k) if sigma_v.shape[0] else sigma_v
    omega_pows_ = [1] * n
    for i in range(1, n):
        omega_pows_[i] = omega_pows_[i - 1] * vk.omega % P
    st = {
        "xid": xid,
        "l0": l0,
        "llast": llast,
        "lblind": lblind,
        "zh_inv": zh_inv,
        "fixed_v": fixed_v,
        "sigma_v": sigma_v,
        "fixed_c": fixed_c,
        "sigma_c": sigma_c,
        "fixed_e": _to_ext(fixed_c, k) if fixed_c.shape[0] else np.zeros((0, n * EXT_FACTOR, 4), U64),
        "sigma_e": _to_ext(sigma_c, k) if sigma_c.shape[0] else np.zeros((0, n * EXT_FACTOR, 4), U64),
        "omega_pows": _mont_col(omega_pows_),
        "exprs": build_constraints(vk.cs, vk.perm_cols, vk.usable_rows),
    }
    st["queries"] = collect_queries(st["exprs"], vk.cs.num_fixed)
    from .tape import compile_tape

    st["tape"] = compile_tape(st["exprs"], EXT_FACTOR)
    pk._host_static = st
    return st


# ---------------------------------------------------------------------------
# main host prover
# ---------------------------------------------------------------------------


def create_proof_host(pk: ProvingKey, circuit, instance) -> bytes:
    from .prover import _StageTimer, _permute_lookup_pair

    vk = pk.vk
    k, n, u = vk.k, vk.n, vk.usable_rows
    omega = vk.omega
    st = _host_static(pk)
    inst = [v.v if isinstance(v, Fp) else int(v) % P for v in instance]
    st_t = _StageTimer()

    # --- synthesize witness ------------------------------------------
    cs = vk.cs
    builder = CircuitBuilder(cs, k, "prove")
    circuit.synthesize(builder, pk.config)
    advice = builder.advice
    for col in advice:
        for i in range(u, n):
            col[i] = _rand()
    st_t.mark("witness synthesis")

    tr = ProofWriter(b"taiga-tpu-plonk")
    tr.absorb_bytes(vk.digest)
    tr.absorb_bytes(len(inst).to_bytes(4, "little"))
    for v in inst:
        tr.absorb_scalar(Fp(v))

    # --- advice commitments ------------------------------------------
    inst_col = inst + [0] * (n - len(inst))
    advice_v = np.stack([_mont_col(c) for c in advice])
    inst_v = _mont_col(inst_col)[None]
    advice_c = _intt(advice_v, k)
    advice_blinds = [_rand() for _ in advice]
    for pt in _commit_rows(k, advice_c, advice_blinds):
        tr.write_point(pt)
    st_t.mark("advice commit")

    base_tables = {
        FIXED: st["fixed_v"],
        ADVICE: advice_v,
        INSTANCE: inst_v,
    }

    # --- lookup permuted columns ---------------------------------------
    lookups = cs.lookups
    theta = 0
    lk_a_v = lk_s_v = lk_ap_v = lk_sp_v = None
    lk_ap_c = lk_sp_c = None
    lk_ap_blinds = lk_sp_blinds = []
    if lookups:
        theta = tr.challenge(b"theta").v
        th = _mont1(theta)
        a_rows, s_rows = [], []
        for lk in lookups:
            a = s = None
            for inp, tab in lk.pairs:
                ai = _ev(inp, base_tables, {"theta": th}, n, 1)
                ti = _ev(tab, base_tables, {"theta": th}, n, 1)
                a = ai if a is None else H.vec_add(FIELD_FP, H.vec_mul(FIELD_FP, a, th), ai)
                s = ti if s is None else H.vec_add(FIELD_FP, H.vec_mul(FIELD_FP, s, th), ti)
            a_rows.append(a)
            s_rows.append(s)
        lk_a_v = np.stack(a_rows)
        lk_s_v = np.stack(s_rows)
        a_host = [H.u64_to_ints(H.from_mont(FIELD_FP, lk_a_v[i])) for i in range(len(lookups))]
        s_host = [H.u64_to_ints(H.from_mont(FIELD_FP, lk_s_v[i])) for i in range(len(lookups))]
        ap_cols, sp_cols = [], []
        for a_col, s_col in zip(a_host, s_host):
            ap, sp = _permute_lookup_pair(a_col, s_col, u)
            ap_cols.append(ap + [_rand() for _ in range(n - u)])
            sp_cols.append(sp + [_rand() for _ in range(n - u)])
        lk_ap_v = np.stack([_mont_col(c) for c in ap_cols])
        lk_sp_v = np.stack([_mont_col(c) for c in sp_cols])
        lk_ap_c = _intt(lk_ap_v, k)
        lk_sp_c = _intt(lk_sp_v, k)
        lk_ap_blinds = [_rand() for _ in lookups]
        lk_sp_blinds = [_rand() for _ in lookups]
        ap_pts = _commit_rows(k, lk_ap_c, lk_ap_blinds)
        sp_pts = _commit_rows(k, lk_sp_c, lk_sp_blinds)
        for a_pt, s_pt in zip(ap_pts, sp_pts):
            tr.write_point(a_pt)
            tr.write_point(s_pt)
        st_t.mark("lookup permuted commit")

    beta = tr.challenge(b"beta").v
    gamma = tr.challenge(b"gamma").v
    beta_m = _mont1(beta)
    gamma_m = _mont1(gamma)

    # --- permutation grand products ----------------------------------
    perm_tables = []
    for kind, idx in vk.perm_cols:
        if kind == ADVICE:
            perm_tables.append(advice_v[idx])
        elif kind == FIXED:
            perm_tables.append(st["fixed_v"][idx])
        else:
            perm_tables.append(inst_v[0])
    chunks = [vk.perm_cols[i : i + PERM_CHUNK] for i in range(0, len(vk.perm_cols), PERM_CHUNK)]
    nums, dens = [], []
    for c, chunk in enumerate(chunks):
        num = den = None
        for j_local, col in enumerate(chunk):
            jg = c * PERM_CHUNK + j_local
            v = perm_tables[vk.perm_cols.index(col)]
            bd = H.vec_mul(FIELD_FP, beta_m[None], _mont1(pow(DELTA, jg, P)))[0]
            t_num = H.vec_add(FIELD_FP, H.vec_add(FIELD_FP, v, H.vec_mul(FIELD_FP, st["omega_pows"], bd)), gamma_m)
            t_den = H.vec_add(FIELD_FP, H.vec_add(FIELD_FP, v, H.vec_mul(FIELD_FP, st["sigma_v"][jg], beta_m)), gamma_m)
            num = t_num if num is None else H.vec_mul(FIELD_FP, num, t_num)
            den = t_den if den is None else H.vec_mul(FIELD_FP, den, t_den)
        nums.append(num)
        dens.append(den)
    cps = _grand_products(np.stack(nums), np.stack(dens), u, n)
    # chain: running_c = prod_{c'<c} cp_{c'}[u-1]
    finals = cps[:, u - 1]  # (C, 4)
    running = np.concatenate([_mont1(1)[None], H.cumprod(FIELD_FP, finals)[:-1]], axis=0)
    z_rows = []
    for c in range(cps.shape[0]):
        zc = H.vec_mul(FIELD_FP, cps[c], running[c])
        rand_rows = _mont_col([_rand() for _ in range(n - u - 1)])
        z_rows.append(np.concatenate([running[c][None], zc[:u], rand_rows], axis=0))
    z_v = np.stack(z_rows)
    st_t.mark("perm grand products")
    z_c = _intt(z_v, k)
    z_blinds = [_rand() for _ in range(z_v.shape[0])]
    for pt in _commit_rows(k, z_c, z_blinds):
        tr.write_point(pt)
    lk_z_c = None
    lk_z_blinds = []
    if lookups:
        num = H.vec_mul(FIELD_FP, H.vec_add(FIELD_FP, lk_a_v, beta_m), H.vec_add(FIELD_FP, lk_s_v, gamma_m))
        den = H.vec_mul(FIELD_FP, H.vec_add(FIELD_FP, lk_ap_v, beta_m), H.vec_add(FIELD_FP, lk_sp_v, gamma_m))
        lk_cps = _grand_products(num, den, u, n)
        lz_rows = []
        for c in range(lk_cps.shape[0]):
            rand_rows = _mont_col([_rand() for _ in range(n - u - 1)])
            lz_rows.append(np.concatenate([_mont1(1)[None], lk_cps[c][:u], rand_rows], axis=0))
        lk_z_v = np.stack(lz_rows)
        lk_z_c = _intt(lk_z_v, k)
        lk_z_blinds = [_rand() for _ in lookups]
        for pt in _commit_rows(k, lk_z_c, lk_z_blinds):
            tr.write_point(pt)
    st_t.mark("z commit")

    y = tr.challenge(b"y").v

    # --- quotient ------------------------------------------------------
    inst_c = _intt(inst_v, k)
    advice_e = _to_ext(advice_c, k)
    inst_e = _to_ext(inst_c, k)
    z_e = _to_ext(z_c, k)
    ne = n * EXT_FACTOR
    empty_e = np.zeros((0, ne, 4), U64)
    ext_tables = {
        FIXED: st["fixed_e"],
        ADVICE: advice_e,
        INSTANCE: inst_e,
        SIGMA: st["sigma_e"],
        Z: z_e,
        LOOKUP_A: _to_ext(lk_ap_c, k) if lookups else empty_e,
        LOOKUP_S: _to_ext(lk_sp_c, k) if lookups else empty_e,
        LOOKUP_Z: _to_ext(lk_z_c, k) if lookups else empty_e,
        XID: st["xid"][None],
        L0: st["l0"][None],
        LLAST: st["llast"][None],
        LBLIND: st["lblind"][None],
    }
    st_t.mark("extend advice/inst/z")
    tape = st["tape"]
    scal = tape.scalar_values(
        {"beta": beta, "gamma": gamma, "theta": theta, "y": y}
    )
    scal_mont = H.to_mont(FIELD_FP, H.ints_to_u64(scal)) if scal else \
        np.zeros((0, 4), U64)
    from .tape import TABLE_KINDS

    acc = H.tape_eval(
        FIELD_FP, tape.code, scal_mont,
        [ext_tables[kd] for kd in TABLE_KINDS],
        ne, tape.num_regs, tape.out_reg,
    )
    acc = H.vec_mul(FIELD_FP, acc, st["zh_inv"])
    h_all = _coset_intt(acc, k + 3)
    tail = H.from_mont(FIELD_FP, h_all[NUM_H_PIECES * n :])
    assert not tail.any(), "quotient degree overflow"
    st_t.mark("quotient eval")
    h_pieces = h_all[: NUM_H_PIECES * n].reshape(NUM_H_PIECES, n, 4)
    h_blinds = [_rand() for _ in range(NUM_H_PIECES)]
    for pt in _commit_rows(k, h_pieces, h_blinds):
        tr.write_point(pt)
    st_t.mark("h commit")

    x = tr.challenge(b"x").v

    # --- stack committed coefficient tables ---------------------------
    empty_c = np.zeros((0, n, 4), U64)
    kind_stacks = {
        ADVICE: (advice_c, advice_blinds),
        FIXED: (st["fixed_c"], [0] * st["fixed_c"].shape[0]),
        SIGMA: (st["sigma_c"], [0] * st["sigma_c"].shape[0]),
        Z: (z_c, z_blinds),
        LOOKUP_A: (lk_ap_c if lookups else empty_c, lk_ap_blinds),
        LOOKUP_S: (lk_sp_c if lookups else empty_c, lk_sp_blinds),
        LOOKUP_Z: (lk_z_c if lookups else empty_c, lk_z_blinds),
        QUOTIENT: (h_pieces, h_blinds),
    }
    kind_order = (ADVICE, FIXED, SIGMA, Z, LOOKUP_A, LOOKUP_S, LOOKUP_Z, QUOTIENT)

    queries = st["queries"]
    rotset = sorted({rot % n for (_, _, rot) in queries})
    points = {rot: x * pow(omega, rot, P) % P for rot in rotset}
    all_coeffs = np.concatenate(
        [kind_stacks[kd][0] for kd in kind_order if kind_stacks[kd][0].shape[0]],
        axis=0,
    )
    offsets = {}
    off = 0
    for kd in kind_order:
        offsets[kd] = off
        off += kind_stacks[kd][0].shape[0]
    pts = H.to_mont(FIELD_FP, H.ints_to_u64([points[rot] for rot in rotset]))
    ev = H.from_mont(FIELD_FP, H.poly_eval_many(FIELD_FP, all_coeffs, pts))
    ev_ints = H.u64_to_ints(ev)
    ncols = all_coeffs.shape[0]
    evals_host = {}
    for qi, rot in enumerate(rotset):
        for kd in kind_order:
            base = offsets[kd]
            for ci in range(kind_stacks[kd][0].shape[0]):
                evals_host[(kd, ci, rot)] = ev_ints[qi * ncols + base + ci]
    evals = {}
    for kind, idx, rot in queries:
        v = evals_host[(kind, idx, rot % n)]
        evals[(kind, idx, rot)] = v
        tr.write_scalar(Fp(v))
    st_t.mark("query evals")

    # --- multiopen + IPA (native) --------------------------------------
    from .native_open import multiopen_open_native

    entries = []
    for kind, idx, rot in queries:
        entries.append(
            {
                "coeff_idx": offsets[kind] + idx,
                "blind": kind_stacks[kind][1][idx],
                "point": points[rot % n],
                "value": evals[(kind, idx, rot)],
            }
        )
    multiopen_open_native(k, all_coeffs, entries, tr)
    st_t.mark("multiopen + IPA")
    return tr.bytes()
