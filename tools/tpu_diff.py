"""Differential check of the device (Pallas/XLA) kernels against the native
C++ engine at PRODUCTION shapes, on whatever backend JAX selects (run under
axon for the real TPU). Round-2 postmortem: the device prover produced an
invalid proof at k=15 while k=9/k=12 verified — this probe exists to localize
that class of shape-dependent corruption to a single kernel in minutes
instead of a 28-minute bench failure.

Usage:  python tools/tpu_diff.py [stage ...]
Stages: ntt msm cumprod evals ecadd all (default: all)
Prints one PASS/FAIL line per (stage, shape); exits nonzero on any FAIL.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from taiga_tpu.crypto.fields import Fp
from taiga_tpu.native import FIELD_FP, hostops as H
from taiga_tpu.ops import limbs as L, ntt as ntt_mod, poly as poly_mod

P = Fp.MODULUS
FAILURES = []
RNG = np.random.default_rng(20260819)


def rand_field_u64(shape) -> np.ndarray:
    """Uniform-ish field elements as (…, 4) u64 plain form (top limb capped
    below the modulus high limb so values are always < p)."""
    out = RNG.integers(0, 1 << 62, size=shape + (4,), dtype=np.uint64)
    out[..., 3] &= (1 << 60) - 1  # < 2^252 < p
    return out


def u64_to_dev(a: np.ndarray, field=FIELD_FP) -> jnp.ndarray:
    """(…, 4) u64 plain -> device (…, 16) Montgomery limbs."""
    m = H.to_mont(field, a.reshape(-1, 4)).reshape(a.shape)
    return jnp.asarray(H.u64_to_u16(m))


def dev_to_u64(a) -> np.ndarray:
    """Device (…, 16) Montgomery -> host (…, 4) u64 Montgomery."""
    return H.u16_to_u64(np.asarray(jax.device_get(a)))


def report(name: str, ok: bool, secs: float, detail: str = ""):
    status = "PASS" if ok else "FAIL"
    print(f"{status}  {name:42s} {secs:7.1f}s  {detail}", flush=True)
    if not ok:
        FAILURES.append(name)


def check_ntt():
    from taiga_tpu.plonk.keygen import omega_for

    for k, rows in ((12, 4), (13, 12), (15, 12), (16, 8), (18, 2)):
        n = 1 << k
        a = rand_field_u64((rows, n))
        am = H.to_mont(FIELD_FP, a.reshape(-1, 4)).reshape(rows, n, 4)
        t0 = time.time()
        dev = ntt_mod.intt(jnp.asarray(H.u64_to_u16(am)), k, "fp")
        got = dev_to_u64(dev)
        want = H.ntt(FIELD_FP, am, k, pow(omega_for(k), -1, P), inverse=True)
        report(f"intt k={k} rows={rows}", np.array_equal(got, want),
               time.time() - t0)
        t0 = time.time()
        dev = ntt_mod.coset_ntt(jnp.asarray(H.u64_to_u16(am)), k, "fp")
        got = dev_to_u64(dev)
        # host coset: scale by coset powers then NTT
        g = 5
        pows = [1] * n
        for i in range(1, n):
            pows[i] = pows[i - 1] * g % P
        pows_m = H.to_mont(FIELD_FP, H.ints_to_u64(pows))
        scaled = H.vec_mul(FIELD_FP, am.reshape(rows, n, 4), pows_m)
        want = H.ntt(FIELD_FP, scaled, k, omega_for(k), inverse=False)
        report(f"coset_ntt k={k} rows={rows}", np.array_equal(got, want),
               time.time() - t0)


def check_msm():
    from taiga_tpu.ops import msm as msm_mod
    from taiga_tpu.plonk.srs import get_params, srs_device
    from taiga_tpu.plonk.msm_claim import srs_host_rows
    from taiga_tpu.crypto.curves import VestaPoint
    from taiga_tpu.ops import ec

    for k, ncols in ((12, 1), (12, 12), (13, 12), (14, 4), (15, 12), (15, 1)):
        n = 1 << k
        rows = srs_host_rows(k)
        g_dev = tuple(map(jnp.asarray, srs_device(k)))
        scal = rand_field_u64((ncols, n))
        t0 = time.time()
        sc_dev = jnp.asarray(H.u64_to_u16(scal))
        if ncols == 1:
            out = msm_mod.msm(g_dev[0], g_dev[1], g_dev[2], sc_dev[0], field="fq")
            outs = np.asarray(jax.device_get(out))[None]
        else:
            outs = np.asarray(jax.device_get(
                msm_mod.msm_multi(g_dev[0], g_dev[1], g_dev[2], sc_dev, field="fq")
            ))
        pts = ec.points_from_device(
            (jnp.asarray(outs[:, 0]), jnp.asarray(outs[:, 1]), jnp.asarray(outs[:, 2])),
            VestaPoint,
        )
        ok = True
        bad = ""
        for c in range(ncols):
            from taiga_tpu.native import FIELD_FQ
            x, y, inf = H.msm(FIELD_FQ, rows, scal[c])
            want = VestaPoint.identity() if inf else VestaPoint.from_xy(x, y)
            if pts[c] != want:
                ok = False
                bad = f"col {c} mismatch"
                break
        report(f"msm k={k} ncols={ncols}", ok, time.time() - t0, bad)


def check_fixed_msm():
    """Fixed-base shifted-table MSM (the SRS commit path, ops/msm.py
    msm_fixed_multi) vs the native host Pippenger at production shapes."""
    from taiga_tpu.crypto.curves import VestaPoint
    from taiga_tpu.native import FIELD_FQ
    from taiga_tpu.ops import ec, msm as msm_mod
    from taiga_tpu.plonk.msm_claim import srs_host_rows
    from taiga_tpu.plonk.srs import srs_device

    for k, ncols in ((12, 5), (13, 12), (13, 30), (15, 12)):
        n = 1 << k
        rows = srs_host_rows(k)
        g_dev = tuple(map(jnp.asarray, srs_device(k)))
        scal = rand_field_u64((ncols, n))
        t0 = time.time()
        table = msm_mod.fixed_base_table(*g_dev, key=("srs", k), field="fq")
        sc_dev = jnp.asarray(H.u64_to_u16(scal))
        outs = np.asarray(jax.device_get(
            msm_mod.msm_fixed_multi(table, sc_dev, field="fq")
        ))
        pts = ec.points_from_device(
            (jnp.asarray(outs[:, 0]), jnp.asarray(outs[:, 1]), jnp.asarray(outs[:, 2])),
            VestaPoint,
        )
        ok = True
        bad = ""
        for c in range(ncols):
            x, y, inf = H.msm(FIELD_FQ, rows, scal[c])
            want = VestaPoint.identity() if inf else VestaPoint.from_xy(x, y)
            if pts[c] != want:
                ok = False
                bad = f"col {c} mismatch"
                break
        report(f"fixed_msm k={k} ncols={ncols}", ok, time.time() - t0, bad)


def check_sharded_commit():
    """commit_coeff_rows(mesh=...) — the model-parallel point-sharded
    Pippenger (parallel/sharded.sharded_msm_multi) — vs the default path.
    Runs on however many devices the backend exposes (one real chip here;
    the code path — shard_map, all_gather, partial-sum fold — is identical
    at any mesh size)."""
    from taiga_tpu.circuits.compliance import ComplianceCircuit
    from taiga_tpu.core.proving import get_proving_key, params_override
    from taiga_tpu.parallel import sharded
    from taiga_tpu.plonk.prover import get_pipeline

    k = 13
    n = 1 << k
    with params_override(compliance=k):
        pk = get_proving_key(ComplianceCircuit, k)
    pipe = get_pipeline(pk)
    mesh = sharded.make_mesh(len(jax.devices()))
    vals = rand_field_u64((2, n))
    coeffs = u64_to_dev(vals)
    t0 = time.time()
    pts_mesh = pipe.commit_coeff_rows(coeffs, [0, 0], mesh=mesh)
    pts_ref = pipe.commit_coeff_rows(coeffs, [0, 0])
    report(
        f"sharded_commit k={k} mesh={len(mesh.devices.flat)}dev",
        pts_mesh == pts_ref, time.time() - t0,
        "" if pts_mesh == pts_ref else "mesh vs default mismatch",
    )


def check_cumprod():
    for n in (1 << 13, 1 << 15):
        a = rand_field_u64((n,))
        am = H.to_mont(FIELD_FP, a)
        t0 = time.time()
        got = dev_to_u64(poly_mod.mont_cumprod(u64_to_dev(a), "fp"))
        want = H.cumprod(FIELD_FP, am)
        report(f"cumprod n={n}", np.array_equal(got, want), time.time() - t0)
        # batched Fermat inversion
        t0 = time.time()
        got = dev_to_u64(L.mont_inv(u64_to_dev(a[:256]), L.FP))
        want = H.batch_inv(FIELD_FP, am[:256])
        report("mont_inv n=256", np.array_equal(got, want), time.time() - t0)


def check_evals():
    for n, C, Q in ((1 << 13, 40, 8), (1 << 15, 40, 8)):
        coeffs = rand_field_u64((C, n))
        pts = rand_field_u64((Q,))
        t0 = time.time()
        got = dev_to_u64(poly_mod.eval_polys_at_points(
            u64_to_dev(coeffs), u64_to_dev(pts)
        ))
        cm = H.to_mont(FIELD_FP, coeffs.reshape(-1, 4)).reshape(C, n, 4)
        pm = H.to_mont(FIELD_FP, pts)
        want = H.poly_eval_many(FIELD_FP, cm, pm)
        report(f"poly_eval C={C} n={n}", np.array_equal(got, want),
               time.time() - t0)


def _vesta_lm(pts):
    """Python Vesta points -> limb-major (16, n) PROJECTIVE device coords
    (Fq Montgomery); identity = (0:1:0)."""
    from taiga_tpu.native import FIELD_FQ

    xs = np.stack([np.frombuffer(
        (0 if p.is_identity() else p.x.v).to_bytes(32, "little"), np.uint64)
        for p in pts])
    ys = np.stack([np.frombuffer(
        (1 if p.is_identity() else p.y.v).to_bytes(32, "little"), np.uint64)
        for p in pts])
    zs = np.stack([np.frombuffer(
        (0 if p.is_identity() else 1).to_bytes(32, "little"), np.uint64)
        for p in pts])
    return (u64_to_dev(xs, FIELD_FQ).T, u64_to_dev(ys, FIELD_FQ).T,
            u64_to_dev(zs, FIELD_FQ).T)


def _lm_to_vesta(X, Y, Z, lanes):
    """Decode selected lanes of a limb-major projective device result."""
    from taiga_tpu.native import FIELD_FQ
    from taiga_tpu.crypto.curves import VestaPoint
    from taiga_tpu.crypto.fields import Fq

    Xp = H.from_mont(FIELD_FQ, dev_to_u64(jnp.asarray(X).T))
    Yp = H.from_mont(FIELD_FQ, dev_to_u64(jnp.asarray(Y).T))
    Zp = H.from_mont(FIELD_FQ, dev_to_u64(jnp.asarray(Z).T))
    out = {}
    for i in lanes:
        Zi = int.from_bytes(Zp[i].tobytes(), "little")
        if Zi == 0:
            out[i] = VestaPoint.identity()
        else:
            zi = pow(Zi, -1, Fq.MODULUS)
            x = int.from_bytes(Xp[i].tobytes(), "little") * zi % Fq.MODULUS
            y = int.from_bytes(Yp[i].tobytes(), "little") * zi % Fq.MODULUS
            out[i] = VestaPoint.from_xy(x, y)
    return out


def check_ecadd():
    from taiga_tpu.ops import ff_kernels as FK
    from taiga_tpu.plonk.srs import get_params

    for n in (4096, 32768):
        g = get_params(12).g
        idx = RNG.integers(0, len(g), size=2 * n)
        pa = [g[i] for i in idx[:n]]
        pb = [g[i] for i in idx[n:]]
        ax, ay, az = _vesta_lm(pa)
        bx, by, bz = _vesta_lm(pb)
        t0 = time.time()
        X, Y, Z = FK.ec_add_proj_lm(ax, ay, az, bx, by, bz, field="fq")
        lanes = list(range(0, n, max(1, n // 64)))
        got = _lm_to_vesta(X, Y, Z, lanes)
        ok = True
        bad = ""
        for i in lanes:
            if got[i] != pa[i] + pb[i]:
                ok = False
                bad = f"lane {i}"
                break
        report(f"ec_add_proj n={n}", ok, time.time() - t0, bad)


def check_fold():
    """IPA generator fold kernel (ec_fold_shared_lm) vs native taiga_ec_fold
    at the production round widths (k=15 round 1 = 16384 lanes)."""
    from taiga_tpu.ops import ff_kernels as FK
    from taiga_tpu.native import FIELD_FQ
    from taiga_tpu.crypto.curves import VestaPoint
    from taiga_tpu.plonk.msm_claim import srs_host_rows

    FQMOD = 1 << 255  # placeholder unused
    for k, half in ((15, 16384), (13, 4096), (13, 32)):
        rows = srs_host_rows(max(k, 1))
        lo9 = rows[:half]
        hi9 = rows[half : 2 * half]
        scalar = int(RNG.integers(1, 1 << 62)) | (1 << 250)
        scalar %= Fp.MODULUS
        pts_lo = [
            VestaPoint.identity() if r[8] else VestaPoint.from_xy(
                int.from_bytes(r.tobytes()[:32], "little"),
                int.from_bytes(r.tobytes()[32:64], "little"))
            for r in lo9
        ]
        pts_hi = [
            VestaPoint.identity() if r[8] else VestaPoint.from_xy(
                int.from_bytes(r.tobytes()[:32], "little"),
                int.from_bytes(r.tobytes()[32:64], "little"))
            for r in hi9
        ]
        glo = _vesta_lm(pts_lo)
        ghi = _vesta_lm(pts_hi)
        t0 = time.time()
        import taiga_tpu.ops.limbs as LL
        X, Y, Z = FK.ec_fold_shared_lm(
            *glo, *ghi, jnp.asarray(LL.int_to_limbs(scalar))[None, :], field="fq"
        )
        want9 = H.ec_fold(FIELD_FQ, lo9, hi9, scalar)
        lanes = list(range(0, half, max(1, half // 64)))
        got = _lm_to_vesta(X, Y, Z, lanes)
        ok = True
        bad = ""
        for i in lanes:
            r = want9[i]
            want = VestaPoint.identity() if r[8] else VestaPoint.from_xy(
                int.from_bytes(r.tobytes()[:32], "little"),
                int.from_bytes(r.tobytes()[32:64], "little"))
            if got[i] != want:
                ok = False
                bad = f"lane {i}"
                break
        report(f"ec_fold k={k} half={half}", ok, time.time() - t0, bad)


def check_lrmsm():
    """The padded projective 2-column MSM exactly as plonk/ipa._lr_msm calls
    it (in_form='projective' + identity padding) — not covered by check_msm."""
    from taiga_tpu.ops import msm as msm_mod, ec
    from taiga_tpu.native import FIELD_FQ
    from taiga_tpu.crypto.curves import VestaPoint
    from taiga_tpu.plonk.msm_claim import srs_host_rows
    from taiga_tpu.plonk.ipa import _pad_pts_lm

    for k, half, pad in ((15, 16384, 0), (15, 1024, 1024), (13, 256, 256)):
        rows = srs_host_rows(k)[: 2 * half]
        pts = [
            VestaPoint.identity() if r[8] else VestaPoint.from_xy(
                int.from_bytes(r.tobytes()[:32], "little"),
                int.from_bytes(r.tobytes()[32:64], "little"))
            for r in rows
        ]
        g_lm = _vesta_lm(pts)
        a = rand_field_u64((2, 2 * half))
        a[0, :half] = 0  # col0 = [0 | hi-style]; col1 = [lo | 0]
        a[1, half:] = 0
        cols = jnp.asarray(H.u64_to_u16(a))
        if pad:
            cols = jnp.pad(cols, [(0, 0), (0, pad), (0, 0)])
        t0 = time.time()
        out = msm_mod.msm_multi(*_pad_pts_lm(g_lm, pad), cols, field="fq",
                                in_form="projective")
        got = ec.points_from_device((out[:, 0], out[:, 1], out[:, 2]), VestaPoint)
        ok = True
        bad = ""
        for c in range(2):
            x, y, inf = H.msm(FIELD_FQ, rows, a[c])
            want = VestaPoint.identity() if inf else VestaPoint.from_xy(x, y)
            if got[c] != want:
                ok = False
                bad = f"col {c}"
                break
        report(f"lr_msm half={half} pad={pad}", ok, time.time() - t0, bad)


def check_dots():
    for n in (1 << 14, 1 << 15):
        a = rand_field_u64((n,))
        b = rand_field_u64((n,))
        am = H.to_mont(FIELD_FP, a)
        bm = H.to_mont(FIELD_FP, b)
        t0 = time.time()
        got = dev_to_u64(poly_mod.mont_dot(u64_to_dev(a), u64_to_dev(b), "fp"))
        want = H.vec_sum(FIELD_FP, H.vec_mul(FIELD_FP, am, bm))
        report(f"mont_dot n={n}", np.array_equal(got, want), time.time() - t0)


def check_synthdiv():
    for n in (1 << 13, 1 << 15):
        a = rand_field_u64((3, n))
        pt = int(RNG.integers(1, 1 << 62))
        pt_inv = pow(pt, -1, P)
        am = H.to_mont(FIELD_FP, a.reshape(-1, 4)).reshape(3, n, 4)
        t0 = time.time()
        got = dev_to_u64(poly_mod.synthetic_div(
            u64_to_dev(a),
            u64_to_dev(np.frombuffer(pt.to_bytes(32, "little"), np.uint64)),
            u64_to_dev(np.frombuffer(pt_inv.to_bytes(32, "little"), np.uint64)),
            "fp",
        ))
        pm = H.to_mont(FIELD_FP, H.ints_to_u64([pt]))
        want = np.stack([H.poly_divide(FIELD_FP, am[i], pm[0]) for i in range(3)])
        report(f"synthetic_div n={n}", np.array_equal(got, want),
               time.time() - t0)




def check_tape():
    """Tape interpreter (ops/tape_device, the quotient's SMEM program) vs the
    native taiga_tape_eval on the same compiled tape — production-like
    extended domain, rotations, challenges, constants and shared subgraphs
    (VERDICT r4 weak #5: the newest device path joins the regression net)."""
    from taiga_tpu.ops import tape_device as TD
    from taiga_tpu.plonk import tape as TP
    from taiga_tpu.plonk.expression import (
        ADVICE, FIXED, Cell, ChallengeVar, Constant, Negated, Product, Sum,
    )

    k = 10
    D = (1 << k) * 8
    rot_scale = 8
    nadv, nfix = 6, 3
    y = ChallengeVar("y")
    beta = ChallengeVar("beta")
    a0 = Cell(ADVICE, 0, 0)
    a1 = Cell(ADVICE, 1, 1)
    a5 = Cell(ADVICE, 5, -1)
    f0 = Cell(FIXED, 0, 0)
    f2 = Cell(FIXED, 2, 2)
    e1 = Product(Sum(a0, Product(a1, beta)), f0)
    e2 = Sum(Product(a5, a5), Negated(Product(f2, Constant(12345))))
    e3 = Product(e1, Sum(a0, Product(Constant(7), y)))
    tape = TP.compile_tape([e1, e2, e3], rot_scale)
    scal = tape.scalar_values({"y": 3, "beta": 987654321, "gamma": 1, "theta": 0})

    adv = rand_field_u64((nadv, D))
    fix = rand_field_u64((nfix, D))
    adv_m = H.to_mont(FIELD_FP, adv.reshape(-1, 4)).reshape(nadv, D, 4)
    fix_m = H.to_mont(FIELD_FP, fix.reshape(-1, 4)).reshape(nfix, D, 4)
    t0 = time.time()
    got_dev = TD.tape_eval_device(
        tape,
        {ADVICE: jnp.asarray(H.u64_to_u16(adv_m)),
         FIXED: jnp.asarray(H.u64_to_u16(fix_m))},
        scal, D,
    )
    got = dev_to_u64(got_dev)
    empty = np.zeros((0, D, 4), np.uint64)
    tables = [fix_m if kd == FIXED else adv_m if kd == ADVICE else empty
              for kd in TP.TABLE_KINDS]
    scal_m = (H.to_mont(FIELD_FP, H.ints_to_u64(scal)) if scal
              else np.zeros((0, 4), np.uint64))
    want = H.tape_eval(FIELD_FP, tape.code, scal_m, tables, D,
                       tape.num_regs, tape.out_reg)
    report(f"tape interpreter D={D}", np.array_equal(got, want),
           time.time() - t0)


def check_lookup():
    """Device lookup permutation (ops/lookup_sort.permute_pairs_device) vs
    the host permute_expression_pair at a production shape."""
    from taiga_tpu.ops import lookup_sort as LS
    from taiga_tpu.plonk.prover import _permute_lookup_pair

    nl, k = 2, 13
    n = 1 << k
    u = n - 65
    a_cols = []
    s_cols = []
    for _ in range(nl):
        s_vals = [int(v) for v in RNG.integers(0, 1 << 16, n)]
        a_vals = [s_vals[int(i)] for i in RNG.integers(0, u, n)]
        a_cols.append(a_vals)
        s_cols.append(s_vals)
    spec = L.FP
    a_v = jnp.asarray(np.stack([
        np.asarray(spec.array_to_mont(c)) for c in a_cols]))
    s_v = jnp.asarray(np.stack([
        np.asarray(spec.array_to_mont(c)) for c in s_cols]))
    t0 = time.time()
    ap, sp, ok = LS.permute_pairs_device(a_v, s_v, u)
    ap_i = [spec.array_from_mont(r) for r in np.asarray(jax.device_get(ap))]
    sp_i = [spec.array_from_mont(r) for r in np.asarray(jax.device_get(sp))]
    ok = bool(np.asarray(jax.device_get(ok)).all())
    good = ok
    for li in range(nl):
        want_a, want_s = _permute_lookup_pair(a_cols[li], s_cols[li], u)
        good = good and ap_i[li][:u] == want_a and sp_i[li][:u] == want_s
    report(f"lookup permute n={n} u={u} L={nl}", good, time.time() - t0)


def check_hybrid():
    """Hybrid multiopen device programs (plonk/hybrid_open._build_programs:
    per-group aggregation, synthetic-division h, final f) vs a native-engine
    recomputation at the production group structure."""
    from taiga_tpu.plonk.hybrid_open import _build_programs

    sizes = (5, 3, 2)
    G = len(sizes)
    C, k = 12, 13
    n = 1 << k
    coeffs = rand_field_u64((C, n))
    coeffs_m = H.to_mont(FIELD_FP, coeffs.reshape(-1, 4)).reshape(C, n, 4)
    idxs = [int(i) for i in RNG.integers(0, C, sum(sizes))]
    weights = [int(w) for w in RNG.integers(1, 1 << 62, sum(sizes))]
    pts = [int(v) for v in RNG.integers(1, 1 << 62, G)]
    u_ch, w_ch = 0x1234567, 0x89ABCD
    agg_fn, h_fn, f_fn = _build_programs(sizes)

    def mont_rows(vals):
        return jnp.asarray(np.stack([L.int_to_limbs(v * L.FP.r % P)
                                     for v in vals]))

    t0 = time.time()
    agg = agg_fn(jnp.asarray(H.u64_to_u16(coeffs_m)),
                 jnp.asarray(np.asarray(idxs, np.int32)), mont_rows(weights))
    h = h_fn(agg, mont_rows(pts),
             mont_rows([pow(v, -1, P) for v in pts]),
             mont_rows([pow(u_ch, j, P) for j in range(G)]))
    f = f_fn(h, agg, mont_rows([pow(w_ch, j + 1, P) for j in range(G)]))
    got_agg = dev_to_u64(agg)
    got_f = dev_to_u64(f)

    # native oracle
    agg_host = []
    off = 0
    zero = np.zeros((n, 4), np.uint64)
    for g, sz in enumerate(sizes):
        acc = zero
        for i in range(off, off + sz):
            wm = H.to_mont(FIELD_FP, H.ints_to_u64([weights[i]]))[0]
            acc = H.vec_add(FIELD_FP, acc,
                            H.vec_mul(FIELD_FP, coeffs_m[idxs[i]], wm))
        agg_host.append(acc)
        off += sz
    h_host = zero
    for g in range(G):
        pm = H.to_mont(FIELD_FP, H.ints_to_u64([pts[g]]))[0]
        q = H.poly_divide(FIELD_FP, agg_host[g], pm)
        um = H.to_mont(FIELD_FP, H.ints_to_u64([pow(u_ch, g, P)]))[0]
        h_host = H.vec_add(FIELD_FP, h_host, H.vec_mul(FIELD_FP, q, um))
    f_host = h_host
    for g in range(G):
        wm = H.to_mont(FIELD_FP, H.ints_to_u64([pow(w_ch, g + 1, P)]))[0]
        f_host = H.vec_add(FIELD_FP, f_host,
                           H.vec_mul(FIELD_FP, agg_host[g], wm))
    ok = (np.array_equal(got_agg, np.stack(agg_host))
          and np.array_equal(got_f, f_host))
    report(f"hybrid multiopen groups={sizes} n={n}", ok, time.time() - t0)


STAGES = {
    "ntt": check_ntt,
    "msm": check_msm,
    "fixed_msm": check_fixed_msm,
    "sharded_commit": check_sharded_commit,
    "cumprod": check_cumprod,
    "evals": check_evals,
    "ecadd": check_ecadd,
    "fold": check_fold,
    "lrmsm": check_lrmsm,
    "dots": check_dots,
    "synthdiv": check_synthdiv,
    "tape": check_tape,
    "lookup": check_lookup,
    "hybrid": check_hybrid,
}

if __name__ == "__main__":
    args = sys.argv[1:] or ["all"]
    names = list(STAGES) if "all" in args else args
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}", flush=True)
    for nm in names:
        STAGES[nm]()
    if FAILURES:
        print(f"\n{len(FAILURES)} FAILURES: {FAILURES}")
        sys.exit(1)
    print("\nall device kernels match the native engine")
