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


def u64_to_dev(a: np.ndarray) -> jnp.ndarray:
    """(…, 4) u64 plain -> device (…, 16) Montgomery limbs."""
    m = H.to_mont(FIELD_FP, a.reshape(-1, 4)).reshape(a.shape)
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


def check_ecadd():
    from taiga_tpu.ops import ff_kernels as FK
    from taiga_tpu.crypto.curves import VestaPoint
    from taiga_tpu.plonk.srs import get_params

    for n in (4096, 32768):
        g = get_params(12).g
        idx = RNG.integers(0, len(g), size=2 * n)
        pa = [g[i] for i in idx[:n]]
        pb = [g[i] for i in idx[n:]]
        ax = u64_to_dev(np.stack([np.frombuffer(p.x.v.to_bytes(32, "little"), np.uint64) for p in pa])).T
        ay = u64_to_dev(np.stack([np.frombuffer(p.y.v.to_bytes(32, "little"), np.uint64) for p in pa])).T
        bx = u64_to_dev(np.stack([np.frombuffer(p.x.v.to_bytes(32, "little"), np.uint64) for p in pb])).T
        by = u64_to_dev(np.stack([np.frombuffer(p.y.v.to_bytes(32, "little"), np.uint64) for p in pb])).T
        one = jnp.broadcast_to(jnp.asarray(L.FQ.one_mont, jnp.uint32)[:, None], (16, n))
        t0 = time.time()
        X, Y, Z = FK.ec_add_proj_lm(ax, ay, one, bx, by, one, field="fq")
        Xp = H.from_mont(1, dev_to_u64(X.T))
        Yp = H.from_mont(1, dev_to_u64(Y.T))
        Zp = H.from_mont(1, dev_to_u64(Z.T))
        ok = True
        bad = ""
        from taiga_tpu.crypto.fields import Fq
        for i in range(0, n, max(1, n // 64)):  # spot-check lanes
            want = pa[i] + pb[i]
            Zi = int.from_bytes(Zp[i].tobytes(), "little")
            if Zi == 0:
                ok = want.is_identity()
            else:
                zi = pow(Zi, -1, Fq.MODULUS)
                x = int.from_bytes(Xp[i].tobytes(), "little") * zi % Fq.MODULUS
                y = int.from_bytes(Yp[i].tobytes(), "little") * zi % Fq.MODULUS
                ok = (not want.is_identity()) and want.x.v == x and want.y.v == y
            if not ok:
                bad = f"lane {i}"
                break
        report(f"ec_add_proj n={n}", ok, time.time() - t0, bad)


STAGES = {
    "ntt": check_ntt,
    "msm": check_msm,
    "cumprod": check_cumprod,
    "evals": check_evals,
    "ecadd": check_ecadd,
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
