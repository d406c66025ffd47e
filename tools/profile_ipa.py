"""Micro-profile the multiopen/IPA pieces on the live backend.

Times (device_get-synced):
  - single-column 2^15 MSM
  - msm_multi at the advice-commit shape
  - ipa_open_device end-to-end with per-round wall clocks
Run: python tools/profile_ipa.py [k]
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")

import jax
import jax.numpy as jnp
import numpy as np

from taiga_tpu.crypto.fields import Fp
from taiga_tpu.ops import ec, limbs as L, msm as msm_mod, ff_kernels as FK
from taiga_tpu.plonk import ipa
from taiga_tpu.plonk.srs import get_params, srs_device
from taiga_tpu.plonk.transcript import ProofWriter

P = Fp.MODULUS
k = int(sys.argv[1]) if len(sys.argv) > 1 else 15
n = 1 << k
rng = np.random.default_rng(0)


def rand_scalars(m):
    return [int.from_bytes(rng.bytes(40), "little") % P for m_ in range(m)]


def timeit(name, fn, reps=3):
    fn()  # warm (compile)
    t0 = time.time()
    for _ in range(reps):
        out = fn()
        jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    print(f"{name:44s} {dt*1e3:9.1f} ms")
    return dt


params = get_params(k)
g_dev = tuple(map(jnp.asarray, srs_device(k)))

# single-column MSM
sl = jnp.asarray(msm_mod.scalars_to_limbs(rand_scalars(n)))
timeit("msm 1 col", lambda: msm_mod.msm(g_dev[0], g_dev[1], g_dev[2], sl, field="fq"))

# multi-column MSM at advice shape
for ncols in (4, 12, 25):
    sls = jnp.stack([
        jnp.asarray(msm_mod.scalars_to_limbs(rand_scalars(n))) for _ in range(ncols)
    ])
    timeit(f"msm_multi {ncols} cols", lambda sls=sls: msm_mod._msm_multi_device(
        g_dev[0], g_dev[1], g_dev[2], sls, field="fq"), reps=1)

# generator fold (shared scalar) at half widths
g_lm = tuple(t_.T for t_ in g_dev)
u_limbs = jnp.asarray(L.int_to_limbs(rand_scalars(1)[0]))[None, :]
for half in (n // 2, n // 4):
    lo = tuple(t_[:, :half] for t_ in g_lm)
    hi = tuple(t_[:, half : 2 * half] for t_ in g_lm)
    timeit(f"g fold @ {half}", lambda lo=lo, hi=hi: FK.ec_fold_shared_lm(
        *lo, *hi, u_limbs, field="fq"))

# full ipa open with per-round timing
coeffs = jnp.asarray(L.FP.array_to_mont(rand_scalars(n)))
x = rand_scalars(1)[0]


def run_open():
    tr = ProofWriter(b"profile")
    ipa.ipa_open_device(params, coeffs, 123, x, tr)
    return tr.bytes()


run_open()  # warm
t0 = time.time()
run_open()
print(f"{'ipa_open_device total':44s} {(time.time()-t0)*1e3:9.1f} ms")

# per-round attribution via monkeypatched timer
orig_lr = ipa._lr_msm
orig_dots = ipa._ipa_dots
rounds = []


def lr_timed(g, a_lo, a_hi, pad):
    t0 = time.time()
    out = orig_lr(g, a_lo, a_hi, pad)
    jax.block_until_ready(out[0].x.v if hasattr(out[0], "x") else out)
    rounds.append((a_lo.shape[0], time.time() - t0))
    return out


ipa._lr_msm = lr_timed
tr = ProofWriter(b"profile2")
t0 = time.time()
ipa.ipa_open_device(params, coeffs, 123, x, tr)
total = time.time() - t0
ipa._lr_msm = orig_lr
print(f"{'ipa_open (lr timed) total':44s} {total*1e3:9.1f} ms")
for half, dt in rounds:
    print(f"    lr_msm half={half:6d} {dt*1e3:9.1f} ms")
print(f"    lr_msm sum {sum(d for _, d in rounds)*1e3:9.1f} ms")
