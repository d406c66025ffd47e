"""On-chip microbenchmarks of the prover's component kernels at production
shapes (k=13 unless overridden). Ground truth for where prove wall-clock goes:
run before/after any kernel change.

Usage: python tools/profile_kernels.py [k]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, *args, runs=3, warm=1):
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(runs):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / runs
    print(f"{name:44s} {dt*1e3:9.2f} ms")
    return dt


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    n = 1 << k
    from taiga_tpu.ops import limbs as L, msm as msm_mod, ntt
    from taiga_tpu.plonk.srs import srs_device

    rng = np.random.default_rng(7)

    # --- RTT floor ---------------------------------------------------------
    one = jnp.zeros((8,), jnp.uint32)
    t0 = time.time()
    for _ in range(10):
        np.asarray(jax.device_get(one))
    print(f"{'device_get RTT (8B)':44s} {(time.time()-t0)/10*1e3:9.2f} ms")

    # --- bulk pull bandwidth ----------------------------------------------
    big = jnp.asarray(rng.integers(0, 1 << 16, (40, n, 8), dtype=np.uint32))
    jax.block_until_ready(big)
    t0 = time.time()
    np.asarray(jax.device_get(big))
    dt = time.time() - t0
    mb = big.size * 4 / 1e6
    print(f"{'device->host pull ' + str(round(mb,1)) + 'MB':44s} {dt*1e3:9.2f} ms  ({mb/dt:.1f} MB/s)")

    # --- upload bandwidth --------------------------------------------------
    host = np.asarray(rng.integers(0, 1 << 16, (40, n, 8), dtype=np.uint32))
    t0 = time.time()
    jax.block_until_ready(jnp.asarray(host))
    dt = time.time() - t0
    print(f"{'host->device push ' + str(round(mb,1)) + 'MB':44s} {dt*1e3:9.2f} ms  ({mb/dt:.1f} MB/s)")

    # --- iNTT (C=10 columns) ----------------------------------------------
    vals = jnp.asarray(rng.integers(0, 1 << 16, (10, n, L.NLIMBS), dtype=np.uint32))
    f_intt = jax.jit(lambda v: ntt.intt(v, k, "fp"))
    timeit(f"iNTT k={k} C=10", f_intt, vals)

    # --- coset NTT (extension to 8n), C=10 --------------------------------
    ke = k + 3
    padded = jnp.asarray(
        rng.integers(0, 1 << 16, (10, n * 8, L.NLIMBS), dtype=np.uint32))
    f_coset = jax.jit(lambda v: ntt.coset_ntt(v, ke, "fp"))
    timeit(f"coset NTT k={ke} C=10", f_coset, padded)

    # --- coset iNTT at 8n (quotient finish), C=1 --------------------------
    one_col = jnp.asarray(
        rng.integers(0, 1 << 16, (n * 8, L.NLIMBS), dtype=np.uint32))
    f_cintt = jax.jit(lambda v: ntt.coset_intt(v, ke, "fp"))
    timeit(f"coset iNTT k={ke} C=1", f_cintt, one_col)

    # --- fixed-base MSM, 8 and 1 columns ----------------------------------
    gx, gy, gz = map(jnp.asarray, srs_device(k))
    table = msm_mod.fixed_base_table(gx, gy, gz, key=("srs", k), field="fq")
    jax.block_until_ready(table)
    sc8 = jnp.asarray(rng.integers(0, 1 << 16, (8, n, L.NLIMBS), dtype=np.uint32))
    sc1 = sc8[:1]
    f_msm = jax.jit(lambda s: msm_mod.msm_fixed_multi(table, s, field="fq"))
    timeit(f"fixed-base MSM k={k} C=8", f_msm, sc8)
    timeit(f"fixed-base MSM k={k} C=1", f_msm, sc1)

    # --- variable-base MSM C=2 (IPA L/R shape) ----------------------------
    sc2 = jnp.asarray(rng.integers(0, 1 << 16, (2, n, L.NLIMBS), dtype=np.uint32))
    f_msm2 = jax.jit(
        lambda s: msm_mod.msm_multi(gx, gy, gz, s, field="fq"))
    timeit(f"var-base MSM k={k} C=2", f_msm2, sc2)

    # --- grand-product cumprod (C=3) --------------------------------------
    from taiga_tpu.ops import poly
    a3 = jnp.asarray(rng.integers(0, 1 << 16, (3, n, L.NLIMBS), dtype=np.uint32))
    f_cp = jax.jit(jax.vmap(lambda a: poly.mont_cumprod(a, "fp")))
    timeit(f"mont_cumprod k={k} C=3", f_cp, a3)

    # --- eval polys at points (C=40, Q=5) ---------------------------------
    c40 = jnp.asarray(rng.integers(0, 1 << 16, (40, n, L.NLIMBS), dtype=np.uint32))
    q5 = jnp.asarray(rng.integers(0, 1 << 16, (5, L.NLIMBS), dtype=np.uint32))
    f_ev = jax.jit(poly.eval_polys_at_points)
    timeit(f"eval_polys_at_points C=40 Q=5", f_ev, c40, q5)


if __name__ == "__main__":
    main()
