"""Break down the fixed-base MSM's on-chip cost: sort+gather vs bucket
reduction vs the weighted-sum tail, plus the raw fused-add kernel rate.

Run: python tools/profile_msm_parts.py [k] [ncols]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timeit(name, fn, *args, runs=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(runs):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / runs
    print(f"{name:46s} {dt*1e3:9.2f} ms")
    return dt


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 13
    ncols = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n = 1 << k
    from taiga_tpu.ops import ff_kernels as FK, limbs as L, msm as M
    from taiga_tpu.plonk.srs import srs_device

    c = M.WINDOW_BITS
    W = 256 // c
    total = ncols * W * n
    print(f"k={k} ncols={ncols} c={c}: total lanes = {total}")
    rng = np.random.default_rng(7)

    gx, gy, gz = map(jnp.asarray, srs_device(k))
    table = M.fixed_base_table(gx, gy, gz, key=("srs", k), field="fq")
    jax.block_until_ready(table)

    sc = jnp.asarray(rng.integers(0, 1 << 16, (ncols, n, L.NLIMBS),
                                  dtype=np.uint32))

    # full MSM
    f_full = jax.jit(lambda s: M._msm_fixed_dev(table, s, "fq", c))
    timeit("full fixed-base MSM", f_full, sc)

    # sort + gather only (the packed row-major path the MSM uses)
    @jax.jit
    def sort_gather(s):
        digits = jax.vmap(lambda q: M._digits_all(q, c))(s)
        col_off = jnp.arange(ncols, dtype=jnp.int32)[:, None] * (1 << c)
        comp = (digits.reshape(ncols, W * n) + col_off).reshape(total)
        idx_bits = max(1, (total - 1).bit_length())
        packed = (comp.astype(jnp.uint32) << idx_bits) | jnp.arange(
            total, dtype=jnp.uint32)
        packed = jnp.sort(packed)
        d = (packed >> idx_bits).astype(comp.dtype)
        order = (packed & jnp.uint32((1 << idx_bits) - 1)).astype(jnp.int32)
        pidx = order % (W * n)
        return (*M._unpack_rows_lm(jnp.take(table, pidx, axis=0).T, 'fq'), d)

    timeit("packed sort + row gather + unpack", sort_gather, sc)

    # one fused-add round at full width (the reduction's unit cost)
    px = jnp.asarray(rng.integers(0, 1 << 16, (16, total), dtype=np.uint32))
    py, pz = px + 1, px + 2
    f_add = jax.jit(lambda a, b, cc: FK.ec_add_proj_lm(a, b, cc, a, b, cc,
                                                       field="fq"))
    dt = timeit(f"one ec_add_proj_lm round @ {total}", f_add, px, py, pz)
    print(f"  = {dt/total*1e9:.1f} ns/lane-add")

    # selector-add round (what _seg_rounds uses)
    sel = jnp.asarray(rng.integers(0, 2, (1, total), dtype=np.uint32))
    f_sel = jax.jit(lambda a, b, cc, s: FK.ec_add_proj_sel_lm(
        a, b, cc, a, b, cc, s, field="fq"))
    dt = timeit(f"one ec_add_proj_sel_lm round @ {total}", f_sel, px, py, pz, sel)
    print(f"  = {dt/total*1e9:.1f} ns/lane-add")


if __name__ == "__main__":
    main()
