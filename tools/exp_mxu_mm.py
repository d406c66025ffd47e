"""Experiment: MXU-assisted Montgomery multiply (VERDICT r4 next #2).

The production _mm (ops/ff_kernels.py) is interleaved CIOS: 32 full-width
VPU multiplies + ~2.5k aux ops per product. This prototype splits it:

  1. schoolbook full product a*b -> 512-bit T (VPU, 16 multiplies of 16
     rows each, product-scanning with deferred carries);
  2. Montgomery fold T*R^-1 mod p as a LINEAR map over T's bytes:
     sum_j U_j * c_j with c_j = 2^(8j)*R^-1 mod p — a constant (64 x 33)
     byte matrix, evaluated as ONE f32 dot_general on the MXU (all values
     integer-exact in f32: sums < 2^24);
  3. tiny Barrett tail to shrink the ~2^14*p fold result into [0, p)
     (one-row quotient estimate, two conditional subtracts).

Bit-exact vs the host oracle by construction of the fold; validated here
against random + edge inputs, then benchmarked against mont_mul_lm.

Run on chip:  python tools/exp_mxu_mm.py bench
Validate:     JAX_PLATFORMS=cpu python tools/exp_mxu_mm.py check
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from functools import lru_cache, partial

import numpy as np
import jax

if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    # the axon sitecustomize pins jax_platforms to "axon,cpu" at interpreter
    # start, silently overriding the env var; re-pin before backend init
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from taiga_tpu.ops import limbs as L
from taiga_tpu.ops import ff_kernels as FK

W = 16
NLIMBS = 16
MASK = 0xFFFF


@lru_cache(maxsize=None)
def _fold_consts(field: str):
    """(M_f32 (33, 64), mu_bytes (33,), p_bytes (32,), 2p/1p u16 rows)."""
    spec = L.FP if field == "fp" else L.FQ
    p = spec.modulus
    rinv = pow(1 << 256, -1, p)
    # c_j = 2^(8j) * R^-1 mod p, byte-decomposed: M[m, j] = byte m of c_j
    M = np.zeros((33, 64), np.float32)
    for j in range(64):
        c = (1 << (8 * j)) * rinv % p
        for m in range(33):
            M[m, j] = (c >> (8 * m)) & 0xFF
    mu = (1 << 518) // p  # floor(2^(254+264)/p) < 2^264: 33 bytes
    mu_b = np.asarray([(mu >> (8 * m)) & 0xFF for m in range(34)], np.uint32)
    p_b = np.asarray([(p >> (8 * m)) & 0xFF for m in range(32)], np.uint32)
    return M, mu_b, p_b


def _full_product(a, b):
    """(16,B) x (16,B) -> 33 loose u32 rows (base 2^16, each < 2^21)."""
    zero = jnp.zeros_like(a[0:1])
    t = jnp.concatenate([jnp.zeros_like(a), zero], 0)  # (17, B)
    out_rows = []
    for i in range(NLIMBS):
        p = a[i] * b  # (16, B)
        plo = p & MASK
        phi = p >> W
        t = t + jnp.concatenate([plo, zero], 0) + jnp.concatenate([zero, phi], 0)
        out_rows.append(t[0])
        t = jnp.concatenate([t[1:], zero], 0)
    return jnp.concatenate([jnp.stack(out_rows), t[:17]], 0)  # (33, B)


def _carry_rows(t, nbits=16):
    """Sequential carry propagation over rows (base 2^nbits)."""
    mask = (1 << nbits) - 1
    out = []
    carry = jnp.zeros_like(t[0])
    for i in range(t.shape[0]):
        v = t[i] + carry
        out.append(v & mask)
        carry = v >> nbits
    return jnp.stack(out), carry


def _mm_mxu(a, b, field: str = "fq"):
    """Drop-in _mm replacement: a*b*R^-1 mod p over (16,B) canonical limbs."""
    M, mu_b, p_b = _fold_consts(field)
    Mj = jnp.asarray(M)

    # 1. full product, canonical bytes
    loose = _full_product(a, b)            # (33, B) < 2^21
    t16, top = _carry_rows(loose)          # canonical u16 rows; top < 2^5
    t16 = jnp.concatenate([t16, top[None]], 0)  # (34, B); rows 32,33 small
    # byte split -> (64, B): T's 512 bits (row 33 only carries to byte 66+,
    # bound: top < 2^5 at base-2^16 offset 33 = byte 66 -> beyond 2^512?
    # no: T < 2^512 guaranteed (a,b < 2^256), so rows 32+ fold into byte 64
    # range; keep 64 byte rows of the canonical value
    tb = []
    for i in range(32):
        tb.append(t16[i] & 0xFF)
        tb.append(t16[i] >> 8)
    tbytes = jnp.stack(tb).astype(jnp.float32)  # (64, B), each < 256

    # 2. Montgomery fold on the MXU: V = sum_j U_j * c_j  ===  T*R^-1 (mod p)
    v8 = jax.lax.dot_general(
        Mj, tbytes, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (33, B) f32, integer-exact (< 64*255^2 < 2^24)
    v8 = v8.astype(jnp.uint32)
    vb, vtop = _carry_rows(v8, 8)          # canonical bytes of V; V < 2^269.1
    vb = jnp.concatenate([vb, vtop[None]], 0)  # (34, B), rows 33 small

    # 3. tiny Barrett: q = floor(V/p) estimated from V >> 254
    #    V < 2^14.1 * p  =>  t_hi = V >> 254 < 2^16 (one row)
    t_hi = (vb[31] >> 6) | (vb[32] << 2) | (vb[33] << 10)  # (B,)
    qprod = t_hi[None, :] * jnp.asarray(mu_b)[:, None]     # (34, B) < 2^24
    qb, qtop = _carry_rows(qprod, 8)
    qhat = (qb[33] | (qtop << 8))  # floor(t_hi*mu / 2^264): byte 33 upward
    qp = qhat[None, :] * jnp.asarray(p_b)[:, None]         # (32, B) < 2^24
    # D = V - qhat*p  (loose signed), in [0, 3p)
    d = vb[:33].astype(jnp.int32)
    d = d.at[:32].add(-qp.astype(jnp.int32))
    out = []
    carry = jnp.zeros_like(d[0])
    for i in range(33):
        v = d[i] + carry
        out.append(v & 0xFF)
        carry = v >> 8  # arithmetic shift: signed borrow propagation
    db = jnp.stack(out).astype(jnp.uint32)                 # canonical bytes
    # regroup to 17 u16 rows
    r16 = jnp.stack([db[2 * i] | (db[2 * i + 1] << 8) for i in range(16)]
                    + [db[32]])
    # three conditional subtracts p (Barrett slack: D < 4p)
    spec_n = np.zeros(17, np.uint32)
    spec_p = L.FP if field == "fp" else L.FQ
    spec_n[:16] = spec_p.n_limbs
    for _ in range(3):
        sub = []
        borrow = jnp.zeros_like(r16[0])
        for i in range(17):
            dd = r16[i] - jnp.uint32(int(spec_n[i])) - borrow
            sub.append(dd & MASK)
            borrow = (dd >> 31) & 1
        sub = jnp.stack(sub)
        r16 = jnp.where((borrow == 0)[None], sub, r16)
    return r16[:16]


def _mult_floor(a, b):
    """Lower bound: just the 16 schoolbook multiplies + a fold (no carries,
    wrong math) — measures the VPU multiply share of _mm."""
    acc = jnp.zeros_like(a)
    for i in range(NLIMBS):
        p = a[i] * b
        acc = acc + (p & MASK) + (p >> W)
    return acc


def _rand_inputs(Bn, field, seed=0):
    spec = L.FP if field == "fp" else L.FQ
    rng = np.random.default_rng(seed)
    avals = [int(rng.integers(0, 2**63)) * int(rng.integers(0, 2**63)) % spec.modulus
             for _ in range(Bn)]
    bvals = [int(rng.integers(0, 2**63)) * int(rng.integers(0, 2**63)) % spec.modulus
             for _ in range(Bn)]
    # edge cases
    avals[:4] = [0, 1, spec.modulus - 1, spec.r % spec.modulus]
    bvals[:4] = [spec.modulus - 1, spec.modulus - 1, spec.modulus - 1, 1]
    a = jnp.asarray(L.ints_to_limbs(avals).T.copy())
    b = jnp.asarray(L.ints_to_limbs(bvals).T.copy())
    return a, b, avals, bvals


def check(field="fq"):
    spec = L.FP if field == "fp" else L.FQ
    a, b, avals, bvals = _rand_inputs(256, field, seed=1)
    got = np.asarray(jax.device_get(jax.jit(partial(_mm_mxu, field=field))(a, b)))
    rinv = pow(1 << 256, -1, spec.modulus)
    ok = True
    for i in range(256):
        exp = avals[i] * bvals[i] * rinv % spec.modulus
        g = L.limbs_to_int(got[:, i])
        if g != exp:
            print(f"MISMATCH lane {i}: got {g:x} want {exp:x}")
            ok = False
            if i > 8:
                break
    print(f"check({field}):", "OK" if ok else "FAILED")
    return ok


def bench(Bn=1 << 20, field="fq"):
    a, b, _, _ = _rand_inputs(Bn, field, seed=2)

    def timeit(name, f):
        out = f(a, b)
        jax.device_get(out[0, :8])
        t0 = time.time()
        runs = 10
        for _ in range(runs):
            out = f(a, b)
        jax.device_get(out[0, :8])
        dt = (time.time() - t0) / runs
        print(f"{name:28s} {dt*1e3:9.3f} ms   {dt/Bn*1e9:7.3f} ns/lane")
        return dt

    cur = jax.jit(partial(FK.mont_mul_lm, field=field))
    new = jax.jit(partial(_mm_mxu, field=field))
    floor = jax.jit(_mult_floor)
    t_cur = timeit("mont_mul_lm (current)", cur)
    t_new = timeit("mm_mxu (product+MXU fold)", new)
    t_floor = timeit("mult floor (16 vpu muls)", floor)
    print(f"speedup: {t_cur/t_new:.2f}x; floor ratio cur={t_cur/t_floor:.1f}x "
          f"new={t_new/t_floor:.1f}x")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "check"
    if mode == "check":
        check("fq")
        check("fp")
    else:
        bench()
