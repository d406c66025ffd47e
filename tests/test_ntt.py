import random

import jax.numpy as jnp
import numpy as np

from taiga_tpu.crypto.fields import Fp, Fq
from taiga_tpu.ops import limbs as L
from taiga_tpu.ops import ntt

rng = random.Random(0x277)


def host_ntt(coeffs, k, p, omega):
    """O(n^2) reference DFT: out[i] = sum_j c_j * omega^(ij)."""
    n = 1 << k
    out = []
    for i in range(n):
        acc = 0
        wi = pow(omega, i, p)
        x = 1
        for j in range(n):
            acc = (acc + coeffs[j] * x) % p
            x = x * wi % p
        out.append(acc)
    return out


def test_ntt_matches_host_dft():
    k = 4
    p = Fp.MODULUS
    omega, _, _, _ = ntt.domain_params(k, "fp")
    coeffs = [Fp.random(rng).v for _ in range(1 << k)]
    exp = host_ntt(coeffs, k, p, omega)
    arr = jnp.asarray(L.FP.array_to_mont(coeffs))
    got = L.FP.array_from_mont(ntt.ntt(arr, k, "fp"))
    assert got == exp


def test_ntt_roundtrip():
    for field, F in (("fp", Fp), ("fq", Fq)):
        k = 6
        coeffs = [F.random(rng).v for _ in range(1 << k)]
        spec = L.FP if field == "fp" else L.FQ
        arr = jnp.asarray(spec.array_to_mont(coeffs))
        back = ntt.intt(ntt.ntt(arr, k, field), k, field)
        assert spec.array_from_mont(back) == coeffs


def test_ntt_batched():
    k = 3
    B = 4
    polys = [[Fp.random(rng).v for _ in range(1 << k)] for _ in range(B)]
    arr = np.stack([np.asarray(L.FP.array_to_mont(c)) for c in polys])
    out = ntt.ntt(jnp.asarray(arr), k, "fp")
    omega, _, _, _ = ntt.domain_params(k, "fp")
    for b in range(B):
        exp = host_ntt(polys[b], k, Fp.MODULUS, omega)
        got = L.FP.array_from_mont(out[b])
        assert got == exp


def test_coset_roundtrip_and_values():
    k = 3
    p = Fp.MODULUS
    coeffs = [Fp.random(rng).v for _ in range(1 << k)]
    arr = jnp.asarray(L.FP.array_to_mont(coeffs))
    ev = ntt.coset_ntt(arr, k, "fp")
    # value at g*omega^i equals poly evaluated there
    omega, _, _, _ = ntt.domain_params(k, "fp")
    got = L.FP.array_from_mont(ev)
    for i in (0, 1, 5):
        x = 5 * pow(omega, i, p) % p
        exp = 0
        for j in reversed(range(1 << k)):
            exp = (exp * x + coeffs[j]) % p
        assert got[i] == exp
    back = ntt.coset_intt(ev, k, "fp")
    assert L.FP.array_from_mont(back) == coeffs


def test_mul_via_ntt():
    """Polynomial product via pointwise multiplication in evaluation form."""
    k = 4
    n = 1 << k
    p = Fp.MODULUS
    a = [Fp.random(rng).v for _ in range(n // 2)] + [0] * (n // 2)
    b = [Fp.random(rng).v for _ in range(n // 2)] + [0] * (n // 2)
    ea = ntt.ntt(jnp.asarray(L.FP.array_to_mont(a)), k, "fp")
    eb = ntt.ntt(jnp.asarray(L.FP.array_to_mont(b)), k, "fp")
    prod = ntt.intt(L.mont_mul(ea, eb, L.FP), k, "fp")
    got = L.FP.array_from_mont(prod)
    # schoolbook
    exp = [0] * n
    for i in range(n // 2):
        for j in range(n // 2):
            exp[(i + j) % n] = (exp[(i + j) % n] + a[i] * b[j]) % p
    assert got == exp


def test_mesh_four_step_matches_single_device():
    """Four-step all_to_all NTT over the 8-device CPU mesh is bit-exact vs
    the single-device radix-2 path, forward and inverse, both fields."""
    from taiga_tpu.parallel.sharded import make_mesh

    mesh = make_mesh()
    k = 10
    for field, F in (("fp", Fp), ("fq", Fq)):
        spec = L.FP if field == "fp" else L.FQ
        vals = [F.random(rng).v for _ in range(1 << k)]
        arr = jnp.asarray(spec.array_to_mont(vals))
        fwd_ref = np.asarray(ntt.ntt(arr, k, field))
        fwd_mesh = np.asarray(ntt.ntt_mesh(mesh, arr, k, field))
        assert (fwd_ref == fwd_mesh).all()
        inv_ref = np.asarray(ntt.intt(arr, k, field))
        inv_mesh = np.asarray(ntt.ntt_mesh(mesh, arr, k, field, inverse=True))
        assert (inv_ref == inv_mesh).all()


def test_jit_first_then_eager_no_tracer_poisoning():
    """Regression: when the FIRST NTT at a (k, field) ran inside an outer
    jit trace, the device-table cache stored a tracer and every later eager
    call died with UnexpectedTracerError (caught by the round-5 full-bench
    rehearsal: tier2's jit ran before tier1's eager prover)."""
    import jax

    k = 9
    vals = L.FP.array_to_mont([i + 1 for i in range(1 << k)])
    arr = jnp.asarray(vals)
    f = jax.jit(lambda a: ntt.intt(a, k, "fp"))
    out1 = np.asarray(f(arr))
    out2 = np.asarray(ntt.intt(arr, k, "fp"))
    assert (out1 == out2).all()
