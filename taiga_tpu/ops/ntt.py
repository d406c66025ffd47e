"""Radix-2 NTT over Fp/Fq as vectorized limb tensors.

The prover's polynomial engine: coefficients <-> evaluations over the 2^k
multiplicative subgroup (both Pasta fields have 2-adicity 32). Iterative
decimation-in-time with a host-precomputed bit-reversal permutation and
per-stage Montgomery twiddle tables; the stage loop is static (k stages),
each stage a fully-vectorized butterfly over the whole (batch, n) tensor.

Coset evaluation (for the vanishing argument's extended domain) is handled by
scaling coefficients by powers of the coset generator before the NTT.

Bit-exact vs a host reference NTT (tests/test_ntt.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs as L


def _spec(field: str) -> L.FieldSpec:
    return L.FP if field == "fp" else L.FQ


@lru_cache(maxsize=None)
def domain_params(k: int, field: str = "fp"):
    """Returns (omega, omega_inv, n_inv, bitrev_idx) for the 2^k domain."""
    spec = _spec(field)
    p = spec.modulus
    n = 1 << k
    # generator 5 for both Pasta fields
    omega = pow(5, (p - 1) >> k, p)
    omega_inv = pow(omega, -1, p)
    n_inv = pow(n, -1, p)
    idx = np.zeros(n, dtype=np.int32)
    for i in range(n):
        idx[i] = int(format(i, f"0{k}b")[::-1], 2)
    return omega, omega_inv, n_inv, idx


@lru_cache(maxsize=None)
def _twiddle_tables(k: int, field: str, inverse: bool):
    """Per-stage twiddle tables in Montgomery form: stage s has 2^s twiddles."""
    spec = _spec(field)
    p = spec.modulus
    omega, omega_inv, _, _ = domain_params(k, field)
    w = omega_inv if inverse else omega
    tables = []
    for s in range(1, k + 1):
        m = 1 << s
        wm = pow(w, (1 << k) >> s, p)
        tw = [pow(wm, j, p) for j in range(m // 2)]
        tables.append(spec.array_to_mont(tw))  # numpy: never cache jnp arrays
    return tables


def _bitrev_jnp(k: int, field: str):
    return jnp.asarray(domain_params(k, field)[3])


@lru_cache(maxsize=None)
def _pease_twiddles(k: int, field: str, inverse: bool):
    """Stage-stacked twiddles for the constant-geometry (Pease) DIF NTT.

    Every stage is the SAME butterfly on static slices — u = x[:n/2],
    v = x[n/2:], out interleaved as (u+v, (u-v)*tw) — so the stage loop
    rolls into one lax.fori_loop with NO gathers (the first rolled version
    used 3 per-stage gathers and cost ~1.5x the unrolled NTT at steady
    state; TPU gathers are slow). Output is bit-reversed: one final take.

    The unrolled per-stage loop this replaces compiled 25-84 MB executables
    per (shape, k) variant — a fresh process re-uploaded every one over the
    ~10 MB/s device tunnel, dominating the ~500 s warmup.

    tw[s, j] = w^(2^s * (j >> s)), w = omega (or omega^-1 for the inverse);
    validated against the reference DFT and bit-exact vs the host NTT
    (tests/test_ntt.py, tools/tpu_diff.py ntt)."""
    spec = _spec(field)
    pmod = spec.modulus
    n = 1 << k
    omega, omega_inv, _, _ = domain_params(k, field)
    w = omega_inv if inverse else omega
    tw = np.zeros((max(k, 1), n // 2, L.NLIMBS), np.uint32)
    for s in range(k):
        step = pow(w, 1 << s, pmod)
        m = max(1, (n // 2) >> s)
        vals = [1] * m
        for i in range(1, m):
            vals[i] = vals[i - 1] * step % pmod
        row = np.repeat(np.asarray(spec.array_to_mont(vals)), 1 << s, axis=0)
        tw[s] = row[: n // 2]
    return tw


_DEV_TABLES: dict = {}


def _pease_twiddles_dev(k: int, field: str, inverse: bool):
    """Device-resident twiddle stack (uploaded once per process).

    NEVER caches under an active trace: jnp.asarray returns a TRACER there,
    and caching it poisons every later call (UnexpectedTracerError — caught
    when the bench's tier2 jit touched the NTT before any eager call)."""
    key = (k, field, inverse)
    t = _DEV_TABLES.get(key)
    if t is None:
        t = jnp.asarray(_pease_twiddles(k, field, inverse))
        if isinstance(t, jax.core.Tracer):
            return t  # constant in the caller's trace — do NOT cache
        _DEV_TABLES[key] = t
    return t


@partial(jax.jit, static_argnames=("k", "field", "inverse"))
def _ntt_fixed_jit(coeffs, tw, k: int, field: str, inverse: bool):
    spec = _spec(field)
    n = 1 << k
    half = n // 2

    def body(s, x):
        ts = jax.lax.dynamic_index_in_dim(tw, s, 0, keepdims=False)
        u = x[..., :half, :]
        v = x[..., half:, :]
        c0 = L.add(u, v, spec)
        c1 = L.mont_mul(L.sub(u, v, spec), ts, spec)
        y = jnp.stack([c0, c1], axis=-2)  # (..., half, 2, 16)
        return y.reshape(x.shape)

    x = jax.lax.fori_loop(0, k, body, coeffs)
    # Pease output is bit-reversed; one gather back to natural order
    x = jnp.take(x, _bitrev_jnp(k, field), axis=-2)
    if inverse:
        n_inv_m = jnp.asarray(spec.array_to_mont([domain_params(k, field)[2]])[0])
        x = L.mont_mul(x, n_inv_m, spec)
    return x


def _ntt_core(coeffs, k: int, field: str, inverse: bool):
    """coeffs: (..., n, 16) Montgomery -> (..., n, 16) Montgomery."""
    return _ntt_fixed_jit(coeffs, _pease_twiddles_dev(k, field, inverse),
                          k, field, inverse)


def ntt(coeffs, k: int, field: str = "fp"):
    """Forward NTT: coefficients -> evaluations at omega^i (natural order)."""
    return _ntt_core(coeffs, k, field, False)


def intt(evals, k: int, field: str = "fp"):
    """Inverse NTT: evaluations -> coefficients."""
    return _ntt_core(evals, k, field, True)


@lru_cache(maxsize=None)
def _coset_powers(k: int, field: str, g: int, inverse: bool):
    spec = _spec(field)
    p = spec.modulus
    n = 1 << k
    base = pow(g, -1, p) if inverse else g
    pows = [1] * n
    for i in range(1, n):
        pows[i] = pows[i - 1] * base % p
    return spec.array_to_mont(pows)  # numpy: never cache jnp arrays


# ---------------------------------------------------------------------------
# four-step (Bailey) NTT over a device mesh — SURVEY §5.7-8's multi-device
# long-transform. n = n1*n2 as an (n1, n2) matrix: length-n1 column NTTs,
# twiddle scaling by w^(j1*i2), length-n2 row NTTs, transpose. Each resharding
# between the column phase and the row phase is ONE lax.all_to_all over the
# mesh axis (the classic distributed-FFT transpose riding ICI), so a domain
# larger than a chip's HBM splits across the mesh with only O(n/D) per-device
# memory and three collective transposes.
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _four_step_twiddles(k: int, k1: int, field: str, inverse: bool):
    """T[j1, i2] = w^(±j1*i2) Montgomery, shape (2^k1, 2^(k-k1), 16) numpy."""
    spec = _spec(field)
    p = spec.modulus
    n1, n2 = 1 << k1, 1 << (k - k1)
    omega, omega_inv, _, _ = domain_params(k, field)
    w = omega_inv if inverse else omega
    rows = np.empty((n1, n2), dtype=object)
    for j1 in range(n1):
        base = pow(w, j1, p)
        acc = 1
        row = rows[j1]
        for i2 in range(n2):
            row[i2] = acc
            acc = acc * base % p
    flat = spec.array_to_mont([int(v) for v in rows.reshape(-1)])
    return flat.reshape(n1, n2, L.NLIMBS)


def ntt_mesh(mesh, x, k: int, field: str = "fp", inverse: bool = False,
             axis: str = "shards"):
    """Distributed NTT of a (2^k, 16) Montgomery limb tensor over `mesh`'s
    `axis` (D devices): four-step decomposition with all_to_all transposes.
    Input/output are NATURAL order, sharded contiguously along the mesh axis.
    Requires D | 2^k1 and D | 2^k2 (k1 = ceil(k/2)). Bit-exact vs ntt()/intt()
    (tests/test_ntt.py::test_mesh_four_step)."""
    from jax.sharding import NamedSharding, PartitionSpec as Pspec

    spec = _spec(field)
    n = 1 << k
    k1 = (k + 1) // 2
    k2 = k - k1
    n1, n2 = 1 << k1, 1 << k2
    D = mesh.shape[axis]
    assert n1 % D == 0 and n2 % D == 0, (
        f"four-step NTT needs D | n1 and D | n2 (D={D}, n1={n1}, n2={n2})")
    tw = jnp.asarray(_four_step_twiddles(k, k1, field, inverse))

    def local(a_blk, tw_blk):
        # a_blk: (n1/D, n2, 16) row shard of A = x.reshape(n1, n2, 16)
        # -> column shard (n1, n2/D, 16): one all_to_all transpose
        a = jax.lax.all_to_all(a_blk, axis, split_axis=1, concat_axis=0,
                               tiled=True)
        # length-n1 column NTTs (local): put the transform on axis -2
        a = jnp.swapaxes(a, 0, 1)  # (n2/D, n1, 16)
        a = _ntt_core(a, k1, field, inverse)
        a = jnp.swapaxes(a, 0, 1)  # (n1, n2/D, 16)
        a = L.mont_mul(a, tw_blk, spec)
        # -> row shard (n1/D, n2, 16): second all_to_all transpose
        a = jax.lax.all_to_all(a, axis, split_axis=0, concat_axis=1, tiled=True)
        # length-n2 row NTTs (local)
        # (inverse: the sub-NTTs scaled by 1/n1 and 1/n2 — 1/n total)
        a = _ntt_core(a, k2, field, inverse)
        # output X[j1 + n1*j2] = D[j1, j2]: transpose to column shards and
        # flatten locally — device d then holds the contiguous X block d
        a = jax.lax.all_to_all(a, axis, split_axis=1, concat_axis=0, tiled=True)
        return jnp.swapaxes(a, 0, 1).reshape(n1 * (n2 // D), L.NLIMBS)

    fn = jax.jit(jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(Pspec(axis), Pspec(None, axis)),
        out_specs=Pspec(axis),
    ))
    out = fn(x.reshape(n1, n2, L.NLIMBS), tw)
    return out.reshape(n, L.NLIMBS)


@partial(jax.jit, static_argnames=("k", "field"))
def _coset_scale_jit(x, cpow, k: int, field: str):
    return L.mont_mul(x, cpow, _spec(field))


def _coset_powers_dev(k: int, field: str, g: int, inverse: bool):
    key = ("cpow", k, field, g, inverse)
    t = _DEV_TABLES.get(key)
    if t is None:
        t = jnp.asarray(_coset_powers(k, field, g, inverse))
        if isinstance(t, jax.core.Tracer):
            return t  # see _pease_twiddles_dev
        _DEV_TABLES[key] = t
    return t


def coset_ntt(coeffs, k: int, field: str = "fp", g: int = 5):
    """Evaluations over the coset g*H (H = 2^k subgroup). Plain function:
    the scale and the rolled NTT are separate jits taking their tables as
    arguments, so no multi-MB table ever embeds into an executable."""
    scaled = _coset_scale_jit(coeffs, _coset_powers_dev(k, field, g, False),
                              k, field)
    return _ntt_core(scaled, k, field, False)


def coset_intt(evals, k: int, field: str = "fp", g: int = 5):
    coeffs = _ntt_core(evals, k, field, True)
    return _coset_scale_jit(coeffs, _coset_powers_dev(k, field, g, True),
                            k, field)
