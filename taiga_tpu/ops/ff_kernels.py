"""Fused Pallas TPU kernels for 255-bit field and curve arithmetic.

Limb-major layout: a field element batch is a (16, B) uint32 tensor — limbs
on the sublane axis, the element batch on the 128-wide lane axis — so every
limb operation is a cheap sublane shift and the batch fills all vector lanes.

The point of these kernels is FUSION: a complete Jacobian addition is ~25
Montgomery multiplications; done as stock XLA ops each materializes (B, 16)
intermediates through HBM (the measured cost was ~60x the VPU floor). Here
the whole formula stays in VMEM/registers inside one kernel.

On non-TPU backends the kernels run in Pallas interpret mode (slow but
correct) — tests exercise the same code path the TPU runs.

Used by the Pippenger MSM (ops/msm.py). Reference for the math being
accelerated: the halo2 IPA commitment MSMs (taiga_halo2's `create_proof`
dominant cost, see SURVEY.md §6).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import limbs as L

W = 16
NLIMBS = 16
MASK = 0xFFFF  # python int: kernels cannot capture jnp scalars
LANES = 128


def _use_pallas() -> bool:
    """Pallas lowering only on real TPU; elsewhere the same kernel math runs
    as plain XLA ops (bit-identical, far faster than pallas interpret mode).

    JAX_PLATFORMS=cpu wins even when a TPU plugin has pinned itself into the
    platform list (the axon sitecustomize pins "axon,cpu" at interpreter
    start, so computations placed on cpu devices — tests, the multi-chip
    dryrun mesh — would otherwise trace pallas calls that cannot lower on
    CPU). TAIGA_FORCE_PLAIN_OPS=1 forces the plain-XLA path explicitly."""
    import os

    if os.environ.get("TAIGA_FORCE_PLAIN_OPS") == "1":
        return False
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        return False
    return jax.default_backend() == "tpu"


@lru_cache(maxsize=None)
def _consts(field: str):
    """Python-int constants (pallas kernels may not capture outside arrays;
    these are materialized as inline constants inside each kernel body)."""
    spec = L.FP if field == "fp" else L.FQ
    n_list = tuple(int(v) for v in spec.n_limbs)
    # n0inv is passed statically into every in-kernel helper, so its high
    # bits carry the field tag (both Pasta primes share the same low-16-bit
    # n0inv, so the value alone cannot distinguish them). Consumers of the
    # arithmetic value must mask with MASK.
    tag = 0x10000 if field == "fp" else 0x20000
    return n_list, int(spec.n0inv) | tag


def _field_by_n0inv(n0inv: int) -> str:
    assert n0inv & 0x30000, "untagged n0inv (must come from _consts)"
    return "fp" if n0inv & 0x10000 else "fq"


@lru_cache(maxsize=None)
def _fold_consts(field: str):
    """Constants for the MXU Montgomery fold (see _mm_fold):
    M[m, j] = byte m of (2^(8j) * R^-1 mod p)  (33 x 64, bf16-exact),
    mu bytes (Barrett mu = floor(2^518/p), 34), p bytes (32)."""
    spec = L.FP if field == "fp" else L.FQ
    p = spec.modulus
    rinv = pow(1 << 256, -1, p)
    M = np.zeros((33, 64), np.float32)
    for j in range(64):
        c = (1 << (8 * j)) * rinv % p
        for m in range(33):
            M[m, j] = (c >> (8 * m)) & 0xFF
    mu = (1 << 518) // p
    mu_b = np.asarray([(mu >> (8 * m)) & 0xFF for m in range(34)], np.uint32)
    p_b = np.asarray([(p >> (8 * m)) & 0xFF for m in range(32)], np.uint32)
    n17 = np.zeros(17, np.uint32)
    n17[:16] = spec.n_limbs
    return M, mu_b, p_b, n17


def _mm_impl() -> str:
    """"fold" = schoolbook product + MXU constant-matrix Montgomery fold +
    tiny Barrett tail; "cios" = interleaved CIOS (the original). Read at
    TRACE time; TAIGA_MM_IMPL overrides."""
    import os

    return os.environ.get("TAIGA_MM_IMPL", "cios")


def _n_col_host(field: str):
    n_list, _ = _consts(field)
    return np.asarray(n_list, np.uint32).reshape(NLIMBS, 1)


@lru_cache(maxsize=None)
def _mf_host(field: str):
    """The (33, 64) Montgomery-fold byte matrix as f32 (Mosaic forbids
    in-kernel array constants, so kernels take it as a VMEM input)."""
    return np.ascontiguousarray(_fold_consts(field)[0], np.float32)


# ---------------------------------------------------------------------------
# in-kernel field helpers (operate on (16, B) jnp values)
# ---------------------------------------------------------------------------


def _carry16(t):
    """Propagate carries over the 16 sublane rows -> canonical + carry row."""
    rows = [t[i] for i in range(t.shape[0])]
    out = []
    carry = jnp.zeros_like(rows[0])
    for r in rows:
        v = r + carry
        out.append(v & MASK)
        carry = v >> W
    return jnp.stack(out), carry


def _sub_n(a16, n_col):
    """a - n with borrow; a16 (16, B) canonical."""
    out = []
    borrow = jnp.zeros_like(a16[0])
    for i in range(NLIMBS):
        d = a16[i] - n_col[i, 0] - borrow
        out.append(d & MASK)
        borrow = (d >> 31) & 1
    return jnp.stack(out), borrow


def _reduce(a16, hi, n_col):
    d, borrow = _sub_n(a16, n_col)
    ge = (borrow == 0) | (hi > 0)
    return jnp.where(ge[None, :], d, a16)


def _mm(a, b, n_col, n0inv, impl: str | None = None, mf=None):
    """Montgomery product of (16, B) canonical limb tensors: dispatches to
    the MXU fold implementation (_mm_fold) or interleaved CIOS (_mm_cios),
    chosen at trace time (`impl` or TAIGA_MM_IMPL). Both return a*b*R^-1
    mod p in canonical reduced form — bit-identical outputs. `mf` is the
    fold matrix ref (required inside pallas kernels; defaulted outside)."""
    if (impl or _mm_impl()) == "fold":
        return _mm_fold(a, b, n_col, _field_by_n0inv(n0inv), mf)
    return _mm_cios(a, b, n_col, n0inv)


def _mm_fold(a, b, n_col, field: str, mf=None):
    """a*b*R^-1 mod p via schoolbook product + one MXU matmul.

    1. full 512-bit product by product-scanning (16 VPU multiplies; the
       interleaved-CIOS reduction's other 16 multiplies disappear);
    2. Montgomery reduction as a LINEAR map over the product's 64 bytes:
       V = sum_j U_j * (2^(8j) R^-1 mod p) === T*R^-1 (mod p), evaluated as
       a (33x64)@(64,B) bf16 dot on the MXU (all values are integers
       < 2^24: exact in f32 accumulation);
    3. V < 2^14.1 * p, so a one-row Barrett step (mu = floor(2^518/p))
       brings it to [0, 4p); three conditional subtracts canonicalize.
    """
    Mf, mu_b, p_b, n17 = _fold_consts(field)
    if mf is None:
        mf = jnp.asarray(_mf_host(field))  # plain-XLA path only
    zero_row = jnp.zeros_like(a[0:1])

    # --- 1. schoolbook product: 33 loose u32 rows (base 2^16, < 2^21) ---
    t = jnp.concatenate([jnp.zeros_like(a), zero_row], 0)  # (17, B)
    out_rows = []
    for i in range(NLIMBS):
        p = a[i] * b  # (16, B) full u32 products
        plo = p & MASK
        phi = p >> W
        t = t + jnp.concatenate([plo, zero_row], 0) \
              + jnp.concatenate([zero_row, phi], 0)
        out_rows.append(t[0])
        t = jnp.concatenate([t[1:], zero_row], 0)
    loose = jnp.concatenate([jnp.stack(out_rows), t], 0)  # (33, B)

    # carry-propagate to canonical u16 rows; T < 2^512 so rows 32+ vanish
    t16 = []
    carry = jnp.zeros_like(loose[0])
    for i in range(32):
        v = loose[i] + carry
        t16.append(v & MASK)
        carry = v >> W
    # byte split -> (64, B) bf16 (exact: values < 256)
    tb = []
    for r in t16:
        tb.append(r & 0xFF)
        tb.append(r >> 8)
    # Mosaic has no direct u32->bf16 cast; go via int32/float32
    tbytes = jnp.stack(tb).astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)

    # --- 2. Montgomery fold on the MXU ---------------------------------
    v8 = jax.lax.dot_general(
        mf.astype(jnp.bfloat16), tbytes,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).astype(jnp.int32).astype(jnp.uint32)  # (33, B), < 64*255^2 < 2^22
    vb = []
    carry = jnp.zeros_like(v8[0])
    for i in range(33):
        v = v8[i] + carry
        vb.append(v & 0xFF)
        carry = v >> 8
    vb.append(carry)  # byte 33: V < 2^269.1

    # --- 3. tiny Barrett: qhat = floor((V >> 254) * mu / 2^264) ---------
    t_hi = (vb[31] >> 6) | (vb[32] << 2) | (vb[33] << 10)  # (B,) < 2^15.1
    qprod = [t_hi * jnp.uint32(int(m)) for m in mu_b]  # 34 rows < 2^23
    carry = jnp.zeros_like(t_hi)
    qb33 = None
    for i in range(34):
        v = qprod[i] + carry
        if i == 33:
            qb33 = v & 0xFF
        carry = v >> 8
    qhat = qb33 | (carry << 8)  # (B,) < 2^15.1
    # D = V - qhat*p in [0, 4p), computed loose-signed mod 2^264
    d = [vb[i].astype(jnp.int32) for i in range(33)]
    for i in range(32):
        d[i] = d[i] - (qhat * jnp.uint32(int(p_b[i]))).astype(jnp.int32)
    db = []
    carry = jnp.zeros_like(d[0])
    for i in range(33):
        v = d[i] + carry
        db.append((v & 0xFF).astype(jnp.uint32))
        carry = v >> 8  # arithmetic: signed borrow propagation
    # regroup to 17 u16 rows; three conditional subtracts of p
    r17 = jnp.stack([db[2 * i] | (db[2 * i + 1] << 8) for i in range(16)]
                    + [db[32]])
    for _ in range(3):
        sub = []
        borrow = jnp.zeros_like(r17[0])
        for i in range(17):
            dd = r17[i] - jnp.uint32(int(n17[i])) - borrow
            sub.append(dd & MASK)
            borrow = (dd >> 31) & 1
        r17 = jnp.where((borrow == 0)[None], jnp.stack(sub), r17)
    return r17[:16]


def _mm_cios(a, b, n_col, n0inv):
    """Interleaved CIOS Montgomery product (the pre-round-5 _mm).

    CIOS with the inter-iteration row shift FOLDED into one 16-row
    concatenate: the low halves of the limb products land on the
    pre-shift rows, the high halves land directly on the post-shift rows
    (offset j+1 before the shift IS offset j after), so each iteration is
    2 vector multiplies, 4 adds and ONE shuffle — the previous form built
    four 17-row concatenates per iteration and the copies dominated the
    kernel's cycle count."""
    zero_row = jnp.zeros_like(a[0:1])
    t = jnp.zeros_like(a)  # (16, B) accumulator, offsets 0..15
    for i in range(NLIMBS):
        p = a[i] * b  # (16, B) u32 products
        plo = p & MASK
        phi = p >> W
        m = (((t[0] + plo[0]) & MASK) * (n0inv & MASK)) & MASK
        p2 = m * n_col
        p2lo = p2 & MASK
        p2hi = p2 >> W
        s = t + plo + p2lo  # row 0 low half is 0 by construction of m
        carry0 = s[0] >> W
        # drop row 0 (shift down), carry into the new row 0; the high
        # halves were destined for pre-shift offsets 1..16 = post-shift
        # rows 0..15, so they add in directly
        t = jnp.concatenate([(s[1] + carry0)[None], s[2:], zero_row], 0) \
            + phi + p2hi
    c16, carry = _carry16(t)
    return _reduce(c16, carry, n_col)


def _madd(a, b, n_col):
    s, carry = _carry16(a + b)
    return _reduce(s, carry, n_col)


def _msub(a, b, n_col):
    out = []
    borrow = jnp.zeros_like(a[0])
    for i in range(NLIMBS):
        d = a[i] - b[i] - borrow
        out.append(d & MASK)
        borrow = (d >> 31) & 1
    diff = jnp.stack(out)
    fixed, _ = _carry16(diff + jnp.where(borrow[None, :] > 0, n_col, jnp.uint32(0)))
    return fixed


def _is_zero(a):
    return jnp.all(a == 0, axis=0)


def _mul15(t, n_col):
    """15*t via 16t - t (4 doublings + a subtract) — b3 = 3b = 15 for both
    Pasta curves (b = 5)."""
    d = _madd(t, t, n_col)
    d = _madd(d, d, n_col)
    d = _madd(d, d, n_col)
    d = _madd(d, d, n_col)
    return _msub(d, t, n_col)


def _ec_add_proj_core(x1, y1, z1, x2, y2, z2, n_col, n0inv, mf=None):
    """Complete homogeneous-projective addition for a = 0, b3 = 15
    (Renes-Costello-Batina 2015, Algorithm 7). Handles identity (0:1:0) and
    doubling with NO case analysis — 12 muls + 2 cheap b3 scalings."""
    mm = lambda a, b: _mm(a, b, n_col, n0inv, mf=mf)
    add = lambda a, b: _madd(a, b, n_col)
    sub = lambda a, b: _msub(a, b, n_col)

    t0 = mm(x1, x2)
    t1 = mm(y1, y2)
    t2 = mm(z1, z2)
    t3 = mm(add(x1, y1), add(x2, y2))
    t3 = sub(t3, add(t0, t1))
    t4 = mm(add(y1, z1), add(y2, z2))
    t4 = sub(t4, add(t1, t2))
    x3 = mm(add(x1, z1), add(x2, z2))
    y3 = sub(x3, add(t0, t2))
    x3 = add(t0, t0)
    t0 = add(x3, t0)
    t2 = _mul15(t2, n_col)
    z3 = add(t1, t2)
    t1 = sub(t1, t2)
    y3 = _mul15(y3, n_col)
    x3 = sub(mm(t3, t1), mm(t4, y3))
    y3 = add(mm(y3, t0), mm(t1, z3))
    t0 = mm(t0, t3)
    z3 = add(mm(z3, t4), t0)
    return x3, y3, z3


def _ec_add_core(x1, y1, z1, x2, y2, z2, n_col, n0inv, mf=None):
    """Complete Jacobian addition (compute-both-and-select), in-kernel."""
    mm = lambda a, b: _mm(a, b, n_col, n0inv, mf=mf)
    add = lambda a, b: _madd(a, b, n_col)
    sub = lambda a, b: _msub(a, b, n_col)

    z1z1 = mm(z1, z1)
    z2z2 = mm(z2, z2)
    u1 = mm(x1, z2z2)
    u2 = mm(x2, z1z1)
    s1 = mm(y1, mm(z2, z2z2))
    s2 = mm(y2, mm(z1, z1z1))
    h = sub(u2, u1)
    r = sub(s2, s1)
    hh = mm(h, h)
    hhh = mm(h, hh)
    v = mm(u1, hh)
    r2 = mm(r, r)
    x3 = sub(sub(r2, hhh), add(v, v))
    y3 = sub(mm(r, sub(v, x3)), mm(s1, hhh))
    z3 = mm(mm(z1, z2), h)

    # doubling path (a = 0)
    a_ = mm(x1, x1)
    b_ = mm(y1, y1)
    c_ = mm(b_, b_)
    xb = add(x1, b_)
    d_ = sub(sub(mm(xb, xb), a_), c_)
    d_ = add(d_, d_)
    e_ = add(add(a_, a_), a_)
    f_ = mm(e_, e_)
    dx = sub(f_, add(d_, d_))
    c8 = add(add(c_, c_), add(c_, c_))
    c8 = add(c8, c8)
    dy = sub(mm(e_, sub(d_, dx)), c8)
    yz = mm(y1, z1)
    dz = add(yz, yz)

    p_inf = _is_zero(z1)
    q_inf = _is_zero(z2)
    h_zero = _is_zero(h)
    r_zero = _is_zero(r)
    both = (~p_inf) & (~q_inf)
    is_double = both & h_zero & r_zero
    is_cancel = both & h_zero & (~r_zero)

    xo = jnp.where(is_double[None], dx, x3)
    yo = jnp.where(is_double[None], dy, y3)
    zo = jnp.where(is_double[None], dz, z3)
    zo = jnp.where(is_cancel[None], jnp.uint32(0), zo)
    xo = jnp.where(p_inf[None], x2, jnp.where(q_inf[None], x1, xo))
    yo = jnp.where(p_inf[None], y2, jnp.where(q_inf[None], y1, yo))
    zo = jnp.where(p_inf[None], z2, jnp.where(q_inf[None], z1, zo))
    return xo, yo, zo


# ---------------------------------------------------------------------------
# pallas entry points
# ---------------------------------------------------------------------------

BT = 512  # lanes per block

# the modulus-limb column is replicated to every grid step
_NC_SPEC = pl.BlockSpec((NLIMBS, 1), lambda i: (0, 0), memory_space=pltpu.VMEM)
# the Montgomery-fold matrix, likewise replicated
_MF_SPEC = pl.BlockSpec((33, 64), lambda i: (0, 0), memory_space=pltpu.VMEM)


def _grid_call(kernel, n_in, n_out, B):
    bt = min(BT, B)
    assert B % bt == 0
    spec = pl.BlockSpec((NLIMBS, bt), lambda i: (0, i), memory_space=pltpu.VMEM)
    lane_spec = pl.BlockSpec((1, bt), lambda i: (0, i), memory_space=pltpu.VMEM)
    return partial(
        pl.pallas_call,
        kernel,
        grid=(B // bt,),
    ), spec, lane_spec


@partial(jax.jit, static_argnames=("field",))
def mont_mul_lm(a, b, field: str = "fq"):
    """(16, B) x (16, B) Montgomery product."""
    B = a.shape[1]
    _, n0inv = _consts(field)
    if not _use_pallas():
        return _mm(a, b, jnp.asarray(_n_col_host(field)), n0inv)

    def kernel(nc_ref, mf_ref, a_ref, b_ref, o_ref):
        o_ref[:, :] = _mm(a_ref[:, :], b_ref[:, :], nc_ref[:, :], n0inv,
                          mf=mf_ref[:, :])

    call, spec, _ = _grid_call(kernel, 2, 1, B)
    return call(
        out_shape=jax.ShapeDtypeStruct((NLIMBS, B), jnp.uint32),
        in_specs=[_NC_SPEC, _MF_SPEC, spec, spec],
        out_specs=spec,
    )(jnp.asarray(_n_col_host(field)), jnp.asarray(_mf_host(field)), a, b)


@partial(jax.jit, static_argnames=("field",))
def ec_add_select_lm(x1, y1, z1, x2, y2, z2, sel, field: str = "fq"):
    """out = sel ? P1 + P2 : P1, lane-wise. Points (16, B); sel (1, B) u32."""
    B = x1.shape[1]
    _, n0inv = _consts(field)
    if not _use_pallas():
        nc = jnp.asarray(_n_col_host(field))
        x3, y3, z3 = _ec_add_core(x1, y1, z1, x2, y2, z2, nc, n0inv)
        m = sel[0, :] > 0
        return (
            jnp.where(m[None], x3, x1),
            jnp.where(m[None], y3, y1),
            jnp.where(m[None], z3, z1),
        )

    def kernel(nc_ref, mf_ref, x1r, y1r, z1r, x2r, y2r, z2r, sr, xo, yo, zo):
        x3, y3, z3 = _ec_add_core(
            x1r[:, :], y1r[:, :], z1r[:, :], x2r[:, :], y2r[:, :], z2r[:, :],
            nc_ref[:, :], n0inv, mf=mf_ref[:, :],
        )
        m = sr[0, :] > 0
        xo[:, :] = jnp.where(m[None], x3, x1r[:, :])
        yo[:, :] = jnp.where(m[None], y3, y1r[:, :])
        zo[:, :] = jnp.where(m[None], z3, z1r[:, :])

    call, spec, lane_spec = _grid_call(kernel, 7, 3, B)
    sh = jax.ShapeDtypeStruct((NLIMBS, B), jnp.uint32)
    return call(
        out_shape=(sh, sh, sh),
        in_specs=[_NC_SPEC, _MF_SPEC] + [spec] * 6 + [lane_spec],
        out_specs=(spec, spec, spec),
    )(jnp.asarray(_n_col_host(field)), jnp.asarray(_mf_host(field)),
      x1, y1, z1, x2, y2, z2, sel)


@partial(jax.jit, static_argnames=("field",))
def ec_add_lm(x1, y1, z1, x2, y2, z2, field: str = "fq"):
    """Complete Jacobian addition over (16, B) limb-major points."""
    B = x1.shape[1]
    _, n0inv = _consts(field)
    if not _use_pallas():
        nc = jnp.asarray(_n_col_host(field))
        return _ec_add_core(x1, y1, z1, x2, y2, z2, nc, n0inv)

    def kernel(nc_ref, mf_ref, x1r, y1r, z1r, x2r, y2r, z2r, xo, yo, zo):
        x3, y3, z3 = _ec_add_core(
            x1r[:, :], y1r[:, :], z1r[:, :], x2r[:, :], y2r[:, :], z2r[:, :],
            nc_ref[:, :], n0inv, mf=mf_ref[:, :],
        )
        xo[:, :] = x3
        yo[:, :] = y3
        zo[:, :] = z3

    call, spec, _ = _grid_call(kernel, 6, 3, B)
    sh = jax.ShapeDtypeStruct((NLIMBS, B), jnp.uint32)
    return call(
        out_shape=(sh, sh, sh),
        in_specs=[_NC_SPEC, _MF_SPEC] + [spec] * 6,
        out_specs=(spec, spec, spec),
    )(jnp.asarray(_n_col_host(field)), jnp.asarray(_mf_host(field)),
      x1, y1, z1, x2, y2, z2)


@partial(jax.jit, static_argnames=("field",))
def ec_add_proj_sel_lm(x1, y1, z1, x2, y2, z2, sel, field: str = "fq"):
    """Projective (RCB complete) add with lane select: sel ? P1+P2 : P1.
    Identity encoding is (0 : 1 : 0) — callers must normalize."""
    B = x1.shape[1]
    _, n0inv = _consts(field)
    if not _use_pallas():
        nc = jnp.asarray(_n_col_host(field))
        x3, y3, z3 = _ec_add_proj_core(x1, y1, z1, x2, y2, z2, nc, n0inv)
        m = sel[0, :] > 0
        return (
            jnp.where(m[None], x3, x1),
            jnp.where(m[None], y3, y1),
            jnp.where(m[None], z3, z1),
        )

    def kernel(nc_ref, mf_ref, x1r, y1r, z1r, x2r, y2r, z2r, sr, xo, yo, zo):
        x3, y3, z3 = _ec_add_proj_core(
            x1r[:, :], y1r[:, :], z1r[:, :], x2r[:, :], y2r[:, :], z2r[:, :],
            nc_ref[:, :], n0inv, mf=mf_ref[:, :],
        )
        m = sr[0, :] > 0
        xo[:, :] = jnp.where(m[None], x3, x1r[:, :])
        yo[:, :] = jnp.where(m[None], y3, y1r[:, :])
        zo[:, :] = jnp.where(m[None], z3, z1r[:, :])

    call, spec, lane_spec = _grid_call(kernel, 7, 3, B)
    sh = jax.ShapeDtypeStruct((NLIMBS, B), jnp.uint32)
    return call(
        out_shape=(sh, sh, sh),
        in_specs=[_NC_SPEC, _MF_SPEC] + [spec] * 6 + [lane_spec],
        out_specs=(spec, spec, spec),
    )(jnp.asarray(_n_col_host(field)), jnp.asarray(_mf_host(field)),
      x1, y1, z1, x2, y2, z2, sel)


@partial(jax.jit, static_argnames=("field",))
def ec_add_proj_lm(x1, y1, z1, x2, y2, z2, field: str = "fq"):
    """Projective (RCB complete) addition over (16, B) limb-major points."""
    B = x1.shape[1]
    _, n0inv = _consts(field)
    if not _use_pallas():
        nc = jnp.asarray(_n_col_host(field))
        return _ec_add_proj_core(x1, y1, z1, x2, y2, z2, nc, n0inv)

    def kernel(nc_ref, mf_ref, x1r, y1r, z1r, x2r, y2r, z2r, xo, yo, zo):
        x3, y3, z3 = _ec_add_proj_core(
            x1r[:, :], y1r[:, :], z1r[:, :], x2r[:, :], y2r[:, :], z2r[:, :],
            nc_ref[:, :], n0inv, mf=mf_ref[:, :],
        )
        xo[:, :] = x3
        yo[:, :] = y3
        zo[:, :] = z3

    call, spec, _ = _grid_call(kernel, 6, 3, B)
    sh = jax.ShapeDtypeStruct((NLIMBS, B), jnp.uint32)
    return call(
        out_shape=(sh, sh, sh),
        in_specs=[_NC_SPEC, _MF_SPEC] + [spec] * 6,
        out_specs=(spec, spec, spec),
    )(jnp.asarray(_n_col_host(field)), jnp.asarray(_mf_host(field)),
      x1, y1, z1, x2, y2, z2)


def ec_fold_shared_lm(gx_lo, gy_lo, gz_lo, gx_hi, gy_hi, gz_hi, scalar_limbs,
                      field: str = "fq"):
    """Dispatch wrapper: tiny folds on non-TPU backends run on host."""
    B = gx_lo.shape[1]
    if B <= 512 and jax.default_backend() != "tpu":
        return _fold_on_host(gx_lo, gy_lo, gz_lo, gx_hi, gy_hi, gz_hi,
                             scalar_limbs, field)
    return _ec_fold_shared_jit(gx_lo, gy_lo, gz_lo, gx_hi, gy_hi, gz_hi,
                               scalar_limbs, field=field)


def _fold_on_host(gx_lo, gy_lo, gz_lo, gx_hi, gy_hi, gz_hi, scalar_limbs, field):
    from ..crypto.curves import PallasPoint, VestaPoint

    curve = PallasPoint if field == "fp" else VestaPoint
    F = curve.FIELD
    spec = L.FP if field == "fp" else L.FQ

    def decode(x, y, z):
        xs = spec.array_from_mont(np.asarray(jax.device_get(x)).T)
        ys = spec.array_from_mont(np.asarray(jax.device_get(y)).T)
        zs = spec.array_from_mont(np.asarray(jax.device_get(z)).T)
        pts = []
        for X, Y, Z in zip(xs, ys, zs):
            if Z == 0:
                pts.append(curve.identity())
            else:
                zi = pow(Z, -1, F.MODULUS)
                pts.append(curve(F(X * zi % F.MODULUS), F(Y * zi % F.MODULUS)))
        return pts

    lo = decode(gx_lo, gy_lo, gz_lo)
    hi = decode(gx_hi, gy_hi, gz_hi)
    s_int = L.limbs_to_int(np.asarray(jax.device_get(scalar_limbs)).reshape(16))
    folded = [a + b * s_int for a, b in zip(lo, hi)]
    xs, ys, zs = [], [], []
    for p_ in folded:
        if p_.is_identity():
            xs.append(0); ys.append(1); zs.append(0)
        else:
            xs.append(p_.x.v); ys.append(p_.y.v); zs.append(1)
    return (
        jnp.asarray(np.asarray(spec.array_to_mont(xs)).T.copy()),
        jnp.asarray(np.asarray(spec.array_to_mont(ys)).T.copy()),
        jnp.asarray(np.asarray(spec.array_to_mont(zs)).T.copy()),
    )


@partial(jax.jit, static_argnames=("field",))
def _ec_fold_shared_jit(gx_lo, gy_lo, gz_lo, gx_hi, gy_hi, gz_hi, scalar_limbs,
                      field: str = "fq"):
    """IPA generator fold: G' = G_lo + [s] G_hi with ONE shared 255-bit
    scalar, fully inside one kernel (projective RCB adds; identity = (0:1:0)).
    scalar_limbs: (1, 16) plain 16-bit limbs. Points are PROJECTIVE."""
    B = gx_lo.shape[1]
    n_list, n0inv = _consts(field)
    spec = L.FP if field == "fp" else L.FQ

    def body(x_lo, y_lo, z_lo, x_hi, y_hi, z_hi, s_row, nc, one_col, mf=None):
        accx = jnp.zeros_like(x_lo)
        accy = jnp.broadcast_to(one_col, x_lo.shape)
        accz = jnp.zeros_like(z_lo)

        def step(i, st):
            ax, ay, az, bx, by, bz = st
            # dynamic_slice is not lowerable in Mosaic: select the limb with
            # 16 static comparisons instead
            j = i // 16
            limb = s_row[0, 0] * 0
            for jj in range(16):
                limb = jnp.where(j == jj, s_row[0, jj], limb)
            bit = (limb >> (i % 16)) & 1
            nx, ny, nz = _ec_add_proj_core(ax, ay, az, bx, by, bz, nc, n0inv,
                                           mf=mf)
            keep = (bit > 0)
            ax = jnp.where(keep, nx, ax)
            ay = jnp.where(keep, ny, ay)
            az = jnp.where(keep, nz, az)
            bx, by, bz = _ec_add_proj_core(bx, by, bz, bx, by, bz, nc, n0inv,
                                           mf=mf)
            return ax, ay, az, bx, by, bz

        accx, accy, accz, _, _, _ = jax.lax.fori_loop(
            0, 255, step, (accx, accy, accz, x_hi, y_hi, z_hi)
        )
        return _ec_add_proj_core(x_lo, y_lo, z_lo, accx, accy, accz, nc, n0inv,
                                 mf=mf)

    one_host = jnp.asarray(np.asarray(spec.one_mont, np.uint32).reshape(NLIMBS, 1))
    if not _use_pallas() or B < 128:
        nc = jnp.asarray(_n_col_host(field))
        return body(gx_lo, gy_lo, gz_lo, gx_hi, gy_hi, gz_hi, scalar_limbs, nc,
                    one_host)

    def kernel(nc_ref, one_ref, mf_ref, xl, yl, zl, xh, yh, zh, sr, xo, yo, zo):
        x3, y3, z3 = body(
            xl[:, :], yl[:, :], zl[:, :], xh[:, :], yh[:, :], zh[:, :],
            sr[:, :], nc_ref[:, :], one_ref[:, :], mf=mf_ref[:, :],
        )
        xo[:, :] = x3
        yo[:, :] = y3
        zo[:, :] = z3

    bt = min(BT, B)
    spec_b = pl.BlockSpec((NLIMBS, bt), lambda i: (0, i), memory_space=pltpu.VMEM)
    s_spec = pl.BlockSpec((1, NLIMBS), lambda i: (0, 0), memory_space=pltpu.VMEM)
    sh = jax.ShapeDtypeStruct((NLIMBS, B), jnp.uint32)
    return pl.pallas_call(
        kernel,
        grid=(B // bt,),
        out_shape=(sh, sh, sh),
        in_specs=[_NC_SPEC, _NC_SPEC, _MF_SPEC] + [spec_b] * 6 + [s_spec],
        out_specs=(spec_b, spec_b, spec_b),
    )(jnp.asarray(_n_col_host(field)), one_host, jnp.asarray(_mf_host(field)),
      gx_lo, gy_lo, gz_lo, gx_hi, gy_hi, gz_hi, scalar_limbs)
