"""Vectorized 255-bit prime-field arithmetic as 16x16-bit limb tensors.

TPU-native big-field design (SURVEY.md §7 "hard parts" #1):
  * an Fp/Fq element is 16 little-endian 16-bit limbs stored in uint32;
  * products of limbs are full 32-bit values; partial-product accumulation
    splits each product into (lo, hi) 16-bit halves so uint32 accumulators
    never overflow (16 terms * 2^16 < 2^21 per accumulator);
  * modular multiplication is word-wise Montgomery (R = 2^256, CIOS-style),
    so elements are kept in Montgomery form throughout kernels;
  * everything is shape-(... , 16) and vmappable; the batch dimension is the
    TPU lane dimension.

No data-dependent control flow: conditional subtracts are borrow-select.
Bit-exact against `taiga_tpu.crypto.fields` (tests/test_limbs.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..crypto.fields import Fp, Fq

W = 16  # limb width in bits
NLIMBS = 16  # 256 bits total
MASK = (1 << W) - 1
DTYPE = jnp.uint32


def int_to_limbs(v: int) -> np.ndarray:
    return np.frombuffer(v.to_bytes(32, "little"), dtype="<u2").astype(np.uint32)


def limbs_to_int(l) -> int:
    l = np.asarray(l).reshape(NLIMBS)
    return int.from_bytes(l.astype("<u2").tobytes(), "little")


def ints_to_limbs(vs) -> np.ndarray:
    """[N ints] -> (N, 16) uint32 (via a single bytes buffer; fast)."""
    buf = b"".join(v.to_bytes(32, "little") for v in vs)
    return np.frombuffer(buf, dtype="<u2").astype(np.uint32).reshape(len(vs), NLIMBS)


# --- packed transfers --------------------------------------------------------
# A (..., 16)-u32 limb tensor carries 16-bit values, so host<->device copies
# waste half their bytes. Packing two limbs per u32 halves every transfer —
# which matters when the device sits behind a network tunnel (axon) where the
# 23 MB coefficient pull alone cost ~2.2 s/proof. The packed (..., 8)-u32
# little-endian byte stream IS the canonical 32-byte field encoding, so the
# host side converts with a pure numpy view (no per-element work).


def pack_limbs(a):
    """Device (..., 16) u32 16-bit limbs -> (..., 8) u32 packed."""
    return a[..., 0::2] | (a[..., 1::2] << jnp.uint32(W))


def unpack_limbs(p):
    """Device (..., 8) u32 packed -> (..., 16) u32 16-bit limbs."""
    lo = p & jnp.uint32(MASK)
    hi = p >> jnp.uint32(W)
    return jnp.stack([lo, hi], axis=-1).reshape(p.shape[:-1] + (NLIMBS,))


def ints_to_packed(vs) -> np.ndarray:
    """[N ints] -> (N, 8) u32 packed (raw 32-byte LE view; no widening)."""
    buf = b"".join(v.to_bytes(32, "little") for v in vs)
    return np.frombuffer(buf, dtype="<u4").reshape(len(vs), NLIMBS // 2).copy()


def packed_to_u64(p: np.ndarray) -> np.ndarray:
    """Host (..., 8) u32 packed -> (..., 4) u64 (pure byte view)."""
    p = np.ascontiguousarray(p, dtype="<u4")
    return p.view("<u8").reshape(p.shape[:-1] + (4,))


def limbs_to_ints(a) -> list[int]:
    a = np.asarray(jax.device_get(a))
    flat = a.reshape(-1, NLIMBS).astype("<u2")
    buf = flat.tobytes()
    return [int.from_bytes(buf[i * 32 : (i + 1) * 32], "little") for i in range(flat.shape[0])]


class FieldSpec:
    """Per-modulus precomputed constants for limb arithmetic."""

    def __init__(self, modulus: int):
        self.modulus = modulus
        self.n_limbs = int_to_limbs(modulus)
        self.n0inv = (-pow(modulus, -1, 1 << W)) % (1 << W)  # -p^-1 mod 2^16
        self.r = (1 << (W * NLIMBS)) % modulus  # R mod p
        self.r2 = (self.r * self.r) % modulus  # R^2 mod p (to_mont factor)
        self.r2_limbs = int_to_limbs(self.r2)
        self.one_mont = int_to_limbs(self.r)  # 1 in Montgomery form
        self.one_plain = int_to_limbs(1)
        self.zero = np.zeros(NLIMBS, dtype=np.uint32)

    # --- host-side conversion helpers (exactness oracle boundary) -----
    def to_mont_host(self, v: int) -> np.ndarray:
        return int_to_limbs((v * self.r) % self.modulus)

    def from_mont_host(self, limbs) -> int:
        rinv = pow(self.r, -1, self.modulus)
        return (limbs_to_int(limbs) * rinv) % self.modulus

    def array_to_mont(self, vs: list[int]) -> np.ndarray:
        return ints_to_limbs([(v * self.r) % self.modulus for v in vs])

    def array_from_mont(self, a) -> list[int]:
        rinv = pow(self.r, -1, self.modulus)
        return [(v * rinv) % self.modulus for v in limbs_to_ints(a)]


FP = FieldSpec(Fp.MODULUS)
FQ = FieldSpec(Fq.MODULUS)


# ---------------------------------------------------------------------------
# Core limb ops (all pure jnp; shapes (..., 16) uint32)
# ---------------------------------------------------------------------------


def _carry_prop_vec(t):
    """Ripple-carry a loose limb tensor (..., K) into canonical 16-bit limbs.

    lax.scan over the limb axis (carries are inherently serial) — the rolled
    loop keeps the emitted HLO tiny, which matters because every field op in
    a gate-evaluation graph instantiates this. Returns (canonical (..., K),
    final carry (...,))."""
    tt = jnp.moveaxis(t, -1, 0)

    def step(carry, v):
        s = v + carry
        return s >> W, s & MASK

    # zero carry derived from the input so shard_map varying axes propagate
    carry0 = tt[0] ^ tt[0]
    carry, out = jax.lax.scan(step, carry0, tt)
    return jnp.moveaxis(out, 0, -1), carry


def _sub_n_borrow(a, n_limbs):
    """(a - n, borrow): canonical (..., K) minus the K-limb constant n."""
    n = jnp.asarray(n_limbs, DTYPE)
    k = a.shape[-1]
    if n.shape[0] < k:
        n = jnp.pad(n, (0, k - n.shape[0]))
    tt = jnp.moveaxis(a, -1, 0)

    def step(borrow, xs):
        v, ni = xs
        d = v - ni - borrow
        return (d >> 31) & 1, d & MASK

    borrow, out = jax.lax.scan(step, tt[0] ^ tt[0], (tt, n))
    return jnp.moveaxis(out, 0, -1), borrow


def _sub_n_vec(a, n_limbs):
    return _sub_n_borrow(a, n_limbs)[0]


def _ge_n(a, n_limbs):
    """a >= n for canonical limb tensors: no borrow out of (a - n)."""
    return _sub_n_borrow(a, n_limbs)[1] == 0


def _reduce_once(s, carry, spec: FieldSpec):
    """Conditional subtract: s (canonical limbs) + carry*2^256 reduced mod p
    assuming s + carry*2^256 < 2p."""
    d, borrow = _sub_n_borrow(s, spec.n_limbs)
    ge = (borrow == 0) | (carry > 0)
    return jnp.where(ge[..., None], d, s)


def add(a, b, spec: FieldSpec):
    """(a + b) mod p, canonical limbs in/out."""
    s, carry = _carry_prop_vec(a + b)
    return _reduce_once(s, carry, spec)


def sub(a, b, spec: FieldSpec):
    """(a - b) mod p."""
    bb = jnp.broadcast_to(b, jnp.broadcast_shapes(a.shape, b.shape))
    aa = jnp.broadcast_to(a, bb.shape)
    ta = jnp.moveaxis(aa, -1, 0)
    tb = jnp.moveaxis(bb, -1, 0)

    def step(borrow, xs):
        va, vb = xs
        d = va - vb - borrow
        return (d >> 31) & 1, d & MASK

    borrow, out = jax.lax.scan(step, (ta[0] ^ tb[0]) & jnp.uint32(0), (ta, tb))
    diff = jnp.moveaxis(out, 0, -1)
    n = jnp.asarray(spec.n_limbs, DTYPE)
    fixed, _ = _carry_prop_vec(
        diff + jnp.where(borrow[..., None] > 0, n, jnp.zeros_like(n))
    )
    return fixed


def neg(a, spec: FieldSpec):
    return sub(jnp.zeros_like(a), a, spec)


def mont_mul(a, b, spec: FieldSpec):
    """Montgomery product: a*b*R^-1 mod p. Inputs/outputs canonical 16-bit limbs.

    Word-wise CIOS on a loose accumulator of NLIMBS+1 uint32 limbs, with the
    inner products vectorized over the limb dimension. Loose limbs grow by at
    most 4*(2^16-1) per outer iteration (two lo + two hi halves), so after 16
    iterations magnitudes stay < 2^23: no intermediate normalization, and
    `value mod 2^16 == t[...,0] mod 2^16` holds throughout.
    """
    n_vec = jnp.asarray(spec.n_limbs, DTYPE)
    n0inv = spec.n0inv

    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    nb = len(shape)
    pad_hi = [(0, 0)] * nb + [(1, 0)]  # shift up one limb
    pad_lo = [(0, 0)] * nb + [(0, 1)]  # keep aligned, widen to 17
    a_b = jnp.broadcast_to(a, shape + (NLIMBS,))
    b_b = jnp.broadcast_to(b, shape + (NLIMBS,))
    # derive zeros from BOTH inputs so loop carries keep the union of the
    # inputs' varying manual axes under shard_map (fresh jnp.zeros would be
    # unvarying; deriving from only one input breaks when the other is the
    # sharded operand)
    zero_tail = (a_b[..., :1] ^ b_b[..., :1]) & jnp.uint32(0)

    def body(i, t):
        ai = jax.lax.dynamic_slice_in_dim(a_b, i, 1, axis=-1)  # (..., 1)
        p_ = ai * b_b  # (..., 16) full 32-bit products
        t = t + jnp.pad(p_ & MASK, pad_lo) + jnp.pad(p_ >> W, pad_hi)
        m = ((t[..., 0] & MASK) * n0inv) & MASK
        p2 = m[..., None] * n_vec
        t = t + jnp.pad(p2 & MASK, pad_lo) + jnp.pad(p2 >> W, pad_hi)
        # shift one limb; t[...,0]'s low 16 bits are zero as a value
        carry = t[..., 0:1] >> W
        return jnp.concatenate([t[..., 1:2] + carry, t[..., 2:], zero_tail], axis=-1)

    t0 = jnp.concatenate([(a_b ^ b_b) & jnp.uint32(0), zero_tail], axis=-1)
    t = jax.lax.fori_loop(0, NLIMBS, body, t0)
    out, carry = _carry_prop_vec(t)
    hi = out[..., NLIMBS] + carry  # must be 0: result < 2p < 2^256
    out = out[..., :NLIMBS]
    return _reduce_once(out, hi, spec)


def mont_square(a, spec: FieldSpec):
    return mont_mul(a, a, spec)


def to_mont(a, spec: FieldSpec):
    r2 = jnp.broadcast_to(jnp.asarray(spec.r2_limbs, DTYPE), a.shape)
    return mont_mul(a, r2, spec)


def from_mont(a, spec: FieldSpec):
    one = jnp.broadcast_to(jnp.asarray(spec.one_plain, DTYPE), a.shape)
    return mont_mul(a, one, spec)


def mont_pow(a, e: int, spec: FieldSpec):
    """a^e (a in Montgomery form), square-and-multiply with static exponent."""
    result = jnp.broadcast_to(jnp.asarray(spec.one_mont, DTYPE), a.shape)
    base = a
    while e:
        if e & 1:
            result = mont_mul(result, base, spec)
        e >>= 1
        if e:
            base = mont_square(base, spec)
    return result


def mont_inv(a, spec: FieldSpec):
    """Batched inversion via Fermat (a^(p-2)); a in Montgomery form.

    Square-and-multiply as ONE lax.scan over the exponent bits (MSB-first)
    so the emitted HLO holds two mont_muls, not ~380 chained ones — the
    unrolled form made XLA-CPU compiles of table-normalization graphs take
    tens of minutes."""
    e = spec.modulus - 2
    nbits = e.bit_length()
    bits = jnp.asarray(
        np.array([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], np.uint32)
    )
    one = jnp.broadcast_to(jnp.asarray(spec.one_mont, DTYPE), a.shape)

    def body(r, bit):
        r = mont_mul(r, r, spec)
        rm = mont_mul(r, a, spec)
        return jnp.where((bit > 0), rm, r), None

    out, _ = jax.lax.scan(body, one, bits)
    return out


def select(cond, a, b):
    """cond ? a : b over limb tensors; cond shape broadcastable to batch."""
    return jnp.where(cond[..., None], a, b)


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


@partial(jax.jit, static_argnames=("op", "field"))
def _jit_binop(a, b, op: str, field: str):
    spec = FP if field == "fp" else FQ
    if op == "add":
        return add(a, b, spec)
    if op == "sub":
        return sub(a, b, spec)
    if op == "mul":
        return mont_mul(a, b, spec)
    raise ValueError(op)


def batch_op(op: str, a, b, field: str = "fp"):
    """Convenience jitted entry for tests/benches."""
    return _jit_binop(a, b, op, field)
