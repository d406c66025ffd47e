"""Pippenger multi-scalar multiplication as a batched TPU kernel.

MSM(points, scalars) = sum_i [s_i] P_i — the prover's dominant EC cost
(polynomial commitments over Vesta; delta commitments over Pallas).

TPU-native bucket method (no data-dependent control flow, SURVEY.md §7):
  * scalars arrive as (N, 16) plain 16-bit limb tensors; window width c
    divides 16 so window digits are bit-slices of the limbs;
  * per window (lax.scan over the 256/c windows):
      - argsort the digits, gather points into sorted order;
      - segmented Hillis-Steele suffix reduction over lanes (lax.fori_loop of
        log2 N rounds of complete Jacobian adds, masked on equal digits and
        no-wraparound) — each digit-run head then holds its bucket sum;
      - bucket extraction via searchsorted (2^c lanes);
      - weighted sum  sum_j j*B_j  via the bit-decomposition of j: the c
        bit-masked copies reduce in ONE fori tree over a (c, 2^c) lane array,
        then a Horner double-and-add combines the bits;
  * window results combine with a c-doubling Horner chain (lax.scan).

All loops are lax control flow: the compiled graph stays small (the earlier
fully-unrolled formulation produced >100k-op graphs that took minutes to
compile). Differentially tested against host scalar-mul sums (tests/test_ec.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import ec
from . import limbs as L

WINDOW_BITS = 8


def scalars_to_limbs(scalars: list[int]) -> np.ndarray:
    """Plain (non-Montgomery) 16-bit limb array (N, 16) from int scalars."""
    return L.ints_to_limbs(list(scalars))


def _digits_all(scalar_limbs, c: int):
    """(N, 16) limbs -> (n_windows, N) int32 window digits, little-endian."""
    assert 16 % c == 0
    per_limb = 16 // c
    rows = []
    for w in range(16 * per_limb):
        limb = scalar_limbs[:, w // per_limb].astype(jnp.int32)
        shift = c * (w % per_limb)
        rows.append((limb >> shift) & ((1 << c) - 1))
    return jnp.stack(rows)


def _roll_pts(pts, shift, axis):
    return tuple(jnp.roll(t, shift, axis=axis) for t in pts)


def _window_reduce(pts_sorted, d, spec, c: int, n: int):
    """Bucket-accumulate one window; returns the window's partial sum point."""
    x, y, z = pts_sorted
    # digit 0 contributes nothing: mask those lanes to identity
    z = jnp.where((d == 0)[..., None], jnp.zeros_like(z), z)
    idx = jnp.arange(n)
    logn = max(1, n.bit_length() - 1)

    def seg_body(r, pts):
        s = 1 << r
        neighbor = _roll_pts(pts, -s, 0)
        same = (idx + s < n) & (d == jnp.roll(d, -s))
        added = ec.ec_add(pts, neighbor, spec)
        return ec.ec_select(same, added, pts)

    x, y, z = jax.lax.fori_loop(0, logn, lambda r, p: seg_body(r, p), (x, y, z))

    # bucket heads: first occurrence of each digit value
    nbuckets = 1 << c
    targets = jnp.arange(nbuckets, dtype=d.dtype)
    pos = jnp.clip(jnp.searchsorted(d, targets), 0, n - 1)
    present = jnp.take(d, pos) == targets
    bx = jnp.take(x, pos, axis=0)
    by = jnp.take(y, pos, axis=0)
    bz = jnp.where(present[..., None], jnp.take(z, pos, axis=0), 0)

    # weighted sum over buckets: sum_j j * B_j via bits of j, one fused tree
    bit_masks = ((targets[None, :] >> jnp.arange(c)[:, None]) & 1) > 0  # (c, 2^c)
    tx = jnp.broadcast_to(bx[None], (c,) + bx.shape)
    ty = jnp.broadcast_to(by[None], (c,) + by.shape)
    tz = jnp.where(bit_masks[..., None], bz[None], 0)

    def tree_body(r, pts):
        s = 1 << r
        neighbor = _roll_pts(pts, -s, 1)
        return ec.ec_add(pts, neighbor, spec)

    tx, ty, tz = jax.lax.fori_loop(0, c, tree_body, (tx, ty, tz))
    # lane 0 of each bit row now holds S_t = sum of buckets with bit t set
    s_t = (tx[:, 0], ty[:, 0], tz[:, 0])  # (c, 16) each

    # Horner over bits: acc = sum 2^t S_t (rolled: one double+add body —
    # unrolling c copies of the EC formulas made the HLO graph huge and
    # CPU-backend compiles took >10 min)
    acc0 = (s_t[0][c - 1], s_t[1][c - 1], s_t[2][c - 1])

    def horner_bit(i, acc):
        t = c - 2 - i
        acc = ec.ec_double(acc, spec)
        st = tuple(jax.lax.dynamic_index_in_dim(v, t, keepdims=False) for v in s_t)
        return ec.ec_add(acc, st, spec)

    return jax.lax.fori_loop(0, c - 1, horner_bit, acc0)


@partial(jax.jit, static_argnames=("field", "c"))
def msm(px, py, pz, scalar_limbs, field: str = "fq", c: int = WINDOW_BITS):
    """MSM over a batch of Jacobian points ((N,16) x3, Montgomery limbs) and
    plain-form scalar limbs (N, 16). Returns a single Jacobian point (3, 16).

    field: coordinate field of the curve ("fq" for Vesta, "fp" for Pallas).
    """
    spec = L.FP if field == "fp" else L.FQ
    n = px.shape[0]
    digits = _digits_all(scalar_limbs, c)  # (n_win, N)

    def window_body(_, digits_row):
        order = jnp.argsort(digits_row)
        d = jnp.take(digits_row, order)
        pts = (
            jnp.take(px, order, axis=0),
            jnp.take(py, order, axis=0),
            jnp.take(pz, order, axis=0),
        )
        w = _window_reduce(pts, d, spec, c, n)
        return None, jnp.stack(w)

    _, ws = jax.lax.scan(window_body, None, digits)  # (n_win, 3, 16)

    # Horner combine across windows (most significant first)
    acc = (ws[-1, 0], ws[-1, 1], ws[-1, 2])
    n_win = digits.shape[0]

    def horner_body(carry, w_row):
        a = jax.lax.fori_loop(0, c, lambda _, p: ec.ec_double(p, spec), carry)
        a = ec.ec_add(a, (w_row[0], w_row[1], w_row[2]), spec)
        return a, None

    acc, _ = jax.lax.scan(horner_body, acc, ws[: n_win - 1][::-1])
    return jnp.stack(acc)


def msm_host(points, scalars):
    """Reference host MSM (slow; tests/benchmark oracle)."""
    acc = type(points[0]).identity()
    for p, s in zip(points, scalars):
        acc = acc + p * s
    return acc
