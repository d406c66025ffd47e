"""On-device lookup pair permutation (halo2 `lookup::permute_expression_pair`,
cf. taiga_halo2's halo2 dependency — the reference sorts on the host CPU per
proof; here the sort/merge/fill pipeline is ONE compiled device program).

Given the compressed input column A and table column S (first `u` usable rows
of each), produce:
  A' = A sorted (integer order — matches the host prover bit-for-bit);
  S' = for each run-start of A', the equal table value (consuming one copy
       from S — absence means the lookup FAILS); remaining positions filled
       with the leftover S values in sorted order.

Everything is static-shaped: sorts are `lax.sort` over 8 packed u32 key
operands (lexicographic == 256-bit integer order), the merge is one combined
sort of [S | distinct(A')] with a tag tiebreaker, and the fill is a
stable-compaction + gather. Returns an `ok` flag per lookup instead of raising
(data-dependent control flow can't live inside jit); callers pull it alongside
the commitment points (one round trip).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import limbs as L


def _pack_keys(plain):
    """(..., n, 16) u32 plain limbs -> tuple of 8 (..., n) u32 sort keys,
    most-significant first (lexicographic order == integer order)."""
    lo = plain[..., 0::2]
    hi = plain[..., 1::2]
    words = lo | (hi << 16)  # (..., n, 8) little-endian 32-bit words
    return tuple(words[..., 7 - j] for j in range(8))


def _unpack_keys(keys):
    """Inverse of _pack_keys: 8 (..., n) u32 -> (..., n, 16) u32 limbs."""
    words = jnp.stack(list(keys)[::-1], axis=-1)  # (..., n, 8) little-endian
    lo = words & 0xFFFF
    hi = words >> 16
    out = jnp.stack([lo, hi], axis=-1)  # (..., n, 8, 2)
    return out.reshape(out.shape[:-2] + (16,))


def _permute_one(a_plain, s_plain):
    """One lookup's permuted pair over the usable rows.

    a_plain, s_plain: (u, 16) plain u32 limbs. Returns (ap, sp, ok):
    (u, 16) plain limbs each, ok scalar bool."""
    u = a_plain.shape[0]

    a_sorted = jax.lax.sort(_pack_keys(a_plain), num_keys=8)
    s_sorted = jax.lax.sort(_pack_keys(s_plain), num_keys=8)

    # run starts of A' (first u rows only)
    neq = jnp.zeros((u,), jnp.bool_)
    for ka in a_sorted:
        neq = neq.at[1:].set(neq[1:] | (ka[1:] != ka[:-1]))
    is_start = neq.at[0].set(True)

    # distinct values D: A' keys at run starts, sentinel (2^256-1) elsewhere
    ones = jnp.uint32(0xFFFFFFFF)
    d_keys = tuple(jnp.where(is_start, ka, ones) for ka in a_sorted)

    # merge [S (tag 0) | D (tag 1)]: sort by (value, tag) so each value-run is
    # S-copies then (at most one) D entry
    m_keys = tuple(
        jnp.concatenate([ks, kd]) for ks, kd in zip(s_sorted, d_keys)
    )
    tag = jnp.concatenate(
        [jnp.zeros((u,), jnp.uint32), jnp.ones((u,), jnp.uint32)]
    )
    sorted_m = jax.lax.sort(m_keys + (tag,), num_keys=9)
    mk, mtag = sorted_m[:8], sorted_m[8]

    is_d = mtag == 1
    is_sentinel = mk[0] == ones
    for k in mk[1:]:
        is_sentinel = is_sentinel & (k == ones)
    live_d = is_d & ~is_sentinel

    # a D entry consumes the S copy right before it (same value, tag 0)
    prev_same = jnp.ones((2 * u,), jnp.bool_)
    for k in mk:
        prev_same = prev_same.at[1:].set(prev_same[1:] & (k[1:] == k[:-1]))
    prev_same = prev_same.at[0].set(False)
    prev_is_s = jnp.concatenate([jnp.zeros((1,), jnp.bool_), mtag[:-1] == 0])
    matched = live_d & prev_same & prev_is_s
    ok = jnp.all(~live_d | matched)
    consumed = jnp.concatenate([matched[1:], jnp.zeros((1,), jnp.bool_)])

    # leftovers: S entries (tag 0) not consumed, in sorted order — stable
    # compaction by a single u32 rank key
    left_mask = (mtag == 0) & ~consumed
    comp = jax.lax.sort(
        ((~left_mask).astype(jnp.uint32),) + mk, num_keys=1, is_stable=True
    )
    leftover = comp[1:]  # 8 key arrays, leftovers first (ascending)

    # S'[i] = A'[i] at run starts, else next leftover in order
    rank = jnp.cumsum((~is_start).astype(jnp.int32)) - 1
    rank = jnp.clip(rank, 0, 2 * u - 1)
    sp_keys = tuple(
        jnp.where(is_start, ka, jnp.take(kl, rank))
        for ka, kl in zip(a_sorted, leftover)
    )
    return _unpack_keys(a_sorted), _unpack_keys(sp_keys), ok


@partial(jax.jit, static_argnames=("u",))
def permute_pairs_device(a_v, s_v, u: int):
    """Batched device permutation for L lookups: a_v, s_v (L, n, 16)
    MONTGOMERY values -> (ap, sp) (L, u, 16) Montgomery + (L,) ok flags.
    Rows past `u` (blinding) are the caller's business."""
    a_plain = L.from_mont(a_v[:, :u], L.FP)
    s_plain = L.from_mont(s_v[:, :u], L.FP)
    ap, sp, ok = jax.vmap(_permute_one)(a_plain, s_plain)
    return L.to_mont(ap, L.FP), L.to_mont(sp, L.FP), ok
