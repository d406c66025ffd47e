"""Batched Poseidon permutation/hash over Fp as vectorized limb tensors.

The workhorse device kernel: witness generation hashes (commitments,
nullifiers, psi/rcm PRFs), Merkle tree building, and the encryption sponge all
reduce to batched applications of the width-3 P128Pow5T3 permutation.

Layout: a batch of field elements is (N, 16) uint32 Montgomery limbs; a state
batch is (N, 3, 16). Rounds run under `lax.scan` in three segments (half full,
partial, half full) so the traced graph stays small; the partial segment
applies the S-box to lane 0 only (matching halo2_gadgets `primitives::permute`,
see crypto/poseidon.py).

Bit-exact vs `taiga_tpu.crypto.poseidon` (tests/test_poseidon_kernel.py).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..crypto import poseidon as hp
from ..crypto.fields import Fp
from . import limbs as L


@lru_cache(maxsize=None)
def _mont_params():
    """Round constants (64,3,16) and MDS (3,3,16) in Montgomery limb form.

    Cached as numpy (never cache jnp arrays — under tracing they'd be cached
    as leaked tracers)."""
    r, p = L.FP.r, Fp.MODULUS
    rc = np.zeros((64, 3, L.NLIMBS), dtype=np.uint32)
    for i, row in enumerate(hp.ROUND_CONSTANTS):
        for j, c in enumerate(row):
            rc[i, j] = L.int_to_limbs(c * r % p)
    mds = np.zeros((3, 3, L.NLIMBS), dtype=np.uint32)
    for i in range(3):
        for j in range(3):
            mds[i, j] = L.int_to_limbs(hp.MDS[i][j] * r % p)
    return rc, mds


def _sbox(x):
    x2 = L.mont_square(x, L.FP)
    x4 = L.mont_square(x2, L.FP)
    return L.mont_mul(x4, x, L.FP)


def _mds_apply(s0, s1, s2, mds):
    def row(i):
        t = L.mont_mul(mds[i, 0][None, :], s0, L.FP)
        t = L.add(t, L.mont_mul(mds[i, 1][None, :], s1, L.FP), L.FP)
        return L.add(t, L.mont_mul(mds[i, 2][None, :], s2, L.FP), L.FP)

    return row(0), row(1), row(2)


def permute_batch(state):
    """(N, 3, 16) Montgomery -> (N, 3, 16) Montgomery."""
    rc_np, mds_np = _mont_params()
    rc, mds = jnp.asarray(rc_np), jnp.asarray(mds_np)
    half = hp.FULL_ROUNDS // 2

    def full_round(carry, rc_row):
        s0, s1, s2 = carry
        s0 = _sbox(L.add(s0, rc_row[0][None, :], L.FP))
        s1 = _sbox(L.add(s1, rc_row[1][None, :], L.FP))
        s2 = _sbox(L.add(s2, rc_row[2][None, :], L.FP))
        return _mds_apply(s0, s1, s2, mds), None

    def partial_round(carry, rc_row):
        s0, s1, s2 = carry
        s0 = _sbox(L.add(s0, rc_row[0][None, :], L.FP))
        s1 = L.add(s1, rc_row[1][None, :], L.FP)
        s2 = L.add(s2, rc_row[2][None, :], L.FP)
        return _mds_apply(s0, s1, s2, mds), None

    carry = (state[:, 0], state[:, 1], state[:, 2])
    carry, _ = jax.lax.scan(full_round, carry, rc[:half])
    carry, _ = jax.lax.scan(partial_round, carry, rc[half : half + hp.PARTIAL_ROUNDS])
    carry, _ = jax.lax.scan(full_round, carry, rc[half + hp.PARTIAL_ROUNDS :])
    return jnp.stack(carry, axis=1)


@partial(jax.jit, static_argnames=("length",))
def hash_n_batch(message, length: int):
    """Batched ConstantLength<L> hash.

    message: (N, L, 16) Montgomery limbs -> (N, 16) Montgomery limbs.
    Capacity element = (L << 64) (in Montgomery form); zero-padded to a
    multiple of the rate; output = state[0] after the last permutation.
    """
    n = message.shape[0]
    assert message.shape[1] == length
    cap = L.int_to_limbs(((length << 64) % Fp.MODULUS) * L.FP.r % Fp.MODULUS)
    # derive zeros from the input so scan carries keep its varying manual
    # axes under shard_map
    zero = message[:, 0] & jnp.uint32(0)
    state = jnp.stack([zero, zero, zero + jnp.asarray(cap)], axis=1)
    k = -(-length // hp.RATE)
    for c in range(k):
        chunk = []
        for j in range(hp.RATE):
            idx = c * hp.RATE + j
            chunk.append(message[:, idx] if idx < length else zero)
        state = jnp.stack(
            [
                L.add(state[:, 0], chunk[0], L.FP),
                L.add(state[:, 1], chunk[1], L.FP),
                state[:, 2],
            ],
            axis=1,
        )
        state = permute_batch(state)
    return state[:, 0]


@jax.jit
def hash2_batch(left, right):
    """Batched Poseidon(left, right): (N,16),(N,16) -> (N,16), Montgomery."""
    return hash_n_batch(jnp.stack([left, right], axis=1), 2)


@jax.jit
def merkle_level(nodes):
    """One Merkle level: (2M, 16) -> (M, 16), pairing adjacent nodes."""
    return hash2_batch(nodes[0::2], nodes[1::2])


def merkle_root(leaves):
    """Full binary Poseidon Merkle root of a power-of-two batch of leaves.

    (2^d, 16) Montgomery limbs -> (16,) Montgomery limbs.
    """
    n = leaves.shape[0]
    assert n & (n - 1) == 0
    nodes = leaves
    while nodes.shape[0] > 1:
        nodes = merkle_level(nodes)
    return nodes[0]


# --- host conversion helpers ------------------------------------------------


def fps_to_mont(values) -> np.ndarray:
    """[Fp] -> (N,16) Montgomery limb array."""
    return np.asarray(L.FP.array_to_mont([v.v for v in values]))


def mont_to_fps(arr) -> list[Fp]:
    return [Fp(v) for v in L.FP.array_from_mont(arr)]
