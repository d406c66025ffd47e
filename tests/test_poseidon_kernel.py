import random

import jax.numpy as jnp
import numpy as np

from taiga_tpu.crypto import poseidon as hp
from taiga_tpu.crypto.fields import Fp
from taiga_tpu.ops import limbs as L
from taiga_tpu.ops import poseidon_kernel as pk

rng = random.Random(0xBA7C4)


def test_permute_batch_matches_host():
    n = 8
    states = [[Fp.random(rng) for _ in range(3)] for _ in range(n)]
    arr = np.zeros((n, 3, L.NLIMBS), dtype=np.uint32)
    for i, s in enumerate(states):
        arr[i] = pk.fps_to_mont(s)
    out = pk.permute_batch(jnp.asarray(arr))
    for i, s in enumerate(states):
        exp = hp.permute(list(s))
        got = pk.mont_to_fps(out[i])
        assert got == exp, f"row {i}"


def test_hash2_batch_matches_host():
    n = 16
    lefts = [Fp.random(rng) for _ in range(n)]
    rights = [Fp.random(rng) for _ in range(n)]
    out = pk.hash2_batch(jnp.asarray(pk.fps_to_mont(lefts)), jnp.asarray(pk.fps_to_mont(rights)))
    got = pk.mont_to_fps(out)
    exp = [hp.poseidon_hash(l, r) for l, r in zip(lefts, rights)]
    assert got == exp


def test_hash_n_batch_matches_host():
    for length in (2, 3, 4, 8):
        n = 4
        msgs = [[Fp.random(rng) for _ in range(length)] for _ in range(n)]
        arr = np.zeros((n, length, L.NLIMBS), dtype=np.uint32)
        for i, m in enumerate(msgs):
            arr[i] = pk.fps_to_mont(m)
        out = pk.hash_n_batch(jnp.asarray(arr), length)
        got = pk.mont_to_fps(out)
        exp = [hp.poseidon_hash_n(m) for m in msgs]
        assert got == exp, f"L={length}"


def test_merkle_root_matches_host():
    from taiga_tpu.core.resource_tree import ResourceMerkleTreeLeaves

    leaves = [Fp.random(rng) for _ in range(16)]
    exp = ResourceMerkleTreeLeaves(leaves).root()
    got = pk.mont_to_fps(pk.merkle_root(jnp.asarray(pk.fps_to_mont(leaves)))[None, :])[0]
    assert got == exp
