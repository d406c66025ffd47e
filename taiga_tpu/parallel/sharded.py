"""Sharded kernels over a device mesh.

  sharded_msm:     points/scalars sharded over the mesh axis; each device
                   runs a local Pippenger bucket reduction, partial sums are
                   all-gathered (3x16 limbs each — tiny) and folded.
  batch_hash_step: data-parallel Poseidon witness hashing (proof-batch axis).
  prove_step:      the combined "training step" used by the multi-chip dryrun:
                   per-device witness hashing + a sharded commitment MSM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as Pspec

from ..ops import ec, limbs as L, msm as msm_mod
from ..ops import poseidon_kernel as pk

AXIS = "shards"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(devs[:n], (AXIS,))


def _fold_partials(parts, spec):
    """Fold (n, 3, 16) partial MSM results into one Jacobian point."""
    n = parts.shape[0]
    acc = (parts[0, 0], parts[0, 1], parts[0, 2])
    for i in range(1, n):
        acc = ec.ec_add(acc, (parts[i, 0], parts[i, 1], parts[i, 2]), spec)
    return jnp.stack(acc)


def sharded_msm(mesh: Mesh, px, py, pz, scalar_limbs, field: str = "fq", c: int = 8):
    """MSM with the point/scalar arrays sharded along the mesh axis."""
    spec = L.FP if field == "fp" else L.FQ

    def local(pxs, pys, pzs, sls):
        part = msm_mod.msm(pxs, pys, pzs, sls, field=field, c=c)
        parts = jax.lax.all_gather(part, AXIS)  # (n_dev, 3, 16)
        return _fold_partials(parts, spec)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(Pspec(AXIS), Pspec(AXIS), Pspec(AXIS), Pspec(AXIS)),
        out_specs=Pspec(),  # replicated result
    )
    return fn(px, py, pz, scalar_limbs)


def batch_hash_step(mesh: Mesh, messages):
    """Data-parallel ConstantLength<8> hashing over a sharded proof batch:
    messages (B, 8, 16) Montgomery, B sharded across devices."""

    def local(msgs):
        return pk.hash_n_batch(msgs, 8)

    fn = jax.shard_map(
        local, mesh=mesh, in_specs=(Pspec(AXIS),), out_specs=Pspec(AXIS)
    )
    return fn(messages)


def prove_step(mesh: Mesh, messages, px, py, pz, scalar_limbs, field: str = "fq"):
    """One combined multi-chip proving step (witness hashing + sharded
    commitment MSM) — the unit the multi-chip dryrun compiles and runs."""
    hashes = batch_hash_step(mesh, messages)
    commitment = sharded_msm(mesh, px, py, pz, scalar_limbs, field=field, c=4)
    return hashes, commitment
