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


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
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


def _local_msm_bitserial(pxs, pys, pzs, sls, spec, bits: int = 255):
    """Per-device multi-column MSM as a shared double chain: one base
    doubling ladder serves every column (their bit masks differ). O(bits)
    complete-add rounds over (C, n_local) lanes — far fewer ops/lane than
    Pippenger wants, but a tiny, fast-compiling program: the XLA-CPU
    compile of the full bucket kernel takes tens of minutes, which makes
    it unusable on the virtual test mesh. Real meshes (TPU) use the
    Pippenger strategy instead."""
    C, n_local = sls.shape[0], sls.shape[1]
    assert n_local & (n_local - 1) == 0, (
        f"bitserial tree reduction needs a power-of-two local shard, got "
        f"{n_local} (pad the point/scalar arrays or use a power-of-two mesh)")
    base = (pxs, pys, pzs)  # (n, 16) each
    acc = tuple(jnp.zeros((C, n_local, L.NLIMBS), jnp.uint32) for _ in range(3))

    def body(i, carry):
        acc, base = carry
        limb = jax.lax.dynamic_slice_in_dim(sls, i // 16, 1, axis=2)[..., 0]
        bit = (limb >> (i % 16)) & 1  # (C, n_local)
        added = ec.ec_add(acc, tuple(jnp.broadcast_to(b, a.shape)
                                     for b, a in zip(base, acc)), spec)
        acc = ec.ec_select(bit > 0, added, acc)
        base = ec.ec_double(base, spec)
        return acc, base

    acc, _ = jax.lax.fori_loop(0, bits, body, (acc, base))
    # lane tree-reduction per column (n_local is a power of two)
    while acc[0].shape[1] > 1:
        h = acc[0].shape[1] // 2
        acc = ec.ec_add(tuple(a[:, :h] for a in acc),
                        tuple(a[:, h:] for a in acc), spec)
    return jnp.stack([a[:, 0] for a in acc], axis=1)  # (C, 3, 16)


def sharded_msm_multi(mesh: Mesh, px, py, pz, scalars, field: str = "fq",
                      c: int = 8, strategy: str | None = None):
    """Multi-column MSM with the POINT axis sharded over the mesh: every
    device reduces its local point/scalar slice (all columns at once), the
    per-device partial sums — (C, 3, 16) limb tensors, a few KB — are
    all-gathered over ICI and folded with complete Jacobian adds. This is
    the model-parallel counterpart of the batch-axis sharding in
    create_proofs_batch: it splits ONE commitment's work across chips
    (halo2 runs its Pippenger on host threads instead; SURVEY §5.8).

    px,py,pz: (N, 16) Jacobian Montgomery; scalars: (C, N, 16) plain limbs,
    N sharded. Returns (C, 3, 16) Jacobian points, replicated.

    strategy: "pippenger" (default on TPU — the full sorted-bucket kernel)
    or "bitserial" (default elsewhere — shared double chain, chosen for
    compile time on the virtual CPU mesh, not throughput)."""
    spec = L.FP if field == "fp" else L.FQ
    if strategy is None:
        strategy = ("pippenger" if mesh.devices.flat[0].platform == "tpu"
                    else "bitserial")

    def local(pxs, pys, pzs, sls):
        if strategy == "pippenger":
            part = msm_mod._msm_multi_device(pxs, pys, pzs, sls,
                                             field=field, c=c)
        else:
            part = _local_msm_bitserial(pxs, pys, pzs, sls, spec)
        parts = jax.lax.all_gather(part, AXIS)  # (n_dev, C, 3, 16)
        acc = (parts[0, :, 0], parts[0, :, 1], parts[0, :, 2])  # (C, 16) each
        for i in range(1, parts.shape[0]):
            q = (parts[i, :, 0], parts[i, :, 1], parts[i, :, 2])
            acc = ec.ec_add(acc, q, spec)
        return jnp.stack(acc, axis=1)  # (C, 3, 16)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(Pspec(AXIS), Pspec(AXIS), Pspec(AXIS), Pspec(None, AXIS)),
        out_specs=Pspec(),
        check_vma=False,  # replicated by construction (post-gather fold)
    )
    return fn(px, py, pz, scalars)


def batch_hash_step(mesh: Mesh, messages):
    """Data-parallel ConstantLength<8> hashing over a sharded proof batch:
    messages (B, 8, 16) Montgomery, B sharded across devices."""

    def local(msgs):
        return pk.hash_n_batch(msgs, 8)

    fn = jax.shard_map(
        local, mesh=mesh, in_specs=(Pspec(AXIS),), out_specs=Pspec(AXIS)
    )
    return fn(messages)


def sharded_point_sum(mesh: Mesh, px, py, pz, field: str = "fq"):
    """Sum a sharded batch of points: each device tree-reduces its local
    shard with the fused projective-add kernel, partial sums are
    all-gathered (3x16 limbs — tiny, rides ICI) and folded. The reduction
    skeleton of the sharded Pippenger MSM (per-device bucket accumulation +
    psum-style bucket fold), in a compile-light form for the dryrun."""
    from ..ops import ff_kernels as FK

    spec = L.FP if field == "fp" else L.FQ

    def local(pxs, pys, pzs):
        # (local_n, 16) row-major affine/Jacobian -> limb-major projective
        z2 = L.mont_mul(pzs, pzs, spec)
        x = L.mont_mul(pxs, pzs, spec).T
        y = pys.T
        z = L.mont_mul(z2, pzs, spec).T
        m = jnp.broadcast_to(jnp.asarray(spec.one_mont, jnp.uint32)[:, None], y.shape)
        inf = L.is_zero(pzs)
        x = jnp.where(inf[None, :], jnp.uint32(0), x)
        y = jnp.where(inf[None, :], m, y)
        z = jnp.where(inf[None, :], jnp.uint32(0), z)
        ln = x.shape[1]

        def body(r, pts):
            a, b, cz = pts
            s = jnp.int32(1) << r
            return FK.ec_add_proj_sel_lm(
                a, b, cz,
                jnp.roll(a, -s, axis=1), jnp.roll(b, -s, axis=1),
                jnp.roll(cz, -s, axis=1),
                ((jnp.arange(ln) + s) < ln).astype(jnp.uint32)[None, :],
                field,
            )

        x, y, z = jax.lax.fori_loop(0, ln.bit_length() - 1, body, (x, y, z))
        part = jnp.stack([x[:, 0], y[:, 0], z[:, 0]])  # (3, 16) projective
        parts = jax.lax.all_gather(part, AXIS)  # (n_dev, 3, 16)
        # fold the gathered partials (projective adds on single lanes)
        acc = tuple(parts[0, i][:, None] for i in range(3))
        n_dev = parts.shape[0]

        def fold(i, acc):
            q = tuple(parts[i, j][:, None] for j in range(3))
            return FK.ec_add_proj_lm(*acc, *q, field=field)

        acc = jax.lax.fori_loop(1, n_dev, fold, acc)
        # projective -> Jacobian (X*Z, Y*Z^2, Z)
        X, Y, Z = (v[:, 0][None, :] for v in acc)
        xz = L.mont_mul(X, Z, spec)
        yz2 = L.mont_mul(Y, L.mont_mul(Z, Z, spec), spec)
        return jnp.stack([xz[0], yz2[0], Z[0]])

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(Pspec(AXIS), Pspec(AXIS), Pspec(AXIS)),
        out_specs=Pspec(),
        check_vma=False,  # result is replicated by construction (post-gather)
    )
    return fn(px, py, pz)


def prove_step(mesh: Mesh, messages, px, py, pz, field: str = "fq"):
    """One combined multi-chip proving step (data-parallel witness hashing +
    a sharded commitment-reduction round) — the unit the multi-chip dryrun
    compiles and runs with real dp/sp shardings over the mesh."""
    hashes = batch_hash_step(mesh, messages)
    commitment = sharded_point_sum(mesh, px, py, pz, field=field)
    return hashes, commitment
