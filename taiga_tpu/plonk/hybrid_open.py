"""Hybrid multiopen: device-side aggregation, host-side IPA tail.

The multiopen (shplonk-style per-point aggregation, cf. halo2
`poly::multiopen::create_proof` behind taiga_halo2/src/proof.rs:25-42) is
LINEAR in the committed polynomials, so the whole reduction — per-point
weighted sums, synthetic division, the h/f assemblies — runs on device where
the coefficient stacks already live. Only two small tensors ever cross the
link: the per-group evaluations at x3 (G × 32 B) and the final aggregate
polynomial f (n × 32 B packed), which feeds the native C++ IPA open
(plonk/native_open.py). This replaces the old device path's full coefficient
pull (~90 columns × n × 32 B ≈ 23 MB/proof at k=13 — the measured
steady-state bottleneck over the ~10 MB/s device tunnel).

Transcript framing is IDENTICAL to multiopen_open_native /
multiopen_open_device: proofs verify under the unchanged verifier.
"""

from __future__ import annotations

import secrets

import jax
import jax.numpy as jnp
import numpy as np

from ..crypto.fields import Fp
from ..ops import limbs as L, poly
from .srs import get_params

P = Fp.MODULUS


def _rand() -> int:
    return secrets.randbits(300) % P


def _mont(v: int):
    return jnp.asarray(L.int_to_limbs(v * L.FP.r % P))


def _group_entries(entries):
    """Group by point in order of first appearance (matches the verifier's
    replay over the same query order)."""
    groups: dict[int, list] = {}
    order: list[int] = []
    for e in entries:
        if e["point"] not in groups:
            groups[e["point"]] = []
            order.append(e["point"])
        groups[e["point"]].append(e)
    return groups, order


def _build_programs(group_sizes: tuple[int, ...]):
    """Jitted device programs for a fixed group structure. The gather indices
    are passed as a device array (they're constant per proving key, but keeping
    them out of the closure lets one compiled program serve every pk with the
    same group SIZES — e.g. compliance and RL circuits at one domain)."""

    def agg_fn(all_coeffs, idxs, weights):
        outs = []
        off = 0
        for sz in group_sizes:
            sel = jnp.take(all_coeffs, idxs[off : off + sz], axis=0)
            outs.append(poly.mont_linear_combo(sel, weights[off : off + sz]))
            off += sz
        return jnp.stack(outs)  # (G, n, 16)

    def h_fn(agg, pts_m, pts_inv_m, u_pows):
        q = jax.vmap(lambda c, p, pi: poly.synthetic_div(c, p, pi))(
            agg, pts_m, pts_inv_m
        )
        return poly.mont_linear_combo(q, u_pows)

    def f_fn(h, agg, w_pows):
        return L.add(h, poly.mont_linear_combo(agg, w_pows), L.FP)

    return jax.jit(agg_fn), jax.jit(h_fn), jax.jit(f_fn)


_PROGRAMS: dict[tuple[int, ...], tuple] = {}


def _programs(group_sizes: tuple[int, ...]):
    progs = _PROGRAMS.get(group_sizes)
    if progs is None:
        progs = _build_programs(group_sizes)
        _PROGRAMS[group_sizes] = progs
    return progs


def multiopen_open_hybrid(pipe, all_coeffs, entries, tr):
    """Aggregate + open. all_coeffs: (C, n, 16) device Montgomery coefficient
    stack; entries: [{coeff_idx, blind, point, value}] in query order."""
    from .prover import _from_mont_jit, _pack_jit

    params = get_params(pipe.k)
    v_ch = tr.challenge(b"mo-v").v
    groups, order = _group_entries(entries)
    sizes = tuple(len(groups[p]) for p in order)
    agg_fn, h_fn, f_fn = _programs(sizes)

    idxs = []
    weights = []
    blinds = []
    for ptv in order:
        vp = 1
        blind = 0
        for e in groups[ptv]:
            idxs.append(e["coeff_idx"])
            weights.append(vp)
            blind = (blind + vp * e["blind"]) % P
            vp = vp * v_ch % P
        blinds.append(blind)
    idxs_dev = jnp.asarray(np.asarray(idxs, np.int32))
    w_dev = jnp.asarray(np.stack([L.int_to_limbs(w * L.FP.r % P) for w in weights]))
    agg = agg_fn(all_coeffs, idxs_dev, w_dev)

    u_ch = tr.challenge(b"mo-u").v
    pts_m = jnp.stack([_mont(p) for p in order])
    pts_inv_m = jnp.stack([_mont(pow(p, -1, P)) for p in order])
    u_pows = jnp.stack([_mont(pow(u_ch, j, P)) for j in range(len(order))])
    h = h_fn(agg, pts_m, pts_inv_m, u_pows)

    h_blind = _rand()
    c_h = pipe.commit_coeff_rows(h[None], [h_blind])[0]
    tr.write_point(c_h)
    x3 = tr.challenge(b"mo-x3").v
    a_dev = poly.eval_polys_at_points(agg, _mont(x3)[None])[0]  # (G, 16)
    a_np = np.asarray(jax.device_get(_from_mont_jit(a_dev)))
    a_vals = [L.limbs_to_int(a_np[i]) for i in range(len(order))]
    for av in a_vals:
        tr.write_scalar(Fp(av))

    w_ch = tr.challenge(b"mo-w").v
    w_pows = jnp.stack(
        [_mont(pow(w_ch, j + 1, P)) for j in range(len(order))]
    )
    f = f_fn(h, agg, w_pows)
    f_blind = h_blind
    wp = w_ch
    for blind in blinds:
        f_blind = (f_blind + wp * blind) % P
        wp = wp * w_ch % P

    from ..native import hostops as H

    if H.available():
        from .native_open import ipa_open_native

        f_host = L.packed_to_u64(np.asarray(jax.device_get(_pack_jit(f))))
        ipa_open_native(params, f_host, f_blind, x3, tr)
    else:
        from .ipa import ipa_open_device

        ipa_open_device(params, f, f_blind, x3, tr)


def multiopen_open_hybrid_batch(pipe, all_coeffs_b, entries_b, trs):
    """Batched hybrid multiopen: one vmapped device program per stage over the
    proof batch, ONE h-commit MSM, ONE f pull; the per-proof native IPA tails
    run threaded by the caller's executor (they share no state).

    all_coeffs_b: (B, C, n, 16); entries_b: per-proof entry lists (same
    structure — same pk — but per-proof blinds/points/values); trs: per-proof
    transcripts. Returns nothing; proofs finish via trs."""
    from concurrent.futures import ThreadPoolExecutor

    from ..native import hostops as H
    from .native_open import ipa_open_native
    from .prover import _pack_jit, _from_mont_jit

    assert H.available(), "batched hybrid multiopen needs the native engine"
    import os as _os
    import sys as _sys
    import time as _time

    _prof = _os.environ.get("TAIGA_PROFILE") == "1"
    _tm = [_time.time()]

    def _mark(name):
        if _prof:
            now = _time.time()
            print(f"#     mo-batch {name:24s} {now - _tm[0]:7.3f}s",
                  file=_sys.stderr)
            _tm[0] = now

    params = get_params(pipe.k)
    B = len(trs)
    v_chs = [tr.challenge(b"mo-v").v for tr in trs]
    per_proof = [_group_entries(entries) for entries in entries_b]
    sizes = tuple(len(per_proof[0][0][p]) for p in per_proof[0][1])
    agg_fn, h_fn, f_fn = _programs(sizes)
    key = ("hybrid_batch", sizes)
    cache = getattr(pipe, "_mo_batch_jit", None)
    if cache is None or cache[0] != key:
        pipe._mo_batch_jit = (key, (
            jax.jit(jax.vmap(agg_fn, in_axes=(0, None, 0))),
            jax.jit(jax.vmap(h_fn)),
            jax.jit(jax.vmap(f_fn)),
        ))
    agg_b_fn, h_b_fn, f_b_fn = pipe._mo_batch_jit[1]

    idxs = [e["coeff_idx"] for p in per_proof[0][1] for e in per_proof[0][0][p]]
    idxs_dev = jnp.asarray(np.asarray(idxs, np.int32))
    w_rows = []
    blinds_b = []
    orders = []
    for bi in range(B):
        groups, order = per_proof[bi]
        orders.append(order)
        weights = []
        blinds = []
        for ptv in order:
            vp = 1
            blind = 0
            for e in groups[ptv]:
                weights.append(vp)
                blind = (blind + vp * e["blind"]) % P
                vp = vp * v_chs[bi] % P
            blinds.append(blind)
        w_rows.append(np.stack([L.int_to_limbs(w * L.FP.r % P) for w in weights]))
        blinds_b.append(blinds)
    agg_b = agg_b_fn(all_coeffs_b, idxs_dev, jnp.asarray(np.stack(w_rows)))

    u_chs = [tr.challenge(b"mo-u").v for tr in trs]
    G = len(orders[0])
    pts_m = jnp.asarray(np.stack([
        np.stack([L.int_to_limbs(p * L.FP.r % P) for p in orders[bi]])
        for bi in range(B)]))
    pts_inv_m = jnp.asarray(np.stack([
        np.stack([L.int_to_limbs(pow(p, -1, P) * L.FP.r % P) for p in orders[bi]])
        for bi in range(B)]))
    u_pows = jnp.asarray(np.stack([
        np.stack([L.int_to_limbs(pow(u_chs[bi], j, P) * L.FP.r % P)
                  for j in range(G)])
        for bi in range(B)]))
    h_b = h_b_fn(agg_b, pts_m, pts_inv_m, u_pows)

    n = pipe.n
    h_blinds = [_rand() for _ in range(B)]
    c_hs = pipe.commit_coeff_rows(h_b.reshape(B, n, L.NLIMBS), h_blinds)
    _mark("agg+h eval + h commit")
    x3s = []
    for bi, tr in enumerate(trs):
        tr.write_point(c_hs[bi])
        x3s.append(tr.challenge(b"mo-x3").v)
    x3_m = jnp.asarray(np.stack([
        L.int_to_limbs(x3 * L.FP.r % P) for x3 in x3s]))
    a_dev = jax.vmap(lambda a, x: poly.eval_polys_at_points(a, x[None])[0])(
        agg_b, x3_m
    )  # (B, G, 16)
    a_np = np.asarray(jax.device_get(_from_mont_jit(a_dev)))
    _mark("a(x3) evals pull")

    w_chs = []
    for bi, tr in enumerate(trs):
        for gi in range(G):
            tr.write_scalar(Fp(L.limbs_to_int(a_np[bi, gi])))
        w_chs.append(tr.challenge(b"mo-w").v)
    w_pows = jnp.asarray(np.stack([
        np.stack([L.int_to_limbs(pow(w_chs[bi], j + 1, P) * L.FP.r % P)
                  for j in range(G)])
        for bi in range(B)]))
    f_b = f_b_fn(h_b, agg_b, w_pows)
    f_host = L.packed_to_u64(np.asarray(jax.device_get(_pack_jit(f_b))))
    _mark("f build + pull")

    def finish_one(bi):
        f_blind = h_blinds[bi]
        wp = w_chs[bi]
        for blind in blinds_b[bi]:
            f_blind = (f_blind + wp * blind) % P
            wp = wp * w_chs[bi] % P
        ipa_open_native(params, f_host[bi], f_blind, x3s[bi], trs[bi])

    import os as _os
    import sys as _sys
    import time as _time

    _prof = _os.environ.get("TAIGA_PROFILE") == "1"
    t0 = _time.time()
    workers = min(4, B)
    if workers > 1:
        with ThreadPoolExecutor(max_workers=workers) as ex:
            list(ex.map(finish_one, range(B)))
    else:
        finish_one(0)
    if _prof:
        print(f"#     mo-batch native IPA tails ({B} proofs, {workers} wk)"
              f" {_time.time() - t0:7.3f}s", file=_sys.stderr)
