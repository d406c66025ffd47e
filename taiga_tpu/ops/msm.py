"""Pippenger multi-scalar multiplication on fused Pallas kernels.

MSM(points, scalars) = sum_i [s_i] P_i — the prover's dominant EC cost
(polynomial commitments over Vesta; delta commitments over Pallas).

TPU-native bucket method (no data-dependent control flow, SURVEY.md §7):
  * scalars arrive as (N, 16) plain 16-bit limb tensors; window width c
    divides 16 so window digits are bit-slices of the limbs;
  * per window (lax.scan over the 256/c windows):
      - argsort the digits, gather points into sorted order, transpose to
        the limb-major (16, N) layout;
      - segmented Hillis-Steele suffix reduction: log2(N) rounds of ONE
        fused complete-add+select Pallas kernel (ops/ff_kernels.py) — the
        whole 25-mul Jacobian formula stays in VMEM per block;
      - bucket extraction via searchsorted (2^c lanes);
      - weighted sum sum_j j*B_j via the bit decomposition of j: a (c, 2^c)
        lane array reduces in c fused-kernel rounds, then a tiny Horner
        double-and-add combines the bits;
  * window results combine with a c-doubling Horner chain.

Differentially tested against host scalar-mul sums (tests/test_ec.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import ec
from . import ff_kernels as FK
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


_CHUNK = 64  # in-chunk reduction span before compaction
_COMPACT = 1024  # compacted lane count (>= n/_CHUNK-partials + 2^c runs)


def _one_mont_col(field):
    spec = L.FP if field == "fp" else L.FQ
    return jnp.asarray(spec.one_mont)[:, None]  # (16, 1)


def _mask_identity(x, y, z, keep, field):
    """Lanes where keep is False become the projective identity (0:1:0)."""
    one = _one_mont_col(field)
    x = jnp.where(keep[None, :], x, jnp.uint32(0))
    y = jnp.where(keep[None, :], y, one)
    z = jnp.where(keep[None, :], z, jnp.uint32(0))
    return x, y, z


def _seg_rounds(x, y, z, d, n, rounds, field):
    """Segmented Hillis-Steele suffix reduction: after round r, lane i holds
    the sum of its run's elements in [i, i + 2^(r+1)). The round loop is a
    fori_loop with a dynamic roll distance so the (large) fused-add graph is
    instantiated once, not per round."""
    idx = jnp.arange(n)

    def body(r, pts):
        x, y, z = pts
        s = jnp.int32(1) << r
        nx = jnp.roll(x, -s, axis=1)
        ny = jnp.roll(y, -s, axis=1)
        nz = jnp.roll(z, -s, axis=1)
        same = ((idx + s < n) & (d == jnp.roll(d, -s))).astype(jnp.uint32)
        return FK.ec_add_proj_sel_lm(x, y, z, nx, ny, nz, same[None, :], field)

    return jax.lax.fori_loop(0, rounds, body, (x, y, z))


def _window_reduce(pts_lm, d, field: str, c: int, n: int):
    """Bucket-accumulate one window from limb-major sorted points; returns
    the window's partial sum as a (3, 16) row-major Jacobian point.

    Work reduction: the digits are SORTED, so there are at most 2^c runs.
    After log2(CHUNK) full-width rounds every run is reduced to partials at
    stride CHUNK from its start — at most n/CHUNK + 2^c lanes — which are
    compacted (static-size nonzero) and finished at 1/32 the width. Total
    work ~6n complete adds per window instead of n*log2(n)."""
    x, y, z = pts_lm
    x, y, z = _mask_identity(x, y, z, d != 0, field)
    nbuckets = 1 << c
    logn = max(1, n.bit_length() - 1)

    if n <= 2 * _COMPACT:
        x, y, z = _seg_rounds(x, y, z, d, n, logn, field)
    else:
        chunk_rounds = _CHUNK.bit_length() - 1  # 6
        x, y, z = _seg_rounds(x, y, z, d, n, chunk_rounds, field)
        # partial positions: run starts and stride-CHUNK offsets within runs
        idx = jnp.arange(n)
        is_start = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), d[1:] != d[:-1]]
        )
        start_idx = jnp.where(is_start, idx, -1)
        seg_start = jax.lax.associative_scan(jnp.maximum, start_idx)
        mask = ((idx - seg_start) % _CHUNK) == 0
        pos = jnp.nonzero(mask, size=_COMPACT, fill_value=n)[0]
        valid = pos < n
        posc = jnp.clip(pos, 0, n - 1)
        cd = jnp.where(valid, jnp.take(d, posc), nbuckets)
        x = jnp.take(x, posc, axis=1)
        y = jnp.take(y, posc, axis=1)
        z = jnp.take(z, posc, axis=1)
        x, y, z = _mask_identity(x, y, z, valid, field)
        d = cd
        n = _COMPACT
        x, y, z = _seg_rounds(x, y, z, d, n, _COMPACT.bit_length() - 1, field)
    targets = jnp.arange(nbuckets, dtype=d.dtype)
    pos = jnp.clip(jnp.searchsorted(d, targets), 0, n - 1)
    present = jnp.take(d, pos) == targets
    bx = jnp.take(x, pos, axis=1)
    by = jnp.take(y, pos, axis=1)
    bz = jnp.take(z, pos, axis=1)
    bx, by, bz = _mask_identity(bx, by, bz, present, field)

    # weighted sum over buckets via bits of the index: (16, c*2^c) lanes
    bit_masks = ((targets[None, :] >> jnp.arange(c)[:, None]) & 1) > 0  # (c, 2^c)
    tx = jnp.broadcast_to(bx[:, None, :], (16, c, nbuckets)).reshape(16, c * nbuckets)
    ty = jnp.broadcast_to(by[:, None, :], (16, c, nbuckets)).reshape(16, c * nbuckets)
    tz = jnp.broadcast_to(bz[:, None, :], (16, c, nbuckets)).reshape(16, c * nbuckets)
    tx, ty, tz = _mask_identity(tx, ty, tz, jnp.broadcast_to(bit_masks.reshape(c * nbuckets), (c * nbuckets,)), field)

    def tree_body(r, pts):
        tx, ty, tz = pts
        s = jnp.int32(1) << r
        nx = jnp.roll(tx.reshape(16, c, nbuckets), -s, axis=2).reshape(16, c * nbuckets)
        ny = jnp.roll(ty.reshape(16, c, nbuckets), -s, axis=2).reshape(16, c * nbuckets)
        nz = jnp.roll(tz.reshape(16, c, nbuckets), -s, axis=2).reshape(16, c * nbuckets)
        return FK.ec_add_proj_lm(tx, ty, tz, nx, ny, nz, field=field)

    rounds = (nbuckets - 1).bit_length()
    tx, ty, tz = jax.lax.fori_loop(0, rounds, tree_body, (tx, ty, tz))

    # lane 0 of each bit row holds S_t = sum of buckets with bit t set;
    # Horner over bits on single-lane projective points (RCB add doubles too)
    sel = jnp.arange(c) * nbuckets
    s_t = (
        jnp.take(tx, sel, axis=1),  # (16, c)
        jnp.take(ty, sel, axis=1),
        jnp.take(tz, sel, axis=1),
    )
    acc = tuple(v[:, c - 1 : c] for v in s_t)

    def horner_bit(i, acc):
        t = c - 2 - i
        acc = FK.ec_add_proj_lm(*acc, *acc, field=field)  # double
        st = tuple(jax.lax.dynamic_slice_in_dim(v, t, 1, axis=1) for v in s_t)
        return FK.ec_add_proj_lm(*acc, *st, field=field)

    acc = jax.lax.fori_loop(0, c - 1, horner_bit, acc)
    return jnp.stack([v[:, 0] for v in acc])  # (3, 16) projective, limb rows


_BLOCK = 128  # blocked-reduction tile (phase A of _blocked_partials)


def _blocked_partials(x, y, z, dcomp, field: str, ncols: int, nbuckets: int,
                      total: int):
    """Work-efficient bucket partials for LARGE sorted windows.

    The plain segmented Hillis-Steele costs rounds*total lane-adds (~6x
    the points). When total >> ncols*nbuckets, almost every 128-lane block
    lies inside ONE digit run, so:
      A. tree-reduce every block unconditionally (total lane-adds, with
         halving widths — boundary blocks produce garbage, fixed next);
      B. gather only the MIXED blocks (<= runs <= ncols*nbuckets of them,
         a static bound from sortedness) and Hillis-Steele within them —
         per-(block, run) partials at the in-block run starts;
      C. merge the uniform block sums with the mixed-run partials
         (<= 2*ncols*nbuckets entries, also a static bound), re-sort the
         ~total/128-entry list, and finish with one small segmented pass.
    Returns (x, y, z, keys, length) sorted by key with each run's first
    lane holding the full bucket sum — the contract the bucket-extraction
    tail expects."""
    nb = total // _BLOCK
    # --- A: unconditional per-block tree (aligned ranges). One transpose
    # puts the within-block axis OFF the minor (lane) dimension — strided
    # lane slices would force a full relayout per round on TPU — then each
    # halving round adds two CONTIGUOUS halves.
    def tr(v):
        return jnp.swapaxes(v.reshape(16, nb, _BLOCK), 1, 2).reshape(16, total)

    ax, ay, az = tr(x), tr(y), tr(z)  # lane order: j * nb + block
    h = _BLOCK
    while h > 1:
        h //= 2
        sz = h * nb
        ax, ay, az = FK.ec_add_proj_lm(
            ax[:, :sz], ay[:, :sz], az[:, :sz],
            ax[:, sz : 2 * sz], ay[:, sz : 2 * sz], az[:, sz : 2 * sz],
            field=field)
    bk_lo = dcomp[0::_BLOCK]
    bk_hi = dcomp[_BLOCK - 1 :: _BLOCK]
    mixed = bk_lo != bk_hi

    # --- B: fix up the mixed blocks --------------------------------------
    maxb = min(ncols * nbuckets, nb)
    posb = jnp.nonzero(mixed, size=maxb, fill_value=nb)[0]
    validb = posb < nb
    posbc = jnp.clip(posb, 0, nb - 1)
    gidx = (posbc[:, None] * _BLOCK + jnp.arange(_BLOCK)[None, :]).reshape(-1)
    gx = jnp.take(x, gidx, axis=1)
    gy = jnp.take(y, gidx, axis=1)
    gz = jnp.take(z, gidx, axis=1)
    gkey = jnp.take(dcomp, gidx)
    glanes = maxb * _BLOCK
    lane_valid = jnp.repeat(validb, _BLOCK)
    gx, gy, gz = _mask_identity(gx, gy, gz, lane_valid, field)
    # runs must not merge across gathered blocks: composite block-local key
    blk = jnp.repeat(jnp.arange(maxb, dtype=dcomp.dtype), _BLOCK)
    comp2 = blk * (ncols * nbuckets + 1) + gkey
    gx, gy, gz = _seg_rounds(gx, gy, gz, comp2, glanes,
                             _BLOCK.bit_length() - 1, field)
    gi = jnp.arange(glanes)
    prev = jnp.concatenate([comp2[:1] ^ 1, comp2[:-1]])
    is_start = ((gi % _BLOCK == 0) | (comp2 != prev)) & lane_valid
    # <= runs + mixed-blocks <= 2 * ncols * nbuckets in-block run starts
    ecap = 2 * ncols * nbuckets
    spos = jnp.nonzero(is_start, size=ecap, fill_value=glanes)[0]
    svalid = spos < glanes
    sposc = jnp.clip(spos, 0, glanes - 1)
    sent = jnp.asarray(ncols * nbuckets, dcomp.dtype)
    mkey = jnp.where(svalid, jnp.take(gkey, sposc), sent)
    mx = jnp.take(gx, sposc, axis=1)
    my = jnp.take(gy, sposc, axis=1)
    mz = jnp.take(gz, sposc, axis=1)
    mx, my, mz = _mask_identity(mx, my, mz, svalid, field)

    # --- C: merge uniform block sums + mixed-run partials ----------------
    ukey = jnp.where(mixed, sent, bk_lo)
    ux, uy, uz = _mask_identity(ax, ay, az, ~mixed, field)
    ekeys = jnp.concatenate([ukey, mkey])
    ex = jnp.concatenate([ux, mx], axis=1)
    ey = jnp.concatenate([uy, my], axis=1)
    ez = jnp.concatenate([uz, mz], axis=1)
    en = nb + ecap
    order = jnp.argsort(ekeys)
    ekeys = jnp.take(ekeys, order)
    ex = jnp.take(ex, order, axis=1)
    ey = jnp.take(ey, order, axis=1)
    ez = jnp.take(ez, order, axis=1)
    ex, ey, ez = _seg_rounds(ex, ey, ez, ekeys, en,
                             max(1, (en - 1).bit_length()), field)
    return ex, ey, ez, ekeys, en


def _window_reduce_multi(pts_lm, dcomp, field: str, c: int, ncols: int, n: int,
                         compact: int):
    """Bucket-accumulate one window for NCOLS scalar columns sharing one
    point set. pts_lm is (16, ncols*n) limb-major projective points in
    composite-key sorted order; dcomp is the sorted composite key
    col*2^c + digit (so runs never cross column boundaries). Returns the
    window partial sums as (3, 16, ncols) projective points."""
    x, y, z = pts_lm
    nbuckets = 1 << c
    total = ncols * n
    x, y, z = _mask_identity(x, y, z, (dcomp & (nbuckets - 1)) != 0, field)

    if total % _BLOCK == 0 and total // _BLOCK >= 4 * ncols * nbuckets:
        x, y, z, cd, compact = _blocked_partials(
            x, y, z, dcomp, field, ncols, nbuckets, total)
    else:
        chunk_rounds = _CHUNK.bit_length() - 1
        x, y, z = _seg_rounds(x, y, z, dcomp, total, chunk_rounds, field)
        idx = jnp.arange(total)
        is_start = jnp.concatenate([jnp.ones((1,), jnp.bool_), dcomp[1:] != dcomp[:-1]])
        start_idx = jnp.where(is_start, idx, -1)
        seg_start = jax.lax.associative_scan(jnp.maximum, start_idx)
        mask = ((idx - seg_start) % _CHUNK) == 0
        pos = jnp.nonzero(mask, size=compact, fill_value=total)[0]
        valid = pos < total
        posc = jnp.clip(pos, 0, total - 1)
        cd = jnp.where(valid, jnp.take(dcomp, posc), ncols * nbuckets)
        x = jnp.take(x, posc, axis=1)
        y = jnp.take(y, posc, axis=1)
        z = jnp.take(z, posc, axis=1)
        x, y, z = _mask_identity(x, y, z, valid, field)
        x, y, z = _seg_rounds(x, y, z, cd, compact, compact.bit_length() - 1, field)

    targets = jnp.arange(ncols * nbuckets, dtype=cd.dtype)
    pos = jnp.clip(jnp.searchsorted(cd, targets), 0, compact - 1)
    present = jnp.take(cd, pos) == targets
    bx = jnp.take(x, pos, axis=1)
    by = jnp.take(y, pos, axis=1)
    bz = jnp.take(z, pos, axis=1)
    bx, by, bz = _mask_identity(bx, by, bz, present, field)
    # (16, ncols, nbuckets) -> weighted sums via bit decomposition, batched
    digit_vals = targets.reshape(ncols, nbuckets) & (nbuckets - 1)
    bit_masks = ((digit_vals[None, :, :] >> jnp.arange(c)[:, None, None]) & 1) > 0
    # lanes: (16, c, ncols, nbuckets)
    lanes = c * ncols * nbuckets
    tx = jnp.broadcast_to(bx.reshape(16, 1, ncols, nbuckets), (16, c, ncols, nbuckets)).reshape(16, lanes)
    ty = jnp.broadcast_to(by.reshape(16, 1, ncols, nbuckets), (16, c, ncols, nbuckets)).reshape(16, lanes)
    tz = jnp.broadcast_to(bz.reshape(16, 1, ncols, nbuckets), (16, c, ncols, nbuckets)).reshape(16, lanes)
    keep = jnp.broadcast_to(bit_masks, (c, ncols, nbuckets)).reshape(lanes)
    tx, ty, tz = _mask_identity(tx, ty, tz, keep, field)

    def tree_body(r, pts):
        tx, ty, tz = pts
        s = jnp.int32(1) << r
        sh4 = (16, c * ncols, nbuckets)
        nx = jnp.roll(tx.reshape(sh4), -s, axis=2).reshape(16, lanes)
        ny = jnp.roll(ty.reshape(sh4), -s, axis=2).reshape(16, lanes)
        nz = jnp.roll(tz.reshape(sh4), -s, axis=2).reshape(16, lanes)
        return FK.ec_add_proj_lm(tx, ty, tz, nx, ny, nz, field=field)

    rounds = (nbuckets - 1).bit_length()
    tx, ty, tz = jax.lax.fori_loop(0, rounds, tree_body, (tx, ty, tz))

    # lane 0 of each (bit, col) row: S_{t,col}; Horner over bits, ncols lanes
    sel = (jnp.arange(c)[:, None] * ncols + jnp.arange(ncols)[None, :]) * nbuckets
    sel = sel.reshape(-1)  # (c*ncols,) — index into (c*ncols, nbuckets) flat
    s_t = (
        jnp.take(tx, sel, axis=1).reshape(16, c, ncols),
        jnp.take(ty, sel, axis=1).reshape(16, c, ncols),
        jnp.take(tz, sel, axis=1).reshape(16, c, ncols),
    )
    acc = tuple(v[:, c - 1, :] for v in s_t)

    def horner_bit(i, acc):
        t = c - 2 - i
        acc = FK.ec_add_proj_lm(*acc, *acc, field=field)
        st = tuple(
            jax.lax.dynamic_slice_in_dim(v, t, 1, axis=1)[:, 0, :] for v in s_t
        )
        return FK.ec_add_proj_lm(*acc, *st, field=field)

    acc = jax.lax.fori_loop(0, c - 1, horner_bit, acc)
    return jnp.stack(acc)  # (3, 16, ncols)


def msm_multi(px, py, pz, scalars, field: str = "fq", c: int = WINDOW_BITS,
              in_form: str = "jacobian"):
    """Batched Pippenger MSM: NCOLS scalar vectors over ONE shared point set
    (the SRS) in a single device program — the polynomial-commitment hot path
    (halo2 commits ~20 columns per proof; batching fills the vector lanes).

    px,py,pz: (N, 16) Jacobian Montgomery points (or limb-major (16, N)
    projective when in_form="projective"); scalars: (NCOLS, N, 16)
    plain limbs. Returns (NCOLS, 3, 16) Jacobian points."""
    ncols, n = scalars.shape[0], scalars.shape[1]
    if n <= _HOST_FALLBACK_N and jax.default_backend() != "tpu":
        outs = [
            _msm_on_host(px, py, pz, scalars[i], field, in_form)
            for i in range(ncols)
        ]
        return jnp.stack(outs)
    return _msm_multi_device(px, py, pz, scalars, field=field, c=c,
                             in_form=in_form)


@partial(jax.jit, static_argnames=("field", "c", "in_form"))
def _msm_multi_device(px, py, pz, scalars, field: str = "fq",
                      c: int = WINDOW_BITS, in_form: str = "jacobian"):
    spec = L.FP if field == "fp" else L.FQ
    ncols, n = scalars.shape[0], scalars.shape[1]
    nbuckets = 1 << c
    total = ncols * n
    # compacted width: per-column stride-CHUNK partials + bucket runs
    compact = 1 << max(1, (total // _CHUNK + ncols * nbuckets - 1).bit_length())

    if in_form == "projective":
        ppx, ppy, ppz = px, py, pz
    else:
        z2 = L.mont_mul(pz, pz, spec)
        ppx = L.mont_mul(px, pz, spec).T
        ppy = py.T
        ppz = L.mont_mul(z2, pz, spec).T
        finite = ~L.is_zero(pz)
        ppx, ppy, ppz = _mask_identity(ppx, ppy, ppz, finite, field)

    digits = jax.vmap(lambda s: _digits_all(s, c))(scalars)  # (ncols, n_win, n)
    digits = jnp.swapaxes(digits, 0, 1)  # (n_win, ncols, n)
    col_off = (jnp.arange(ncols, dtype=jnp.int32)[:, None] * nbuckets)

    def window_body(_, digits_row):
        comp = (digits_row + col_off).reshape(total)  # composite key
        order = jnp.argsort(comp)
        d = jnp.take(comp, order)
        pidx = order % n  # shared point set: same points for every column
        pts = (
            jnp.take(ppx, pidx, axis=1),
            jnp.take(ppy, pidx, axis=1),
            jnp.take(ppz, pidx, axis=1),
        )
        w = _window_reduce_multi(pts, d, field, c, ncols, n, compact)
        return None, w

    _, ws = jax.lax.scan(window_body, None, digits)  # (n_win, 3, 16, ncols)

    n_win = digits.shape[0]
    acc = tuple(ws[-1, i] for i in range(3))  # (16, ncols) each

    def horner_body(carry, w_row):
        a = jax.lax.fori_loop(
            0, c, lambda _, p: FK.ec_add_proj_lm(*p, *p, field=field), carry
        )
        a = FK.ec_add_proj_lm(*a, *(w_row[i] for i in range(3)), field=field)
        return a, None

    acc, _ = jax.lax.scan(horner_body, acc, ws[: n_win - 1][::-1])
    X, Y, Z = acc  # (16, ncols) projective limb-major

    xz = L.mont_mul(X.T, Z.T, spec)
    z2o = L.mont_mul(Z.T, Z.T, spec)
    yz2 = L.mont_mul(Y.T, z2o, spec)
    return jnp.stack([xz, yz2, Z.T], axis=1)  # (ncols, 3, 16)


_HOST_FALLBACK_N = 512


def msm(px, py, pz, scalar_limbs, field: str = "fq", c: int = WINDOW_BITS,
        in_form: str = "jacobian"):
    """Dispatch wrapper: tiny MSMs on non-TPU backends run on host (the
    XLA-CPU compile of the device graph costs minutes and is pure test
    overhead); everything else takes the compiled device path."""
    n = px.shape[1] if in_form == "projective" else px.shape[0]
    if n <= _HOST_FALLBACK_N and jax.default_backend() != "tpu":
        return _msm_on_host(px, py, pz, scalar_limbs, field, in_form)
    return _msm_device(px, py, pz, scalar_limbs, field=field, c=c, in_form=in_form)


def _msm_on_host(px, py, pz, scalar_limbs, field, in_form):
    import numpy as np

    from ..crypto.curves import PallasPoint, VestaPoint
    from ..crypto.fields import Fp, Fq

    curve = PallasPoint if field == "fp" else VestaPoint
    F = curve.FIELD
    spec = L.FP if field == "fp" else L.FQ
    if in_form == "projective":
        xs = spec.array_from_mont(np.asarray(jax.device_get(px)).T)
        ys = spec.array_from_mont(np.asarray(jax.device_get(py)).T)
        zs = spec.array_from_mont(np.asarray(jax.device_get(pz)).T)
        pts = []
        for X, Y, Z in zip(xs, ys, zs):
            if Z == 0:
                pts.append(curve.identity())
            else:
                zi = pow(Z, -1, F.MODULUS)
                pts.append(curve(F(X * zi % F.MODULUS), F(Y * zi % F.MODULUS)))
    else:
        pts = ec.points_from_device((px, py, pz), curve)
    scalars = [L.limbs_to_int(row) for row in np.asarray(jax.device_get(scalar_limbs))]
    acc = msm_host(pts, scalars)
    out = ec.points_to_device([acc])
    return jnp.stack([jnp.asarray(out[0][0]), jnp.asarray(out[1][0]), jnp.asarray(out[2][0])])


@partial(jax.jit, static_argnames=("field", "c", "in_form"))
def _msm_device(px, py, pz, scalar_limbs, field: str = "fq", c: int = WINDOW_BITS,
        in_form: str = "jacobian"):
    """MSM over a batch of points ((N,16) x3, Montgomery limbs) and
    plain-form scalar limbs (N, 16). Returns a single Jacobian point (3, 16).

    field: coordinate field of the curve ("fq" for Vesta, "fp" for Pallas).
    in_form: "jacobian" (default; converted internally) or "projective"
    (limb-major (16, N) homogeneous coordinates, identities = (0:1:0)).
    """
    spec = L.FP if field == "fp" else L.FQ
    if in_form == "projective":
        ppx, ppy, ppz = px, py, pz
        n = px.shape[1]
    else:
        n = px.shape[0]
        # Jacobian (X, Y, Z) -> homogeneous projective (X*Z : Y : Z^3), with
        # Z = 0 identities normalized to (0 : 1 : 0). Affine inputs (Z = 1)
        # pass through unchanged.
        z2 = L.mont_mul(pz, pz, spec)
        ppx = L.mont_mul(px, pz, spec).T
        ppy = py.T
        ppz = L.mont_mul(z2, pz, spec).T
        finite = ~L.is_zero(pz)
        ppx, ppy, ppz = _mask_identity(ppx, ppy, ppz, finite, field)
    digits = _digits_all(scalar_limbs, c)  # (n_win, N)

    def window_body(_, digits_row):
        order = jnp.argsort(digits_row)
        d = jnp.take(digits_row, order)
        pts = (
            jnp.take(ppx, order, axis=1),
            jnp.take(ppy, order, axis=1),
            jnp.take(ppz, order, axis=1),
        )
        w = _window_reduce(pts, d, field, c, n)
        return None, w

    _, ws = jax.lax.scan(window_body, None, digits)  # (n_win, 3, 16) projective

    # Horner combine across windows (most significant first), projective
    n_win = digits.shape[0]
    acc = tuple(ws[-1, i][:, None] for i in range(3))  # (16, 1) each

    def horner_body(carry, w_row):
        a = jax.lax.fori_loop(
            0, c, lambda _, p: FK.ec_add_proj_lm(*p, *p, field=field), carry
        )
        a = FK.ec_add_proj_lm(*a, *(w_row[i][:, None] for i in range(3)), field=field)
        return a, None

    acc, _ = jax.lax.scan(horner_body, acc, ws[: n_win - 1][::-1])
    X, Y, Z = (v[:, 0][None, :] for v in acc)  # (1, 16) row-major

    # projective (X:Y:Z) -> Jacobian (X*Z, Y*Z^2, Z)
    xz = L.mont_mul(X, Z, spec)
    z2o = L.mont_mul(Z, Z, spec)
    yz2 = L.mont_mul(Y, z2o, spec)
    return jnp.stack([xz[0], yz2[0], Z[0]])


def msm_host(points, scalars):
    """Reference host MSM (slow; tests/benchmark oracle)."""
    acc = type(points[0]).identity()
    for p, s in zip(points, scalars):
        acc = acc + p * s
    return acc


# ---------------------------------------------------------------------------
# fixed-base MSM (shifted-table): the SRS commitment hot path
# ---------------------------------------------------------------------------
#
# The prover's dominant MSMs all share ONE fixed point set (the SRS), so the
# window structure can be baked into data: precompute the shifted tables
# T[w][i] = [2^(c*w)] G_i once per domain, and MSM(s, G) collapses to a
# SINGLE bucket accumulation over W*N lanes — sum_{w,i} digit_{w,i} * T[w][i]
# — instead of W sequential window passes + a Horner doubling chain. Same
# total lane-work, but ~36 wide fused-kernel dispatches instead of ~990
# narrow ones: at k=13 a window pass is only 8192 lanes, far below what
# saturates the VPU, while the flattened form runs 2^18+-lane rounds.
# (halo2's CPU Pippenger cannot play this trick profitably — on host cores
# the extra table memory traffic beats the saved adds; on TPU the tables
# live in HBM next to the compute.)


@partial(jax.jit, static_argnames=("field", "c"))
def _make_fixed_table_dev(px, py, pz, field: str, c: int):
    """(N, 16) Jacobian Montgomery SRS -> (W*N, 16) row-major packed AFFINE
    shifted table (row w*N+i = [2^(c*w)] G_i; each row is x|y as 8 u32
    words of packed 16-bit limb pairs).

    Row-major + u16 packing because the MSM's dominant cost is the bucket
    gather: one major-axis row take beats three minor-axis (16, W*N) takes
    by ~2.7x measured. Affine rows (round 5) cut the gathered bytes by a
    further third vs the projective 24-word rows — the multiples are
    batch-normalized once at build time (one Fermat inversion over all
    W*N lanes). Requires every input point to be finite (the identity has
    no affine form); SRS/fixed-base sets always are."""
    spec = L.FP if field == "fp" else L.FQ
    n = px.shape[0]
    z2 = L.mont_mul(pz, pz, spec)
    x = L.mont_mul(px, pz, spec).T
    y = py.T
    z = L.mont_mul(z2, pz, spec).T
    finite = ~L.is_zero(pz)
    x, y, z = _mask_identity(x, y, z, finite, field)
    W = 256 // c

    def win_step(carry, _):
        x, y, z = carry
        out = (x, y, z)
        for _ in range(c):  # [2^c] multiples: c complete doublings
            x, y, z = FK.ec_add_proj_lm(x, y, z, x, y, z, field=field)
        return (x, y, z), out

    _, tables = jax.lax.scan(win_step, (x, y, z), None, length=W)
    tx, ty, tz = tables  # (W, 16, N) each
    flat = [jnp.moveaxis(t, 0, 1).reshape(16, W * n).T for t in (tx, ty, tz)]
    # batched affine normalization: x/z, y/z (projective (X:Y:Z))
    zinv = _mont_inv_jit(flat[2], field)
    xa = L.mont_mul(flat[0], zinv, spec).T
    ya = L.mont_mul(flat[1], zinv, spec).T
    packed = jnp.concatenate(
        [t[0::2] | (t[1::2] << 16) for t in (xa, ya)], axis=0)  # (16, W*N)
    return packed.T  # (W*N, 16)


@partial(jax.jit, static_argnames=("field",))
def _mont_inv_jit(v, field: str):
    return L.mont_inv(v, L.FP if field == "fp" else L.FQ)


def _unpack_rows_lm(rows_t, field: str):
    """(16, T) packed affine rows -> three (16, T) limb-major projective
    coordinate tensors (z = 1 in Montgomery form)."""
    spec = L.FP if field == "fp" else L.FQ
    outs = []
    for ci in range(2):
        p = rows_t[8 * ci : 8 * (ci + 1)]
        lo = p & jnp.uint32(0xFFFF)
        hi = p >> 16
        outs.append(jnp.stack([lo, hi], axis=1).reshape(16, -1))
    one = jnp.broadcast_to(
        jnp.asarray(np.asarray(spec.one_mont, np.uint32))[:, None],
        outs[0].shape)
    outs.append(one)
    return outs


_fixed_tables: dict = {}


_FIXED_TABLE_CAP = 3  # device-resident tables (~130 MB each at k=15, affine)


def fixed_base_table(px, py, pz, key, field: str = "fq", c: int = WINDOW_BITS):
    """Build (or fetch) the shifted table for a fixed point set. `key` is a
    hashable cache key (e.g. ("srs", k)); the table stays on device. The
    point COUNT is part of the key and re-checked on hit, so a key reused
    with a different-sized point set can never return a stale table; FIFO
    eviction bounds device residency to _FIXED_TABLE_CAP tables."""
    n = px.shape[0]
    ck = (key, n, field, c)
    entry = _fixed_tables.get(ck)
    if entry is None:
        entry = _make_fixed_table_dev(px, py, pz, field, c)
        while len(_fixed_tables) >= _FIXED_TABLE_CAP:
            _fixed_tables.pop(next(iter(_fixed_tables)))
        _fixed_tables[ck] = entry
    assert entry.shape == ((256 // c) * n, 16), "fixed-base table shape mismatch"
    return entry


@partial(jax.jit, static_argnames=("field", "c"))
def _msm_fixed_dev(tbl, scalars, field: str, c: int):
    ncols, n = scalars.shape[0], scalars.shape[1]
    W = 256 // c
    nbuckets = 1 << c
    total = ncols * W * n
    compact = 1 << max(1, (total // _CHUNK + ncols * nbuckets - 1).bit_length())

    digits = jax.vmap(lambda s: _digits_all(s, c))(scalars)  # (C, W, n)
    col_off = jnp.arange(ncols, dtype=jnp.int32)[:, None] * nbuckets
    comp = (digits.reshape(ncols, W * n) + col_off).reshape(total)
    idx_bits = max(1, (total - 1).bit_length())
    key_bits = max(1, (ncols * nbuckets - 1).bit_length())
    if idx_bits + key_bits <= 32:
        # single-operand u32 sort: key in the high bits, lane index in the
        # low bits — one sort pass instead of a (key, payload) co-sort
        packed = (comp.astype(jnp.uint32) << idx_bits) | jnp.arange(
            total, dtype=jnp.uint32)
        packed = jnp.sort(packed)
        d = (packed >> idx_bits).astype(comp.dtype)
        order = (packed & jnp.uint32((1 << idx_bits) - 1)).astype(jnp.int32)
    else:
        order = jnp.argsort(comp)
        d = jnp.take(comp, order)
    pidx = order % (W * n)  # table lanes repeat per column
    # ONE major-axis row gather of the packed 96-byte rows, then unpack —
    # measured 2.7x cheaper than three minor-axis limb-major gathers
    pts = tuple(_unpack_rows_lm(jnp.take(tbl, pidx, axis=0).T, field))
    X, Y, Z = _window_reduce_multi(pts, d, field, c, ncols, W * n, compact)
    # (3, 16, ncols) projective -> (ncols, 3, 16) Jacobian
    spec = L.FP if field == "fp" else L.FQ
    xz = L.mont_mul(X.T, Z.T, spec)
    yz2 = L.mont_mul(Y.T, L.mont_mul(Z.T, Z.T, spec), spec)
    return jnp.stack([xz, yz2, Z.T], axis=1)


def msm_fixed_multi(table, scalars, field: str = "fq", c: int = WINDOW_BITS,
                    col_chunk: int = 8):
    """Multi-column fixed-base MSM over a shifted table from
    fixed_base_table(). scalars: (C, N, 16) plain limbs. Returns
    (C, 3, 16) Jacobian Montgomery points.

    Columns are processed in chunks of `col_chunk` to bound the gathered
    working set (a chunk gathers col_chunk * W * N point lanes ~ 200 MB of
    HBM at k=13/c=8/chunk=8)."""
    C = scalars.shape[0]
    # full chunks of col_chunk columns; the remainder is padded up to the
    # next power of two (zero scalar columns reduce to identity), so the
    # compiled-shape set is tiny ({1,2,4,8} columns) and padding waste is
    # bounded by one sub-pow2 chunk
    outs = []
    lo = 0
    while lo < C:
        take = min(col_chunk, C - lo)
        size = take if take == col_chunk else 1 << (take - 1).bit_length()
        chunk = scalars[lo : lo + take]
        if size != take:
            chunk = jnp.concatenate(
                [chunk, jnp.zeros((size - take,) + chunk.shape[1:], chunk.dtype)],
                axis=0,
            )
        outs.append(_msm_fixed_dev(table, chunk, field, c)[:take])
        lo += take
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)
