"""Proof creation pipeline (device-resident).

Mirrors the structure of halo2's `plonk::create_proof` (the hot loop behind
taiga_halo2/src/proof.rs:25-42) with the polynomial math on device:

  synthesize witness (host ints)                      -> advice columns
  batched iNTT + per-column Pippenger MSM             -> advice commitments
  beta, gamma -> permutation grand products (device cumprod + batched
      Fermat inversion), commit
  y -> quotient: all constraints evaluated over the 8n coset domain in ONE
      compiled program per proving key (challenges are symbolic inputs, so
      the compilation is reused across proofs), divide by Z_H, split, commit
  x -> batched polynomial evaluation at the query points (device)
  multiopen: per-point aggregation, synthetic division via suffix sums,
      and the final IPA open — all device linear algebra; only transcript
      hashing and scalar bookkeeping stay on host.

Per-proving-key device state (fixed/sigma coefficient + extended tables,
transparent domain tables) is computed once and cached on the ProvingKey.
"""

from __future__ import annotations

import os
import secrets
import sys
import time
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..crypto.curves import VestaPoint
from ..crypto.fields import Fp
from ..ops import ec, limbs as L, msm as msm_mod, ntt, poly
from .circuit import BLINDING_ROWS, EXT_FACTOR, PERM_CHUNK, CircuitBuilder
from .expression import ADVICE, FIXED, INSTANCE, TableSet, eval_device
from .ipa import ipa_open_device
from .keygen import DELTA, ProvingKey, omega_for
from .protocol import (
    L0,
    LBLIND,
    LLAST,
    LOOKUP_A,
    LOOKUP_S,
    LOOKUP_Z,
    NUM_H_PIECES,
    QUOTIENT,
    SIGMA,
    XID,
    Z,
    build_constraints,
    collect_queries,
)
from .srs import get_params, srs_device
from .transcript import ProofWriter

P = Fp.MODULUS


def _rand() -> int:
    return secrets.randbits(300) % P


class _StageTimer:
    """Per-stage wall-clock attribution (TAIGA_PROFILE=1). Blocks on the
    given arrays at each mark so device time lands in the right bucket."""

    def __init__(self):
        self.on = os.environ.get("TAIGA_PROFILE") == "1"
        self.t = time.time()

    def mark(self, name: str, *block_on):
        if not self.on:
            return
        for a in block_on:
            jax.block_until_ready(a)
        now = time.time()
        print(f"#   stage {name:28s} {now - self.t:7.3f}s", file=sys.stderr)
        self.t = now


def _mont_scalar(v: int):
    return jnp.asarray(L.int_to_limbs(v * L.FP.r % P))


def _plain_scalar(v: int):
    return jnp.asarray(L.int_to_limbs(v % P))


@lru_cache(maxsize=None)
def _ext_domain_tables(k: int):
    """Numpy Montgomery ext-coset tables xid/l0/llast/lblind and Z_H^-1 on the
    coset, all shape (8n, 16)."""
    n = 1 << k
    ke = k + 3
    usable = n - BLINDING_ROWS - 1
    g = 5
    p = P
    omega_ext = pow(5, (p - 1) >> ke, p)
    pts = [1] * (n * EXT_FACTOR)
    for i in range(1, n * EXT_FACTOR):
        pts[i] = pts[i - 1] * omega_ext % p
    xid = [g * v % p for v in pts]
    gn = pow(g, n, p)
    w8 = pow(omega_ext, n, p)
    zh8 = [(gn * pow(w8, i, p) - 1) % p for i in range(EXT_FACTOR)]
    zh8_inv = [pow(v, -1, p) for v in zh8]
    zh_inv = [zh8_inv[i % EXT_FACTOR] for i in range(n * EXT_FACTOR)]

    def indicator_ext(rows):
        base = [0] * n
        for r in rows:
            base[r] = 1
        coeffs = np.asarray(
            jax.device_get(ntt.intt(jnp.asarray(L.FP.array_to_mont(base)), k, "fp"))
        )
        padded = np.zeros((n * EXT_FACTOR, L.NLIMBS), np.uint32)
        padded[:n] = coeffs
        return np.asarray(jax.device_get(ntt.coset_ntt(jnp.asarray(padded), ke, "fp")))

    l0 = indicator_ext([0])
    llast = indicator_ext([usable])
    lblind = indicator_ext(range(usable + 1, n))
    return (
        np.asarray(L.FP.array_to_mont(xid)),
        l0,
        llast,
        lblind,
        np.asarray(L.FP.array_to_mont(zh_inv)),
    )


# ---------------------------------------------------------------------------
# compiled pipeline stages (cached per proving key)
# ---------------------------------------------------------------------------


class ProverPipeline:
    """Per-ProvingKey compiled device pipeline + cached static tables."""

    def __init__(self, pk: ProvingKey):
        self.pk = pk
        vk = pk.vk
        self.k = vk.k
        self.n = vk.n
        self.u = vk.usable_rows
        self.omega = vk.omega
        self.exprs = build_constraints(vk.cs, vk.perm_cols, self.u)
        self.queries = collect_queries(self.exprs, vk.cs.num_fixed)
        self.chunks = [
            vk.perm_cols[i : i + PERM_CHUNK]
            for i in range(0, len(vk.perm_cols), PERM_CHUNK)
        ]
        self._static = None
        self._quotient_jit = None
        self._z_jit = None
        self._lookup_as_jit = None
        self._lookup_z_jit = None
        # one-entry cache for the mesh-sharded SRS (commit_coeff_rows mesh=)
        self._srs_sharded = (None, None)

    # --- static device tables -----------------------------------------
    def static_tables(self):
        if self._static is not None:
            return self._static
        pk, k, n = self.pk, self.k, self.n
        xid, l0, llast, lblind, zh_inv = _ext_domain_tables(k)
        fixed_v = jnp.asarray(pk.fixed_mont())  # (F, n, 16) values
        sigma_v = jnp.asarray(pk.sigma_mont())
        fixed_c = ntt.intt(fixed_v, k, "fp") if fixed_v.shape[0] else fixed_v
        sigma_c = ntt.intt(sigma_v, k, "fp") if sigma_v.shape[0] else sigma_v
        self._static = {
            "xid": jnp.asarray(xid),
            "l0": jnp.asarray(l0),
            "llast": jnp.asarray(llast),
            "lblind": jnp.asarray(lblind),
            "zh_inv": jnp.asarray(zh_inv),
            "fixed_v": fixed_v,
            "sigma_v": sigma_v,
            "fixed_c": fixed_c,
            "sigma_c": sigma_c,
            "fixed_e": self.to_ext(fixed_c),
            "sigma_e": self.to_ext(sigma_c),
            "omega_pows": jnp.asarray(
                L.FP.array_to_mont(self._host_powers(self.omega, n))
            ),
        }
        return self._static

    @staticmethod
    def _host_powers(base: int, n: int):
        out = [1] * n
        for i in range(1, n):
            out[i] = out[i - 1] * base % P
        return out

    # --- shared jitted helpers (keyed by shape via jax's own cache) ----
    def values_to_coeffs(self, vals_mont):
        return ntt.intt(vals_mont, self.k, "fp")

    def to_ext(self, coeffs_mont):
        n, ke = self.n, self.k + 3
        pad = [(0, 0)] * (coeffs_mont.ndim - 2) + [(0, n * (EXT_FACTOR - 1)), (0, 0)]
        return ntt.coset_ntt(jnp.pad(coeffs_mont, pad), ke, "fp")

    # --- commitments ---------------------------------------------------
    def commit_coeff_rows(self, coeffs_mont, blinds: list[int],
                          mesh=None) -> list[VestaPoint]:
        """Commit each row of (C, n, 16) Montgomery coefficients — ONE
        batched MSM over the shared SRS bases for all C columns. When the
        arrays live on CPU devices (tests, the multi-chip dryrun's virtual
        mesh) and the native engine is built, the Pippenger runs natively:
        the XLA-CPU msm_multi compile is pathologically slow and the C++
        engine outruns it anyway."""
        from ..native import hostops as H

        if mesh is not None:
            # model-parallel commit: ONE MSM's points sharded over the mesh,
            # per-device bucket partials all-gathered and folded (ICI) —
            # SURVEY §5.8's psum-bucket-reduction MSM inside the prover.
            from jax.sharding import NamedSharding, PartitionSpec as PS

            from ..parallel import sharded

            if self._srs_sharded[0] is not mesh:
                gx, gy, gz = srs_device(self.k)
                sh = NamedSharding(mesh, PS(sharded.AXIS))
                self._srs_sharded = (mesh, tuple(
                    jax.device_put(jnp.asarray(a), sh) for a in (gx, gy, gz)
                ))
            gx, gy, gz = self._srs_sharded[1]
            plain = jax.device_put(
                _from_mont_jit(coeffs_mont),
                NamedSharding(mesh, PS(None, sharded.AXIS)),
            )
            outs = sharded.sharded_msm_multi(mesh, gx, gy, gz, plain,
                                             field="fq")
            pts = ec.points_from_device(
                (outs[:, 0], outs[:, 1], outs[:, 2]), VestaPoint
            )
            w = get_params(self.k).w
            return [pt + w * b if b else pt for pt, b in zip(pts, blinds)]

        on_cpu = all(d.platform == "cpu" for d in coeffs_mont.devices())
        if on_cpu and H.available():
            from ..native import FIELD_FP, FIELD_FQ
            from .msm_claim import srs_host_rows

            rows = srs_host_rows(self.k)
            plain_h = H.from_mont(
                FIELD_FP, H.u16_to_u64(np.asarray(jax.device_get(coeffs_mont)))
            )
            w = get_params(self.k).w
            out = []
            for i in range(plain_h.shape[0]):
                x, y, inf = H.msm(FIELD_FQ, rows, plain_h[i])
                pt = VestaPoint.identity() if inf else VestaPoint.from_xy(x, y)
                b = blinds[i]
                out.append(pt + w * b if b else pt)
            return out
        g_dev = tuple(map(jnp.asarray, srs_device(self.k)))
        plain = _from_mont_jit(coeffs_mont)
        ncols = coeffs_mont.shape[0]
        if (jax.default_backend() == "tpu"
                and not os.environ.get("TAIGA_NO_FIXED_MSM")):
            # fixed-base path: the SRS is static, so the Pippenger windows
            # are baked into a precomputed shifted table and every commit
            # is ONE wide bucket reduction (ops/msm.py msm_fixed_multi)
            table = msm_mod.fixed_base_table(*g_dev, key=("srs", self.k),
                                             field="fq")
            outs = msm_mod.msm_fixed_multi(table, plain, field="fq")
        elif ncols == 1:
            out = msm_mod.msm(g_dev[0], g_dev[1], g_dev[2], plain[0], field="fq")
            outs = out[None]
        else:
            outs = msm_mod.msm_multi(g_dev[0], g_dev[1], g_dev[2], plain, field="fq")
        pts = ec.points_from_device(
            (outs[:, 0], outs[:, 1], outs[:, 2]), VestaPoint
        )
        w = get_params(self.k).w
        return [pt + w * b if b else pt for pt, b in zip(pts, blinds)]

    # --- permutation grand products ------------------------------------
    def z_values(self, tables_by_col, beta: int, gamma: int):
        """Grand-product columns as (n_chunks, n, 16) device Montgomery
        values — cumprods, cross-chunk chaining, and blinding-row fill all
        happen on device (no host int round-trip)."""
        st = self.static_tables()
        n, u = self.n, self.u
        beta_m = _mont_scalar(beta)
        gamma_m = _mont_scalar(gamma)
        # blinding rows u+1..n-1 are random; tiny, generated host-side
        rand_rows = jnp.asarray(
            np.stack([
                L.FP.array_to_mont([_rand() for _ in range(n - u - 1)])
                for _ in self.chunks
            ])
        )

        if self._z_jit is None:
            self._z_jit = jax.jit(self._make_zfn())

        return self._z_jit(
            tables_by_col, st["sigma_v"], st["omega_pows"], beta_m, gamma_m,
            rand_rows,
        )

    def _make_zfn(self):
        chunks = self.chunks
        perm_index = {c: j for j, c in enumerate(self.pk.vk.perm_cols)}
        zu = self.u

        def zfn(cols_v, sigma_v, omega_pows, beta_m, gamma_m, rand_rows):
                # cols_v: (J, n, 16) permutation column values (Montgomery)
                nums = []
                dens = []
                for c, chunk in enumerate(chunks):
                    num = None
                    den = None
                    for j_local, col in enumerate(chunk):
                        jg = c * PERM_CHUNK + j_local
                        v = cols_v[perm_index[col]]
                        bd = L.mont_mul(
                            beta_m, jnp.asarray(L.int_to_limbs(pow(DELTA, jg, P) * L.FP.r % P)),
                            L.FP,
                        )
                        t_num = L.add(
                            L.add(v, L.mont_mul(bd, omega_pows, L.FP), L.FP), gamma_m, L.FP
                        )
                        t_den = L.add(
                            L.add(v, L.mont_mul(beta_m, sigma_v[jg], L.FP), L.FP),
                            gamma_m,
                            L.FP,
                        )
                        num = t_num if num is None else L.mont_mul(num, t_num, L.FP)
                        den = t_den if den is None else L.mont_mul(den, t_den, L.FP)
                    nums.append(num)
                    dens.append(den)
                # cp_c[i] = prod_{j<=i} num_c[j]/den_c[j], with the division
                # done by ONE single-element Fermat inversion per chunk:
                # inv(prefix_den[i]) = suffix_den_excl[i] * inv(total_den).
                # Rows >= usable hold random blinding factors that cancel in
                # the identity (nonzero w.h.p.) and are never read below.
                num_s = jnp.stack(nums)  # (C, n, 16)
                den_s = jnp.stack(dens)
                num_cp = jax.vmap(lambda a: poly.mont_cumprod(a, "fp"))(num_s)
                den_sfx = jax.vmap(lambda a: poly.mont_cumprod(a, "fp"))(
                    jnp.flip(den_s, axis=1)
                )  # reversed inclusive suffix products
                den_sfx = jnp.flip(den_sfx, axis=1)  # sfx[i] = prod_{j>=i} den[j]
                total = den_sfx[:, 0]  # (C, 16)
                inv_total = L.mont_inv(total, L.FP)  # Fermat on C elements only
                one_row = jnp.broadcast_to(
                    jnp.asarray(L.FP.one_mont, jnp.uint32), (den_sfx.shape[0], 1, L.NLIMBS)
                )
                sfx_excl = jnp.concatenate([den_sfx[:, 1:], one_row], axis=1)
                den_cp_inv = L.mont_mul(sfx_excl, inv_total[:, None, :], L.FP)
                cps = L.mont_mul(num_cp, den_cp_inv, L.FP)  # (n_chunks, n, 16)
                # chain: running_c = prod_{c'<c} cp_{c'}[u-1]; z_c[0]=running_c,
                # z_c[i+1] = running_c * cp_c[i] for i < u, blinding rows random
                one = jnp.broadcast_to(
                    jnp.asarray(L.FP.one_mont, jnp.uint32), (1, L.NLIMBS)
                )
                finals = cps[:, zu - 1]  # (C, 16)
                running = jnp.concatenate(
                    [one, poly.mont_cumprod(finals, "fp")[:-1]], axis=0
                )  # (C, 16)
                z_main = L.mont_mul(running[:, None, :], cps, L.FP)
                return jnp.concatenate(
                    [running[:, None, :], z_main[:, :zu], rand_rows], axis=1
                )  # (C, n, 16)

        return zfn

    # --- lookup argument --------------------------------------------------
    def lookup_as_values(self, advice_v, inst_v, theta: int):
        """Compressed input/table value columns for every lookup, over the
        base domain: returns (A, S) each (L, n, 16) Montgomery."""
        st = self.static_tables()
        if self._lookup_as_jit is None:
            self._lookup_as_jit = jax.jit(self._make_asfn())
        return self._lookup_as_jit(
            st["fixed_v"], advice_v, inst_v, _mont_scalar(theta)
        )

    def _make_asfn(self):
        from .expression import TableSet, eval_device

        lookups = self.pk.vk.cs.lookups

        def asfn(fixed_v, advice_v, inst_v, theta_m):
                ts = TableSet(fixed_v, advice_v, inst_v, rot_scale=1)
                ch = {"theta": theta_m}
                a_rows, s_rows = [], []
                for lk in lookups:
                    a = None
                    s = None
                    for inp, tab in lk.pairs:
                        ai = eval_device(inp, ts, ch)
                        ti = eval_device(tab, ts, ch)
                        a = ai if a is None else L.add(
                            L.mont_mul(a, theta_m, L.FP), ai, L.FP
                        )
                        s = ti if s is None else L.add(
                            L.mont_mul(s, theta_m, L.FP), ti, L.FP
                        )
                    a_rows.append(a)
                    s_rows.append(s)
                return jnp.stack(a_rows), jnp.stack(s_rows)

        return asfn

    def lookup_z_values(self, a_v, s_v, ap_v, sp_v, beta: int, gamma: int):
        """Lookup grand products: Z[0]=1, Z[i+1]=Z[i]*(A+beta)(S+gamma) /
        ((A'+beta)(S'+gamma)) over usable rows; blinding rows random.
        All inputs (L, n, 16) Montgomery."""
        n, u = self.n, self.u
        nlk = a_v.shape[0]
        rand_rows = jnp.asarray(
            np.stack([
                L.FP.array_to_mont([_rand() for _ in range(n - u - 1)])
                for _ in range(nlk)
            ])
        )
        if self._lookup_z_jit is None:
            self._lookup_z_jit = jax.jit(self._make_lzfn())
        return self._lookup_z_jit(
            a_v, s_v, ap_v, sp_v, _mont_scalar(beta), _mont_scalar(gamma),
            rand_rows,
        )

    def _make_lzfn(self):
        zu = self.u

        def lzfn(a_v, s_v, ap_v, sp_v, beta_m, gamma_m, rand_rows):
                num = L.mont_mul(
                    L.add(a_v, beta_m, L.FP), L.add(s_v, gamma_m, L.FP), L.FP
                )
                den = L.mont_mul(
                    L.add(ap_v, beta_m, L.FP), L.add(sp_v, gamma_m, L.FP), L.FP
                )
                num_cp = jax.vmap(lambda t: poly.mont_cumprod(t, "fp"))(num)
                den_sfx = jnp.flip(
                    jax.vmap(lambda t: poly.mont_cumprod(t, "fp"))(
                        jnp.flip(den, axis=1)
                    ),
                    axis=1,
                )
                total = den_sfx[:, 0]
                inv_total = L.mont_inv(total, L.FP)
                one_row = jnp.broadcast_to(
                    jnp.asarray(L.FP.one_mont, jnp.uint32),
                    (den_sfx.shape[0], 1, L.NLIMBS),
                )
                sfx_excl = jnp.concatenate([den_sfx[:, 1:], one_row], axis=1)
                den_cp_inv = L.mont_mul(sfx_excl, inv_total[:, None, :], L.FP)
                cps = L.mont_mul(num_cp, den_cp_inv, L.FP)  # (L, n, 16)
                ones = jnp.broadcast_to(
                    jnp.asarray(L.FP.one_mont, jnp.uint32),
                    (cps.shape[0], 1, L.NLIMBS),
                )
                return jnp.concatenate([ones, cps[:, :zu], rand_rows], axis=1)

        return lzfn

    # --- quotient -------------------------------------------------------
    # Evaluated in CHUNKS of expressions, each its own jitted program: XLA
    # compile time is superlinear in graph size, and the full constraint
    # list (user gates + lookups + permutation) in one graph made the
    # quotient the dominant compile. Chunks combine on host with
    # acc <- acc * y^len + partial; runtime cost is a handful of extra
    # full-domain axpys. Identical chunks across proving keys hit the
    # persistent compilation cache (same HLO).
    QUOTIENT_CHUNK = 10

    def _quotient_chunk_fn(self, grp):
        return jax.jit(self._make_quotient_chunk(grp))

    def _make_quotient_chunk(self, grp):
        rot_scale = EXT_FACTOR

        def qfn(fixed_e, sigma_e, advice_e, inst_e, z_e, lk_a_e, lk_s_e,
                lk_z_e, xid, l0, llast, lblind, beta_m, gamma_m, y_m,
                theta_m):
            ts = TableSet(None, None, None, rot_scale=rot_scale)
            ts.tables = {
                FIXED: fixed_e,
                ADVICE: advice_e,
                INSTANCE: inst_e,
                SIGMA: sigma_e,
                Z: z_e,
                LOOKUP_A: lk_a_e,
                LOOKUP_S: lk_s_e,
                LOOKUP_Z: lk_z_e,
                XID: xid[None],
                L0: l0[None],
                LLAST: llast[None],
                LBLIND: lblind[None],
            }
            ch = {"beta": beta_m, "gamma": gamma_m, "theta": theta_m}
            acc = None
            for e in grp:
                val = eval_device(e, ts, ch)
                acc = val if acc is None else L.add(
                    L.mont_mul(acc, y_m, L.FP), val, L.FP
                )
            return acc

        return qfn

    def _tape_quotient_acc(self, advice_e, inst_e, z_e, beta, gamma, y,
                           theta, lk_a_e, lk_s_e, lk_z_e):
        """Quotient numerator via the device tape interpreter: ONE compiled
        program per domain size executes the circuit-as-data instruction
        stream (ops/tape_device.py) — no per-circuit quotient compiles."""
        from ..ops import tape_device as TD
        from .tape import compile_tape

        st = self.static_tables()
        if getattr(self, "_tape", None) is None:
            self._tape = compile_tape(self.exprs, EXT_FACTOR)
        D = self.n * EXT_FACTOR
        ks = {
            FIXED: st["fixed_e"], SIGMA: st["sigma_e"], ADVICE: advice_e,
            INSTANCE: inst_e, Z: z_e,
            LOOKUP_A: lk_a_e, LOOKUP_S: lk_s_e, LOOKUP_Z: lk_z_e,
            XID: st["xid"][None], L0: st["l0"][None],
            LLAST: st["llast"][None], LBLIND: st["lblind"][None],
        }
        svals = self._tape.scalar_values(
            {"beta": beta, "gamma": gamma, "theta": theta, "y": y})
        return TD.tape_eval_device(self._tape, ks, svals, D)

    def _use_tape(self) -> bool:
        return (os.environ.get("TAIGA_DEVICE_TAPE", "1") == "1"
                and jax.default_backend() == "tpu")

    def _finish_quotient(self):
        if getattr(self, "_finish_jit", None) is None:
            k3 = self.k + 3
            mul = jax.jit(lambda acc, zh_inv: L.mont_mul(acc, zh_inv, L.FP))
            # coset_intt stays OUTSIDE the jit: traced inside, its stage
            # tables would embed as multi-MB executable constants
            self._finish_jit = lambda acc, zh: ntt.coset_intt(
                mul(acc, zh), k3, "fp")
        return self._finish_jit

    def quotient_coeffs(
        self, advice_e, inst_e, z_e, beta: int, gamma: int, y: int,
        theta: int = 0, lk_a_e=None, lk_s_e=None, lk_z_e=None,
    ):
        st = self.static_tables()
        has_lk = bool(self.pk.vk.cs.lookups)
        if self._use_tape():
            if not has_lk:
                ne = self.n * EXT_FACTOR
                empty = jnp.zeros((0, ne, L.NLIMBS), jnp.uint32)
                lk_a_e = lk_s_e = lk_z_e = empty
            acc = self._tape_quotient_acc(
                advice_e, inst_e, z_e, beta, gamma, y, theta,
                lk_a_e, lk_s_e, lk_z_e)
            return self._finish_quotient()(acc, st["zh_inv"])
        if self._quotient_jit is None:
            m = self.QUOTIENT_CHUNK
            groups = [
                tuple(self.exprs[i : i + m]) for i in range(0, len(self.exprs), m)
            ]
            k3 = self.k + 3

            _mulj = jax.jit(lambda acc, zh_inv: L.mont_mul(acc, zh_inv, L.FP))

            def finish(acc, zh_inv):
                return ntt.coset_intt(_mulj(acc, zh_inv), k3, "fp")

            self._quotient_jit = (
                [(len(g), self._quotient_chunk_fn(g)) for g in groups],
                finish,  # composed of jits; NOT wrapped (tables stay args)
            )

        if not has_lk:
            ne = self.n * EXT_FACTOR
            empty = jnp.zeros((0, ne, L.NLIMBS), jnp.uint32)
            lk_a_e = lk_s_e = lk_z_e = empty
        chunks, finish = self._quotient_jit
        args = (
            st["fixed_e"], st["sigma_e"], advice_e, inst_e, z_e,
            lk_a_e, lk_s_e, lk_z_e,
            st["xid"], st["l0"], st["llast"], st["lblind"],
            _mont_scalar(beta), _mont_scalar(gamma), _mont_scalar(y),
            _mont_scalar(theta),
        )
        acc = None
        for glen, fn in chunks:
            partial = fn(*args)
            if acc is None:
                acc = partial
            else:
                acc = _axpy_acc_jit(partial, acc, _mont_scalar(pow(y, glen, P)))
        return finish(acc, st["zh_inv"])


    # --- batched (multi-proof) variants ---------------------------------
    # One jitted program per stage with a leading proof-batch axis B: the
    # TPU-native throughput play (SURVEY §2.5 — the reference proves a ptx's
    # proofs serially, shielded_ptx.rs:98-134). The batch axis is
    # embarrassingly parallel, so under a device mesh XLA partitions it with
    # zero collectives (data parallelism over chips).
    def z_values_batch(self, cols_vb, betas, gammas):
        st = self.static_tables()
        n, u, B = self.n, self.u, cols_vb.shape[0]
        if getattr(self, "_z_jit_b", None) is None:
            self._z_jit_b = jax.jit(
                jax.vmap(self._make_zfn(), in_axes=(0, None, None, 0, 0, 0))
            )
        rand = jnp.asarray(np.stack([
            np.stack([L.FP.array_to_mont([_rand() for _ in range(n - u - 1)])
                      for _ in self.chunks])
            for _ in range(B)
        ]))
        return self._z_jit_b(
            cols_vb, st["sigma_v"], st["omega_pows"],
            jnp.stack([_mont_scalar(b) for b in betas]),
            jnp.stack([_mont_scalar(g) for g in gammas]),
            rand,
        )

    def lookup_as_values_batch(self, advice_vb, inst_vb, thetas):
        st = self.static_tables()
        if getattr(self, "_lookup_as_jit_b", None) is None:
            self._lookup_as_jit_b = jax.jit(
                jax.vmap(self._make_asfn(), in_axes=(None, 0, 0, 0))
            )
        return self._lookup_as_jit_b(
            st["fixed_v"], advice_vb, inst_vb,
            jnp.stack([_mont_scalar(t) for t in thetas]),
        )

    def lookup_z_values_batch(self, a_vb, s_vb, ap_vb, sp_vb, betas, gammas):
        n, u = self.n, self.u
        B, nlk = a_vb.shape[0], a_vb.shape[1]
        if getattr(self, "_lookup_z_jit_b", None) is None:
            self._lookup_z_jit_b = jax.jit(
                jax.vmap(self._make_lzfn(), in_axes=(0, 0, 0, 0, 0, 0, 0))
            )
        rand = jnp.asarray(np.stack([
            np.stack([L.FP.array_to_mont([_rand() for _ in range(n - u - 1)])
                      for _ in range(nlk)])
            for _ in range(B)
        ]))
        return self._lookup_z_jit_b(
            a_vb, s_vb, ap_vb, sp_vb,
            jnp.stack([_mont_scalar(b) for b in betas]),
            jnp.stack([_mont_scalar(g) for g in gammas]),
            rand,
        )

    def quotient_coeffs_batch(self, advice_eb, inst_eb, z_eb, betas, gammas,
                              ys, thetas, lk_a_eb=None, lk_s_eb=None,
                              lk_z_eb=None):
        st = self.static_tables()
        B = advice_eb.shape[0]
        has_lk = bool(self.pk.vk.cs.lookups)
        if self._use_tape():
            # per-proof tape runs (sequential dispatches; each is one cached
            # program — the vmapped chunk path would recompile per circuit)
            ne = self.n * EXT_FACTOR
            if not has_lk:
                empty = jnp.zeros((0, ne, L.NLIMBS), jnp.uint32)
                lk_a_eb = lk_s_eb = lk_z_eb = (
                    jnp.zeros((B, 0, ne, L.NLIMBS), jnp.uint32))
            finish = self._finish_quotient()
            outs = []
            for bi in range(B):
                acc = self._tape_quotient_acc(
                    advice_eb[bi], inst_eb[bi], z_eb[bi], betas[bi],
                    gammas[bi], ys[bi], thetas[bi],
                    lk_a_eb[bi], lk_s_eb[bi], lk_z_eb[bi])
                outs.append(finish(acc, st["zh_inv"]))
            return jnp.stack(outs)
        if getattr(self, "_quotient_jit_b", None) is None:
            m = self.QUOTIENT_CHUNK
            groups = [
                tuple(self.exprs[i : i + m]) for i in range(0, len(self.exprs), m)
            ]
            in_axes = (None, None, 0, 0, 0, 0, 0, 0,
                       None, None, None, None, 0, 0, 0, 0)
            k3 = self.k + 3

            _mulj = jax.jit(lambda acc, zh_inv: L.mont_mul(acc, zh_inv, L.FP))

            def finish(acc, zh_inv):
                return ntt.coset_intt(_mulj(acc, zh_inv), k3, "fp")

            def combine_one(p, a, y_pow_m):
                return L.add(p, L.mont_mul(a, y_pow_m, L.FP), L.FP)

            self._quotient_jit_b = (
                [(len(g), jax.jit(jax.vmap(self._make_quotient_chunk(g), in_axes=in_axes)))
                 for g in groups],
                finish,  # batch dim handled by the NTT's leading axes
                jax.jit(jax.vmap(combine_one, in_axes=(0, 0, 0))),
            )
        if not has_lk:
            ne = self.n * EXT_FACTOR
            empty = jnp.zeros((B, 0, ne, L.NLIMBS), jnp.uint32)
            lk_a_eb = lk_s_eb = lk_z_eb = empty
        chunks, finish, combine = self._quotient_jit_b
        beta_b = jnp.stack([_mont_scalar(v) for v in betas])
        gamma_b = jnp.stack([_mont_scalar(v) for v in gammas])
        y_b = jnp.stack([_mont_scalar(v) for v in ys])
        theta_b = jnp.stack([_mont_scalar(v) for v in thetas])
        args = (
            st["fixed_e"], st["sigma_e"], advice_eb, inst_eb, z_eb,
            lk_a_eb, lk_s_eb, lk_z_eb,
            st["xid"], st["l0"], st["llast"], st["lblind"],
            beta_b, gamma_b, y_b, theta_b,
        )
        acc = None
        for glen, fn in chunks:
            partial = fn(*args)
            if acc is None:
                acc = partial
            else:
                ypow = jnp.stack([_mont_scalar(pow(y, glen, P)) for y in ys])
                acc = combine(partial, acc, ypow)
        return finish(acc, st["zh_inv"])


def get_pipeline(pk: ProvingKey) -> ProverPipeline:
    pipe = getattr(pk, "_pipeline", None)
    if pipe is None:
        pipe = ProverPipeline(pk)
        pk._pipeline = pipe
    return pipe


@jax.jit
def _from_mont_jit(a):
    return L.from_mont(a, L.FP)


@jax.jit
def _pack_jit(a):
    return L.pack_limbs(a)


@jax.jit
def _axpy_jit(acc, v, w_m):
    """acc + w*v (Montgomery), fully jitted — eager limb ops retrace scans."""
    return L.add(acc, L.mont_mul(v, w_m, L.FP), L.FP)


@jax.jit
def _axpy_acc_jit(partial, acc, y_pow_m):
    """partial + acc * y^len — the quotient chunk combiner."""
    return L.add(partial, L.mont_mul(acc, y_pow_m, L.FP), L.FP)


@jax.jit
def _scale_jit(v, w_m):
    return L.mont_mul(v, w_m, L.FP)


@jax.jit
def _to_mont_jit(a):
    return L.to_mont(a, L.FP)


@jax.jit
def _unpack_to_mont_jit(packed):
    return L.to_mont(L.unpack_limbs(packed), L.FP)


def _cols_to_mont_dev(cols: list[list[int]]):
    """Host int columns -> (C, n, 16) device Montgomery limbs. The upload is
    PACKED (2 limbs/u32): half the bytes over the device link."""
    flat = [v for col in cols for v in col]
    packed = L.ints_to_packed(flat).reshape(len(cols), -1, L.NLIMBS // 2)
    return _unpack_to_mont_jit(jnp.asarray(packed))


@jax.jit
def _from_mont_pack_jit(a):
    return L.pack_limbs(L.from_mont(a, L.FP))


@jax.jit
def _eval_batch_jit(all_coeffs_b, pts_mont_b):
    """(B, C, n, 16) coeffs x (B, Q, 16) points -> (B, Q, C, 16) evals."""
    return jax.vmap(poly.eval_polys_at_points)(all_coeffs_b, pts_mont_b)


def _mont_rows_to_ints(rows_mont) -> list[list[int]]:
    """(C, n, 16) device Montgomery -> host int columns (packed transfer)."""
    packed = np.asarray(jax.device_get(_from_mont_pack_jit(rows_mont)))
    flat = np.ascontiguousarray(packed).reshape(-1, L.NLIMBS // 2)
    buf = flat.astype("<u4").tobytes()
    n = rows_mont.shape[1]
    vals = [
        int.from_bytes(buf[32 * i : 32 * i + 32], "little")
        for i in range(flat.shape[0])
    ]
    return [vals[c * n : (c + 1) * n] for c in range(rows_mont.shape[0])]


def _permute_lookup_pair(a_vals: list[int], s_vals: list[int], u: int):
    """halo2 lookup::permute_expression_pair: sort the input column so equal
    values are adjacent; build S' with each run-start row holding the matching
    table value (error if absent) and the rest filled with leftover table
    rows. Only the first u (usable) rows participate."""
    from collections import Counter

    a_sorted = sorted(a_vals[:u])
    leftover = Counter(s_vals[:u])
    s_perm: list[int | None] = [None] * u
    for i, v in enumerate(a_sorted):
        if i == 0 or v != a_sorted[i - 1]:
            if leftover[v] <= 0:
                raise ValueError(f"lookup failure: input value {v:#x} not in table")
            leftover[v] -= 1
            s_perm[i] = v
    # leftover fill in SORTED value order — the device permutation
    # (ops/lookup_sort.py) fills from a sorted compaction, and keeping the
    # two paths identical preserves bit-exact host/device proof parity
    # (tools/prover_diff.py)
    fill = (val for val in sorted(leftover.elements()))
    for i in range(u):
        if s_perm[i] is None:
            s_perm[i] = next(fill)
    return a_sorted, s_perm


# ---------------------------------------------------------------------------
# main prover
# ---------------------------------------------------------------------------


def _use_host_prover() -> bool:
    """Prefer the zero-compile native prover on CPU backends (tests, CPU-only
    deployments); the XLA path is the TPU throughput backend.
    TAIGA_HOST_PROVER=0/1 overrides."""
    from ..native import hostops as H

    if not H.available():
        return False
    v = os.environ.get("TAIGA_HOST_PROVER")
    if v is not None:
        return v == "1"
    # JAX_PLATFORMS=cpu wins even when a TPU plugin pinned itself into the
    # platform list at interpreter start (see ff_kernels._use_pallas)
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        return True
    return jax.default_backend() == "cpu"


def create_proof(pk: ProvingKey, circuit, instance: list[Fp]) -> bytes:
    if _use_host_prover():
        from .host_prover import create_proof_host

        return create_proof_host(pk, circuit, instance)
    return _create_proof_device(pk, circuit, instance)


def _create_proof_device(pk: ProvingKey, circuit, instance: list[Fp]) -> bytes:
    vk = pk.vk
    k, n, u = vk.k, vk.n, vk.usable_rows
    omega = vk.omega
    pipe = get_pipeline(pk)
    inst = [v.v if isinstance(v, Fp) else int(v) % P for v in instance]

    st_t = _StageTimer()

    # --- synthesize witness ------------------------------------------
    cs = vk.cs
    builder = CircuitBuilder(cs, k, "prove")
    circuit.synthesize(builder, pk.config)
    advice = builder.advice
    for col in advice:
        for i in range(u, n):
            col[i] = _rand()
    st_t.mark("witness synthesis")

    tr = ProofWriter(b"taiga-tpu-plonk")
    tr.absorb_bytes(vk.digest)
    tr.absorb_bytes(len(inst).to_bytes(4, "little"))
    for v in inst:
        tr.absorb_scalar(Fp(v))

    # --- advice commitments ------------------------------------------
    inst_col = inst + [0] * (n - len(inst))
    advice_v = _cols_to_mont_dev(advice)  # (A, n, 16)
    advice_c = pipe.values_to_coeffs(advice_v)
    advice_blinds = [_rand() for _ in advice]
    for pt in pipe.commit_coeff_rows(advice_c, advice_blinds):
        tr.write_point(pt)
    st_t.mark("advice commit")

    # --- lookup permuted columns (halo2 lookup::commit_permuted) -------
    # sort/merge/fill runs ON DEVICE (ops/lookup_sort.py) — no host round
    # trip; A'/S' commit in ONE batched MSM. The ok flags stream back
    # asynchronously and are checked at the end of the proof.
    lookups = vk.cs.lookups
    theta = 0
    lk_a_v = lk_s_v = lk_ap_v = lk_sp_v = None
    lk_ap_c = lk_sp_c = None
    lk_ap_blinds = lk_sp_blinds = []
    lk_ok = None
    inst_v = _to_mont_jit(jnp.asarray(L.ints_to_limbs(inst_col))[None])
    if lookups:
        from ..ops import lookup_sort as LS

        theta = tr.challenge(b"theta").v
        lk_a_v, lk_s_v = pipe.lookup_as_values(advice_v, inst_v, theta)
        nlk = len(lookups)
        ap_u, sp_u, lk_ok = LS.permute_pairs_device(lk_a_v, lk_s_v, u)
        try:
            lk_ok.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass  # backend lacks async copy; device_get later still works
        # blinding rows drawn per lookup ap-then-sp — the same _rand() order
        # as the host prover, keeping seeded host/device proofs bit-identical
        rand_rows = [
            np.asarray(L.FP.array_to_mont([_rand() for _ in range(n - u)]))
            for _ in range(2 * nlk)
        ]
        ap_rand = jnp.asarray(np.stack(rand_rows[0::2]))
        sp_rand = jnp.asarray(np.stack(rand_rows[1::2]))
        lk_ap_v = jnp.concatenate([ap_u, ap_rand], axis=1)
        lk_sp_v = jnp.concatenate([sp_u, sp_rand], axis=1)
        both_c = pipe.values_to_coeffs(
            jnp.concatenate([lk_ap_v, lk_sp_v], axis=0)
        )
        lk_ap_c, lk_sp_c = both_c[:nlk], both_c[nlk:]
        lk_ap_blinds = [_rand() for _ in lookups]
        lk_sp_blinds = [_rand() for _ in lookups]
        pts = pipe.commit_coeff_rows(both_c, lk_ap_blinds + lk_sp_blinds)
        for a_pt, s_pt in zip(pts[:nlk], pts[nlk:]):
            tr.write_point(a_pt)
            tr.write_point(s_pt)
        st_t.mark("lookup permuted commit")

    beta = tr.challenge(b"beta").v
    gamma = tr.challenge(b"gamma").v

    # --- permutation products ----------------------------------------
    st = pipe.static_tables()
    perm_tables = []
    for kind, idx in vk.perm_cols:
        if kind == ADVICE:
            perm_tables.append(advice_v[idx])
        elif kind == FIXED:
            perm_tables.append(st["fixed_v"][idx])
        else:
            perm_tables.append(
                _to_mont_jit(jnp.asarray(L.ints_to_limbs(inst_col)))
            )
    z_v = pipe.z_values(jnp.stack(perm_tables), beta, gamma)
    st_t.mark("perm grand products")
    z_c = pipe.values_to_coeffs(z_v)
    z_blinds = [_rand() for _ in range(z_v.shape[0])]
    lk_z_c = None
    lk_z_blinds = []
    if lookups:
        # permutation + lookup grand products commit in ONE batched MSM
        # (transcript order: z chunks, then lookup z's — unchanged)
        lk_z_v = pipe.lookup_z_values(lk_a_v, lk_s_v, lk_ap_v, lk_sp_v, beta, gamma)
        lk_z_c = pipe.values_to_coeffs(lk_z_v)
        lk_z_blinds = [_rand() for _ in lookups]
        nz = z_c.shape[0]
        pts = pipe.commit_coeff_rows(
            jnp.concatenate([z_c, lk_z_c], axis=0), z_blinds + lk_z_blinds
        )
        for pt in pts:
            tr.write_point(pt)
    else:
        for pt in pipe.commit_coeff_rows(z_c, z_blinds):
            tr.write_point(pt)
    st_t.mark("z commit")

    y = tr.challenge(b"y").v

    # --- quotient -----------------------------------------------------
    inst_c = pipe.values_to_coeffs(inst_v)
    advice_e = pipe.to_ext(advice_c)
    inst_e = pipe.to_ext(inst_c)
    z_e = pipe.to_ext(z_c)
    lk_kwargs = {}
    if lookups:
        lk_kwargs = dict(
            theta=theta,
            lk_a_e=pipe.to_ext(lk_ap_c),
            lk_s_e=pipe.to_ext(lk_sp_c),
            lk_z_e=pipe.to_ext(lk_z_c),
        )
    st_t.mark("extend advice/inst/z", advice_e, inst_e, z_e)
    h_all = pipe.quotient_coeffs(advice_e, inst_e, z_e, beta, gamma, y, **lk_kwargs)
    # degree check: pieces beyond NUM_H_PIECES*n must vanish
    tail = _from_mont_jit(h_all[NUM_H_PIECES * n :])
    assert not np.asarray(jax.device_get(tail)).any(), "quotient degree overflow"
    st_t.mark("quotient eval")
    h_pieces = h_all[: NUM_H_PIECES * n].reshape(NUM_H_PIECES, n, L.NLIMBS)
    h_blinds = [_rand() for _ in range(NUM_H_PIECES)]
    for pt in pipe.commit_coeff_rows(h_pieces, h_blinds):
        tr.write_point(pt)
    st_t.mark("h commit")

    x = tr.challenge(b"x").v

    # --- stack all committed coefficient tables -----------------------
    # order must match collect_queries kinds
    empty_c = jnp.zeros((0, n, L.NLIMBS), jnp.uint32)
    kind_stacks = {
        ADVICE: (advice_c, advice_blinds),
        FIXED: (st["fixed_c"], [0] * st["fixed_c"].shape[0]),
        SIGMA: (st["sigma_c"], [0] * st["sigma_c"].shape[0]),
        Z: (z_c, z_blinds),
        LOOKUP_A: (lk_ap_c if lookups else empty_c, lk_ap_blinds),
        LOOKUP_S: (lk_sp_c if lookups else empty_c, lk_sp_blinds),
        LOOKUP_Z: (lk_z_c if lookups else empty_c, lk_z_blinds),
        QUOTIENT: (h_pieces, h_blinds),
    }
    kind_order = (ADVICE, FIXED, SIGMA, Z, LOOKUP_A, LOOKUP_S, LOOKUP_Z, QUOTIENT)

    # --- evaluations at the query points (device) ---------------------
    # coefficient stacks STAY on device: evals at the (few) query points
    # are one compiled program and the multiopen aggregation is linear, so
    # only ~n*32B (the final IPA input) ever crosses the tunnel — the old
    # native path pulled the full ~90-column stack (~23 MB/proof at k=13).
    queries = pipe.queries
    rotset = sorted({rot % n for (_, _, rot) in queries})
    points = {rot: x * pow(omega, rot, P) % P for rot in rotset}
    all_coeffs = jnp.concatenate(
        [kind_stacks[kd][0] for kd in kind_order if kind_stacks[kd][0].shape[0]],
        axis=0,
    )
    offsets = {}
    off = 0
    for kd in kind_order:
        offsets[kd] = off
        off += kind_stacks[kd][0].shape[0]
    pts_mont = jnp.stack([_mont_scalar(points[rot]) for rot in rotset])
    evals_dev = poly.eval_polys_at_points(all_coeffs, pts_mont)  # (Q, C, 16)
    ev_np = np.asarray(jax.device_get(_from_mont_jit(evals_dev)))
    evals_host = {}
    for qi, rot in enumerate(rotset):
        row = ev_np[qi]
        for kd in kind_order:
            base = offsets[kd]
            for ci in range(kind_stacks[kd][0].shape[0]):
                evals_host[(kd, ci, rot)] = L.limbs_to_int(row[base + ci])

    evals = {}
    for kind, idx, rot in queries:
        v = evals_host[(kind, idx, rot % n)]
        evals[(kind, idx, rot)] = v
        tr.write_scalar(Fp(v))
    st_t.mark("query evals")

    # deferred lookup-failure check (flag streamed back since the lookup
    # stage; by now the async copy has long landed)
    if lk_ok is not None and not bool(np.asarray(jax.device_get(lk_ok)).all()):
        raise ValueError("lookup failure: input value not in table")

    # --- multiopen (device aggregation + native IPA tail) -------------
    from .hybrid_open import multiopen_open_hybrid

    entries = []
    for kind, idx, rot in queries:
        entries.append(
            {
                "coeff_idx": offsets[kind] + idx,
                "blind": kind_stacks[kind][1][idx],
                "point": points[rot % n],
                "value": evals[(kind, idx, rot)],
            }
        )
    multiopen_open_hybrid(pipe, all_coeffs, entries, tr)
    st_t.mark("multiopen + IPA")
    return tr.bytes()




def create_proofs_batch(pk: ProvingKey, circuits, instances, mesh=None) -> list[bytes]:
    """Prove a BATCH of instances of one circuit class in lockstep: every
    device stage runs once with a leading batch axis (B proofs' columns in
    one iNTT, one multi-column MSM, one vmapped grand-product / quotient
    program), host transcripts stay per-proof. With `mesh`, batch-axis
    arrays are sharded across the mesh — data-parallel proving over chips
    with no collectives (each proof's math touches only its own slice).

    The reference proves a partial transaction's proofs serially
    (shielded_ptx.rs:98-134); this is the batched TPU counterpart. Returns
    one proof byte-string per instance; each verifies independently."""
    return _batch_phase2(_batch_phase1(pk, circuits, instances, mesh))


def create_proofs_pipelined(jobs, chunk: int = 8) -> list[list[bytes]]:
    """Prove several batches with the host-bound multiopen/IPA tails of each
    batch OVERLAPPED with the next batch's device stages.

    jobs: [(pk, circuits, instances), ...] — batches may use different
    proving keys (e.g. a partial transaction's compliance batch followed by
    its resource-logic batches). Within a job, batches longer than `chunk`
    are split. The per-proof native IPA tails are pure host work (the C++
    engine releases the GIL), so running them on a worker thread while the
    main thread dispatches the next chunk's device stages hides them
    entirely except for the final chunk's. Returns one list of proof byte
    strings per job, in order.

    The reference proves every proof serially (shielded_ptx.rs:98-134);
    this is the cross-batch software pipeline on top of the lockstep
    batches."""
    from concurrent.futures import ThreadPoolExecutor

    pieces = []  # (job_idx, phase1-args)
    for ji, (pk, circuits, instances) in enumerate(jobs):
        for lo in range(0, len(circuits), chunk):
            pieces.append((ji, pk, circuits[lo:lo + chunk],
                           instances[lo:lo + chunk]))
    results: list[list[bytes]] = [[] for _ in jobs]
    with ThreadPoolExecutor(max_workers=1) as ex:
        fut = None
        fut_ji = None
        for ji, pk, cs, insts in pieces:
            state = _batch_phase1(pk, cs, insts, None)
            if fut is not None:
                results[fut_ji].extend(fut.result())
            fut = ex.submit(_batch_phase2, state)
            fut_ji = ji
        if fut is not None:
            results[fut_ji].extend(fut.result())
    return results


def _batch_phase1(pk: ProvingKey, circuits, instances, mesh=None):
    """Device-heavy front of the lockstep batch: witness synthesis through
    query evals. Returns the state _batch_phase2 needs to finish."""
    from jax.sharding import NamedSharding, PartitionSpec as PS

    vk = pk.vk
    k, n, u = vk.k, vk.n, vk.usable_rows
    omega = vk.omega
    pipe = get_pipeline(pk)
    B = len(circuits)
    assert B == len(instances) and B >= 1
    cs = vk.cs
    lookups = cs.lookups
    st_t = _StageTimer()

    def shard(arr):
        if mesh is None:
            return arr
        spec = PS("shards", *([None] * (arr.ndim - 1)))
        return jax.device_put(arr, NamedSharding(mesh, spec))

    # --- synthesize all witnesses -------------------------------------
    insts = [[v.v if isinstance(v, Fp) else int(v) % P for v in inst]
             for inst in instances]
    advices = []
    for circuit in circuits:
        builder = CircuitBuilder(cs, k, "prove")
        circuit.synthesize(builder, pk.config)
        for col in builder.advice:
            for i in range(u, n):
                col[i] = _rand()
        advices.append(builder.advice)
    st_t.mark("witness synthesis (batch)")

    trs = []
    for inst in insts:
        tr = ProofWriter(b"taiga-tpu-plonk")
        tr.absorb_bytes(vk.digest)
        tr.absorb_bytes(len(inst).to_bytes(4, "little"))
        for v in inst:
            tr.absorb_scalar(Fp(v))
        trs.append(tr)

    # --- advice commitments (one batched MSM over B*C columns) --------
    ncols = cs.num_advice
    plain = np.stack([
        L.ints_to_packed([v for col in adv for v in col]).reshape(ncols, n, L.NLIMBS // 2)
        for adv in advices
    ])
    advice_vb = shard(_unpack_to_mont_jit(jnp.asarray(plain)))  # (B, C, n, 16)
    inst_cols = [inst + [0] * (n - len(inst)) for inst in insts]
    inst_vb = shard(_unpack_to_mont_jit(jnp.asarray(np.stack([
        L.ints_to_packed(col).reshape(1, n, L.NLIMBS // 2) for col in inst_cols
    ]))))
    advice_cb = pipe.values_to_coeffs(advice_vb)
    advice_blinds = [[_rand() for _ in range(ncols)] for _ in range(B)]
    pts = pipe.commit_coeff_rows(
        advice_cb.reshape(B * ncols, n, L.NLIMBS),
        [b for bs in advice_blinds for b in bs],
    )
    for bi, tr in enumerate(trs):
        for pt in pts[bi * ncols : (bi + 1) * ncols]:
            tr.write_point(pt)
    st_t.mark("advice commit (batch)")

    # --- lookups --------------------------------------------------------
    thetas = [0] * B
    lk_ap_vb = lk_sp_vb = lk_ap_cb = lk_sp_cb = None
    lk_a_vb = lk_s_vb = None
    lk_ap_blinds = [[] for _ in range(B)]
    lk_sp_blinds = [[] for _ in range(B)]
    nlk = len(lookups)
    lk_ok = None
    if lookups:
        from ..ops import lookup_sort as LS

        thetas = [tr.challenge(b"theta").v for tr in trs]
        lk_a_vb, lk_s_vb = pipe.lookup_as_values_batch(advice_vb, inst_vb, thetas)
        # device sort/merge/fill over all B*L lookup columns in one program
        ap_u, sp_u, lk_ok = LS.permute_pairs_device(
            lk_a_vb.reshape(B * nlk, n, L.NLIMBS),
            lk_s_vb.reshape(B * nlk, n, L.NLIMBS), u)
        try:
            lk_ok.copy_to_host_async()
        except (AttributeError, NotImplementedError):
            pass  # backend lacks async copy; device_get later still works
        # per (proof, lookup) ap-then-sp rand order (matches the host prover)
        rand_rows = [
            np.asarray(L.FP.array_to_mont([_rand() for _ in range(n - u)]))
            for _ in range(2 * B * nlk)
        ]
        ap_rand = jnp.asarray(np.stack(rand_rows[0::2]))
        sp_rand = jnp.asarray(np.stack(rand_rows[1::2]))
        lk_ap_vb = shard(jnp.concatenate([ap_u, ap_rand], axis=1)
                         .reshape(B, nlk, n, L.NLIMBS))
        lk_sp_vb = shard(jnp.concatenate([sp_u, sp_rand], axis=1)
                         .reshape(B, nlk, n, L.NLIMBS))
        lk_ap_cb = pipe.values_to_coeffs(lk_ap_vb)
        lk_sp_cb = pipe.values_to_coeffs(lk_sp_vb)
        lk_ap_blinds = [[_rand() for _ in range(nlk)] for _ in range(B)]
        lk_sp_blinds = [[_rand() for _ in range(nlk)] for _ in range(B)]
        pts = pipe.commit_coeff_rows(
            jnp.concatenate([lk_ap_cb, lk_sp_cb], axis=1)
            .reshape(B * 2 * nlk, n, L.NLIMBS),
            [b for bi in range(B)
             for b in lk_ap_blinds[bi] + lk_sp_blinds[bi]])
        for bi, tr in enumerate(trs):
            base = bi * 2 * nlk
            for li in range(nlk):
                tr.write_point(pts[base + li])
                tr.write_point(pts[base + nlk + li])
        st_t.mark("lookup permuted commit (batch)")

    betas = [tr.challenge(b"beta").v for tr in trs]
    gammas = [tr.challenge(b"gamma").v for tr in trs]

    # --- permutation products -------------------------------------------
    st = pipe.static_tables()
    cols_list = []
    for bi in range(B):
        per_proof = []
        for kind, idx in vk.perm_cols:
            if kind == ADVICE:
                per_proof.append(advice_vb[bi, idx])
            elif kind == FIXED:
                per_proof.append(st["fixed_v"][idx])
            else:
                per_proof.append(inst_vb[bi, 0])
        cols_list.append(jnp.stack(per_proof))
    cols_vb = jnp.stack(cols_list)
    z_vb = pipe.z_values_batch(cols_vb, betas, gammas)
    st_t.mark("perm grand products (batch)")
    z_cb = pipe.values_to_coeffs(z_vb)
    nz = z_vb.shape[1]
    z_blinds = [[_rand() for _ in range(nz)] for _ in range(B)]
    lk_z_cb = None
    lk_z_blinds = [[] for _ in range(B)]
    if lookups:
        # z + lookup-z commit in ONE batched MSM (transcript order per
        # proof: z chunks then lookup z's — unchanged)
        lk_z_vb = pipe.lookup_z_values_batch(
            lk_a_vb, lk_s_vb, lk_ap_vb, lk_sp_vb, betas, gammas)
        lk_z_cb = pipe.values_to_coeffs(lk_z_vb)
        lk_z_blinds = [[_rand() for _ in range(nlk)] for _ in range(B)]
        allpts = pipe.commit_coeff_rows(
            jnp.concatenate([z_cb, lk_z_cb], axis=1)
            .reshape(B * (nz + nlk), n, L.NLIMBS),
            [b for bi in range(B) for b in z_blinds[bi] + lk_z_blinds[bi]])
        for bi, tr in enumerate(trs):
            for pt in allpts[bi * (nz + nlk) : (bi + 1) * (nz + nlk)]:
                tr.write_point(pt)
    else:
        zpts = pipe.commit_coeff_rows(
            z_cb.reshape(B * nz, n, L.NLIMBS),
            [b for bs in z_blinds for b in bs])
        for bi, tr in enumerate(trs):
            for pt in zpts[bi * nz : (bi + 1) * nz]:
                tr.write_point(pt)
    st_t.mark("z commit (batch)")

    ys = [tr.challenge(b"y").v for tr in trs]

    # --- quotient ---------------------------------------------------------
    inst_cb = pipe.values_to_coeffs(inst_vb)
    advice_eb = pipe.to_ext(advice_cb)
    inst_eb = pipe.to_ext(inst_cb)
    z_eb = pipe.to_ext(z_cb)
    lk_kwargs = {}
    if lookups:
        lk_kwargs = dict(
            lk_a_eb=pipe.to_ext(lk_ap_cb),
            lk_s_eb=pipe.to_ext(lk_sp_cb),
            lk_z_eb=pipe.to_ext(lk_z_cb),
        )
    st_t.mark("extend (batch)", advice_eb, inst_eb, z_eb)
    h_all_b = pipe.quotient_coeffs_batch(
        advice_eb, inst_eb, z_eb, betas, gammas, ys, thetas, **lk_kwargs)
    tail = _from_mont_jit(h_all_b[:, NUM_H_PIECES * n :])
    assert not np.asarray(jax.device_get(tail)).any(), "quotient degree overflow"
    st_t.mark("quotient eval (batch)")
    h_pieces_b = h_all_b[:, : NUM_H_PIECES * n].reshape(B, NUM_H_PIECES, n, L.NLIMBS)
    h_blinds = [[_rand() for _ in range(NUM_H_PIECES)] for _ in range(B)]
    hpts = pipe.commit_coeff_rows(
        h_pieces_b.reshape(B * NUM_H_PIECES, n, L.NLIMBS),
        [b for bs in h_blinds for b in bs])
    for bi, tr in enumerate(trs):
        for pt in hpts[bi * NUM_H_PIECES : (bi + 1) * NUM_H_PIECES]:
            tr.write_point(pt)
    st_t.mark("h commit (batch)")

    xs = [tr.challenge(b"x").v for tr in trs]

    # --- batched device evals + hybrid multiopen ------------------------
    # coefficient stacks stay ON DEVICE (the old path pulled ~B*23 MB of
    # packed coefficients over the ~10 MB/s tunnel); evals are one vmapped
    # program and only the per-proof aggregate f (B*n*32B) is pulled for
    # the threaded native IPA tails.
    kind_order = (ADVICE, FIXED, SIGMA, Z, LOOKUP_A, LOOKUP_S, LOOKUP_Z, QUOTIENT)
    queries = pipe.queries
    empty_b = jnp.zeros((B, 0, n, L.NLIMBS), jnp.uint32)
    fixed_b = jnp.broadcast_to(st["fixed_c"][None], (B,) + st["fixed_c"].shape)
    sigma_b = jnp.broadcast_to(st["sigma_c"][None], (B,) + st["sigma_c"].shape)
    kind_stacks_b = {
        ADVICE: (advice_cb, advice_blinds),
        FIXED: (fixed_b, [[0] * st["fixed_c"].shape[0]] * B),
        SIGMA: (sigma_b, [[0] * st["sigma_c"].shape[0]] * B),
        Z: (z_cb, z_blinds),
        LOOKUP_A: (lk_ap_cb if lookups else empty_b, lk_ap_blinds),
        LOOKUP_S: (lk_sp_cb if lookups else empty_b, lk_sp_blinds),
        LOOKUP_Z: (lk_z_cb if lookups else empty_b, lk_z_blinds),
        QUOTIENT: (h_pieces_b, h_blinds),
    }
    all_coeffs_b = jnp.concatenate(
        [kind_stacks_b[kd][0] for kd in kind_order
         if kind_stacks_b[kd][0].shape[1]], axis=1)  # (B, C, n, 16)
    offsets = {}
    off = 0
    for kd in kind_order:
        offsets[kd] = off
        off += kind_stacks_b[kd][0].shape[1]
    rotset = sorted({rot % n for (_, _, rot) in queries})
    points_b = [
        {rot: xs[bi] * pow(omega, rot, P) % P for rot in rotset}
        for bi in range(B)
    ]
    pts_mont_b = jnp.asarray(np.stack([
        np.stack([L.int_to_limbs(points_b[bi][rot] * L.FP.r % P)
                  for rot in rotset])
        for bi in range(B)]))
    evals_dev = _eval_batch_jit(all_coeffs_b, pts_mont_b)  # (B, Q, C, 16)
    ev_np = np.asarray(jax.device_get(_from_mont_jit(evals_dev)))
    if lk_ok is not None and not bool(np.asarray(jax.device_get(lk_ok)).all()):
        raise ValueError("lookup failure: input value not in table")

    entries_b = []
    for bi, tr in enumerate(trs):
        evals_host = {}
        for qi, rot in enumerate(rotset):
            row = ev_np[bi, qi]
            for kd in kind_order:
                base = offsets[kd]
                for ci in range(kind_stacks_b[kd][0].shape[1]):
                    evals_host[(kd, ci, rot)] = L.limbs_to_int(row[base + ci])
        entries = []
        for kind, idx, rot in queries:
            v = evals_host[(kind, idx, rot % n)]
            tr.write_scalar(Fp(v))
            entries.append({
                "coeff_idx": offsets[kind] + idx,
                "blind": kind_stacks_b[kind][1][bi][idx],
                "point": points_b[bi][rot % n],
                "value": v,
            })
        entries_b.append(entries)
    st_t.mark("query evals (batch)")
    return pipe, all_coeffs_b, entries_b, trs, st_t


def _batch_phase2(state) -> list[bytes]:
    """Host-bound tail of the lockstep batch: hybrid multiopen + native IPA
    opens. Runs on a worker thread in create_proofs_pipelined."""
    pipe, all_coeffs_b, entries_b, trs, st_t = state
    from .hybrid_open import multiopen_open_hybrid_batch

    multiopen_open_hybrid_batch(pipe, all_coeffs_b, entries_b, trs)
    st_t.mark("multiopen + IPA (batch)")
    return [tr.bytes() for tr in trs]


def multiopen_open_device(pipe, kind_stacks, offsets, all_coeffs, entries, tr):
    """Shplonk-style aggregation then a single IPA open, on device."""
    k, n = pipe.k, pipe.n
    params = get_params(k)
    v_ch = tr.challenge(b"mo-v").v
    groups: dict[int, list[dict]] = {}
    order = []
    for e in entries:
        if e["point"] not in groups:
            groups[e["point"]] = []
            order.append(e["point"])
        groups[e["point"]].append(e)

    # aggregate each group: coeffs = sum v^i A_i (device), blind/value host
    agg = []
    for ptv in order:
        weights = []
        idxs = []
        blind = 0
        value = 0
        vp = 1
        for e in groups[ptv]:
            kind, ci = e["coeff_ref"]
            idxs.append(offsets[kind] + ci)
            weights.append(vp)
            blind = (blind + vp * e["blind"]) % P
            value = (value + vp * e["value"]) % P
            vp = vp * v_ch % P
        w_m = jnp.stack([_mont_scalar(w) for w in weights])
        sel = jnp.take(all_coeffs, jnp.asarray(idxs), axis=0)
        coeff = poly.mont_linear_combo(sel, w_m)
        agg.append({"point": ptv, "coeffs": coeff, "blind": blind, "value": value})

    u_ch = tr.challenge(b"mo-u").v
    # h = sum u^j (A_j - a_j) / (X - p_j)
    h = None
    up = 1
    for g in agg:
        q = poly.synthetic_div(
            g["coeffs"], _mont_scalar(g["point"]),
            _mont_scalar(pow(g["point"], -1, P)),
        )
        w = _mont_scalar(up)
        h = _scale_jit(q, w) if h is None else _axpy_jit(h, q, w)
        up = up * u_ch % P

    h_blind = _rand()
    c_h = pipe.commit_coeff_rows(h[None], [h_blind])[0]
    tr.write_point(c_h)
    x3 = tr.challenge(b"mo-x3").v
    x3_m = _mont_scalar(x3)
    a_dev = poly.eval_polys_at_points(
        jnp.stack([g["coeffs"] for g in agg]), x3_m[None]
    )[0]
    a_np = np.asarray(jax.device_get(_from_mont_jit(a_dev)))
    a_vals = [L.limbs_to_int(a_np[i]) for i in range(len(agg))]
    for av in a_vals:
        tr.write_scalar(Fp(av))
    w_ch = tr.challenge(b"mo-w").v
    f = h
    f_blind = h_blind
    wp = w_ch
    for g in agg:
        f = _axpy_jit(f, g["coeffs"], _mont_scalar(wp))
        f_blind = (f_blind + wp * g["blind"]) % P
        wp = wp * w_ch % P
    ipa_open_device(params, f, f_blind, x3, tr)
