"""MockProver equivalent: evaluate every gate over the whole domain on device
and check satisfaction, copies, and instance bindings — without proving.

The reference's single most valuable test asset (SURVEY.md §4: MockProver is
the workhorse of all 15 circuit test files, and powers the *transparent*
execution path, taiga_halo2/src/transparent_ptx.rs:40-98). Ours evaluates all
gate polynomials vectorized over the 2^k domain in ONE compiled program per
(circuit class, k) — the checker is cached and reused across instances, so a
transparent transaction's repeated logic checks cost one compile + cheap
evaluations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..crypto.fields import Fp
from ..ops import limbs as L
from .circuit import Circuit, CircuitBuilder
from .expression import ADVICE, FIXED, INSTANCE, TableSet, eval_device, eval_host

P = Fp.MODULUS

_CHECKER_CACHE: dict = {}


class VerifyFailure(Exception):
    pass


@jax.jit
def _to_mont_jit(a):
    return L.to_mont(a, L.FP)


def _gate_checker(gates):
    """Compiled fn(fixed, advice, instance) -> (num_gates, n) nonzero mask."""

    def fn(fixed, advice, instance):
        ts = TableSet(fixed, advice, instance)
        masks = []
        for g in gates:
            vals = eval_device(g.poly, ts)
            masks.append(~L.is_zero(vals))
        return jnp.stack(masks)

    return jax.jit(fn)


class MockProver:
    def __init__(self, k: int, builder: CircuitBuilder, instance: list[int],
                 circuit_cls=None):
        self.k = k
        self.n = 1 << k
        self.builder = builder
        self.circuit_cls = circuit_cls
        self.instance = [v % P for v in instance] + [0] * (self.n - len(instance))

    @classmethod
    def run(cls, k: int, circuit: Circuit, instance: list[Fp]) -> "MockProver":
        cs, config = type(circuit).build_cs()
        builder = CircuitBuilder(cs, k, "prove")
        circuit.synthesize(builder, config)
        return cls(k, builder, [v.v if isinstance(v, Fp) else v for v in instance],
                   circuit_cls=type(circuit))

    def _tables(self):
        b = self.builder

        def to_mont(cols):
            if not cols:
                return jnp.zeros((0, self.n, L.NLIMBS), jnp.uint32)
            flat = [v for col in cols for v in col]
            plain = L.ints_to_limbs(flat).reshape(len(cols), self.n, L.NLIMBS)
            return _to_mont_jit(jnp.asarray(plain))

        return to_mont(b.fixed), to_mont(b.advice), to_mont([self.instance])

    def verify(self) -> list[str]:
        """Returns a list of failure descriptions (empty == satisfied)."""
        failures = []
        b = self.builder
        fixed, advice, instance = self._tables()
        key = (self.circuit_cls, self.k) if self.circuit_cls else id(b.cs)
        checker = _CHECKER_CACHE.get(key)
        if checker is None:
            checker = _gate_checker(tuple(b.cs.gates))
            _CHECKER_CACHE[key] = checker
        masks = np.asarray(jax.device_get(checker(fixed, advice, instance)))
        for gi, gate in enumerate(b.cs.gates):
            bad_rows = np.nonzero(masks[gi])[0]
            if bad_rows.size:
                failures.append(
                    f"gate '{gate.name}' not satisfied at rows {bad_rows[:8].tolist()}"
                    + ("..." if bad_rows.size > 8 else "")
                )
        # lookup arguments: every usable row's input tuple must appear among
        # the table tuples (halo2 MockProver checks lookups the same way)
        tables = {FIXED: b.fixed, ADVICE: b.advice, INSTANCE: [self.instance]}
        usable = b.usable_rows
        for lk in b.cs.lookups:
            table_rows = set()
            for r in range(usable):
                table_rows.add(tuple(
                    eval_host(tab, r, self.n, b.fixed, b.advice, [self.instance])
                    for _, tab in lk.pairs
                ))
            for r in range(usable):
                tup = tuple(
                    eval_host(inp, r, self.n, b.fixed, b.advice, [self.instance])
                    for inp, _ in lk.pairs
                )
                if tup not in table_rows:
                    failures.append(
                        f"lookup '{lk.name}' failed at row {r}: "
                        f"{tuple(hex(v) for v in tup)} not in table"
                    )
        # copy constraints
        for (ak, ai, ar), (bk, bi, br) in b.copies:
            va = tables[ak][ai][ar]
            vb = tables[bk][bi][br]
            if va != vb:
                failures.append(
                    f"copy mismatch: {ak}[{ai}][{ar}]={va:#x} != {bk}[{bi}][{br}]={vb:#x}"
                )
        return failures

    def assert_satisfied(self):
        failures = self.verify()
        if failures:
            raise VerifyFailure("; ".join(failures))
