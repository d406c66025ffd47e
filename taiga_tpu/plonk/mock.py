"""MockProver equivalent: evaluate every gate over the whole domain on device
and check satisfaction, copies, and instance bindings — without proving.

The reference's single most valuable test asset (SURVEY.md §4: MockProver is
the workhorse of all 15 circuit test files, and powers the *transparent*
execution path, taiga_halo2/src/transparent_ptx.rs:40-98). Ours evaluates all
gate polynomials vectorized over the 2^k domain via the same expression
evaluator the real prover uses for the quotient — one code path, two uses.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..crypto.fields import Fp
from ..ops import limbs as L
from .circuit import Circuit, CircuitBuilder
from .expression import ADVICE, FIXED, INSTANCE, TableSet, eval_device

P = Fp.MODULUS


class VerifyFailure(Exception):
    pass


class MockProver:
    def __init__(self, k: int, builder: CircuitBuilder, instance: list[int]):
        self.k = k
        self.n = 1 << k
        self.builder = builder
        self.instance = [v % P for v in instance] + [0] * (self.n - len(instance))

    @classmethod
    def run(cls, k: int, circuit: Circuit, instance: list[Fp]) -> "MockProver":
        cs, config = type(circuit).build_cs()
        builder = CircuitBuilder(cs, k, "prove")
        circuit.synthesize(builder, config)
        return cls(k, builder, [v.v if isinstance(v, Fp) else v for v in instance])

    def _tables(self) -> TableSet:
        b = self.builder
        to_mont = lambda cols: (
            np.stack([np.asarray(L.FP.array_to_mont(c)) for c in cols])
            if cols
            else np.zeros((0, self.n, L.NLIMBS), np.uint32)
        )
        return TableSet(
            jnp.asarray(to_mont(b.fixed)),
            jnp.asarray(to_mont(b.advice)),
            jnp.asarray(to_mont([self.instance])),
        )

    def verify(self) -> list[str]:
        """Returns a list of failure descriptions (empty == satisfied)."""
        failures = []
        b = self.builder
        ts = self._tables()
        for gate in b.cs.gates:
            vals = eval_device(gate.poly, ts)
            nz = np.asarray(jnp.nonzero(~L.is_zero(vals), size=self.n, fill_value=-1)[0])
            bad_rows = [int(r) for r in nz if r >= 0]
            if bad_rows:
                failures.append(
                    f"gate '{gate.name}' not satisfied at rows {bad_rows[:8]}"
                    + ("..." if len(bad_rows) > 8 else "")
                )
        # copy constraints
        tables = {FIXED: b.fixed, ADVICE: b.advice, INSTANCE: [self.instance]}
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
