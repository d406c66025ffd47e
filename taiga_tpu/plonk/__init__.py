"""Halo2-style PLONK proving system over the Pasta cycle with IPA commitments.

TPU-first inversion of the reference's design (SURVEY.md §7): circuits are
*data* — tables of gate-coefficient polynomials over named columns plus copy
constraints — authored through a row-allocating builder; witness synthesis is
exact host arithmetic (cheap), while the prover pipeline (NTTs, quotient
evaluation over the extended coset domain, Pippenger MSM commitments, IPA
multiopen) runs as batched JAX kernels on device.

Modules:
  transcript  Blake2b Fiat-Shamir transcript
  srs         IPA structured reference string (Vesta generators)
  expression  gate polynomial AST + vectorized device evaluator
  circuit     ConstraintSystem + CircuitBuilder (keygen/prove dual mode)
  keygen      proving/verifying key generation (fixed + permutation polys)
  mock        MockProver-equivalent: full gate/copy/instance check on device
  prover      proof creation pipeline
  verifier    proof verification
  ipa         inner-product-argument commitment scheme open/verify
"""
