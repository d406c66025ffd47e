"""taiga_tpu — a TPU-native shielded state-transition ("resource machine") framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of anoma/taiga
(reference: /root/reference, Rust + halo2). State lives in immutable resources;
transitions consume inputs (revealing Poseidon nullifiers) and create outputs
(Merkle-tree note commitments); every transition is proven with a Halo2-style
PLONK proof over the Pasta curve cycle (Pallas/Vesta) with IPA polynomial
commitments. The proving math (field/curve limb arithmetic, Poseidon, NTT,
Pippenger MSM, IPA) runs as batched JAX/Pallas TPU kernels.

Layer map (mirrors SURVEY.md §1):
  crypto/    L1 primitive layer: Pasta fields & curves, Poseidon, Blake2, RedDSA
  ops/       TPU kernels: limb field arithmetic, batched Poseidon, NTT, MSM
  plonk/     the proving system: constraint system, keygen, prover, verifier, IPA
  core/      L2/L4 data model + transaction layer: Resource, nullifier, trees,
             compliance, partial transactions, transactions, public API
  circuits/  L3 circuit layer: compliance circuit, resource-logic framework, gadgets
  apps/      L6 applications: token, signature-verification, receiver, intents
  parallel/  multi-chip sharding: batch proving, sharded MSM/NTT over a Mesh
"""

__version__ = "0.1.0"


def _setup_compile_cache():
    """Point JAX's persistent compilation cache at a shared on-disk dir.

    The prover's jit programs (quotient, multiopen, IPA) take minutes to
    compile at k=15; the persistent cache turns every later process's warmup
    into a disk load. The env-var path (JAX_COMPILATION_CACHE_DIR) is not
    honored reliably on this backend, so set the config explicitly — before
    any jit compilation, which importing submodules may trigger."""
    import os

    try:
        import jax

        cache_dir = os.environ.get(
            "TAIGA_JAX_CACHE",
            os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # cache is an optimization; never block import


_setup_compile_cache()
