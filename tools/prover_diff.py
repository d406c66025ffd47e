"""Stage-level differential harness: host (C++) prover vs device (XLA/TPU)
prover on the SAME circuit with the SAME deterministic randomness.

Both provers draw every blind/filler through `secrets.randbits(300)`; patching
that with a seeded PRNG makes the two paths consume identical randomness in
identical order, so a correct device pipeline must produce BIT-IDENTICAL
proof bytes. The first divergent 32-byte proof item therefore localizes the
broken stage precisely (transcript items are written in protocol order:
advice commits -> lookup permuted commits -> perm z commits -> lookup z
commits -> quotient commits -> query evals -> multiopen/IPA).

Usage: python tools/prover_diff.py [circuit] [k]
  circuit: lookup (default; tests.test_lookup.ByteRangeCircuit) | compliance
           | trivial
  k:       domain size (default: the circuit's production k)

Run under the real TPU (plain `python`) or CPU (JAX_PLATFORMS=cpu
TAIGA_FORCE_PLAIN_OPS=1) — the host-prover reference side is backend-free.
"""

import os
import random
import secrets
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _seeded_randbits(seed: int):
    rng = random.Random(seed)

    def randbits(n: int) -> int:
        return rng.getrandbits(n)

    return randbits


def build(circuit_name: str, k: int | None):
    from taiga_tpu.core.proving import get_proving_key, params_override

    if circuit_name == "compliance":
        from taiga_tpu.core.compliance import ComplianceInfo

        k = k or 13
        with params_override(compliance=k):
            rng = random.Random(7)
            ci = ComplianceInfo.random(rng)
            pis, circ = ci.build()
            pk = get_proving_key(type(circ), k)
            return pk, circ, pis.to_instance()
    if circuit_name == "trivial":
        from taiga_tpu.apps.trivial import TrivialResourceLogicCircuit
        from taiga_tpu.core.resource import Resource
        from taiga_tpu.core.resource_tree import (
            ResourceExistenceWitness,
            ResourceMerkleTreeLeaves,
        )
        from taiga_tpu.crypto.fields import Fp

        k = k or 12
        with params_override(rl=k):
            prng = random.Random(3)
            r = Resource.random(prng)
            ident = r.get_nf().inner()
            leaves = [ident] + [Fp.random(prng) for _ in range(3)]
            tree = ResourceMerkleTreeLeaves(leaves)
            w = ResourceExistenceWitness(r, tree.generate_path(ident))
            circ = TrivialResourceLogicCircuit(w)
            pk = get_proving_key(TrivialResourceLogicCircuit, k)
            return pk, circ, circ.get_public_inputs()
    # default: the byte-range lookup toy circuit at any k
    from taiga_tpu.plonk.keygen import keygen
    from tests.test_lookup import ByteRangeCircuit, INST, VALUES

    k = k or 9
    pk = keygen(ByteRangeCircuit(), k)
    return pk, ByteRangeCircuit(VALUES), INST


def proof_items(pk, proof: bytes):
    """Label every 32-byte item of the proof in protocol order."""
    vk = pk.vk
    cs = vk.cs
    from taiga_tpu.plonk.protocol import (
        NUM_H_PIECES,
        build_constraints,
        collect_queries,
        num_chunks,
    )

    labels = []
    labels += [f"advice_commit[{i}]" for i in range(cs.num_advice)]
    for i in range(len(cs.lookups)):
        labels += [f"lookup_ap_commit[{i}]", f"lookup_sp_commit[{i}]"]
    labels += [f"perm_z_commit[{i}]" for i in range(num_chunks(vk.perm_cols))]
    labels += [f"lookup_z_commit[{i}]" for i in range(len(cs.lookups))]
    labels += [f"h_commit[{i}]" for i in range(NUM_H_PIECES)]
    exprs = build_constraints(cs, vk.perm_cols, vk.usable_rows)
    queries = collect_queries(exprs, cs.num_fixed)
    labels += [f"eval[{kind},{idx},rot={rot}]" for kind, idx, rot in queries]
    labels += ["mo_c_h"]
    # a_vals: one per distinct point
    rotset = {rot % vk.n for (_, _, rot) in queries}
    labels += [f"mo_a[{i}]" for i in range(len(rotset))]
    labels += ["ipa_c_s"]
    for j in range(vk.k):
        labels += [f"ipa_L[{j}]", f"ipa_R[{j}]"]
    labels += ["ipa_a0", "ipa_f"]
    items = [proof[i : i + 32] for i in range(0, len(proof), 32)]
    return list(zip(labels + [f"extra[{i}]" for i in range(len(items) - len(labels))], items))


def main():
    circuit_name = sys.argv[1] if len(sys.argv) > 1 else "lookup"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else None

    import jax

    print(f"backend: {jax.default_backend()}", flush=True)
    pk, circ, inst = build(circuit_name, k)
    print(f"circuit={circuit_name} k={pk.vk.k}", flush=True)

    from taiga_tpu.plonk.host_prover import create_proof_host
    from taiga_tpu.plonk.prover import _create_proof_device
    from taiga_tpu.plonk.verifier import verify_proof

    orig = secrets.randbits
    try:
        secrets.randbits = _seeded_randbits(20260819)
        t0 = time.time()
        p_host = create_proof_host(pk, circ, inst)
        t_host = time.time() - t0
        secrets.randbits = _seeded_randbits(20260819)
        t0 = time.time()
        p_dev = _create_proof_device(pk, circ, inst)
        t_dev = time.time() - t0
    finally:
        secrets.randbits = orig

    ok_h = verify_proof(pk.vk, inst, p_host)
    ok_d = verify_proof(pk.vk, inst, p_dev)
    print(f"host:   {t_host:7.1f}s  verify={ok_h}")
    print(f"device: {t_dev:7.1f}s  verify={ok_d}")
    if p_host == p_dev:
        print("proof bytes IDENTICAL — device pipeline matches the host prover")
        return 0 if (ok_h and ok_d) else 1
    ih = proof_items(pk, p_host)
    idv = proof_items(pk, p_dev)
    ndiff = 0
    for (lh, bh), (_, bd) in zip(ih, idv):
        if bh != bd:
            ndiff += 1
            if ndiff <= 12:
                print(f"DIFF at {lh}: host={bh.hex()[:16]}… dev={bd.hex()[:16]}…")
    if len(ih) != len(idv):
        print(f"length mismatch: host {len(ih)} items, dev {len(idv)} items")
    print(f"{ndiff}/{len(ih)} items differ; first divergence above is the broken stage")
    return 1


if __name__ == "__main__":
    sys.exit(main())
