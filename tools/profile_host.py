"""Profile the host (C++) prover at production config: compliance k=13."""
import os, sys, time
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ["TAIGA_PROFILE"] = "1"
os.environ["TAIGA_HOST_PROVER"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from taiga_tpu.core.proving import get_proving_key, params_override
from taiga_tpu.core.compliance import ComplianceInfo
from taiga_tpu.plonk.host_prover import create_proof_host
from taiga_tpu.plonk.verifier import verify_proof
import random

K = int(os.environ.get("PROF_K", "13"))
with params_override(compliance=K):
    rng = random.Random(7)
    ci = ComplianceInfo.random(rng)
    pis, circuit = ci.build()
    t0 = time.time()
    pk = get_proving_key(type(circuit), K)
    print(f"keygen/load: {time.time()-t0:.1f}s", flush=True)
    inst = pis.to_instance()
    for rep in range(int(os.environ.get("PROF_REPS", "2"))):
        t0 = time.time()
        proof = create_proof_host(pk, circuit, inst)
        t1 = time.time()
        ok = verify_proof(pk.vk, inst, proof)
        t2 = time.time()
        print(f"rep{rep}: prove {t1-t0:.2f}s verify {t2-t1:.3f}s ok={ok}", flush=True)
