"""Warmup/steady-state attribution probe for the k=15 compliance proof.

Times keygen, first proof (compile warmup), second proof (steady state),
and verification — each stage printed as it completes so a timeout still
yields diagnostics.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ["TAIGA_PROFILE"] = "1"

import random

t_start = time.time()


def mark(msg):
    print(f"[{time.time() - t_start:8.1f}s] {msg}", file=sys.stderr, flush=True)


mark("importing")
import jax

mark(f"backend: {jax.default_backend()} devices: {jax.devices()}")

from taiga_tpu.core.compliance import ComplianceInfo
from taiga_tpu.core.proving import get_proving_key, set_params_size
from taiga_tpu.circuits.compliance import ComplianceCircuit

k = int(os.environ.get("PROBE_K", "15"))
set_params_size(compliance=k, rl=k)
mark(f"imports done, k={k}")

t0 = time.time()
pk = get_proving_key(ComplianceCircuit, k)
mark(f"keygen/get_proving_key: {time.time() - t0:.1f}s")

from taiga_tpu.core.ptx import ComplianceVerifyingInfo

rng = random.Random(1)
info = ComplianceInfo.random(rng)
mark("compliance info built")

t0 = time.time()
cvi = ComplianceVerifyingInfo.create(info)
mark(f"first proof (compile warmup): {time.time() - t0:.1f}s")

t0 = time.time()
cvi2 = ComplianceVerifyingInfo.create(info)
mark(f"second proof (steady state): {time.time() - t0:.1f}s")

t0 = time.time()
cvi2.verify()
mark(f"verify: {time.time() - t0:.1f}s")
mark("done")
