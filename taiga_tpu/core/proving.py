"""Proof plumbing: proving-key cache, Proof wrapper, RL verifying info.

The reference re-keygens a proving key per resource-logic proof (~4s,
taiga_halo2 constant.rs:6146 comment); here every circuit class keygens once
per (class, k) and is cached in memory (SURVEY.md §7 hard part #6).

`Proof` wraps raw transcript bytes (reference src/proof.rs). Verifying info
structs bundle proof + public inputs per circuit, as in shielded_ptx.rs.
"""

from __future__ import annotations

import threading

from ..crypto.fields import Fp
from .constants import (
    COMPLIANCE_CIRCUIT_PARAMS_SIZE,
    RESOURCE_LOGIC_CIRCUIT_PARAMS_SIZE,
    RESOURCE_LOGIC_CIRCUIT_PUBLIC_INPUT_NUM,
    RESOURCE_LOGIC_CIRCUIT_RESOURCE_MERKLE_ROOT_IDX,
    RESOURCE_LOGIC_CIRCUIT_SELF_RESOURCE_ID_IDX,
)
from .error import ProofError

# Test hook: shrink circuit domains (keygen/prove cost) without touching the
# protocol code. Production parity value is 15 (reference constant.rs:123).
_PARAMS_OVERRIDE: dict[str, int] = {}


def compliance_k() -> int:
    return _PARAMS_OVERRIDE.get("compliance", COMPLIANCE_CIRCUIT_PARAMS_SIZE)


def resource_logic_k() -> int:
    return _PARAMS_OVERRIDE.get("rl", RESOURCE_LOGIC_CIRCUIT_PARAMS_SIZE)


def set_params_size(compliance: int | None = None, rl: int | None = None):
    if compliance is not None:
        _PARAMS_OVERRIDE["compliance"] = compliance
    if rl is not None:
        _PARAMS_OVERRIDE["rl"] = rl


class params_override:
    """Scoped domain-size override (context manager). Restores the previous
    override on exit, so test modules can't leak k into each other (pytest
    imports every module at collection; a bare set_params_size at module
    scope is last-import-wins)."""

    def __init__(self, compliance: int | None = None, rl: int | None = None):
        self._new = {}
        if compliance is not None:
            self._new["compliance"] = compliance
        if rl is not None:
            self._new["rl"] = rl

    def __enter__(self):
        self._saved = dict(_PARAMS_OVERRIDE)
        _PARAMS_OVERRIDE.update(self._new)
        return self

    def __exit__(self, *exc):
        _PARAMS_OVERRIDE.clear()
        _PARAMS_OVERRIDE.update(self._saved)
        return False


_PK_CACHE: dict = {}
_PK_LOCK = threading.Lock()

# On-disk proving-key cache (the reference re-keygens per proof, ~4 s each,
# constant.rs:6146; we keygen once per (circuit, k) per MACHINE). Pickled
# fixed/sigma columns + commitments; ~40 MB per k=15 key.
_PK_DIR = __import__("os").path.join(
    __import__("os").path.dirname(__import__("os").path.dirname(__file__)), "..", ".pk_cache"
)


def _pk_disk_path(key):
    import hashlib
    import os

    h = hashlib.blake2b(repr(key).encode(), digest_size=16).hexdigest()
    return os.path.join(_PK_DIR, f"pk_{h}.pkl")


def _pk_load(key):
    import os
    import pickle

    path = _pk_disk_path(key)
    if not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as f:
            return pickle.load(f)
    except Exception:
        return None


def _pk_store(key, pk):
    import os
    import pickle

    try:
        os.makedirs(_PK_DIR, exist_ok=True)
        tmp = _pk_disk_path(key) + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(pk, f)
        os.replace(tmp, _pk_disk_path(key))
    except Exception:
        pass


_SRC_CLOSURE_DIGEST: str | None = None


def _source_closure_digest() -> str:
    """Digest of EVERY source file that can influence a proving key's layout:
    the whole circuits/ gadget library, the plonk keygen/layout code, and the
    shared constants. Round-2 postmortem: hashing only the circuit module +
    two gadget files let edits to spread.py/ec_gadgets.py silently poison the
    on-disk cache ("quotient degree overflow" on every later proof). Hashing
    the full closure trades a few false invalidations for never serving a
    stale key."""
    global _SRC_CLOSURE_DIGEST
    if _SRC_CLOSURE_DIGEST is not None:
        return _SRC_CLOSURE_DIGEST
    import hashlib
    import os

    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.blake2b(digest_size=8)
    paths = []
    for sub in ("circuits", "plonk", "crypto", "apps"):
        d = os.path.join(pkg_root, sub)
        if os.path.isdir(d):
            paths += [os.path.join(d, f) for f in os.listdir(d) if f.endswith(".py")]
    paths.append(os.path.join(pkg_root, "core", "constants.py"))
    for p in sorted(paths):
        try:
            with open(p, "rb") as f:
                h.update(os.path.basename(p).encode())
                h.update(f.read())
        except OSError:
            pass
    _SRC_CLOSURE_DIGEST = h.hexdigest()
    return _SRC_CLOSURE_DIGEST


def get_proving_key(circuit_cls, k: int):
    """Cached keygen for a circuit class at domain size 2^k (memory + disk)."""
    key = (circuit_cls.__module__, circuit_cls.__qualname__, k,
           _source_closure_digest())
    with _PK_LOCK:
        pk = _PK_CACHE.get(key)
    if pk is None:
        pk = _pk_load(key)
        if pk is None:
            from ..plonk.keygen import keygen

            pk = keygen(circuit_cls(), k)
            _pk_store(key, pk)
        with _PK_LOCK:
            _PK_CACHE[key] = pk
    return pk


class Proof:
    """Opaque proof bytes (reference src/proof.rs:20-64)."""

    __slots__ = ("data",)

    def __init__(self, data: bytes):
        self.data = data

    @classmethod
    def create(cls, circuit, instance: list[Fp], k: int) -> "Proof":
        from ..plonk.prover import create_proof

        pk = get_proving_key(type(circuit), k)
        return cls(create_proof(pk, circuit, instance))

    def verify(self, circuit_cls, instance: list[Fp], k: int) -> bool:
        from ..plonk.verifier import verify_proof

        pk = get_proving_key(circuit_cls, k)
        return verify_proof(pk.vk, instance, self.data)

    def to_bytes(self) -> bytes:
        return self.data

    @classmethod
    def from_bytes(cls, b: bytes):
        return cls(b)


_VK_PARSE_CACHE: dict = {}


def _parse_vk(vk_bytes: bytes):
    """Deserialize (and cache) a carried verifying key."""
    import hashlib

    from ..plonk.keygen import VerifyingKey

    key = hashlib.blake2b(vk_bytes, digest_size=16).digest()
    vk = _VK_PARSE_CACHE.get(key)
    if vk is None:
        vk = VerifyingKey.from_bytes(vk_bytes)
        _VK_PARSE_CACHE[key] = vk
    return vk


class ResourceLogicVerifyingInfo:
    """{vk, proof, 22 public inputs} (reference
    resource_logic_circuit.rs:79-90). The verifying key travels WITH the
    proof and verification runs against the carried vk — third-party logics
    verify without any registry (the circuit_id tags the bytecode arm for
    transparent execution / diagnostics only)."""

    __slots__ = ("circuit_id", "proof", "public_inputs", "vk_bytes")

    def __init__(self, circuit_id: str, proof: Proof, public_inputs: list[Fp],
                 vk_bytes: bytes):
        self.circuit_id = circuit_id
        self.proof = proof
        self.public_inputs = public_inputs
        self.vk_bytes = vk_bytes

    def verify(self):
        from ..plonk.verifier import verify_proof

        try:
            vk = _parse_vk(self.vk_bytes)
        except (ValueError, IndexError) as e:
            raise ProofError(f"malformed resource logic vk: {e}") from e
        if len(self.public_inputs) != RESOURCE_LOGIC_CIRCUIT_PUBLIC_INPUT_NUM:
            raise ProofError("bad resource logic public input count")
        if not verify_proof(vk, self.public_inputs, self.proof.data):
            raise ProofError(f"resource logic proof failed: {self.circuit_id}")
        return True

    def get_resource_merkle_root(self) -> Fp:
        return self.public_inputs[RESOURCE_LOGIC_CIRCUIT_RESOURCE_MERKLE_ROOT_IDX]

    def get_self_resource_id(self) -> Fp:
        return self.public_inputs[RESOURCE_LOGIC_CIRCUIT_SELF_RESOURCE_ID_IDX]


def prove_resource_logic(circuit) -> ResourceLogicVerifyingInfo:
    """Run the real prover for a resource-logic circuit instance."""
    instance = circuit.get_public_inputs()
    pk = get_proving_key(type(circuit), resource_logic_k())
    from ..plonk.prover import create_proof

    proof = Proof(create_proof(pk, circuit, instance))
    return ResourceLogicVerifyingInfo(
        type(circuit).circuit_id(), proof, instance, pk.vk.to_bytes()
    )


def prove_resource_logics_batch(circuits) -> list[ResourceLogicVerifyingInfo]:
    """Prove many resource-logic instances, batching same-class groups
    through the lockstep device pipeline on accelerator backends (the
    reference proves a ptx's proofs serially, shielded_ptx.rs:98-134; on
    CPU the zero-compile host prover per proof is already optimal)."""
    from ..plonk.prover import _use_host_prover, create_proofs_pipelined

    k = resource_logic_k()
    out: list = [None] * len(circuits)
    if _use_host_prover() or len(circuits) <= 1:
        for i, c in enumerate(circuits):
            out[i] = prove_resource_logic(c)
        return out
    groups: dict[type, list[int]] = {}
    for i, c in enumerate(circuits):
        groups.setdefault(type(c), []).append(i)
    jobs = []
    job_meta = []
    for cls, idxs in groups.items():
        if len(idxs) == 1:
            out[idxs[0]] = prove_resource_logic(circuits[idxs[0]])
            continue
        pk = get_proving_key(cls, k)
        insts = [circuits[i].get_public_inputs() for i in idxs]
        jobs.append((pk, [circuits[i] for i in idxs], insts))
        job_meta.append((cls, pk, idxs, insts))
    # cross-group software pipeline: each group's host-bound IPA tails run
    # under the next group's device stages (create_proofs_pipelined)
    for proofs, (cls, pk, idxs, insts) in zip(
        create_proofs_pipelined(jobs), job_meta
    ):
        vkb = pk.vk.to_bytes()
        for i, inst, pf in zip(idxs, insts, proofs):
            out[i] = ResourceLogicVerifyingInfo(cls.circuit_id(), Proof(pf), inst, vkb)
    return out


def verify_resource_logic_transparently(circuit) -> list[Fp]:
    """MockProver-style transparent check; returns the public inputs
    (reference resource_logic_circuit.rs:597-606 macro)."""
    from ..plonk.mock import MockProver

    instance = circuit.get_public_inputs()
    mp = MockProver.run(resource_logic_k(), circuit, instance)
    failures = mp.verify()
    if failures:
        raise ProofError("; ".join(failures))
    return instance
