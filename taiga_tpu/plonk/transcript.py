"""Blake2b Fiat-Shamir transcript.

Chained-state construction (personalization "TaigaTPU-Transcr"):
  state <- H(state || tag || data) on absorb;
  challenge = from_uniform_bytes(H(state || "chal")), state <- H(state || "chal").

The reference uses halo2's Blake2bRead/Write transcript
(taiga_halo2/src/proof.rs:25-54); ours is an independent, documented framing
(proof bytes are self-consistent between our prover and verifier).
"""

from __future__ import annotations

import hashlib

from ..crypto.curves import VestaPoint
from ..crypto.fields import Fp

PERSONAL = b"TaigaTPU-Transcr"


def _h(data: bytes) -> bytes:
    return hashlib.blake2b(data, digest_size=64, person=PERSONAL).digest()


class Transcript:
    def __init__(self, label: bytes = b""):
        self.state = _h(b"init" + label)

    def absorb_bytes(self, data: bytes):
        self.state = _h(self.state + b"ab" + data)

    def absorb_point(self, pt: VestaPoint):
        self.absorb_bytes(b"P" + pt.to_bytes())

    def absorb_scalar(self, s: Fp):
        self.absorb_bytes(b"S" + s.to_repr())

    def challenge(self, label: bytes = b"") -> Fp:
        out = _h(self.state + b"ch" + label)
        self.state = _h(self.state + b"st" + label)
        return Fp.from_uniform_bytes(out)


class ProofWriter(Transcript):
    """Transcript that also records the proof byte stream."""

    def __init__(self, label: bytes = b""):
        super().__init__(label)
        self.data = bytearray()

    def write_point(self, pt: VestaPoint):
        self.data += pt.to_bytes()
        self.absorb_point(pt)

    def write_scalar(self, s: Fp):
        self.data += s.to_repr()
        self.absorb_scalar(s)

    def bytes(self) -> bytes:
        return bytes(self.data)


class ProofReader(Transcript):
    """Transcript that replays a proof byte stream."""

    def __init__(self, proof: bytes, label: bytes = b""):
        super().__init__(label)
        self.proof = proof
        self.off = 0

    def read_point(self) -> VestaPoint:
        raw = self.proof[self.off : self.off + 32]
        if len(raw) != 32:
            raise ValueError("proof too short")
        self.off += 32
        pt = VestaPoint.from_bytes(raw)
        if pt is None:
            raise ValueError("invalid point in proof")
        self.absorb_point(pt)
        return pt

    def read_scalar(self) -> Fp:
        raw = self.proof[self.off : self.off + 32]
        if len(raw) != 32:
            raise ValueError("proof too short")
        self.off += 32
        s = Fp.from_repr(raw)
        if s is None:
            raise ValueError("invalid scalar in proof")
        self.absorb_scalar(s)
        return s

    def finished(self) -> bool:
        return self.off == len(self.proof)
