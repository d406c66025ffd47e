"""Applications (L6): example resource logics and end-to-end flows.

Mirrors /root/reference/taiga_halo2/src/circuit/resource_logic_examples/:
trivial, token, signature-verification (Schnorr auth), receiver (verifiable
encryption), or-relation intent, partial-fulfillment intent.
"""
