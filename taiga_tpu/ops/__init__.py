"""TPU compute kernels: limb field arithmetic, batched Poseidon, NTT, EC/MSM.

All hot-loop math runs as vectorized JAX ops over 16x16-bit limb tensors
(uint32 lanes — TPUs have no 64-bit integers). Host `taiga_tpu.crypto` is the
bit-exactness oracle for every kernel here.
"""
