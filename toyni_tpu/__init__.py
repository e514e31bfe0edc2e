"""toyni-tpu: a TPU-native zero-knowledge STARK proving framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
STARK library (jonas089/toyni): BabyBear field + quartic extension, NTT/coset
FFT, SHA-256 Merkle commitments, Fiat-Shamir, FRI, and a complete
zero-knowledge DEEP-ALI prover/verifier with a generic AIR interface
(Fibonacci bundled as the example AIR).

Layering (bottom-up), mirroring the reference's layer map:
  field/      L0: BabyBear + quartic extension (vectorized u32) + host oracle
  ops/        L1: NTT, batched SHA-256, FRI fold kernels
  domain, poly  L2: coset domains and polynomial math
  merkle, transcript  L3: commitment + Fiat-Shamir
  air, prover, verifier  L4/L5: proof system + trace frontend
  parallel/   multi-chip sharding (mesh, distributed NTT/FRI/Merkle)
"""

__version__ = "0.1.0"
