"""TPU compute kernels: NTT stages, batched SHA-256, FRI folding."""
