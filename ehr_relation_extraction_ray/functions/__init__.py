"""Pure, vectorized per-batch kernels shared by stages and tests."""
