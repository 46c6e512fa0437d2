"""Hand-optimized compute paths: batch-last lane math + Pallas kernels."""
