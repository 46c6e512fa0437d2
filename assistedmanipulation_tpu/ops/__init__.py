"""Device math primitives: cost functions, barriers, sampling, smoothing."""
