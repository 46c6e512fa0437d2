"""Device-mesh parallelism: rollout-axis sharding over ICI/DCN."""
