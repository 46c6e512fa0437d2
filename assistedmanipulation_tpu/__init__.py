"""TPU-native MPPI / stochastic trajectory optimization framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
AssistedManipulation reference (C++ / RaiSim MPPI controller for a
10-DoF Franka-Ridgeback mobile manipulator), built TPU-first:

- the MPPI sample -> rollout -> weight -> update loop is a single jitted
  program (vmap/scan or a fused Pallas kernel) over thousands of sampled
  control sequences (reference: src/controller/mppi.cpp:154-479);
- the robot dynamics are batched fixed-topology rigid-body dynamics
  (CRBA mass matrix + FK/Jacobians) instead of per-thread RaiSim worlds
  (reference: src/simulation/frankaridgeback/raisim_dynamics.cpp:206-264);
- wrench forecasting (Kalman / average / LOCF) runs as batched scans
  (reference: src/controller/forecast.cpp, kalman.cpp);
- multi-chip scaling shards the rollout axis over a jax.sharding.Mesh with
  psum/all_gather collectives where the reference used a thread pool
  (reference: src/controller/concurrency.hpp, mppi.cpp:272-307).
"""

__version__ = "0.1.0"
