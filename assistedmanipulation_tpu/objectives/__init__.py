"""Objective functions (MPPI step costs) for the Franka-Ridgeback task."""
