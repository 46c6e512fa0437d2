"""Simulation layer: plant stepping, actor composition, human model."""
