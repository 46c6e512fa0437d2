"""Wrench forecasting: Kalman / average / LOCF strategies + dynamics rollout."""
