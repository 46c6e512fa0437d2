"""Robot model layer: plants (dynamics + derived quantities) for the planner."""
