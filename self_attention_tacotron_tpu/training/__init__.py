"""Training loop, schedules, metrics/plotting, checkpoint management."""
