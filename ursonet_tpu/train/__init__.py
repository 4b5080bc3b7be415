"""Training: losses, optimizers, LR schedules, the sharded train step."""
