"""Training: losses, metrics, train state, sharded step functions, trainer."""
