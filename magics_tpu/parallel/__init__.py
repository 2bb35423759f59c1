"""Multi-chip sharding of the robot axis over a jax.sharding.Mesh."""
