"""Multi-device sharding of the solve (mesh helpers, sharded solve)."""
