from .mesh import BLOCK_AXIS, make_mesh, shard_cones, shard_problem

__all__ = ["BLOCK_AXIS", "make_mesh", "shard_cones", "shard_problem"]
