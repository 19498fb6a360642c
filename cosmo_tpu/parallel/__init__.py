from .mesh import (
    BLOCK_AXIS,
    make_mesh,
    shard_blockkkt,
    shard_cones,
    shard_coo,
    shard_problem,
    shard_vectors,
)

__all__ = [
    "BLOCK_AXIS",
    "make_mesh",
    "shard_blockkkt",
    "shard_cones",
    "shard_coo",
    "shard_problem",
    "shard_vectors",
]
