from safer2_recommender_tpu.parallel.mesh import (
    get_mesh,
    replicated,
    row_sharding,
    shard_pytree_rows,
)

__all__ = ["get_mesh", "row_sharding", "replicated", "shard_pytree_rows"]
