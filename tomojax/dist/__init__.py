from tomojax.dist.sharding import (
    make_mesh, shard_views, make_sharded_operator, sharded_refine_views,
)

__all__ = ["make_mesh", "shard_views", "make_sharded_operator",
           "sharded_refine_views"]
