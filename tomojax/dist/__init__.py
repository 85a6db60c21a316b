from tomojax.dist.sharding import (
    make_mesh, shard_views, make_sharded_operator, sharded_refine_views,
    make_volume_sharded_operator, make_volume_sharded_slab_operator,
)

__all__ = ["make_mesh", "shard_views", "make_sharded_operator",
           "sharded_refine_views", "make_volume_sharded_operator",
           "make_volume_sharded_slab_operator"]
