"""neojax.dist — device meshes, sharded convolvers, multi-host streaming."""

from neojax.dist.mesh import channel_sharding, make_mesh
from neojax.dist.pipeline import PipelineConvolver
from neojax.dist.sharded import shard_params, shard_state, sharded_process

__all__ = [
    "make_mesh",
    "channel_sharding",
    "PipelineConvolver",
    "shard_params",
    "shard_state",
    "sharded_process",
]
