"""neojax.dist — device meshes, sharded convolvers, multi-host streaming."""

from neojax.dist.mesh import channel_sharding, make_mesh
from neojax.dist.pipeline import PipelineConvolver
from neojax.dist.multihost import StreamDriver, init_distributed
from neojax.dist.sharded import shard_params, shard_state, sharded_process
from neojax.dist.timesharded import timesharded_process
from neojax.dist.binsharded import BinShardedConvolver
from neojax.dist.sharded_chunked import (
    shard_chunked_state,
    shard_nested_state,
    sharded_process_chunked,
    sharded_process_hybrid,
    sharded_process_nested,
    shard_hybrid_state,
)

__all__ = [
    "make_mesh",
    "channel_sharding",
    "PipelineConvolver",
    "shard_params",
    "shard_state",
    "sharded_process",
    "timesharded_process",
    "sharded_process_chunked",
    "BinShardedConvolver",
    "shard_nested_state",
    "sharded_process_nested",
    "shard_hybrid_state",
    "sharded_process_hybrid",
    "shard_chunked_state",
    "StreamDriver",
    "init_distributed",
]
