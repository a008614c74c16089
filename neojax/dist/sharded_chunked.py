"""Channel-sharded chunked (Toeplitz-MXU) processing.

The throughput path of the framework combined with its distribution story:
the chunked engine's history/accumulator tensors carry the channel axis
last ([K, M, C]), so sharding C over the mesh "ch" axis keeps every
matmul, concat and FFT local to its shard — zero collectives, linear
scaling over chips and hosts (the 256-channel multi-host config of
BASELINE.json). Toeplitz params are replicated (shared filter).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from neojax.conv import chunked
from neojax.conv.convolver import PartitionedConfig

__all__ = ["shard_chunked_state", "sharded_process_chunked"]


def _named(mesh, *spec):
    return NamedSharding(mesh, P(*spec))


def shard_chunked_state(state: dict, mesh: Mesh) -> dict:
    hists = tuple(
        jax.device_put(h, _named(mesh, None, None, "ch")) for h in state["hists"]
    )
    return {
        "tail": jax.device_put(state["tail"], _named(mesh, "ch", None)),
        "hists": hists,
    }


@partial(jax.jit, static_argnums=(0, 4))
def _process(config, params, state, signal, chunk_blocks):
    return chunked.process_chunked(config, params, state, signal, chunk_blocks)


def sharded_process_chunked(
    config: PartitionedConfig,
    params: dict,
    state: dict,
    signal,
    mesh: Mesh,
    chunk_blocks: int,
):
    """Channel-sharded ``process_chunked`` (shared filter, replicated params)."""
    signal = jax.device_put(jnp.asarray(signal, jnp.float32), _named(mesh, "ch", None))
    params = jax.tree.map(lambda v: jax.device_put(v, _named(mesh)), params)
    state = shard_chunked_state(state, mesh)
    return _process(config, params, state, signal, chunk_blocks)
