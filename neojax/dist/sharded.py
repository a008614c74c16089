"""Channel-sharded (data-parallel) streaming convolution.

The reference runs one convolver per channel serially
(``extra/cli/src/convolver.cpp:37-55``); here the channel axis of every
piece of convolver state shards over the mesh "ch" axis and the whole
scan runs under jit with sharding constraints — zero communication, the
pure data-parallel path. Works across hosts (jax.distributed) because all
collectives are absent.
"""

from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from neojax.conv import convolver as cv

__all__ = ["shard_params", "shard_state", "sharded_process"]


def _named(mesh, *spec):
    return NamedSharding(mesh, P(*spec))


def shard_params(config: cv.PartitionedConfig, params: dict, mesh: Mesh) -> dict:
    """Place filter params with channels on the mesh "ch" axis.

    Shared (single-channel) filters replicate; per-channel filters shard.
    """
    out = {}
    for key, val in params.items():
        if key == "mask":
            out[key] = val
            continue
        # filt / filt_re / filt_im: [P, C', K]
        if val.shape[1] == config.channels and config.channels > 1:
            out[key] = jax.device_put(val, _named(mesh, None, "ch", None))
        else:
            out[key] = jax.device_put(val, _named(mesh))
    return out


def shard_state(config: cv.PartitionedConfig, state: dict, mesh: Mesh) -> dict:
    """Place convolver state with channels on the mesh "ch" axis."""
    tail = jax.device_put(state["tail"], _named(mesh, "ch", None))
    fdl = state["fdl"]
    if isinstance(fdl, tuple):
        planes = jax.device_put(fdl[0], _named(mesh, None, None, "ch", None))
        scales = jax.device_put(fdl[1], _named(mesh, None, "ch", None))
        fdl = (planes, scales)
    elif fdl.ndim == 3:  # dense [P, C, K]
        fdl = jax.device_put(fdl, _named(mesh, None, "ch", None))
    else:  # split [2, P, C, K]
        fdl = jax.device_put(fdl, _named(mesh, None, None, "ch", None))
    out = dict(state)
    out["tail"] = tail
    out["fdl"] = fdl
    if "dcny" in out:  # packed layout side-carry [P, C, 2]
        out["dcny"] = jax.device_put(out["dcny"], _named(mesh, None, "ch", None))
    if "pos" in out:
        out["pos"] = jax.device_put(out["pos"], _named(mesh))
    return out


@partial(jax.jit, static_argnums=0)
def _process_jit(config, params, state, signal):
    return cv.process(config, params, state, signal)


def sharded_process(
    config: cv.PartitionedConfig,
    params: dict,
    state: dict,
    signal,
    mesh: Mesh,
):
    """Channel-sharded ``conv.process``: shards inputs over "ch" and runs
    the scan under jit; XLA keeps every step communication-free."""
    signal = jax.device_put(signal, _named(mesh, "ch", None))
    params = shard_params(config, params, mesh)
    state = shard_state(config, state, mesh)
    return _process_jit(config, params, state, signal)
