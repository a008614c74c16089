"""Multi-host streaming driver: initialization, fail-fast, checkpointed runs.

SURVEY.md section 5 (failure detection / elastic recovery): the reference
has none — it is a single-process library. Here, multi-host streaming jobs:

  * initialize the distributed runtime fail-fast (``init_distributed``
    raises early if the cluster doesn't form rather than hanging in the
    first collective);
  * shard 256-channel streams over hosts on the mesh "ch" axis (pure data
    parallel — zero inter-host traffic) and optionally over "part" within
    a host's chips (ICI psum/ppermute, ``dist.PipelineConvolver``);
  * periodically checkpoint the scan carry ({tail, FDL/hist}), so a lost
    host restarts the stream from the last block boundary — the carry *is*
    the entire job state (``io.checkpoint``).

Single-process meshes exercise the same code path (the driver is agnostic
to whether mesh devices span hosts), which is how ``tests/`` covers it.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp

from neojax.io.checkpoint import load_state, save_state

__all__ = [
    "init_distributed",
    "StreamDriver",
    "save_sharded_state",
    "load_sharded_state",
]


def init_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    timeout_secs: int = 60,
) -> bool:
    """Fail-fast ``jax.distributed.initialize``. Returns False when running
    single-process (no coordinator configured), True after a successful
    multi-process init; raises if the cluster fails to form in time."""
    coordinator = coordinator or os.environ.get("NEOJAX_COORDINATOR")
    if coordinator is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        initialization_timeout=timeout_secs,
    )
    return True


def save_sharded_state(path: str, state) -> None:
    """Per-process checkpoint of a SHARDED state pytree: each process
    writes only its addressable shards (keyed by device id) to its own
    .npz — no cross-process gather, so a 256-host stream checkpoints with
    zero DCN traffic. Pair with :func:`load_sharded_state`."""
    import numpy as np

    flat, _ = jax.tree_util.tree_flatten_with_path(state)
    out = {}
    for keypath, leaf in flat:
        name = jax.tree_util.keystr(keypath)
        for s in leaf.addressable_shards:
            out[f"{name}__d{s.device.id}"] = np.asarray(s.data)
    np.savez(path, **out)


def load_sharded_state(path: str, like):
    """Rebuild a sharded state pytree from this process's
    :func:`save_sharded_state` file. ``like`` supplies shapes/shardings
    (e.g. the freshly-initialized global state)."""
    import numpy as np

    with np.load(path) as f:
        data = {k: f[k] for k in f.files}

    flat, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for keypath, leaf in flat:
        name = jax.tree_util.keystr(keypath)
        arrs = [
            jax.device_put(data[f"{name}__d{s.device.id}"], s.device)
            for s in leaf.addressable_shards
        ]
        leaves.append(
            jax.make_array_from_single_device_arrays(
                leaf.shape, leaf.sharding, arrs
            )
        )
    return jax.tree_util.tree_unflatten(treedef, leaves)


@dataclass
class StreamDriver:
    """Checkpointed streaming executor: run a (params, state, chunk) ->
    (state, out) step over a long stream, saving the carry every
    ``checkpoint_every`` chunks and resuming from the latest checkpoint.

    ``save_fn(path, state)`` / ``load_fn(path, like)`` default to the
    single-host .npz format; multi-process jobs pass
    :func:`save_sharded_state` / :func:`load_sharded_state` so each
    process persists exactly its own shards."""

    process_fn: Callable
    checkpoint_path: str | None = None
    checkpoint_every: int = 16
    save_fn: Callable = staticmethod(save_state)
    load_fn: Callable = staticmethod(
        lambda path, like: load_state(path)
    )

    def run(self, params, state, chunks):
        """chunks: iterable of [C, T_chunk] arrays. Yields outputs."""
        start = 0
        if self.checkpoint_path and os.path.exists(self._meta_path()):
            with open(self._meta_path()) as f:
                start = int(f.read().strip())
            state = self.load_fn(self._state_path(), state)

        for i, chunk in enumerate(chunks):
            if i < start:
                continue
            state, out = self.process_fn(params, state, chunk)
            if (
                self.checkpoint_path
                and (i + 1) % self.checkpoint_every == 0
            ):
                self._save(state, i + 1)
            yield i, out, state

    def _save(self, state, next_index: int) -> None:
        jax.block_until_ready(jax.tree.leaves(state)[0])
        self.save_fn(self._state_path(), state)
        with open(self._meta_path(), "w") as f:
            f.write(str(next_index))

    def _state_path(self) -> str:
        return self.checkpoint_path + ".state.npz"

    def _meta_path(self) -> str:
        return self.checkpoint_path + ".meta"
