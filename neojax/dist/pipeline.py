"""Partition-sharded streaming pipeline with ppermute spectrum hand-off.

This is the distributed form of the FDL (SURVEY.md sections 2.7/5): the
partition axis of the delay line and filter shards over the mesh "part"
axis, channels over "ch". Each device owns a contiguous range of
partitions — i.e. a window of the IR's history. Per streamed block:

  1. every device computes the block spectrum (replicated rfft — cheap);
  2. device 0 inserts the fresh spectrum; device d>0 inserts the spectrum
     handed to it by device d-1 on the *previous* step (each hand-off ages
     the spectrum by exactly one block, which is exactly the age at which
     it enters the next device's partition range);
  3. local MAC over the local partitions, then ``psum`` over "part"
     (rides ICI);
  4. the oldest locally-held spectrum is sent to the right neighbour with
     ``jax.lax.ppermute`` — the ring hand-off that plays the role the
     reference's modular ``fdl_index`` schedule plays in one address space
     (``fdl_index.hpp:24-36``);
  5. irfft + overlap bookkeeping (replicated).

The ppermute (one [C_local, K] spectrum) overlaps with the irfft; sizing:
hand-off bytes per block are 1/(P/D) of the local MAC traffic, so scaling
stays near-linear for deep FDLs.

Only the dense (complex64) storage is pipelined for now.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from neojax.conv.convolver import PartitionedConfig
from neojax.conv.overlap import stream_blocks, unstream_blocks
from neojax.fft import api as fft_api

__all__ = ["PipelineConvolver"]


class PipelineConvolver:
    """Partition+channel sharded streaming convolver (dense storage)."""

    def __init__(self, config: PartitionedConfig, mesh: Mesh):
        if config.storage != "dense":
            raise NotImplementedError("pipeline convolver supports dense storage")
        self.config = config
        self.mesh = mesh
        self.d_part = mesh.shape["part"]
        self.d_ch = mesh.shape["ch"]
        if config.num_partitions % self.d_part:
            raise ValueError(
                f"num_partitions {config.num_partitions} not divisible by "
                f"mesh part={self.d_part}"
            )
        if config.channels % self.d_ch:
            raise ValueError(
                f"channels {config.channels} not divisible by mesh ch={self.d_ch}"
            )
        self._process = jax.jit(self._build_process())

    # -- state ------------------------------------------------------------

    def init_state(self) -> dict:
        cfg = self.config
        return {
            "tail": jnp.zeros((cfg.channels, cfg.block_size), jnp.float32),
            "fdl": jnp.zeros(
                (cfg.num_partitions, cfg.channels, cfg.num_bins), jnp.complex64
            ),
            "incoming": jnp.zeros(
                (self.d_part, cfg.channels, cfg.num_bins), jnp.complex64
            ),
        }

    # -- the sharded step -------------------------------------------------

    def _build_process(self):
        cfg = self.config
        mesh = self.mesh
        b = cfg.block_size
        n = cfg.transform_size

        def local_process(filt, tail, fdl, incoming, blocks):
            # Shapes inside the shard: filt/fdl [P/D, C/Dc, K],
            # tail [C/Dc, B], incoming [1, C/Dc, K], blocks [T, C/Dc, B].
            part_idx = jax.lax.axis_index("part")

            def step(carry, block):
                tail, fdl, inc = carry
                frame = jnp.concatenate([tail, block], axis=-1)
                spec = fft_api.rfft(frame, n=n)
                mine = jnp.where(part_idx == 0, spec, inc[0])
                fdl_new = jnp.concatenate([mine[None], fdl[:-1]], axis=0)
                partial_acc = jnp.sum(fdl_new * filt, axis=0)
                acc = jax.lax.psum(partial_acc, "part")
                handoff = jax.lax.ppermute(
                    fdl_new[-1],
                    "part",
                    [(i, (i + 1) % jax.lax.axis_size("part"))
                     for i in range(jax.lax.axis_size("part"))],
                )
                y = fft_api.irfft(acc, n=n)
                out = y[..., b:]
                return (block, fdl_new, handoff[None]), out

            (tail, fdl, incoming), outs = jax.lax.scan(
                step, (tail, fdl, incoming[0][None]), blocks
            )
            return tail, fdl, incoming, outs

        sharded = shard_map(
            local_process,
            mesh=mesh,
            in_specs=(
                P("part", "ch", None),   # filt
                P("ch", None),           # tail (replicated over part)
                P("part", "ch", None),   # fdl
                P("part", "ch", None),   # incoming (one slot per part-shard)
                P(None, "ch", None),     # blocks [T, C, B]
            ),
            out_specs=(
                P("ch", None),
                P("part", "ch", None),
                P("part", "ch", None),
                P(None, "ch", None),
            ),
            check_vma=False,
        )

        def process(filt, state, signal):
            blocks, length = stream_blocks(signal, b)
            tail, fdl, incoming, outs = sharded(
                filt, state["tail"], state["fdl"], state["incoming"], blocks
            )
            out = unstream_blocks(outs, length)
            return {"tail": tail, "fdl": fdl, "incoming": incoming}, out

        return process

    # -- public -----------------------------------------------------------

    def shard_filter(self, filt: jnp.ndarray) -> jnp.ndarray:
        """Filter [P, C|1, K] complex -> device_put with partition sharding.
        Shared filters broadcast to the channel count first."""
        cfg = self.config
        filt = jnp.asarray(filt, jnp.complex64)
        if filt.shape[1] == 1 and cfg.channels > 1:
            filt = jnp.broadcast_to(filt, (cfg.num_partitions, cfg.channels, cfg.num_bins))
        return jax.device_put(
            filt, NamedSharding(self.mesh, P("part", "ch", None))
        )

    def process(self, filt, state, signal):
        signal = jax.device_put(
            jnp.asarray(signal, jnp.float32),
            NamedSharding(self.mesh, P("ch", None)),
        )
        return self._process(filt, state, signal)
