"""Device mesh construction for the convolution engine's parallel axes.

The reference is single-threaded; its latent parallel axes (SURVEY.md
section 2.7) map to mesh axes here:

  "ch"   — channels, embarrassingly parallel (one convolver per channel in
           the reference CLI/plugin; data-parallel here)
  "part" — FDL partitions, a reduction axis (the Sum over fdl rows,
           ``uniform_partitioned_convolver.hpp:56-59``); tensor-parallel
           analogue, reduced with psum over ICI
  "bin"  — frequency bins, independent in the MAC
           (``multiply_add.hpp:280-301``); model-parallel over spectrum
           width (``dist.BinShardedConvolver``)
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "channel_sharding", "P", "NamedSharding"]


def make_mesh(
    ch: int | None = None,
    part: int | None = None,
    bin: int | None = None,
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    With only one axis size given, all devices go on that axis; with two,
    devices reshape to [first, second] in (part|bin, ch) order. Defaults
    to all devices on "ch". A ``bin`` axis requests the
    bin-sharded (model-parallel) layout and is exclusive with ``part``.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if bin is not None:
        if part is not None:
            raise ValueError("bin and part axes are exclusive (one reduce axis)")
        if ch is None:
            if n % bin:
                raise ValueError(f"{n} devices not divisible into bin={bin}")
            ch = n // bin
        if bin * ch != n:
            raise ValueError(f"mesh {bin}x{ch} != {n} devices")
        return Mesh(devices.reshape(bin, ch), axis_names=("bin", "ch"))
    if ch is None and part is None:
        ch = n
    if ch is not None and part is None:
        if n % ch:
            raise ValueError(f"{n} devices not divisible into ch={ch}")
        part = n // ch
    elif part is not None and ch is None:
        if n % part:
            raise ValueError(f"{n} devices not divisible into part={part}")
        ch = n // part
    if ch * part != n:
        raise ValueError(f"mesh {part}x{ch} != {n} devices")
    return Mesh(devices.reshape(part, ch), axis_names=("part", "ch"))


def channel_sharding(mesh: Mesh, ndim: int, ch_axis: int) -> NamedSharding:
    """NamedSharding placing array axis ``ch_axis`` on the mesh "ch" axis."""
    spec = [None] * ndim
    spec[ch_axis] = "ch"
    return NamedSharding(mesh, P(*spec))
