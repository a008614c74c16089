"""Uniform partitioning of impulse responses into FDL filter spectra.

Counterpart of ``src/neo/convolution/uniform_partition.hpp:13-26``: an STFT
with ``frame = B``, ``transform = 2B``, ``overlap = 0`` and a rectangular
window, producing ``[ch, num_partitions, B + 1]`` complex spectra. The
number of partitions is ``ceil(len / B)`` (last partition zero-padded).
"""

from __future__ import annotations

import jax.numpy as jnp

from neojax.fft.stft import StftOptions, stft

__all__ = ["uniform_partition", "num_partitions"]


def num_partitions(ir_len: int, block_size: int) -> int:
    """Frame count of the partitioning STFT: ceil((len - B)/B) + 1."""
    from neojax.core.bits import idiv

    return idiv(ir_len - block_size, block_size) + 1


def uniform_partition(impulse_response, block_size: int, backend: str | None = None):
    """IR [len] or [ch, len] -> partitioned spectra [ch, P, B+1] complex."""
    ir = jnp.asarray(impulse_response)
    squeeze = ir.ndim == 1
    if squeeze:
        ir = ir[None, :]
    out = stft(
        ir,
        StftOptions(
            frame_size=block_size,
            transform_size=2 * block_size,
            overlap_size=0,
            window="rectangular",
        ),
        backend=backend,
    )
    return out
