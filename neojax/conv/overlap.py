"""Streaming overlap-save / overlap-add block processors.

Counterparts of ``src/neo/convolution/overlap_save.hpp:21-114`` and
``overlap_add.hpp:24-110``. The reference mutates ring/window buffers in
place per block; here each processor is a *pure function* over an explicit
carry (the window tail / overlap tail), so a whole signal streams through
``jax.lax.scan`` and the carry is a checkpointable pytree.

Transform sizing matches the reference: ``N = bit_ceil(block + filter - 1)``
(``fft::next_order``). The reference's unnormalized inverse FFT followed by
a ``1/N`` scale is equivalent to the normalized ``irfft`` used here.

All processors are batched-native: blocks are ``[channels, block]`` and the
spectrum callback sees ``[channels, bins]``.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from neojax.core.bits import bit_ceil
from neojax.fft import api as fft_api

__all__ = ["OverlapSave", "OverlapAdd", "stream_blocks", "unstream_blocks"]


@dataclasses.dataclass(frozen=True)
class OverlapSave:
    """Overlap-save: slide an N-window left by B, append the new block,
    rfft, apply callback to the spectrum, irfft, emit the last B samples."""

    block_size: int
    filter_size: int
    fft_backend: str | None = None

    @property
    def transform_size(self) -> int:
        return bit_ceil(self.block_size + self.filter_size - 1)

    @property
    def num_bins(self) -> int:
        return self.transform_size // 2 + 1

    def init_state(self, channels: int, dtype=jnp.float32) -> jnp.ndarray:
        # Carry = the window minus the incoming block (N - B samples).
        return jnp.zeros((channels, self.transform_size - self.block_size), dtype)

    def step(self, state, block, spectrum_fn: Callable):
        n = self.transform_size
        window = jnp.concatenate([state, block], axis=-1)  # [C, N]
        spec = fft_api.rfft(window, n=n, backend=self.fft_backend)
        spec = spectrum_fn(spec)
        y = fft_api.irfft(spec, n=n, backend=self.fft_backend)
        out = y[..., n - self.block_size :].astype(block.dtype)
        new_state = window[..., self.block_size :]
        return new_state, out


@dataclasses.dataclass(frozen=True)
class OverlapAdd:
    """Overlap-add: zero-pad the block to N, rfft, apply callback, irfft,
    emit the first B samples plus the carried tail; carry the rest."""

    block_size: int
    filter_size: int
    fft_backend: str | None = None

    @property
    def transform_size(self) -> int:
        return bit_ceil(self.block_size + self.filter_size - 1)

    @property
    def num_bins(self) -> int:
        return self.transform_size // 2 + 1

    def init_state(self, channels: int, dtype=jnp.float32) -> jnp.ndarray:
        return jnp.zeros((channels, self.transform_size - self.block_size), dtype)

    def step(self, state, block, spectrum_fn: Callable):
        n = self.transform_size
        b = self.block_size
        frame = jnp.pad(block, [(0, 0)] * (block.ndim - 1) + [(0, n - b)])
        spec = fft_api.rfft(frame, n=n, backend=self.fft_backend)
        spec = spectrum_fn(spec)
        y = fft_api.irfft(spec, n=n, backend=self.fft_backend)
        # Output = head of y + carried tail; new tail = shifted old tail + y's tail.
        # The tail may be shorter than a block (N - B < B); pad generically.
        tail_len = n - b
        head_overlap = state[..., :b]
        if head_overlap.shape[-1] < b:
            head_overlap = jnp.pad(
                head_overlap, [(0, 0)] * (state.ndim - 1) + [(0, b - head_overlap.shape[-1])]
            )
        out = (y[..., :b] + head_overlap).astype(block.dtype)
        shifted = state[..., b:]
        shifted = jnp.pad(shifted, [(0, 0)] * (state.ndim - 1) + [(0, tail_len - shifted.shape[-1])])
        new_state = shifted + y[..., b:]
        return new_state, out


def stream_blocks(signal: jnp.ndarray, block_size: int) -> tuple[jnp.ndarray, int]:
    """Split [C, T] into scan-ready [num_blocks, C, B] (zero-padding the tail).

    Returns the block stack and the original length for later trimming.
    """
    t = signal.shape[-1]
    num_blocks = -(-t // block_size)
    padded = jnp.pad(
        signal, [(0, 0)] * (signal.ndim - 1) + [(0, num_blocks * block_size - t)]
    )
    stacked = padded.reshape(*signal.shape[:-1], num_blocks, block_size)
    return jnp.moveaxis(stacked, -2, 0), t


def unstream_blocks(blocks: jnp.ndarray, length: int) -> jnp.ndarray:
    """Inverse of :func:`stream_blocks`: [num_blocks, C, B] -> [C, T]."""
    joined = jnp.moveaxis(blocks, 0, -2)
    joined = joined.reshape(*joined.shape[:-2], -1)
    return joined[..., :length]
