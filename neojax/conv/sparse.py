"""Sparsity masks for the FDL filter, incl. perceptual (A-weighted) thresholding.

TPU-native counterpart of the reference's ``sparse_filter`` /
``csr_matrix`` (``src/neo/convolution/sparse_filter.hpp:16``,
``src/neo/container/csr_matrix.hpp:21-98``) and the plugin's perceptual
sparsification predicate (``extra/plugin/src/dsp/DenseConvolution.cpp:205-267``).

On TPU a CSR gather per partition row would defeat the vector units for the
densities this workload sees; instead the sparsity predicate produces a
boolean *bin mask* ``[P, K]`` which (a) zeroes the dense filter — XLA's MAC
then streams exactly the same bytes but multiplies by zero — and (b) feeds
the Pallas sparse kernel, which skips fully-masked partition tiles. The
mask's density is the quality/throughput dial, swept by the SNR harness.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from neojax.core.bits import bit_ceil
from neojax.core.units import a_weighting, amplitude_to_db, rfftfreq

__all__ = ["sparsity_mask", "perceptual_weights", "perceptual_mask"]


def sparsity_mask(partitions: jnp.ndarray, predicate: Callable) -> jnp.ndarray:
    """Evaluate ``predicate(row, col, value) -> bool`` over a [P, K] (or
    [C, P, K]) complex spectrum grid, vectorized. Matches the reference's
    CSR-construction predicate (``csr_matrix.hpp:67-98``)."""
    p, k = partitions.shape[-2], partitions.shape[-1]
    rows = jnp.arange(p)[:, None] * jnp.ones((1, k), dtype=jnp.int32)
    cols = jnp.ones((p, 1), dtype=jnp.int32) * jnp.arange(k)[None, :]
    shape = partitions.shape
    rows = jnp.broadcast_to(rows, shape)
    cols = jnp.broadcast_to(cols, shape)
    return jnp.asarray(predicate(rows, cols, partitions), dtype=bool)


def perceptual_weights(
    num_bins: int, sample_rate: float, low_bins_to_keep: int = 8
) -> jnp.ndarray:
    """Per-bin dB weights: +100 dB bias for the lowest bins, A-weighting at
    the bin frequency elsewhere (``DenseConvolution.cpp:139-155``)."""
    transform = bit_ceil((num_bins - 1) * 2)
    freqs = rfftfreq(transform, d=1.0 / sample_rate)[:num_bins]
    weights = a_weighting(jnp.maximum(freqs, 1e-12))
    low = jnp.arange(num_bins) < low_bins_to_keep
    return jnp.where(low, 100.0, weights)


def perceptual_mask(
    partitions: jnp.ndarray,
    sample_rate: float,
    threshold_db: float,
    low_bins_to_keep: int = 8,
) -> jnp.ndarray:
    """Keep bin iff ``dB(power * scale) * 0.5 + weight > threshold`` where
    ``scale = 1 / max power`` over the partitioned spectrum
    (``DenseConvolution.cpp:110-122,160-166``). ``partitions``: [P, K] or
    [C, P, K] (per-channel scale, like the per-channel loop in the plugin)."""
    power = jnp.abs(partitions) ** 2
    max_power = jnp.max(power, axis=(-2, -1), keepdims=True)
    scale = jnp.where(max_power > 0, 1.0 / max_power, 1.0)
    weights = perceptual_weights(partitions.shape[-1], sample_rate, low_bins_to_keep)
    db = amplitude_to_db(power * scale) * 0.5 + weights
    return db > threshold_db
