"""Energy / peak normalization.

Counterparts of ``src/neo/algorithm/normalize_energy.hpp:19,47``,
``normalize_peak.hpp:21,56`` and the multichannel
``src/neo/convolution/normalize_impulse.hpp:12-33`` (which scales the whole
impulse matrix by the *minimum* per-channel energy factor so no channel
exceeds unit energy).
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "normalize_energy_factor",
    "normalize_energy",
    "normalize_peak_factor",
    "normalize_peak",
    "normalize_impulse",
]


def normalize_energy_factor(x):
    """1 / sqrt(sum(x^2)); 1.0 for an all-zero signal."""
    energy = jnp.sum(jnp.square(jnp.asarray(x)))
    return jnp.where(energy > 0, 1.0 / jnp.sqrt(energy), 1.0)


def normalize_energy(x):
    return jnp.asarray(x) * normalize_energy_factor(x)


def normalize_peak_factor(x):
    peak = jnp.max(jnp.abs(jnp.asarray(x)))
    return jnp.where(peak > 0, 1.0 / peak, 1.0)


def normalize_peak(x):
    return jnp.asarray(x) * normalize_peak_factor(x)


def normalize_impulse(x):
    """Energy-normalize an impulse response.

    Rank 1: unit energy. Rank 2 ``[channels, samples]``: scale the whole
    matrix by the minimum factor over channels.
    """
    x = jnp.asarray(x)
    if x.ndim == 1:
        return normalize_energy(x)
    if x.ndim != 2:
        raise ValueError(f"normalize_impulse expects rank 1 or 2, got {x.ndim}")
    energies = jnp.sum(jnp.square(x), axis=1)
    factors = jnp.where(energies > 0, 1.0 / jnp.sqrt(energies), 1.0)
    return x * jnp.min(factors)
