"""Window functions (symmetric, matching the reference formulas).

Reference: ``src/neo/math/windowing.hpp:15,29,45`` — rectangular, hann and
hamming windows defined over ``n - 1`` (symmetric variant). Windows are
computed as jnp arrays so they can live on-device and fuse into the framing
pipeline (STFT / overlap processors).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = [
    "rectangular_window",
    "hann_window",
    "hamming_window",
    "make_window",
]


def rectangular_window(size: int, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.ones((size,), dtype=dtype)


def hann_window(size: int, dtype=jnp.float32) -> jnp.ndarray:
    if size == 1:
        return jnp.ones((1,), dtype=dtype)
    # Windows are trace-time constants: build in float64 on host.
    i = np.arange(size, dtype=np.float64)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * i / (size - 1)))
    return jnp.asarray(w, dtype=dtype)


def hamming_window(size: int, dtype=jnp.float32) -> jnp.ndarray:
    if size == 1:
        return jnp.ones((1,), dtype=dtype)
    i = np.arange(size, dtype=np.float64)
    w = 0.54 - 0.46 * np.cos(2.0 * np.pi * i / (size - 1))
    return jnp.asarray(w, dtype=dtype)


_WINDOWS = {
    "rectangular": rectangular_window,
    "boxcar": rectangular_window,
    "hann": hann_window,
    "hamming": hamming_window,
}


def make_window(name_or_array, size: int, dtype=jnp.float32) -> jnp.ndarray:
    """Resolve a window spec (name, callable or array) to a [size] array."""
    if isinstance(name_or_array, str):
        try:
            fn = _WINDOWS[name_or_array.lower()]
        except KeyError:
            raise ValueError(f"unknown window: {name_or_array!r}") from None
        return fn(size, dtype=dtype)
    if callable(name_or_array):
        return jnp.asarray(name_or_array(size), dtype=dtype)
    arr = jnp.asarray(name_or_array, dtype=dtype)
    if arr.shape != (size,):
        raise ValueError(f"window shape {arr.shape} != ({size},)")
    return arr
