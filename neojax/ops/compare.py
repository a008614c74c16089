"""Tolerance comparison — the framework's parity gate.

Counterpart of ``src/neo/algorithm/allclose.hpp:19-44``: absolute-tolerance
comparison with the reference's documented bounds (1e-5 for float32,
1e-9 for float64). Every parity test in ``tests/`` goes through this.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["default_tolerance", "allclose", "allmatch"]

_F32_TOL = 1e-5
_F64_TOL = 1e-9


def default_tolerance(dtype) -> float:
    dtype = jnp.dtype(dtype)
    if dtype in (jnp.dtype(jnp.float64), jnp.dtype(jnp.complex128)):
        return _F64_TOL
    return _F32_TOL


def allclose(x, y, tolerance: float | None = None) -> bool:
    """max |x - y| <= tolerance (absolute, like the reference; no rtol)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if x.shape != y.shape:
        return False
    if tolerance is None:
        tolerance = min(default_tolerance(x.dtype), default_tolerance(y.dtype))
    return bool(jnp.max(jnp.abs(x - y)) <= tolerance) if x.size else True


def allmatch(x, y) -> bool:
    """Exact elementwise equality."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if x.shape != y.shape:
        return False
    return bool(jnp.all(x == y)) if x.size else True
