"""Statistics and error metrics.

Counterparts of the reference algorithm layer (``src/neo/algorithm/mean.hpp``,
``variance.hpp``, ``standard_deviation.hpp``, ``mean_squared_error.hpp:18``,
``root_mean_squared_error.hpp:20``). The RMSE metric is the backbone of the
sparse-quality (SNR) harness.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "mean",
    "variance",
    "standard_deviation",
    "mean_squared_error",
    "root_mean_squared_error",
]


def mean(x):
    return jnp.mean(jnp.asarray(x))


def variance(x):
    """Population variance (the reference divides by N, not N-1)."""
    x = jnp.asarray(x)
    m = jnp.mean(x)
    d = x - m
    if jnp.issubdtype(x.dtype, jnp.complexfloating):
        return jnp.mean(jnp.real(d * jnp.conj(d)))
    return jnp.mean(d * d)


def standard_deviation(x):
    return jnp.sqrt(variance(x))


def mean_squared_error(x, y):
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    d = x - y
    if jnp.issubdtype(d.dtype, jnp.complexfloating):
        return jnp.mean(jnp.real(d * jnp.conj(d)))
    return jnp.mean(d * d)


def root_mean_squared_error(x, y):
    return jnp.sqrt(mean_squared_error(x, y))
