"""DCT-II via a single N-point FFT (Makhoul's even-odd permutation).

Counterpart of ``src/neo/fft/dct.hpp:24,37-63`` (``fallback_dct2_plan``):
``v = [x0, x2, x4, ..., x5, x3, x1]``; ``X_k = Re(2 e^{-i pi k / 2N} V_k)``.
Unscaled (the factor of 2 is included, no 1/N), matching the reference.
"""

from __future__ import annotations

import jax.numpy as jnp

from neojax.fft import api as fft_api

__all__ = ["dct2"]


def dct2(x, axis: int = -1, backend: str | None = None) -> jnp.ndarray:
    x = jnp.asarray(x)
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]

    even = x[..., 0::2]
    odd = x[..., 1::2]
    v = jnp.concatenate([even, odd[..., ::-1]], axis=-1)

    vf = fft_api.fft(v, n=n, backend=backend)
    k = jnp.arange(n)
    phase = jnp.exp(-1j * jnp.pi * k / (2.0 * n)).astype(vf.dtype)
    out = 2.0 * jnp.real(vf * phase)
    return jnp.moveaxis(out.astype(x.dtype), -1, axis)
