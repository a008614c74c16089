"""FFT extras: two-for-one real FFTs and split-complex C2C transform API.

Counterparts of ``src/neo/fft/rfft.hpp:44-63`` (``rfft_deinterleave``: two
real FFTs from one complex FFT via conjugate symmetry) and the split
transform plans (``fft/split_fft.hpp:22-34``) whose TPU-native form is the
planar matmul backend.
"""

from __future__ import annotations

import jax.numpy as jnp

from neojax.fft import api as fft_api
from neojax.fft import matmul_backend

__all__ = ["rfft_deinterleave", "split_fft", "split_ifft"]


def rfft_deinterleave(x, y, n: int | None = None, backend: str | None = None):
    """FFTs of two real signals from ONE complex FFT of z = x + i*y.

    ``X_k = (Z_k + conj(Z_{N-k})) / 2``;  ``Y_k = -i (Z_k - conj(Z_{N-k})) / 2``
    (``fft/rfft.hpp:44-63``). Returns the first N/2+1 bins of each.
    """
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n = int(n if n is not None else x.shape[-1])
    z = fft_api.fft(x + 1j * y.astype(x.dtype), n=n, backend=backend)
    zr = jnp.roll(z[..., ::-1], 1, axis=-1)  # Z_{N-k}
    k = n // 2 + 1
    xf = 0.5 * (z + jnp.conj(zr))
    yf = -0.5j * (z - jnp.conj(zr))
    return xf[..., :k], yf[..., :k]


def split_fft(re, im, n: int | None = None):
    """C2C FFT over planar re/im arrays (no complex dtype anywhere) —
    the TPU-native split transform. Unnormalized forward."""
    re = jnp.asarray(re, jnp.float32)
    im = jnp.asarray(im, jnp.float32)
    n = int(n if n is not None else re.shape[-1])
    return matmul_backend.fft_split(re, im, n)


def split_ifft(re, im, n: int | None = None):
    """Inverse split C2C transform, normalized (includes 1/N)."""
    re = jnp.asarray(re, jnp.float32)
    im = jnp.asarray(im, jnp.float32)
    n = int(n if n is not None else re.shape[-1])
    our, oui = matmul_backend.fft_split(re, im, n, inverse=True)
    return our / n, oui / n
