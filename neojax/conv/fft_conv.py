"""Single-shot FFT convolution.

Counterpart of ``src/neo/convolution/fft_convolver.hpp:20-93``: zero-pad
both inputs to ``bit_ceil(n + l - 1)``, rfft both, multiply bin-wise, irfft
(the reference's unnormalized inverse + 1/N scale == a normalized irfft),
crop to ``n + l - 1``.
"""

from __future__ import annotations

import jax.numpy as jnp

from neojax.core.bits import bit_ceil
from neojax.fft import api as fft_api

__all__ = ["fft_convolve"]


def fft_convolve(signal, patch, backend: str | None = None):
    """Full linear convolution via a pow-2-padded rfft (last-axis, batched)."""
    signal = jnp.asarray(signal)
    patch = jnp.asarray(patch)
    if signal.size == 0 or patch.size == 0:
        return jnp.zeros((0,), dtype=signal.dtype)

    n = signal.shape[-1]
    l = patch.shape[-1]
    out_len = n + l - 1
    size = bit_ceil(out_len)

    sig_spec = fft_api.rfft(signal, n=size, backend=backend)
    pat_spec = fft_api.rfft(patch, n=size, backend=backend)
    out = fft_api.irfft(sig_spec * pat_spec, n=size, backend=backend)
    return out[..., :out_len].astype(signal.dtype)
