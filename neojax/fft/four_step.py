"""Large-N FFT via the 4-step (Bailey) decomposition on the MXU.

Plays the role of the reference's large-order plan family (its fallback
plans go to order 27, ``c2c_dit2_plan.hpp:22``): for N = N1*N2 the DFT
factors into

  1. N2-point DFTs over the columns of the [N1, N2] reshape,
  2. twiddle multiply by W_N^(n1*k2),
  3. N1-point DFTs over the rows,
  4. index transpose (output k = k2*N1 + k1).

Both DFT stages share one small DFT matrix across the whole batch, so on
TPU they are clean [batch, Nx] @ [Nx, Nx] MXU matmuls (split-complex, no
complex dtype on device) — unlike a butterfly network, which XLA cannot
map onto the systolic array. Supports N up to 4096^2 = 16.7M.

All transforms are unnormalized forward / normalized inverse at the
``fft.api`` layer's conventions.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from neojax.core.bits import bit_ceil, bit_log2
from neojax.fft import matmul_backend

__all__ = ["fft_split_large", "rfft_split_large", "irfft_split_large", "split_n"]


def split_n(n: int) -> tuple[int, int]:
    """Factor pow-2 N into N1*N2 with N1, N2 <= 4096, as square as possible."""
    if n & (n - 1):
        raise ValueError(f"four-step FFT requires a power of two, got {n}")
    log = bit_log2(n)
    l1 = log // 2
    n1, n2 = 1 << l1, 1 << (log - l1)
    if max(n1, n2) > 4096:
        raise ValueError(f"four-step FFT supports N <= {4096 * 4096}, got {n}")
    return n1, n2


@functools.lru_cache(maxsize=16)
def _twiddles_np(n1: int, n2: int):
    # W_N^(n2*k1) over [N2, K1=N1].
    n = n1 * n2
    n2_idx = np.arange(n2)
    k1 = np.arange(n1)
    ang = -2.0 * np.pi * np.outer(n2_idx, k1) / n  # [N2, N1]
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def fft_split_large(re, im, n: int, inverse: bool = False):
    """C2C DFT of size n (pow-2, possibly huge) in split layout over the
    last axis. Unnormalized in both directions (api layer applies norms).

    Decimation: n = n1*N2 + n2, k = k1 + N1*k2 ->
    ``X[k1 + N1 k2] = DFT_n2( W_N^(n2 k1) * DFT_n1(x[., n2])[k1] )[k2]``.
    """
    n1, n2 = split_n(n)
    tc, ts = _twiddles_np(n1, n2)
    tc = jnp.asarray(tc)
    ts = jnp.asarray(ts) * (-1.0 if inverse else 1.0)

    batch_shape = re.shape[:-1]
    xr = re.reshape(*batch_shape, n1, n2)
    xi = im.reshape(*batch_shape, n1, n2)

    # Step 1: N1-point DFTs over the n1 axis (transpose so it is last).
    xr = jnp.swapaxes(xr, -1, -2)  # [.., N2, N1]
    xi = jnp.swapaxes(xi, -1, -2)
    ar, ai = matmul_backend.fft_split(xr, xi, n1, inverse=inverse)  # [.., N2, K1]

    # Step 2: twiddle multiply W_N^(n2*k1).
    br = ar * tc - ai * ts
    bi = ar * ts + ai * tc

    # Step 3: N2-point DFTs over the n2 axis.
    br = jnp.swapaxes(br, -1, -2)  # [.., K1, N2]
    bi = jnp.swapaxes(bi, -1, -2)
    cr, ci = matmul_backend.fft_split(br, bi, n2, inverse=inverse)  # [.., K1, K2]

    # Step 4: output index k = k1 + N1*k2 -> flatten [K2, K1].
    cr = jnp.swapaxes(cr, -1, -2)
    ci = jnp.swapaxes(ci, -1, -2)
    return cr.reshape(*batch_shape, n), ci.reshape(*batch_shape, n)


def rfft_split_large(x, n: int):
    """Real [..., n] -> (re, im) [..., n//2+1] for huge pow-2 n."""
    x = x.astype(jnp.float32)
    zero = jnp.zeros_like(x)
    fr, fi = fft_split_large(x, zero, n)
    k = n // 2 + 1
    return fr[..., :k], fi[..., :k]


def irfft_split_large(re, im, n: int):
    """(re, im) [..., n//2+1] -> real [..., n], normalized (1/n)."""
    k = n // 2 + 1
    # Rebuild the conjugate-symmetric upper half.
    fr = jnp.concatenate([re, re[..., 1 : n - k + 1][..., ::-1]], axis=-1)
    fi = jnp.concatenate([im, -im[..., 1 : n - k + 1][..., ::-1]], axis=-1)
    tr, _ = fft_split_large(fr, fi, n, inverse=True)
    return tr / n
