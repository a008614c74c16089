"""4-step (large-N matmul) FFT parity vs numpy."""

import numpy as np
import pytest
import jax.numpy as jnp

from neojax.fft.four_step import (
    fft_split_large,
    irfft_split_large,
    rfft_split_large,
    split_n,
)


def test_split_n():
    assert split_n(1 << 14) == (128, 128)
    assert split_n(1 << 15) == (128, 256)
    assert split_n(1 << 20) == (1024, 1024)
    with pytest.raises(ValueError):
        split_n(1000)


@pytest.mark.parametrize("n", [1 << 12, 1 << 14, 1 << 16])
def test_fft_large_vs_numpy(make_noise, n):
    x = make_noise(n) + 1j * make_noise(n)
    re, im = fft_split_large(
        jnp.asarray(x.real), jnp.asarray(x.imag), n
    )
    ref = np.fft.fft(x)
    scale = np.abs(ref).max()
    err = np.abs((np.asarray(re) + 1j * np.asarray(im)) - ref).max()
    assert err / scale < 1e-4


@pytest.mark.parametrize("n", [1 << 14, 1 << 17])
def test_rfft_irfft_large_roundtrip(make_noise, n):
    x = make_noise(n)
    re, im = rfft_split_large(jnp.asarray(x), n)
    ref = np.fft.rfft(x)
    scale = np.abs(ref).max()
    assert np.abs((np.asarray(re) + 1j * np.asarray(im)) - ref).max() / scale < 1e-4

    back = np.asarray(irfft_split_large(re, im, n))
    assert np.abs(back - x).max() < 1e-3


def test_api_routes_large_sizes(make_noise):
    """fft.api with explicit matmul backend should route huge pow-2 sizes
    through the 4-step path and still match numpy."""
    from neojax import fft as nfft

    n = 1 << 14
    x = make_noise(n)
    out = np.asarray(nfft.rfft(x, backend="matmul"))
    ref = np.fft.rfft(x)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 1e-4
