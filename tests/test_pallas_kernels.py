"""Pallas kernel correctness in interpreter mode (the CPU stand-in for TPU)."""

import numpy as np
import pytest
import jax.numpy as jnp

from neojax.kernels.fdl_mac import fdl_mac_pallas


@pytest.mark.parametrize("p", [12, 32, 96, 37])  # incl. chunk-divisor edge cases
@pytest.mark.parametrize("cf", [1, 4])
def test_fdl_mac_matches_reference(make_noise, p, cf):
    c, k = 4, 513
    fdl = make_noise(2, p, c, k)
    fr = make_noise(p, cf, k)
    fi = make_noise(p, cf, k)
    are, aim = fdl_mac_pallas(
        jnp.asarray(fdl), jnp.asarray(fr), jnp.asarray(fi), interpret=True
    )
    ref_re = (fdl[0] * fr - fdl[1] * fi).sum(0)
    ref_im = (fdl[0] * fi + fdl[1] * fr).sum(0)
    assert np.abs(np.asarray(are) - ref_re).max() < 1e-4
    assert np.abs(np.asarray(aim) - ref_im).max() < 1e-4


def test_fdl_mac_quantized(make_noise):
    p, c, k = 16, 4, 129
    q = np.clip(np.round(make_noise(2, p, c, k) * 100), -127, 127).astype(np.int8)
    scl = (np.abs(make_noise(p, c)) + 0.5).astype(np.float32)
    fr = make_noise(p, 1, k)
    fi = make_noise(p, 1, k)
    are, aim = fdl_mac_pallas(
        jnp.asarray(q), jnp.asarray(fr), jnp.asarray(fi), jnp.asarray(scl),
        interpret=True,
    )
    x = q.astype(np.float32) * (scl[None, :, :, None] / 127.0)
    assert np.abs(np.asarray(are) - (x[0] * fr - x[1] * fi).sum(0)).max() < 1e-4
    assert np.abs(np.asarray(aim) - (x[0] * fi + x[1] * fr).sum(0)).max() < 1e-4


def test_convolver_pallas_mac_matches_xla(make_noise):
    """End-to-end: mac_backend='pallas' (interpret on CPU unsupported —
    compare via explicit pallas interpret MAC vs xla MAC inside step)."""
    from neojax.conv import convolver as cv
    from neojax.conv import fdl as fdl_lib

    p, c, k = 32, 2, 65
    fdl = jnp.asarray(make_noise(2, p, c, k))
    fr = jnp.asarray(make_noise(p, 1, k))
    fi = jnp.asarray(make_noise(p, 1, k))
    xr, xi = fdl_lib.fdl_mac_split(fdl, fr, fi)
    pr, pi = fdl_mac_pallas(fdl, fr, fi, interpret=True)
    assert np.abs(np.asarray(xr) - np.asarray(pr)).max() < 1e-4
    assert np.abs(np.asarray(xi) - np.asarray(pi)).max() < 1e-4
