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


# ------------------------------------------------------- tile-sparse MAC

from neojax.kernels.sparse_mac import build_sparse_schedule, sparse_fdl_mac_pallas


def _band_mask(rng, p, k):
    """Band-structured mask like a perceptual threshold: partition j keeps
    bins below a decaying cutoff (plus a random sprinkle)."""
    cut = (k * np.exp(-3.0 * np.arange(p) / p)).astype(int)
    mask = np.arange(k)[None, :] < cut[:, None]
    mask |= rng.random((p, k)) < 0.02
    return mask


def test_build_sparse_schedule_covers_rotations(rng):
    p, k, pc, kt = 24, 260, 4, 128
    mask = _band_mask(rng, p, k)
    s = build_sparse_schedule(mask, pc, kt)
    nk = -(-k // kt)
    padk = np.zeros((p, nk * kt), bool)
    padk[:, :k] = mask
    q = padk.reshape(p, nk, kt).any(2)
    for w in range(p):
        # ring slot i uses filter partition (w - i) % p
        rot = np.stack([q[(w - i) % p] for i in range(p)])
        want = {
            (kk, cc)
            for cc, kk in zip(*np.nonzero(rot.reshape(p // pc, pc, nk).any(1)))
        }
        got = {
            (int(s["k_idx"][w, i]), int(s["p_idx"][w, i]))
            for i in range(s["k_idx"].shape[1])
            if s["flags"][w, i] == 1
        }
        assert got == want
    assert np.array_equal(s["lane_mask"], np.repeat(q.any(0), kt)[:k])
    assert 0 < s["density"] < 1


@pytest.mark.parametrize("quant", [False, True])
def test_sparse_mac_matches_dense_masked(make_noise, rng, quant):
    from neojax.conv import fdl as fdl_lib

    p, c, k, pc, kt = 16, 2, 130, 4, 128
    mask = _band_mask(rng, p, k)
    filt_re = make_noise(p, 1, k) * mask[:, None, :]
    filt_im = make_noise(p, 1, k) * mask[:, None, :]
    sched = build_sparse_schedule(mask, pc, kt)
    if quant:
        planes = np.clip(np.round(make_noise(2, p, c, k) * 100), -127, 127).astype(
            np.int8
        )
        scales = (np.abs(make_noise(p, c)) + 0.5).astype(np.float32)
        x = planes.astype(np.float32) * (scales[None, :, :, None] / 127.0)
    else:
        planes = make_noise(2, p, c, k)
        scales = None
        x = planes
    for pos in [0, 3, p - 1]:
        tiled_re = np.concatenate([filt_re[::-1]] * 2, 0)
        tiled_im = np.concatenate([filt_im[::-1]] * 2, 0)
        rot_re = tiled_re[p - 1 - pos : 2 * p - 1 - pos]
        rot_im = tiled_im[p - 1 - pos : 2 * p - 1 - pos]
        got_re, got_im = sparse_fdl_mac_pallas(
            jnp.asarray(planes),
            jnp.asarray(rot_re),
            jnp.asarray(rot_im),
            jnp.asarray(pos),
            jnp.asarray(sched["k_idx"]),
            jnp.asarray(sched["p_idx"]),
            jnp.asarray(sched["flags"]),
            None if scales is None else jnp.asarray(scales),
            p_chunk=pc,
            k_tile=kt,
            interpret=True,
        )
        got_re = np.where(sched["lane_mask"], np.asarray(got_re), 0.0)
        got_im = np.where(sched["lane_mask"], np.asarray(got_im), 0.0)
        want_re = (x[0] * rot_re - x[1] * rot_im).sum(0)
        want_im = (x[0] * rot_im + x[1] * rot_re).sum(0)
        np.testing.assert_allclose(got_re, want_re, atol=1e-4)
        np.testing.assert_allclose(got_im, want_im, atol=1e-4)
