"""Round-4 device-gated pins: large-block four-step streaming, lane-sparse
fused correctness, and the hybrid exact-class SNR at production depth.

Closes VERDICT r3 items #1 (the block-4096 path must be CORRECT on
device, not just fast), #2 (perceptual lane skipping verified at scale),
and #7 (a single-block-latency engine pinned in the exact >=90 dB class
at P = 960).

Run with::

    NEOJAX_TPU_TESTS=1 python -m pytest tests/test_tpu_device_r4.py -q
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from functools import partial

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="requires a real TPU device"
)


@pytest.fixture(scope="module")
def rng_mod():
    return np.random.default_rng(17)


def _oracle_f64(parts, sig, b):
    p = parts.shape[1]
    c, t = sig.shape
    nb = t // b
    n = 2 * b
    window = np.zeros((c, n))
    hist = np.zeros((p, c, b + 1), np.complex128)
    pf = parts[0].astype(np.complex128)
    out = np.zeros_like(sig, dtype=np.float64)
    for i in range(nb):
        window[:, :b] = window[:, b:]
        window[:, b:] = sig[:, i * b : (i + 1) * b]
        pos = i % p
        hist[pos] = np.fft.rfft(window, axis=-1)
        idx = (pos - np.arange(p)) % p
        acc = (hist[idx] * pf[:, None]).sum(0)
        out[:, i * b : (i + 1) * b] = np.fft.irfft(acc, n=n, axis=-1)[:, b:]
    return out


def _snr(out, ref):
    err = np.asarray(out, np.float64) - ref
    return 10 * np.log10(float((ref**2).sum()) / float((err**2).sum()))


def test_fourstep_stream_block4096_on_device(rng_mod):
    """The large-block (four-step transform) streaming route is exact on
    the real chip at the reference benchmark-grid config (VERDICT r3 #1:
    the grid must be fast AND right)."""
    from neojax.conv import convolver as cv

    B, P, C = 4096, 4, 8
    parts = (
        (rng_mod.standard_normal((1, P, B + 1))
         + 1j * rng_mod.standard_normal((1, P, B + 1))) * 0.05
    ).astype(np.complex64)
    sig = rng_mod.uniform(-1, 1, (C, 8 * B)).astype(np.float32)

    cfg = cv.PartitionedConfig(B, P, C, storage="split", mac_backend="pallas")
    assert cv._use_fourstep_stream(cfg)
    params = cv.filter_params(cfg, parts)
    state = cv.init_state(cfg)
    _, out = jax.jit(partial(cv.process, cfg))(params, state, jnp.asarray(sig))
    ref = _oracle_f64(parts, sig.astype(np.float64), B)
    assert _snr(out, ref) > 90.0  # exact f32 class


def test_fused_lane_sparse_perceptual_at_scale(rng_mod):
    """Lane-width skipping at the production config (P=960, C=64, B=512):
    a room-like perceptual mask through the fused stream equals the
    dense fused stream on the same masked filter (split storage, exact
    class). Covers real chunk counts (30) and all width codes on the
    actual chip."""
    from neojax.conv import convolver as cv
    from neojax.conv.sparse import perceptual_mask

    B, P, C = 512, 960, 64
    # frequency-dependent decay -> bin-structured mask
    decay = np.exp(
        -np.arange(P)[:, None]
        / (40.0 + 900.0 * np.exp(-np.arange(B + 1)[None, :] / 64.0))
    )
    parts = (
        (rng_mod.standard_normal((1, P, B + 1))
         + 1j * rng_mod.standard_normal((1, P, B + 1))) * 0.05 * decay[None]
    ).astype(np.complex64)
    mask = perceptual_mask(parts[0], 48000.0, -60.0)
    assert 0.01 < mask.mean() < 0.9

    sig = rng_mod.uniform(-1, 1, (C, 32 * B)).astype(np.float32)
    cfg = cv.PartitionedConfig(
        B, P, C, storage="split", mac_backend="pallas", fused=True
    )
    params_s = cv.filter_params(cfg, parts, sparsity=mask)
    assert "sp_c_idx" in params_s
    codes = np.unique(np.asarray(params_s["sp_c_idx"]) >> 16)
    assert len(codes) > 1, "production mask should use multiple widths"
    _, out_s = jax.jit(partial(cv.process, cfg))(
        params_s, cv.init_state(cfg), jnp.asarray(sig)
    )

    masked = np.where(mask[None], parts, 0)
    params_d = cv.filter_params(cfg, masked)
    _, out_d = jax.jit(partial(cv.process, cfg))(
        params_d, cv.init_state(cfg), jnp.asarray(sig)
    )
    scale = float(jnp.max(jnp.abs(out_d)))
    diff = float(jnp.max(jnp.abs(out_s - out_d)))
    assert diff / max(scale, 1e-6) < 2e-5


@pytest.mark.parametrize(
    "storage,floor_db", [("split", 90.0), ("int16", 74.0)]
)
def test_hybrid_snr_floor_at_headline_depth(rng_mod, storage, floor_db):
    """Single-block-latency engine in the EXACT reference classes at
    P=960 (VERDICT r3 #7): hybrid/split >= 90 dB, hybrid/int16 >= 74 dB
    vs the f64 oracle."""
    from neojax.conv import convolver as cv
    from neojax.conv import hybrid

    B, P, C, S = 512, 960, 8, 64
    parts = (
        (rng_mod.standard_normal((1, P, B + 1))
         + 1j * rng_mod.standard_normal((1, P, B + 1)))
        * (0.05 * np.exp(-np.arange(P) / (P / 4))[None, :, None])
    ).astype(np.complex64)
    sig = rng_mod.uniform(-1, 1, (C, 4 * S * B)).astype(np.float32)

    cfg = cv.PartitionedConfig(B, P, C, storage=storage)
    params = hybrid.hybrid_filter_params(cfg, parts, S)
    state = hybrid.hybrid_init_state(cfg, params)
    _, out = jax.jit(partial(hybrid.process_hybrid, cfg))(
        params, state, jnp.asarray(sig)
    )
    ref = _oracle_f64(parts, sig.astype(np.float64), B)
    snr = _snr(np.asarray(out)[:, : sig.shape[1]], ref)
    assert snr > floor_db, f"hybrid/{storage} snr {snr:.1f} dB"
