"""Device-gated kernel tests: real-TPU correctness (VERDICT round-1 item 7).

Run with::

    NEOJAX_TPU_TESTS=1 python -m pytest tests/test_tpu_device.py -q

Everything here is skipped on the CPU mesh (where the same kernels are
covered in interpreter mode by ``test_pallas_kernels.py`` /
``test_fused_step.py``); on a real chip it asserts that the compiled Mosaic
kernels agree with the XLA paths and that the engines hold their SNR floors
against a host f64 oracle — the reference's fallback-vs-vendor cross-check
strategy (``src/neo/fft/rfft_test.cpp:73-78``) applied to hardware.
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
    return np.random.default_rng(7)


# --------------------------------------------------------------- MAC kernel


@pytest.mark.parametrize("storage", ["split", "bf16", "int16", "int8"])
def test_fdl_mac_pallas_matches_xla_on_device(rng_mod, storage):
    from neojax.conv import fdl as fdl_lib
    from neojax.kernels.fdl_mac import fdl_mac_pallas

    p, c, k = 96, 8, 512
    spec = rng_mod.standard_normal((2, p, c, k)).astype(np.float32) * 0.1
    fr = jnp.asarray(rng_mod.standard_normal((p, 1, k)), jnp.float32)
    fi = jnp.asarray(rng_mod.standard_normal((p, 1, k)), jnp.float32)

    if storage == "split":
        planes, scales = jnp.asarray(spec, jnp.float32), None
    elif storage == "bf16":
        planes, scales = jnp.asarray(spec, jnp.bfloat16), None
    else:
        m = 127.0 if storage == "int8" else 32767.0
        peak = np.abs(spec).max(axis=(0, 3))  # [P, C]
        q = np.clip(np.round(spec / peak[None, :, :, None] * m), -m, m)
        planes = jnp.asarray(q, jnp.int8 if storage == "int8" else jnp.int16)
        scales = jnp.asarray(peak, jnp.float32)

    if scales is None:
        pr, pi = jax.jit(fdl_mac_pallas)(planes, fr, fi)
        xr, xi = fdl_lib.fdl_mac_split(planes, fr, fi)
    else:
        pr, pi = jax.jit(fdl_mac_pallas)(planes, fr, fi, scales)
        xr, xi = fdl_lib.fdl_mac_split((planes, scales[..., None]), fr, fi)
    err = max(
        np.abs(np.asarray(pr) - np.asarray(xr)).max(),
        np.abs(np.asarray(pi) - np.asarray(xi)).max(),
    )
    assert err / max(1e-9, np.abs(np.asarray(xr)).max()) < 2e-4


# ------------------------------------------------------------ fused stream


@pytest.mark.parametrize("storage,tol", [("bf16", 5e-3), ("int8", 2e-2), ("split", 1e-4)])
def test_fused_stream_matches_unfused_on_device(rng_mod, storage, tol):
    from neojax.conv import convolver as cv

    b, p, c = 512, 64, 8
    parts = (
        (rng_mod.standard_normal((1, p, b + 1)) + 1j * rng_mod.standard_normal((1, p, b + 1)))
        * 0.05
    ).astype(np.complex64)
    sig = jnp.asarray(rng_mod.uniform(-1, 1, (c, 8 * b)), jnp.float32)
    outs = {}
    for fused in (True, False):
        cfg = cv.PartitionedConfig(b, p, c, storage=storage, fused=fused)
        params = cv.filter_params(cfg, parts)
        state = cv.init_state(cfg)
        _, out = jax.jit(partial(cv.process, cfg))(params, state, sig)
        outs[fused] = np.asarray(out)
    scale = max(1e-6, np.abs(outs[False]).max())
    assert np.abs(outs[True] - outs[False]).max() / scale < tol


# -------------------------------------------------------------- SNR floors


def _oracle_f64(parts, sig, b):
    """Exact UPOLS recurrence in host f64 (same schedule as conv.step)."""
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


@pytest.mark.parametrize(
    "storage,floor_db", [("int8", 38.0), ("bf16", 44.0), ("int16", 80.0)]
)
def test_nested_engine_snr_floor_on_device(rng_mod, storage, floor_db):
    from neojax.conv import convolver as cv
    from neojax.conv import nested

    b, p, c, s = 512, 128, 8, 32
    parts = (
        (rng_mod.standard_normal((1, p, b + 1)) + 1j * rng_mod.standard_normal((1, p, b + 1)))
        * (0.05 * np.exp(-np.arange(p) / (p / 4))[None, :, None])
    ).astype(np.complex64)
    sig_np = rng_mod.uniform(-1, 1, (c, 4 * s * b)).astype(np.float32)

    cfg = cv.PartitionedConfig(b, p, c, storage=storage)
    params = nested.nested_filter_params(cfg, parts, s)
    state = nested.nested_init_state(cfg, params)
    _, out = jax.jit(partial(nested.process_nested, cfg))(
        params, state, jnp.asarray(sig_np)
    )
    out = np.asarray(out, np.float64)
    ref = _oracle_f64(parts, sig_np, b)
    snr = 10 * np.log10(np.sum(ref**2) / max(1e-30, np.sum((out - ref) ** 2)))
    assert snr > floor_db
