"""Tests for fixed-point, FFT extras, checkpoint I/O, quality harness, spectrum."""

import os
import tempfile

import numpy as np
import pytest

from neojax import bench, conv, fft, io
from neojax.core import fixed_point as fp


# ------------------------------------------------------------- fixed point


def test_fixed_point_roundtrip(make_noise):
    x = make_noise(256) * 0.9
    for fmt, tol in [(fp.Q7, 1 / 127), (fp.Q15, 1 / 32767)]:
        q = fp.to_fixed(x, fmt)
        back = np.asarray(fp.to_float(q, fmt))
        assert np.abs(back - x).max() < tol


def test_fixed_point_saturating_add():
    a = fp.to_fixed(np.array([0.9, -0.9, 0.5]), fp.Q7)
    b = fp.to_fixed(np.array([0.9, -0.9, 0.25]), fp.Q7)
    out = np.asarray(fp.fixed_add(a, b))
    assert out[0] == 127  # saturated high
    assert out[1] == -128  # saturated low
    assert abs(float(fp.to_float(out, fp.Q7)[2]) - 0.75) < 2 / 127


def test_fixed_point_multiply():
    a = fp.to_fixed(np.array([0.5, -0.5, 0.25]), fp.Q15)
    b = fp.to_fixed(np.array([0.5, 0.5, 0.25]), fp.Q15)
    out = np.asarray(fp.to_float(fp.fixed_multiply(a, b), fp.Q15))
    assert np.abs(out - np.array([0.25, -0.25, 0.0625])).max() < 1e-3


def test_fixed_point_subtract_saturates():
    a = fp.to_fixed(np.array([-0.9]), fp.Q15)
    b = fp.to_fixed(np.array([0.9]), fp.Q15)
    assert int(fp.fixed_subtract(a, b)[0]) == -32768


# -------------------------------------------------------------- fft extras


def test_rfft_deinterleave(make_noise):
    x = make_noise(256)
    y = make_noise(256)
    xf, yf = fft.rfft_deinterleave(x, y)
    assert np.abs(np.asarray(xf) - np.fft.rfft(x)).max() < 1e-3
    assert np.abs(np.asarray(yf) - np.fft.rfft(y)).max() < 1e-3


def test_split_fft_roundtrip(make_noise):
    re = make_noise(128)
    im = make_noise(128)
    fr, fi = fft.split_fft(re, im)
    ref = np.fft.fft(re + 1j * im)
    assert np.abs(np.asarray(fr) - ref.real).max() < 1e-3
    assert np.abs(np.asarray(fi) - ref.imag).max() < 1e-3
    br, bi = fft.split_ifft(fr, fi)
    assert np.abs(np.asarray(br) - re).max() < 1e-4
    assert np.abs(np.asarray(bi) - im).max() < 1e-4


# -------------------------------------------------------------- checkpoint


@pytest.mark.parametrize("storage", ["dense", "int8"])
def test_checkpoint_roundtrip(make_noise, storage):
    b = 64
    ir = make_noise(3 * b)
    sig = make_noise(1, 4 * b)
    parts = conv.uniform_partition(ir, b)
    cfg = conv.PartitionedConfig(b, parts.shape[1], channels=1, storage=storage)
    params = conv.filter_params(cfg, parts)
    state = conv.init_state(cfg)
    state, first = conv.process(cfg, params, state, sig)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "state.npz")
        io.save_state(path, state)
        restored = io.load_state(path)

    _, out_a = conv.process(cfg, params, state, sig)
    _, out_b = conv.process(cfg, params, restored, sig)
    assert np.array_equal(np.asarray(out_a), np.asarray(out_b))


# ---------------------------------------------------------- quality sweep


def test_sparse_quality_sweep_monotone(make_noise):
    sr = 8000.0
    sig = make_noise(1, 4096)
    ir = (make_noise(2048) * np.exp(-np.arange(2048) / 400)).astype(np.float32)
    pts = bench.sparse_quality_sweep(
        sig, ir, sample_rate=sr, block_size=512, stft_size=256,
        thresholds_db=[-20.0, -60.0],
    )
    assert len(pts) == 2
    # more dynamic range kept (lower threshold) -> denser mask, lower error
    assert pts[1].density >= pts[0].density
    assert pts[1].rmse <= pts[0].rmse + 1e-9
    assert pts[1].rmse_db <= 0.0


# -------------------------------------------------------------- spectrum


def test_spectrum_image_and_histogram(make_noise):
    parts = conv.uniform_partition(make_noise(2048), 256)
    img = bench.power_spectrum_image(parts[0])
    assert img.shape == parts[0].shape
    assert img.max() <= 0.0 and img.min() >= -144.0
    counts, edges = bench.db_histogram(parts[0])
    assert counts.sum() == parts[0].size
    assert len(counts) == 144


# ------------------------------------------------------------ bench utils


def test_measure_counters():
    import jax.numpy as jnp
    import jax

    f = jax.jit(lambda v: v * 2.0)
    x = jnp.ones((1024,))
    r = bench.measure("x2", f, x, items=1024, bytes_moved=8192, flops=1024)
    assert r.seconds > 0
    assert r.items_per_sec > 0
    assert "x2" in str(r)
    assert bench.fft_flops(1024) == int(5 * 1024 * 10)


def test_packed_rfft_matches_numpy(make_noise):
    """Half-size-packed real FFT (reference fft/experimental/rfft.hpp:20)."""
    from neojax import fft as nfft

    for n in (8, 64, 256):
        x = np.asarray(make_noise(3, n), np.float32)
        re, im = nfft.packed_rfft(x)
        ref = np.fft.rfft(x, axis=-1)
        assert np.max(np.abs(np.asarray(re) - ref.real)) < 1e-4
        assert np.max(np.abs(np.asarray(im) - ref.imag)) < 1e-4
        back = nfft.packed_irfft(re, im)
        assert np.max(np.abs(np.asarray(back) - x)) < 1e-5


def test_packed_rfft_odd_size_rejected():
    from neojax import fft as nfft
    import pytest as _pytest

    with _pytest.raises(ValueError):
        nfft.packed_rfft(np.zeros(7, np.float32))
