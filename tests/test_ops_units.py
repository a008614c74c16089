"""Units / math extras / ops parity (decibel, a-weighting, normalize, stats)."""

import numpy as np
import pytest

import neojax
from neojax import core, ops
from neojax.ops import allclose


def test_amplitude_to_db():
    assert float(neojax.amplitude_to_db(1.0)) == pytest.approx(0.0, abs=1e-6)
    assert float(neojax.amplitude_to_db(0.5)) == pytest.approx(-6.0206, abs=1e-3)
    assert float(neojax.amplitude_to_db(10.0)) == pytest.approx(20.0, abs=1e-5)
    # floor at -144, non-positive maps to floor
    assert float(neojax.amplitude_to_db(0.0)) == -144.0
    assert float(neojax.amplitude_to_db(-1.0)) == -144.0
    assert float(neojax.amplitude_to_db(1e-10)) == -144.0


def test_amplitude_to_db_estimate_close_to_accurate():
    x = np.linspace(0.01, 2.0, 100).astype(np.float32)
    acc = np.asarray(neojax.amplitude_to_db(x))
    est = np.asarray(neojax.amplitude_to_db(x, precision="estimate"))
    assert np.max(np.abs(acc - est)) < 0.1  # fast_log2 approx error in dB


def test_fast_log2():
    x = np.array([1.0, 2.0, 4.0, 0.5, 3.14159], dtype=np.float32)
    out = np.asarray(neojax.fast_log2(x))
    assert np.max(np.abs(out - np.log2(x))) < 0.01


def test_a_weighting_spot_values():
    # IEC A-weighting: 0 dB at 1 kHz, about -19.1 dB at 100 Hz
    assert float(neojax.a_weighting(1000.0)) == pytest.approx(0.0, abs=0.05)
    assert float(neojax.a_weighting(100.0)) == pytest.approx(-19.1, abs=0.2)
    assert float(neojax.a_weighting(10000.0)) == pytest.approx(-2.5, abs=0.2)


def test_mel_roundtrip():
    hz = np.array([100.0, 440.0, 1000.0, 8000.0])
    back = np.asarray(core.mel_to_hertz(core.hertz_to_mel(hz)))
    assert np.max(np.abs(back - hz) / hz) < 1e-4

    freqs = np.asarray(core.mel_frequencies(5, 0.0, 8000.0))
    assert freqs.shape == (5,)
    assert freqs[0] == pytest.approx(0.0, abs=1e-3)
    assert freqs[-1] == pytest.approx(8000.0, rel=1e-3)


def test_windows_match_formulas():
    n = 64
    i = np.arange(n)
    hann = 0.5 * (1 - np.cos(2 * np.pi * i / (n - 1)))
    hamming = 0.54 - 0.46 * np.cos(2 * np.pi * i / (n - 1))
    assert allclose(core.hann_window(n), hann.astype(np.float32), 1e-6)
    assert allclose(core.hamming_window(n), hamming.astype(np.float32), 1e-6)
    assert allclose(core.rectangular_window(n), np.ones(n), 0)


def test_normalize_energy_and_peak(make_noise):
    x = make_noise(1024) * 3.0
    y = np.asarray(ops.normalize_energy(x))
    assert np.sum(y**2) == pytest.approx(1.0, rel=1e-4)
    z = np.asarray(ops.normalize_peak(x))
    assert np.max(np.abs(z)) == pytest.approx(1.0, rel=1e-5)


def test_normalize_impulse_multichannel(make_noise):
    x = make_noise(4, 512)
    x[2] *= 10.0  # loudest channel dominates the factor
    y = np.asarray(ops.normalize_impulse(x))
    energies = np.sum(y**2, axis=1)
    assert np.max(energies) == pytest.approx(1.0, rel=1e-3)
    # relative channel balance preserved
    ratios = energies / np.sum(np.asarray(x) ** 2, axis=1)
    assert np.allclose(ratios, ratios[0], rtol=1e-4)


def test_stats(make_noise):
    x = make_noise(1000).astype(np.float64)
    assert float(ops.mean(x)) == pytest.approx(np.mean(x), abs=1e-9)
    assert float(ops.variance(x)) == pytest.approx(np.var(x), abs=1e-9)
    assert float(ops.standard_deviation(x)) == pytest.approx(np.std(x), abs=1e-9)
    y = make_noise(1000).astype(np.float64)
    assert float(ops.mean_squared_error(x, y)) == pytest.approx(np.mean((x - y) ** 2), abs=1e-9)
    assert float(ops.root_mean_squared_error(x, y)) == pytest.approx(
        np.sqrt(np.mean((x - y) ** 2)), abs=1e-9
    )


def test_allclose_tolerances(make_noise):
    x = make_noise(100)
    assert ops.allclose(x, x + 5e-6)  # f32 default 1e-5
    assert not ops.allclose(x, x + 5e-5)
    assert ops.allclose(x.astype(np.float64), x.astype(np.float64) + 5e-10)
    assert not ops.allclose(x.astype(np.float64), x.astype(np.float64) + 5e-9)
    assert ops.allmatch(x, x.copy())
    assert not ops.allmatch(x, x + 1e-7)


def test_quantize_roundtrip(make_noise):
    x = make_noise(256)
    for dtype, tol in [(np.int8, 5e-3), (np.int16, 1e-4)]:
        q = ops.quantize_fixed(np.asarray(x), dtype)
        back = np.asarray(ops.dequantize_fixed(q))
        assert np.max(np.abs(back - x)) < tol
