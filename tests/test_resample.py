"""Polyphase IR resampler — reference parity for loadAndResample
(``extra/plugin/src/dsp/AudioFile.cpp:22-27``, ``AudioBuffer.cpp:11-34``)."""

import numpy as np
import pytest

from neojax.io.resample import polyphase_weights, resample


@pytest.mark.parametrize(
    "sr_in,sr_out",
    [(44100, 48000), (48000, 44100), (22050, 44100), (48000, 16000)],
)
def test_tone_preserved_across_rates(sr_in, sr_out):
    f = 1000.0
    x = np.sin(2 * np.pi * f * np.arange(int(sr_in * 0.4)) / sr_in).astype(np.float32)
    y = resample(x, sr_in, sr_out)
    t_out = np.arange(y.shape[-1]) / sr_out
    want = np.sin(2 * np.pi * f * t_out)
    m = slice(200, y.shape[-1] - 200)  # edge taper excluded
    assert np.abs(y[m] - want[m]).max() < 2e-4


def test_output_length_and_identity():
    x = np.random.default_rng(0).standard_normal(12345).astype(np.float32)
    assert resample(x, 48000, 48000).shape == x.shape
    y = resample(x, 44100, 48000)
    assert y.shape[-1] == -(-12345 * 160 // 147)


def test_dc_and_multichannel():
    x = np.ones((3, 4000), np.float32)
    y = resample(x, 44100, 48000)
    assert y.shape == (3, -(-4000 * 160 // 147))
    assert np.abs(y[:, 100:-100] - 1.0).max() < 1e-4


def test_downsample_rejects_aliasing():
    # A tone above the target Nyquist must be attenuated, not folded.
    sr_in, sr_out = 48000, 16000
    f = 11000.0  # > 8 kHz target Nyquist
    x = np.sin(2 * np.pi * f * np.arange(sr_in // 2) / sr_in).astype(np.float32)
    y = resample(x, sr_in, sr_out)
    assert np.sqrt(np.mean(y[200:-200] ** 2)) < 1e-3  # vs 0.707 if passed


def test_weight_bank_shape_and_partition_of_unity():
    w = polyphase_weights(160, 147, half_width=32)
    assert w.shape == (160, 64)
    # Interpolating a constant: every phase's taps must sum to ~1.
    assert np.abs(w.sum(axis=1) - 1.0).max() < 1e-4


def test_cli_resamples_mismatched_impulse(tmp_path):
    from neojax import cli
    from neojax.io.wav import read_wav, write_wav

    rng = np.random.default_rng(3)
    sr = 16000
    sig = rng.uniform(-1, 1, (1, sr)).astype(np.float32)
    ir_sr = 8000
    ir = np.zeros((1, 400), np.float32)
    ir[0, 0] = 1.0  # identity impulse at 8 kHz stays ~identity at 16 kHz
    sig_p, ir_p, out_p = (str(tmp_path / n) for n in ("s.wav", "i.wav", "o.wav"))
    write_wav(sig_p, sig, sr, bits=32)
    write_wav(ir_p, ir, ir_sr, bits=32)
    assert cli.main([sig_p, ir_p, out_p, "--block", "512", "--bits", "32"]) == 0
    out, out_sr = read_wav(out_p)
    assert out_sr == sr
    # Resampled identity keeps the signal within the resampler's passband
    # accuracy; compare against the direct convolution oracle.
    from neojax.io.resample import resample as rs

    ir_rs = rs(ir, ir_sr, sr)
    from neojax import conv

    ir_n = np.asarray(conv.normalize_impulse(ir_rs))
    want = np.convolve(sig[0], ir_n[0])[: sig.shape[1]]
    want = want / np.abs(want).max()  # the CLI peak-normalizes its output
    assert np.abs(out[0] - want).max() < 5e-3


def test_write_wav_pcm32_full_scale_roundtrip(tmp_path):
    """Full-scale +1.0 samples must not wrap to -1 (f32 scaling overflowed
    int32 before the float64 fix)."""
    from neojax.io.wav import read_wav, write_wav

    x = np.array([[1.0, -1.0, 0.5, 0.999999]], np.float32)
    p = str(tmp_path / "fs.wav")
    write_wav(p, x, 48000, bits=32)
    y, _ = read_wav(p)
    assert np.abs(y - x).max() < 1e-6
    assert y[0, 0] > 0.99  # not sign-flipped
