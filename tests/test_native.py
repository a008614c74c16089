"""Native (C++) runtime tests: WAV codec parity + re-blocker semantics."""

import numpy as np
import pytest

from neojax.io import native as nat


lib = nat.load_runtime()
pytestmark = pytest.mark.skipif(lib is None, reason="native runtime not built")


def test_native_wav_roundtrip(tmp_path, make_noise):
    x = (make_noise(2, 4000) * 0.9).astype(np.float32)
    path = str(tmp_path / "x.wav")
    nat.native_write_wav(path, x, 44100)
    y, sr = nat.native_read_wav(path)
    assert sr == 44100
    assert y.shape == x.shape
    assert np.abs(y - x).max() < 1.0 / 10000  # 16-bit quant + 32767/32768 scale


def test_native_matches_python_codec(tmp_path, make_noise):
    from neojax.io.wav import read_wav, write_wav

    x = (make_noise(3, 2000) * 0.5).astype(np.float32)
    p1 = str(tmp_path / "n.wav")
    p2 = str(tmp_path / "p.wav")
    nat.native_write_wav(p1, x, 48000)
    write_wav(p2, x, 48000)

    a, _ = nat.native_read_wav(p2)
    b, _ = read_wav(p1)
    c, _ = read_wav(p2)
    assert np.array_equal(a, c)  # native decode == python decode
    assert np.abs(b - x).max() < 1.0 / 10000


def test_reblocker_identity_with_latency(make_noise):
    x = (make_noise(2, 3000)).astype(np.float32)
    rb = nat.Reblocker(2, 128)
    outs = []
    for i in range(0, 3000, 100):  # host blocks not a divisor of the frame
        blk = x[:, i : i + 100]
        if blk.shape[1] < 100:
            blk = np.pad(blk, ((0, 0), (0, 100 - blk.shape[1])))
        outs.append(rb.process(blk, lambda f: f))
    out = np.concatenate(outs, axis=1)
    delayed = np.pad(x, ((0, 0), (128, 0)))[:, : out.shape[1]]
    assert np.abs(out - delayed).max() == 0.0


def test_reblocker_with_convolver(make_noise):
    """Drive a partitioned convolver through the native re-blocker at an
    awkward host block size — the plugin's real-time topology."""
    from neojax import conv

    b = 128
    ir = make_noise(2 * b) * 0.3
    parts = conv.uniform_partition(ir, b)
    c = conv.upols_convolver()
    c.filter(parts)

    x = make_noise(1, 2048).astype(np.float32)
    rb = nat.Reblocker(1, b)
    outs = []
    for i in range(0, 2048, 96):
        blk = x[:, i : i + 96]
        if blk.shape[1] < 96:
            blk = np.pad(blk, ((0, 0), (0, 96 - blk.shape[1])))
        outs.append(rb.process(blk, lambda f: np.asarray(c(f))))
    out = np.concatenate(outs, axis=1)

    ref = np.convolve(x[0], ir)[: out.shape[1] - b]
    got = out[0, b:]  # compensate one frame of latency
    assert np.abs(got - ref[: got.shape[0]]).max() < 1e-4
