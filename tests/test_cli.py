"""End-to-end CLI tests — the reference's ``neo_convolver`` surface
(``/root/reference/extra/cli/src/convolver.cpp:60-148``): WAV in/out,
engine selection, perceptual sparsification, real-time-factor report."""

import numpy as np
import pytest

from neojax.cli import main as cli_main
from neojax.io.wav import read_wav, write_wav

SR = 8000


@pytest.fixture()
def wavs(tmp_path):
    rng = np.random.default_rng(0)
    sig = rng.uniform(-0.9, 0.9, (2, 4 * 1024)).astype(np.float32)
    t = np.arange(2048) / SR
    ir = (rng.standard_normal((2, t.size)) * np.exp(-t / 0.05)[None]).astype(
        np.float32
    )
    ir /= np.abs(ir).max()  # PCM files clip outside full scale
    sp, ip, op = (tmp_path / n for n in ("sig.wav", "ir.wav", "out.wav"))
    write_wav(str(sp), sig, SR, bits=32)
    write_wav(str(ip), ir, SR, bits=32)
    return str(sp), str(ip), str(op), sig, ir


def _oracle(sig, ir):
    from neojax import conv

    irn = np.asarray(conv.normalize_impulse(ir))
    return np.stack(
        [np.convolve(sig[i], irn[i])[: sig.shape[1]] for i in range(sig.shape[0])]
    )


@pytest.mark.parametrize("engine", ["upols", "upola", "nested", "hybrid"])
def test_cli_engines_match_direct_convolution(wavs, engine):
    sp, ip, op, sig, ir = wavs
    rc = cli_main([sp, ip, op, "--block", "256", "--engine", engine,
                   "--chunk-blocks", "4", "--bits", "32"])
    assert rc == 0
    out, sr = read_wav(op)
    assert sr == SR and out.shape == sig.shape
    ref = _oracle(sig, ir)
    # the CLI peak-normalizes outputs above full scale; compare shapes
    out = out / np.abs(out).max()
    ref = ref / np.abs(ref).max()
    err = np.abs(out - ref).max()
    assert err < 1e-3, f"{engine}: max err {err:.2e}"


def test_cli_threshold_sparsifies(wavs, capsys):
    sp, ip, op, sig, ir = wavs
    rc = cli_main([sp, ip, op, "--block", "256", "--threshold-db", "-40",
                   "--bits", "32"])
    assert rc == 0
    text = capsys.readouterr().out
    assert "perceptual mask" in text
    out, _ = read_wav(op)
    # sparse filter = different filter; just sanity-check energy is present
    assert np.abs(out).max() > 1e-3


def test_cli_channel_mismatch_errors(tmp_path, wavs):
    sp, ip, op, sig, ir = wavs
    bad = tmp_path / "bad.wav"
    write_wav(str(bad), np.zeros((3, 1024), np.float32), SR, bits=32)
    rc = cli_main([sp, str(bad), op, "--block", "256"])
    assert rc == 2
