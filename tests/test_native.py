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


def test_native_ring_spsc():
    from neojax.io.native import load_runtime, Ring

    if load_runtime() is None:
        pytest.skip("native runtime not built")
    r = Ring(64)
    assert r.capacity >= 64
    assert r.readable == 0
    data = np.arange(10, dtype=np.float32)
    assert r.write(data) == 10
    assert r.readable == 10
    out = r.read(6)
    assert np.array_equal(out, data[:6])
    assert r.readable == 4
    # wraparound
    big = np.arange(r.capacity - 2, dtype=np.float32)
    wrote = r.write(big)
    assert wrote == min(big.size, r.writable + wrote)
    rest = r.read(r.readable)
    assert np.array_equal(rest[:4], data[6:])


def test_stream_executor_matches_offline(make_noise):
    import jax
    from functools import partial
    from neojax import conv
    from neojax.io.native import load_runtime
    from neojax.io import StreamExecutor

    if load_runtime() is None:
        pytest.skip("native runtime not built")

    b = 64
    p = 6
    ch = 2
    ir = make_noise(p * b) * 0.2
    sig = np.asarray(make_noise(ch, 12 * b), np.float32)
    parts = conv.uniform_partition(ir, b)
    cfg = conv.PartitionedConfig(b, p, channels=ch, storage="split")
    params = conv.filter_params(cfg, parts)

    _, ref = conv.process(cfg, params, conv.init_state(cfg), sig)

    step = jax.jit(partial(conv.step, cfg, params))
    with StreamExecutor(step, conv.init_state(cfg), ch, b) as ex:
        got = []
        pos = 0
        # producer pushes odd-sized chunks; consumer polls
        chunk = 100
        import time
        deadline = time.time() + 30
        while sum(g.shape[1] for g in got) < sig.shape[1]:
            if pos < sig.shape[1]:
                take = min(chunk, sig.shape[1] - pos)
                accepted = ex.push(sig[:, pos : pos + take])
                pos += accepted
            out = ex.pull(256)
            if out.shape[1]:
                got.append(out)
            assert time.time() < deadline, "executor stalled"
    out = np.concatenate(got, axis=1)
    assert out.shape == sig.shape
    assert np.max(np.abs(out - np.asarray(ref))) < 1e-5


def _make_extensible_wav(path, x, sr, subformat):
    """Write a WAVE_FORMAT_EXTENSIBLE file (40-byte fmt + SubFormat GUID)."""
    import struct

    channels, frames = x.shape
    if subformat == 1:  # PCM16
        pcm = (np.clip(x.T.reshape(-1), -1, 1) * 32767.0).round().astype("<i2")
        bits = 16
    else:  # IEEE float32
        pcm = x.T.reshape(-1).astype("<f4")
        bits = 32
    raw = pcm.tobytes()
    guid = struct.pack("<H", subformat) + b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    fmt = struct.pack(
        "<HHIIHHHHI",
        0xFFFE, channels, sr, sr * channels * bits // 8,
        channels * bits // 8, bits, 22, bits, (1 << channels) - 1,
    ) + guid
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)


@pytest.mark.parametrize("subformat", [1, 3])
def test_extensible_wav_subformat_guid(tmp_path, make_noise, subformat):
    """WAVE_FORMAT_EXTENSIBLE resolves via the SubFormat GUID, not bit-depth
    guessing — a 16-bit float or 32-bit PCM extensible file decodes right."""
    from neojax.io.wav import read_wav

    x = (make_noise(2, 500) * 0.8).astype(np.float32)
    path = str(tmp_path / f"ext{subformat}.wav")
    _make_extensible_wav(path, x, 48000, subformat)
    tol = 1.0 / 10000 if subformat == 1 else 1e-7
    y, sr = read_wav(path)
    assert sr == 48000 and y.shape == x.shape
    assert np.abs(y - x).max() < tol
    z, sr2 = nat.native_read_wav(path)
    assert sr2 == 48000
    assert np.abs(z - x).max() < tol


def test_extensible_pcm32_not_misread_as_float(tmp_path, make_noise):
    """A 32-bit *PCM* extensible file must not be decoded as IEEE float
    (the old bit-depth heuristic did exactly that)."""
    import struct
    from neojax.io.wav import read_wav

    x = (make_noise(1, 300) * 0.7).astype(np.float32)
    pcm = np.clip(
        (x.reshape(-1).astype(np.float64) * ((1 << 31) - 1)).round(),
        -(1 << 31), (1 << 31) - 1,
    ).astype("<i4")
    guid = struct.pack("<H", 1) + b"\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    fmt = struct.pack("<HHIIHHHHI", 0xFFFE, 1, 48000, 48000 * 4, 4, 32, 22, 32, 1) + guid
    raw = pcm.tobytes()
    body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(raw)) + raw
    path = str(tmp_path / "pcm32ext.wav")
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)

    y, _ = read_wav(path)
    assert np.abs(y - x).max() < 1e-6
    z, _ = nat.native_read_wav(path)
    assert np.abs(z - x).max() < 1e-6
