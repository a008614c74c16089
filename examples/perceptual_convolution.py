"""Perceptual convolution demo — the reference plugin's workflow as a script.

Mirrors ``extra/plugin/src/PerceptualConvolution.*`` + the BenchmarkTab
quality sweep: convolve a signal with an IR densely, then at several
perceptual-sparsification thresholds, and report bins-kept %, spectrogram
RMSE (dB) and throughput for each — the quality/efficiency trade-off curve
that is the plugin's whole point.

Usage: python examples/perceptual_convolution.py [signal.wav impulse.wav]
(with no args, uses a synthetic signal + exponentially-decaying noise IR).
"""

import sys
import time

import numpy as np

from neojax import bench, conv
from neojax.io.wav import read_wav


def load_or_synthesize(argv):
    if len(argv) >= 3:
        sig, sr = read_wav(argv[1])
        ir, _ = read_wav(argv[2])
        return sig, ir, sr
    rng = np.random.default_rng(42)
    sr = 48000
    t = np.arange(2 * sr) / sr
    sig = np.stack(
        [
            0.5 * np.sin(2 * np.pi * 220 * t) + 0.2 * rng.standard_normal(len(t)),
            0.5 * np.sin(2 * np.pi * 330 * t) + 0.2 * rng.standard_normal(len(t)),
        ]
    ).astype(np.float32)
    ir = (
        rng.standard_normal((1, sr)) * np.exp(-np.arange(sr) / 6000)
    ).astype(np.float32)
    return sig, ir, sr


def main(argv) -> int:
    sig, ir, sr = load_or_synthesize(argv)
    block = 4096  # the plugin's dense_convolve block size

    print(f"signal {sig.shape}, impulse {ir.shape}, {sr} Hz, block {block}")
    t0 = time.perf_counter()
    points = bench.sparse_quality_sweep(
        sig,
        ir,
        sample_rate=float(sr),
        block_size=block,
        stft_size=1024,
        thresholds_db=[-10, -20, -30, -40, -50, -60, -70, -80, -90],
    )
    dt = time.perf_counter() - t0

    print(f"\n{'thresh dB':>10} {'bins kept':>10} {'rmse':>12} {'rmse dB':>9}")
    for p in points:
        print(
            f"{p.threshold_db:>10.0f} {p.density * 100:>9.1f}% "
            f"{p.rmse:>12.3e} {p.rmse_db:>9.1f}"
        )
    print(f"\nsweep of {len(points)} thresholds in {dt:.1f} s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv))
