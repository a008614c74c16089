"""Regression guard for bench.py's SNR oracle.

The headline bench compares every engine's first-16-block output head
against an f64 UPOLS recurrence. Round 2 shipped a bug where the oracle's
signal rows (channels >= 1) were generated from a different stream length
than the engines', making the comparison meaningless (-1.8 dB for every
engine). This test pins both properties on a scaled-down config:

- ``bench._signal`` heads are stream-length invariant per channel, and
- ``bench._oracle_head`` matches ``conv.convolver.process`` streamed over a
  LONGER signal than the oracle saw.
"""

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import bench  # noqa: E402

from neojax.conv import convolver as cv  # noqa: E402


def _patched(monkeypatch, block=64, channels=6, p=12):
    monkeypatch.setattr(bench, "BLOCK", block)
    monkeypatch.setattr(bench, "CHANNELS", channels)
    monkeypatch.setattr(bench, "P_REAL", p)
    # steady-state window: starts past the filter depth (p blocks)
    monkeypatch.setattr(bench, "_SNR_START", 16)
    monkeypatch.setattr(bench, "_SNR_BLOCKS", 8)
    monkeypatch.setattr(bench, "_SNR_CH", 4)


def test_signal_head_is_length_invariant(monkeypatch):
    _patched(monkeypatch)
    short = np.asarray(bench._signal(8))
    long = np.asarray(bench._signal(48))
    np.testing.assert_array_equal(short, long[:, : short.shape[1]])


def test_oracle_matches_streamed_process(monkeypatch):
    _patched(monkeypatch)
    oracle = bench._oracle_head()

    cfg = cv.PartitionedConfig(
        bench.BLOCK, bench.P_REAL, bench.CHANNELS, storage="split"
    )
    params = cv.filter_params(
        cfg, bench._make_parts(bench.P_REAL, cfg.num_bins)
    )
    state = cv.init_state(cfg)
    proc = jax.jit(partial(cv.process, cfg))
    # Stream past the steady-state window: the windowed output must match
    # the exact-f64 FFT-convolution oracle (per-channel fold_in keys make
    # the signal prefix length-invariant).
    nb = bench._SNR_START + bench._SNR_BLOCKS + 8
    _, out = proc(params, state, jnp.asarray(bench._signal(nb)))
    head = np.asarray(
        out[
            : bench._SNR_CH,
            bench._SNR_START * bench.BLOCK :
            (bench._SNR_START + bench._SNR_BLOCKS) * bench.BLOCK,
        ],
        np.float64,
    )
    assert bench._snr_db(head, oracle) > 100.0
