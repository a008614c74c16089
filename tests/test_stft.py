"""STFT framing/windowing parity (reference fft/stft_test.cpp model)."""

import numpy as np
import pytest

from neojax import fft as nfft
from neojax.fft.stft import StftOptions, num_stft_frames


def test_num_frames_matches_reference_formula():
    # ceil((signal - frame + overlap) / (frame - overlap)) + 1
    assert num_stft_frames(1024, 256, 128) == 8
    assert num_stft_frames(1000, 256, 0) == 4
    assert num_stft_frames(1024, 256, 0) == 4
    assert num_stft_frames(256, 256, 0) == 1


@pytest.mark.parametrize("overlap", [0, 128])
def test_stft_shape(make_noise, overlap):
    x = make_noise(2, 2048)
    opts = StftOptions(frame_size=256, transform_size=256, overlap_size=overlap, window="hann")
    out = np.asarray(nfft.stft(x, opts))
    frames = num_stft_frames(2048, 256, overlap)
    assert out.shape == (2, frames, 129)


def test_stft_rect_no_overlap_matches_framed_rfft(make_noise):
    x = make_noise(1, 1024)
    opts = StftOptions(frame_size=256, transform_size=256, overlap_size=0, window="rectangular")
    out = np.asarray(nfft.stft(x, opts))
    frames = np.asarray(x).reshape(1, 4, 256)
    ref = np.fft.rfft(frames, axis=-1)
    assert np.max(np.abs(out - ref)) < 1e-3


def test_stft_zero_pads_transform(make_noise):
    # transform > frame: frame is zero-padded before the rfft
    x = make_noise(1, 512)
    opts = StftOptions(frame_size=256, transform_size=512, overlap_size=0, window="rectangular")
    out = np.asarray(nfft.stft(x, opts))
    assert out.shape == (1, 2, 257)
    frames = np.asarray(x).reshape(1, 2, 256)
    padded = np.pad(frames, ((0, 0), (0, 0), (0, 256)))
    ref = np.fft.rfft(padded, axis=-1)
    assert np.max(np.abs(out - ref)) < 1e-3


def test_stft_hann_window_applied(make_noise):
    x = make_noise(1, 256)
    opts = StftOptions(frame_size=256, transform_size=256, overlap_size=0, window="hann")
    out = np.asarray(nfft.stft(x, opts))
    i = np.arange(256)
    win = 0.5 * (1 - np.cos(2 * np.pi * i / 255))
    ref = np.fft.rfft(np.asarray(x)[0] * win)
    assert np.max(np.abs(out[0, 0] - ref)) < 1e-3
