"""Parity against golden vectors generated from the ACTUAL C++ reference.

The goldens in ``tests/goldens/ref_*.npy`` are outputs of the reference's
fallback plans/convolvers (no vendor backends), produced by
``tools/goldens/gen_goldens.cpp`` from the seeded fixtures in
``tools/goldens/gen_inputs.py`` (regenerate: ``tools/goldens/run.sh``).

Tolerance bounds are the reference's documented ones
(``src/neo/algorithm/allclose.hpp:36-40``: 1e-5 f32 / 1e-9 f64;
``src/neo/convolution/compressed_fdl_test.cpp:24-29``: 5e-3 int8 /
1e-4 int16). FFT coefficients are not unit-range (unnormalized transforms
of length-N noise reach ~sqrt(N)), so FFT bounds scale the f32 bound by the
coefficient magnitude: tol = 1e-5 * max|golden| covers both
implementations' rounding at equal relative accuracy.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

import neojax
from neojax import conv
from neojax import fft as nfft

GOLD = os.path.join(os.path.dirname(__file__), "goldens")


def _load(name):
    return np.load(os.path.join(GOLD, name))


def _scaled_tol(golden, base=1e-5):
    return base * max(1.0, float(np.abs(golden).max()))


# ------------------------------------------------------------------ FFT


@pytest.mark.parametrize("n", [16, 256, 1024])
@pytest.mark.parametrize("backend", ["xla", "matmul"])
def test_fft_matches_reference(n, backend):
    x = _load(f"in_cnoise_{n}.npy")
    golden = _load(f"ref_fft_{n}.npy")
    out = np.asarray(nfft.fft(x.astype(np.complex64), backend=backend))
    assert np.abs(out - golden).max() < _scaled_tol(golden)


def test_fft_f64_matches_reference():
    x = _load("in_cnoise_1024_f64.npy")
    golden = _load("ref_fft_1024_f64.npy")
    out = np.asarray(nfft.fft(x.astype(np.complex128)))
    # documented f64 bound, scaled by coefficient magnitude
    assert np.abs(out - golden).max() < _scaled_tol(golden, 1e-9)


@pytest.mark.parametrize("n", [16, 256, 1024])
def test_rfft_matches_reference(n):
    x = _load(f"in_rnoise_{n}.npy")
    golden = _load(f"ref_rfft_{n}.npy")
    out = np.asarray(nfft.rfft(x.astype(np.float32)))
    assert out.shape == golden.shape
    assert np.abs(out - golden).max() < _scaled_tol(golden)


@pytest.mark.parametrize("n", [17, 100])
def test_bluestein_dft_matches_reference(n):
    x = _load("in_cnoise_1024.npy")[:n]
    golden = _load(f"ref_dft_{n}.npy")
    out = np.asarray(nfft.dft(x.astype(np.complex64), forward=True))
    assert np.abs(out - golden).max() < _scaled_tol(golden)


def test_dct2_matches_reference():
    x = _load("in_rnoise_256.npy")[:64]
    golden = _load("ref_dct2_64.npy")
    out = np.asarray(nfft.dct2(x.astype(np.float32)))
    assert np.abs(out - golden).max() < _scaled_tol(golden)


def test_stft_matches_reference():
    sig = _load("in_sig.npy")
    golden = _load("ref_stft_256_128.npy")
    out = np.asarray(
        nfft.stft(
            sig,
            nfft.StftOptions(
                frame_size=256, transform_size=256, overlap_size=128, window="hann"
            ),
        )
    )
    assert out.shape == golden.shape
    assert np.abs(out - golden).max() < _scaled_tol(golden)


def test_uniform_partition_matches_reference():
    ir = _load("in_ir.npy")
    golden = _load("ref_partition_b128.npy")
    out = np.asarray(conv.uniform_partition(ir, 128))
    assert out.shape == golden.shape
    assert np.abs(out - golden).max() < _scaled_tol(golden)


# ---------------------------------------------------------- convolution


def test_fft_convolve_matches_reference():
    a = _load("in_a64.npy")
    b = _load("in_b33.npy")
    golden = _load("ref_fftconv.npy")
    out = np.asarray(neojax.convolve(a, b, mode="full", method="fft"))
    assert np.abs(out - golden).max() < 1e-5 * max(1.0, float(np.abs(golden).max()))


def test_direct_convolve_matches_reference():
    a = _load("in_a64.npy")
    b = _load("in_b33.npy")
    golden = _load("ref_directconv.npy")
    out = np.asarray(neojax.convolve(a, b, mode="full", method="direct"))
    assert np.abs(out - golden).max() < 1e-5 * max(1.0, float(np.abs(golden).max()))


def _stream_ours(scheme, storage, sig):
    """Stream [C, T] through our convolver with per-channel filters, block 128."""
    ir = _load("in_ir.npy")
    parts = conv.uniform_partition(ir, 128)  # [C, P, 129]
    c = conv.make_convolver(scheme, storage)
    c.filter(parts)
    return np.asarray(c.process(sig.astype(np.float32)))


@pytest.mark.parametrize("scheme", ["upols", "upola"])
def test_streaming_convolver_matches_reference(scheme):
    sig = _load("in_sig.npy")
    golden = _load(f"ref_{scheme}_b128.npy")
    out = _stream_ours(scheme, "dense", sig)
    # documented f32 bound on unit-range streaming output
    assert np.abs(out - golden).max() < 1e-5


@pytest.mark.parametrize("scheme", ["upols", "upola"])
def test_streaming_split_storage_matches_reference(scheme):
    sig = _load("in_sig.npy")
    golden = _load(f"ref_{scheme}_b128.npy")
    out = _stream_ours(scheme, "split", sig)
    assert np.abs(out - golden).max() < 1e-5


@pytest.mark.parametrize("scheme", ["upols", "upola"])
def test_split_convolver_matches_split_reference(scheme):
    """split storage vs the reference's ACTUAL split-complex convolvers
    (``dense_convolver.hpp:32-39``: dense_split_fdl + dense_split_filter),
    not just the interleaved dense golden."""
    sig = _load("in_sig.npy")
    golden = _load(f"ref_split_{scheme}_b128.npy")
    out = _stream_ours(scheme, "split", sig)
    assert np.abs(out - golden).max() < 1e-5


def test_sparse_convolver_matches_reference():
    """sparse_upols_convolver with the same index predicate as the C++
    run (``sparse_convolver.hpp:16``, CSR built via ``csr_matrix.hpp:67-98``
    with keep iff col % 3 != 0)."""
    sig = _load("in_sig.npy")
    ir = _load("in_ir.npy")
    golden = _load("ref_sparse_upols_b128.npy")
    parts = conv.uniform_partition(ir, 128)
    c = conv.sparse_upols_convolver(
        sparsity=lambda row, col, value: (col % 3) != 0
    )
    c._storage = "dense"
    c.filter(parts)
    out = np.asarray(c.process(sig.astype(np.float32)))
    assert np.abs(out - golden).max() < 1e-5


@pytest.mark.parametrize("kind", ["ols", "ola"])
def test_overlap_processor_matches_reference(kind):
    """Raw OLS/OLA block processors (``overlap_save.hpp:85-112``,
    ``overlap_add.hpp:78-108``) with a bin-multiply callback: block 64,
    filter 33, transform 128."""
    import jax.numpy as jnp

    from neojax.conv.overlap import OverlapAdd, OverlapSave

    x = _load("in_rnoise_1024.npy")
    flt = _load("in_b33.npy")
    golden = _load(f"ref_{kind}_b64_f33.npy")

    proc = (OverlapSave if kind == "ols" else OverlapAdd)(
        block_size=64, filter_size=33
    )
    n = proc.transform_size
    fspec = np.fft.rfft(np.pad(flt, (0, n - 33)))
    spectrum_fn = lambda s: s * jnp.asarray(fspec.astype(np.complex64))[None]

    state = proc.init_state(channels=1)
    out = np.zeros_like(x)
    for off in range(0, 1024, 64):
        block = jnp.asarray(x[None, off : off + 64])
        state, y = proc.step(state, block, spectrum_fn)
        out[off : off + 64] = np.asarray(y)[0]
    assert np.abs(out - golden).max() < 1e-5


@pytest.mark.parametrize(
    "storage,tol_ref,tol_exact",
    [("int8", 5e-3, 5e-3), ("int16", 2e-4, 1e-4)],
)
def test_quantized_fdl_matches_reference(storage, tol_ref, tol_exact):
    """Our dynamically-scaled intN FDL vs the reference's fixed-scale
    compressed_fdl, on the reference's own terms (signal scaled into the
    fixed-scale-safe range), and both vs the exact convolution."""
    sig = _load("in_sig.npy") / 64.0
    ir = _load("in_ir.npy")
    golden = _load(f"ref_upols_{storage}_b128.npy")
    out = _stream_ours("upols", storage, sig)

    exact = np.stack(
        [np.convolve(sig[i], ir[i])[: sig.shape[1]] for i in range(sig.shape[0])]
    )
    assert np.abs(out - golden).max() < tol_ref
    assert np.abs(out - exact).max() < tol_exact  # documented bound
    assert np.abs(golden - exact).max() < tol_ref  # golden sanity
