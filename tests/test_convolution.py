"""Convolution engine tests — mirrors the reference's oracle strategy:

- identity-impulse partitioned convolution returns the input unchanged
  (``generate_identity_impulse``, ``uniform_partitioned_convolver_test.cpp:74``)
- noise signal x noise IR: every convolver matches the direct convolution
- OLS/OLA pass-through reproduces the signal (``overlap_test.cpp:20-55``)
- quantized FDL within int8 5e-3 / int16 1e-4 (``compressed_fdl_test.cpp``)
"""

import numpy as np
import pytest

import neojax
from neojax import conv
from neojax.ops import allclose


def identity_impulse(num_partitions: int, block_size: int) -> np.ndarray:
    """Partitioned spectra of a unit impulse: first partition all-ones
    (reference ``testing/testing.hpp:75-83``)."""
    k = block_size + 1
    spectra = np.zeros((1, num_partitions, k), dtype=np.complex64)
    spectra[0, 0, :] = 1.0
    return spectra


def np_full_convolve(x, h):
    return np.convolve(np.asarray(x), np.asarray(h), mode="full")


# ---------------------------------------------------------------- basic ops


def test_direct_convolve_matches_numpy(make_noise):
    x = make_noise(100)
    h = make_noise(31)
    assert allclose(conv.direct_convolve(x, h), np_full_convolve(x, h), 1e-4)
    # n < l branch
    assert allclose(conv.direct_convolve(h, x), np_full_convolve(h, x), 1e-4)


def test_fft_convolve_matches_numpy(make_noise):
    x = make_noise(1000)
    h = make_noise(257)
    out = conv.fft_convolve(x, h)
    assert out.shape == (1256,)
    assert allclose(out, np_full_convolve(x, h), 1e-3)


def test_convolve_api(make_noise):
    x = make_noise(64)
    h = make_noise(16)
    ref = np_full_convolve(x, h)
    assert allclose(neojax.convolve(x, h, method="fft"), ref, 1e-4)
    assert allclose(neojax.convolve(x, h, method="direct"), ref, 1e-4)
    with pytest.raises(ValueError):
        neojax.convolve(x, h, mode="valid")
    with pytest.raises(ValueError):
        neojax.convolve(np.zeros((2, 4)), h)


def test_uniform_partition_shape_and_content(make_noise):
    ir = make_noise(2, 1000)
    parts = np.asarray(conv.uniform_partition(ir, 128))
    assert parts.shape == (2, 8, 129)
    # first partition = rfft of first 128 samples zero-padded to 256
    ref = np.fft.rfft(np.pad(ir[0, :128], (0, 128)))
    assert np.max(np.abs(parts[0, 0] - ref)) < 1e-3


# ------------------------------------------------------------- OLS/OLA


@pytest.mark.parametrize("processor_cls", [conv.OverlapSave, conv.OverlapAdd])
@pytest.mark.parametrize("block_size", [128, 256, 512])
@pytest.mark.parametrize("filter_size", [8, 17, 127, 1024])
def test_overlap_passthrough(make_noise, processor_cls, block_size, filter_size):
    """Pass-through callback reproduces the signal (delayed appropriately)."""
    import jax.numpy as jnp

    proc = processor_cls(block_size, filter_size)
    sig = make_noise(1, 4 * block_size)
    blocks, length = conv.stream_blocks(jnp.asarray(sig), block_size)

    state = proc.init_state(1)
    outs = []
    for i in range(blocks.shape[0]):
        state, out = proc.step(state, blocks[i], lambda s: s)
        outs.append(np.asarray(out))
    got = np.concatenate(outs, axis=-1)
    assert np.max(np.abs(got - sig)) < 1e-5


@pytest.mark.parametrize("processor_cls", [conv.OverlapSave, conv.OverlapAdd])
def test_overlap_convolves(make_noise, processor_cls):
    """OLS/OLA with a filter-spectrum callback == direct convolution."""
    import jax.numpy as jnp

    b, l = 128, 64
    proc = processor_cls(b, l)
    n = proc.transform_size
    h = make_noise(l)
    h_spec = jnp.asarray(np.fft.rfft(h, n=n).astype(np.complex64))

    sig = make_noise(1, 8 * b)
    blocks, length = conv.stream_blocks(jnp.asarray(sig), b)
    state = proc.init_state(1)
    outs = []
    for i in range(blocks.shape[0]):
        state, out = proc.step(state, blocks[i], lambda s: s * h_spec)
        outs.append(np.asarray(out))
    got = np.concatenate(outs, axis=-1)[0]
    ref = np_full_convolve(sig[0], h)[: got.shape[0]]
    assert np.max(np.abs(got - ref)) < 1e-4


# ------------------------------------------------- partitioned convolvers


ALL_VARIANTS = [
    ("upols", "dense"),
    ("upola", "dense"),
    ("upols", "split"),
    ("upola", "split"),
    ("upols", "bf16"),
    ("upols", "int16"),
    ("upols", "int8"),
]

# dense/split/int16 match the reference's documented bounds (allclose.hpp,
# compressed_fdl_test.cpp). int8/bf16 bounds here are *end-to-end convolution*
# tolerances on unit noise — the reference only documents int8 5e-3 for value
# storage round-trip (covered by test_quantize_roundtrip); streaming a real
# spectrum through an 8-bit FDL accumulates ~2e-2 worst-case at B=128.
TOLS = {"dense": 1e-5, "split": 1e-5, "bf16": 5e-3, "int16": 1e-4, "int8": 2.5e-2}


@pytest.mark.parametrize("scheme,storage", ALL_VARIANTS)
@pytest.mark.parametrize("block_size", [128, 512])
def test_identity_impulse_passthrough(make_noise, scheme, storage, block_size):
    c = conv.make_convolver(scheme, storage)
    c.filter(identity_impulse(4, block_size))
    sig = make_noise(1, block_size * 6)
    out = np.asarray(c.process(sig))
    assert np.max(np.abs(out - sig)) < TOLS[storage]


@pytest.mark.parametrize("scheme,storage", ALL_VARIANTS)
def test_noise_convolution_vs_direct(make_noise, scheme, storage):
    b = 128
    ir = make_noise(5 * b + 37) * 0.1
    sig = make_noise(1, 8 * b)

    parts = conv.uniform_partition(ir, b)
    c = conv.make_convolver(scheme, storage)
    c.filter(parts)
    out = np.asarray(c.process(sig))[0]

    ref = np_full_convolve(sig[0], ir)[: out.shape[0]]
    assert np.max(np.abs(out - ref)) < max(TOLS[storage], 2e-4 if storage == "bf16" else 0)


def test_streaming_equals_onecall(make_noise):
    """Block-by-block __call__ == whole-signal process (same state machine)."""
    b = 128
    ir = make_noise(3 * b)
    sig = make_noise(1, 6 * b)
    parts = conv.uniform_partition(ir, b)

    c1 = conv.upols_convolver()
    c1.filter(parts)
    out1 = np.asarray(c1.process(sig))

    c2 = conv.upols_convolver()
    c2.filter(parts)
    outs = [np.asarray(c2(sig[:, i * b : (i + 1) * b])) for i in range(6)]
    out2 = np.concatenate(outs, axis=-1)
    assert np.max(np.abs(out1 - out2)) < 1e-6


def test_multichannel_shared_filter(make_noise):
    b = 128
    ir = make_noise(4 * b)
    sig = make_noise(4, 6 * b)
    parts = conv.uniform_partition(ir, b)  # [1, P, K] shared

    cfg = conv.PartitionedConfig(b, parts.shape[1], channels=4)
    params = conv.filter_params(cfg, parts)
    state = conv.init_state(cfg)
    _, out = conv.process(cfg, params, state, sig)
    out = np.asarray(out)

    for ch in range(4):
        ref = np_full_convolve(sig[ch], ir)[: out.shape[1]]
        assert np.max(np.abs(out[ch] - ref)) < 1e-4


def test_multichannel_per_channel_filters(make_noise):
    b = 64
    irs = make_noise(3, 2 * b) * 0.5
    sig = make_noise(3, 4 * b)
    parts = conv.uniform_partition(irs, b)  # [3, P, K]

    cfg = conv.PartitionedConfig(b, parts.shape[1], channels=3)
    params = conv.filter_params(cfg, parts)
    state = conv.init_state(cfg)
    _, out = conv.process(cfg, params, state, sig)
    out = np.asarray(out)

    for ch in range(3):
        ref = np_full_convolve(sig[ch], irs[ch])[: out.shape[1]]
        assert np.max(np.abs(out[ch] - ref)) < 1e-4


def test_state_checkpoint_resume(make_noise):
    """Stop mid-stream, serialize state, resume — bitwise identical output."""
    b = 128
    ir = make_noise(4 * b)
    sig = make_noise(1, 8 * b)
    parts = conv.uniform_partition(ir, b)

    cfg = conv.PartitionedConfig(b, parts.shape[1], channels=1)
    params = conv.filter_params(cfg, parts)

    state = conv.init_state(cfg)
    _, full = conv.process(cfg, params, state, sig)

    state = conv.init_state(cfg)
    state, first = conv.process(cfg, params, state, sig[:, : 4 * b])
    # round-trip the carry through host memory (checkpoint analogue)
    state = {k: np.asarray(v) for k, v in state.items()}
    import jax.numpy as jnp

    state = {k: jnp.asarray(v) for k, v in state.items()}
    _, second = conv.process(cfg, params, state, sig[:, 4 * b :])

    resumed = np.concatenate([np.asarray(first), np.asarray(second)], axis=-1)
    assert np.array_equal(resumed, np.asarray(full))


# --------------------------------------------------------------- sparse


def test_sparse_mask_predicate(make_noise):
    b = 64
    ir = make_noise(3 * b)
    parts = conv.uniform_partition(ir, b)

    # keep-everything predicate == dense result
    c_dense = conv.upols_convolver()
    c_dense.filter(parts)
    c_sparse = conv.sparse_upols_convolver()
    c_sparse.filter(parts, sparsity=lambda row, col, value: np.ones(value.shape, bool))

    sig = make_noise(1, 4 * b)
    assert np.array_equal(np.asarray(c_dense.process(sig)), np.asarray(c_sparse.process(sig)))


def test_sparse_alias_requires_sparsity(make_noise):
    """The sparse aliases compose the reference's sparse_filter contract
    (``sparse_convolver.hpp:16-21``): a predicate is mandatory, masked
    bins are genuinely excluded from the filter spectra, and the output
    matches a dense convolver over the explicitly thinned filter."""
    b = 64
    ir = make_noise(3 * b)
    parts = conv.uniform_partition(ir, b)

    with pytest.raises(ValueError, match="sparsity"):
        conv.sparse_upols_convolver().filter(parts)

    # construction-time predicate slot: keep even bins only
    pred = lambda row, col, value: (col % 2) == 0
    c_sparse = conv.sparse_upola_convolver(sparsity=pred)
    c_sparse.filter(parts)

    # masked bins are actually skipped: the installed filter spectra are
    # zero there...
    filt = np.asarray(c_sparse.params["filt"])  # [P(padded), C', K]
    assert np.all(filt[:, :, 1::2] == 0)
    assert np.any(filt[:, :, ::2] != 0)

    # ...and the output equals a dense convolver over the thinned filter
    thinned = np.asarray(parts).copy()
    thinned[..., 1::2] = 0
    c_ref = conv.upola_convolver()
    c_ref.filter(thinned)
    sig = make_noise(1, 4 * b)
    np.testing.assert_allclose(
        np.asarray(c_sparse.process(sig)), np.asarray(c_ref.process(sig)),
        atol=1e-6,
    )


def test_perceptual_mask_density_decreases_with_threshold(make_noise):
    b = 256
    ir = (make_noise(8 * b) * np.exp(-np.arange(8 * b) / b)).astype(np.float32)
    parts = np.asarray(conv.uniform_partition(ir, b))[0]
    m_lo = np.asarray(conv.perceptual_mask(parts, 48000.0, threshold_db=-90.0))
    m_hi = np.asarray(conv.perceptual_mask(parts, 48000.0, threshold_db=-20.0))
    assert m_lo.mean() > m_hi.mean()
    assert 0.0 < m_hi.mean() < 1.0


@pytest.mark.parametrize("method", ["ols", "ola", "upols", "upola"])
def test_convolve_streaming_methods(make_noise, method):
    """Every method of the reference's enum produces the same full
    convolution (cross-engine oracle, like the reference's plan tests)."""
    x = make_noise(700)
    h = make_noise(160) * 0.3
    ref = np_full_convolve(x, h)
    out = np.asarray(neojax.convolve(x, h, method=method))
    assert out.shape == ref.shape
    assert np.max(np.abs(out - ref)) < 1e-4


def test_ring_schedule_matches_fdl_index_semantics(make_noise):
    """Our rotated-filter ring reproduces the reference fdl_index schedule
    exactly: fdl slot `segment` multiplies filter partition
    ``(write_pos + P - segment) % P`` (``fdl_index.hpp:24-36``, asserted
    index-by-index like ``fdl_index_test.cpp``)."""
    import jax.numpy as jnp
    from neojax.conv import fdl as fdl_lib

    p, k = 7, 5
    filt = np.arange(p * k, dtype=np.float32).reshape(p, 1, k) + 1.0
    tiled = np.asarray(fdl_lib.tile_reverse_filter(jnp.asarray(filt)))

    for write_pos in range(p):
        rotated = np.asarray(
            fdl_lib.rotated_filter(
                jnp.asarray(tiled), jnp.asarray(write_pos, jnp.int32), p
            )
        )
        for segment in range(p):
            expected = filt[(write_pos + p - segment) % p]
            assert np.array_equal(rotated[segment], expected), (write_pos, segment)


def test_upola_equals_upols_output(make_noise):
    """The two schemes are alternative schedulings of the same convolution
    (cross-implementation oracle)."""
    b = 128
    ir = make_noise(3 * b) * 0.3
    sig = make_noise(2, 6 * b)
    parts = conv.uniform_partition(ir, b)

    outs = {}
    for scheme in ("upols", "upola"):
        c = conv.make_convolver(scheme)
        c.filter(parts)
        outs[scheme] = np.asarray(c.process(sig))
    assert np.max(np.abs(outs["upols"] - outs["upola"])) < 2e-5


def test_arbitrary_chunk_streaming_matches_process(make_noise, rng):
    """Feed random-sized chunks (the upola_v2 / ConstantOverlapAdd contract,
    overlap_add_convolver.hpp:72-135): concat(returns, flush) must equal
    zeros(latency) ++ offline process()."""
    b = 64
    sig = make_noise(2, 1200)
    ir = make_noise(2, 300)
    parts = conv.uniform_partition(ir, b)

    ref = conv.make_convolver("upols")
    ref.filter(parts)
    want = np.asarray(ref.process(sig))

    c = conv.make_convolver("upols")
    c.filter(parts)
    outs, fed = [], 0
    while fed < sig.shape[-1]:
        n = min(int(rng.integers(1, 200)), sig.shape[-1] - fed)
        out = c(sig[:, fed : fed + n])
        assert out.shape == (2, n)
        outs.append(np.asarray(out))
        fed += n
    outs.append(c.flush())
    got = np.concatenate(outs, axis=-1)
    lat = c.latency
    assert got.shape[-1] == sig.shape[-1] + lat
    assert np.abs(got[:, :lat]).max() == 0.0
    np.testing.assert_allclose(got[:, lat:], want, atol=1e-5)


def test_exact_block_chunks_have_zero_latency(make_noise):
    b = 64
    sig = make_noise(1, 4 * b)
    parts = conv.uniform_partition(make_noise(1, 200), b)
    ref = conv.make_convolver("upola")
    ref.filter(parts)
    want = np.asarray(ref.process(sig))
    c = conv.make_convolver("upola")
    c.filter(parts)
    got = np.concatenate(
        [np.asarray(c(sig[:, i * b : (i + 1) * b])) for i in range(4)], -1
    )
    assert c.latency == 0
    np.testing.assert_allclose(got, want, atol=0)


def test_block_multiple_chunks_via_fifo(make_noise):
    """A 2B chunk engages the FIFO: fixed B-1 latency, then exact content."""
    b = 64
    sig = make_noise(1, 4 * b)
    parts = conv.uniform_partition(make_noise(1, 200), b)
    ref = conv.make_convolver("upols")
    ref.filter(parts)
    want = np.asarray(ref.process(sig))
    c = conv.make_convolver("upols")
    c.filter(parts)
    got = np.concatenate(
        [np.asarray(c(sig[:, i * 2 * b : (i + 1) * 2 * b])) for i in range(2)]
        + [c.flush()],
        -1,
    )
    assert c.latency == b - 1
    assert np.abs(got[:, : b - 1]).max() == 0.0
    np.testing.assert_allclose(got[:, b - 1 :], want, atol=1e-6)


def test_make_engine_uniform_surface(make_noise):
    """All four engines behind one handle produce the same convolution
    (within their storage/scheduling tolerance) and carry state across
    process() calls."""
    b, s, c, p = 32, 4, 2, 12
    ir = make_noise(p * b) * 0.2
    parts = conv.uniform_partition(ir, b)
    sig = make_noise(c, 4 * s * b)
    sig2 = make_noise(c, 2 * s * b)

    ref_eng = conv.make_engine("perblock", parts, storage="split", channels=c)
    ref = np.concatenate(
        [np.asarray(ref_eng.process(sig)), np.asarray(ref_eng.process(sig2))],
        axis=-1,
    )
    full = np.concatenate([np.asarray(sig), np.asarray(sig2)], axis=-1)

    for engine in ("nested", "hybrid", "chunked"):
        eng = conv.make_engine(
            engine, parts, storage="split", chunk_blocks=s, channels=c
        )
        out = np.concatenate(
            [np.asarray(eng.process(sig)), np.asarray(eng.process(sig2))],
            axis=-1,
        )
        np.testing.assert_allclose(out, ref, atol=2e-5, err_msg=engine)
        # reset gives a fresh stream
        eng.reset()
        out_r = np.asarray(eng.process(full))
        np.testing.assert_allclose(out_r, ref, atol=2e-5, err_msg=engine)

    with pytest.raises(ValueError, match="unknown engine"):
        conv.make_engine("warp", parts)
