"""Time-sharded (sequence-parallel) streaming vs single-device process.

The north-star axis: block stream sharded over a mesh "time" axis with the
OLS boundary state reconstructed from a one-hop ppermute halo
(``neojax/dist/timesharded.py``). Output must match the sequential scan.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neojax.conv import convolver as cv
from neojax.conv import partition as part_lib
from neojax.dist import make_mesh
from neojax.dist.timesharded import timesharded_process


def _mesh_time(n):
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()[:n]), axis_names=("time",))


def _setup(rng, scheme, storage, channels=3, block=32, p=4, blocks_total=64):
    ir = rng.uniform(-1, 1, (channels, p * block)).astype(np.float32) * 0.5
    parts = part_lib.uniform_partition(ir, block)  # [C, P, K]
    config = cv.PartitionedConfig(
        block, p, channels, scheme=scheme, storage=storage
    )
    params = cv.filter_params(config, parts)
    sig = rng.uniform(-1, 1, (channels, blocks_total * block)).astype(np.float32)
    return config, params, sig


@pytest.mark.parametrize("scheme", ["upols", "upola"])
@pytest.mark.parametrize("storage", ["dense", "split"])
def test_timesharded_matches_sequential(rng, scheme, storage):
    config, params, sig = _setup(rng, scheme, storage)
    mesh = _mesh_time(8)

    state = cv.init_state(config)
    _, want = cv.process(config, params, state, sig)
    got = timesharded_process(config, params, sig, mesh)

    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


@pytest.mark.parametrize("storage,atol", [("int8", 5e-3), ("int16", 1e-4)])
def test_timesharded_quantized_matches_sequential(rng, storage, atol):
    """Warmup replays the same dynamic-quantization path. The two programs
    compile separately, so ~1-ulp float-associativity differences in the
    spectra can flip intN rounding by one quantum — the mismatch is bounded
    by the storage's own documented tolerance (5e-3 / 1e-4), far below it
    in practice."""
    config, params, sig = _setup(rng, "upols", storage)
    mesh = _mesh_time(8)

    state = cv.init_state(config)
    _, want = cv.process(config, params, state, sig)
    got = timesharded_process(config, params, sig, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=atol)


def test_timesharded_mono_and_validation(rng):
    config, params, sig = _setup(rng, "upols", "split", channels=1)
    mesh = _mesh_time(8)
    state = cv.init_state(config)
    _, want = cv.process(config, params, state, sig[0])
    got = timesharded_process(config, params, sig[0], mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)

    # too few blocks per device for the halo -> explicit error
    short = sig[:, : 8 * 2 * config.block_size]  # 2 blocks/device < P=4
    with pytest.raises(ValueError, match="halo"):
        timesharded_process(config, params, short, mesh)
    with pytest.raises(ValueError, match="divisible"):
        timesharded_process(config, params, sig[:, :100], mesh)


def test_timesharded_shift_layout(rng):
    channels, block, p = 3, 32, 4
    ir = rng.uniform(-1, 1, (channels, p * block)).astype(np.float32) * 0.5
    parts = part_lib.uniform_partition(ir, block)
    config = cv.PartitionedConfig(
        block, p, channels, scheme="upols", storage="split", layout="shift"
    )
    params = cv.filter_params(config, parts)
    sig = rng.uniform(-1, 1, (channels, 64 * block)).astype(np.float32)

    mesh = _mesh_time(4)
    state = cv.init_state(config)
    _, want = cv.process(config, params, state, sig)
    got = timesharded_process(config, params, sig, mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_insert_only_step_equals_full_step_state(rng):
    """insert_only_step must advance state exactly like a full step."""
    config, params, sig = _setup(rng, "upols", "int8")
    state_a = cv.init_state(config)
    state_b = cv.init_state(config)
    blocks = sig.reshape(config.channels, -1, config.block_size)
    for i in range(4):
        blk = jnp.asarray(blocks[:, i])
        state_a, _ = cv.step(config, params, state_a, blk)
        state_b = cv.insert_only_step(config, state_b, blk)
    for a, b in zip(jax.tree.leaves(state_a["fdl"]), jax.tree.leaves(state_b["fdl"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(state_a["pos"]), np.asarray(state_b["pos"]))
    np.testing.assert_array_equal(
        np.asarray(state_a["tail"]), np.asarray(state_b["tail"])
    )
