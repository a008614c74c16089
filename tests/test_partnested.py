"""Partition-sharded nested engine vs single-device ``process_nested``
on the simulated 8-device CPU mesh (SURVEY.md section 2.7: the
partition-reduce axis of ``uniform_partitioned_convolver.hpp:56-59``
applied to the throughput engine's meta-FDL)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neojax import dist
from neojax.conv import convolver as cv
from neojax.conv import nested
from neojax.dist.partnested import (
    PartShardedNested,
    partnested_filter_params,
    partnested_init_state,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="need 8 devices"
)

B = 64
S = 8
C = 4
P = 40  # -> P2 = 5 meta-partitions, padded to 8 for the 4-way part axis


def _parts(c_filt=1, p=P, seed=3):
    rng = np.random.default_rng(seed)
    ir = rng.standard_normal((c_filt, p * B)) * np.exp(
        -np.arange(p * B) / (p * B / 3)
    )
    seg = ir.reshape(c_filt, p, B)
    return np.fft.rfft(
        np.concatenate([seg, np.zeros_like(seg)], axis=-1), axis=-1
    ).astype(np.complex64)


def _signal(nb, seed=5):
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, (C, nb * B)).astype(np.float32)


@pytest.mark.parametrize("scheme", ["upols", "upola"])
@pytest.mark.parametrize(
    "storage,atol",
    [("split", 2e-5), ("bf16", 5e-2), ("int16", 1e-3), ("int8", 2e-2)],
)
def test_partsharded_matches_single_device(scheme, storage, atol):
    cfg = cv.PartitionedConfig(B, P, C, scheme=scheme, storage=storage)
    parts = _parts()
    sig = _signal(6 * S)

    # single-device nested reference
    params1 = nested.nested_filter_params(cfg, parts, S)
    state1 = nested.nested_init_state(cfg, params1)
    _, ref = jax.jit(partial(nested.process_nested, cfg))(
        params1, state1, jnp.asarray(sig)
    )

    mesh = dist.make_mesh(part=4, ch=2)
    eng = PartShardedNested(cfg, mesh, S)
    params = eng.shard_params(
        partnested_filter_params(cfg, parts, S, eng.d_part)
    )
    state = eng.shard_state(partnested_init_state(cfg, params, eng.d_part))
    new_state, out = eng.process(params, state, sig)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=atol)
    # streaming continuity: a second call continues the same stream
    sig2 = _signal(2 * S, seed=11)
    params1b = params1
    st1, ref2 = jax.jit(partial(nested.process_nested, cfg))(
        params1b,
        jax.jit(partial(nested.process_nested, cfg))(params1, state1, jnp.asarray(sig))[0],
        jnp.asarray(sig2),
    )
    _, out2 = eng.process(params, new_state, sig2)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=atol)


def test_partsharded_per_channel_filter():
    cfg = cv.PartitionedConfig(B, P, C, storage="split")
    parts = _parts(c_filt=C)
    sig = _signal(4 * S)

    params1 = nested.nested_filter_params(cfg, parts, S)
    state1 = nested.nested_init_state(cfg, params1)
    _, ref = jax.jit(partial(nested.process_nested, cfg))(
        params1, state1, jnp.asarray(sig)
    )

    mesh = dist.make_mesh(part=4, ch=2)
    eng = PartShardedNested(cfg, mesh, S)
    params = eng.shard_params(
        partnested_filter_params(cfg, parts, S, eng.d_part)
    )
    state = eng.shard_state(partnested_init_state(cfg, params, eng.d_part))
    _, out = eng.process(params, state, sig)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_partsharded_part_only_mesh():
    """All 8 devices on the part axis (pure partition sharding)."""
    cfg = cv.PartitionedConfig(B, P, C, storage="split")
    parts = _parts()
    sig = _signal(3 * S)

    params1 = nested.nested_filter_params(cfg, parts, S)
    state1 = nested.nested_init_state(cfg, params1)
    _, ref = jax.jit(partial(nested.process_nested, cfg))(
        params1, state1, jnp.asarray(sig)
    )

    mesh = dist.make_mesh(part=8, ch=1)
    eng = PartShardedNested(cfg, mesh, S)
    params = eng.shard_params(
        partnested_filter_params(cfg, parts, S, eng.d_part)
    )
    state = eng.shard_state(partnested_init_state(cfg, params, eng.d_part))
    _, out = eng.process(params, state, sig)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
