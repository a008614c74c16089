"""Tests for debug tooling, profiling records, and the multihost driver."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from neojax import conv
from neojax.bench.profile import RunRecord
from neojax.ops import debug


def test_assert_finite(make_noise):
    debug.assert_finite({"a": jnp.asarray(make_noise(16))})
    with pytest.raises(FloatingPointError):
        debug.assert_finite(jnp.asarray([1.0, np.nan]))


def test_checked_catches_nan():
    import jax

    def bad(x):
        return jnp.log(x)  # NaN for negative input

    safe = debug.checked(jax.jit(bad))
    safe(jnp.asarray([1.0, 2.0]))  # fine
    with pytest.raises(Exception):
        safe(jnp.asarray([-1.0]))


def test_x64_parity_within_reference_bound(make_noise):
    """The f32 partitioned convolver stays within the reference's 1e-5
    bound of its own f64 evaluation (SURVEY.md 'hard parts': accumulation
    order / reassociation check)."""
    from functools import partial

    b = 64
    ir = make_noise(4 * b) * 0.2
    sig = jnp.asarray(make_noise(1, 8 * b))
    parts = conv.uniform_partition(ir, b)
    cfg = conv.PartitionedConfig(b, parts.shape[1], channels=1, storage="dense")
    params = conv.filter_params(cfg, parts)
    state = conv.init_state(cfg)

    def run(sig):
        _, out = conv.process(cfg, params, state, sig)
        return out

    assert debug.x64_parity_error(run, sig) < 1e-5


def test_run_record_json():
    r = RunRecord(name="x", config={"b": 512}, samples_per_sec=1e8)
    s = r.to_json()
    assert '"name": "x"' in s and '"b": 512' in s


def test_stream_driver_checkpoint_resume(tmp_path, make_noise):
    from functools import partial

    from neojax.dist.multihost import StreamDriver

    b = 64
    ir = make_noise(2 * b) * 0.3
    parts = conv.uniform_partition(ir, b)
    cfg = conv.PartitionedConfig(b, parts.shape[1], channels=1)
    params = conv.filter_params(cfg, parts)

    sig = make_noise(1, 8 * b)
    chunks = [jnp.asarray(sig[:, i * 2 * b : (i + 1) * 2 * b]) for i in range(4)]

    ckpt = str(tmp_path / "stream")
    driver = StreamDriver(
        partial(conv.process, cfg), checkpoint_path=ckpt, checkpoint_every=2
    )

    outs = {}
    run1 = driver.run(params, conv.init_state(cfg), chunks)
    for i, out, state in run1:
        outs[i] = np.asarray(out)
        if i == 2:
            break  # simulate a crash after chunk 2 (checkpoint at 2)

    # "restarted" driver resumes from chunk 2's checkpoint
    driver2 = StreamDriver(
        partial(conv.process, cfg), checkpoint_path=ckpt, checkpoint_every=2
    )
    resumed = {}
    for i, out, state in driver2.run(params, conv.init_state(cfg), chunks):
        resumed[i] = np.asarray(out)
    assert sorted(resumed) == [2, 3]

    # and the resumed outputs match an uninterrupted run
    full_state = conv.init_state(cfg)
    _, full = conv.process(cfg, params, full_state, jnp.asarray(sig))
    full = np.asarray(full)
    got = np.concatenate([outs[0], outs[1], resumed[2], resumed[3]], axis=-1)
    assert np.array_equal(got, full)
