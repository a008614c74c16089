"""Device-gated pins for the r5 kernel paths (run with NEOJAX_TPU_TESTS=1).

Covers, at production-adjacent scale on the real chip:
  - the VMEM-resident ring mode of ``fused_stream`` (rings <= 24 MB live
    in VMEM across the stream) vs the XLA per-block reference;
  - the unquantized (f32/bf16) planes route of ``nested_mac_pallas`` vs
    the XLA elementwise reduce.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu", reason="device-gated (NEOJAX_TPU_TESTS=1)"
)


def test_resident_ring_stream_matches_xla():
    """S=64 split ring (16.8 MB -> VMEM-resident) streamed through the
    fused kernel equals the unfused XLA per-block path."""
    from neojax.conv import convolver as cv
    from neojax.kernels import fused_step as fs

    b, p, c = 512, 64, 64
    rng = np.random.default_rng(0)
    parts = (
        (rng.standard_normal((1, p, b + 1)) + 1j * rng.standard_normal((1, p, b + 1)))
        * 0.05
    ).astype(np.complex64)
    sig = jnp.asarray(rng.uniform(-1, 1, (c, 24 * b)), jnp.float32)

    cfg_f = cv.PartitionedConfig(b, p, c, storage="split", mac_backend="pallas",
                                 fused=True)
    # the resident gate must actually be on for this shape
    assert 2 * p * c * b * 4 <= fs._RESIDENT_MAX
    params_f = cv.filter_params(cfg_f, parts)
    _, out_f = jax.jit(partial(cv.process, cfg_f))(
        params_f, cv.init_state(cfg_f), sig
    )

    cfg_x = cv.PartitionedConfig(b, p, c, storage="split", mac_backend="xla",
                                 fused=False, packed=False)
    params_x = cv.filter_params(cfg_x, parts)
    _, out_x = jax.jit(partial(cv.process, cfg_x))(
        params_x, cv.init_state(cfg_x), sig
    )
    scale = float(jnp.max(jnp.abs(out_x)))
    err = float(jnp.max(jnp.abs(out_f - out_x))) / max(scale, 1e-9)
    assert err < 1e-4, err


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_nested_mac_float_planes_matches_xla(dtype):
    from neojax.kernels.nested_mac import nested_mac_pallas

    p2, c, k, l = 8, 64, 257, 256
    rng = np.random.default_rng(1)
    planes = jnp.asarray(rng.standard_normal((2, p2, c, k, l)), dtype)
    fr = jnp.asarray(rng.standard_normal((p2, k, l)), jnp.float32)
    fi = jnp.asarray(rng.standard_normal((p2, k, l)), jnp.float32)

    ar, ai = nested_mac_pallas(planes, None, fr, fi)

    x = planes.astype(jnp.float32)
    ref_r = jnp.sum(x[0] * fr[:, None] - x[1] * fi[:, None], axis=0)
    ref_i = jnp.sum(x[0] * fi[:, None] + x[1] * fr[:, None], axis=0)
    tol = 2e-3 * float(jnp.max(jnp.abs(ref_r)))
    assert float(jnp.max(jnp.abs(ar - ref_r))) < tol
    assert float(jnp.max(jnp.abs(ai - ref_i))) < tol
