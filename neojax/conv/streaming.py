"""One-shot convolution through the streaming engines (method routing).

The reference's ``method`` enum (``method.hpp:8-17``) includes the
streaming engines; this module lets the high-level ``convolve`` API route
through them (OLS/OLA single-filter streaming, UPOLS/UPOLA partitioned)
and still produce a plain full convolution — used both for API parity and
as a cross-implementation oracle between engines.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from neojax.core.bits import bit_ceil
from neojax.conv.convolver import Convolver
from neojax.conv.overlap import OverlapAdd, OverlapSave, stream_blocks, unstream_blocks
from neojax.conv.partition import uniform_partition
from neojax.fft import api as fft_api

__all__ = ["streaming_convolve"]


def _ols_ola_convolve(signal, patch, scheme: str, block_size: int | None):
    n = signal.shape[-1]
    l = patch.shape[-1]
    if block_size is None:
        block_size = min(max(bit_ceil(l), 256), 4096)
    proc_cls = OverlapSave if scheme == "ols" else OverlapAdd
    proc = proc_cls(block_size, l)
    h_spec = jnp.asarray(
        np.fft.rfft(np.asarray(patch), n=proc.transform_size).astype(np.complex64)
    )

    sig = jnp.asarray(signal, jnp.float32)[None]  # [1, T]
    total = n + l - 1
    pad_to = -(-total // block_size) * block_size
    sig = jnp.pad(sig, ((0, 0), (0, pad_to - n)))

    blocks, length = stream_blocks(sig, block_size)
    state = proc.init_state(1)
    outs = []
    import jax

    def body(carry, blk):
        new_state, out = proc.step(carry, blk, lambda s: s * h_spec)
        return new_state, out

    state, outs = jax.lax.scan(body, state, blocks)
    out = unstream_blocks(outs, length)[0]
    return out[: n + l - 1]


def _partitioned_convolve(signal, patch, scheme: str, block_size: int | None):
    n = signal.shape[-1]
    l = patch.shape[-1]
    if block_size is None:
        block_size = min(max(bit_ceil(l // 16 + 1), 128), 4096)
    parts = uniform_partition(np.asarray(patch, np.float32), block_size)
    c = Convolver(scheme)
    c.filter(parts)
    total = n + l - 1
    sig = np.zeros(( -(-total // block_size) * block_size,), np.float32)
    sig[:n] = np.asarray(signal, np.float32)
    out = np.asarray(c.process(sig[None]))[0]
    return jnp.asarray(out[: n + l - 1])


def streaming_convolve(in1, in2, method: str, block_size: int | None = None):
    """Full 1-D convolution via a streaming engine ('ols'|'ola'|'upols'|'upola')."""
    in1 = jnp.asarray(in1)
    in2 = jnp.asarray(in2)
    if method in ("ols", "ola"):
        return _ols_ola_convolve(in1, in2, method, block_size)
    if method in ("upols", "upola"):
        return _partitioned_convolve(in1, in2, method, block_size)
    raise ValueError(f"unknown streaming method: {method!r}")
