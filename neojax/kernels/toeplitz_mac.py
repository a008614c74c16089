"""Pallas TPU kernel: per-bin Toeplitz matmul for chunked FDL convolution.

The chunked path (``neojax.conv.chunked``) needs, per frequency bin k, a
complex matmul ``acc[k] = T[k] @ hist[k]`` with tiny per-batch shapes
([S, M] @ [M, C]). XLA lowers a 513-batch dot_general (and the equivalent
depthwise conv) to ~130 GFLOP/s on TPU — two orders below the MXU. This
kernel streams one bin per grid step through VMEM and issues a single real
matmul per bin with the complex structure folded in:

    Tcat[k] = [[Tr, -Ti],      Hcat[k] = [[Hr],      out[k] = [[acc_re],
               [Ti,  Tr]]                 [Hi]]                 [acc_im]]

    out[k] ([2S, C]) = Tcat[k] ([2S, 2M]) @ Hcat[k] ([2M, C])

Per-bin DMA (~0.5 MB bf16) double-buffers against the MXU work; M is the
contraction so the odd history length needs no padding discipline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["toeplitz_mac", "build_tcat"]


def build_tcat(t_re, t_im):
    """[K, S, M] re/im Toeplitz planes -> [K, 2S, 2M] folded form (host)."""
    import numpy as np

    top = np.concatenate([t_re, -t_im], axis=2)
    bot = np.concatenate([t_im, t_re], axis=2)
    return np.concatenate([top, bot], axis=1)


def _kernel(t_ref, h_ref, o_ref):
    o_ref[0] = jnp.dot(
        t_ref[0], h_ref[0], preferred_element_type=jnp.float32
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def toeplitz_mac(tcat, hcat, *, interpret=False):
    """tcat [K, 2S, 2M] x hcat [K, 2M, C] -> [K, 2S, C] f32 (top half = re,
    bottom half = im)."""
    k, s2, m2 = tcat.shape
    _, _, c = hcat.shape
    return pl.pallas_call(
        _kernel,
        grid=(k,),
        in_specs=[
            pl.BlockSpec((1, s2, m2), lambda kk: (kk, 0, 0)),
            pl.BlockSpec((1, m2, c), lambda kk: (kk, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s2, c), lambda kk: (kk, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((k, s2, c), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(tcat, hcat)
