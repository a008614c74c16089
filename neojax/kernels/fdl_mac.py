"""Pallas TPU kernel: the FDL complex MAC-reduce (the framework's hot loop).

TPU-native replacement for the reference's SIMD batched complex
``multiply_add`` (``src/neo/algorithm/multiply_add.hpp:28-69,280-368``) —
the kernel the whole library exists to make fast. Computes

    acc[c, k] = sum_p ( fdl[p, c, k] * filt[p, c', k] )      (complex)

over split-complex planes resident in HBM, with the partition axis tiled
through VMEM and accumulated in float32. Storage dtypes: f32, bf16, or
int8/int16 with a per-(partition, channel) dynamic scale — the dequantize
multiply is fused into the MAC (the role of the reference's
``compressed_accessor``, ``container/compressed_accessor.hpp:16``), so the
delay line's HBM footprint *and* bandwidth shrink by 2-4x.

Grid: (k_tiles, p_chunks); the partition axis is innermost so each output
tile accumulates across its p-chunks in VMEM. Lane tiling: K blocks of 128;
the odd reference bin count (K = B + 1) simply pads the last tile — padding
lanes are elementwise-consistent across operands and never written back.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fdl_mac_pallas", "choose_chunks"]

# Tunables (module-level so the bench harness can sweep them; defaults are
# the measured-best on v5e).
_K_TILE = 256
_VMEM_BUDGET = 8 * 1024 * 1024

_INT_MAX = {jnp.dtype(jnp.int8): 127.0, jnp.dtype(jnp.int16): 32767.0}


def _kernel(fdl_ref, fr_ref, fi_ref, or_ref, oi_ref):
    p = pl.program_id(1)
    x = fdl_ref[...].astype(jnp.float32)  # [2, Pc, C, Kt]
    xr, xi = x[0], x[1]
    fr = fr_ref[...]  # [Pc, C', Kt] or, shared, [Pc, Kt]
    fi = fi_ref[...]
    if fr.ndim == 2:
        fr = fr[:, None, :]
        fi = fi[:, None, :]
    re = jnp.sum(xr * fr - xi * fi, axis=0)  # [C, Kt]
    im = jnp.sum(xr * fi + xi * fr, axis=0)

    @pl.when(p == 0)
    def _():
        or_ref[...] = re
        oi_ref[...] = im

    @pl.when(p > 0)
    def _():
        or_ref[...] += re
        oi_ref[...] += im


def _kernel_quant(fdl_ref, scl_ref, fr_ref, fi_ref, or_ref, oi_ref, *, inv_max):
    p = pl.program_id(1)
    scale = scl_ref[...] * inv_max  # [Pc, C]
    x = fdl_ref[...].astype(jnp.float32) * scale[None, :, :, None]
    xr, xi = x[0], x[1]
    fr = fr_ref[...]
    fi = fi_ref[...]
    if fr.ndim == 2:
        fr = fr[:, None, :]
        fi = fi[:, None, :]
    re = jnp.sum(xr * fr - xi * fi, axis=0)
    im = jnp.sum(xr * fi + xi * fr, axis=0)

    @pl.when(p == 0)
    def _():
        or_ref[...] = re
        oi_ref[...] = im

    @pl.when(p > 0)
    def _():
        or_ref[...] += re
        oi_ref[...] += im


def choose_chunks(dtype, p: int, c: int, k: int) -> tuple[int, int]:
    """(k_tile, p_chunk) for the MAC grid — shared with the sparse kernel's
    schedule builder so both agree on tile geometry.

    The partition chunk is sized so a double-buffered fdl block stays well
    under VMEM. The chunk MUST divide P exactly: a ragged final chunk would
    read out-of-bounds partitions whose garbage is summed into valid outputs
    (unlike lane padding, which only pollutes lanes that are never written
    back). Callers keep P a multiple of 32 for full-speed chunks
    (Convolver pads the filter with zero partitions automatically).
    """
    k_tile = min(_K_TILE, k)
    bytes_per = jnp.dtype(dtype).itemsize
    cap = max(1, min(p, _VMEM_BUDGET // max(1, 2 * c * k_tile * bytes_per * 2)))
    pc = 1
    for d in range(cap, 0, -1):
        if p % d == 0:
            pc = d
            break
    return k_tile, pc


@functools.partial(jax.jit, static_argnames=("interpret",))
def fdl_mac_pallas(fdl, filt_re, filt_im, scales=None, *, interpret=False):
    """acc = sum_p fdl[p] * filt[p] in split-complex planes.

    fdl      : [2, P, C, K]  (f32 / bf16 / int8 / int16)
    filt_re/_im : [P, C', K] f32 with C' in {C, 1} (already ring-rotated)
    scales   : [P, C] f32 for int storage (per-partition-channel dequant)
    returns  : (acc_re, acc_im), each [C, K] f32
    """
    _, p, c, k = fdl.shape
    cf = filt_re.shape[1]
    if cf == 1:
        # A [P, 1, K] filter block would occupy one sublane of an (8, 128)
        # tile — an 8x-padded strided DMA per partition row. Rank-2 [P, K]
        # is densely tiled; the kernel broadcasts over channels instead.
        filt_re = filt_re.reshape(p, k)
        filt_im = filt_im.reshape(p, k)

    k_tile, pc = choose_chunks(fdl.dtype, p, c, k)
    nk = pl.cdiv(k, k_tile)
    npc = p // pc

    grid = (nk, npc)
    out_shape = (
        jax.ShapeDtypeStruct((c, k), jnp.float32),
        jax.ShapeDtypeStruct((c, k), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((c, k_tile), lambda kk, pp: (0, kk)),
        pl.BlockSpec((c, k_tile), lambda kk, pp: (0, kk)),
    )
    fdl_spec = pl.BlockSpec((2, pc, c, k_tile), lambda kk, pp: (0, pp, 0, kk))
    if cf == 1:
        fr_spec = pl.BlockSpec((pc, k_tile), lambda kk, pp: (pp, kk))
    else:
        fr_spec = pl.BlockSpec((pc, cf, k_tile), lambda kk, pp: (pp, 0, kk))

    if scales is None:
        return pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[fdl_spec, fr_spec, fr_spec],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
                vmem_limit_bytes=32 * 1024 * 1024,
            ),
            interpret=interpret,
        )(fdl, filt_re, filt_im)

    inv_max = 1.0 / _INT_MAX[jnp.dtype(fdl.dtype)]
    scl_spec = pl.BlockSpec((pc, c), lambda kk, pp: (pp, 0))
    return pl.pallas_call(
        functools.partial(_kernel_quant, inv_max=inv_max),
        grid=grid,
        in_specs=[fdl_spec, scl_spec, fr_spec, fr_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        interpret=interpret,
    )(fdl, scales, filt_re, filt_im)
