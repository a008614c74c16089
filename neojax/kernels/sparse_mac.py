"""Pallas TPU kernel: tile-sparse FDL MAC (the CSR sparse filter, TPU-style).

The reference's sparse filter stores kept bins in a CSR matrix and MACs
only those (``sparse_filter.hpp:16``, ``multiply_add.hpp:306-324``). Per-
element gathers would starve the VPU, so the TPU-native form prunes at
*tile* granularity: the (partition-chunk x 128-bin-lane-tile) grid cells
whose filter tiles are entirely masked are never visited — their HBM
traffic and flops vanish, which is where the sparse speedup actually
comes from (perceptual masks are band-structured, so tiles are coherent).

Mechanics: the active (k_tile, p_chunk) pairs are enumerated at filter-
setup time, sorted k-major; the kernel runs a 1-D grid over active pairs
with the tile coordinates scalar-prefetched, accumulating into the k-tile's
output block (revisited consecutively thanks to the sort). Lane-level
masking inside a kept tile is already baked into the zeroed filter values.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["active_tiles", "sparse_fdl_mac_pallas"]

K_TILE = 128


def active_tiles(mask: np.ndarray, p_chunk: int) -> tuple[np.ndarray, np.ndarray, float]:
    """mask [P, K] (or [P, C', K] — any-channel OR) -> (k_idx, p_idx, density).

    Returns the k-tile / p-chunk indices of tiles containing any kept bin,
    sorted k-major (so output tiles are revisited consecutively), plus the
    fraction of tiles kept.
    """
    mask = np.asarray(mask, bool)
    if mask.ndim == 3:
        mask = mask.any(axis=1)
    p, k = mask.shape
    nk = -(-k // K_TILE)
    npc = -(-p // p_chunk)
    pad = np.zeros((npc * p_chunk, nk * K_TILE), bool)
    pad[:p, :k] = mask
    tiles = pad.reshape(npc, p_chunk, nk, K_TILE).any(axis=(1, 3))  # [npc, nk]
    pp, kk = np.nonzero(tiles)
    order = np.lexsort((pp, kk))  # k-major
    k_idx = kk[order].astype(np.int32)
    p_idx = pp[order].astype(np.int32)
    density = float(tiles.mean()) if tiles.size else 0.0
    return k_idx, p_idx, density


def _kernel(k_idx, p_idx, fdl_ref, fr_ref, fi_ref, or_ref, oi_ref):
    i = pl.program_id(0)
    x = fdl_ref[...].astype(jnp.float32)  # [2, Pc, C, Kt]
    xr, xi = x[0], x[1]
    fr = fr_ref[...]
    fi = fi_ref[...]
    re = jnp.sum(xr * fr - xi * fi, axis=0)
    im = jnp.sum(xr * fi + xi * fr, axis=0)

    # First visit of this k-tile (k-major sort => new k means fresh tile).
    prev_same = jnp.logical_and(i > 0, k_idx[jnp.maximum(i - 1, 0)] == k_idx[i])

    @pl.when(jnp.logical_not(prev_same))
    def _():
        or_ref[...] = re
        oi_ref[...] = im

    @pl.when(prev_same)
    def _():
        or_ref[...] += re
        oi_ref[...] += im


@functools.partial(jax.jit, static_argnames=("p_chunk", "interpret"))
def sparse_fdl_mac_pallas(
    fdl, filt_re, filt_im, k_idx, p_idx, *, p_chunk: int, interpret=False
):
    """Tile-sparse version of ``fdl_mac_pallas``.

    fdl [2, P, C, K]; filt planes [P, C', K] f32 (masked bins zeroed);
    k_idx/p_idx from :func:`active_tiles`. P must be a multiple of p_chunk
    and the *output is only valid for k-tiles listed in k_idx* — bins in
    fully-pruned k-tiles are left untouched (treat as zero via the mask).
    """
    _, p, c, k = fdl.shape
    cf = filt_re.shape[1]
    if p % p_chunk:
        raise ValueError(f"P={p} not a multiple of p_chunk={p_chunk}")
    n_active = k_idx.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_active,),
        in_specs=[
            pl.BlockSpec(
                (2, p_chunk, c, K_TILE),
                lambda i, k_idx, p_idx: (0, p_idx[i], 0, k_idx[i]),
            ),
            pl.BlockSpec(
                (p_chunk, cf, K_TILE),
                lambda i, k_idx, p_idx: (p_idx[i], 0, k_idx[i]),
            ),
            pl.BlockSpec(
                (p_chunk, cf, K_TILE),
                lambda i, k_idx, p_idx: (p_idx[i], 0, k_idx[i]),
            ),
        ],
        out_specs=(
            pl.BlockSpec((c, K_TILE), lambda i, k_idx, p_idx: (0, k_idx[i])),
            pl.BlockSpec((c, K_TILE), lambda i, k_idx, p_idx: (0, k_idx[i])),
        ),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((c, k), jnp.float32),
            jax.ShapeDtypeStruct((c, k), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(k_idx, p_idx, fdl, filt_re, filt_im)
