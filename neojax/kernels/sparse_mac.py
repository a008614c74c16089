"""Pallas TPU kernel: tile-sparse FDL MAC (the CSR sparse filter, TPU-style).

The reference's sparse filter stores kept bins in a CSR matrix and MACs
only those (``sparse_filter.hpp:16``, ``multiply_add.hpp:306-324``). Per-
element gathers would starve the VPU, so the TPU-native form prunes at
*tile* granularity: the (partition-chunk x lane-tile) grid cells whose
filter tiles are entirely masked are never visited — their HBM traffic
and flops vanish, which is where the sparse speedup actually comes from
(perceptual masks are band-structured, so tiles are coherent).

The ring FDL rotates the filter by one partition per block, so a tile's
activity depends on the write position: the schedule is precomputed for
ALL P rotations at filter-setup time (``build_sparse_schedule``) as
[P, L] coordinate tables. The CURRENT position's row ([L] per table) is
sliced out in XLA before the call and only those rows are scalar-
prefetched — prefetching the full [P, L] tables overflows SMEM's scoped
allocation once P is production-sized (3 x s32[960, 12] = 138 KB).
Rows shorter than L are padded with skip-flagged entries.
The kernel runs a 1-D grid over the L slots, k-major sorted so each output
k-tile is revisited consecutively and accumulated in VMEM. k-tiles with no
active chunk at ANY rotation are never written — the caller zeroes those
lanes with the static ``lane_mask``. Lane-level masking inside a kept tile
is already baked into the zeroed filter values.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "build_sparse_schedule",
    "build_chunk_schedule",
    "sparse_fdl_mac_pallas",
]


def lane_widths(b: int) -> list[int]:
    """Quantized live-lane widths for the fused kernel's lane skipping:
    [b, b/2, b/4, ...] down to the 128-lane tile floor. Width code ``w``
    means "only the first ``lane_widths(b)[w]`` lanes of this chunk are
    live" — DMA slices must be static, so cutoffs round UP to a width."""
    out = [b]
    while out[-1] % 2 == 0 and out[-1] // 2 >= 128 and out[-1] // 2 % 128 == 0:
        out.append(out[-1] // 2)
    return out


def build_chunk_schedule(mask: np.ndarray, p_chunk: int, lanes: int | None = None):
    """Chunk-level sparse schedule for the FUSED step.

    ``mask`` [P, K] or [P, C', K] ->
    ``{"c_idx": [P, L] i32, "flags": [P, L] i32, "density": float,
    "lane_density": float}`` where row ``w`` lists the chunk indices
    (ascending) containing at least one ring slot whose rotated filter
    partition is unmasked at write position ``w``. Padded with flag-0
    entries pointing at the last real chunk (valid DMA target, accumulate
    skipped).

    ``lanes`` (the packed lane count B) enables LANE-granular skipping on
    top: each listed chunk's entry carries a width code in bits 16+
    (``c_idx = chunk | code << 16``) saying only the first
    ``lane_widths(B)[code]`` lanes are live in that chunk. This is what
    makes the *perceptual* (bin-structured) mask pay in the fused path:
    an A-weighted threshold keeps low bins across all partitions
    (``DenseConvolution.cpp:245-250``) — no whole partition ever dies, but
    late partitions keep only low frequencies, so their chunks read only a
    prefix of the lane axis. Exactness is unconditional: bins outside the
    mask are zero in the filter, and bins outside the width are never
    accumulated (the accumulator is zero-initialized).
    """
    mask = np.asarray(mask, bool)
    if mask.ndim == 3:
        mask = mask.any(axis=1)
    active_part = mask.any(axis=1)  # [P]
    p = active_part.shape[0]
    if p % p_chunk:
        raise ValueError(f"P={p} not a multiple of p_chunk={p_chunk}")
    npc = p // p_chunk

    widths = lane_widths(lanes) if lanes else None
    if widths is not None:
        # Highest live PACKED lane per partition: cols 0..B-1 are lanes,
        # col B (Nyquist) lives in lane 0 of the im plane.
        k = mask.shape[1]
        lane_live = mask[:, : min(lanes, k)].copy()
        if k > lanes:
            lane_live[:, 0] |= mask[:, lanes]
        hi = np.where(
            lane_live.any(axis=1),
            lane_live.shape[1] - 1 - np.argmax(lane_live[:, ::-1], axis=1),
            -1,
        )
        need = hi + 1  # [P] lanes needed (0 = none)

    rev = active_part[::-1]
    tiled = np.concatenate([rev, rev], axis=0)
    if widths is not None:
        need_tiled = np.concatenate([need[::-1], need[::-1]], axis=0)
    rows = []
    codes = []
    for w in range(p):
        rot = tiled[p - 1 - w : 2 * p - 1 - w]  # rot[i] = active[(w - i) % P]
        act = rot.reshape(npc, p_chunk).any(axis=1)
        cc = np.nonzero(act)[0]
        rows.append(cc)
        if widths is not None:
            rot_need = need_tiled[p - 1 - w : 2 * p - 1 - w]
            chunk_need = rot_need.reshape(npc, p_chunk).max(axis=1)[cc]
            code = np.zeros(len(cc), np.int32)
            for ci, wd in enumerate(widths[1:], start=1):
                code[chunk_need <= wd] = ci
            codes.append(code)
    lengths = [len(r) for r in rows]
    l_max = max(lengths)
    if l_max == 0:
        raise ValueError("empty sparsity mask: no active partitions")
    c_idx = np.zeros((p, l_max), np.int32)
    flags = np.zeros((p, l_max), np.int32)
    lane_cost = []
    for w, cc in enumerate(rows):
        n = len(cc)
        ent = cc.astype(np.int32)
        if widths is not None and n:
            ent = ent | (codes[w] << 16)
            lane_cost.append(
                float(np.sum([widths[c] for c in codes[w]])) / (npc * (lanes or 1))
            )
        c_idx[w, :n] = ent
        flags[w, :n] = 1
        if n < l_max:
            c_idx[w, n:] = ent[-1] if n else 0
    return {
        "c_idx": c_idx,
        "flags": flags,
        "density": float(np.mean(lengths) / npc),
        "lane_density": float(np.mean(lane_cost)) if lane_cost else
        float(np.mean(lengths) / npc),
    }


def build_sparse_schedule(mask: np.ndarray, p_chunk: int, k_tile: int):
    """mask [P, K] or [P, C', K] (any-channel OR) -> schedule dict.

    Returns ``{"k_idx": [P, L] i32, "p_idx": [P, L] i32, "flags": [P, L] i32,
    "lane_mask": [K] bool, "density": float}`` where row ``w`` lists the
    active (k-tile, p-chunk) pairs of the filter rotated to write position
    ``w`` (ring slot i multiplies filter partition (w - i) mod P — the
    reference's ``fdl_index`` modular schedule, ``fdl_index.hpp:24-36``),
    k-major sorted, padded to the max row length L with flag-0 entries.
    ``density`` is the mean fraction of tiles visited across rotations.
    """
    mask = np.asarray(mask, bool)
    if mask.ndim == 3:
        mask = mask.any(axis=1)
    p, k = mask.shape
    if p % p_chunk:
        raise ValueError(f"P={p} not a multiple of p_chunk={p_chunk}")
    nk = -(-k // k_tile)
    npc = p // p_chunk
    padk = np.zeros((p, nk * k_tile), bool)
    padk[:, :k] = mask
    q = padk.reshape(p, nk, k_tile).any(axis=2)  # [P, NK] per-partition tiles
    lane_mask = np.repeat(q.any(axis=0), k_tile)[:k]

    rev = q[::-1]
    tiled = np.concatenate([rev, rev], axis=0)  # [2P, NK]
    rows = []
    for w in range(p):
        rot = tiled[p - 1 - w : 2 * p - 1 - w]  # rot[i] = q[(w - i) % P]
        act = rot.reshape(npc, p_chunk, nk).any(axis=1)  # [NPC, NK]
        cc, kk = np.nonzero(act)
        order = np.lexsort((cc, kk))  # k-major
        rows.append((kk[order], cc[order]))
    lengths = [len(r[0]) for r in rows]
    l_max = max(lengths)
    if l_max == 0:
        raise ValueError("empty sparsity mask: no active tiles")
    k_idx = np.zeros((p, l_max), np.int32)
    p_idx = np.zeros((p, l_max), np.int32)
    flags = np.zeros((p, l_max), np.int32)
    for w, (kk, cc) in enumerate(rows):
        n = len(kk)
        k_idx[w, :n] = kk
        p_idx[w, :n] = cc
        flags[w, :n] = 1
        if n < l_max:  # pad pointing at the last real tile (skipped, cheap DMA)
            k_idx[w, n:] = kk[-1] if n else 0
            p_idx[w, n:] = cc[-1] if n else 0
    density = float(np.mean(lengths) / (nk * npc))
    return {
        "k_idx": k_idx,
        "p_idx": p_idx,
        "flags": flags,
        "lane_mask": lane_mask,
        "density": density,
    }


def _mk_kernel(quant: bool, inv_max: float = 1.0):
    def kernel(k_ref, p_ref, f_ref, *refs):
        del p_ref  # consumed by the index maps only
        if quant:
            fdl_ref, scl_ref, fr_ref, fi_ref, or_ref, oi_ref = refs
        else:
            fdl_ref, fr_ref, fi_ref, or_ref, oi_ref = refs
        i = pl.program_id(0)
        flag = f_ref[i]
        prev_k = k_ref[jnp.maximum(i - 1, 0)]
        first = jnp.logical_or(i == 0, prev_k != k_ref[i])

        x = fdl_ref[...].astype(jnp.float32)  # [2, Pc, C, Kt]
        if quant:
            scale = scl_ref[...] * inv_max  # [Pc, C]
            x = x * scale[None, :, :, None]
        xr, xi = x[0], x[1]
        fr = fr_ref[...]
        fi = fi_ref[...]
        if fr.ndim == 2:
            fr = fr[:, None, :]
            fi = fi[:, None, :]
        re = jnp.sum(xr * fr - xi * fi, axis=0)  # [C, Kt]
        im = jnp.sum(xr * fi + xi * fr, axis=0)

        @pl.when(jnp.logical_and(flag == 1, first))
        def _():
            or_ref[...] = re
            oi_ref[...] = im

        @pl.when(jnp.logical_and(flag == 1, jnp.logical_not(first)))
        def _():
            or_ref[...] += re
            oi_ref[...] += im

    return kernel


@functools.partial(
    jax.jit, static_argnames=("p_chunk", "k_tile", "interpret")
)
def sparse_fdl_mac_pallas(
    fdl,
    filt_re,
    filt_im,
    pos,
    k_idx,
    p_idx,
    flags,
    scales=None,
    *,
    p_chunk: int,
    k_tile: int,
    interpret=False,
):
    """Tile-sparse ``fdl_mac_pallas``: only the schedule's active tiles are
    DMA'd and MAC'd.

    fdl [2, P, C, K] (f32/bf16/int8/int16); filt planes [P, C', K] f32
    ALREADY ring-rotated (``fdl.rotated_filter``) with masked bins zeroed;
    pos: current write position (selects the schedule row); k_idx/p_idx/
    flags from :func:`build_sparse_schedule`; scales [P, C] f32 for int
    storage. Output bins in never-visited k-tiles are UNDEFINED — mask
    them with the schedule's ``lane_mask``.
    """
    _, p, c, k = fdl.shape
    cf = filt_re.shape[1]
    if cf == 1:
        filt_re = filt_re.reshape(p, k)
        filt_im = filt_im.reshape(p, k)
    if p % p_chunk:
        raise ValueError(f"P={p} not a multiple of p_chunk={p_chunk}")
    l_max = k_idx.shape[1]
    # Slice the current rotation's schedule row in XLA (a tiny dynamic
    # slice) so only 3 x [L] i32 rows ride the SMEM scalar prefetch; the
    # full [P, L] tables stay in HBM.
    pos = jnp.asarray(pos, jnp.int32)
    k_row = jax.lax.dynamic_index_in_dim(k_idx, pos, 0, keepdims=False)
    p_row = jax.lax.dynamic_index_in_dim(p_idx, pos, 0, keepdims=False)
    f_row = jax.lax.dynamic_index_in_dim(flags, pos, 0, keepdims=False)

    fdl_spec = pl.BlockSpec(
        (2, p_chunk, c, k_tile),
        lambda i, kI, pI, fl: (0, pI[i], 0, kI[i]),
    )
    if cf == 1:
        f_spec = pl.BlockSpec(
            (p_chunk, k_tile),
            lambda i, kI, pI, fl: (pI[i], kI[i]),
        )
    else:
        f_spec = pl.BlockSpec(
            (p_chunk, cf, k_tile),
            lambda i, kI, pI, fl: (pI[i], 0, kI[i]),
        )
    out_specs = (
        pl.BlockSpec((c, k_tile), lambda i, kI, pI, fl: (0, kI[i])),
        pl.BlockSpec((c, k_tile), lambda i, kI, pI, fl: (0, kI[i])),
    )
    out_shape = (
        jax.ShapeDtypeStruct((c, k), jnp.float32),
        jax.ShapeDtypeStruct((c, k), jnp.float32),
    )

    quant = scales is not None
    if quant:
        from neojax.kernels.fdl_mac import _INT_MAX

        inv_max = 1.0 / _INT_MAX[jnp.dtype(fdl.dtype)]
        scl_spec = pl.BlockSpec(
            (p_chunk, c), lambda i, kI, pI, fl: (pI[i], 0)
        )
        in_specs = [fdl_spec, scl_spec, f_spec, f_spec]
        args = (fdl, scales, filt_re, filt_im)
    else:
        inv_max = 1.0
        in_specs = [fdl_spec, f_spec, f_spec]
        args = (fdl, filt_re, filt_im)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # k_row, p_row, f_row ([L] each)
        grid=(l_max,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    return pl.pallas_call(
        _mk_kernel(quant, inv_max),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
        interpret=interpret,
    )(k_row, p_row, f_row, *args)
