"""Pallas TPU kernel: the FUSED per-block streaming step (packed layout).

One kernel per streamed block runs the whole hot path of the reference's
``uniform_partitioned_convolver::operator()`` (``src/neo/convolution/
uniform_partitioned_convolver.hpp:48-66``):

    rfft (DFT matmul, MXU)  ->  [quantize +] ring insert (HBM row write)
    ->  partition MAC-reduce over the HBM-resident FDL (VPU, manual
        double-buffered DMA, rotated filter read at a dynamic row offset)
    ->  lane-0 DC/Nyquist fixup  ->  irfft (DFT matmul, MXU)

Fusing the step removes the XLA op-scheduling residue around the MAC
(~25 us/block: rotated-filter dynamic-slice materialization, separate
rfft/irfft dispatches, insert) and overlaps the first FDL chunk's DMA
with the forward transform, pushing the per-block path to the HBM
roofline (BASELINE.json's "speed-of-light" bar).

Layout contract (identical to the unfused path, so outputs match within
f32 reassociation):

- packed-512 spectra: B = N/2 lanes, re-plane lane 0 = DC.re, im-plane
  lane 0 = Nyquist.re (``neojax.conv.fdl`` packed layout). The exact
  DC/Nyquist accumulator pair is computed OUTSIDE (two trivial
  reductions + the [P, C, 2] side-carry MAC) and passed in as ``dcfix``
  to overwrite the garbage lane-0 complex product.
- filter planes arrive tiled-reversed [2P, C', B] (``tile_reverse_filter``);
  the kernel reads chunk j at dynamic row offset (P-1-pos) + j*pc — the
  ring rotation costs nothing (no rotated copy is ever materialized).
- int8/int16 storages quantize in-kernel with the same dynamic
  per-channel scale formula as ``fdl_ring_push_split`` and dequantize
  inside the MAC (the reference's ``compressed_fdl`` + ``compressed_accessor``,
  ``src/neo/convolution/compressed_fdl.hpp:17``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neojax.kernels.fdl_mac import _INT_MAX

__all__ = ["fused_block_step", "fused_chunk_rows"]

# Target bytes per FDL chunk DMA (per double-buffer slot).
_CHUNK_TARGET = 2 * 1024 * 1024

# CPU tests flip this to run the kernel in interpreter mode through the
# full convolver path (call fused_block_step._clear_cache() after).
_INTERPRET = False


def fused_chunk_rows(dtype, p: int, c: int, b: int) -> int:
    """Partition rows per chunk: ~2 MB slots, exact divisor of P."""
    bytes_per_row = 2 * c * b * jnp.dtype(dtype).itemsize
    cap = max(1, min(p, _CHUNK_TARGET // max(1, bytes_per_row)))
    for d in range(cap, 0, -1):
        if p % d == 0:
            return d
    return 1


def _dot(a, bm):
    # HIGHEST (6-pass) for f32 operands; bf16 operands are the 1-pass
    # storage-matched precision and reject an explicit fp32 contract.
    prec = (
        lax.Precision.DEFAULT
        if a.dtype == jnp.bfloat16
        else lax.Precision.HIGHEST
    )
    return lax.dot_general(
        a, bm, (((1,), (0,)), ((), ())),
        precision=prec,
        preferred_element_type=jnp.float32,
    )


def _mk_kernel(*, npc: int, pc: int, p: int, c: int, cf: int, b: int, cpad: int,
               quant: bool, shared: bool, inv_max: float, int_max: float, dt):
    def kernel(pos_ref, frame_ref, fdl_any, fr_any, fi_any, cs_ref, ab_any,
               dcfix_ref, *rest):
        if quant:
            (scl_any, y_ref, fdl_out, scl_out, qrow_ref, acc_ref, imat_ref,
             fdlbuf, frbuf, fibuf, sclbuf, dma_sems, wr_sems) = rest
        else:
            (y_ref, fdl_out, qrow_ref, acc_ref, imat_ref,
             fdlbuf, frbuf, fibuf, dma_sems, wr_sems) = rest
            scl_any = scl_out = sclbuf = None

        pos = pos_ref[0]
        fstart = p - 1 - pos  # rotated filter's first row in the tiled plane
        if shared:
            # The [8, 2P, B] filter holds 8 pre-shifted copies: copy r shifts
            # rows by r, so the (arbitrary) row offset fstart becomes the
            # sublane-ALIGNED offset fstart - r in copy r — Mosaic cannot
            # slice the tiled row dimension at unaligned offsets.
            r8 = lax.rem(fstart, jnp.asarray(8, jnp.int32))
            base = fstart - r8

        def fdl_dma(slot, j):
            return pltpu.make_async_copy(
                fdl_any.at[:, pl.ds(j * pc, pc)], fdlbuf.at[slot],
                dma_sems.at[slot, 0],
            )

        def fr_dma(slot, j):
            if shared:
                off = pl.multiple_of(base + j * pc, 8)
                src = fr_any.at[r8, pl.ds(off, pc)]
            else:
                src = fr_any.at[pl.ds(fstart + j * pc, pc)]
            return pltpu.make_async_copy(src, frbuf.at[slot], dma_sems.at[slot, 1])

        def fi_dma(slot, j):
            if shared:
                off = pl.multiple_of(base + j * pc, 8)
                src = fi_any.at[r8, pl.ds(off, pc)]
            else:
                src = fi_any.at[pl.ds(fstart + j * pc, pc)]
            return pltpu.make_async_copy(src, fibuf.at[slot], dma_sems.at[slot, 2])

        def scl_dma(slot, j):
            return pltpu.make_async_copy(
                scl_any.at[pl.ds(j * pc, pc)], sclbuf.at[slot],
                dma_sems.at[slot, 3],
            )

        def start_chunk(slot, j):
            fdl_dma(slot, j).start()
            fr_dma(slot, j).start()
            fi_dma(slot, j).start()
            if quant:
                scl_dma(slot, j).start()

        def wait_chunk(slot, j):
            fdl_dma(slot, j).wait()
            fr_dma(slot, j).wait()
            fi_dma(slot, j).wait()
            if quant:
                scl_dma(slot, j).wait()

        # Prefetch chunk 0 and the inverse matrices; both overlap with the
        # forward transform on the MXU.
        start_chunk(0, 0)
        ab_copy = pltpu.make_async_copy(ab_any, imat_ref, wr_sems.at[2])
        ab_copy.start()

        # ---- forward rfft (packed): spec = frame @ [cos | sin]
        # (operands cast to the matrix dtype: bf16 matrices = the 1-pass
        # storage-matched precision, f32 = 6-pass exact)
        frame = frame_ref[...].astype(cs_ref.dtype)
        spec_re = _dot(frame, cs_ref[0])  # [C, B] f32 accum
        spec_im = _dot(frame, cs_ref[1])

        # ---- quantize + ring insert at row `pos` (in-place via aliasing)
        if quant:
            peak = jnp.maximum(
                jnp.max(jnp.abs(spec_re), axis=-1),
                jnp.max(jnp.abs(spec_im), axis=-1),
            )  # [C]
            scale = jnp.where(peak > 0, peak, 1.0)
            # lane-padded to cpad so every scales-row DMA is tile-aligned
            scale_pad = jnp.concatenate(
                [scale, jnp.ones((cpad - c,), jnp.float32)]
            )
            q = jnp.stack([spec_re, spec_im]) / scale[None, :, None] * int_max
            qrow = jnp.clip(jnp.round(q), -int_max, int_max).astype(dt)
        else:
            scale_pad = None
            qrow = jnp.stack([spec_re, spec_im]).astype(dt)
        qrow_ref[...] = qrow[:, None]  # [2, 1, C, B]

        row_wr = pltpu.make_async_copy(
            qrow_ref, fdl_out.at[:, pl.ds(pos, 1)], wr_sems.at[0]
        )
        row_wr.start()

        # ---- MAC-reduce over partition chunks (double-buffered)
        acc_ref[...] = jnp.zeros((2, c, b), jnp.float32)

        def body(j, carry):
            slot = lax.rem(j, 2)
            nxt = lax.rem(j + 1, 2)

            @pl.when(j + 1 < npc)
            def _():
                start_chunk(nxt, j + 1)

            wait_chunk(slot, j)

            # Patch the freshly-inserted row if this chunk covers it: the
            # HBM read may have raced the row write, and even without a
            # race the pre-insert contents would be stale.
            in_chunk = jnp.logical_and(pos >= j * pc, pos < (j + 1) * pc)

            @pl.when(in_chunk)
            def _():
                local = pos - j * pc
                fdlbuf[slot, :, pl.ds(local, 1)] = qrow_ref[...]
                if quant:
                    sclbuf[slot, pl.ds(local, 1)] = scale_pad[None, None]

            x = fdlbuf[slot].astype(jnp.float32)  # [2, pc, C, B]
            if quant:
                s = sclbuf[slot][:, 0, :c] * inv_max  # [pc, C]
                x = x * s[None, :, :, None]
            xr, xi = x[0], x[1]
            fr = frbuf[slot]
            fi = fibuf[slot]
            if cf == 1:
                fr = fr[:, None, :]
                fi = fi[:, None, :]
            acc_ref[0] += jnp.sum(xr * fr - xi * fi, axis=0)
            acc_ref[1] += jnp.sum(xr * fi + xi * fr, axis=0)
            return carry

        lax.fori_loop(0, npc, body, 0)

        # ---- exact DC/Nyquist lane-0 overwrite
        dcfix = dcfix_ref[...]  # [2, C]
        lane0 = lax.broadcasted_iota(jnp.int32, (c, b), 1) == 0
        acc_re = jnp.where(lane0, dcfix[0][:, None], acc_ref[0])
        acc_im = jnp.where(lane0, dcfix[1][:, None], acc_ref[1])

        # ---- inverse rfft (packed, 1/N folded into the matrices)
        ab_copy.wait()
        y_ref[...] = _dot(acc_re.astype(imat_ref.dtype), imat_ref[0]) + _dot(
            acc_im.astype(imat_ref.dtype), imat_ref[1]
        )

        # ---- write the scale row (quant) and drain the insert DMA
        if quant:
            sclbuf[0, pl.ds(0, 1)] = scale_pad[None, None]
            scl_row = pltpu.make_async_copy(
                sclbuf.at[0, pl.ds(0, 1)], scl_out.at[pl.ds(pos, 1)],
                wr_sems.at[1],
            )
            scl_row.start()
            scl_row.wait()
        row_wr.wait()

    return kernel


def shift8_filter(filt_tiled):
    """[2P, C', B] tiled filter -> [8, 2P, B] (shared C'=1 only): copy r is
    the plane shifted up by r rows, so the kernel can DMA rotated rows at a
    sublane-aligned offset. Host-side numpy, built once at filter setup."""
    import numpy as np

    f = np.asarray(filt_tiled)
    if f.ndim == 3:
        f = f[:, 0]
    rows, b = f.shape
    pad = np.concatenate([f, np.zeros((8, b), f.dtype)], axis=0)
    return np.stack([pad[r : r + rows] for r in range(8)])


@functools.partial(jax.jit, static_argnames=("shared_filter", "interpret"))
def fused_block_step(frame, fdl, filt_re, filt_im, pos, dcfix, cs, ab,
                     scales=None, *, shared_filter, interpret=False):
    """One fused streaming block step over the packed-layout ring FDL.

    frame   : [C, N] f32 (UPOLS sliding window / UPOLA zero-padded block)
    fdl     : [2, P, C, B] storage dtype (B = N // 2), ring layout
    filt_re/_im : shared_filter=True -> [8, 2P, B] (``shift8_filter``);
              else [2P, C, B] f32 tiled-reversed per-channel planes
    pos     : int32 scalar ring write position
    dcfix   : [2, C] f32 exact DC/Nyquist accumulator values
    cs      : [2, N, B] f32 forward packed-DFT matrices (cos | sin)
    ab      : [2, B, N] f32 inverse packed-DFT matrices (1/N folded)
    scales  : [P, 1, C] f32 (int8/int16 storages only)

    Returns (y [C, N] f32, new_fdl) or (y, new_fdl, new_scales).
    """
    interpret = interpret or _INTERPRET
    c, n = frame.shape
    _, p, _, b = fdl.shape
    cf = 1 if shared_filter else filt_re.shape[1]
    dt = fdl.dtype
    quant = scales is not None
    int_max = float(_INT_MAX[jnp.dtype(dt)]) if quant else 0.0
    inv_max = 1.0 / int_max if quant else 1.0
    pc = fused_chunk_rows(dt, p, c, b)
    npc = p // pc
    # Scales are lane-padded to a 128 multiple: Mosaic requires every
    # memref row slice (the per-chunk DMA, the row writeback) to be
    # tile-aligned along the lane dimension.
    cpad = -(-c // 128) * 128
    if quant:
        scales = jnp.pad(
            scales, ((0, 0), (0, 0), (0, cpad - c)), constant_values=1.0
        )

    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    kernel = _mk_kernel(
        npc=npc, pc=pc, p=p, c=c, cf=cf, b=b, cpad=cpad,
        quant=quant, shared=shared_filter,
        inv_max=inv_max, int_max=int_max, dt=dt,
    )

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    anym = pl.BlockSpec(memory_space=pl.ANY)
    # The filter planes MUST stay in HBM: the kernel DMAs rows at the
    # dynamic ring offset (P-1-pos), which is not sublane-aligned — a VMEM
    # placement (what ANY picks for a 4 MB plane) cannot be row-sliced at
    # arbitrary offsets, but the DMA engine can.
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)

    in_specs = [smem, vmem, anym, hbm, hbm, vmem, anym, vmem]
    args = [pos_arr, frame, fdl, filt_re, filt_im, cs, ab, dcfix]
    out_shape = [
        jax.ShapeDtypeStruct((c, n), jnp.float32),
        jax.ShapeDtypeStruct(fdl.shape, dt),
    ]
    out_specs = [vmem, anym]
    aliases = {2: 1}
    if quant:
        # HBM, not ANY: ANY would place the 480 KB scales in VMEM and the
        # row-sliced DMAs pattern better against HBM.
        in_specs.append(hbm)
        args.append(scales)
        out_shape.append(jax.ShapeDtypeStruct((p, 1, cpad), jnp.float32))
        out_specs.append(hbm)
        aliases[8] = 2

    fshape = (pc, b) if shared_filter else (pc, cf, b)
    scratch = [
        pltpu.VMEM((2, 1, c, b), dt),                  # qrow (row-shaped)
        pltpu.VMEM((2, c, b), jnp.float32),            # acc
        pltpu.VMEM((2, b, n), ab.dtype),               # inverse matrices
        pltpu.VMEM((2, 2, pc, c, b), dt),              # fdl double buffer
        pltpu.VMEM((2,) + fshape, jnp.float32),        # filt re buffer
        pltpu.VMEM((2,) + fshape, jnp.float32),        # filt im buffer
    ]
    if quant:
        scratch.append(pltpu.VMEM((2, pc, 1, cpad), jnp.float32))  # scales buffer
    scratch.append(pltpu.SemaphoreType.DMA((2, 4)))    # per-slot chunk sems
    scratch.append(pltpu.SemaphoreType.DMA((3,)))      # row / scale / ab sems

    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=40 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * p * c * b + 4 * 2 * c * n * b,
            bytes_accessed=int(fdl.size) * jnp.dtype(dt).itemsize
            + int(filt_re.size) * 4
            + int(cs.size) * cs.dtype.itemsize
            + int(ab.size) * ab.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*args)
    if quant:
        y, new_fdl, new_scl = out
        return y, new_fdl, new_scl[..., :c]
    return tuple(out)
