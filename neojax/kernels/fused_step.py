"""Pallas TPU kernel: the FUSED per-block streaming step (packed layout).

One kernel per streamed block runs the whole hot path of the reference's
``uniform_partitioned_convolver::operator()`` (``src/neo/convolution/
uniform_partitioned_convolver.hpp:48-66``):

    rfft (DFT matmul, MXU)  ->  [quantize +] ring insert (HBM row write)
    ->  partition MAC-reduce over the HBM-resident FDL (VPU, manual
        triple-buffered DMA, rotated filter read at a dynamic row offset)
    ->  lane-0 DC/Nyquist fixup  ->  irfft (DFT matmul, MXU)

Fusing the step removes the XLA op-scheduling residue around the MAC
(rotated-filter dynamic-slice materialization, separate rfft/irfft
dispatches, insert) and overlaps the first FDL chunk's DMA with the
forward transform, pushing the per-block path to the HBM roofline
(BASELINE.json's "speed-of-light" bar).

Pipeline shape (measured on v5e): FDL chunks stream through THREE VMEM
slots with two chunks in flight — two slots were ~15% off the DMA
engine's streaming rate — and the rotated filter rides ONE DMA per chunk
(re|im planes packed along lanes).  Quantization scales are a
VMEM-resident input (direct row loads, no per-chunk DMA).

Layout contract (identical to the unfused path, so outputs match within
f32 reassociation):

- packed-512 spectra: B = N/2 lanes, re-plane lane 0 = DC.re, im-plane
  lane 0 = Nyquist.re (``neojax.conv.fdl`` packed layout). The exact
  DC/Nyquist accumulator pair is computed OUTSIDE (two trivial
  reductions + the [P, C, 2] side-carry MAC) and passed in as ``dcfix``
  to overwrite the garbage lane-0 complex product.
- the filter arrives lane-packed re|im ([8, 2P, 2B] shared with 8
  pre-shifted copies for sublane-aligned rotated DMA; [2P, C, 2B]
  per-channel), storage-matched dtype (bf16 for bf16/int8 storages).
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

__all__ = ["fused_block_step", "fused_chunk_rows", "shift8_filter"]

# Target bytes per FDL chunk DMA (per buffer slot).
_CHUNK_TARGET = 4 * 1024 * 1024

# FDL chunk buffer slots (2 chunks in flight + 1 in compute).
_SLOTS = 3

# CPU tests flip this to run the kernel in interpreter mode through the
# full convolver path (clear jax caches after flipping back).
_INTERPRET = False


def fused_chunk_rows(dtype, p: int, c: int, b: int) -> int:
    """Partition rows per chunk: ~_CHUNK_TARGET slots, exact divisor of P."""
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
               quant: bool, shared: bool, inv_max: float, int_max: float, dt,
               n_sched: int = 0):
    sparse = n_sched > 0

    def kernel(pos_ref, frame_ref, fdl_any, rim_any, cs_ref, ab_any,
               dcfix_ref, *rest):
        if sparse:
            crow_ref, frow_ref, *rest = rest
        else:
            crow_ref = frow_ref = None
        if quant:
            (scl_ref, y_ref, fdl_out, scl_out, qrow_ref, acc_ref, imat_ref,
             fdlbuf, rimbuf, sclrow, dma_sems, wr_sems) = rest
        else:
            (y_ref, fdl_out, qrow_ref, acc_ref, imat_ref,
             fdlbuf, rimbuf, dma_sems, wr_sems) = rest
            scl_ref = scl_out = sclrow = None

        pos = pos_ref[0]
        fstart = p - 1 - pos  # rotated filter's first row in the tiled plane
        if shared:
            # The [8, 2P, 2B] filter holds 8 pre-shifted copies: copy r
            # shifts rows by r, so the (arbitrary) row offset fstart becomes
            # the sublane-ALIGNED offset fstart - r in copy r — Mosaic
            # cannot slice the tiled row dimension at unaligned offsets.
            r8 = lax.rem(fstart, jnp.asarray(8, jnp.int32))
            base = fstart - r8

        # Sparse mode: loop step j visits chunk crow[j] (flag-0 pad entries
        # DMA a valid chunk but skip the accumulate — keeps the prefetch
        # pipeline branch-free); dense mode: chunk j.
        def chunk_of(j):
            return crow_ref[j] if sparse else j

        nloop = n_sched if sparse else npc

        def fdl_dma(slot, cj):
            return pltpu.make_async_copy(
                fdl_any.at[:, pl.ds(cj * pc, pc)], fdlbuf.at[slot],
                dma_sems.at[slot, 0],
            )

        def rim_dma(slot, cj):
            if shared:
                off = pl.multiple_of(base + cj * pc, 8)
                src = rim_any.at[r8, pl.ds(off, pc)]
            else:
                src = rim_any.at[pl.ds(fstart + cj * pc, pc)]
            return pltpu.make_async_copy(src, rimbuf.at[slot], dma_sems.at[slot, 1])

        def start_chunk(slot, j):
            cj = chunk_of(j)
            fdl_dma(slot, cj).start()
            rim_dma(slot, cj).start()

        def wait_chunk(slot, j):
            cj = chunk_of(j)
            fdl_dma(slot, cj).wait()
            rim_dma(slot, cj).wait()

        # Prefetch the first chunks and the inverse matrices; all overlap
        # with the forward transform on the MXU.
        start_chunk(0, 0)
        if nloop > 1:
            start_chunk(1, 1)
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
            q = jnp.stack([spec_re, spec_im]) / scale[None, :, None] * int_max
            qrow = jnp.clip(jnp.round(q), -int_max, int_max).astype(dt)
        else:
            scale = None
            qrow = jnp.stack([spec_re, spec_im]).astype(dt)
        qrow_ref[...] = qrow[:, None]  # [2, 1, C, B]

        row_wr = pltpu.make_async_copy(
            qrow_ref, fdl_out.at[:, pl.ds(pos, 1)], wr_sems.at[0]
        )
        row_wr.start()

        # ---- MAC-reduce over partition chunks (triple-buffered)
        acc_ref[...] = jnp.zeros((2, c, b), jnp.float32)

        def body(j, carry):
            slot = lax.rem(j, _SLOTS)

            @pl.when(j + 2 < nloop)
            def _():
                start_chunk(lax.rem(j + 2, _SLOTS), j + 2)

            wait_chunk(slot, j)
            cj = chunk_of(j)

            # Patch the freshly-inserted row if this chunk covers it: the
            # HBM read may have raced the row write, and even without a
            # race the pre-insert contents would be stale. (Overwrite, not
            # delta — idempotent under either race outcome.)
            in_chunk = jnp.logical_and(pos >= cj * pc, pos < (cj + 1) * pc)
            local = pos - cj * pc

            @pl.when(in_chunk)
            def _():
                fdlbuf[slot, :, pl.ds(local, 1)] = qrow_ref[...]

            def accumulate():
                x = fdlbuf[slot].astype(jnp.float32)  # [2, pc, C, B]
                if quant:
                    s3 = scl_ref[pl.ds(cj * pc, pc)]  # [pc, 1, cpad]
                    s = lax.slice(lax.squeeze(s3, (1,)), (0, 0), (pc, c))
                    s = jnp.where(
                        jnp.logical_and(
                            in_chunk,
                            lax.broadcasted_iota(jnp.int32, (pc, c), 0) == local,
                        ),
                        scale[None],
                        s,
                    )
                    x = x * (s * inv_max)[None, :, :, None]
                # NB: mixed None+slice basic indexing (rim[:, None, :b])
                # lowers to a gather Mosaic rejects inside fori bodies —
                # use lax.slice.
                rim = rimbuf[slot].astype(jnp.float32)
                if shared:
                    fr = lax.slice(rim, (0, 0), (pc, b))[:, None]
                    fi = lax.slice(rim, (0, b), (pc, 2 * b))[:, None]
                else:
                    fr = lax.slice(rim, (0, 0, 0), (pc, cf, b))
                    fi = lax.slice(rim, (0, 0, b), (pc, cf, 2 * b))
                xr, xi = x[0], x[1]
                acc_ref[0] += jnp.sum(xr * fr - xi * fi, axis=0)
                acc_ref[1] += jnp.sum(xr * fi + xi * fr, axis=0)

            if sparse:
                @pl.when(frow_ref[j] == 1)
                def _():
                    accumulate()
            else:
                accumulate()
            return carry

        lax.fori_loop(0, nloop, body, 0)

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
            scale_pad = jnp.concatenate(
                [scale, jnp.ones((cpad - c,), jnp.float32)]
            )
            sclrow[...] = scale_pad[None, None]
            scl_wr = pltpu.make_async_copy(
                sclrow, scl_out.at[pl.ds(pos, 1)], wr_sems.at[1]
            )
            scl_wr.start()
            scl_wr.wait()
        row_wr.wait()

    return kernel


def shift8_filter(filt_tiled):
    """[2P, B'] tiled filter plane -> [8, 2P, B']: copy r is the plane
    shifted up by r rows, so the kernel can DMA rotated rows at a
    sublane-aligned offset. Host-side numpy, built once at filter setup."""
    import numpy as np

    f = np.asarray(filt_tiled)
    if f.ndim == 3:
        f = f[:, 0]
    rows, b = f.shape
    pad = np.concatenate([f, np.zeros((8, b), f.dtype)], axis=0)
    return np.stack([pad[r : r + rows] for r in range(8)])


@functools.partial(
    jax.jit, static_argnames=("shared_filter", "interpret")
)
def fused_block_step(frame, fdl, filt_rim, pos, dcfix, cs, ab,
                     scales=None, sched=None, *, shared_filter,
                     interpret=False):
    """One fused streaming block step over the packed-layout ring FDL.

    frame   : [C, N] f32 (UPOLS sliding window / UPOLA zero-padded block)
    fdl     : [2, P, C, B] storage dtype (B = N // 2), ring layout
    filt_rim: lane-packed re|im tiled-reversed filter —
              shared_filter=True -> [8, 2P, 2B] (``shift8_filter`` of the
              packed plane); else [2P, C, 2B]. f32 or bf16 (storage-matched).
    pos     : int32 scalar ring write position
    dcfix   : [2, C] f32 exact DC/Nyquist accumulator values
    cs      : [2, N, B] forward packed-DFT matrices (cos | sin)
    ab      : [2, B, N] inverse packed-DFT matrices (1/N folded)
    scales  : [P, 1, C] f32 (int8/int16 storages only)
    sched   : optional (c_row [L] i32, f_row [L] i32) — THIS position's row
              of ``sparse_mac.build_chunk_schedule`` tables: the kernel
              visits only the listed partition chunks (chunk-granular
              sparsity; masked filter bins are already zero, so skipped
              chunks contribute exactly nothing).

    Returns (y [C, N] f32, new_fdl) or (y, new_fdl, new_scales).
    """
    interpret = interpret or _INTERPRET
    c, n = frame.shape
    _, p, _, b = fdl.shape
    cf = 1 if shared_filter else filt_rim.shape[1]
    dt = fdl.dtype
    quant = scales is not None
    int_max = float(_INT_MAX[jnp.dtype(dt)]) if quant else 0.0
    inv_max = 1.0 / int_max if quant else 1.0
    pc = fused_chunk_rows(dt, p, c, b)
    npc = p // pc
    n_sched = 0 if sched is None else int(sched[0].shape[0])
    # Scales are lane-padded to a 128 multiple: Mosaic requires the row
    # writeback slice (and VMEM loads) to be tile-aligned along lanes.
    cpad = -(-c // 128) * 128
    if quant:
        scales = jnp.pad(
            scales, ((0, 0), (0, 0), (0, cpad - c)), constant_values=1.0
        )

    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)

    kernel = _mk_kernel(
        npc=npc, pc=pc, p=p, c=c, cf=cf, b=b, cpad=cpad,
        quant=quant, shared=shared_filter,
        inv_max=inv_max, int_max=int_max, dt=dt, n_sched=n_sched,
    )

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    anym = pl.BlockSpec(memory_space=pl.ANY)
    # The filter planes MUST stay in HBM: the kernel DMAs rows at the
    # dynamic ring offset (P-1-pos), which is not sublane-aligned — a VMEM
    # placement cannot be row-sliced at arbitrary offsets, but the DMA
    # engine can (via the 8-shift copies).
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)

    in_specs = [smem, vmem, anym, hbm, vmem, anym, vmem]
    args = [pos_arr, frame, fdl, filt_rim, cs, ab, dcfix]
    if n_sched:
        in_specs += [smem, smem]
        args += [jnp.asarray(sched[0], jnp.int32),
                 jnp.asarray(sched[1], jnp.int32)]
    out_shape = [
        jax.ShapeDtypeStruct((c, n), jnp.float32),
        jax.ShapeDtypeStruct(fdl.shape, dt),
    ]
    out_specs = [vmem, anym]
    aliases = {2: 1}
    if quant:
        in_specs.append(vmem)  # scales: VMEM-resident, direct row loads
        args.append(scales)
        out_shape.append(jax.ShapeDtypeStruct((p, 1, cpad), jnp.float32))
        out_specs.append(hbm)
        aliases[len(args) - 1] = 2  # scales input (index shifts w/ sched)

    rshape = (pc, 2 * b) if shared_filter else (pc, cf, 2 * b)
    scratch = [
        pltpu.VMEM((2, 1, c, b), dt),                  # qrow (row-shaped)
        pltpu.VMEM((2, c, b), jnp.float32),            # acc
        pltpu.VMEM((2, b, n), ab.dtype),               # inverse matrices
        pltpu.VMEM((_SLOTS, 2, pc, c, b), dt),         # fdl chunk slots
        pltpu.VMEM((_SLOTS,) + rshape, filt_rim.dtype),  # filter slots
    ]
    if quant:
        scratch.append(pltpu.VMEM((1, 1, cpad), jnp.float32))  # scale row
    scratch.append(pltpu.SemaphoreType.DMA((_SLOTS, 2)))  # per-slot chunk sems
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
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * p * c * b + 4 * 2 * c * n * b,
            bytes_accessed=int(fdl.size) * jnp.dtype(dt).itemsize
            + 2 * p * 2 * b * filt_rim.dtype.itemsize
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
