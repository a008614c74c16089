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

Pipeline shape (measured on v5e): FDL chunks stream through up to four
VMEM slots (1 MB chunks pipeline best; wide configs shrink the slot
count to bound VMEM), the rotated filter rides ONE DMA per chunk (re|im
planes packed along lanes), and rings small enough for VMEM stay
RESIDENT across the whole stream. Quantization scales are a
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

__all__ = [
    "fused_block_step",
    "fused_stream",
    "fused_chunk_rows",
    "shift8_filter",
]

# Target bytes per FDL chunk DMA (per buffer slot). Small chunks pipeline
# better (r5 same-claim slope ladder at the headline config: 4 MB -> 1 MB
# chunks took bf16 P=960 from 179.0 to 175.3 us/block, 0.874 -> 0.893 of
# spec roofline; 8 MB was WORSE at 184); 8 rows is the floor — the shared
# 8-shift rim DMA slices rows at 8-aligned offsets.
_CHUNK_TARGET = 1024 * 1024

# FDL chunk buffer slots (in-flight DMA depth + 1 in compute). Wide
# configs whose chunks are large shrink the slot count so chunk scratch
# stays within the VMEM budget (see _slots_for).
_SLOTS = 4
_SLOT_BYTES_MAX = 32 * 1024 * 1024


def _slots_for(chunk_bytes: int) -> int:
    return max(2, min(_SLOTS, _SLOT_BYTES_MAX // max(1, chunk_bytes)))

# CPU tests flip this to run the kernel in interpreter mode through the
# full convolver path (clear jax caches after flipping back).
_INTERPRET = False

# Rings at or under this many bytes stay VMEM-RESIDENT across the whole
# stream (loaded once, updated in place by the per-step insert): the MAC
# then reads VMEM instead of re-streaming the ring from HBM every block.
# This is the small-P fast path — the hybrid engine's S-row head ring and
# shallow-IR configs — worth ~3x at S=64 f32 (r5). Dense schedules only
# (the sparse lane-width path keeps streaming).
_RESIDENT_MAX = 24 * 1024 * 1024


def fused_chunk_rows(dtype, p: int, c: int, b: int) -> int:
    """Partition rows per chunk: ~_CHUNK_TARGET slots, exact divisor of P,
    preferring multiples of 8 (the shared rim DMA's sublane alignment)."""
    bytes_per_row = 2 * c * b * jnp.dtype(dtype).itemsize
    cap = max(1, min(p, _CHUNK_TARGET // max(1, bytes_per_row)))
    if p % 8 == 0:
        cap = max(cap, 8)  # alignment floor for the 8-shift rim slices
        for d in range(cap - cap % 8, 7, -8):
            if p % d == 0:
                return d
    for d in range(cap, 0, -1):
        if p % d == 0:
            return d
    return 1


def _dot(a, bm):
    # HIGHEST (6-pass) for f32 operands; bf16 operands are the 1-pass
    # storage-matched precision and reject an explicit fp32 contract.
    # (A 3-pass bf16x3 emulation was A/B'd in r5: identical speed on both
    # the P=960 stream and the P=32 floor — the kernel is DMA-bound, not
    # MXU-pass-bound — so the exact 6-pass form stays.)
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
               n_sched: int = 0, slots: int = _SLOTS):
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
        # pipeline branch-free); dense mode: chunk j. Entries may carry a
        # lane-width code in bits 16+ (the stream kernel's lane skipping);
        # this per-block kernel ignores it (full-width DMA is always
        # correct — masked filter bins are zero).
        def chunk_of(j):
            return (crow_ref[j] & 0xFFFF) if sparse else j

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
            slot = lax.rem(j, slots)

            @pl.when(j + 2 < nloop)
            def _():
                start_chunk(lax.rem(j + 2, slots), j + 2)

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
    slots = _slots_for(2 * pc * c * b * jnp.dtype(dt).itemsize)
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
        slots=slots,
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
        pltpu.VMEM((slots, 2, pc, c, b), dt),          # fdl chunk slots
        pltpu.VMEM((slots,) + rshape, filt_rim.dtype),  # filter slots
    ]
    if quant:
        scratch.append(pltpu.VMEM((1, 1, cpad), jnp.float32))  # scale row
    scratch.append(pltpu.SemaphoreType.DMA((slots, 2)))  # per-slot chunk sems
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


# --------------------------------------------------------------------------
# Whole-stream fused kernel: grid over blocks, constants loaded ONCE.
#
# The per-call ``fused_block_step`` re-reads the DFT matrices every block
# (~8 MB) and pays XLA glue around each pallas_call; at the headline config
# those fixed costs are ~60 us of a ~235 us block. This kernel runs the
# WHOLE scan inside one pallas_call with grid=(nb,):
#
#   - cs / ab-tail matrices are VMEM inputs with constant index maps —
#     Pallas's revisiting rule fetches them exactly once;
#   - the UPOLS sliding window is a manual double-buffered DMA straight out
#     of [tail | signal] (overlapping windows cannot be BlockSpec'd);
#   - the DC/Nyquist lane-0 fixup for EVERY block is precomputed outside as
#     one depthwise convolution along the block axis (the side-carry is a
#     linear recurrence over per-block sums — no scan needed);
#   - the FDL ring (and quant scale table) lives in HBM/VMEM across steps,
#     input-output aliased; step i's row write is drained before step i+1's
#     first chunk DMA starts, so cross-step reads are race-free;
#   - the inverse transform uses only the LAST-B columns of the inverse
#     matrices (UPOLS discards the head), halving that matmul and read.
#
# Sparse chunk schedules ride along: rows for steps i and i+1 arrive as a
# (2, L) SMEM block per step (i+1's row is needed to prefetch its first
# chunks before the grid advances).
# --------------------------------------------------------------------------


def _rem(a, b):
    """Dtype-safe modulo (interpret mode traces indices as int64)."""
    a = jnp.asarray(a)
    return lax.rem(a, jnp.asarray(b, a.dtype))


def _mk_stream_kernel(*, nb: int, npc: int, pc: int, p: int, c: int, cf: int,
                      b: int, cpad: int, quant: bool, shared: bool,
                      inv_max: float, int_max: float, dt, n_sched: int,
                      widths: tuple, has_acc: bool, interpret_seed: bool,
                      resident: bool = False, slots: int = _SLOTS):
    sparse = n_sched > 0
    n = 2 * b

    def kernel(pos0_ref, sig_any, fdl_any, rim_any, cs_ref, abt_ref,
               dcfix_ref, *rest):
        if has_acc:
            accadd_ref, *rest = rest  # (1, 2, C, B) per-step accumulator seed
        else:
            accadd_ref = None
        if sparse:
            crow_ref, *rest = rest  # (1, 2, L) block: rows for steps i, i+1
            ncnt_ref, *rest = rest  # (1, 1, 2) block: active counts i, i+1
        else:
            crow_ref = ncnt_ref = None
        if quant:
            (scl_in, out_ref, fdl_out, scl_out, winbuf, qrow_ref, acc_ref,
             sclbuf, fdlbuf, rimbuf, win_sems, dma_sems, wr_sems) = rest
        else:
            (out_ref, fdl_out, winbuf, qrow_ref, acc_ref,
             fdlbuf, rimbuf, win_sems, dma_sems, wr_sems) = rest
            scl_in = scl_out = sclbuf = None

        i = pl.program_id(0)
        pos = _rem(pos0_ref[0] + i, p)
        # Sparse rows are flag-sorted (1s then 0s): the dynamic trip count
        # skips the pad entries' DMAs entirely.
        if sparse:
            nloop = ncnt_ref[0, 0, 0]
            nloop_next = ncnt_ref[0, 0, 1]
        else:
            nloop = npc
            nloop_next = npc

        def chunk_of(row, jj):
            """(chunk index, width code) of loop slot jj. Schedule entries
            carry a lane-width code in bits 16+ (``build_chunk_schedule``
            with lanes=B): only the first widths[code] lanes of the chunk
            are live — the perceptual (bin-structured) mask's fast path."""
            if not sparse:
                return jj, jnp.zeros((), jnp.int32)
            v = jnp.asarray(crow_ref[0, row, jj])
            # dtype-safe (interpret mode traces indices as int64)
            return v & jnp.asarray(0xFFFF, v.dtype), lax.shift_right_logical(
                v, jnp.asarray(16, v.dtype)
            )

        def rot_params(pos_v):
            fstart = p - 1 - pos_v
            if shared:
                r8 = _rem(fstart, 8)
                return fstart, r8, fstart - r8
            return fstart, None, None

        def fdl_copy(slot, cj, wd):
            return pltpu.make_async_copy(
                fdl_out.at[:, pl.ds(cj * pc, pc), :, pl.ds(0, wd)],
                fdlbuf.at[slot, :, :, :, pl.ds(0, wd)],
                dma_sems.at[slot, 0],
            )

        def fdl_res_copy():
            # resident mode: the WHOLE ring lives in VMEM across steps —
            # loaded once here, kept current by the per-step insert below.
            return pltpu.make_async_copy(fdl_out, fdlbuf, dma_sems.at[0, 0])

        def rim_copies(slot, cj, wd, fstart, r8, base):
            # Dense mode reads the full [0, 2B) lane range: ONE DMA for the
            # packed re|im plane (the split re/im copies exist only for the
            # sparse lane-width path, whose live lanes are a [0, wd) prefix
            # of each half).
            if not sparse:
                if shared:
                    off = pl.multiple_of(base + cj * pc, 8)
                    src = rim_any.at[r8, pl.ds(off, pc)]
                    dst = rimbuf.at[slot]
                else:
                    src = rim_any.at[pl.ds(fstart + cj * pc, pc)]
                    dst = rimbuf.at[slot]
                return (
                    pltpu.make_async_copy(src, dst, dma_sems.at[slot, 1]),
                )
            if shared:
                off = pl.multiple_of(base + cj * pc, 8)
                src_re = rim_any.at[r8, pl.ds(off, pc), pl.ds(0, wd)]
                src_im = rim_any.at[r8, pl.ds(off, pc), pl.ds(b, wd)]
                dst_re = rimbuf.at[slot, :, pl.ds(0, wd)]
                dst_im = rimbuf.at[slot, :, pl.ds(b, wd)]
            else:
                rows_s = pl.ds(fstart + cj * pc, pc)
                src_re = rim_any.at[rows_s, :, pl.ds(0, wd)]
                src_im = rim_any.at[rows_s, :, pl.ds(b, wd)]
                dst_re = rimbuf.at[slot, :, :, pl.ds(0, wd)]
                dst_im = rimbuf.at[slot, :, :, pl.ds(b, wd)]
            return (
                pltpu.make_async_copy(src_re, dst_re, dma_sems.at[slot, 1]),
                pltpu.make_async_copy(src_im, dst_im, dma_sems.at[slot, 2]),
            )

        def _for_width(wc, fn):
            """Run fn(width) under pl.when for each static width (DMA
            slices must be static; the code picks the branch)."""
            if len(widths) == 1:
                fn(widths[0])
                return
            for ci, wd in enumerate(widths):
                @pl.when(wc == ci)
                def _(wd=wd):
                    fn(wd)

        def start_chunk(slot, row, jj, rot):
            cj, wc = chunk_of(row, jj)

            def go(wd):
                if not resident:
                    fdl_copy(slot, cj, wd).start()
                for cp in rim_copies(slot, cj, wd, *rot):
                    cp.start()

            _for_width(wc, go)

        def wait_chunk(slot, row, jj):
            cj, wc = chunk_of(row, jj)
            z = jnp.zeros((), jnp.int32)
            rot0 = (z, z, z) if shared else (z, None, None)

            def go(wd):
                if not resident:
                    fdl_copy(slot, cj, wd).wait()
                for cp in rim_copies(slot, cj, wd, *rot0):
                    cp.wait()

            _for_width(wc, go)

        rot_i = rot_params(pos)

        def win_dma(slot, j):
            return pltpu.make_async_copy(
                sig_any.at[:, pl.ds(j * b, n)], winbuf.at[slot],
                win_sems.at[slot],
            )

        # Step 0: kick off everything this step needs + load scales.
        @pl.when(i == 0)
        def _():
            if interpret_seed:
                # interpret mode does not alias input/output buffers;
                # seed the output ring from the input explicitly.
                seed = pltpu.make_async_copy(fdl_any, fdl_out, wr_sems.at[0])
                seed.start()
                seed.wait()
            win_dma(0, 0).start()
            if resident:
                cp0 = fdl_res_copy()
                cp0.start()
                cp0.wait()
            start_chunk(0, 0, 0, rot_i)
            if sparse:
                @pl.when(nloop > 1)
                def _():
                    start_chunk(1, 0, 1, rot_i)
            elif npc > 1:
                start_chunk(1, 0, 1, rot_i)
            if quant:
                cp = pltpu.make_async_copy(scl_in, sclbuf, wr_sems.at[1])
                cp.start()
                cp.wait()

        @pl.when(i + 1 < nb)
        def _():
            win_dma(_rem(i + 1, 2), i + 1).start()

        win_dma(_rem(i, 2), i).wait()

        # ---- forward rfft (packed) on the MXU: ONE [C, N] @ [N, 2B] GEMM
        # (cos|sin lane-packed — half the matmul issues of two [N, B] dots)
        frame = winbuf[_rem(i, 2)].astype(cs_ref.dtype)
        spec = _dot(frame, cs_ref[...])  # [C, 2B] f32 accum
        spec_re = lax.slice(spec, (0, 0), (c, b))
        spec_im = lax.slice(spec, (0, b), (c, 2 * b))

        # ---- quantize + ring insert at row `pos`
        if quant:
            peak = jnp.maximum(
                jnp.max(jnp.abs(spec_re), axis=-1),
                jnp.max(jnp.abs(spec_im), axis=-1),
            )
            scale = jnp.where(peak > 0, peak, 1.0)
            q = jnp.stack([spec_re, spec_im]) / scale[None, :, None] * int_max
            qrow = jnp.clip(jnp.round(q), -int_max, int_max).astype(dt)
        else:
            scale = None
            qrow = jnp.stack([spec_re, spec_im]).astype(dt)
        qrow_ref[...] = qrow[:, None]

        row_wr = pltpu.make_async_copy(
            qrow_ref, fdl_out.at[:, pl.ds(pos, 1)], wr_sems.at[0]
        )
        row_wr.start()
        if resident:
            fdlbuf[:, pl.ds(pos, 1)] = qrow_ref[...]
        if quant:
            scale_pad = jnp.concatenate(
                [scale, jnp.ones((cpad - c,), jnp.float32)]
            )
            sclbuf[pl.ds(pos, 1)] = scale_pad[None]

        # ---- MAC-reduce over (scheduled) partition chunks; the optional
        # acc_add input seeds the accumulator (the hybrid engine injects
        # its chunk-rate tail contribution here — linearity of the sum)
        if has_acc:
            acc_ref[...] = accadd_ref[0]
        else:
            acc_ref[...] = jnp.zeros((2, c, b), jnp.float32)

        def body(j, carry):
            slot = _rem(j, slots)

            @pl.when(j + 2 < nloop)
            def _():
                start_chunk(_rem(j + 2, slots), 0, j + 2, rot_i)

            wait_chunk(slot, 0, j)
            cj, wc = chunk_of(0, j)
            if not resident:
                in_chunk = jnp.logical_and(pos >= cj * pc, pos < (cj + 1) * pc)
                local = pos - cj * pc

                @pl.when(in_chunk)
                def _():
                    fdlbuf[slot, :, pl.ds(local, 1)] = qrow_ref[...]

            def accumulate(wd):
                if resident:
                    x = fdlbuf[
                        :, pl.ds(cj * pc, pc), :, pl.ds(0, wd)
                    ].astype(jnp.float32)
                else:
                    x = fdlbuf[slot, :, :, :, pl.ds(0, wd)].astype(jnp.float32)
                if quant:
                    s = lax.slice(
                        sclbuf[pl.ds(cj * pc, pc)], (0, 0), (pc, c)
                    )  # [pc, C] (freshly updated row included)
                    x = x * (s * inv_max)[None, :, :, None]
                if shared:
                    fr = rimbuf[slot, :, pl.ds(0, wd)].astype(jnp.float32)[:, None]
                    fi = rimbuf[slot, :, pl.ds(b, wd)].astype(jnp.float32)[:, None]
                else:
                    fr = rimbuf[slot, :, :, pl.ds(0, wd)].astype(jnp.float32)
                    fi = rimbuf[slot, :, :, pl.ds(b, wd)].astype(jnp.float32)
                xr, xi = x[0], x[1]
                acc_ref[0, :, pl.ds(0, wd)] += jnp.sum(xr * fr - xi * fi, axis=0)
                acc_ref[1, :, pl.ds(0, wd)] += jnp.sum(xr * fi + xi * fr, axis=0)

            _for_width(wc, accumulate)
            return carry

        lax.fori_loop(0, nloop, body, 0, unroll=False)

        # Drain the row write, then pre-start step i+1's first chunks (the
        # ordering makes cross-step FDL reads race-free).
        row_wr.wait()

        @pl.when(i + 1 < nb)
        def _():
            pos_n = _rem(pos + 1, p)
            rot_n = rot_params(pos_n)
            start_chunk(0, 1, 0, rot_n)
            if sparse:
                @pl.when(nloop_next > 1)
                def _():
                    start_chunk(1, 1, 1, rot_n)
            elif npc > 1:
                start_chunk(1, 1, 1, rot_n)

        # ---- exact DC/Nyquist lane-0 overwrite (precomputed outside)
        dcfix = dcfix_ref[0]  # [2, C]
        lane0 = lax.broadcasted_iota(jnp.int32, (c, b), 1) == 0
        acc_re = jnp.where(lane0, dcfix[0][:, None], acc_ref[0])
        acc_im = jnp.where(lane0, dcfix[1][:, None], acc_ref[1])

        # ---- inverse rfft, tail half only (UPOLS output block): ONE
        # [C, 2B] @ [2B, B] GEMM over the lane-packed accumulator
        accp = jnp.concatenate(
            [acc_re.astype(abt_ref.dtype), acc_im.astype(abt_ref.dtype)],
            axis=-1,
        )
        out_ref[...] = _dot(accp, abt_ref[...])

        # ---- write back the scale table on the last step
        if quant:
            @pl.when(i == nb - 1)
            def _():
                cp = pltpu.make_async_copy(sclbuf, scl_out, wr_sems.at[1])
                cp.start()
                cp.wait()

    return kernel


@functools.partial(
    jax.jit, static_argnames=("shared_filter", "interpret")
)
def fused_stream(sigpad, fdl, filt_rim, pos0, dcfix_all, cs, abt,
                 scales=None, sched=None, acc_add=None, *, shared_filter,
                 interpret=False):
    """Stream nb UPOLS blocks through ONE fused pallas_call (grid=(nb,)).

    sigpad   : [C, (nb+1)*B] f32 — [previous tail | signal]
    fdl      : [2, P, C, B] storage dtype, ring layout (aliased in place)
    filt_rim : as ``fused_block_step``
    pos0     : int32 ring write position of the FIRST block
    dcfix_all: [nb, 2, C] f32 — per-block exact DC/Nyquist accumulators
               (precomputed; see ``conv.convolver._dcfix_sequence``)
    cs       : [N, 2B] forward packed-DFT matrix, cos|sin lane-packed
               (ONE GEMM per block instead of two)
    abt      : [2B, B] inverse matrix, LAST-B columns only (tail half),
               the two planes row-packed (one GEMM)
    scales   : [P, cpad] f32 (int8/int16; cpad = 128-padded channels)
    sched    : optional ([nb, 2, L] c_idx, [nb, 1, 2] counts) —
               PRE-ROTATED chunk-schedule row PAIRS (entry [i, 0] is step
               i's row, [i, 1] step i+1's, dummy for the last step) and the
               active-entry count per row (Mosaic can only load scalars
               from SMEM, so the count rides along precomputed); see
               ``conv.convolver._process_fused_stream``.
    acc_add  : optional [nb, 2, C, B] f32 — per-step accumulator SEED
               (packed lanes; lane 0 irrelevant, the dcfix overwrite wins).
               The hybrid engine's precomputed chunk-rate tail sum enters
               the per-block head through this (sum linearity).

    Returns (out [C, nb*B], new_fdl) (+ new_scales [P, cpad] if quant).
    """
    interpret = interpret or _INTERPRET
    c = sigpad.shape[0]
    _, p, _, b = fdl.shape
    n = 2 * b
    nb = sigpad.shape[1] // b - 1
    cf = 1 if shared_filter else filt_rim.shape[1]
    dt = fdl.dtype
    quant = scales is not None
    int_max = float(_INT_MAX[jnp.dtype(dt)]) if quant else 0.0
    inv_max = 1.0 / int_max if quant else 1.0
    pc = fused_chunk_rows(dt, p, c, b)
    npc = p // pc
    slots = _slots_for(2 * pc * c * b * jnp.dtype(dt).itemsize)
    n_sched = 0 if sched is None else int(sched[0].shape[2])
    cpad = -(-c // 128) * 128

    from neojax.kernels.sparse_mac import lane_widths

    widths = tuple(lane_widths(b)) if n_sched else (b,)
    fdl_bytes = int(fdl.size) * jnp.dtype(dt).itemsize
    resident = n_sched == 0 and fdl_bytes <= _RESIDENT_MAX
    kernel = _mk_stream_kernel(
        nb=nb, npc=npc, pc=pc, p=p, c=c, cf=cf, b=b, cpad=cpad,
        quant=quant, shared=shared_filter,
        inv_max=inv_max, int_max=int_max, dt=dt, n_sched=n_sched,
        widths=widths, has_acc=acc_add is not None,
        interpret_seed=interpret, resident=resident, slots=slots,
    )

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    anym = pl.BlockSpec(memory_space=pl.ANY)
    hbm = pl.BlockSpec(memory_space=pltpu.HBM)
    const = lambda *shape: pl.BlockSpec(  # noqa: E731 — fetched once
        shape, lambda i: (0,) * len(shape)
    )

    pos_arr = jnp.asarray(pos0, jnp.int32).reshape(1)
    in_specs = [
        smem,                                   # pos0
        anym,                                   # sigpad (windowed manually)
        anym,                                   # fdl
        hbm,                                    # filt_rim
        const(n, 2 * b),                        # cs (loaded once, lane-packed)
        const(2 * b, b),                        # abt (loaded once, row-packed)
        pl.BlockSpec((1, 2, c), lambda i: (i, 0, 0)),  # dcfix rows
    ]
    args = [pos_arr, sigpad, fdl, filt_rim, cs, abt, dcfix_all]
    if acc_add is not None:
        in_specs.append(pl.BlockSpec((1, 2, c, b), lambda i: (i, 0, 0, 0)))
        args.append(jnp.asarray(acc_add, jnp.float32))
    if n_sched:
        # rows for steps i and i+1, PRE-PAIRED: blocks stride by their
        # shape, so overlapping (i, i+1) windows must be materialized as
        # [nb, 2, L] outside.
        srow = pl.BlockSpec(
            (1, 2, n_sched), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
        )
        # [nb, 1, 2] so the BLOCK's last two dims equal the array's
        scnt = pl.BlockSpec(
            (1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM
        )
        in_specs += [srow, scnt]
        args += [jnp.asarray(sched[0], jnp.int32),
                 jnp.asarray(sched[1], jnp.int32)]
    out_shape = [
        jax.ShapeDtypeStruct((c, nb * b), jnp.float32),
        jax.ShapeDtypeStruct(fdl.shape, dt),
    ]
    out_specs = [pl.BlockSpec((c, b), lambda i: (0, i)), anym]
    aliases = {2: 1}
    if quant:
        in_specs.append(anym)
        args.append(scales)
        out_shape.append(jax.ShapeDtypeStruct((p, cpad), jnp.float32))
        out_specs.append(anym)
        aliases[len(args) - 1] = 2

    rshape = (pc, 2 * b) if shared_filter else (pc, cf, 2 * b)
    scratch = [
        pltpu.VMEM((2, c, n), jnp.float32),            # window slots
        pltpu.VMEM((2, 1, c, b), dt),                  # qrow
        pltpu.VMEM((2, c, b), jnp.float32),            # acc
    ]
    if quant:
        scratch.append(pltpu.VMEM((p, cpad), jnp.float32))  # scale table
    scratch += [
        # resident mode: the whole ring as ONE VMEM buffer; else chunk slots
        pltpu.VMEM((2, p, c, b), dt)
        if resident
        else pltpu.VMEM((slots, 2, pc, c, b), dt),
        pltpu.VMEM((slots,) + rshape, filt_rim.dtype),  # filter slots
        pltpu.SemaphoreType.DMA((2,)),                 # window sems
        pltpu.SemaphoreType.DMA((slots, 3)),           # fdl / rim-re / rim-im
        pltpu.SemaphoreType.DMA((2,)),                 # row / scales sems
    ]

    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)
    return tuple(out)
