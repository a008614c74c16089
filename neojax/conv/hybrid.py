"""Hybrid (two-stage, non-uniformly scheduled) convolution: the real-time
engine for long IRs.

The per-block convolver (``conv.convolver.step``) re-reads the whole
P-partition delay line every block — for a 10 s IR that is ~940 partitions
of traffic per 512-sample block, two orders of magnitude more than the
head of the filter actually due *this* block. This module splits the
filter the way real-time convolution engines do (Gardner-style two-stage
scheduling, which the reference does not implement — its convolvers are
uniform only, ``uniform_partitioned_convolver.hpp``):

  head  —  partitions j in [0, S): a normal per-block FDL ring over just
           S partitions (``conv.fdl`` machinery), evaluated every block;
  tail  —  partitions j >= S: handled by the nested/two-level engine
           (``conv.nested``), whose meta-partitions q >= 1 depend only on
           *completed* chunks — so the whole tail contribution to chunk
           m+1 is computed once, at the end of chunk m, and handed to the
           head as S precomputed spectrum frames.

Per block the engine does: rfft -> head-ring insert -> S-partition MAC ->
add the precomputed tail frame -> irfft. Latency is the block size B —
identical to the per-block path — while the tail runs at 1/S the rate on
the meta-FFT machinery. Output is mathematically identical to the uniform
UPOLS schedule (head sum + tail sum = full partition sum; linearity).

Storage ladder as elsewhere: "split" (f32, exact), "bf16", "int8"/"int16"
(head FDL quantized per-channel like ``conv.fdl``; tail meta-FDL per-(c,k)
like ``conv.nested``). Shared and per-channel filters both supported.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from neojax.conv import fdl as fdl_lib
from neojax.conv import nested as nested_lib
from neojax.conv.convolver import PartitionedConfig, _canon_partitions
from neojax.conv.nested import _fft_precisions
from neojax.fft import matmul_backend
from neojax.ops.quantize import int_max_for

__all__ = [
    "hybrid_filter_params",
    "hybrid_init_state",
    "process_hybrid",
]


def hybrid_filter_params(
    config: PartitionedConfig,
    partitions,
    chunk_blocks: int,
    mask=None,
) -> dict:
    """Split the partitioned filter into head (< S) and tail (>= S) params.

    ``partitions``: [P, K], [1, P, K] or [C, P, K] complex spectra.
    ``chunk_blocks`` (S): head depth = tail scheduling period.
    """
    s = chunk_blocks
    filt = _canon_partitions(config, np.asarray(partitions)).astype(np.complex64)
    p = filt.shape[0]
    if mask is not None:
        m = np.asarray(mask, bool)
        if m.ndim == 2:
            m = m[None]
        m = np.moveaxis(m, 0, 1)
        if m.shape[0] < p:
            m = np.concatenate(
                [m, np.zeros((p - m.shape[0],) + m.shape[1:], bool)], axis=0
            )
        filt = np.where(np.broadcast_to(m, filt.shape), filt, 0)

    head = filt[:s] if p >= s else np.concatenate(
        [filt, np.zeros((s - p,) + filt.shape[1:], filt.dtype)], axis=0
    )
    params: dict = {}
    # head: ring layout, tile-reversed filter (conv.fdl trick)
    hr = np.real(head).astype(np.float32)
    hi = np.imag(head).astype(np.float32)
    params["head_re"] = jnp.asarray(np.concatenate([hr[::-1], hr[::-1]], axis=0))
    params["head_im"] = jnp.asarray(np.concatenate([hi[::-1], hi[::-1]], axis=0))

    if p > s:
        tail = np.moveaxis(filt[s:], 0, 1)  # back to [C', P-S, K]
        tail_cfg_parts = tail
        # nested params over the tail partitions (meta-partition q' covers
        # original j in [S(q'+1), S(q'+2)))
        import dataclasses

        tail_config = dataclasses.replace(config, num_partitions=p - s)
        params["tail"] = nested_lib.nested_filter_params(
            tail_config, tail_cfg_parts, s
        )
    return params


def _head_storage_init(config, s):
    return fdl_lib.fdl_init("split" if config.storage == "dense" else config.storage,
                            s, config.channels, config.num_bins)


def hybrid_init_state(config: PartitionedConfig, params: dict) -> dict:
    c = config.channels
    k = config.num_bins
    s = params["head_re"].shape[0] // 2
    state = {
        "btail": jnp.zeros((c, config.block_size), jnp.float32),
        "head_fdl": _head_storage_init(config, s),
        "head_pos": jnp.zeros((), jnp.int32),
    }
    if "tail" in params:
        # only the meta ring (+ pos/scales) of the nested engine is needed:
        # the block-tail / prev-spectra bookkeeping is owned by the head.
        p2t, s_t, _ = nested_lib._static_dims(params["tail"])
        dtype = nested_lib._storage_dtype(config)
        state["meta_fdl"] = jnp.zeros((2, p2t, c, k, 2 * s_t), dtype)
        state["meta_pos"] = jnp.zeros((), jnp.int32)
        if config.storage in ("int8", "int16"):
            state["meta_scales"] = jnp.ones(
                (p2t, c, k, nested_lib._quant_groups(config, s_t)), jnp.float32
            )
        prev_dtype = jnp.bfloat16 if config.storage == "bf16" else jnp.float32
        state["prev_spec"] = jnp.zeros((2, c, k, s), prev_dtype)
        state["tail_frames"] = jnp.zeros((2, c, k, s), jnp.float32)
    return state


def process_hybrid(
    config: PartitionedConfig,
    params: dict,
    state: dict,
    signal: jnp.ndarray,
):
    """Stream [C, T] (or [T]) with per-block (B-sample) latency.

    T is padded to a multiple of S*B (output trimmed; returned state
    reflects the padded stream, like the other multi-block engines).
    """
    b = config.block_size
    n = config.transform_size
    k = config.num_bins
    s = params["head_re"].shape[0] // 2
    has_tail = "tail" in params
    quant = config.storage in ("int8", "int16")
    imax = int_max_for(fdl_lib.STORAGE_DTYPES[config.storage]) if quant else None
    fwd_prec, inv_prec = _fft_precisions(config)

    signal = jnp.asarray(signal, jnp.float32)
    squeeze = signal.ndim == 1
    if squeeze:
        signal = signal[None]
    c, t_len = signal.shape

    num_chunks = -(-t_len // (s * b))
    padded = jnp.pad(signal, ((0, 0), (0, num_chunks * s * b - t_len)))
    chunks = jnp.moveaxis(padded.reshape(c, num_chunks, s, b), (1, 2), (0, 1))

    head_re = params["head_re"]
    head_im = params["head_im"]
    if has_tail:
        tail_re = params["tail"]["filt_re"]
        tail_im = params["tail"]["filt_im"]
        p2t, _, tail_shared = nested_lib._static_dims(params["tail"])
        # hoisted out of the scan (in-trace generation is not loop-hoisted)
        meta_mf, meta_mi_tail = nested_lib._meta_gemm_mats(s)

    rf_cat = matmul_backend.rfft_cat_matrices(n)
    irf_cat = matmul_backend.irfft_cat_matrices(n)

    def block_step(carry, block):
        btail, hfdl, hpos, tail_frames, r = carry
        frame = jnp.concatenate([btail, block], axis=-1)  # [C, 2B] (upols)
        sre, sim = matmul_backend.rfft_split_cat(frame, n, fwd_prec, mats=rf_cat)

        hfdl = fdl_lib.fdl_ring_push_split(hfdl, sre, sim, hpos)
        fr = fdl_lib.rotated_filter(head_re, hpos, s)
        fi = fdl_lib.rotated_filter(head_im, hpos, s)
        acc_re, acc_im = fdl_lib.fdl_mac_split(hfdl, fr, fi)

        if has_tail:
            acc_re = acc_re + tail_frames[0, :, :, r].reshape(c, k)
            acc_im = acc_im + tail_frames[1, :, :, r].reshape(c, k)

        y = matmul_backend.irfft_split_cat(acc_re, acc_im, n, inv_prec, mats=irf_cat)
        out = y[..., b:]
        # head-only configs never read the spectra; skip the dead stores
        ys = (out, jnp.stack([sre, sim])) if has_tail else out
        return (block, hfdl, (hpos + 1) % s, tail_frames, r + 1), ys

    def chunk_step(carry, chunk):  # chunk [S, C, B]
        btail, hfdl, hpos, mstate = carry
        tail_frames = mstate["tail_frames"] if has_tail else jnp.zeros(
            (2, c, k, 0), jnp.float32
        )

        carry_in = (btail, hfdl, hpos, tail_frames, jnp.zeros((), jnp.int32))
        if has_tail:
            (btail, hfdl, hpos, _, _), (outs, specs) = lax.scan(
                block_step, carry_in, chunk
            )
            # specs: [S, 2, C, K] block spectra of this chunk
        else:
            (btail, hfdl, hpos, _, _), outs = lax.scan(block_step, carry_in, chunk)

        new_mstate = mstate
        if has_tail:
            cur = jnp.moveaxis(specs, 0, -1)  # [2, C, K, S]
            prev = mstate["prev_spec"]
            # lane-packed [re | im] meta-FFT: one GEMM (nested._meta_gemm_mats)
            wpk = jnp.concatenate(
                [
                    prev[0],
                    cur[0].astype(prev.dtype),
                    prev[1],
                    cur[1].astype(prev.dtype),
                ],
                axis=-1,
            ).astype(jnp.float32)
            x = matmul_backend._matmul(wpk, meta_mf, fwd_prec)
            xre = x[..., : 2 * s]
            xim = x[..., 2 * s :]

            mfdl = mstate["meta_fdl"]
            mpos = mstate["meta_pos"]
            z = jnp.zeros((), mpos.dtype)
            row_f = jnp.stack([xre, xim])
            if quant:
                # group-refined meta-bin scales (see nested._QUANT_GROUPS)
                g = nested_lib._quant_groups(config, s)
                gs = 2 * s // g
                grp = row_f.reshape(2, c, k, g, gs)
                peak = jnp.max(jnp.abs(grp), axis=(0, 4))  # [C, K, G]
                scale = jnp.where(peak > 0, peak, 1.0)
                q = jnp.clip(
                    jnp.round(grp / scale[None, :, :, :, None] * imax),
                    -imax, imax,
                ).astype(mfdl.dtype).reshape(2, c, k, 2 * s)
                mfdl = lax.dynamic_update_slice(mfdl, q[:, None], (z, mpos, z, z, z))
                mscales = lax.dynamic_update_slice(
                    mstate["meta_scales"], scale[None], (mpos, z, z, z)
                )
            else:
                mfdl = lax.dynamic_update_slice(
                    mfdl, row_f.astype(mfdl.dtype)[:, None], (z, mpos, z, z, z)
                )
                mscales = None

            # MAC over the tail meta-partitions. Tail meta-filter index q'
            # multiplies the window q'+1 chunks old: at this chunk's end the
            # newest ring entry (age 0) is the window we just inserted, and
            # the *next* chunk's tail needs ages 0..P2t-1 against F[0..].
            if tail_shared:
                fre = lax.dynamic_slice_in_dim(tail_re, p2t - 1 - mpos, p2t, axis=0)
                fim = lax.dynamic_slice_in_dim(tail_im, p2t - 1 - mpos, p2t, axis=0)
                xr = mfdl[0].astype(jnp.float32)
                xi = mfdl[1].astype(jnp.float32)
                fr2 = fre.astype(jnp.float32)
                fi2 = fim.astype(jnp.float32)
                dq = mscales
            else:
                ages = jnp.mod(mpos - jnp.arange(p2t), p2t)
                xr = mfdl[0][ages].astype(jnp.float32)
                xi = mfdl[1][ages].astype(jnp.float32)
                fr2 = tail_re.astype(jnp.float32)
                fi2 = tail_im.astype(jnp.float32)
                dq = mscales[ages] if quant else None
            if quant:
                g = nested_lib._quant_groups(config, s)
                gs = 2 * s // g
                dqv = (dq * (1.0 / imax))[..., None]  # [P2t, C, K, G, 1]
                xr = (xr.reshape(p2t, c, k, g, gs) * dqv).reshape(p2t, c, k, 2 * s)
                xi = (xi.reshape(p2t, c, k, g, gs) * dqv).reshape(p2t, c, k, 2 * s)
            acc_re = jnp.sum(xr * fr2 - xi * fi2, axis=0)  # [C, K, 2S]
            acc_im = jnp.sum(xr * fi2 + xi * fr2, axis=0)

            accp = jnp.concatenate([acc_re, acc_im], axis=-1)
            yt = matmul_backend._matmul(accp, meta_mi_tail, fwd_prec)
            new_tail_frames = jnp.stack(
                [yt[..., :s], yt[..., s:]]
            )  # [2, C, K, S] (1/2S folded into the matrix)

            new_mstate = {
                "meta_fdl": mfdl,
                "meta_pos": jnp.mod(mpos + 1, p2t),
                "prev_spec": cur.astype(prev.dtype),
                "tail_frames": new_tail_frames,
            }
            if quant:
                new_mstate["meta_scales"] = mscales

        return (btail, hfdl, hpos, new_mstate), outs

    mstate0 = {}
    if has_tail:
        mstate0 = {
            "meta_fdl": state["meta_fdl"],
            "meta_pos": state["meta_pos"],
            "prev_spec": state["prev_spec"],
            "tail_frames": state["tail_frames"],
        }
        if quant:
            mstate0["meta_scales"] = state["meta_scales"]

    (btail, hfdl, hpos, mstate), outs = lax.scan(
        chunk_step,
        (state["btail"], state["head_fdl"], state["head_pos"], mstate0),
        chunks,
    )
    out = (
        jnp.moveaxis(outs, (0, 1), (1, 2))
        .reshape(c, num_chunks * s * b)[:, :t_len]
    )
    new_state = {"btail": btail, "head_fdl": hfdl, "head_pos": hpos}
    if has_tail:
        new_state.update(
            {
                "meta_fdl": mstate["meta_fdl"],
                "meta_pos": mstate["meta_pos"],
                "prev_spec": mstate["prev_spec"],
                "tail_frames": mstate["tail_frames"],
            }
        )
        if quant:
            new_state["meta_scales"] = mstate["meta_scales"]
    if squeeze:
        out = out[0]
    return new_state, out
