"""Partition-sharded nested (two-level FDL) engine: one big IR over many chips.

The nested engine (``conv.nested``) is the throughput path, but its
meta-FDL ``[2, P2, C, K, 2S]`` lives on ONE chip — a 60 s IR at 64
channels is ~1 GB of bf16 planes, and past a few minutes of IR it simply
does not fit. This module shards the **meta-partition axis** over the
mesh ``"part"`` axis (the partition-reduce axis of the reference's
convolver, ``uniform_partitioned_convolver.hpp:56-59``), composing with
``"ch"`` channel sharding:

  - device d owns meta-ages ``[d*L, (d+1)*L)`` (L = P2/D): a contiguous
    window of the IR's history, as a LOCAL ring of L rows;
  - per chunk, every device evicts its oldest row and hands it to device
    d+1 with ONE ``jax.lax.ppermute`` of a ``[2, C_local, K, 2S]`` row —
    the row ages by exactly one chunk in transit, which is exactly the
    age at which it enters the next device's window (the distributed form
    of ``fdl_index``'s modular schedule, ``fdl_index.hpp:24-36``);
  - device 0 inserts the freshly transformed meta-spectrum instead;
  - the meta MAC runs over the local L rows, then one ``psum`` over
    ``"part"`` reduces the accumulator (rides ICI);
  - forward/inverse transforms and the block-tail bookkeeping are
    replicated over ``"part"`` (identical on every part-device), so the
    scaling win is the meta-FDL read (the HBM-bound term) and, above all,
    **capacity**: per-device meta-FDL bytes fall as 1/D.

Quantized storages (int8/int16) hand the row's dynamic scale groups over
the same ppermute, so dequant semantics are identical to single-device
``conv.nested`` (``compressed_fdl.hpp:17`` lineage).

State/params here are the sharded flavor's own (the local rings arrange
rows differently than the single-device global ring); outputs match
``process_nested`` to f32 tolerance — asserted by the CPU-mesh test.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from neojax.conv import nested as nested_lib
from neojax.conv.convolver import PartitionedConfig, _canon_partitions
from neojax.fft import matmul_backend
from neojax.ops.quantize import int_max_for

__all__ = [
    "partnested_filter_params",
    "partnested_init_state",
    "PartShardedNested",
]


def partnested_filter_params(
    config: PartitionedConfig,
    partitions,
    chunk_blocks: int,
    num_shards: int,
    mask=None,
) -> dict:
    """Meta-filter params laid out for part-sharding: per device a
    tile-reversed LOCAL slice (rotation by the local ring position via
    ``dynamic_slice``, the ``conv.fdl`` trick), stacked so a global
    ``[(2L)*D, C', K, 2S]`` array shards to ``[2L, C', K, 2S]`` locally.

    ``partitions``: [P, K], [1, P, K] or [C, P, K] complex spectra.
    """
    filt = _canon_partitions(config, np.asarray(partitions)).astype(np.complex64)
    if mask is not None:
        m = np.asarray(mask, bool)
        if m.ndim == 2:
            m = m[None]
        m = np.moveaxis(m, 0, 1)
        if m.shape[0] < filt.shape[0]:
            pad = np.zeros((filt.shape[0] - m.shape[0],) + m.shape[1:], bool)
            m = np.concatenate([m, pad], axis=0)
        filt = np.where(np.broadcast_to(m, filt.shape), filt, 0)

    s = chunk_blocks
    fre, fim, p2 = nested_lib._meta_fft_filter(
        np.real(filt).astype(np.float32), np.imag(filt).astype(np.float32), s
    )
    # pad P2 up to a multiple of the shard count with zero meta-partitions
    if p2 % num_shards:
        pad = num_shards - (p2 % num_shards)
        z = np.zeros((pad,) + fre.shape[1:], fre.dtype)
        fre = np.concatenate([fre, z], axis=0)
        fim = np.concatenate([fim, z], axis=0)
        p2 += pad
    ell = p2 // num_shards

    def tile(f):  # [P2, C', K, 2S] -> [D * 2L, C', K, 2S]
        tiles = []
        for d in range(num_shards):
            local = f[d * ell : (d + 1) * ell][::-1]
            tiles.append(np.concatenate([local, local], axis=0))
        return np.concatenate(tiles, axis=0)

    dtype = jnp.bfloat16 if config.storage == "bf16" else jnp.float32
    return {
        "filt_re": jnp.asarray(tile(fre), dtype),
        "filt_im": jnp.asarray(tile(fim), dtype),
    }


def _dims(params: dict, num_shards: int) -> tuple[int, int, int]:
    """(p2, ell, s) from the tiled filter's static shapes."""
    rows = params["filt_re"].shape[0]  # D * 2L
    ell = rows // (2 * num_shards)
    s = params["filt_re"].shape[-1] // 2
    return ell * num_shards, ell, s


def partnested_init_state(
    config: PartitionedConfig, params: dict, num_shards: int
) -> dict:
    dtype = nested_lib._storage_dtype(config)
    c = config.channels
    k = config.num_bins
    p2, _, s = _dims(params, num_shards)
    prev_dtype = jnp.bfloat16 if config.storage == "bf16" else jnp.float32
    state = {
        "tail": jnp.zeros((c, config.block_size), jnp.float32),
        "prev": jnp.zeros((2, c, k, s), prev_dtype),
        "fdl": jnp.zeros((2, p2, c, k, 2 * s), dtype),
        "pos": jnp.zeros((), jnp.int32),
    }
    if config.storage in ("int8", "int16"):
        state["scales"] = jnp.ones(
            (p2, c, k, nested_lib._quant_groups(config, s)), jnp.float32
        )
    return state


class PartShardedNested:
    """Partition(+channel)-sharded ``process_nested`` over a
    ``Mesh({"part": D, "ch": Dc})``."""

    def __init__(self, config: PartitionedConfig, mesh: Mesh, chunk_blocks: int):
        self.config = config
        self.mesh = mesh
        self.s = chunk_blocks
        self.d_part = mesh.shape["part"]
        self.d_ch = mesh.shape.get("ch", 1)
        if config.channels % self.d_ch:
            raise ValueError(
                f"channels {config.channels} not divisible by mesh ch={self.d_ch}"
            )
        # the filter's channel dim shards over "ch" only when per-channel;
        # one jitted process per filter kind
        self._procs: dict[bool, object] = {}

    # -- sharding helpers --------------------------------------------------

    def _put(self, v, *spec):
        return jax.device_put(v, NamedSharding(self.mesh, P(*spec)))

    def shard_params(self, params: dict) -> dict:
        ch = "ch" if params["filt_re"].shape[1] > 1 else None
        return {k: self._put(v, "part", ch, None, None) for k, v in params.items()}

    def shard_state(self, state: dict) -> dict:
        out = {
            "tail": self._put(state["tail"], "ch", None),
            "prev": self._put(state["prev"], None, "ch", None, None),
            "fdl": self._put(state["fdl"], None, "part", "ch", None, None),
            "pos": self._put(state["pos"]),
        }
        if "scales" in state:
            out["scales"] = self._put(state["scales"], "part", "ch", None, None)
        return out

    # -- the sharded chunk pipeline ---------------------------------------

    def _build_process(self, per_channel: bool):
        cfg = self.config
        s = self.s
        b = cfg.block_size
        n = cfg.transform_size
        k = cfg.num_bins
        quant = cfg.storage in ("int8", "int16")
        imax = (
            int_max_for(nested_lib._storage_dtype(cfg)) if quant else None
        )
        fwd_prec, inv_prec = nested_lib._fft_precisions(cfg)
        lane_dt = jnp.bfloat16 if cfg.storage == "bf16" else jnp.float32
        c_local = cfg.channels // self.d_ch
        g = nested_lib._quant_groups(cfg, s)
        gs = 2 * s // g
        d_part = self.d_part

        def local_process(filt_re, filt_im, tail, prev, fdl, pos, scales, blocks):
            # local shapes: filt [2L, C'|1/Dc.., K, 2S]; fdl [2, L, Cl, K, 2S]
            ell = fdl.shape[1]
            part_idx = lax.axis_index("part")
            perm = [(i, (i + 1) % d_part) for i in range(d_part)]
            meta_mf, meta_mi_tail = nested_lib._meta_gemm_mats(s)
            rf_cat = matmul_backend.rfft_cat_matrices(n)
            irf_cat = matmul_backend.irfft_cat_matrices(n)
            prev_dtype = prev.dtype
            carry_dtype = fdl.dtype

            def chunk_step(carry, chunk):  # chunk [S, Cl, B]
                if quant:
                    tail, prev, fdl, pos, scales = carry
                else:
                    tail, prev, fdl, pos = carry
                    scales = None

                if cfg.scheme == "upols":
                    prev_blocks = jnp.concatenate([tail[None], chunk[:-1]], axis=0)
                    frames = jnp.concatenate([prev_blocks, chunk], axis=-1)
                    new_tail = chunk[-1]
                else:  # upola
                    frames = jnp.pad(chunk, ((0, 0), (0, 0), (0, n - b)))
                    new_tail = None

                sre, sim = matmul_backend.rfft_split_cat(
                    frames.astype(lane_dt), n, fwd_prec, mats=rf_cat
                )
                cur = jnp.stack(
                    [jnp.moveaxis(sre, 0, -1), jnp.moveaxis(sim, 0, -1)]
                ).astype(prev_dtype)  # [2, Cl, K, S]

                wdt = lane_dt if cfg.storage == "bf16" else jnp.float32
                wpk = jnp.concatenate(
                    [prev[0], cur[0], prev[1], cur[1]], axis=-1
                ).astype(wdt)
                x = matmul_backend._matmul(wpk, meta_mf, fwd_prec)
                row_f = jnp.stack([x[..., : 2 * s], x[..., 2 * s :]])

                # ring hand-off: evict the oldest local row -> next device;
                # device 0 inserts the fresh row, device d>0 the received one
                pos_l = jnp.mod(pos, ell)
                z = jnp.zeros((), pos.dtype)
                evict = lax.dynamic_slice(
                    fdl, (z, pos_l, z, z, z),
                    (2, 1, c_local, k, 2 * s),
                )  # [2, 1, Cl, K, 2S]
                recv = lax.ppermute(evict, "part", perm)
                if quant:
                    grp = row_f.reshape(2, c_local, k, g, gs)
                    peak = jnp.max(jnp.abs(grp), axis=(0, 4))  # [Cl, K, G]
                    my_scale = jnp.where(peak > 0, peak, 1.0)
                    q = jnp.clip(
                        jnp.round(grp / my_scale[None, :, :, :, None] * imax),
                        -imax, imax,
                    ).astype(carry_dtype).reshape(2, c_local, k, 2 * s)
                    evict_s = lax.dynamic_slice(
                        scales, (pos_l, z, z, z), (1, c_local, k, g)
                    )
                    recv_s = lax.ppermute(evict_s, "part", perm)
                    insert = jnp.where(part_idx == 0, q[:, None], recv)
                    insert_s = jnp.where(part_idx == 0, my_scale[None], recv_s)
                    fdl = lax.dynamic_update_slice(
                        fdl, insert, (z, pos_l, z, z, z)
                    )
                    scales = lax.dynamic_update_slice(
                        scales, insert_s, (pos_l, z, z, z)
                    )
                else:
                    insert = jnp.where(
                        part_idx == 0, row_f.astype(carry_dtype)[:, None], recv
                    )
                    fdl = lax.dynamic_update_slice(fdl, insert, (z, pos_l, z, z, z))

                # rotated local filter slice (tile-reversed layout)
                fre = lax.dynamic_slice_in_dim(
                    filt_re, ell - 1 - pos_l, ell, axis=0
                )
                fim = lax.dynamic_slice_in_dim(
                    filt_im, ell - 1 - pos_l, ell, axis=0
                )
                xr = fdl[0].astype(jnp.float32)
                xi = fdl[1].astype(jnp.float32)
                fr = fre.astype(jnp.float32)
                fi = fim.astype(jnp.float32)
                if quant:
                    dq = (scales * (1.0 / imax))[..., None]  # [L, Cl, K, G, 1]
                    xr = (xr.reshape(ell, c_local, k, g, gs) * dq).reshape(
                        ell, c_local, k, 2 * s
                    )
                    xi = (xi.reshape(ell, c_local, k, g, gs) * dq).reshape(
                        ell, c_local, k, 2 * s
                    )
                acc_re = jnp.sum(xr * fr - xi * fi, axis=0)  # [Cl, K, 2S]
                acc_im = jnp.sum(xr * fi + xi * fr, axis=0)
                acc_re = lax.psum(acc_re, "part")
                acc_im = lax.psum(acc_im, "part")

                accp = jnp.concatenate([acc_re, acc_im], axis=-1).astype(lane_dt)
                yt = matmul_backend._matmul(accp, meta_mi_tail, fwd_prec)
                yre = yt[..., :s].astype(lane_dt)
                yim = yt[..., s:].astype(lane_dt)
                y = matmul_backend.irfft_split_cat(
                    jnp.moveaxis(yre, -1, 0), jnp.moveaxis(yim, -1, 0), n,
                    inv_prec, mats=irf_cat,
                )  # [S, Cl, 2B]

                if cfg.scheme == "upols":
                    out = y[..., b:]
                else:
                    prev_tails = jnp.concatenate(
                        [tail[None], y[:-1, :, b:]], axis=0
                    )
                    out = y[..., :b] + prev_tails
                    new_tail = y[-1, :, b:]

                new_carry = (new_tail.astype(jnp.float32), cur, fdl, pos + 1)
                if quant:
                    new_carry = new_carry + (scales,)
                return new_carry, out.astype(jnp.float32)

            carry0 = (tail, prev, fdl, pos)
            if quant:
                carry0 = carry0 + (scales,)
            final, outs = lax.scan(chunk_step, carry0, blocks)
            new_scales = final[4] if quant else scales
            # outs [num_chunks, S, Cl, B] is identical on every part-device
            return final[0], final[1], final[2], final[3], new_scales, outs

        fspec = P("part", "ch" if per_channel else None, None, None)
        sharded = shard_map(
            local_process,
            mesh=self.mesh,
            in_specs=(
                fspec, fspec, P("ch", None), P(None, "ch", None, None),
                P(None, "part", "ch", None, None), P(),
                P("part", "ch", None, None), P(None, None, "ch", None),
            ),
            out_specs=(
                P("ch", None), P(None, "ch", None, None),
                P(None, "part", "ch", None, None), P(),
                P("part", "ch", None, None), P(None, None, "ch", None),
            ),
            check_vma=False,
        )

        def process(params, state, signal):
            signal = jnp.asarray(signal, jnp.float32)
            c, t_len = signal.shape
            num_chunks = -(-t_len // (s * b))
            padded = jnp.pad(signal, ((0, 0), (0, num_chunks * s * b - t_len)))
            blocks = jnp.moveaxis(
                padded.reshape(c, num_chunks, s, b), (1, 2), (0, 1)
            )
            scales = state.get("scales")
            if scales is None:  # placeholder keeps one shard_map signature
                scales = jnp.ones(
                    (state["fdl"].shape[1], cfg.channels, k,
                     nested_lib._quant_groups(cfg, s)),
                    jnp.float32,
                )
            tail, prev, fdl, pos, scales, outs = sharded(
                params["filt_re"], params["filt_im"], state["tail"],
                state["prev"], state["fdl"], state["pos"], scales, blocks,
            )
            out = jnp.moveaxis(outs, 2, 0).reshape(c, num_chunks * s * b)[
                :, :t_len
            ]
            new_state = {"tail": tail, "prev": prev, "fdl": fdl, "pos": pos}
            if quant:
                new_state["scales"] = scales
            return new_state, out

        return process

    # -- public ------------------------------------------------------------

    def process(self, params, state, signal):
        signal = jax.device_put(
            jnp.asarray(signal, jnp.float32),
            NamedSharding(self.mesh, P("ch", None)),
        )
        per_channel = params["filt_re"].shape[1] > 1
        if per_channel not in self._procs:
            self._procs[per_channel] = jax.jit(self._build_process(per_channel))
        return self._procs[per_channel](params, state, signal)
