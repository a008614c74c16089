"""Bandwidth-calibration artifact (VERDICT r3 #5, r5 slope protocol):
ROOFLINE_CAL.json.

One process, one chip claim, measurements on the production per-block
shapes ([2, 960, 64, 512] FDL, 64 ch, block 512):

  1. ``xla_stream``   — the XLA read-loop reference rate (8-array sum).
  2. ``dma_only``     — a Pallas kernel with the SAME BlockSpec chunking
     as the MAC kernel but compute stripped to one sublane row.
  3. ``mac_kernel``   — ``fdl_mac_pallas`` proper (DMA + VPU complex MAC).
  4. ``fused_stream`` — the whole production engine (``cv.process``,
     fused whole-stream kernel) for bf16/split/int8, plus the P=32
     fixed-cost floor rows.

r5 protocol change: every row is SLOPE-timed — two stream lengths per
config, per-iter = (wall2 - wall1) / (n2 - n1) — because this runtime's
flat ~25 ms dispatch+fetch RTT per jit call otherwise lands in the
per-iter number (r4 divided a single wall by nb=1875, booking ~14 us of
tunnel latency per block as "kernel fixed cost"; the floor rows read
0.24-0.37 of roofline when the kernel itself was at 0.57+).

The P=32 floor rows run the r5 VMEM-RESIDENT ring mode (the whole FDL
lives in VMEM across the stream), so their "effective GB/s" is the
HBM-streaming-equivalent rate of the bytes model, not traffic that
actually crosses HBM — reported as such.

Run on the TPU: python tools/roofline_cal.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BLOCK = 512
CHANNELS = 64
P = 960


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if jax.default_backend() != "tpu":
        print("requires the TPU; skipping", file=sys.stderr)
        return

    from neojax.bench.harness import (
        hbm_achievable_bytes_per_sec,
        hbm_peak_bytes_per_sec,
    )
    from neojax.conv import fdl as fdl_lib
    from neojax.kernels.fdl_mac import choose_chunks, fdl_mac_pallas

    peak = hbm_peak_bytes_per_sec() or 0.0
    rng = np.random.default_rng(0)
    results = {}

    def record(name, dt_per_iter, nbytes, extra=None):
        gbps = nbytes / dt_per_iter / 1e9
        results[name] = {
            "gbps": round(gbps, 1),
            "us_per_iter": round(dt_per_iter * 1e6, 2),
            "roofline_fraction": round(gbps * 1e9 / peak, 3) if peak else None,
        }
        if extra:
            results[name].update(extra)
        print(f"# {name}: {gbps:.0f} GB/s ({dt_per_iter*1e6:.1f} us/iter)",
              file=sys.stderr)

    results["spec_peak_gbps"] = round(peak / 1e9, 1)
    xla = hbm_achievable_bytes_per_sec()
    results["xla_stream"] = {"gbps": round(xla / 1e9, 1),
                             "roofline_fraction": round(xla / peak, 3)}
    print(f"# xla_stream: {xla/1e9:.0f} GB/s", file=sys.stderr)

    def slope_scan_timer(make_body, carry0, nbytes, name):
        """Per-iter via the slope of two in-jit scan lengths (the flat
        per-call dispatch+fetch RTT cancels)."""
        walls = []
        for iters in (64, 256):
            @jax.jit
            def loop(carry, iters=iters):
                def body(c, _):
                    return make_body(c), None
                out, _ = jax.lax.scan(body, carry, None, length=iters)
                return out

            out = loop(carry0)
            float(jnp.sum(jnp.abs(jax.tree.leaves(out)[0]).astype(jnp.float32)))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = loop(carry0)
                float(jnp.sum(jnp.abs(jax.tree.leaves(out)[0]).astype(jnp.float32)))
                ts.append(time.perf_counter() - t0)
            walls.append(min(ts))
        record(name, (walls[1] - walls[0]) / (256 - 64), nbytes)

    for storage, dt_ in (("bf16", jnp.bfloat16), ("split", jnp.float32)):
        fdl = jnp.asarray(
            rng.standard_normal((2, P, CHANNELS, BLOCK)), dt_
        )
        tiled_re = jnp.asarray(
            rng.standard_normal((2 * P, 1, BLOCK)), jnp.float32
        )
        tiled_im = jnp.asarray(
            rng.standard_normal((2 * P, 1, BLOCK)), jnp.float32
        )
        nbytes = 2 * P * CHANNELS * BLOCK * jnp.dtype(dt_).itemsize
        k_tile, pc = choose_chunks(dt_, P, CHANNELS, BLOCK)

        # ---- stripped kernel: same grid/BlockSpecs, compute = 1 row
        def _stripped(fdl_ref, fr_ref, or_ref):
            p_i = pl.program_id(1)
            row = fdl_ref[0, 0].astype(jnp.float32)  # [C, Kt] of the block
            f0 = fr_ref[0]  # [Kt]

            @pl.when(p_i == 0)
            def _():
                or_ref[...] = row * f0[None]

            @pl.when(p_i > 0)
            def _():
                or_ref[...] += row * f0[None]

        nk = pl.cdiv(BLOCK, k_tile)
        npc = P // pc

        @functools.partial(jax.jit)
        def dma_only(fdl, fr):
            return pl.pallas_call(
                _stripped,
                grid=(nk, npc),
                in_specs=[
                    pl.BlockSpec(
                        (2, pc, CHANNELS, k_tile),
                        lambda kk, pp: (0, pp, 0, kk),
                    ),
                    pl.BlockSpec((pc, k_tile), lambda kk, pp: (pp, kk)),
                ],
                out_specs=pl.BlockSpec(
                    (CHANNELS, k_tile), lambda kk, pp: (0, kk)
                ),
                out_shape=jax.ShapeDtypeStruct(
                    (CHANNELS, BLOCK), jnp.float32
                ),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel", "arbitrary"),
                    vmem_limit_bytes=32 * 1024 * 1024,
                ),
            )(fdl, fr)

        def dma_make(carry):
            pos, acc = carry
            fr = fdl_lib.rotated_filter(tiled_re, pos, P)[:, 0]
            out = dma_only(fdl, fr)
            return (jnp.mod(pos + 1, P), acc + out[0, :1])

        slope_scan_timer(
            dma_make,
            (jnp.zeros((), jnp.int32), jnp.zeros((1,), jnp.float32)),
            nbytes,
            f"dma_only/{storage}",
        )

        # ---- the real MAC kernel, same rotated-filter dependency
        def mac_make(carry):
            pos, acc = carry
            fr = fdl_lib.rotated_filter(tiled_re, pos, P)
            fi = fdl_lib.rotated_filter(tiled_im, pos, P)
            ar, ai = fdl_mac_pallas(fdl, fr, fi)
            return (jnp.mod(pos + 1, P), acc + ar[0, :1])

        slope_scan_timer(
            mac_make,
            (jnp.zeros((), jnp.int32), jnp.zeros((1,), jnp.float32)),
            nbytes,
            f"mac_kernel/{storage}",
        )

    # ---- the full fused streaming engine (production path).
    from functools import partial as _partial

    import bench as bench_mod
    from neojax.conv import convolver as cv

    def stream_wall(proc, params, state, sig, reps=3):
        import jax.numpy as jnp

        st, out = proc(params, state, sig)
        float(jnp.sum(jnp.abs(out)))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            st, out = proc(params, st, sig)
            float(jnp.sum(jnp.abs(out)))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for storage, p_row in (
        ("bf16", P), ("int8", P), ("split", P), ("split", 32), ("bf16", 32)
    ):
        cfg = cv.PartitionedConfig(
            BLOCK, p_row, CHANNELS, storage=storage, mac_backend="pallas",
            fused=True,
        )
        parts = bench_mod._make_parts(p_row, cfg.num_bins)
        params = cv.filter_params(cfg, parts)
        proc = jax.jit(_partial(cv.process, cfg), donate_argnums=(1,))
        nbs = (1024, 8192) if p_row == P else (2048, 16384)
        walls = [
            stream_wall(proc, params, cv.init_state(cfg), bench_mod._signal(nb))
            for nb in nbs
        ]
        dtb = (walls[1] - walls[0]) / (nbs[1] - nbs[0])
        bpb = bench_mod._perblock_bytes(cfg, p_row, fused=True)
        if p_row == P:
            key = f"fused_stream/{storage}"
            extra = {}
        else:
            key = f"fused_stream_floor/{storage}/P{p_row}"
            extra = {"note": (
                "VMEM-resident ring mode: gbps is the HBM-streaming-"
                "equivalent of the bytes model, not actual HBM traffic"
            )}
        extra["samples_per_sec"] = round(CHANNELS * BLOCK / dtb, 1)
        record(key, dtb, bpb, extra)

    out = {"metric": "roofline_calibration_same_claim", "config":
           {"block": BLOCK, "channels": CHANNELS, "partitions": P},
           "protocol": "slope-timed (two stream lengths; flat per-call "
                       "RTT cancels)",
           **results}
    print(json.dumps(out))
    with open("ROOFLINE_CAL.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
