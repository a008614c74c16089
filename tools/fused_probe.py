"""Decompose the fused stream kernel's fixed per-step cost (VERDICT r4 #2).

Same-process (one TPU claim) measurements:
  1. empty grid kernel (out write only)        -> grid-step overhead
  2. window DMA + forward matmuls + out        -> + input + fwd transform
  3. fused_stream, zero-count schedule         -> full fixed path, no MAC
  4. fused_stream dense P=32 / P=960           -> totals (floor / headline)
  5. chunk-size ladder at P=960                -> DMA-count sensitivity

Timing: streams of nb blocks per jit call, fetch-synced (bench.py's
protocol); per-iter = wall / nb.
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from neojax.conv import convolver as cv
    from neojax.fft import matmul_backend
    from neojax.kernels import fused_step as fs

    B, C = 512, 64
    N = 2 * B
    nb = 512
    rows = {}

    def timeit(fn, *args, reps=3):
        out = fn(*args)
        float(jnp.sum(jnp.abs(jax.tree.leaves(out)[0]).astype(jnp.float32)))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            float(jnp.sum(jnp.abs(jax.tree.leaves(out)[0]).astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        return min(ts) / nb * 1e6  # us/iter

    rng = np.random.default_rng(0)
    sigpad = jnp.asarray(rng.uniform(-1, 1, (C, (nb + 1) * B)), jnp.float32)

    # ---- 1. empty kernel: write one [C, B] block per step
    def k_empty(out_ref):
        out_ref[...] = jnp.zeros((C, B), jnp.float32)

    @jax.jit
    def run_empty():
        return pl.pallas_call(
            k_empty,
            grid=(nb,),
            out_specs=pl.BlockSpec((C, B), lambda i: (0, i)),
            out_shape=jax.ShapeDtypeStruct((C, nb * B), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)
            ),
        )()

    rows["empty_grid"] = round(timeit(run_empty), 2)

    # ---- 2. window DMA + fwd matmul (+ inverse) per step
    for with_inv, name in [(False, "win_fwd"), (True, "win_fwd_inv")]:
        for mat_dt in (jnp.bfloat16, jnp.float32):
            cs = jnp.stack(matmul_backend.rfft_packed_matrices(N)).astype(mat_dt)
            abt = jnp.stack(matmul_backend.irfft_packed_matrices(N)).astype(
                mat_dt
            )[:, :, B:]

            def k_tf(sig_any, cs_ref, abt_ref, out_ref, winbuf, win_sems,
                     with_inv=with_inv):
                i = pl.program_id(0)

                def win_dma(slot, j):
                    return pltpu.make_async_copy(
                        sig_any.at[:, pl.ds(j * B, N)], winbuf.at[slot],
                        win_sems.at[slot],
                    )

                @pl.when(i == 0)
                def _():
                    win_dma(0, 0).start()

                @pl.when(i + 1 < nb)
                def _():
                    win_dma(lax.rem(i + 1, 2), i + 1).start()

                win_dma(lax.rem(i, 2), i).wait()
                frame = winbuf[lax.rem(i, 2)].astype(cs_ref.dtype)
                sre = fs._dot(frame, cs_ref[0])
                sim = fs._dot(frame, cs_ref[1])
                if with_inv:
                    out_ref[...] = fs._dot(
                        sre.astype(abt_ref.dtype), abt_ref[0]
                    ) + fs._dot(sim.astype(abt_ref.dtype), abt_ref[1])
                else:
                    out_ref[...] = sre + sim

            @jax.jit
            def run_tf(sigpad, cs, abt, k=k_tf):
                return pl.pallas_call(
                    k,
                    grid=(nb,),
                    in_specs=[
                        pl.BlockSpec(memory_space=pl.ANY),
                        pl.BlockSpec((2, N, B), lambda i: (0, 0, 0)),
                        pl.BlockSpec((2, B, B), lambda i: (0, 0, 0)),
                    ],
                    out_specs=pl.BlockSpec((C, B), lambda i: (0, i)),
                    out_shape=jax.ShapeDtypeStruct((C, nb * B), jnp.float32),
                    scratch_shapes=[
                        pltpu.VMEM((2, C, N), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                    ],
                    compiler_params=pltpu.CompilerParams(
                        dimension_semantics=("arbitrary",)
                    ),
                )(sigpad, cs, abt)

            rows[f"{name}/{jnp.dtype(mat_dt).name}"] = round(
                timeit(run_tf, sigpad, cs, abt), 2
            )

    # ---- 3/4/5. the real fused_stream at assorted configs
    def stream_row(p, storage, chunk_target=None, label=None):
        old_target = fs._CHUNK_TARGET
        if chunk_target:
            fs._CHUNK_TARGET = chunk_target
        try:
            cfg = cv.PartitionedConfig(
                B, p, C, storage=storage, mac_backend="pallas", fused=True
            )
            parts = (
                rng.standard_normal((1, p, cfg.num_bins))
                + 1j * rng.standard_normal((1, p, cfg.num_bins))
            ).astype(np.complex64) * 0.05
            params = cv.filter_params(cfg, parts)
            state = cv.init_state(cfg)
            proc = jax.jit(
                functools.partial(cv.process, cfg), donate_argnums=(1,)
            )
            sig = jnp.asarray(
                rng.uniform(-1, 1, (C, nb * B)), jnp.float32
            )

            def run(st, sg):
                return proc(params, st, sg)

            st, out = run(state, sig)
            float(jnp.sum(jnp.abs(out)))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                st, out = run(st, sig)
                float(jnp.sum(jnp.abs(out)))
                ts.append(time.perf_counter() - t0)
            us = min(ts) / nb * 1e6
            key = label or f"stream/{storage}/P{p}"
            pc = fs.fused_chunk_rows(
                {"split": jnp.float32, "bf16": jnp.bfloat16,
                 "int8": jnp.int8, "int16": jnp.int16}[storage],
                p, C, B,
            )
            rows[key] = {
                "us_per_block": round(us, 2),
                "chunk_rows": pc,
                "n_chunks": p // pc,
                "samples_per_sec": round(C * B / (us / 1e6), 0),
            }
        finally:
            fs._CHUNK_TARGET = old_target

    stream_row(32, "bf16")
    stream_row(32, "split")
    stream_row(960, "bf16")
    stream_row(960, "split")
    stream_row(960, "bf16", chunk_target=8 * 1024 * 1024, label="stream/bf16/P960/8MB")
    stream_row(960, "bf16", chunk_target=16 * 1024 * 1024, label="stream/bf16/P960/16MB")
    stream_row(960, "split", chunk_target=16 * 1024 * 1024, label="stream/split/P960/16MB")

    out = {"metric": "fused_fixed_cost_probe", "nb": nb, "rows": rows}
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fused_probe.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
