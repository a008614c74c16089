"""Quantify the time-sharded pipeline's warmup overhead (VERDICT r2 #7).

The sequence-parallel stream (``neojax.dist.timesharded``) gives each
device its predecessor's trailing P blocks as a ppermute halo and rebuilds
the FDL with P-1 *insert-only* steps (rfft + ring insert, no partition
MAC). The claim to validate: warmup is negligible for m >> P-equivalent
work, i.e. scaling efficiency ≈ m*t_step / (m*t_step + (P-1)*t_insert).

This tool measures, on the real chip at the headline config
(64 ch, 10 s IR ⇒ P=938→960, block 512):

  - t_step:   steady-state full-step time (the sequential stream rate)
  - t_insert: insert-only warmup step time
  - the halo size in bytes (P*B samples x channels x 4)

and writes TIMESHARD_BENCH.json with the measured per-device efficiency
model for a sweep of m (blocks/device), plus an 8-device virtual-CPU
structural check (sharded output == sequential output) when run with
JAX_PLATFORMS=cpu and --xla_force_host_platform_device_count=8.

Reference semantics being distributed: the OLS carried window tail
(``src/neo/convolution/overlap_save.hpp:37-55``) and FDL history — the
halo is exactly that state's input preimage.
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _setup():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return jax


def bench_tpu(storage: str = "bf16") -> dict:
    jax = _setup()
    import jax.numpy as jnp
    from jax import lax

    from neojax.conv import convolver as cv

    B, C = 512, 64
    P = -(-int(np.ceil(10.0 * 48000 / B)) // 32) * 32  # 960
    cfg = cv.PartitionedConfig(B, P, C, storage=storage, mac_backend="pallas")
    rng = np.random.default_rng(0)
    parts = (
        rng.standard_normal((1, P, cfg.num_bins))
        + 1j * rng.standard_normal((1, P, cfg.num_bins))
    ).astype(np.complex64) * 0.05
    params = cv.filter_params(cfg, parts)
    state = cv.init_state(cfg)

    nb = 400
    sig = jnp.asarray(rng.uniform(-1, 1, (C, nb * B)), jnp.float32)

    def timed(fn, st, sig):
        """fn(params?, state, sig) -> (state, out-ish); donation-safe: the
        returned state is threaded into the next call."""
        st, out = fn(st, sig)
        float(jnp.sum(jnp.abs(jax.tree.leaves(out)[0]).astype(jnp.float32)))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            st, out = fn(st, sig)
            float(jnp.sum(jnp.abs(jax.tree.leaves(out)[0]).astype(jnp.float32)))
            ts.append(time.perf_counter() - t0)
        return min(ts) / nb

    proc = jax.jit(partial(cv.process, cfg), donate_argnums=(1,))
    t_step = timed(lambda st, sg: proc(params, st, sg), state, sig)

    @jax.jit
    def warm(state, sig):
        blocks = jnp.moveaxis(sig.reshape(C, nb, B), 1, 0)

        def body(carry, blk):
            return cv.insert_only_step(cfg, carry, blk), None

        state, _ = lax.scan(body, state, blocks)
        return state, state["fdl"]

    t_insert = timed(warm, cv.init_state(cfg), sig)

    halo_bytes = C * P * B * 4
    sweep = {}
    for m in [P, 2 * P, 4 * P, 16 * P, 64 * P]:
        eff = m * t_step / (m * t_step + (P - 1) * t_insert)
        sweep[str(m)] = round(eff, 4)
    return {
        "config": {"block": B, "channels": C, "partitions": P, "storage": storage},
        "t_step_us": round(t_step * 1e6, 1),
        "t_insert_us": round(t_insert * 1e6, 1),
        "halo_mbytes": round(halo_bytes / 1e6, 1),
        "warmup_blocks": P - 1,
        "scaling_efficiency_vs_blocks_per_device": sweep,
        "note": (
            "eff(m) = m*t_step / (m*t_step + (P-1)*t_insert); halo transfer "
            "itself is one ppermute message overlapped with warmup compute"
        ),
    }


def check_cpu_mesh(n: int = 8) -> dict:
    jax = _setup()
    import jax.numpy as jnp

    from neojax.conv import convolver as cv
    from neojax.dist.timesharded import timesharded_process

    if jax.local_device_count() < n:
        return {"skipped": f"need {n} devices, have {jax.local_device_count()}"}

    B, C, P = 64, 4, 8
    cfg = cv.PartitionedConfig(B, P, C, storage="split")
    rng = np.random.default_rng(0)
    parts = (
        rng.standard_normal((1, P, cfg.num_bins))
        + 1j * rng.standard_normal((1, P, cfg.num_bins))
    ).astype(np.complex64) * 0.1
    params = cv.filter_params(cfg, parts)
    sig = jnp.asarray(rng.uniform(-1, 1, (C, n * P * B)), jnp.float32)

    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:n]), ("time",))
    t0 = time.perf_counter()
    out_sharded = np.asarray(timesharded_process(cfg, params, sig, mesh))
    t_sh = time.perf_counter() - t0
    _, out_seq = cv.process(cfg, params, cv.init_state(cfg), sig)
    err = float(np.max(np.abs(out_sharded - np.asarray(out_seq))))
    return {
        "devices": n,
        "max_abs_err_vs_sequential": err,
        "ok": err < 1e-5,
        "wall_s_sharded_first_call": round(t_sh, 3),
    }


def main() -> None:
    jax = _setup()
    result = {"metric": "timesharded_warmup_overhead"}
    if jax.default_backend() == "tpu":
        result["tpu"] = bench_tpu()
    result["cpu_mesh_structural"] = check_cpu_mesh()
    print(json.dumps(result, indent=1))
    with open("TIMESHARD_BENCH.json", "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
